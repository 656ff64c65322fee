"""Absorbing-flow experiment wiring (reference:
training/absorbing_experiment.py:11-38)."""

from multimodal_particles_tpu.config_classes import AbsorbingConfig
from multimodal_particles_tpu.data.particle_clouds.jets import JetDataclass
from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
    JetsDataloaderModule,
)
from multimodal_particles_tpu.models.generative.absorbing.absorbing_flows import (
    AbsorbingFlow,
)
from multimodal_particles_tpu.training.basic_experiments import BasicJaxExperiment


class AbsorbingExperiment(BasicJaxExperiment):
    def setup_datamodule(self):
        jets = JetDataclass(self.config)
        jets.preprocess()
        self.datamodule = JetsDataloaderModule(self.config, jets)
        self.config = self.datamodule.update_config(self.config)

    def setup_model(self):
        self.model = AbsorbingFlow(self.config)

    def load_from_experiment_dir(self, experiment_dir):
        import os

        from multimodal_particles_tpu.training.trainer import Trainer
        from multimodal_particles_tpu.utils.experiment_files import ExperimentsFiles

        self.config = AbsorbingConfig.from_yaml(
            os.path.join(experiment_dir, "params.yaml")
        )
        self.experiment_files = ExperimentsFiles(experiment_dir=experiment_dir)
        self.setup_datamodule()
        self.setup_model()
        self.trainer = Trainer(self.model, self.config, self.experiment_files)
        example = next(iter(self.datamodule.train))
        self.trainer.setup(example, max(len(self.datamodule.train), 1))
        self.trainer.load_checkpoint("best")


def train_absorbing(config: AbsorbingConfig):
    experiment = AbsorbingExperiment(config)
    experiment.train()
    return experiment
