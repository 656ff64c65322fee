"""Transdimensional experiment wiring — the reference has no experiment class
for this family (its Lightning hooks are stubs,
transdimensional_model.py:90-111); this completes the capability."""

from multimodal_particles_tpu.config_classes.transdimensional_unconditional_config import (
    TransdimensionalEpicConfig,
)
from multimodal_particles_tpu.data.particle_clouds.jets import JetDataclass
from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
    JetsDataloaderModule,
)
from multimodal_particles_tpu.models.generative.transdimensional import (
    TransdimensionalJumpDiffusion,
)
from multimodal_particles_tpu.training.basic_experiments import BasicJaxExperiment


class TransdimensionalExperiment(BasicJaxExperiment):
    def setup_datamodule(self):
        self.config.data.return_type = "list"
        jets = JetDataclass(config=self.config)
        jets.preprocess()
        self.datamodule = JetsDataloaderModule(config=self.config, jetdataset=jets)

    def setup_model(self):
        self.model = TransdimensionalJumpDiffusion(self.config, self.datamodule)

    def load_from_experiment_dir(self, experiment_dir):
        import os

        from multimodal_particles_tpu.training.trainer import Trainer
        from multimodal_particles_tpu.utils.experiment_files import ExperimentsFiles

        self.config = TransdimensionalEpicConfig.from_yaml(
            os.path.join(experiment_dir, "params.yaml")
        )
        self.experiment_files = ExperimentsFiles(experiment_dir=experiment_dir)
        self.setup_datamodule()
        self.setup_model()
        self.trainer = Trainer(self.model, self.config, self.experiment_files)
        example = next(iter(self.datamodule.train))
        self.trainer.setup(example, max(len(self.datamodule.train), 1))
        self.trainer.load_checkpoint("best")


def train_transdimensional(config: TransdimensionalEpicConfig):
    experiment = TransdimensionalExperiment(config)
    experiment.train()
    return experiment
