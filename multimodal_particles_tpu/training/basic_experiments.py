"""Experiment orchestration: wires data → model → Trainer and manages run
artifacts (reference: training/basic_experiments.py:22-147).
"""

import os
from abc import ABC, abstractmethod

from multimodal_particles_tpu.training.trainer import Trainer
from multimodal_particles_tpu.utils.experiment_files import ExperimentsFiles


class BasicJaxExperiment(ABC):
    """Abstract experiment: new-run path sets files/datamodule/model/trainer."""

    def __init__(self, config=None, experiment_dir=None, seed: int = 0):
        self.seed = seed
        if config is not None:
            self.config = config
            self.experiment_files = ExperimentsFiles(
                experiment_dir=experiment_dir
                or getattr(config, "experiment_dir", None),
                experiment_indentifier=getattr(config, "experiment_indentifier", None),
            )
            self.setup_datamodule()
            self.setup_model()
            if hasattr(self.config, "to_yaml"):
                self.config.to_yaml(self.experiment_files.params_yaml)
            self.trainer = Trainer(
                self.model, self.config, self.experiment_files, seed=seed
            )
        elif experiment_dir is not None:
            self.load_from_experiment_dir(experiment_dir)

    @abstractmethod
    def setup_datamodule(self):
        ...

    @abstractmethod
    def setup_model(self):
        ...

    @abstractmethod
    def load_from_experiment_dir(self, experiment_dir):
        ...

    def train(self):
        return self.trainer.fit(self.datamodule)

    def generate(self):
        return self.trainer.predict(self.datamodule)
