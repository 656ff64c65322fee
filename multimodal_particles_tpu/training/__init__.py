from multimodal_particles_tpu.training.trainer import Trainer, TrainState
from multimodal_particles_tpu.training.basic_experiments import BasicJaxExperiment
from multimodal_particles_tpu.training.multimodal_experiment import (
    MultimodalBridgeMatchingExperiment,
    train_mbm,
)
from multimodal_particles_tpu.training.absorbing_experiment import (
    AbsorbingExperiment,
    train_absorbing,
)
from multimodal_particles_tpu.training.transdimensional_experiment import (
    TransdimensionalExperiment,
    train_transdimensional,
)
