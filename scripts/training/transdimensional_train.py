"""Train the transdimensional jump-diffusion model (no reference entry point
exists for this family — its Lightning hooks are stubs)."""

import argparse

from multimodal_particles_tpu.config_classes.transdimensional_unconditional_config import (
    TransdimensionalEpicConfig,
)
from multimodal_particles_tpu.training.transdimensional_experiment import (
    train_transdimensional,
)

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="path to a transdimensional yaml config")
    args = ap.parse_args()
    config = TransdimensionalEpicConfig.from_yaml(args.config)
    train_transdimensional(config)
