"""Train the absorbing flow (reference entry:
scripts/training/absorbing_train.py:6-13)."""

import argparse

from multimodal_particles_tpu.config_classes import AbsorbingConfig
from multimodal_particles_tpu.training.absorbing_experiment import train_absorbing

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="path to an absorbing yaml config")
    args = ap.parse_args()
    config = AbsorbingConfig.from_yaml(args.config)
    train_absorbing(config)
