"""Train the MBM hybrid bridge (reference entry:
scripts/training/multimodal_train.py:4-11, with a CLI instead of a
hard-coded path)."""

import argparse

from multimodal_particles_tpu.config_classes import MultimodalBridgeMatchingConfig
from multimodal_particles_tpu.training.multimodal_experiment import train_mbm

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="path to a flat-schema MBM yaml config")
    args = ap.parse_args()
    config = MultimodalBridgeMatchingConfig.from_yaml(args.config)
    train_mbm(config)
