"""AbsorbingFlow walkthrough: train the mask-generating model and inspect
the survival dynamics (script equivalent of the reference
notebooks/absorbing/absorbing_bridge.ipynb sanity checks).

  python examples/absorbing_flow_demo.py --epochs 20
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--out", default="/tmp/absorbing_demo_run")
    args = ap.parse_args()

    from multimodal_particles_tpu import test_resources_dir
    from multimodal_particles_tpu.config_classes import AbsorbingConfig
    from multimodal_particles_tpu.training.absorbing_experiment import (
        AbsorbingExperiment,
    )

    config = AbsorbingConfig.from_yaml(
        os.path.join(test_resources_dir, "configs_files", "config-absorbing-test.yaml")
    )
    config.train.epochs = args.epochs
    config.bridge.num_timesteps = 100
    config.data.num_jets = 100

    experiment = AbsorbingExperiment(config, experiment_dir=args.out)
    history = experiment.train()
    print(f"final val_loss: {history[-1]['val_loss']:.4f}")

    # generated masks: the model decides particle multiplicity
    outs = experiment.generate()
    mult_gen = np.concatenate(
        [np.asarray(o.mask_t[..., 0].sum(1)) for o in outs]
    )
    mult_data = np.asarray(
        experiment.datamodule.dataset.target_mask[..., 0].sum(1)
    )
    print(
        f"multiplicity: generated mean {mult_gen.mean():.1f} ± {mult_gen.std():.1f}"
        f" | data mean {mult_data.mean():.1f} ± {mult_data.std():.1f}"
    )


if __name__ == "__main__":
    main()
