"""End-to-end MBM walkthrough: train → generate → evaluate → plot.

Script equivalent of the reference notebooks
(notebooks/multimodal_bridges/train.ipynb + inference.ipynb): loads AOJ
jets, trains the hybrid bridge data-parallel over all local chips, runs the
jitted 100-step sampler, undoes preprocessing and scores KL/W1 against the
data, saving side-by-side histograms.

  python examples/train_and_generate.py [--epochs 50] [--out /tmp/mbm_run]
"""

import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--out", default="/tmp/mbm_example_run")
    args = ap.parse_args()

    from multimodal_particles_tpu import test_resources_dir
    from multimodal_particles_tpu.config_classes import (
        MultimodalBridgeMatchingConfig,
    )
    from multimodal_particles_tpu.data.particle_clouds.jets import (
        JetClassHighLevelFeatures,
        JetDataclass,
    )
    from multimodal_particles_tpu.data.particle_clouds.particles import ParticleClouds
    from multimodal_particles_tpu.training.multimodal_experiment import (
        MultimodalBridgeMatchingExperiment,
    )

    config_path = args.config or os.path.join(
        test_resources_dir, "configs_files", "config-mbm-test.yaml"
    )
    config = MultimodalBridgeMatchingConfig.from_yaml(config_path)
    config.train.epochs = args.epochs

    # ---- train
    experiment = MultimodalBridgeMatchingExperiment(config, experiment_dir=args.out)
    history = experiment.train()
    print(f"trained {len(history)} epochs; final val_loss={history[-1]['val_loss']:.4f}")

    # ---- generate
    outs = experiment.generate()
    import jax

    gen_state = jax.tree_util.tree_map(
        lambda *xs: np.concatenate([np.asarray(x) for x in xs]), *outs
    )
    gen = ParticleClouds(gen_state)
    gen.stats = experiment.config.data.target_preprocess_stats
    gen.postprocess()

    # ---- reference data in physics space
    ref_cfg = MultimodalBridgeMatchingConfig.from_yaml(config_path)
    ref = JetDataclass(ref_cfg).target
    ref.preprocess(output_continuous=None, output_discrete="tokens")
    ref.postprocess(input_continuous=None, input_discrete="tokens")

    hl_gen = JetClassHighLevelFeatures(gen)
    hl_ref = JetClassHighLevelFeatures(ref)

    metrics = {}
    for feat in ["pt", "m", "multiplicity"]:
        metrics[f"W1_{feat}"] = float(hl_gen.Wassertein1D(feat, hl_ref))
    print(json.dumps(metrics, indent=2))

    # ---- plots
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(12, 3.2))
    for ax, feat in zip(axes, ["pt", "m", "multiplicity"]):
        hl_ref.histplot(feat, ax=ax, bins=40, density=True, label="AOJ data")
        hl_gen.histplot(feat, ax=ax, bins=40, density=True, label="generated")
        ax.legend(fontsize=8)
    fig.tight_layout()
    out_png = os.path.join(experiment.experiment_files.sample_dir, "observables.png")
    fig.savefig(out_png, dpi=120)
    print("wrote", out_png)


if __name__ == "__main__":
    main()
