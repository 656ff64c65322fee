"""Physics-fidelity evaluation: generate jets with a trained experiment and
score KL / Wasserstein-1D against the data on the reference's own
observables {pt, m, eta, phi, multiplicity, jet charge, tau21, tau32, d2}
(reference machinery: data/particle_clouds/jets.py:86-332; the reference
ships this flow only as a notebook — notebooks/multimodal_bridges/
inference.ipynb)."""

import argparse
import json

import numpy as np


def evaluate_experiment(experiment_dir=None, experiment=None, features=None, out_json=None):
    from multimodal_particles_tpu.data.particle_clouds.jets import (
        JetClassHighLevelFeatures,
    )
    from multimodal_particles_tpu.data.particle_clouds.particles import ParticleClouds

    if experiment is None:
        from multimodal_particles_tpu.training.multimodal_experiment import (
            MultimodalBridgeMatchingExperiment,
        )

        experiment = MultimodalBridgeMatchingExperiment(experiment_dir=experiment_dir)

    cfg = experiment.config
    outs = experiment.generate()

    # stitch generated batches into one cloud and undo preprocessing
    import jax

    gen_state = jax.tree_util.tree_map(
        lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=0), *outs
    )
    gen = ParticleClouds(gen_state)
    gen.stats = cfg.data.target_preprocess_stats
    gen.postprocess()

    # reference target in physics space
    ref = experiment.datamodule.dataclass.target
    import copy

    ref = copy.deepcopy(ref)
    ref.postprocess(
        input_continuous=cfg.data.target_preprocess_continuous,
        input_discrete=cfg.data.target_preprocess_discrete,
        stats=cfg.data.target_preprocess_stats,
    )

    hl_gen = JetClassHighLevelFeatures(gen)
    hl_ref = JetClassHighLevelFeatures(ref)

    features = features or ["pt", "m", "eta", "phi", "multiplicity", "Q_total", "Q_jet"]
    substructure = ["tau21", "tau32", "d2"]
    metrics = {}
    for feat in features + substructure:
        try:
            metrics[f"KL_{feat}"] = float(hl_gen.KLmetric1D(feat, hl_ref))
            metrics[f"W1_{feat}"] = float(hl_gen.Wassertein1D(feat, hl_ref))
        except Exception as e:  # substructure may be empty for poor models
            metrics[f"KL_{feat}"] = None
            metrics[f"W1_{feat}"] = None

    if out_json:
        with open(out_json, "w") as f:
            json.dump(metrics, f, indent=2)
    return metrics


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("experiment_dir")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    metrics = evaluate_experiment(args.experiment_dir, out_json=args.out)
    print(json.dumps(metrics, indent=2))
