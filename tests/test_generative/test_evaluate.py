"""Integration smoke for the physics-fidelity evaluation flow
(scripts/evaluate.py — the reference ships this only as the inference
notebook, notebooks/multimodal_bridges/inference.ipynb cells 2-7)."""

import os
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(REPO_ROOT, "scripts"))

from multimodal_particles_tpu import test_resources_dir  # noqa: E402
from multimodal_particles_tpu.config_classes import (  # noqa: E402
    MultimodalBridgeMatchingConfig,
)

CONFIG_PATH = os.path.join(
    test_resources_dir, "configs_files", "config-mbm-test.yaml"
)


@pytest.mark.filterwarnings("ignore")
def test_evaluate_experiment_end_to_end(tmp_path):
    """Train a tiny MBM for 2 epochs, generate, and score KL/W1 over the
    reference's observables — the full evaluation pipeline in-process."""
    from evaluate import evaluate_experiment

    from multimodal_particles_tpu.training.multimodal_experiment import (
        MultimodalBridgeMatchingExperiment,
    )

    config = MultimodalBridgeMatchingConfig.from_yaml(CONFIG_PATH)
    config.data.num_jets = 100
    # 25 is deliberately NOT divisible by the 8-device test mesh: the
    # trainer must pad the setup/fit batches to the device count
    config.data.batch_size = 25
    config.data.max_num_particles = 16
    config.bridge.num_timesteps = 5
    config.train.epochs = 2

    experiment = MultimodalBridgeMatchingExperiment(
        config, experiment_dir=str(tmp_path / "run")
    )
    experiment.trainer.files = None  # skip per-epoch checkpoints
    experiment.train()

    out_json = str(tmp_path / "metrics.json")
    metrics = evaluate_experiment(
        experiment=experiment,
        features=["pt", "m", "multiplicity", "Q_jet"],
        out_json=out_json,
    )
    assert os.path.exists(out_json)
    for feat in ("pt", "m", "multiplicity", "Q_jet"):
        assert f"KL_{feat}" in metrics
        assert f"W1_{feat}" in metrics
        assert np.isfinite(metrics[f"W1_{feat}"])
