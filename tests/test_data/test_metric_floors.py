"""Contract test for the sampling-noise floor utility
(scripts/metric_floors.py): the plug-in bootstrap must produce finite
median/min/max floors for every scored feature, and the integer-histogram
multiplicity KL floor must be small (the data resampled from itself is the
best any model can do — reference metric: data/particle_clouds/jets.py:305-327)."""

import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(REPO_ROOT, "scripts"))

from metric_floors import bootstrap_floors  # noqa: E402

from multimodal_particles_tpu.data.particle_clouds.jets import (  # noqa: E402
    JetClassHighLevelFeatures,
)
from multimodal_particles_tpu.data.particle_clouds.particles import (  # noqa: E402
    ParticleClouds,
)


def test_bootstrap_floors_structure_and_mult_floor():
    cloud = ParticleClouds("AspenOpenJets", num_jets=100)
    hl_data = JetClassHighLevelFeatures(cloud, compute_substructure=False)
    features = ["pt", "m", "multiplicity"]

    floors = bootstrap_floors(
        cloud, hl_data, features, gen_jets=1024, boots=2, seed=0,
        compute_substructure=False,
    )

    for feat in features:
        for kind in ("KL", "W1"):
            entry = floors[f"{kind}_{feat}"]
            assert entry is not None
            assert np.isfinite(entry["median"])
            assert entry["min"] <= entry["median"] <= entry["max"]

    # resampling the data from itself: integer-histogram multiplicity KL
    # floor must be tiny compared to any model's score (artifact ledger
    # quotes 0.0058 at 4096 draws; allow slack at 1024)
    assert floors["KL_mult_hist"]["median"] < 0.05
    # W1 floors are in physical units; the multiplicity W1 floor is a
    # fraction of a particle
    assert floors["W1_mult_particles"]["median"] < 1.0
