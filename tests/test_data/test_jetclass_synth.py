"""Synthetic JetClass-schema shard generator (scripts/make_jetclass_synth.py)
and the JetClass `fill_target_with_noise` parity fix: the scaled-data
quality harness (VERDICT r4 #2) depends on both."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from make_jetclass_synth import write_synthetic_jetclass_shard  # noqa: E402

from multimodal_particles_tpu.data.particle_clouds.particles import (  # noqa: E402
    ParticleClouds,
)
from multimodal_particles_tpu.data.particle_clouds.utils import (  # noqa: E402
    validate_jetclass_h5,
)


@pytest.fixture(scope="module")
def shard(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("synth") / "synth.h5")
    write_synthetic_jetclass_shard(path, n_jets=300, max_particles=48, seed=7)
    return path


def test_synth_shard_passes_schema_validation(shard):
    assert validate_jetclass_h5(shard) == (300, 48)


def test_synth_shard_is_multimodal(shard):
    """The 3-class prong mixture must yield genuinely multimodal
    multiplicity and mass — the whole point vs the unimodal mini fixture."""
    from multimodal_particles_tpu.data.particle_clouds.jets import (
        JetClassHighLevelFeatures,
    )

    cloud = ParticleClouds(
        dataset="JetClass", data_paths=[shard], max_num_particles=48,
        num_jets=300,
    )
    mult = np.asarray(cloud.multiplicity).reshape(-1)
    # three multiplicity components around ~22/32/45 → broad spread
    assert mult.std() > 7.0, mult.std()
    hl = JetClassHighLevelFeatures(cloud, compute_substructure=True)
    tau21 = np.asarray(hl.tau21, float)
    tau21 = tau21[np.isfinite(tau21)]
    # 2/3-prong jets push tau21 low, QCD stays high → wide distribution
    assert tau21.std() > 0.08, tau21.std()


def test_jetclass_fill_target_with_noise(shard):
    """The JetClass ctor branch honors fill_target_with_noise like the AOJ
    branch (padded slots get noise features, the mask is untouched)."""
    plain = ParticleClouds(
        dataset="JetClass", data_paths=[shard], max_num_particles=48,
        num_jets=100,
    )
    filled = ParticleClouds(
        dataset="JetClass", data_paths=[shard], max_num_particles=48,
        num_jets=100, fill_target_with_noise=True, seed=3,
    )
    np.testing.assert_array_equal(plain.mask, filled.mask)
    alive = plain.mask[..., 0] > 0
    # alive slots identical; padded slots became non-zero noise
    np.testing.assert_array_equal(
        plain.continuous[alive], filled.continuous[alive]
    )
    pad = ~alive
    assert pad.any()
    assert np.abs(filled.continuous[pad]).sum() > 0
    assert np.abs(plain.continuous[pad]).sum() == 0
    # discrete padding carries valid one-hot flavor + charge rows
    flavor = filled.discrete[..., :-1]
    assert (flavor[pad].sum(-1) == 1).all()
