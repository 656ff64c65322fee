"""High-level observables + fidelity metrics tests."""

import numpy as np
import pytest

from multimodal_particles_tpu.config_classes import MultimodalBridgeMatchingConfig
from multimodal_particles_tpu.data.particle_clouds.jets import (
    JetClassHighLevelFeatures,
    JetDataclass,
)


@pytest.fixture(scope="module")
def hl_pair():
    cfg = MultimodalBridgeMatchingConfig.from_yaml(
        "tests/resources/configs_files/config-mbm-test.yaml"
    )
    jets = JetDataclass(cfg)
    target = jets.target
    target.preprocess(output_continuous=None, output_discrete="tokens")
    target.postprocess(input_continuous=None, input_discrete="tokens")
    hl = JetClassHighLevelFeatures(target, compute_substructure=True)
    return hl


def test_jet_kinematics_sane(hl_pair):
    hl = hl_pair
    assert (hl.pt > 0).all()
    assert (hl.m >= 0).all()
    assert np.isfinite(hl.eta).all()
    assert (np.abs(hl.phi) <= np.pi).all()
    assert (hl.multiplicity >= 1).all()


def test_jet_charge_bounded(hl_pair):
    hl = hl_pair
    # Q^0 is the raw summed charge — integer valued
    assert np.allclose(hl.Q_total, np.round(hl.Q_total), atol=1e-5)
    # pt-weighted charge is O(1)
    assert np.abs(hl.Q_jet).max() < 5.0


def test_substructure_ratios(hl_pair):
    hl = hl_pair
    assert (hl.tau1 > 0).all()
    # tau ratios live in (0, ~1.5)
    assert np.nanmax(hl.tau21) < 2.0
    assert np.nanmin(hl.tau21) > 0.0
    assert np.isfinite(hl.d2).all()


def test_kl_and_w1_self_consistency(hl_pair):
    """Distribution compared with itself: KL ≈ 0, W1 = 0 — including the
    discrete multiplicity feature (quantile-bin collapse regression)."""
    hl = hl_pair
    for feat in ["pt", "m", "multiplicity", "tau21"]:
        kl = hl.KLmetric1D(feat, hl)
        w1 = hl.Wassertein1D(feat, hl)
        assert np.isfinite(kl), feat
        assert kl < 1e-6, feat
        assert w1 == 0.0, feat
