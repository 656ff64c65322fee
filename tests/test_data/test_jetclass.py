"""JetClass ingestion (VERDICT r1 #7): the converted-`.h5` path works from
the committed fixture, the schema validator enforces the documented
conversion contract, and the `.root` path raises a clean uproot gate."""

import os
import shutil

import h5py
import numpy as np
import pytest

from multimodal_particles_tpu import test_resources_dir
from multimodal_particles_tpu.data.particle_clouds.particles import ParticleClouds
from multimodal_particles_tpu.data.particle_clouds.utils import (
    JETCLASS_FLAG_BRANCHES,
    extract_jetclass_features,
    read_jetclass_h5,
    validate_jetclass_h5,
)

FIXTURE = os.path.join(test_resources_dir, "data", "jetclass_mini.h5")


def test_root_path_raises_uproot_gate():
    with pytest.raises(ImportError, match="uproot"):
        extract_jetclass_features("/nonexistent/shard.root")


def test_fixture_passes_schema_validation():
    assert validate_jetclass_h5(FIXTURE) == (60, 40)


def test_validator_rejects_contract_breaches(tmp_path):
    bad = tmp_path / "bad.h5"
    # missing dataset
    shutil.copy(FIXTURE, bad)
    with h5py.File(bad, "a") as f:
        del f["part_energy"]
    with pytest.raises(ValueError, match="missing"):
        validate_jetclass_h5(str(bad))
    # non-exclusive flavor flags
    shutil.copy(FIXTURE, bad)
    with h5py.File(bad, "a") as f:
        flags = f["part_isPhoton"][:]
        mask = f["mask"][:]
        flags[mask > 0] = 1  # photon flag everywhere → not exclusive
        f["part_isPhoton"][...] = flags
    with pytest.raises(ValueError, match="exclusive"):
        validate_jetclass_h5(str(bad))
    # wrong format version
    shutil.copy(FIXTURE, bad)
    with h5py.File(bad, "a") as f:
        f.attrs["format_version"] = 99
    with pytest.raises(ValueError, match="format_version"):
        validate_jetclass_h5(str(bad))


def test_extract_contract():
    continuous, discrete, mask = extract_jetclass_features(
        [FIXTURE], max_num_particles=32, num_jets=50
    )
    assert continuous.shape == (50, 32, 3) and continuous.dtype == np.float32
    assert discrete.shape == (50, 32, 6) and discrete.dtype == np.int64
    assert mask.shape == (50, 32, 1) and mask.dtype == np.int64
    # pt-descending within the valid region
    pt = continuous[..., 0]
    alive = mask[..., 0] > 0
    diffs = pt[:, :-1] - pt[:, 1:]
    both = alive[:, :-1] & alive[:, 1:]
    assert (diffs[both] >= 0).all()
    # padding rows are fully zero
    assert continuous[~alive].sum() == 0 and discrete[~alive].sum() == 0
    # flavor one-hot exclusive; charge zero for neutral species
    flavor = discrete[..., :5]
    charge = discrete[..., 5]
    assert (flavor.sum(-1)[alive] == 1).all()
    neutral = (flavor[..., 0] + flavor[..., 1]) > 0  # photon, h0
    assert charge[neutral & alive].sum() == 0
    assert np.isin(charge[alive], (-1, 0, 1)).all()


def test_relative_kinematics_match_raw_fixture():
    """Independent recomputation of etarel/phirel from the fixture's raw
    4-momenta must match the reader (the reference derives them via
    vector's Momentum4D.deltaeta/deltaphi — utils.py:15-29)."""
    d = read_jetclass_h5(FIXTURE)
    with h5py.File(FIXTURE, "r") as f:
        px = f["part_px"][:].astype(np.float64)
        py = f["part_py"][:].astype(np.float64)
        pz = f["part_pz"][:].astype(np.float64)
        mask = f["mask"][:] > 0
    b = 7
    v = mask[b]
    jpx, jpy, jpz = px[b][v].sum(), py[b][v].sum(), pz[b][v].sum()
    jeta = np.arcsinh(jpz / np.hypot(jpx, jpy))
    jphi = np.arctan2(jpy, jpx)
    for i in np.nonzero(v)[0][:10]:
        pt_i = np.hypot(px[b, i], py[b, i])
        eta_i = np.arcsinh(pz[b, i] / pt_i)
        phi_i = np.arctan2(py[b, i], px[b, i])
        dphi = phi_i - jphi
        dphi = -((-dphi + np.pi) % (2 * np.pi) - np.pi)
        np.testing.assert_allclose(d["part_etarel"][b, i], eta_i - jeta, rtol=1e-10)
        np.testing.assert_allclose(d["part_phirel"][b, i], dphi, rtol=1e-10)
        np.testing.assert_allclose(d["part_pt"][b, i], pt_i, rtol=1e-10)


def test_particleclouds_jetclass_end_to_end():
    cloud = ParticleClouds(
        dataset="JetClass",
        data_paths=[FIXTURE],
        max_num_particles=32,
        num_jets=50,
    )
    assert len(cloud) == 50
    assert cloud.pt.shape == (50, 32)
    assert (cloud.multiplicity > 0).all()
    # preprocess round-trips like the AOJ clouds
    cloud.preprocess(output_continuous="standardize", output_discrete="tokens")
    assert cloud.discrete.shape == (50, 32, 1)
    assert np.issubdtype(cloud.continuous.dtype, np.floating)


def test_flag_order_matches_feature_order():
    """The discrete block's column order is the reference's feature list
    (photon, h0, h±, e, mu, charge) — pin it."""
    assert JETCLASS_FLAG_BRANCHES == (
        "part_isPhoton",
        "part_isNeutralHadron",
        "part_isChargedHadron",
        "part_isElectron",
        "part_isMuon",
    )
