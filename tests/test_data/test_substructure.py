"""Substructure tests: native C++ kernel vs numpy reference implementation,
and physics sanity checks of the observables."""

import numpy as np
import pytest

from multimodal_particles_tpu.data.particle_clouds.substructure import (
    d2_correlator,
    exclusive_kt_axes,
    nsubjettiness,
    substructure_observables,
)
from multimodal_particles_tpu.native import (
    load_substructure_lib,
    substructure_batch_native,
)


def _random_jets(B=20, N=64, seed=0):
    rng = np.random.default_rng(seed)
    pt = rng.exponential(10.0, (B, N))
    eta = rng.normal(0, 0.4, (B, N))
    phi = rng.normal(0, 0.4, (B, N))
    counts = rng.integers(3, N, B)
    mask = (np.arange(N)[None] < counts[:, None]).astype(np.int64)
    pt = pt * mask
    return pt, eta * mask, phi * mask, mask


def test_native_library_builds():
    assert load_substructure_lib() is not None, "g++ build of the native lib failed"


def test_native_matches_numpy():
    pt, eta, phi, mask = _random_jets()
    obs_native = substructure_observables(pt, eta, phi, mask, use_native=True)
    obs_numpy = substructure_observables(pt, eta, phi, mask, use_native=False)
    for key in ("tau1", "tau2", "tau3", "tau21", "tau32", "d2"):
        np.testing.assert_allclose(
            obs_native[key], obs_numpy[key], rtol=1e-6, atol=1e-9, err_msg=key
        )
    np.testing.assert_array_equal(obs_native["selection"], obs_numpy["selection"])


def test_two_prong_jet_has_small_tau2():
    """A jet made of two narrow clusters: tau2 << tau1."""
    rng = np.random.default_rng(1)
    n = 40
    half = n // 2
    eta = np.concatenate([rng.normal(-0.4, 0.01, half), rng.normal(0.4, 0.01, half)])
    phi = rng.normal(0.0, 0.01, n)
    pt = np.abs(rng.normal(10, 1, n))
    axes1, _ = exclusive_kt_axes(pt, eta, phi, 1)
    axes2, _ = exclusive_kt_axes(pt, eta, phi, 2)
    tau1 = nsubjettiness(pt, eta, phi, axes1)
    tau2 = nsubjettiness(pt, eta, phi, axes2)
    assert tau2 < 0.2 * tau1
    # the two exclusive axes recover the two clusters
    assert abs(abs(axes2[0][0]) - 0.4) < 0.05
    assert abs(abs(axes2[1][0]) - 0.4) < 0.05


def test_d2_discriminates_two_prong():
    """D2 = ECF3·ECF1³/ECF2³ is LOW for genuine 2-prong structure and HIGH
    for 1-prong jets (the arXiv:1409.6298 discriminant behavior)."""
    rng = np.random.default_rng(2)
    n = 30
    pt = np.abs(rng.normal(10, 1, n))
    one_prong = d2_correlator(
        pt, rng.normal(0, 0.05, n), rng.normal(0, 0.05, n)
    )
    eta2 = np.concatenate([rng.normal(-0.4, 0.01, 15), rng.normal(0.4, 0.01, 15)])
    phi2 = rng.normal(0.0, 0.01, n)
    two_prong = d2_correlator(pt, eta2, phi2)
    assert two_prong < one_prong
