"""Statistics of the device-side source sampler used by the bulk sweep."""

import jax
import numpy as np

from multimodal_particles_tpu.config_classes import MultimodalBridgeMatchingConfig
from multimodal_particles_tpu.parallel.bulk_sampling import (
    make_device_source_sampler,
    token_probs_from_cat_probs,
)


def test_token_probs_mapping():
    p = token_probs_from_cat_probs([0.2, 0.2, 0.2, 0.2, 0.2])
    np.testing.assert_allclose(p, [0.2, 0.2, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1])
    assert abs(p.sum() - 1.0) < 1e-12


def test_device_source_statistics():
    cfg = MultimodalBridgeMatchingConfig()
    cfg.data.max_num_particles = 32
    hist = {8: 10, 16: 30, 24: 60}
    sampler = jax.jit(make_device_source_sampler(cfg, 4096, hist))
    batch = sampler(jax.random.PRNGKey(0))

    # multiplicities follow the histogram
    mult = np.asarray(batch.source_mask[..., 0].sum(1))
    vals, counts = np.unique(mult, return_counts=True)
    assert set(vals) == {8, 16, 24}
    freqs = dict(zip(vals, counts / counts.sum()))
    assert abs(freqs[24] - 0.6) < 0.03
    assert abs(freqs[16] - 0.3) < 0.03

    # token marginals follow the flavor⊗charge law on valid particles
    tokens = np.asarray(batch.source_discrete[..., 0])
    valid = np.asarray(batch.source_mask[..., 0]) > 0
    t = tokens[valid]
    freq = np.bincount(t, minlength=8) / len(t)
    np.testing.assert_allclose(freq, [0.2, 0.2, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1], atol=0.01)

    # kinematics are standard normal where valid, zero where masked
    x = np.asarray(batch.source_continuous)
    assert abs(x[valid].std() - 1.0) < 0.02
    assert (x[~valid] == 0).all()
