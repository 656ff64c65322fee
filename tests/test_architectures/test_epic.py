"""EPiC backbone tests: shapes, permutation equivariance, mask invariance.

(The reference ships an empty test_epic.py — SURVEY.md §4 calls for filling
this gap.)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_particles_tpu import test_resources_dir
from multimodal_particles_tpu.config_classes import MultimodalBridgeMatchingConfig
from multimodal_particles_tpu.models.architectures.epic import EPiCWrapper
from multimodal_particles_tpu.models.architectures.utils import (
    WeightNormDense,
    sinusoidal_positional_encoding,
)

CONFIG_PATH = os.path.join(test_resources_dir, "configs_files", "config-mbm-test.yaml")


def _setup(B=4, N=16):
    cfg = MultimodalBridgeMatchingConfig.from_yaml(CONFIG_PATH)
    model = EPiCWrapper(cfg)
    key = jax.random.PRNGKey(0)
    t = jnp.full((B, 1, 1), 0.3)
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, N, 3))
    k = jax.random.randint(jax.random.fold_in(key, 2), (B, N, 1), 0, 8)
    mask = jax.random.randint(jax.random.fold_in(key, 3), (B, N, 1), 0, 2).astype(
        jnp.float32
    )
    params = model.init(key, t, x, k, mask)["params"]
    return cfg, model, params, (t, x, k, mask)


def test_output_shape():
    cfg, model, params, (t, x, k, mask) = _setup()
    out = model.apply({"params": params}, t, x, k, mask)
    assert out.shape == (x.shape[0], x.shape[1], 3 + 8)
    # masked particles produce zero output
    assert (np.asarray(out) * np.asarray(1 - mask) == 0).all()


def test_permutation_equivariance():
    cfg, model, params, (t, x, k, mask) = _setup()
    out = model.apply({"params": params}, t, x, k, mask)
    perm = jax.random.permutation(jax.random.PRNGKey(9), x.shape[1])
    out_perm = model.apply(
        {"params": params}, t, x[:, perm], k[:, perm], mask[:, perm]
    )
    np.testing.assert_allclose(
        np.asarray(out[:, perm]), np.asarray(out_perm), atol=1e-5
    )


def test_mask_invariance():
    """Changing features of masked-out particles must not change the output."""
    cfg, model, params, (t, x, k, mask) = _setup()
    out = model.apply({"params": params}, t, x, k, mask)
    x2 = x + 100.0 * (1 - mask)  # perturb only masked slots
    k2 = jnp.where(mask > 0, k, (k + 3) % 8)
    out2 = model.apply({"params": params}, t, x2, k2, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_hidden_local_output():
    cfg, model, params, (t, x, k, mask) = _setup()
    out, hidden = model.apply(
        {"params": params}, t, x, k, mask, output_hidden_local=True
    )
    assert hidden.shape == (x.shape[0], x.shape[1], cfg.encoder.dim_hidden_local)


def test_weight_norm_dense_matches_plain_dense_at_init():
    """At init g = ||v||, so WN-dense equals x @ v + b."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (5, 7))
    layer = WeightNormDense(11)
    params = layer.init(key, x)["params"]
    out = layer.apply({"params": params}, x)
    expected = x @ params["v"] + params["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_sinusoidal_encoding_shape_and_range():
    emb = sinusoidal_positional_encoding(jnp.linspace(0, 1, 4), 16)
    assert emb.shape == (4, 16)
    assert (np.abs(np.asarray(emb)) <= 1.0 + 1e-6).all()
    # cos-first convention: at t=0 the first half is 1, second half 0
    np.testing.assert_allclose(np.asarray(emb[0, :8]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 8:]), 0.0, atol=1e-6)
