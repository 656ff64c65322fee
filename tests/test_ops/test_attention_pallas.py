"""Parity + gradient tests for the fused attention core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_particles_tpu.models.architectures.gsdm import AttnBlock
from multimodal_particles_tpu.ops.attention_pallas import (
    _core_jnp,
    attention_core_pallas,
)


@pytest.mark.parametrize("B,N,C,heads", [(8, 128, 128, 2), (4, 109, 128, 2), (8, 64, 128, 1)])
def test_core_matches_einsum(B, N, C, heads):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, N, C))
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, N, C))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, N, C))
    mask = jax.random.randint(jax.random.fold_in(key, 3), (B, N, 1), 0, 2)

    out_k = attention_core_pallas(q, k, v, mask, n_heads=heads, interpret=True)
    bias = jnp.where(mask[..., 0] > 0, 0.0, -1e9)[:, None, :]
    out_ref = _core_jnp(q, k, v, bias, heads)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref), atol=2e-5)


def test_core_no_mask():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (4, 32, 128))
    k = jax.random.normal(jax.random.fold_in(key, 1), (4, 32, 128))
    v = jax.random.normal(jax.random.fold_in(key, 2), (4, 32, 128))
    out_k = attention_core_pallas(q, k, v, None, n_heads=2, interpret=True)
    bias = jnp.zeros((4, 1, 32))
    out_ref = _core_jnp(q, k, v, bias, 2)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref), atol=2e-5)


def test_gradients_flow():
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (4, 32, 128))
    k = jax.random.normal(jax.random.fold_in(key, 1), (4, 32, 128))
    v = jax.random.normal(jax.random.fold_in(key, 2), (4, 32, 128))

    def loss_kernel(q, k, v):
        return jnp.sum(
            attention_core_pallas(q, k, v, None, n_heads=2, interpret=True) ** 2
        )

    def loss_ref(q, k, v):
        bias = jnp.zeros((4, 1, 32))
        return jnp.sum(_core_jnp(q, k, v, bias, 2) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)


def test_attn_block_pallas_matches_einsum_path():
    """Full AttnBlock module: use_pallas=True (interpret) vs False."""
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (4, 64, 128))
    mask = jax.random.randint(jax.random.fold_in(key, 1), (4, 64, 1), 0, 2).astype(
        jnp.float32
    )
    block_ref = AttnBlock(128, n_heads=2, use_pallas=False)
    params = block_ref.init(jax.random.PRNGKey(4), x, mask)["params"]
    out_ref = block_ref.apply({"params": params}, x, mask)

    import multimodal_particles_tpu.ops.attention_pallas as ap
    import functools
    orig = ap._pallas_core
    ap_interp = functools.partial(orig, interpret=True)
    try:
        ap._pallas_core = lambda q, k, v, bias, n_heads, interpret: orig(
            q, k, v, bias, n_heads, True
        )
        block_pal = AttnBlock(128, n_heads=2, use_pallas=True)
        out_pal = block_pal.apply({"params": params}, x, mask)
    finally:
        ap._pallas_core = orig
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref), atol=2e-5)
