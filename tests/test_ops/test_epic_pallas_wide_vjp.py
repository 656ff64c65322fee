"""Gradient parity: wide custom-VJP fused Pallas EPiC
(ops/epic_pallas_wide_vjp.py) vs jax.grad of the identical row-major
forward arithmetic, at the --scaled backbone widths."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_particles_tpu import test_resources_dir
from multimodal_particles_tpu.config_classes import MultimodalBridgeMatchingConfig
from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
    JetsDataloaderModule,
)
from multimodal_particles_tpu.models.generative.multimodal_bridge_matching import (
    MultiModalBridgeMatching,
)
from multimodal_particles_tpu.models.generative.states import HybridState
from multimodal_particles_tpu.ops.epic_pallas import WEIGHT_NAMES
from multimodal_particles_tpu.ops.epic_pallas_wide import (
    pack_wide_encoder_params,
)
from multimodal_particles_tpu.ops.epic_pallas_wide_vjp import (
    make_epic_train_forward_wide,
)

CONFIG_PATH = os.path.join(test_resources_dir, "configs_files", "config-mbm-test.yaml")
B, N = 8, 16


@pytest.fixture(scope="module")
def setup():
    cfg = MultimodalBridgeMatchingConfig.from_yaml(CONFIG_PATH)
    cfg.data.batch_size = B
    cfg.data.max_num_particles = N
    cfg.encoder.num_blocks = 2  # keep the CPU interpret run cheap
    cfg.encoder.dim_hidden_local = 128
    cfg.encoder.dim_hidden_glob = 128
    cfg.encoder.dim_emb_time = 128
    cfg.encoder.dim_emb_features_continuous = 128
    cfg.encoder.dim_emb_features_discrete = 128
    batch = jax.tree_util.tree_map(
        jnp.asarray, JetsDataloaderModule.random_databatch(cfg)
    )
    model = MultiModalBridgeMatching(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)

    key = jax.random.PRNGKey(1)
    t = jax.random.uniform(key, (B, 1, 1))
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, N, 3))
    k = jax.random.randint(jax.random.fold_in(key, 2), (B, N, 1), 0, 8)
    mask = jax.random.randint(jax.random.fold_in(key, 3), (B, N, 1), 0, 2).astype(
        jnp.float32
    )
    fused = make_epic_train_forward_wide(
        num_blocks=cfg.encoder.num_blocks,
        use_skip=cfg.encoder.skip_connection,
        add_discrete_head=cfg.encoder.add_discrete_head,
        dim_c=3,
        vocab=8,
        hidden=cfg.encoder.dim_hidden_local,
        dim_emb_time=cfg.encoder.dim_emb_time,
        interpret=True,
    )
    return cfg, model, params, batch, fused, (t, x, k, mask)


def test_forward_value_matches_flax(setup):
    cfg, model, params, batch, fused, inputs = setup
    t, x, k, mask = inputs
    packed = pack_wide_encoder_params(params["encoder"], cfg.encoder.num_blocks)
    out = fused(packed, t, x, k, mask)
    state = HybridState(time=t, continuous=x, discrete=k, absorbing=mask)
    heads = model.forward(params, state, batch)
    ref = jnp.concatenate([heads.continuous, heads.discrete], axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_weight_gradients_match_autodiff(setup):
    """Hand-written wide backward kernel vs jax.grad of the IDENTICAL
    row-major forward arithmetic (_forward_acts_wide) — same rationale as
    the narrow test (kinked activations make flax-autodiff comparison
    ill-posed at random init)."""
    from multimodal_particles_tpu.models.architectures.utils import (
        sinusoidal_positional_encoding,
    )
    from multimodal_particles_tpu.ops.epic_pallas_wide import _forward_acts_wide

    cfg, model, params, batch, fused, inputs = setup
    t, x, k, mask = inputs
    w = jax.random.normal(jax.random.PRNGKey(5), (B, N, 11))
    packed = tuple(
        pack_wide_encoder_params(params["encoder"], cfg.encoder.num_blocks)
    )

    temb = sinusoidal_positional_encoding(
        t.reshape(B).astype(jnp.float32), cfg.encoder.dim_emb_time
    )
    xR = x.astype(jnp.float32).reshape(B * N, 3)
    kR = k.reshape(B * N, 1).astype(jnp.int32)
    maskR = mask.astype(jnp.float32).reshape(B * N, 1)

    def loss_kernel(packed):
        out = fused(packed, t, x, k, mask)
        return jnp.sum(out * w)

    def loss_jnp(packed):
        W = dict(zip(WEIGHT_NAMES, packed))
        cont, disc, _ = _forward_acts_wide(
            xR, kR, maskR, temb, W,
            TB=B, N=N, vocab=8,
            num_blocks=cfg.encoder.num_blocks,
            use_skip=cfg.encoder.skip_connection,
        )
        out = jnp.concatenate([cont, disc], axis=1).reshape(B, N, 11)
        return jnp.sum(out * w)

    v_k, g_k = jax.value_and_grad(loss_kernel)(packed)
    v_j, g_j = jax.value_and_grad(loss_jnp)(packed)
    np.testing.assert_allclose(float(v_k), float(v_j), rtol=1e-5)

    for name, ga, gb in zip(WEIGHT_NAMES, g_k, g_j):
        scale = max(float(np.abs(np.asarray(gb)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(ga),
            np.asarray(gb),
            atol=1e-4 * scale,
            rtol=1e-3,
            err_msg=f"grad mismatch at {name}",
        )


def test_forward_train_dispatches_wide(setup):
    """MultiModalBridgeMatching.forward_train at scaled widths with
    use_pallas=True routes through the wide custom-VJP pair and its loss
    gradient is finite/nonzero."""
    cfg, model, params, batch, fused, inputs = setup
    cfg.parallel.use_pallas = True
    assert model._wide_pallas_enabled() and not model._pallas_enabled()
    try:
        t, x, k, mask = inputs
        state = HybridState(time=t, continuous=x, discrete=k, absorbing=mask)

        def loss(p):
            heads = model.forward_train(p, state, batch)
            return jnp.sum(heads.continuous**2) + jnp.sum(heads.discrete**2)

        val, grads = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(val))
        leaves = jax.tree_util.tree_leaves(grads["encoder"])
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        assert sum(float(np.abs(np.asarray(g)).sum()) for g in leaves) > 0
    finally:
        cfg.parallel.use_pallas = "auto"
        model._train_fused_cache = None


def test_gradients_flow_through_weight_norm(setup):
    """End-to-end: d(loss)/d(v, g) through pack_wide_encoder_params is
    finite and nonzero for every parameter leaf."""
    cfg, model, params, batch, fused, inputs = setup
    t, x, k, mask = inputs

    def loss(enc_params):
        packed = pack_wide_encoder_params(enc_params, cfg.encoder.num_blocks)
        out = fused(packed, t, x, k, mask)
        return jnp.sum(out**2)

    grads = jax.grad(loss)(params["encoder"])
    for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
        g = np.asarray(g)
        assert np.isfinite(g).all(), jax.tree_util.keystr(path)
        assert np.abs(g).sum() > 0, jax.tree_util.keystr(path)
