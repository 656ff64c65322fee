"""Gradient parity: custom-VJP fused Pallas EPiC vs jax.grad of the flax
stack (values and all weight cotangents)."""

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
from multimodal_particles_tpu.ops.epic_pallas import pack_mbm_encoder_params
from multimodal_particles_tpu.ops.epic_pallas_vjp import make_epic_train_forward

CONFIG_PATH = os.path.join(test_resources_dir, "configs_files", "config-mbm-test.yaml")


@pytest.fixture(scope="module")
def setup():
    cfg = MultimodalBridgeMatchingConfig.from_yaml(CONFIG_PATH)
    cfg.data.batch_size = 8
    cfg.data.max_num_particles = 16
    batch = jax.tree_util.tree_map(
        jnp.asarray, JetsDataloaderModule.random_databatch(cfg)
    )
    model = MultiModalBridgeMatching(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)

    key = jax.random.PRNGKey(1)
    B, N = 8, 16
    t = jax.random.uniform(key, (B, 1, 1))
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, N, 3))
    k = jax.random.randint(jax.random.fold_in(key, 2), (B, N, 1), 0, 8)
    mask = jax.random.randint(jax.random.fold_in(key, 3), (B, N, 1), 0, 2).astype(
        jnp.float32
    )
    fused = make_epic_train_forward(
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


def _flax_out(model, params, inputs, batch):
    t, x, k, mask = inputs
    state = HybridState(time=t, continuous=x, discrete=k, absorbing=mask)
    heads = model.forward(params, state, batch)
    return jnp.concatenate([heads.continuous, heads.discrete], axis=-1)


def test_forward_value_matches(setup):
    cfg, model, params, batch, fused, inputs = setup
    t, x, k, mask = inputs
    packed = pack_mbm_encoder_params(params["encoder"], cfg.encoder.num_blocks)
    out = fused(packed, t, x, k, mask)
    ref = _flax_out(model, params, inputs, batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_weight_gradients_match_autodiff(setup):
    """Hand-written backward kernel vs jax.grad of the IDENTICAL forward
    arithmetic (`_forward_acts`). Comparing against flax autodiff instead is
    ill-posed at random init: leaky/selu derivative kinks flip under the
    ~1e-6 forward-order differences between implementations, moving
    cancellation-heavy bias grads by O(1) (verified in float64)."""
    from multimodal_particles_tpu.ops.epic_pallas_vjp import (
        _forward_acts,
        _layout,
        _weights_dict,
    )

    cfg, model, params, batch, fused, inputs = setup
    t, x, k, mask = inputs
    w = jax.random.normal(jax.random.PRNGKey(5), (8, 16, 11))
    packed = tuple(
        pack_mbm_encoder_params(params["encoder"], cfg.encoder.num_blocks)
    )
    xT, kT, maskT, tembT = _layout(t, x, k, mask, cfg.encoder.dim_emb_time)

    def loss_kernel(packed):
        out = fused(packed, t, x, k, mask)
        return jnp.sum(out * w)

    def loss_jnp(packed):
        W = _weights_dict(packed)
        cont, disc, _ = _forward_acts(
            xT, kT, maskT, tembT, W,
            TB=8, N=16, vocab=8,
            num_blocks=cfg.encoder.num_blocks,
            use_skip=cfg.encoder.skip_connection,
        )
        out = jnp.concatenate([cont, disc], axis=0).T.reshape(8, 16, 11)
        return jnp.sum(out * w)

    v_k, g_k = jax.value_and_grad(loss_kernel)(packed)
    v_j, g_j = jax.value_and_grad(loss_jnp)(packed)
    np.testing.assert_allclose(float(v_k), float(v_j), rtol=1e-5)

    from multimodal_particles_tpu.ops.epic_pallas_vjp import WEIGHT_NAMES

    for name, ga, gb in zip(WEIGHT_NAMES, g_k, g_j):
        scale = max(float(np.abs(np.asarray(gb)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(ga),
            np.asarray(gb),
            atol=1e-4 * scale,
            rtol=1e-3,
            err_msg=f"grad mismatch at {name}",
        )


def test_gradients_flow_through_weight_norm(setup):
    """End-to-end: d(loss)/d(v, g) through pack_mbm_encoder_params is finite
    and nonzero for every parameter leaf."""
    cfg, model, params, batch, fused, inputs = setup
    t, x, k, mask = inputs

    def loss(enc_params):
        packed = pack_mbm_encoder_params(enc_params, cfg.encoder.num_blocks)
        out = fused(packed, t, x, k, mask)
        return jnp.sum(out**2)

    grads = jax.grad(loss)(params["encoder"])
    for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
        g = np.asarray(g)
        assert np.isfinite(g).all(), jax.tree_util.keystr(path)
        assert np.abs(g).sum() > 0, jax.tree_util.keystr(path)
