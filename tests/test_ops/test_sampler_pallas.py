"""Fully-fused sampler step: elementwise parity (interpret mode) against the
composition of the existing pieces, and full-trajectory statistical parity."""

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
from multimodal_particles_tpu.ops.epic_pallas import (
    _weights_dict,
    pack_mbm_encoder_params,
)
from multimodal_particles_tpu.ops.sampler_pallas import (
    _step_math,
    _time_embedding_col,
    fused_simulate_dynamics,
    make_fused_sampler_step,
)

CONFIG_PATH = os.path.join(test_resources_dir, "configs_files", "config-mbm-test.yaml")


@pytest.fixture(scope="module")
def setup():
    cfg = MultimodalBridgeMatchingConfig.from_yaml(CONFIG_PATH)
    cfg.data.batch_size = 8
    cfg.data.max_num_particles = 16
    cfg.bridge.num_timesteps = 8
    batch = jax.tree_util.tree_map(
        jnp.asarray, JetsDataloaderModule.random_databatch(cfg)
    )
    model = MultiModalBridgeMatching(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    return cfg, model, params, batch


def test_time_embedding_matches_host_encoding():
    from multimodal_particles_tpu.models.architectures.utils import (
        sinusoidal_positional_encoding,
    )

    t = 0.37
    col = np.asarray(_time_embedding_col(jnp.float32(t), 16))[:, 0]
    ref = np.asarray(sinusoidal_positional_encoding(jnp.array([t]), 16))[0]
    np.testing.assert_allclose(col, ref, atol=1e-6)


def test_step_kernel_matches_reference_composition(setup):
    """One fused step (interpret) == flax forward + Euler + telegraph jump
    with the SAME uniforms."""
    cfg, model, params, batch = setup
    B, N, dim_c = 8, 16, 3
    rows = B * N
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, N, dim_c))
    k = jax.random.randint(jax.random.fold_in(key, 1), (B, N, 1), 0, 8)
    mask = jax.random.randint(jax.random.fold_in(key, 2), (B, N, 1), 0, 2).astype(
        jnp.float32
    )
    u = jax.random.uniform(jax.random.fold_in(key, 3), (2, rows))
    t, dt = 0.45, 0.01

    packed = pack_mbm_encoder_params(params["encoder"], cfg.encoder.num_blocks)
    make_for = make_fused_sampler_step(
        num_blocks=cfg.encoder.num_blocks,
        use_skip=cfg.encoder.skip_connection,
        add_discrete_head=cfg.encoder.add_discrete_head,
        dim_c=dim_c,
        vocab=8,
        gamma=cfg.bridge.gamma,
        dim_emb_time=cfg.encoder.dim_emb_time,
        interpret=True,
    )
    step_fn = make_for(N, B)
    xT = x.reshape(rows, dim_c).T
    kT = k.reshape(1, rows).astype(jnp.int32)
    maskT = mask.reshape(1, rows)
    x_new_T, k_new_T = step_fn(packed, xT, kT, maskT, u, t, dt)
    x_new = np.asarray(x_new_T.T.reshape(B, N, dim_c))
    k_new = np.asarray(k_new_T.reshape(B, N, 1))

    # reference composition (flax forward + solver math with same uniforms)
    state = HybridState(
        time=jnp.full((B, 1, 1), t), continuous=x, discrete=k, absorbing=mask
    )
    heads = model.forward(params, state, batch)
    x_ref = np.asarray((x + dt * heads.continuous) * mask)

    from multimodal_particles_tpu.models.generative import bridges as br

    S = 8
    rates = br.telegraph_rate(jnp.full((B, 1, 1), t), k, heads.discrete, 0.125, S)
    lam = np.asarray(rates) * dt
    lam_tot = lam.sum(-1)
    u_r = np.asarray(u).reshape(2, B, N)
    do_jump = u_r[0] < lam_tot * np.exp(-lam_tot)
    cdf = np.cumsum(lam, -1)
    target = (u_r[1][..., None] * lam_tot[..., None] >= cdf).sum(-1).clip(0, S - 1)
    k_ref = np.where(do_jump, target, np.asarray(k[..., 0]))
    k_ref = (k_ref * np.asarray(mask[..., 0])).astype(np.int64)[..., None]

    np.testing.assert_allclose(x_new, x_ref, atol=2e-4, rtol=2e-4)
    mismatches = (k_new != k_ref).mean()
    # float-order tie-breaks at cdf boundaries can flip rare draws
    assert mismatches < 0.01, f"token mismatch rate {mismatches}"


def test_fused_trajectory_statistics(setup):
    """Full fused trajectory vs the standard simulate_dynamics: same
    marginal statistics (same trained-params dynamics, different RNG)."""
    cfg, model, params, batch = setup
    final_std = model.predict(params, batch, jax.random.PRNGKey(5))

    state0 = HybridState(
        time=jnp.zeros((8, 1, 1)),
        continuous=batch.source_continuous,
        discrete=batch.source_discrete,
        absorbing=batch.source_mask.astype(jnp.float32),
    )
    final_fused = fused_simulate_dynamics(
        model, params, state0, batch, jax.random.PRNGKey(6)
    )
    a = np.asarray(final_std.continuous)
    b = np.asarray(final_fused.continuous)
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a.mean(), b.mean(), atol=0.1)
    np.testing.assert_allclose(a.std(), b.std(), rtol=0.1)
    tokens = np.asarray(final_fused.discrete)
    assert (tokens >= 0).all() and (tokens < 8).all()
