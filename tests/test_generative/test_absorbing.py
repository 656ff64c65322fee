"""AbsorbingFlow tests: bridge boundary conditions, head/loss smoke, solver
step and full dynamics (reference test style:
tests/test_generative/test_absorbing.py:18-80)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_particles_tpu import test_resources_dir
from multimodal_particles_tpu.config_classes import AbsorbingConfig
from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
    JetsDataloaderModule,
)
from multimodal_particles_tpu.models.generative.absorbing.absorbing_flows import (
    AbsorbingFlow,
)

CONFIG_PATH = os.path.join(
    test_resources_dir, "configs_files", "config-absorbing-test.yaml"
)


def _jnp_batch(batch):
    return type(batch)(*[jnp.asarray(v) if v is not None else None for v in batch])


@pytest.fixture(scope="module")
def setup():
    cfg = AbsorbingConfig.from_yaml(CONFIG_PATH)
    cfg.data.batch_size = 8
    cfg.data.max_num_particles = 24
    cfg.bridge.num_timesteps = 8
    cfg.generator.transformer_dim = 32
    cfg.generator.n_attn_blocks = 1
    batch = _jnp_batch(JetsDataloaderModule.random_databatch(cfg))
    model = AbsorbingFlow(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    return cfg, model, params, batch


def test_absorbing_bridge_boundaries(setup):
    """At t≈1 the bridge mask equals the target; at t≈0 all are alive
    (reference: test_absorbing.py:18-45)."""
    cfg, model, params, batch = setup
    B = batch.target_continuous.shape[0]
    t1 = jnp.full((B, 1, 1), 1.0 - 1e-7)
    m1 = model.bridge_absorbing.sample(jax.random.PRNGKey(1), t1, batch.target_mask)
    assert (np.asarray(m1) == np.asarray(batch.target_mask)).all()
    t0 = jnp.zeros((B, 1, 1))
    m0 = model.bridge_absorbing.sample(jax.random.PRNGKey(2), t0, batch.target_mask)
    assert (np.asarray(m0) == 1).all()


def test_heads_shapes(setup):
    cfg, model, params, batch = setup
    state = model.sample_bridges(jax.random.PRNGKey(3), batch)
    heads = model.forward(params, state, batch)
    B, N = batch.target_continuous.shape[:2]
    assert heads.continuous.shape == (B, N, 3)
    assert heads.discrete.shape == (B, N, 8)
    assert heads.absorbing.shape == (B, N, 1)


def test_losses_finite_with_grads(setup):
    cfg, model, params, batch = setup
    (loss, metrics), grads = jax.value_and_grad(model.loss_fn, has_aux=True)(
        params, jax.random.PRNGKey(4), batch
    )
    assert np.isfinite(float(loss))
    for name in ("loss_continuous", "loss_discrete", "loss_absorbing"):
        assert np.isfinite(float(metrics[name]))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert params["loss_weights"].shape == (3,)


def test_solver_step(setup):
    cfg, model, params, batch = setup
    state = model.sample_bridges(jax.random.PRNGKey(5), batch)
    heads = model.forward(params, state, batch)
    new_state = model.bridge_absorbing.solver_step(
        jax.random.PRNGKey(6), state, heads, 0.01
    )
    # one-way births: no alive particle dies
    assert (np.asarray(new_state.mask_t) >= np.asarray(state.mask_t)).all()


def test_simulate_dynamics(setup):
    cfg, model, params, batch = setup
    final = jax.jit(model.predict)(params, batch, jax.random.PRNGKey(7))
    B, N = batch.target_continuous.shape[:2]
    assert final.continuous.shape == (B, N, 3)
    assert np.isfinite(np.asarray(final.continuous)).all()
    mask = np.asarray(final.mask_t)
    assert ((mask == 0) | (mask == 1)).all()
    tokens = np.asarray(final.discrete)
    assert (tokens >= 0).all() and (tokens < 8).all()


def test_bce_matches_definition(setup):
    """BCE-with-logits golden: compare against -[y log σ(x) + (1-y) log(1-σ(x))]."""
    cfg, model, params, batch = setup
    state = model.sample_bridges(jax.random.PRNGKey(8), batch)
    heads = model.forward(params, state, batch)
    got = float(model.loss_absorbing(heads, batch))
    x = np.asarray(heads.absorbing).reshape(-1).astype(np.float64)
    y = np.asarray(batch.target_mask).reshape(-1).astype(np.float64)
    p = 1 / (1 + np.exp(-x))
    expected = float(np.mean(-(y * np.log(p) + (1 - y) * np.log1p(-p))))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_absorbing_sample_target_dropout_schedule():
    """Source-consistent augmentation: with target_dropout=d, a target slot
    at time t is DEAD w.p. d*SP(t), so P(alive | target) = 1 - d*SP(t)
    (1-d at t=0 — the under-init regime — rising to 1 at t=1); d=0 keeps
    the reference semantics (target slots always alive) on the identical
    random stream."""
    import jax

    from multimodal_particles_tpu.models.generative.bridges import (
        absorbing_sample,
        absorbing_survival_probability,
    )

    B, N, gamma, d = 40_000, 8, 0.125, 0.5
    key = jax.random.PRNGKey(0)
    target = jnp.ones((B, N, 1), jnp.int32)
    for t in (0.2, 0.5, 0.8):
        tt = jnp.full((B, 1, 1), t)
        sp = float(absorbing_survival_probability(jnp.float32(t), gamma))
        m = np.asarray(absorbing_sample(key, tt, target, gamma, d))
        p_alive = m.mean()
        expected = 1.0 - d * sp
        assert abs(p_alive - expected) < 0.01, (t, p_alive, expected)

    # d=0 is bit-identical to the reference-semantics call
    tt = jnp.full((B, 1, 1), 0.5)
    tgt = (jax.random.uniform(jax.random.PRNGKey(1), (B, N, 1)) < 0.3).astype(
        jnp.int32
    )
    a = np.asarray(absorbing_sample(key, tt, tgt, gamma))
    b = np.asarray(absorbing_sample(key, tt, tgt, gamma, 0.0))
    np.testing.assert_array_equal(a, b)
    # target slots are never dead without dropout
    assert (a[np.asarray(tgt) > 0] == 1).all()


def test_absorbing_death_channel_marginal_matching():
    """Opt-in death channel (beyond the reference): with p(target)=0 the
    death rate is the bridge's own conditional hazard h(t) = -d/dt log SP,
    so an alive non-target slot's survival through the solver must track
    the bridge marginal SP(t) itself (absorbing_death_hazard docstring)."""
    from multimodal_particles_tpu.models.generative.bridges import (
        absorbing_death_hazard,
        absorbing_step,
        absorbing_survival_probability,
    )

    B, N, gamma, steps = 20_000, 4, 0.125, 200
    ts = np.linspace(0.0, 0.5, steps + 1)
    dt = float(ts[1] - ts[0])
    mask = jnp.ones((B, N, 1), jnp.int32)
    key = jax.random.PRNGKey(0)
    for t in ts[:-1]:
        h = absorbing_death_hazard(jnp.float32(t), gamma)
        key, k = jax.random.split(key)
        mask = absorbing_step(
            k, mask, jnp.zeros((B, N, 1)), dt,
            death_rates=jnp.full((B, N, 1), h),
        )
    survival = float(np.asarray(mask).mean())
    expected = float(absorbing_survival_probability(jnp.float32(0.5), gamma))
    assert abs(survival - expected) < 0.02, (survival, expected)


def test_absorbing_death_channel_solver_semantics(setup):
    """scale=0 keeps the reference's birth-only step bit-exactly; scale>0
    with a confident head (|logit| large) kills exactly the head-rejected
    alive slots by late time and never the accepted ones."""
    from dataclasses import replace as dc_replace

    cfg, model, params, batch = setup
    state = model.sample_bridges(jax.random.PRNGKey(11), batch)
    heads = model.forward(params, state, batch)

    bridge0 = model.bridge_absorbing
    assert bridge0.death_rate_scale == 0.0
    ref = bridge0.solver_step(jax.random.PRNGKey(12), state, heads, 0.01)
    again = dc_replace(bridge0, death_rate_scale=0.0).solver_step(
        jax.random.PRNGKey(12), state, heads, 0.01
    )
    np.testing.assert_array_equal(np.asarray(ref.mask_t), np.asarray(again.mask_t))

    # confident head: +20 logits on even slots, -20 on odd slots
    N = state.mask_t.shape[1]
    logits = jnp.where(
        (jnp.arange(N) % 2 == 0)[None, :, None], 20.0, -20.0
    ) * jnp.ones_like(heads.absorbing)
    heads_conf = heads.replace(absorbing=logits)
    bridge = dc_replace(bridge0, death_rate_scale=1.0)
    # late time: hazard*dt large -> rejected alive slots must die
    late = state.replace(time=jnp.full_like(state.time, 0.999))
    out = bridge.solver_step(jax.random.PRNGKey(13), late, heads_conf, 0.05)
    alive_before = np.asarray(state.mask_t) > 0
    mask_after = np.asarray(out.mask_t)
    even = (np.arange(N) % 2 == 0)[None, :, None] & alive_before
    odd = (np.arange(N) % 2 == 1)[None, :, None] & alive_before
    assert (mask_after[even] == 1).all()  # accepted slots never die
    assert (mask_after[odd] == 0).all()  # rejected slots dead at t->1
