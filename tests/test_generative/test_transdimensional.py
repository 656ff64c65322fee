"""Transdimensional jump-diffusion tests: config round-trip, mask-based
structure algebra, forward noising stats, full net pass, training loss and
sampler smoke (reference test style:
tests/test_generative/test_transdimensional.py — whose loss test is SKIPPED
upstream; here the loss runs and is asserted finite)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_particles_tpu.config_classes.transdimensional_unconditional_config import (
    TransdimensionalEpicConfig,
)
from multimodal_particles_tpu.data.particle_clouds.jets import JetDataclass
from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
    JetsDataloaderModule,
)
from multimodal_particles_tpu.models.generative.diffusion.noising import (
    ConstForwardRate,
    StepForwardRate,
    VP_SDE,
    get_rate_using_x0_pred,
)
from multimodal_particles_tpu.models.generative.transdimensional.structure import (
    StructuredState,
    adjust_state,
    get_nearest_atom,
    state_from_list_batch,
)
from multimodal_particles_tpu.models.generative.transdimensional.transdimensional_model import (
    TransdimensionalJumpDiffusion,
)


def _small_config():
    cfg = TransdimensionalEpicConfig()
    cfg.data.return_type = "list"
    cfg.data.num_jets = 100
    cfg.data.max_num_particles = 24
    cfg.data.batch_size = 8
    cfg.encoder.transformer_dim = 32
    cfg.encoder.n_attn_blocks = 1
    cfg.sampler_kwargs.dt = 0.05  # 20-step sampler for tests
    return cfg


@pytest.fixture(scope="module")
def datamodule():
    cfg = _small_config()
    jets = JetDataclass(config=cfg)
    jets.preprocess()
    return cfg, JetsDataloaderModule(config=cfg, jetdataset=jets)


@pytest.fixture(scope="module")
def model_and_batch(datamodule):
    cfg, dm = datamodule
    batch = next(iter(dm.train))
    model = TransdimensionalJumpDiffusion(cfg, dm)
    state = state_from_list_batch(batch)
    params = model.init(jax.random.PRNGKey(0), state)
    return cfg, model, params, state


def test_config_roundtrip(tmp_path):
    cfg = TransdimensionalEpicConfig()
    path = str(tmp_path / "transepic.yaml")
    cfg.to_yaml(path)
    cfg2 = TransdimensionalEpicConfig.from_yaml(path)
    assert cfg2.loss_kwargs.rate_function_name == cfg.loss_kwargs.rate_function_name
    assert cfg2.sampler_kwargs.dt == cfg.sampler_kwargs.dt


def test_reference_transepic_yaml_loads():
    cfg = TransdimensionalEpicConfig.from_yaml(
        "/root/reference/configs_files/config-transepic-berlin.yaml"
    )
    assert cfg.encoder.name == "TransdimensionalEPiC"
    assert cfg.loss_kwargs.rate_cut_t == 0.1


def test_list_batch_shapes(datamodule):
    cfg, dm = datamodule
    batch = next(iter(dm.train))
    n_particles, cont, disc = batch[0], batch[1], batch[2]
    B = cont.shape[0]
    for i, shape in enumerate(dm.graphical_structure.shapes_with_onehot()):
        assert tuple(batch[i + 1].shape) == (B, *shape)
    assert (np.asarray(n_particles) >= 1).all()


def test_structure_mask_algebra():
    B, N, Dc, V = 4, 8, 3, 5
    key = jax.random.PRNGKey(0)
    state = StructuredState(
        continuous=jax.random.normal(key, (B, N, Dc)),
        discrete=jax.random.normal(jax.random.fold_in(key, 1), (B, N, V)),
        dims=jnp.array([1, 3, 8, 5], jnp.int32),
    )
    state = state.delete_dims(state.dims)
    D = N * (Dc + V)
    mask = state.get_mask_flat()
    assert mask.shape == (B, D)
    # live elements per sample = dims * (Dc + V)
    np.testing.assert_array_equal(
        np.asarray(mask.sum(1)), np.asarray(state.dims) * (Dc + V)
    )
    deleted = state.get_next_dim_deleted_mask()
    added = state.get_next_dim_added_mask()
    np.testing.assert_array_equal(np.asarray(deleted.sum(1)), [Dc + V] * B)
    # sample with dims == N cannot add a row
    np.testing.assert_array_equal(np.asarray(added.sum(1)), [Dc + V, Dc + V, 0, Dc + V])

    # flat roundtrip
    flat = state.get_flat_lats()
    state2 = state.set_flat_lats(flat)
    np.testing.assert_allclose(
        np.asarray(state2.continuous), np.asarray(state.continuous)
    )

    # problem-dim → tensor-dim broadcast
    problem = jnp.tile(jnp.arange(N, dtype=jnp.float32)[None], (B, 1))
    flatp = state.convert_problem_dim_to_tensor_dim(problem)
    assert flatp.shape == (B, D)
    # row r of the continuous block carries value r
    assert float(flatp[0, (N - 1) * Dc]) == N - 1


def test_adjust_state_centers_live_rows():
    B, N, Dc, V = 3, 6, 3, 5
    key = jax.random.PRNGKey(2)
    dims = jnp.array([2, 4, 6], jnp.int32)
    state = StructuredState(
        continuous=jax.random.normal(key, (B, N, Dc)),
        discrete=jax.random.normal(jax.random.fold_in(key, 1), (B, N, V)),
        dims=dims,
    ).delete_dims(dims)
    adjusted, mean = adjust_state(state)
    com = np.asarray(adjusted.continuous.sum(axis=1))
    np.testing.assert_allclose(com, 0.0, atol=1e-5)
    assert mean.shape == (B, 1, Dc)


def test_forward_rate_properties():
    fr = StepForwardRate(max_dim=24, rate_cut_t=0.1)
    ts = jnp.array([0.05, 0.5, 0.99])
    rates = np.asarray(fr.get_rate(None, ts))
    assert rates[0] == pytest.approx(fr.offset, rel=1e-5)
    assert rates[1] > rates[0]
    integral = np.asarray(fr.get_rate_integral(ts))
    assert (np.diff(integral) > 0).all()

    cfr = ConstForwardRate(max_dim=24)
    dims = jnp.full((64,), 24, jnp.int32)
    dims_t = cfr.get_dims_at_t(jax.random.PRNGKey(0), dims, jnp.ones(64))
    assert (np.asarray(dims_t) >= 1).all()


def test_vp_sde_golden():
    vp = VP_SDE(max_dim=24, beta_min=0.1, beta_max=20.0)
    x = jnp.ones((2, 10))
    t = jnp.array([0.0, 1.0])
    mean, std = vp.get_p0t_stats(x, t)
    # t=0: mean = x, std = 0 ; t=1: mean ≈ 0, std ≈ 1
    np.testing.assert_allclose(np.asarray(mean[0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(std[0]), 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(mean[1]), 0.0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(std[1]), 1.0, atol=1e-3)
    # x0/eps inversion consistency
    eps = jax.random.normal(jax.random.PRNGKey(0), x.shape)
    tmid = jnp.array([0.5, 0.5])
    mean_m, std_m = vp.get_p0t_stats(x, tmid)
    xt = mean_m + std_m * eps
    x0 = vp.predict_x0_from_xt(xt, eps, tmid)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x), atol=1e-4)


def test_get_rate_using_x0_pred_vectorized():
    max_dim = 12
    B = 6
    fr = StepForwardRate(max_dim=max_dim, rate_cut_t=0.1)
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (B, max_dim))
    dims = jnp.array([1, 2, 5, 12, 1, 7], jnp.int32)
    ts = jnp.full((B,), 0.7)
    rate = get_rate_using_x0_pred(logits, dims, fr, ts, max_dim)
    assert rate.shape == (B,)
    r = np.asarray(rate)
    assert np.isfinite(r).all()
    assert (r >= 0).all()


def test_nearest_atom():
    B, N, Dc, V = 2, 5, 3, 5
    cont = jnp.zeros((B, N, Dc))
    # sample 0: particles at x=0,1,2 (dims=3); deleted = index 2 at x=2
    cont = cont.at[0, 0, 0].set(0.0).at[0, 1, 0].set(1.0).at[0, 2, 0].set(2.0)
    cont = cont.at[1, 0, 0].set(0.0).at[1, 1, 0].set(10.0).at[1, 2, 0].set(10.5)
    state = StructuredState(
        continuous=cont,
        discrete=jnp.zeros((B, N, V)),
        dims=jnp.array([3, 3], jnp.int32),
    )
    delxt = state.delete_one_dim()
    nearest = np.asarray(get_nearest_atom(state, delxt))
    assert nearest[0] == 1  # particle at x=1 closest to deleted x=2
    assert nearest[1] == 1  # particle at x=10 closest to deleted x=10.5


def test_net_forward_shapes(model_and_batch):
    cfg, model, params, state = model_and_batch
    B, N = state.B, state.N
    ts = jnp.full((B,), 0.5)
    D, rate, (auto_mean, auto_std), x0_logits, near_logits, _ = model.net_forward(
        params, state, ts, nearest_atom=jnp.zeros((B,), jnp.int32)
    )
    flat_dim = N * (3 + 8)
    assert D.shape == (B, flat_dim)
    assert rate.shape == (B, 1)
    assert x0_logits.shape == (B, N)
    assert near_logits.shape == (B, N)
    assert auto_mean.shape == (B, flat_dim)
    assert np.isfinite(np.asarray(rate)).all()
    assert (np.asarray(rate) >= 0).all()


def test_fused_network_matches_flax():
    """The Pallas sampling forward (_network_fused, interpret mode) must
    reproduce the flax TransdimensionalEPiC at production head width."""
    cfg = TransdimensionalEpicConfig()
    cfg.data.return_type = "list"
    cfg.data.max_num_particles = 24
    model = TransdimensionalJumpDiffusion(cfg)

    B, N = 2, cfg.data.max_num_particles
    key = jax.random.PRNGKey(3)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dims = jnp.asarray([5, 17], jnp.int32)
    state = StructuredState(
        continuous=jax.random.normal(k1, (B, N, 3)),
        discrete=jax.random.normal(k2, (B, N, 8)),
        dims=dims,
    ).delete_dims(dims)
    params = model.init(k3, state)
    ts = jnp.asarray([0.3, 0.8])
    nearest = jnp.asarray([1, 4], jnp.int32)

    expected = model.network.apply(
        {"params": params["network"]}, state, ts, nearest, False, None
    )
    got = model._network_fused(
        params["network"], state, ts, nearest, False, None, interpret=True
    )
    names = ("D_xt", "rate_emb", "near_logits", "auto_mean", "auto_std", "nearest")
    for name, e, g in zip(names, expected, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(e), atol=5e-4, err_msg=name
        )


def test_loss_finite_and_grads(model_and_batch):
    """The reference skips its loss test ('NOT FINISHED PROBLEM WITH
    INTERPOLATION TO ONE PARTICLE'); the mask-based rebuild runs it."""
    cfg, model, params, state = model_and_batch
    (loss, metrics), grads = jax.value_and_grad(model.loss_fn, has_aux=True)(
        params, jax.random.PRNGKey(1), state
    )
    assert np.isfinite(float(loss))
    assert float(metrics["num_valid"]) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_sampler_smoke(model_and_batch):
    cfg, model, params, state = model_and_batch
    final, nfe = model.sample(params, jax.random.PRNGKey(2), state)
    assert nfe >= 19
    assert final.continuous.shape == state.continuous.shape
    d = np.asarray(final.dims)
    assert (d >= 1).all() and (d <= state.N).all()
    # dims grew from 1 (births happened for at least some samples over 20 steps)
    assert np.isfinite(np.asarray(final.continuous)).all()
    # conversion to the multimodal databatch layout
    one_hot, tokens, cont, _, _, mask = final.to_multimodal_bridge_databatch()
    assert tokens.shape == (state.B, state.N, 1)
    assert (np.asarray(mask.sum(1))[:, 0] == d).all()


def test_sampler_clip_lats(datamodule):
    """clip_lats bounds the live latents after every predictor step
    (opt-in robustness knob; None = reference behavior)."""
    import copy

    cfg, dm = datamodule
    cfg2 = copy.deepcopy(cfg)
    cfg2.sampler_kwargs.dt = 1.0 / 20
    cfg2.sampler_kwargs.clip_lats = 2.5
    model = TransdimensionalJumpDiffusion(cfg2, dm)
    batch = next(iter(dm.train))
    state = state_from_list_batch(batch)
    params = model.init(jax.random.PRNGKey(0), state)
    final, _ = model.sample(params, jax.random.PRNGKey(3), state)
    lats = np.asarray(final.get_flat_lats() * final.get_mask_flat())
    # adjust_state recenters after the clamp, so allow CoM-shift slack
    assert np.abs(lats).max() <= 2.5 * 2 + 1e-5


def test_score_loss_normalization_options(model_and_batch):
    """'live' re-weights the score term per live entry (so dims=1 samples
    keep gradient weight); 'dims' reproduces the reference normalization."""
    from multimodal_particles_tpu.models.generative.transdimensional.loss import (
        JumpLossFinalDim,
    )

    cfg, model, params, state = model_and_batch
    base = model.jump_diffusion_loss
    kwargs = {f: getattr(base, f) for f in (
        "forward_rate", "noise_schedule", "min_t", "loss_type",
        "x0_logit_ce_loss_weight", "rate_loss_weight", "score_loss_weight",
        "auto_loss_weight", "mean_or_sum_over_dim", "nearest_atom_pred",
        "nearest_atom_loss_weight",
    )}
    key = jax.random.PRNGKey(5)
    losses = {}
    for norm in ("dims", "live"):
        loss_fn = JumpLossFinalDim(score_loss_normalization=norm, **kwargs)
        loss, comps = loss_fn(model, params, state, key)
        assert np.isfinite(float(loss)), norm
        losses[norm] = float(comps["score_loss"])
    # live-normalized score error is strictly larger: every sample has
    # live < D, so the rescale factor D/live > 1
    assert losses["live"] > losses["dims"]

    with pytest.raises(ValueError):
        JumpLossFinalDim(score_loss_normalization="bogus", **kwargs)(
            model, params, state, key
        )


def test_sampler_diagnostics(model_and_batch):
    cfg, model, params, state = model_and_batch
    final, nfe, diag = model.sample(
        params, jax.random.PRNGKey(2), state, collect_diagnostics=True
    )
    T = diag["ts"].shape[0]
    for k in ("max_abs_x", "mean_dims", "birth_frac", "rate_mean"):
        assert diag[k].shape == (T,)
        assert np.isfinite(np.asarray(diag[k])).all()
    # the diagnostics branch must not change the sampled trajectory
    final_plain, nfe_plain = model.sample(params, jax.random.PRNGKey(2), state)
    assert nfe_plain == nfe
    np.testing.assert_allclose(
        np.asarray(final_plain.continuous), np.asarray(final.continuous)
    )
    # dims grow from 1 -> mean_dims is monotone-ish; last entry matches final
    np.testing.assert_allclose(
        float(diag["mean_dims"][-1]), float(np.mean(np.asarray(final.dims)))
    )


def test_sampler_corrector_and_c_schedule(datamodule):
    """Exercise the Langevin corrector, the jump corrector (birth & death)
    and the two-level 'C' dt schedule (reference: sampler.py:79-88,258-312)."""
    cfg, dm = datamodule
    import copy

    cfg2 = copy.deepcopy(cfg)
    cfg2.sampler_kwargs.dt_schedule = "C"
    cfg2.sampler_kwargs.dt_schedule_h = 0.2   # coarse early
    cfg2.sampler_kwargs.dt_schedule_l = 0.1   # finer late
    cfg2.sampler_kwargs.dt_schedule_tc = 0.5
    cfg2.sampler_kwargs.dt = 0.1
    cfg2.sampler_kwargs.corrector_steps = 1
    cfg2.sampler_kwargs.corrector_start_time = 0.6
    cfg2.sampler_kwargs.corrector_finish_time = 0.05
    cfg2.sampler_kwargs.do_jump_corrector = True

    batch = next(iter(dm.train))
    model = TransdimensionalJumpDiffusion(cfg2, dm)
    state = state_from_list_batch(batch)
    params = model.init(jax.random.PRNGKey(0), state)
    final, nfe = model.sample(params, jax.random.PRNGKey(1), state)
    # the 'C' grid: ~2-3 coarse steps then ~5 fine steps, each with a
    # corrector pass in the window
    assert nfe > 7
    d = np.asarray(final.dims)
    assert (d >= 1).all() and (d <= state.N).all()
    assert np.isfinite(np.asarray(final.continuous)).all()


def test_sampler_nfe_counts_actual_evaluations(datamodule):
    """NFE equals the true forward count: one per step plus corrector_steps
    per corrector-window step (reference counts per get_score call —
    sampler.py:217,264)."""
    cfg, dm = datamodule
    import copy

    from multimodal_particles_tpu.models.generative.transdimensional.sampler import (
        _build_time_grid,
    )

    cfg2 = copy.deepcopy(cfg)
    cfg2.sampler_kwargs.dt = 0.1
    cfg2.sampler_kwargs.corrector_steps = 2
    cfg2.sampler_kwargs.corrector_start_time = 0.55
    cfg2.sampler_kwargs.corrector_finish_time = 0.15

    ts, _, _, corr_on, _ = _build_time_grid(cfg2.sampler_kwargs)
    expected_nfe = len(ts) + 2 * int(corr_on.sum())
    assert 0 < corr_on.sum() < len(ts)  # window is a strict subset

    batch = next(iter(dm.train))
    model = TransdimensionalJumpDiffusion(cfg2, dm)
    state = state_from_list_batch(batch)
    params = model.init(jax.random.PRNGKey(0), state)
    final, nfe = model.sample(params, jax.random.PRNGKey(1), state)
    assert nfe == expected_nfe
    assert np.isfinite(np.asarray(final.continuous)).all()


def test_sampler_conditioning_requires_condition(datamodule):
    cfg, dm = datamodule
    import copy

    cfg2 = copy.deepcopy(cfg)
    cfg2.sampler_kwargs.do_conditioning = True
    batch = next(iter(dm.train))
    model = TransdimensionalJumpDiffusion(cfg2, dm)
    state = state_from_list_batch(batch)
    params = model.init(jax.random.PRNGKey(0), state)
    with pytest.raises(ValueError):
        model.sample(params, jax.random.PRNGKey(1), state)


def test_sampler_reconstruction_guidance(datamodule):
    """Reconstruction-guidance conditioning: jit-able, finite, and the
    guidance term changes the trajectory vs the unconditioned sampler
    (reference: sampler.py:102-155)."""
    cfg, dm = datamodule
    import copy

    from multimodal_particles_tpu.models.generative.transdimensional.sampler import (
        Condition,
    )

    cfg2 = copy.deepcopy(cfg)
    cfg2.sampler_kwargs.dt = 0.125  # 8-step sampler: keep the test quick
    cfg2.sampler_kwargs.do_conditioning = True
    cfg2.sampler_kwargs.guidance_weight = 2.0

    batch = next(iter(dm.train))
    model = TransdimensionalJumpDiffusion(cfg2, dm)
    state = state_from_list_batch(batch)
    params = model.init(jax.random.PRNGKey(0), state)

    # condition on the first 3 particles of the data state
    cond_dims = jnp.full((state.B,), 3, jnp.int32)
    cond_mask = state.get_mask_flat(cond_dims)
    cond_lats = state.get_flat_lats() * cond_mask
    condition = Condition(lats=cond_lats, mask=cond_mask, dims=cond_dims)

    key = jax.random.PRNGKey(5)
    final_c, nfe = model.sample(params, key, state, condition)
    assert np.isfinite(np.asarray(final_c.continuous)).all()
    d = np.asarray(final_c.dims)
    assert (d >= 1).all() and (d <= state.N).all()

    # same PRNG key, no conditioning → different trajectory
    cfg3 = copy.deepcopy(cfg2)
    cfg3.sampler_kwargs.do_conditioning = False
    model_u = TransdimensionalJumpDiffusion(cfg3, dm)
    final_u, _ = model_u.sample(params, key, state)
    diff = np.abs(
        np.asarray(final_c.continuous) - np.asarray(final_u.continuous)
    ).max()
    assert diff > 1e-6, "guidance term did not change the trajectory"

    # jit-ability and determinism of the conditioned sampler
    jit_cont = jax.jit(
        lambda p, k: model.sample(p, k, state, condition)[0].continuous
    )(params, key)
    np.testing.assert_allclose(
        np.asarray(jit_cont), np.asarray(final_c.continuous), rtol=2e-4, atol=2e-4
    )


def test_birth_chain_poisson_statistics():
    """With constant per-level rates the exact birth chain's counts are
    Poisson(r·dt) (truncated at K): mean/variance match and P(k≥1) equals
    1 − exp(−r·dt)."""
    from multimodal_particles_tpu.models.generative.transdimensional.sampler import (
        sample_birth_chain,
    )

    B, K, r, dt = 200_000, 24, 30.0, 0.1  # λ = 3, K >> λ so truncation ~0
    rates = jnp.full((B, K), r)
    births = np.asarray(sample_birth_chain(jax.random.PRNGKey(0), rates, dt))
    lam = r * dt
    assert abs(births.mean() - lam) < 0.03 * lam
    assert abs(births.var() - lam) < 0.05 * lam
    p_ge1 = 1.0 - np.exp(-lam)
    assert abs((births >= 1).mean() - p_ge1) < 0.01

    # zero rate at a level stops the chain there
    rates = rates.at[:, 2:].set(0.0)
    births = np.asarray(sample_birth_chain(jax.random.PRNGKey(1), rates, dt))
    assert births.max() <= 2


def test_birth_rates_for_offsets_match_single():
    """Column j of get_birth_rates_for_offsets equals the (torch-golden)
    get_rate_using_x0_pred at dims+j, and rates at/above capacity are 0."""
    from multimodal_particles_tpu.models.generative.diffusion.noising import (
        StepForwardRate,
        get_birth_rates_for_offsets,
        get_rate_using_x0_pred,
    )

    B, D, K = 16, 64, 8
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((B, D)) * 3, jnp.float32)
    dims = jnp.asarray(rng.integers(1, D, B), jnp.int32)
    ts = jnp.asarray(rng.uniform(0.05, 1.0, B), jnp.float32)
    fr = StepForwardRate(max_dim=D, rate_cut_t=0.1)

    multi = np.asarray(get_birth_rates_for_offsets(logits, dims, K, fr, ts, D))
    for j in range(K):
        cand = np.asarray(dims) + j
        direct = np.asarray(
            get_rate_using_x0_pred(logits, jnp.minimum(dims + j, D), fr, ts, D)
        )
        live = cand < D
        np.testing.assert_allclose(
            multi[live, j], direct[live], rtol=5e-4, atol=1e-5
        )
        assert (multi[~live, j] == 0.0).all()
    assert (multi >= 0.0).all()


def test_multi_birth_sampler_beats_step_floor(model_and_batch):
    """At a step count far below the data's multiplicity, the multi-birth
    solver reaches dims the single-birth solver cannot (its hard ceiling is
    init 1 + one birth per step), under identical params/key."""
    import copy

    cfg, model, params, state = model_and_batch
    steps = 6
    cfg_multi = copy.deepcopy(cfg)
    cfg_multi.sampler_kwargs.dt = 1.0 / steps
    cfg_multi.sampler_kwargs.multi_birth = 16
    cfg_single = copy.deepcopy(cfg_multi)
    cfg_single.sampler_kwargs.multi_birth = 1

    key = jax.random.PRNGKey(5)
    dm = None
    multi = TransdimensionalJumpDiffusion(cfg_multi, dm)
    single = TransdimensionalJumpDiffusion(cfg_single, dm)
    out_m, nfe_m = jax.jit(lambda p, k: multi.sample(p, k, state))(params, key)
    out_s, nfe_s = (
        jax.jit(lambda p, k: single.sample(p, k, state))(params, key)
    )
    d_m, d_s = np.asarray(out_m.dims), np.asarray(out_s.dims)
    assert nfe_m == nfe_s, "multi-birth must not add network evaluations"
    assert (d_s <= 1 + steps).all(), "single-birth ceiling violated"
    assert (d_m >= 1).all() and (d_m <= state.N).all()
    assert d_m.mean() > d_s.mean(), (
        "multi-birth should birth more particles per step below the floor"
    )
    # padding contract: rows at/above dims are zeroed
    alive = np.arange(state.N)[None, :] < d_m[:, None]
    assert np.abs(np.asarray(out_m.continuous) * ~alive[..., None]).max() == 0.0


def test_exact_rate_integral_restores_prior_multiplicity():
    """Solver self-consistency, isolated from the network: replace the
    x0-dim classifier by the ANALYTIC count-conditional posterior
    (analytic_x0_dim_logits — the library function behind
    sampler_kwargs.analytic_posterior_all_dims) and run the dims-only
    reverse birth chain. A correct solver must then reproduce the prior's
    multiplicity DISTRIBUTION (exact time-reversal of the forward death
    chain). With the exact per-step intensity integral ln L(t) - ln L(t-dt)
    it does at 64 steps; the left-endpoint product f(t)*dt/L(t)
    (reference-style) measurably undershoots — the diagnosed root cause of
    the terminal-multiplicity deficit (reverse rate = f/L * G with an
    integrable log singularity of f/L at the rate cut)."""
    from multimodal_particles_tpu.models.generative.diffusion.noising import (
        StepForwardRate,
        analytic_x0_dim_logits,
        get_birth_rates_for_offsets,
    )
    from multimodal_particles_tpu.models.generative.transdimensional.sampler import (
        sample_birth_chain,
    )

    B, D, K, steps = 4096, 64, 16, 64
    fr = StepForwardRate(max_dim=D, rate_cut_t=0.1)
    # smooth unimodal prior over 1..D, mean ~24
    prior = np.exp(-0.5 * ((np.arange(1, D + 1) - 24.0) / 7.0) ** 2)
    prior /= prior.sum()
    prior_mean = float((np.arange(1, D + 1) * prior).sum())
    log_prior = jnp.asarray(np.log(prior), jnp.float32)

    dt = 1.0 / steps
    floor = dt / 4.0

    def run(exact):
        def step(carry, t):
            dims, key = carry
            key, k_j = jax.random.split(key)
            t_b = jnp.full((B,), t)
            rates = get_birth_rates_for_offsets(
                analytic_x0_dim_logits(log_prior, dims, fr, t_b, D),
                dims, K, fr, t_b, D,
            )
            if exact:
                lam_t = fr.get_rate_integral(t_b)
                lam_n = fr.get_rate_integral(jnp.maximum(t_b - dt, floor))
                f_t = fr.get_rate(None, t_b)
                chain_dt = (jnp.log(lam_t) - jnp.log(lam_n)) * lam_t / f_t
            else:
                chain_dt = jnp.full((B,), dt)
            births = sample_birth_chain(k_j, rates, chain_dt)
            return (jnp.minimum(dims + births, D), key), None

        ts = jnp.arange(steps, 0, -1, dtype=jnp.float32) * dt
        (dims, _), _ = jax.lax.scan(
            step, (jnp.ones((B,), jnp.int32), jax.random.PRNGKey(0)), ts
        )
        return np.asarray(dims)

    dims_exact = run(exact=True)
    dims_left = run(exact=False)
    mean_exact = float(dims_exact.mean())
    mean_left = float(dims_left.mean())
    # exact integral: within a few percent of the prior mean
    assert abs(mean_exact - prior_mean) < 0.05 * prior_mean, (
        mean_exact, prior_mean
    )
    # ...and the full terminal DISTRIBUTION matches the prior: small KL
    # (exact reversal up to tau-leap discretization + B=4096 sampling noise)
    hist = np.bincount(dims_exact, minlength=D + 1)[1:].astype(np.float64)
    q = (hist + 1e-3) / (hist + 1e-3).sum()
    kl = float(np.sum(prior * np.log(prior / q)))
    assert kl < 0.05, kl
    # left-endpoint: measurably short (the bug this guards against)
    assert mean_left < mean_exact - 0.5, (mean_left, mean_exact)


def test_dims_prior_log_probs_smoothed_and_wired():
    """_dims_prior_log_probs returns a normalized log-prior on the 1..N
    grid — the EXACT empirical histogram by default (the terminal
    multiplicity target under the all-dims analytic posterior), optionally
    kernel-smoothed via analytic_prior_smoothing_sigma — and is None when
    the feature is off or no datamodule was attached."""
    from types import SimpleNamespace

    from multimodal_particles_tpu.config_classes.transdimensional_unconditional_config import (
        TransdimensionalEpicConfig,
    )
    from multimodal_particles_tpu.models.generative.transdimensional import (
        TransdimensionalJumpDiffusion,
    )
    from multimodal_particles_tpu.models.generative.transdimensional.structure import (
        DistributionNodes,
    )

    cfg = TransdimensionalEpicConfig()
    cfg.data.max_num_particles = 64
    model = TransdimensionalJumpDiffusion(cfg)
    # no datamodule AND no config histogram → loud warning, classifier
    # fallback (VERDICT r3 #4: never a *silent* quality downgrade)
    with pytest.warns(UserWarning, match="analytic_dim1_posterior"):
        assert model._dims_prior_log_probs(64) is None

    hist = {20: 5, 24: 10, 30: 5}  # sparse empirical histogram
    model.graphical_structure = SimpleNamespace(nodes_dist=DistributionNodes(hist))
    lp = model._dims_prior_log_probs(64)
    assert lp.shape == (64,)
    p = np.exp(np.asarray(lp, np.float64))
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-5)
    # default sigma=0: EXACT empirical law — no mass off the support
    np.testing.assert_allclose(p[19], 0.25, rtol=1e-5)  # d0 = 20
    np.testing.assert_allclose(p[23], 0.50, rtol=1e-5)  # d0 = 24
    assert p[21] < 1e-12 and p[22] < 1e-12  # unseen multiplicities
    mean = (np.arange(1, 65) * p).sum()
    assert 23.0 < mean < 25.0

    # sigma>0 spreads mass to neighbors the histogram never saw (r3 mode)
    cfg.sampler_kwargs.analytic_prior_smoothing_sigma = 2.0
    p_s = np.exp(np.asarray(model._dims_prior_log_probs(64), np.float64))
    np.testing.assert_allclose(p_s.sum(), 1.0, rtol=1e-5)
    assert p_s[21] > 1e-4 and p_s[22] > 1e-4  # d0 = 22, 23
    cfg.sampler_kwargs.analytic_prior_smoothing_sigma = 0.0

    # off switch
    cfg.sampler_kwargs.analytic_dim1_posterior = False
    assert model._dims_prior_log_probs(64) is None


def test_dims_prior_autowired_from_config_histogram():
    """A model built WITHOUT a datamodule but whose config carries the
    training multiplicity histogram (data.target_info['hist_num_particles'],
    the JetsDataloaderModule.update_config contract) auto-derives the
    analytic-posterior prior — no silent downgrade to the biased dims=1
    classifier (VERDICT r3 #4)."""
    import warnings

    from multimodal_particles_tpu.config_classes.transdimensional_unconditional_config import (
        TransdimensionalEpicConfig,
    )
    from multimodal_particles_tpu.models.generative.transdimensional import (
        TransdimensionalJumpDiffusion,
    )

    cfg = TransdimensionalEpicConfig()
    cfg.data.max_num_particles = 64
    cfg.data.target_info["hist_num_particles"] = {20: 5, 24: 10, 30: 5}
    model = TransdimensionalJumpDiffusion(cfg)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning here is a failure
        lp = model._dims_prior_log_probs(64)
    assert lp is not None and lp.shape == (64,)
    p = np.exp(np.asarray(lp, np.float64))
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-5)
    mean = (np.arange(1, 65) * p).sum()
    assert 22.0 < mean < 27.0
    # matches the datamodule-attached path exactly
    from types import SimpleNamespace

    from multimodal_particles_tpu.models.generative.transdimensional.structure import (
        DistributionNodes,
    )

    model.graphical_structure = SimpleNamespace(
        nodes_dist=DistributionNodes({20: 5, 24: 10, 30: 5})
    )
    np.testing.assert_allclose(
        np.asarray(model._dims_prior_log_probs(64)), np.asarray(lp), rtol=1e-6
    )
