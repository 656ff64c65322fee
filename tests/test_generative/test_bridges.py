"""Golden tests for the bridge math against the closed-form formulas
(reference formulas: models/generative/bridges.py:23-27,159-177,218-231)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_particles_tpu.models.generative import bridges as br


VOCAB = 8
GAMMA = 0.125


def test_telegraph_conditional_probability_formula():
    t_in, t_out = 0.2, 0.7
    k_in = jnp.array([[[3]]])
    k_out = jnp.arange(VOCAB)[None, None, :]
    p = br.telegraph_conditional_probability(t_in, t_out, k_in, k_out, GAMMA, VOCAB)
    w = np.exp(-VOCAB * GAMMA * (t_out - t_in))
    expected_same = 1 / VOCAB + w * (1 - 1 / VOCAB)
    expected_diff = 1 / VOCAB + w * (-1 / VOCAB)
    np.testing.assert_allclose(p[0, 0, 3], expected_same, rtol=1e-5)
    np.testing.assert_allclose(p[0, 0, 0], expected_diff, rtol=1e-5)
    # rows are normalized
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-5)


def test_telegraph_transition_probability_boundaries():
    B, N = 4, 16
    key = jax.random.PRNGKey(0)
    k0 = jax.random.randint(key, (B, N, 1), 0, VOCAB)
    k1 = jax.random.randint(jax.random.fold_in(key, 1), (B, N, 1), 0, VOCAB)

    # rows normalized at generic t
    t = jnp.full((B, 1, 1), 0.37)
    probs = br.telegraph_transition_probability(t, k0, k1, GAMMA, VOCAB)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)

    # t → 0: concentrates on k0; t → 1: on k1
    p0 = br.telegraph_transition_probability(
        jnp.full((B, 1, 1), 1e-6), k0, k1, GAMMA, VOCAB
    )
    assert (np.asarray(p0.argmax(-1)) == np.asarray(k0[..., 0])).all()
    p1 = br.telegraph_transition_probability(
        jnp.full((B, 1, 1), 1.0 - 1e-6), k0, k1, GAMMA, VOCAB
    )
    assert (np.asarray(p1.argmax(-1)) == np.asarray(k1[..., 0])).all()


def test_telegraph_sample_boundary():
    B, N = 8, 32
    key = jax.random.PRNGKey(42)
    k0 = jax.random.randint(key, (B, N, 1), 0, VOCAB)
    k1 = jax.random.randint(jax.random.fold_in(key, 1), (B, N, 1), 0, VOCAB)
    kt = br.telegraph_sample(
        jax.random.fold_in(key, 2), jnp.full((B, 1, 1), 1.0 - 1e-7), k0, k1, GAMMA, VOCAB
    )
    assert (np.asarray(kt) == np.asarray(k1)).all()


def test_telegraph_rate_positive_and_shape():
    B, N = 4, 16
    key = jax.random.PRNGKey(7)
    k = jax.random.randint(key, (B, N, 1), 0, VOCAB)
    logits = jax.random.normal(jax.random.fold_in(key, 1), (B, N, VOCAB))
    rates = br.telegraph_rate(jnp.full((B, 1, 1), 0.5), k, logits, GAMMA, VOCAB)
    assert rates.shape == (B, N, VOCAB)
    assert (np.asarray(rates) >= 0).all()


def test_tau_leaping_step_in_vocab():
    B, N = 4, 16
    key = jax.random.PRNGKey(3)
    k = jax.random.randint(key, (B, N, 1), 0, VOCAB)
    rates = jax.random.uniform(jax.random.fold_in(key, 1), (B, N, VOCAB)) * 5.0
    k_new = br.tau_leaping_step(jax.random.fold_in(key, 2), k, rates, 0.01, VOCAB)
    assert k_new.shape == k.shape
    assert (np.asarray(k_new) >= 0).all() and (np.asarray(k_new) < VOCAB).all()


def test_absorbing_survival_probability_formula():
    t = jnp.array([0.0, 0.3, 1.0])
    sp = np.asarray(br.absorbing_survival_probability(t, GAMMA))
    g = GAMMA
    expected = np.exp(-g * np.asarray(t)) * (1 - np.exp(g * (np.asarray(t) - 1))) / (
        1 - np.exp(-g)
    )
    np.testing.assert_allclose(sp, expected, rtol=1e-4)
    assert abs(sp[0] - 1.0) < 1e-6  # everyone alive at t=0
    assert abs(sp[2]) < 1e-6  # nobody (non-target) alive at t=1


def test_absorbing_sample_boundaries():
    B, N = 8, 32
    key = jax.random.PRNGKey(11)
    target_mask = jax.random.randint(key, (B, N, 1), 0, 2)
    # at t ≈ 1: mask equals target mask
    m1 = br.absorbing_sample(
        jax.random.fold_in(key, 1), jnp.full((B, 1, 1), 1.0 - 1e-7), target_mask, GAMMA
    )
    assert (np.asarray(m1) == np.asarray(target_mask)).all()
    # at t = 0: everyone alive
    m0 = br.absorbing_sample(
        jax.random.fold_in(key, 2), jnp.zeros((B, 1, 1)), target_mask, GAMMA
    )
    assert (np.asarray(m0) == 1).all()


def test_absorbing_step_one_way():
    B, N = 4, 16
    key = jax.random.PRNGKey(5)
    mask = jax.random.randint(key, (B, N, 1), 0, 2)
    rates = jnp.ones((B, N, 1)) * 100.0
    new_mask = br.absorbing_step(jax.random.fold_in(key, 1), mask, rates, 1.0)
    # alive stays alive; with huge rate all dead are born
    assert (np.asarray(new_mask) == 1).all()
    new_mask0 = br.absorbing_step(
        jax.random.fold_in(key, 2), mask, jnp.zeros_like(rates), 1.0
    )
    assert (np.asarray(new_mask0) == np.asarray(mask)).all()


def test_linear_uniform_bridge_stats():
    key = jax.random.PRNGKey(0)
    B, N, D = 512, 8, 3
    x0 = jnp.zeros((B, N, D))
    x1 = jnp.ones((B, N, D))
    t = jnp.full((B, 1, 1), 0.25)
    sigma = 0.01
    xt = br.linear_uniform_sample(key, t, x0, x1, sigma)
    np.testing.assert_allclose(np.asarray(xt).mean(), 0.25, atol=5e-4)
    np.testing.assert_allclose(np.asarray(xt).std(), sigma, atol=2e-3)
    drift = br.linear_uniform_drift(t, xt, x0, x1)
    np.testing.assert_allclose(np.asarray(drift), 1.0)


def test_schrodinger_bridge_std():
    key = jax.random.PRNGKey(1)
    B, N, D = 2048, 4, 3
    x0 = jnp.zeros((B, N, D))
    x1 = jnp.zeros((B, N, D))
    t = jnp.full((B, 1, 1), 0.5)
    sigma = 1.0
    xt = br.schrodinger_sample(key, t, x0, x1, sigma)
    np.testing.assert_allclose(np.asarray(xt).std(), 0.5, atol=5e-3)


def test_bridge_classes_from_config():
    from multimodal_particles_tpu.config_classes import MultimodalBridgeMatchingConfig

    cfg = MultimodalBridgeMatchingConfig()
    lin = br.LinearUniformBridge.from_config(cfg)
    tel = br.TelegraphBridge.from_config(cfg)
    assert lin.sigma == cfg.bridge.sigma
    assert tel.vocab_size == cfg.data.vocab_size_features


def test_tau_leaping_fast_matches_poisson_reference():
    """The closed-form single-jump update must match the literal Poisson
    tau-leaping in distribution (same per-state transition frequencies)."""
    B, N = 64, 64
    key = jax.random.PRNGKey(0)
    k0 = jax.random.randint(key, (B, N, 1), 0, VOCAB)
    logits = jax.random.normal(jax.random.fold_in(key, 1), (B, N, VOCAB)) * 2.0
    rates = br.telegraph_rate(jnp.full((B, 1, 1), 0.6), k0, logits, GAMMA, VOCAB)
    dt = 0.02

    n_trials = 200
    fast_counts = np.zeros(VOCAB)
    ref_counts = np.zeros(VOCAB)
    stay_fast = stay_ref = 0
    for i in range(n_trials // 10):
        kk = jax.random.fold_in(key, 100 + i)
        kf = br.tau_leaping_step(kk, k0, rates, dt, VOCAB)
        kr = br.tau_leaping_step_poisson(jax.random.fold_in(kk, 7), k0, rates, dt, VOCAB)
        fast_counts += np.bincount(np.asarray(kf).ravel(), minlength=VOCAB)
        ref_counts += np.bincount(np.asarray(kr).ravel(), minlength=VOCAB)
        stay_fast += int((np.asarray(kf) == np.asarray(k0)).sum())
        stay_ref += int((np.asarray(kr) == np.asarray(k0)).sum())

    total = fast_counts.sum()
    # stay probabilities agree within MC error
    assert abs(stay_fast - stay_ref) / total < 0.01
    # per-state occupancy agrees within MC error
    np.testing.assert_allclose(
        fast_counts / total, ref_counts / total, atol=0.01
    )


def test_fused_solver_step_matches_separate_ops():
    """Fused rate+leap must match rate()+tau_leaping_step statistically and
    produce identical jump probabilities (same math, shared law)."""
    B, N = 32, 64
    key = jax.random.PRNGKey(0)
    k0 = jax.random.randint(key, (B, N, 1), 0, VOCAB)
    logits = jax.random.normal(jax.random.fold_in(key, 1), (B, N, VOCAB))
    t = jnp.full((B, 1, 1), 0.6)
    dt = 0.02
    # rates from both paths agree exactly
    rates_ref = br.telegraph_rate(t, k0, logits, GAMMA, VOCAB)
    # single fused step keeps tokens in the vocab and matches stay-prob
    stay_fused = stay_sep = 0
    for i in range(10):
        kk = jax.random.fold_in(key, 10 + i)
        kf = br.telegraph_fused_solver_step(kk, t, k0, logits, GAMMA, VOCAB, dt)
        ks = br.tau_leaping_step(jax.random.fold_in(kk, 3), k0, rates_ref, dt, VOCAB)
        assert (np.asarray(kf) >= 0).all() and (np.asarray(kf) < VOCAB).all()
        stay_fused += int((np.asarray(kf) == np.asarray(k0)).sum())
        stay_sep += int((np.asarray(ks) == np.asarray(k0)).sum())
    total = 10 * B * N
    assert abs(stay_fused - stay_sep) / total < 0.02


def test_telegraph_sample_matches_posterior_distribution():
    """The fused inverse-CDF sampler must follow the closed-form posterior
    transition probabilities."""
    B, N = 256, 32
    key = jax.random.PRNGKey(0)
    k0 = jnp.full((B, N, 1), 2)
    k1 = jnp.full((B, N, 1), 5)
    t = jnp.full((B, 1, 1), 0.5)
    probs = np.asarray(
        br.telegraph_transition_probability(t, k0, k1, GAMMA, VOCAB)
    )[0, 0]
    counts = np.zeros(VOCAB)
    for i in range(5):
        kt = br.telegraph_sample(jax.random.fold_in(key, i), t, k0, k1, GAMMA, VOCAB)
        counts += np.bincount(np.asarray(kt).ravel(), minlength=VOCAB)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, probs, atol=0.01)
