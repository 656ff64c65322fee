"""Stochastic bridges as pure JAX functions.

Re-derivation of the reference bridge layer (reference:
models/generative/bridges.py:9-286) in functional form: every method takes an
explicit PRNG key, returns new arrays, and contains no Python-level control
flow on traced values — so the whole sampling loop compiles to a single XLA
program via `lax.scan`.

Math (with reference citations):
  LinearUniformBridge  — conditional-OT flow matching, x_t = t x1 + (1-t) x0 + σ z,
                         drift target x1 - x0                  (bridges.py:23-33)
  SchrodingerBridge    — Brownian bridge, std σ√(t(1-t))        (bridges.py:60-73)
  TelegraphBridge      — S-state telegraph CTMC with closed-form conditional
                         P(x_t=i|x_t0) = 1/S + w(δ - 1/S),
                         w = exp(-S γ (t-t0))                   (bridges.py:159-177)
                         posterior bridge sampling              (bridges.py:134-157)
                         reverse rate A + B qx + C qy           (bridges.py:106-132)
                         tau-leaping solver                     (bridges.py:179-201)
  AbsorbingBridge      — survival process on the mask with
                         P(alive at t) = e^{-γt}(1-e^{γ(t-1)})/(1-e^{-γ})
                                                                (bridges.py:218-231)

The per-step state updates (`*_solver_step`) all preserve fixed (B, N, ...)
shapes and use multiplicative masks, never shape surgery — the XLA-native
treatment of variable cardinality.

Bug fixes vs the reference (documented in SURVEY.md §7.4, intentionally NOT
replicated): the reference `SchrodingerBridge.solver_step` integrates
`state.continuous` instead of the predicted drift and erroneously masks
`state.discrete` (bridges.py:75-84); here the EM step uses the drift head.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from multimodal_particles_tpu.models.generative.states import (
    AbsorbingBridgeState,
    HybridState,
    MultiHeadOutput,
)

# ---------------------------------------------------------------------------
# continuous bridges
# ---------------------------------------------------------------------------


def linear_uniform_sample(key, t, x0, x1, sigma):
    """x_t = t·x1 + (1-t)·x0 + σ·z with constant σ."""
    x = t * x1 + (1.0 - t) * x0
    z = jax.random.normal(key, x.shape, dtype=x.dtype)
    return x + sigma * z


def linear_uniform_drift(t, x, x0, x1):
    """Conditional-OT drift target: x1 - x0 (state-independent)."""
    del t, x
    return x1 - x0


def schrodinger_sample(key, t, x0, x1, sigma):
    """Brownian-bridge marginal: mean t·x1+(1-t)·x0, std σ√(t(1-t))."""
    x = t * x1 + (1.0 - t) * x0
    z = jax.random.normal(key, x.shape, dtype=x.dtype)
    return x + sigma * jnp.sqrt(t * (1.0 - t)) * z


def schrodinger_drift(t, x, x0, x1):
    # clamp away from the endpoints: MBM draws t ~ U[0,1) with no epsilon
    # floor (reference parity), and t = 0 would make the target infinite
    t = jnp.clip(t, 1e-6, 1.0 - 1e-6)
    denom = t * (1.0 - t)
    A = (1.0 - 2.0 * t) / denom
    B = t**2 / denom
    C = -((1.0 - t) ** 2) / denom
    return A * x + B * x1 + C * x0


# ---------------------------------------------------------------------------
# telegraph (CTMC) bridge
# ---------------------------------------------------------------------------


def telegraph_conditional_probability(t_in, t_out, k_in, k_out, gamma, vocab_size):
    """P(x(t_out)=k_out | x(t_in)=k_in) = 1/S + w·(δ_{k_out,k_in} - 1/S),
    w = exp(-S γ (t_out - t_in)). Broadcasts over leading dims."""
    S = vocab_size
    w = jnp.exp(-S * gamma * (t_out - t_in))
    kronecker = (k_out == k_in).astype(w.dtype)
    return 1.0 / S + w * (kronecker - 1.0 / S)


def telegraph_transition_probability(t, k0, k1, gamma, vocab_size):
    """Posterior bridge P(x_t = k | x_0=k0, x_1=k1) over all k.

    Args:
      t:  (B, 1, 1) time
      k0: (B, N, 1) source tokens
      k1: (B, N, 1) target tokens
    Returns:
      (B, N, S) normalized transition probabilities.
    """
    k = jnp.arange(vocab_size)[None, None, :]  # (1, 1, S)
    p_k_to_k1 = telegraph_conditional_probability(t, 1.0, k, k1, gamma, vocab_size)
    p_k0_to_k = telegraph_conditional_probability(0.0, t, k0, k, gamma, vocab_size)
    p_k0_to_k1 = telegraph_conditional_probability(0.0, 1.0, k0, k1, gamma, vocab_size)
    return (p_k_to_k1 * p_k0_to_k) / p_k0_to_k1


def telegraph_sample(key, t, k0, k1, gamma, vocab_size):
    """Draw k_t ~ P(·| k0, k1) from the closed-form posterior bridge.

    Fused form: the unnormalized posterior factorizes over the two Kronecker
    deltas, P(k) ∝ (1/S + w_a(δ_{k,k1} − 1/S)) · (1/S + w_b(δ_{k0,k} − 1/S))
    with w_a = e^{−Sγ(1−t)}, w_b = e^{−Sγt} (normalization cancels in
    sampling), so one select + inverse-CDF draw replaces three (B,N,S)
    conditional-probability tensors + a Gumbel categorical — the training
    step's second-largest cost after the network."""
    S = vocab_size
    t_ = jnp.asarray(t).reshape(-1, 1, 1)
    w_a = jnp.exp(-S * gamma * (1.0 - t_))
    w_b = jnp.exp(-S * gamma * t_)

    iota = jnp.arange(S)[None, None, :]
    d1 = iota == k1
    d0 = iota == k0
    fac_a = jnp.where(d1, 1.0 / S + w_a * (1.0 - 1.0 / S), (1.0 - w_a) / S)
    fac_b = jnp.where(d0, 1.0 / S + w_b * (1.0 - 1.0 / S), (1.0 - w_b) / S)
    p = fac_a * fac_b  # (B, N, S), unnormalized

    cdf = jnp.cumsum(p, axis=-1)
    u = jax.random.uniform(key, k0.shape[:2], dtype=cdf.dtype) * cdf[..., -1]
    k_t = jnp.sum((u[..., None] >= cdf).astype(jnp.int32), axis=-1)
    k_t = jnp.clip(k_t, 0, S - 1)
    return k_t[..., None].astype(k0.dtype)


def telegraph_rate(t, k, logits, gamma, vocab_size):
    """Reverse-time jump rates from model logits.

    rate(k->j) = 1 + B·q_j + C·q_k  with B = wS/(1-w), C = w,
    w = exp(-S γ (1-t)).

    Args:
      t:      (B, 1, 1) or (B, 1) time
      k:      (B, N, 1) current tokens
      logits: (B, N, S)
    Returns:
      (B, N, S) nonnegative rates.
    """
    S = vocab_size
    qx = jax.nn.softmax(logits, axis=-1)  # (B, N, S)
    qy = jnp.take_along_axis(qx, k.astype(jnp.int32), axis=-1)  # (B, N, 1)
    t_ = t.reshape(t.shape[0], 1, 1)
    w = jnp.exp(-S * gamma * (1.0 - t_))
    B_coef = (w * S) / (1.0 - w)
    C_coef = w
    return 1.0 + B_coef * qx + C_coef * qy


def tau_leaping_step(key, k, rates, delta_t, vocab_size):
    """Tau-leaping update of the token field — single-jump closed form.

    The reference draws S independent Poisson counts per particle and keeps
    the update only when the total count is ≤ 1 (bridges.py:179-201). The
    resulting state distribution is EXACTLY

        P(move to state j) = λ_j Δt · e^{-Λ Δt}       (Λ = Σ_j λ_j)
        P(stay)            = 1 − Λ Δt · e^{-Λ Δt}

    (a total count of 0 leaves k unchanged; a total count ≥ 2 is discarded;
    a single jump lands on j with probability λ_j/Λ, including j = k which
    is a no-op). Sampling that distribution directly costs one uniform +
    one inverse-CDF search instead of S Poisson rejection samplers — the
    dominant cost of the reference inner loop on TPU (~10× cheaper, same
    law; see tests/test_generative/test_bridges.py statistical parity test).

    Args:
      k:     (B, N, 1) current tokens
      rates: (B, N, S) nonnegative jump rates
    Returns:
      (B, N, 1) updated tokens.
    """
    k_sq = k[..., 0].astype(jnp.int32)  # (B, N)
    key_jump, key_target = jax.random.split(key)

    lam = rates * delta_t  # (B, N, S)
    lam_total = jnp.sum(lam, axis=-1)  # (B, N)
    p_single_jump = lam_total * jnp.exp(-lam_total)

    u = jax.random.uniform(key_jump, k_sq.shape)
    do_jump = u < p_single_jump  # (B, N)

    # inverse-CDF draw of the target state j ~ λ_j / Λ
    cdf = jnp.cumsum(lam, axis=-1)
    u2 = jax.random.uniform(key_target, k_sq.shape) * lam_total
    target = jnp.sum((u2[..., None] >= cdf).astype(jnp.int32), axis=-1)
    target = jnp.clip(target, 0, vocab_size - 1)

    k_new = jnp.where(do_jump, target, k_sq)
    return k_new[..., None].astype(k.dtype)


def telegraph_fused_solver_step(key, t, k, logits, gamma, vocab_size, delta_t):
    """Fused reverse-rate + single-jump update for the telegraph bridge.

    Computes `telegraph_rate` and the closed-form tau-leaping update in one
    pass with (B, N)-shaped state (no take_along_axis gather, one RNG call)
    — XLA fuses the whole step into a couple of kernels, ~2.3× faster than
    the separate rate/leap ops on TPU. Distribution identical to
    `telegraph_rate` + `tau_leaping_step`.

    Args:
      t:      (B, 1, 1) or broadcastable time
      k:      (B, N, 1) current tokens
      logits: (B, N, S)
    Returns:
      (B, N, 1) updated tokens.
    """
    S = vocab_size
    k_sq = k[..., 0].astype(jnp.int32)  # (B, N)

    one_hot = (k_sq[..., None] == jnp.arange(S)[None, None, :]).astype(
        logits.dtype
    )
    qx = jax.nn.softmax(logits, axis=-1)
    qy = jnp.sum(qx * one_hot, axis=-1, keepdims=True)
    t_ = jnp.asarray(t).reshape(-1, 1, 1)
    w = jnp.exp(-S * gamma * (1.0 - t_))
    rates = 1.0 + (w * S) / (1.0 - w) * qx + w * qy  # (B, N, S)

    lam = rates * delta_t
    lam_total = jnp.sum(lam, axis=-1)  # (B, N)
    u = jax.random.uniform(key, (2,) + k_sq.shape, dtype=lam.dtype)
    do_jump = u[0] < lam_total * jnp.exp(-lam_total)

    cdf = jnp.cumsum(lam, axis=-1)
    u2 = u[1] * lam_total
    target = jnp.sum((u2[..., None] >= cdf).astype(jnp.int32), axis=-1)
    target = jnp.clip(target, 0, vocab_size - 1)

    k_new = jnp.where(do_jump, target, k_sq)
    return k_new[..., None].astype(k.dtype)


def tau_leaping_step_poisson(key, k, rates, delta_t, vocab_size):
    """Literal reference tau-leaping (S Poisson draws + net-jump trick,
    bridges.py:179-201). Kept as the golden implementation for the
    statistical-parity test of the fast path above."""
    k_sq = k[..., 0].astype(jnp.int32)  # (B, N)
    all_jumps = jax.random.poisson(key, rates * delta_t, dtype=jnp.int32)  # (B,N,S)
    jump_mask = (jnp.sum(all_jumps, axis=-1) <= 1).astype(jnp.int32)  # (B, N)
    diff = jnp.arange(vocab_size)[None, None, :] - k_sq[:, :, None]  # (B, N, S)
    net_jumps = jnp.sum(all_jumps * diff, axis=-1)  # (B, N)
    k_new = k_sq + net_jumps * jump_mask
    k_new = jnp.clip(k_new, 0, vocab_size - 1)
    return k_new[..., None].astype(k.dtype)


# ---------------------------------------------------------------------------
# absorbing (survival) bridge
# ---------------------------------------------------------------------------


def absorbing_survival_probability(t, gamma):
    """P(killing after time t) = e^{-γt} (1 - e^{γ(t-1)}) / (1 - e^{-γ})."""
    return (
        jnp.exp(-gamma * t)
        * (1.0 - jnp.exp(gamma * (t - 1.0)))
        / (1.0 - jnp.exp(-gamma))
    )


def absorbing_sample(key, t, target_mask, gamma, target_dropout=0.0):
    """Sample the alive/dead mask at time t.

    Particles destined to exist at t=1 (target_mask==1) are always alive;
    the rest survive with the closed-form survival probability.

    target_dropout > 0 (source-consistent augmentation, beyond the
    reference) additionally kills each TARGET slot with probability
    dropout·SP(t) — alive w.p. 1 at t=1, 1-dropout at t=0 — so the survival
    head sees dead slots whose BCE label is ALIVE and learns to revive
    them (the reference's head never does: its training masks always
    contain the target, and the birth-only solver then cannot correct an
    under-multiplicity generation init).

    Args:
      t:           (B, 1, 1)
      target_mask: (B, N, 1)
    Returns:
      (B, N, 1) int mask.
    """
    dropped = None
    if target_dropout > 0.0:
        key, key_drop = jax.random.split(key)
        u2 = jax.random.uniform(key_drop, target_mask.shape)
        drop_p = target_dropout * absorbing_survival_probability(t, gamma)
        dropped = u2 < drop_p
    u = jax.random.uniform(key, target_mask.shape)
    survival = absorbing_survival_probability(t, gamma)
    mask_t = (u < survival).astype(jnp.int32)
    out = jnp.where(target_mask > 0, 1, mask_t)
    if dropped is not None:
        # dropped target slots are DEAD outright (not an extras draw), so
        # P(alive | target) = 1 - dropout*SP(t): 1-dropout at t=0 — the
        # under-multiplicity-init regime the head must learn to revive —
        # rising to 1 at t=1
        out = jnp.where((target_mask > 0) & dropped, 0, out)
    return out


def absorbing_rate(t, mask_t, logits, gamma):
    """Birth rate = survival(t) · sigmoid(logits). logits: (B, N, 1)."""
    del mask_t
    sp = absorbing_survival_probability(t, gamma)
    return sp * jax.nn.sigmoid(logits)


def absorbing_death_hazard(t, gamma):
    """Conditional death hazard of a NON-target alive slot at time t.

    The bridge's forward marginal for a slot outside the target is
    P(alive at t) = SP(t) (absorbing_survival_probability), so a
    marginal-matching generative trajectory kills such a slot with hazard
    h(t) = -d/dt log SP(t) = γ / (1 - e^{γ(t-1)}). h diverges at t → 1
    (the solver clips dt·h to 1), guaranteeing non-target slots are dead
    by the terminal step. Used by the opt-in death channel
    (`BridgeConfig.death_rate_scale`) — beyond the reference, whose solver
    is birth-only (reference: models/generative/bridges.py:233-249) and
    therefore cannot correct an over-multiplicity generation init
    (benchmarks/quality_absorbing_source_consistent.json uniform stress).
    """
    return gamma / jnp.maximum(1.0 - jnp.exp(gamma * (t - 1.0)), 1e-12)


def absorbing_step(key, mask_t, rates, delta_t, death_rates=None):
    """Bernoulli-thinning mask step: 0 → 1 births always; optional 1 → 0
    deaths when `death_rates` is given (the opt-in death channel).

    Args:
      mask_t: (B, N, 1)
      rates:  (B, N, 1)
      death_rates: (B, N, 1) or None
    """
    if death_rates is not None:
        key, key_d = jax.random.split(key)
    p = jnp.clip(delta_t * rates, 0.0, 1.0)
    births = jax.random.bernoulli(key, p).astype(jnp.int32)
    if death_rates is None:
        return jnp.where(mask_t > 0, 1, births)
    p_d = jnp.clip(delta_t * death_rates, 0.0, 1.0)
    survives = 1 - jax.random.bernoulli(key_d, p_d).astype(jnp.int32)
    return jnp.where(mask_t > 0, survives, births)


# ---------------------------------------------------------------------------
# config-driven wrappers (static dataclasses, safe to close over in jit)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LinearUniformBridge:
    """Conditional OT flow matching for continuous states."""

    sigma: float

    @classmethod
    def from_config(cls, config):
        return cls(sigma=config.bridge.sigma)

    def sample(self, key, t, x0, x1):
        return linear_uniform_sample(key, t, x0, x1, self.sigma)

    def drift(self, t, x, x0, x1):
        return linear_uniform_drift(t, x, x0, x1)

    def diffusion(self, t):
        return jnp.zeros_like(jnp.asarray(t))

    def solver_step(
        self,
        key,
        state,
        heads: MultiHeadOutput,
        delta_t,
        multimodal: bool = True,
    ):
        """Euler ODE step, masked to existing particles."""
        del key
        mask = heads.absorbing if multimodal else state.mask_t
        new_continuous = (state.continuous + delta_t * heads.continuous) * mask
        return state.replace(continuous=new_continuous)


@dataclass(frozen=True)
class SchrodingerBridge:
    """Brownian (Schrödinger) bridge for continuous states."""

    sigma: float

    @classmethod
    def from_config(cls, config):
        return cls(sigma=config.bridge.sigma)

    def sample(self, key, t, x0, x1):
        return schrodinger_sample(key, t, x0, x1, self.sigma)

    def drift(self, t, x, x0, x1):
        return schrodinger_drift(t, x, x0, x1)

    def diffusion(self, t):
        return self.sigma * jnp.sqrt(t * (1.0 - t))

    def solver_step(self, key, state, heads, delta_t, multimodal: bool = True):
        """Euler–Maruyama SDE step (uses the drift head — fixes the reference
        bug at bridges.py:75-84 which integrated the raw state)."""
        diffusion = self.diffusion(delta_t)
        dw = jax.random.normal(key, state.continuous.shape, state.continuous.dtype)
        mask = heads.absorbing if multimodal else state.mask_t
        new_continuous = (
            state.continuous + delta_t * heads.continuous + diffusion * dw
        ) * mask
        return state.replace(continuous=new_continuous)


@dataclass(frozen=True)
class TelegraphBridge:
    """Multivariate telegraph CTMC bridge on a vocab of S tokens."""

    gamma: float
    time_epsilon: float
    vocab_size: int

    @classmethod
    def from_config(cls, config):
        return cls(
            gamma=config.bridge.gamma,
            time_epsilon=config.bridge.time_eps,
            vocab_size=config.data.vocab_size_features,
        )

    def sample(self, key, t, k0, k1):
        return telegraph_sample(key, t, k0, k1, self.gamma, self.vocab_size)

    def rate(self, t, k, logits):
        return telegraph_rate(t, k, logits, self.gamma, self.vocab_size)

    def transition_probability(self, t, k0, k1):
        return telegraph_transition_probability(
            t, k0, k1, self.gamma, self.vocab_size
        )

    def conditional_probability(self, t_in, t_out, k_in, k_out):
        return telegraph_conditional_probability(
            t_in, t_out, k_in, k_out, self.gamma, self.vocab_size
        )

    def solver_step(self, key, state, heads, delta_t, multimodal: bool = True):
        new_discrete = telegraph_fused_solver_step(
            key,
            state.time,
            state.discrete,
            heads.discrete,
            self.gamma,
            self.vocab_size,
            delta_t,
        )
        mask = heads.absorbing if multimodal else state.mask_t
        new_discrete = new_discrete * mask.astype(new_discrete.dtype)
        return state.replace(discrete=new_discrete)


@dataclass(frozen=True)
class AbsorbingBridge:
    """Survival bridge for the existence mask (vocab {dead, alive})."""

    gamma_absorb: float
    time_epsilon: float
    vocab_size: int = 2
    target_dropout: float = 0.0
    death_rate_scale: float = 0.0

    @classmethod
    def from_config(cls, config):
        return cls(
            gamma_absorb=config.bridge.gamma_absorb,
            time_epsilon=config.bridge.time_eps,
            target_dropout=getattr(config.bridge, "target_dropout", 0.0),
            death_rate_scale=getattr(config.bridge, "death_rate_scale", 0.0),
        )

    def survival_probability(self, t):
        return absorbing_survival_probability(t, self.gamma_absorb)

    def sample(self, key, time, target_mask):
        return absorbing_sample(
            key, time, target_mask, self.gamma_absorb, self.target_dropout
        )

    def rate(self, t, k, logits):
        return absorbing_rate(t, k, logits, self.gamma_absorb)

    def solver_step(self, key, state: AbsorbingBridgeState, heads, delta_t):
        rates = self.rate(t=state.time, k=state.mask_t, logits=heads.absorbing)
        death_rates = None
        if self.death_rate_scale > 0.0:
            # opt-in death channel: an alive slot is a target slot with
            # posterior p = sigmoid(head logit) (the head's BCE label IS
            # the target mask) and never dies; otherwise it dies at the
            # bridge's own conditional hazard. Marginalizing:
            # rate = scale · (1 - p) · h(t).
            p_target = jax.nn.sigmoid(heads.absorbing)
            death_rates = (
                self.death_rate_scale
                * (1.0 - p_target)
                * absorbing_death_hazard(state.time, self.gamma_absorb)
            )
        new_mask = absorbing_step(
            key, state.mask_t, rates, delta_t, death_rates=death_rates
        )
        return state.replace(mask_t=new_mask)
