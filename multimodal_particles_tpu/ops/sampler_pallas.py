"""Fully-fused MBM sampler step: one Pallas kernel per SDE step.

The hybrid sampler's per-step work is (EPiC forward → Euler ODE update →
telegraph single-jump update). With the forward already fused
(ops/epic_pallas.py), the remaining HBM traffic per step is the kernel
boundary: state in/out plus the solver elementwise chains. This kernel runs
THE WHOLE STEP in VMEM:

    time embedding (from the scalar t, in-kernel)
    → shared _forward_acts EPiC forward
    → x ← (x + Δt·drift)·mask                    (bridges.py Euler step)
    → telegraph single-jump token update          (exact closed form)

so the scan carries lane-layout state ((3, B·N) kinematics, (1, B·N)
tokens) and each step reads/writes only the state plus two uniform planes.

Randomness comes in as EXTERNAL uniforms (2, B·N) drawn with jax.random in
the scan body — keeping jax-key determinism and making the kernel a
deterministic function that interpret-mode parity tests can check
elementwise against the jnp reference (tests/test_ops/test_sampler_pallas.py).

Distribution of the token update is identical to
bridges.telegraph_fused_solver_step (same math, explicit uniforms).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_particles_tpu.ops.epic_pallas import (
    _forward_acts,
    _mm,
    _weights_dict,
    pack_mbm_encoder_params,
)


def _time_embedding_col(t, E):
    """sinusoidal_positional_encoding of a scalar t as an (E, 1) column
    ([cos | sin] ordering, log-spaced frequencies)."""
    half = E // 2
    idx = jax.lax.broadcasted_iota(jnp.int32, (E, 1), 0)
    freq = jnp.exp(
        -math.log(10000.0) * (idx % half).astype(jnp.float32) / half
    )
    arg = t * freq
    return jnp.where(idx < half, jnp.cos(arg), jnp.sin(arg))


def _step_math(x, k_col, mask, u, W, t, dt, *, TB, N, vocab, num_blocks,
               use_skip, add_discrete_head, gamma, dim_emb_time):
    """One full sampler step in lane layout; pure function shared by the
    kernel and the interpret/parity oracle."""
    rows = TB * N

    temb_col = _time_embedding_col(t, dim_emb_time)
    t_local = jnp.broadcast_to(temb_col, (dim_emb_time, rows))

    cont, disc_logits, acts = _forward_acts(
        x, k_col, mask, t_local, W,
        TB=TB, N=N, vocab=vocab, num_blocks=num_blocks, use_skip=use_skip,
    )
    if not add_discrete_head:
        disc_logits = acts["disc_pre"]

    # ---- Euler ODE update (bridges.LinearUniformBridge.solver_step)
    x_new = (x + dt * cont) * mask

    # ---- telegraph single-jump update (bridges.telegraph_fused_solver_step)
    S = vocab
    one_hot = (
        jax.lax.broadcasted_iota(jnp.int32, (S, rows), 0) == k_col
    ).astype(jnp.float32)
    m = jnp.max(disc_logits, axis=0, keepdims=True)
    e = jnp.exp(disc_logits - m)
    qx = e / jnp.sum(e, axis=0, keepdims=True)  # (S, rows)
    qy = jnp.sum(qx * one_hot, axis=0, keepdims=True)  # (1, rows)
    w = jnp.exp(-S * gamma * (1.0 - t))
    rates = 1.0 + (w * S) / (1.0 - w) * qx + w * qy

    lam = rates * dt
    lam_total = jnp.sum(lam, axis=0, keepdims=True)  # (1, rows)
    do_jump = u[0:1] < lam_total * jnp.exp(-lam_total)

    # cumsum has no Mosaic lowering; the S-step prefix sum is a matmul
    # against a lower-triangular one-matrix (S = 8 — trivial on the MXU)
    tri_r = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    tri_c = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    L = (tri_c <= tri_r).astype(jnp.float32)
    cdf = _mm(L, lam)  # (S, rows)
    u2 = u[1:2] * lam_total
    target = jnp.sum((u2 >= cdf).astype(jnp.int32), axis=0, keepdims=True)
    target = jnp.clip(target, 0, S - 1)

    k_new = jnp.where(do_jump, target, k_col)
    k_new = (k_new * mask.astype(jnp.int32)).astype(jnp.int32)
    return x_new, k_new


def _step_kernel(t_ref, dt_ref, x_ref, k_ref, mask_ref, u_ref, *rest,
                 TB, N, vocab, num_blocks, use_skip, add_discrete_head, gamma,
                 dim_emb_time):
    w_refs, (x_out_ref, k_out_ref) = rest[:-2], rest[-2:]
    W = _weights_dict([r[:] for r in w_refs])
    x_new, k_new = _step_math(
        x_ref[:], k_ref[:], mask_ref[:], u_ref[:], W,
        t_ref[0, 0], dt_ref[0, 0],
        TB=TB, N=N, vocab=vocab, num_blocks=num_blocks,
        use_skip=use_skip, add_discrete_head=add_discrete_head, gamma=gamma,
        dim_emb_time=dim_emb_time,
    )
    x_out_ref[:] = x_new
    k_out_ref[:] = k_new


def _pick_tile(B):
    for tb in (128, 64, 32, 16, 8, 4, 2, 1):
        if B % tb == 0:
            return tb
    return 1


def make_fused_sampler_step(*, num_blocks, use_skip, add_discrete_head,
                            dim_c, vocab, gamma, dim_emb_time, interpret=False):
    """Returns make_for(N, B) → step(packed, xT, kT, maskT, u, t, dt) →
    (xT', kT') with state in (features, B·N) lane layout."""

    def make_for(N, B):
        TB = _pick_tile(B)
        TBN = TB * N
        kernel = functools.partial(
            _step_kernel, TB=TB, N=N, vocab=vocab, num_blocks=num_blocks,
            use_skip=use_skip, add_discrete_head=add_discrete_head, gamma=gamma,
            dim_emb_time=dim_emb_time,
        )

        def lane_spec(d):
            return pl.BlockSpec((d, TBN), lambda i: (0, i), memory_space=pltpu.VMEM)

        smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        full = lambda a: pl.BlockSpec(
            a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
        )

        def step(packed, xT, kT, maskT, u, t, dt):
            in_specs = [smem, smem, lane_spec(dim_c), lane_spec(1),
                        lane_spec(1), lane_spec(2)] + [full(w) for w in packed]
            x_new, k_new = pl.pallas_call(
                kernel,
                grid=(B // TB,),
                in_specs=in_specs,
                out_specs=(lane_spec(dim_c), lane_spec(1)),
                out_shape=(
                    jax.ShapeDtypeStruct((dim_c, B * N), jnp.float32),
                    jax.ShapeDtypeStruct((1, B * N), jnp.int32),
                ),
                interpret=interpret,
            )(
                jnp.asarray(t, jnp.float32).reshape(1, 1),
                jnp.asarray(dt, jnp.float32).reshape(1, 1),
                xT, kT, maskT, u, *packed,
            )
            return x_new, k_new

        return step

    return make_for


def fused_simulate_dynamics(model, params, state, batch, key):
    """Drop-in replacement for MBM.simulate_dynamics when the whole step is
    fused: transpose the state into lane layout once, scan the single-kernel
    step, transpose back."""
    cfg = model.config
    cfg_b, cfg_d, cfg_e = cfg.bridge, cfg.data, cfg.encoder
    B, N, dim_c = state.continuous.shape
    rows = B * N

    packed = pack_mbm_encoder_params(
        params["encoder"], cfg_e.num_blocks, dim_c
    )
    make_for = make_fused_sampler_step(
        num_blocks=cfg_e.num_blocks,
        use_skip=cfg_e.skip_connection,
        add_discrete_head=cfg_e.add_discrete_head,
        dim_c=dim_c,
        vocab=cfg_d.vocab_size_features,
        gamma=cfg_b.gamma,
        dim_emb_time=cfg_e.dim_emb_time,
        interpret=jax.default_backend() == "cpu",
    )
    step_fn = make_for(N, B)

    time_steps = jnp.linspace(0.0, 1.0 - cfg_b.time_eps, cfg_b.num_timesteps)
    delta_t = (time_steps[-1] - time_steps[0]) / (cfg_b.num_timesteps - 1)

    xT = state.continuous.astype(jnp.float32).reshape(rows, dim_c).T
    kT = state.discrete.reshape(1, rows).astype(jnp.int32)
    maskT = state.absorbing.astype(jnp.float32).reshape(1, rows)

    def body(carry, t):
        xT, kT, key = carry
        key, ku = jax.random.split(key)
        u = jax.random.uniform(ku, (2, rows), jnp.float32)
        xT, kT = step_fn(packed, xT, kT, maskT, u, t, delta_t)
        return (xT, kT, key), None

    (xT, kT, _), _ = jax.lax.scan(body, (xT, kT, key), time_steps[1:])

    continuous = xT.T.reshape(B, N, dim_c).astype(state.continuous.dtype)
    discrete = kT.reshape(B, N, 1).astype(state.discrete.dtype)
    return state.replace(continuous=continuous, discrete=discrete)
