"""Fused masked attention core for the particle-axis transformer heads.

The gsdm AttnBlock (used by the absorbing survival head and the
transdimensional rate/creation heads — reference: architectures/gsdm.py:69-168)
computes dense N×N attention per jet. As XLA einsums the (B, heads, N, N)
score tensor round-trips HBM twice per block (≈0.5 GB at production batch);
this kernel keeps one batch tile's q/k/v in VMEM and runs

    scores → mask bias → softmax → value contraction

per (jet, head) without materializing scores — flash-attention structure,
trivially exact at N ≤ 128 (no tiling over keys needed; the whole score
matrix lives in registers/VMEM).

Head split/merge are selection matmuls (S_h one-hots) because lane slices
must be 128-aligned; all dots run on the MXU with f32 accumulation.
Parity-tested against the einsum path in tests/test_ops/test_attention_pallas.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dg(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32
    )


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, TB, N, C, n_heads):
    head_dim = C // n_heads
    scale = head_dim**-0.5

    # head-selection one-hots (C, head_dim) built from iota
    col = jax.lax.broadcasted_iota(jnp.int32, (C, head_dim), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (C, head_dim), 0)

    for t in range(TB):
        q_t = q_ref[t]  # (N, C)
        k_t = k_ref[t]
        v_t = v_ref[t]
        bias_t = bias_ref[t]  # (1, N) additive key bias

        head_outs = []
        for h in range(n_heads):
            S_h = (row == col + h * head_dim).astype(jnp.float32)  # (C, hd)
            qh = _dg(q_t, S_h, ((1,), (0,)))  # (N, hd)
            kh = _dg(k_t, S_h, ((1,), (0,)))
            vh = _dg(v_t, S_h, ((1,), (0,)))

            scores = _dg(qh, kh, ((1,), (1,))) * scale  # (Nq, Nk)
            scores = scores + bias_t  # broadcast over the q axis
            m = jnp.max(scores, axis=1, keepdims=True)
            e = jnp.exp(scores - m)
            w = e / jnp.sum(e, axis=1, keepdims=True)

            out_h = _dg(w, vh, ((1,), (0,)))  # (Nq, hd)
            head_outs.append(_dg(out_h, S_h, ((1,), (1,))))  # (Nq, C)

        out_t = head_outs[0]
        for ho in head_outs[1:]:
            out_t = out_t + ho
        out_ref[t] = out_t


def _pick_tile(B):
    for tb in (8, 4, 2, 1):
        if B % tb == 0:
            return tb
    return 1


def _core_jnp(q, k, v, bias, n_heads):
    """Reference einsum core — the backward pass and the parity oracle."""
    B, N, C = q.shape
    hd = C // n_heads
    q4 = q.reshape(B, N, n_heads, hd)
    k4 = k.reshape(B, N, n_heads, hd)
    v4 = v.reshape(B, N, n_heads, hd)
    w = jnp.einsum("bkhd,bqhd->bhqk", k4, q4) * (hd**-0.5)
    w = w + bias[:, None, :, :]  # (B, 1→heads, 1→q, N_k)
    w = jax.nn.softmax(w, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v4).reshape(B, N, C)


def _pallas_core(q, k, v, bias, n_heads, interpret):
    B, N, C = q.shape
    TB = _pick_tile(B)
    kernel = functools.partial(_attn_kernel, TB=TB, N=N, C=C, n_heads=n_heads)

    def spec(d2, d3):
        return pl.BlockSpec((TB, d2, d3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=[spec(N, C), spec(N, C), spec(N, C), spec(1, N)],
        out_specs=spec(N, C),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        interpret=interpret,
    )(
        q.astype(jnp.float32),
        k.astype(jnp.float32),
        v.astype(jnp.float32),
        bias.astype(jnp.float32),
    )
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attention_core(q, k, v, bias, n_heads, interpret):
    return _pallas_core(q, k, v, bias, n_heads, interpret)


def _attention_core_fwd(q, k, v, bias, n_heads, interpret):
    return _pallas_core(q, k, v, bias, n_heads, interpret), (q, k, v, bias)


def _attention_core_bwd(n_heads, interpret, res, g):
    """Backward through the einsum reference (XLA): the kernel is used on
    the sampling hot path; training keeps autodiff-exact gradients."""
    q, k, v, bias = res
    _, vjp = jax.vjp(lambda q, k, v, bias: _core_jnp(q, k, v, bias, n_heads), q, k, v, bias)
    return vjp(g)


_attention_core.defvjp(_attention_core_fwd, _attention_core_bwd)


@functools.partial(jax.jit, static_argnames=("n_heads", "interpret"))
def attention_core_pallas(q, k, v, mask=None, *, n_heads, interpret=False):
    """softmax(q kᵀ/√d + mask_bias) v with per-jet dense attention.

    Differentiable: forward is the fused kernel, backward is autodiff of the
    einsum reference.

    Args:
      q, k, v: (B, N, C) pre-head-split projections.
      mask: optional (B, N, 1) key validity mask.
    Returns:
      (B, N, C) attention output (pre proj_out, pre residual).
    """
    B, N, C = q.shape
    if mask is not None:
        bias = jnp.where(mask[..., 0] > 0, 0.0, -1e9)[:, None, :]  # (B, 1, N)
    else:
        bias = jnp.zeros((B, 1, N), jnp.float32)
    return _attention_core(q, k, v, bias, n_heads, interpret)
