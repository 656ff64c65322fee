"""Generic fused (ResnetBlock, AttnBlock)* stack as one Pallas TPU kernel.

The transdimensional network runs TWO gsdm transformer stacks per forward —
the rate/nearest-atom head and the creation (vector) head (reference:
transdimensional_model.py:135-452) — each `proj_in → n × (ResnetBlock,
AttnBlock)` over (B, N, 128) activations, exactly the structure of the
absorbing survival head that ops/survival_pallas.py fuses. This module
generalizes that kernel:

  * arbitrary input width: the caller passes the already-concatenated
    per-particle input (B, N, Din) and the full proj_in weight — no
    special-cased one-hot split;
  * the OUTPUT is the full hidden state (B, N, C): the heads' final small
    projections (rate pooling, per-slot logits, creation stats) stay in XLA,
    costing one extra HBM round trip of h but keeping the kernel reusable
    for any head shape.

Everything else (GroupNorm-by-membership-matmul, per-head channel-masked
attention, lane-padded N with exact statistics) matches survival_pallas.py —
see its module docstring for the layout rationale. Parity-tested against the
flax stack in tests/test_ops/test_gsdm_stack_pallas.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_particles_tpu.ops.survival_pallas import (
    _attention,
    _group_norm,
    _mm,
    _pick_tile,
    _row_mask,
    _swish,
)


def pack_gsdm_stack_params(proj_in, res_blocks, attn_blocks):
    """(proj_in params, [res_i params], [attn_i params]) → flat weight tuple.

    Dense kernels stay (in, out); the kernel right-multiplies (rows, ·).
    """

    def dense(p):
        return p["kernel"], p["bias"][None, :]

    def gn(p):
        return p["scale"][None, :], p["bias"][None, :]

    ws = [*dense(proj_in)]
    for res, att in zip(res_blocks, attn_blocks):
        ws += [*gn(res["norm1"]), *dense(res["conv1"])]
        ws += [*gn(res["norm2"]), *dense(res["conv2"])]
        ws += [*gn(att["norm"])]
        ws += [*dense(att["q"]), *dense(att["k"]), *dense(att["v"])]
        ws += [*dense(att["proj_out"])]
    return tuple(jnp.asarray(w) for w in ws)


def stack_time_embeddings(temb, res_blocks):
    """Per-block temb side inputs: res_i.temb_proj(swish(temb)) for an
    already-projected (B, C_temb) temb (the caller owns temb_net)."""
    stemb = _swish(temb)
    return tuple(
        stemb @ res["temb_proj"]["kernel"] + res["temb_proj"]["bias"]
        for res in res_blocks
    )


def _stack_kernel(x_ref, *rest, TB, N, C, n_blocks, n_heads, n_real):
    tp_refs = rest[:n_blocks]
    w_refs, out_ref = rest[n_blocks:-1], rest[-1]
    ws = [r[:] for r in w_refs]
    it = iter(ws)

    w_in, b_in = next(it), next(it)
    row_mask = _row_mask(TB, N, n_real)

    h = _mm(x_ref[:], w_in) + b_in

    for i in range(n_blocks):
        gn1_s, gn1_b = next(it), next(it)
        w_c1, b_c1 = next(it), next(it)
        gn2_s, gn2_b = next(it), next(it)
        w_c2, b_c2 = next(it), next(it)
        gna_s, gna_b = next(it), next(it)
        wq, bq, wk, bk, wv, bv = (
            next(it), next(it), next(it), next(it), next(it), next(it),
        )
        wp, bp = next(it), next(it)

        tp = tp_refs[i][:]  # (TB, C)
        tp_rows = jnp.broadcast_to(tp[:, None, :], (TB, N, C)).reshape(TB * N, C)

        # ResnetBlock (reference: gsdm.py:27-47)
        r = _group_norm(h, gn1_s, gn1_b, TB, N, C, n_real, row_mask)
        r = _mm(_swish(r), w_c1) + b_c1
        r = r + tp_rows
        r = _group_norm(r, gn2_s, gn2_b, TB, N, C, n_real, row_mask)
        r = _mm(_swish(r), w_c2) + b_c2
        h = h + r

        # AttnBlock (reference: gsdm.py:49-106)
        hn = _group_norm(h, gna_s, gna_b, TB, N, C, n_real, row_mask)
        h = _attention(
            h, hn, wq, bq, wk, bk, wv, bv, wp, bp, TB, N, C, n_heads, n_real
        )

    out_ref[:] = h


@functools.partial(
    jax.jit,
    static_argnames=("n_blocks", "n_heads", "transformer_dim", "interpret"),
)
def gsdm_stack_pallas(
    packed,
    temb_projected,
    x_in,
    *,
    n_blocks,
    n_heads,
    transformer_dim,
    interpret=False,
):
    """Fused stack forward.

    Args:
      packed: tuple from pack_gsdm_stack_params.
      temb_projected: tuple of n_blocks (B, C) arrays (stack_time_embeddings).
      x_in: (B, N, Din) per-particle stack input (already concatenated).
    Returns:
      (B, N, C) hidden state after the last AttnBlock.
    """
    B_in, N_in, Din = x_in.shape
    C = transformer_dim
    N = ((N_in + 127) // 128) * 128
    if N != N_in:
        x_in = jnp.pad(x_in, ((0, 0), (0, N - N_in), (0, 0)))
    TB = _pick_tile(N, C)
    B = -(-B_in // TB) * TB  # pad jets to a tile multiple (exact: per-jet kernel)
    if B != B_in:
        x_in = jnp.pad(x_in, ((0, B - B_in), (0, 0), (0, 0)))
        temb_projected = tuple(
            jnp.pad(tp, ((0, B - B_in), (0, 0))) for tp in temb_projected
        )
    rows = TB * N

    x2 = x_in.astype(jnp.float32).reshape(B * N, Din)

    kernel = functools.partial(
        _stack_kernel, TB=TB, N=N, C=C, n_blocks=n_blocks, n_heads=n_heads,
        n_real=N_in,
    )

    row_spec = lambda d: pl.BlockSpec(
        (rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    jet_spec = pl.BlockSpec((TB, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )

    in_specs = (
        [row_spec(Din)]
        + [jet_spec] * n_blocks
        + [full(w) for w in packed]
    )

    out = pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=in_specs,
        out_specs=row_spec(C),
        out_shape=jax.ShapeDtypeStruct((B * N, C), jnp.float32),
        interpret=interpret,
    )(x2, *temb_projected, *packed)

    return out.reshape(B, N, C)[:B_in, :N_in]
