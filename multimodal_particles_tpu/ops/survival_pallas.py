"""Fused survival-head (absorbing rate transformer) as one Pallas TPU kernel.

The absorbing sampler's cost is dominated by its survival head — a small
transformer (proj_in → n × (ResnetBlock, AttnBlock) → two projections) over
(B, N, 128) activations (reference: absorbing/absorbing_flows.py:94-131,
architectures/gsdm.py:38-168). As separate XLA ops that is ~30 HBM round
trips of a B·N·128 fp32 tensor per sampler step (measured 65% of the step at
config scale); this kernel keeps one jet tile resident in VMEM and runs the
whole head in a single pass.

TPU layout: activations are (rows = TB·N sublanes, C = 128 lanes) — the
transformer width is exactly one lane tile, so channel-axis matmuls are
(rows, 128) × (128, 128) MXU GEMMs with zero lane padding. Jet-local
operations use free leading-dim reshapes (TB·N, C) → (TB, N, C):

  * GroupNorm(32 groups of 4 channels): per-(jet, group) statistics are two
    matmuls against a channel→group membership matrix built from iota —
    never a lane-axis reshape, so N need NOT be a multiple of 128 (the
    reference absorbing config uses N=109);
  * attention: per-head scores via channel masking — S_h = (q ⊙ m_h) · kᵀ
    contracts all 128 lanes but only head h's channels contribute — then
    batched (TB, N, N) softmax and value contraction on the MXU.

The head attends over ALL N slots including existence-mask padding, exactly
like the reference (AttnBlock is called without a mask —
absorbing_flows.py:124). Mosaic wants the attention/stat dimensions
lane-aligned, so N is rounded up to a multiple of 128 — but unlike the
masked trunk this padding must be EXACT for the unmasked head: the
kernel-padding rows are excluded from the GroupNorm statistics (counts use
the real N) and from the attention keys (-1e9 score bias), so real slots
see exactly the reference's N-slot head.

Weight layout notes: kernel-size-1 Conv1d ≡ Dense over channels; the
per-block time-embedding projections depend only on (B,) times and are
computed outside in XLA (tiny), entering as (B, C) side inputs.

Parity-tested against the flax head (tests/test_ops/test_survival_pallas.py)
which is itself torch-parity-tested (tests/test_parity_reference.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_particles_tpu.models.architectures.utils import (
    get_timestep_embedding,
)

GN_GROUPS = 32
GN_EPS = 1e-6


def pack_survival_head_params(gen_params, n_blocks: int):
    """flax AbsorbingGenerator param tree → flat tuple for the kernel.

    Dense kernels stay (in, out) — the kernel right-multiplies (rows, C) @
    (C, C). The proj_in kernel is split into the trunk-hidden part and the
    two mask-one-hot rows.
    """
    p_in = gen_params["transformer_1_proj_in"]
    w_in = p_in["kernel"]  # (Dh + 2, C)
    dh = w_in.shape[0] - 2
    w_in_h = w_in[:dh]  # (Dh, C)
    w_oh0 = w_in[dh][None, :]  # (1, C) mask==0 row
    w_oh1 = w_in[dh + 1][None, :]  # (1, C) mask==1 row
    b_in = p_in["bias"][None, :]

    def dense(p):
        return p["kernel"], p["bias"][None, :]

    def gn(p):
        return p["scale"][None, :], p["bias"][None, :]

    ws = [w_in_h, w_oh0, w_oh1, b_in]
    for i in range(n_blocks):
        res = gen_params[f"res_block_{i}"]
        att = gen_params[f"attn_block_{i}"]
        ws += [*gn(res["norm1"]), *dense(res["conv1"])]
        ws += [*gn(res["norm2"]), *dense(res["conv2"])]
        ws += [*gn(att["norm"])]
        ws += [*dense(att["q"]), *dense(att["k"]), *dense(att["v"])]
        ws += [*dense(att["proj_out"])]
    ws += [*dense(gen_params["pre_rate_proj"])]
    w_post, b_post = dense(gen_params["post_rate_proj"])
    # (C, 1) output: keep as a (1, C) row vector; the final contraction is
    # done via elementwise-multiply + lane reduction (no 1-lane matmul)
    ws += [w_post.T, b_post]
    return tuple(jnp.asarray(w) for w in ws)


def _mm(a, b):
    """(m, k) @ (k, n) on the MXU, f32 accumulation, default (bf16-pass)
    input precision — matching the XLA Dense baseline."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _row_mask(TB, N, n_real):
    """(TB·N, 1) float mask of real (non-padding) particle rows."""
    r = jax.lax.broadcasted_iota(jnp.int32, (TB * N, 1), 0)
    return (r % N < n_real).astype(jnp.float32)


def _group_norm(h, scale, bias, TB, N, C, n_real, row_mask):
    """flax/torch GroupNorm(32) on (rows, C): stats per (jet, group) over
    the jet's n_real × C/32 values, via membership matmuls. Padded rows
    (N may be rounded up to a lane multiple) are excluded from the
    statistics and produce junk output rows that every consumer masks."""
    group_size = C // GN_GROUPS
    hm = h * row_mask if n_real != N else h
    h3 = hm.reshape(TB, N, C)
    sum_c = jnp.sum(h3, axis=1)  # (TB, C)
    sum_sq_c = jnp.sum(h3 * h3, axis=1)  # (TB, C)

    # channel → group membership (C, GROUPS), built from iota
    ch = jax.lax.broadcasted_iota(jnp.int32, (C, GN_GROUPS), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (C, GN_GROUPS), 1)
    M = (ch // group_size == gr).astype(jnp.float32)

    cnt = jnp.float32(n_real * group_size)
    mean_g = _mm(sum_c, M) / cnt  # (TB, GROUPS)
    # E[x²]−E[x]² can go slightly negative in f32 for large-mean inputs
    # (catastrophic cancellation) and would feed rsqrt a value below −eps;
    # clamp keeps the kernel finite where the two-pass flax GroupNorm is
    var_g = jnp.maximum(_mm(sum_sq_c, M) / cnt - mean_g * mean_g, 0.0)

    mean_c = _mm(mean_g, M.T)  # (TB, C)
    rstd_c = jax.lax.rsqrt(_mm(var_g, M.T) + GN_EPS)

    h3 = (hm.reshape(TB, N, C) - mean_c[:, None, :]) * rstd_c[:, None, :]
    h = h3.reshape(TB * N, C)
    return h * scale + bias


def _attention(x, hn, wq, bq, wk, bk, wv, bv, wp, bp, TB, N, C, n_heads, n_real):
    """Residual multi-head self-attention over the particle axis:
    x + proj_out(attn(hn)) where hn = GroupNorm(x). Real slots attend over
    ALL n_real slots exactly like the reference (no validity mask —
    gsdm.py:142-168); only kernel-padding key lanes are excluded."""
    head_dim = C // n_heads
    q = _mm(hn, wq) + bq
    k = _mm(hn, wk) + bk
    v = _mm(hn, wv) + bv

    q3 = q.reshape(TB, N, C) * (head_dim**-0.5)
    k3 = k.reshape(TB, N, C)
    v3 = v.reshape(TB, N, C)

    if n_real != N:
        # full-shape iota: Mosaic's lowering rejects rank-3 dim-1 broadcasts
        key_lane = jax.lax.broadcasted_iota(jnp.int32, (TB, N, N), 2)
    else:
        key_lane = None

    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
    out = jnp.zeros((TB, N, C), jnp.float32)
    for head in range(n_heads):
        m_h = ((ch // head_dim) == head).astype(jnp.float32)
        # S[b, i, j] = sum_c q[b,i,c] m_h[c] k[b,j,c]
        s = jax.lax.dot_general(
            q3 * m_h,
            k3,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, N, N)
        if key_lane is not None:
            s = jnp.where(key_lane < n_real, s, -1e9)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        out = out + jax.lax.dot_general(
            p,
            v3 * m_h,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    o = out.reshape(TB * N, C)
    return x + _mm(o, wp) + bp


def _survival_kernel(
    last_ref, mask_ref, *rest, TB, N, C, n_blocks, n_heads, n_real
):
    tp_refs = rest[:n_blocks]
    w_refs, out_ref = rest[n_blocks:-1], rest[-1]
    ws = [r[:] for r in w_refs]
    it = iter(ws)

    w_in_h, w_oh0, w_oh1, b_in = next(it), next(it), next(it), next(it)

    last = last_ref[:]  # (rows, Dh)
    m_col = mask_ref[:]  # (rows, 1)
    row_mask = _row_mask(TB, N, n_real)

    # proj_in of [trunk_hidden ‖ one_hot(mask)]
    h = _mm(last, w_in_h) + w_oh0 + m_col * (w_oh1 - w_oh0) + b_in

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

        # temb_proj(swish(temb)) precomputed outside: (TB, C) per block
        tp = tp_refs[i][:]  # (TB, C)
        tp_rows = jnp.broadcast_to(tp[:, None, :], (TB, N, C)).reshape(TB * N, C)

        # ResnetBlock (reference: gsdm.py:38-66)
        r = _group_norm(h, gn1_s, gn1_b, TB, N, C, n_real, row_mask)
        r = _mm(_swish(r), w_c1) + b_c1
        r = r + tp_rows
        r = _group_norm(r, gn2_s, gn2_b, TB, N, C, n_real, row_mask)
        r = _mm(_swish(r), w_c2) + b_c2
        h = h + r

        # AttnBlock (reference: gsdm.py:69-168)
        hn = _group_norm(h, gna_s, gna_b, TB, N, C, n_real, row_mask)
        h = _attention(
            h, hn, wq, bq, wk, bk, wv, bv, wp, bp, TB, N, C, n_heads, n_real
        )

    w_pre, b_pre = next(it), next(it)
    w_post_row, b_post = next(it), next(it)  # (1, C), (1, 1)

    h = _mm(h, w_pre) + b_pre
    # final (C → 1) projection as an elementwise product + lane reduction
    logit = jnp.sum(h * w_post_row, axis=1, keepdims=True) + b_post
    out_ref[:] = logit


def _pick_tile(N, C, budget_bytes=6 * 1024 * 1024):
    """Largest jet tile whose activation working set fits a conservative
    VMEM budget (several (TB·N, C) f32 buffers live at once).

    Only multiples of 8 are valid: the per-block (TB, C) time-embedding
    blocks put TB in the sublane dimension, and Mosaic requires sublane
    block sizes divisible by 8. Callers pad B up to a TB multiple (exact:
    jets are independent in these kernels) rather than shrinking TB to a
    divisor of B."""
    per_jet = N * C * 4 * 8  # ~8 live buffers
    for tb in (64, 32, 16):
        if tb * per_jet <= budget_bytes:
            return tb
    return 8


@functools.partial(
    jax.jit,
    static_argnames=("n_blocks", "n_heads", "transformer_dim", "interpret"),
)
def survival_head_pallas(
    packed,
    temb_projected,
    last_layer,
    mask_t,
    *,
    n_blocks,
    n_heads,
    transformer_dim,
    interpret=False,
):
    """Fused survival-head forward.

    Args:
      packed: tuple from pack_survival_head_params.
      temb_projected: tuple of n_blocks (B, C) arrays — temb_proj_i(swish(temb)).
      last_layer: (B, N, Dh) trunk hidden state.
      mask_t: (B, N, 1) current existence mask.
    Returns:
      (B, N, 1) survival logits.
    """
    B_in, N_in, Dh = last_layer.shape
    C = transformer_dim
    N = ((N_in + 127) // 128) * 128
    if N != N_in:
        pad = ((0, 0), (0, N - N_in), (0, 0))
        last_layer = jnp.pad(last_layer, pad)
        mask_t = jnp.pad(mask_t, pad)
    TB = _pick_tile(N, C)
    B = -(-B_in // TB) * TB  # pad jets to a tile multiple (exact: per-jet kernel)
    if B != B_in:
        last_layer = jnp.pad(last_layer, ((0, B - B_in), (0, 0), (0, 0)))
        mask_t = jnp.pad(mask_t, ((0, B - B_in), (0, 0), (0, 0)))
        temb_projected = tuple(
            jnp.pad(tp, ((0, B - B_in), (0, 0))) for tp in temb_projected
        )
    rows = TB * N

    last2 = last_layer.astype(jnp.float32).reshape(B * N, Dh)
    mask2 = mask_t.astype(jnp.float32).reshape(B * N, 1)

    kernel = functools.partial(
        _survival_kernel, TB=TB, N=N, C=C, n_blocks=n_blocks, n_heads=n_heads,
        n_real=N_in
    )

    row_spec = lambda d: pl.BlockSpec(
        (rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    jet_spec = pl.BlockSpec((TB, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )

    in_specs = (
        [row_spec(Dh), row_spec(1)]
        + [jet_spec] * n_blocks
        + [full(w) for w in packed]
    )

    out = pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=in_specs,
        out_specs=row_spec(1),
        out_shape=jax.ShapeDtypeStruct((B * N, 1), jnp.float32),
        interpret=interpret,
    )(last2, mask2, *temb_projected, *packed)

    return out.reshape(B, N, 1)[:B_in, :N_in]


def project_time_embeddings(gen_params, t, n_blocks: int, temb_dim: int):
    """The (B,)-sized per-block time-MLP side inputs, computed in XLA:
    tp_i = res_block_i.temb_proj(swish(temb_net(timestep_embedding(1000 t))))."""
    B = t.shape[0]
    ts = t.reshape(B)
    temb = get_timestep_embedding(ts.astype(jnp.float32) * 1000.0, temb_dim)
    temb = temb @ gen_params["temb_net"]["kernel"] + gen_params["temb_net"]["bias"]
    stemb = _swish(temb)
    outs = []
    for i in range(n_blocks):
        p = gen_params[f"res_block_{i}"]["temb_proj"]
        outs.append(_swish_proj(stemb, p))
    return tuple(outs)


def _swish_proj(stemb, p):
    return stemb @ p["kernel"] + p["bias"]


def survival_pallas_supported(config) -> bool:
    """Kernel covers the shipped absorbing head family: channel width a
    lane multiple, heads dividing channels, no attention dim reduction."""
    # tensor-parallel exclusion — same reasoning as mbm_pallas_supported
    if getattr(getattr(config, "parallel", None), "model_axis", 1) > 1:
        return False
    g = config.generator
    return (
        g.transformer_dim % 128 == 0
        and g.transformer_dim % max(g.n_heads, 1) == 0
        and g.n_attn_blocks >= 1
    )
