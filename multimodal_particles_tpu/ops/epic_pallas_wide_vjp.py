"""Custom-VJP Pallas EPiC for WIDE hidden sizes: fused forward AND backward
training kernels in the row-major layout of ops/epic_pallas_wide.py.

Same design as the narrow pair (ops/epic_pallas_vjp.py): the backward is a
second Pallas kernel that RECOMPUTES the forward activations tile-by-tile
in VMEM (zero residual traffic to HBM) and accumulates the weight
cotangents across the (sequential) grid; the custom_vjp boundary sits at
the PACKED effective weights so weight-norm and the flax→packed mapping
chain through plain-jnp autodiff. Inputs (t, x, k, mask) get zero
cotangents — the training loss never differentiates through bridge
samples.

Row-major cotangent algebra (vs the narrow module's lane-layout forms):
  dW (in, out) = aᵀ · dz      — contract the ROW axis of both
  dh           = dz · Wᵀ      — contract the feature (lane) axis
  db (1, d)    = Σ_rows dz
  broadcast-to-rows backward  = per-jet SUBLANE sum (TB·N, d) → (TB, d)
All lane-axis concat/split offsets are lane multiples by the wide gate
(wide_pallas_supported), so the backward's feature slices are aligned.

Gradient math is verified against jax.grad of the flax stack in
tests/test_ops/test_epic_pallas_wide.py. Reference architecture:
models/architectures/epic.py:93-241.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_particles_tpu.models.architectures.utils import (
    sinusoidal_positional_encoding,
)
from multimodal_particles_tpu.ops.epic_pallas import WEIGHT_NAMES
from multimodal_particles_tpu.ops.epic_pallas_wide import (
    _bcast,
    _forward_acts_wide,
)


def _dg(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32
    )


def _outer(a, dz):
    """dW = aᵀ · dz: contract the row axis of activation and cotangent."""
    return _dg(a, dz, ((0,), (0,)))


def _mm_t(dz, w):
    """dh = dz · Wᵀ without materializing the transpose."""
    return _dg(dz, w, ((1,), (1,)))


def _colsum(dz):
    return jnp.sum(dz, axis=0, keepdims=True)


def _jetsum(x, TB, N):
    """Broadcast-to-rows backward: unmasked per-jet sum over particles."""
    return jnp.sum(x.reshape(TB, N, x.shape[1]), axis=1)


def _dleaky(z):
    return jnp.where(z >= 0, 1.0, 0.01)


def _dselu(z):
    alpha = 1.6732632423543772
    scale = 1.0507009873554805
    return scale * jnp.where(z >= 0, 1.0, alpha * jnp.exp(z))


def _fwd_kernel(x_ref, k_ref, mask_ref, temb_ref, *rest, TB, N, vocab,
                num_blocks, use_skip, add_discrete_head):
    w_refs, (out_c_ref, out_d_ref) = rest[:-2], rest[-2:]
    W = dict(zip(WEIGHT_NAMES, [r[:] for r in w_refs]))
    cont, disc, acts = _forward_acts_wide(
        x_ref[:], k_ref[:], mask_ref[:], temb_ref[:], W,
        TB=TB, N=N, vocab=vocab, num_blocks=num_blocks, use_skip=use_skip,
    )
    out_c_ref[:] = cont
    out_d_ref[:] = disc if add_discrete_head else acts["disc_pre"]


def _bwd_kernel(x_ref, k_ref, mask_ref, temb_ref, gc_ref, gd_ref, *rest,
                TB, N, vocab, num_blocks, use_skip, add_discrete_head):
    n_w = len(WEIGHT_NAMES)
    w_refs = rest[:n_w]
    grad_refs = rest[n_w:]
    W = dict(zip(WEIGHT_NAMES, [r[:] for r in w_refs]))

    mask = mask_ref[:]
    cont, disc, A = _forward_acts_wide(
        x_ref[:], k_ref[:], mask, temb_ref[:], W,
        TB=TB, N=N, vocab=vocab, num_blocks=num_blocks, use_skip=use_skip,
    )
    denom = A["denom"]  # (TB, 1)

    gc = gc_ref[:]  # (rows, dim_c)
    gd = gd_ref[:]  # (rows, V)

    G = {}

    # ---- heads
    if add_discrete_head:
        G["w_h1"] = _outer(A["a_h0"], gd)
        G["b_h1"] = _colsum(gd)
        dz_h0 = _mm_t(gd, W["w_h1"]) * _dselu(A["z_h0"])
        G["w_h0"] = _outer(A["disc_pre"], dz_h0)
        G["b_h0"] = _colsum(dz_h0)
        d_disc_pre = _mm_t(dz_h0, W["w_h0"])
    else:
        G["w_h1"] = jnp.zeros_like(W["w_h1"])
        G["b_h1"] = jnp.zeros_like(W["b_h1"])
        G["w_h0"] = jnp.zeros_like(W["w_h0"])
        G["b_h0"] = jnp.zeros_like(W["b_h0"])
        d_disc_pre = gd

    dzc = gc * mask
    dzd = d_disc_pre * mask
    G["w_out_c"] = _outer(A["h_final"], dzc)
    G["b_out_c"] = _colsum(dzc)
    G["w_out_d"] = _outer(A["h_final"], dzd)
    G["b_out_d"] = _colsum(dzd)
    dh = _mm_t(dzc, W["w_out_c"]) + _mm_t(dzd, W["w_out_d"])
    gdim = W["w_g2"].shape[1]
    dg = jnp.zeros((TB, gdim), jnp.float32)
    d_skip_local = jnp.zeros_like(dh)
    d_skip_global = jnp.zeros_like(dg)

    E = A["ctx"].shape[1]
    hidden = W["w_l0"].shape[1]

    layer_grads = {
        name: [None] * num_blocks
        for name in ("w_fg1", "b_fg1", "w_fg2", "b_fg2",
                     "w_fl1", "b_fl1", "w_fl2", "b_fl2")
    }

    # ---- layers, reversed
    for i in reversed(range(num_blocks)):
        la = A["layers"][i]
        # h_out = h_new*mask + skip_local ; g_out = g_new + skip_global
        if use_skip:
            d_skip_local = d_skip_local + dh
            d_skip_global = d_skip_global + dg
        dh_new = dh * mask
        dg_new = dg

        # h_new = leaky(z_fl2), z_fl2 = l1 Wfl2 + b + h_in
        dz_fl2 = dh_new * _dleaky(la["z_fl2"])
        layer_grads["w_fl2"][i] = _outer(la["l1"], dz_fl2)
        layer_grads["b_fl2"][i] = _colsum(dz_fl2)
        dh_in = dz_fl2  # residual into h_in
        dl1 = _mm_t(dz_fl2, W["w_fl2"][i])

        dz_fl1 = dl1 * _dleaky(la["z_fl1"])
        layer_grads["w_fl1"][i] = _outer(la["hcat"], dz_fl1)
        layer_grads["b_fl1"][i] = _colsum(dz_fl1)
        dhcat = _mm_t(dz_fl1, W["w_fl1"][i])  # (rows, hidden+gdim+E)
        dh_in = dh_in + dhcat[:, 0:hidden]
        dg_new = dg_new + _jetsum(dhcat[:, hidden : hidden + gdim], TB, N)
        # ctx cotangent dropped (no trainable params upstream)

        # g_new = leaky(z_fg2), z_fg2 = g1 Wfg2 + b + g_in
        dz_fg2 = dg_new * _dleaky(la["z_fg2"])
        layer_grads["w_fg2"][i] = _outer(la["g1"], dz_fg2)
        layer_grads["b_fg2"][i] = _colsum(dz_fg2)
        dg_in = dz_fg2
        dg1 = _mm_t(dz_fg2, W["w_fg2"][i])

        dz_fg1 = dg1 * _dleaky(la["z_fg1"])
        layer_grads["w_fg1"][i] = _outer(la["p"], dz_fg1)
        layer_grads["b_fg1"][i] = _colsum(dz_fg1)
        dp = _mm_t(dz_fg1, W["w_fg1"][i])  # (TB, 2*hidden+gdim+E)
        dmean = dp[:, 0:hidden]
        dsum = dp[:, hidden : 2 * hidden] + dmean / denom
        dg_in = dg_in + dp[:, 2 * hidden : 2 * hidden + gdim]
        # s = pool(h_in*mask)  →  dh_in += bcast(dsum) * mask
        dh_in = dh_in + _bcast(dsum, TB, N) * mask

        dh, dg = dh_in, dg_in

    # ---- skips fold into the projection outputs
    if use_skip:
        dh = dh + d_skip_local
        dg = dg + d_skip_global

    # ---- projection backward: h = leaky(z_l0)*mask; g chain over p0
    dz_g2 = dg * _dleaky(A["z_g2"])
    G["w_g2"] = _outer(A["a_g1"], dz_g2)
    G["b_g2"] = _colsum(dz_g2)
    da_g1 = _mm_t(dz_g2, W["w_g2"])
    dz_g1 = da_g1 * _dleaky(A["z_g1"])
    G["w_g1"] = _outer(A["a_g0"], dz_g1)
    G["b_g1"] = _colsum(dz_g1)
    da_g0 = _mm_t(dz_g1, W["w_g1"])
    dz_g0 = da_g0 * _dleaky(A["z_g0"])
    G["w_g0"] = _outer(A["p0"], dz_g0)
    G["b_g0"] = _colsum(dz_g0)
    dp0 = _mm_t(dz_g0, W["w_g0"])  # (TB, 2*hidden+E)
    dmean0 = dp0[:, 0:hidden]
    dsum0 = dp0[:, hidden : 2 * hidden] + dmean0 / denom

    # h = h_act*mask; s0 = pool(h_act*mask)
    dh_act = dh * mask + _bcast(dsum0, TB, N) * mask
    dz_l0 = dh_act * _dleaky(A["z_l0"])
    G["w_l0"] = _outer(A["feats"], dz_l0)
    G["b_l0"] = _colsum(dz_l0)
    dfeats = _mm_t(dz_l0, W["w_l0"]) * mask  # (rows, E_t+E_x+E_k)

    E_x = W["w_x"].shape[1]
    dx_emb = dfeats[:, E : E + E_x]
    dk_emb = dfeats[:, E + E_x :]
    G["w_x"] = _outer(x_ref[:], dx_emb)
    G["b_x"] = _colsum(dx_emb)
    G["table"] = _outer(A["k_onehot"], dk_emb)

    for name, per_layer in layer_grads.items():
        G[name] = jnp.stack(per_layer)

    # ---- accumulate across the (sequential) grid
    is_first = pl.program_id(0) == 0
    for name, ref in zip(WEIGHT_NAMES, grad_refs):
        val = G[name]

        @pl.when(is_first)
        def _(ref=ref, val=val):
            ref[:] = val

        @pl.when(jnp.logical_not(is_first))
        def _(ref=ref, val=val):
            ref[:] = ref[:] + val


# jets/tile: the recompute-backward keeps every layer activation live in
# VMEM — at hidden 128 and N=128 each block holds ~3 MB of (TB·N, ·) f32
# at TB=8; TB=4 halves that if a deeper config pressures VMEM.
_WIDE_TILE_FWD = 8
_WIDE_TILE_BWD = 8

# The backward's live set (recomputed activations for every block + the
# weight stacks + the accumulating grad outputs) is ~27 MB at TB=8 /
# hidden 128 / 6 blocks — over Mosaic's conservative 16 MB default scoped
# limit but nowhere near the chip's 128 MB VMEM. Raise the limit instead
# of shrinking TB: smaller tiles cut the MXU rows per matmul and multiply
# the sequential grid.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _layout_rows(t, x, k, mask, dim_emb_time, TB):
    """(B, N, ·) inputs → row-major kernel operands, padding B to the jet
    tile (exact: padded jets carry mask 0 and zero cotangents)."""
    B_in, N, dim_c = x.shape
    B = -(-B_in // TB) * TB
    if B != B_in:
        pad = ((0, B - B_in), (0, 0), (0, 0))
        x, k, mask, t = (jnp.pad(a, pad) for a in (x, k, mask, t))
    temb = sinusoidal_positional_encoding(
        t.reshape(B).astype(jnp.float32), dim_emb_time
    )
    xR = x.astype(jnp.float32).reshape(B * N, dim_c)
    kR = k.reshape(B * N, 1).astype(jnp.int32)
    maskR = mask.astype(jnp.float32).reshape(B * N, 1)
    return xR, kR, maskR, temb, B


def make_epic_train_forward_wide(*, num_blocks, use_skip, add_discrete_head,
                                 dim_c, vocab, hidden, dim_emb_time,
                                 interpret=False):
    """Build the wide custom-VJP fused forward for a static architecture.

    Returns fn(packed, t, x, k, mask) → (B, N, dim_c+vocab) differentiable
    w.r.t. `packed` (from pack_wide_encoder_params).
    """

    static = dict(
        vocab=vocab, num_blocks=num_blocks, use_skip=use_skip,
        add_discrete_head=add_discrete_head,
    )

    def _specs(N, TB, packed):
        TBN = TB * N

        def row_spec(d, block):
            return pl.BlockSpec(
                (block, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            )

        full = lambda a: pl.BlockSpec(
            a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
        )
        base = [
            row_spec(x_dim, TBN)
            for x_dim in (dim_c, 1, 1)
        ] + [row_spec(dim_emb_time, TB)]
        return base, [full(w) for w in packed], full, row_spec

    def fwd_impl(packed, t, x, k, mask):
        B_in, N = x.shape[0], x.shape[1]
        TB = _WIDE_TILE_FWD
        xR, kR, maskR, temb, B = _layout_rows(t, x, k, mask, dim_emb_time, TB)
        base, wspecs, _, row_spec = _specs(N, TB, packed)
        kernel = functools.partial(_fwd_kernel, TB=TB, N=N, **static)

        out_c, out_d = pl.pallas_call(
            kernel,
            grid=(B // TB,),
            in_specs=base + wspecs,
            out_specs=(row_spec(dim_c, TB * N), row_spec(vocab, TB * N)),
            out_shape=(
                jax.ShapeDtypeStruct((B * N, dim_c), jnp.float32),
                jax.ShapeDtypeStruct((B * N, vocab), jnp.float32),
            ),
            interpret=interpret,
            compiler_params=None if interpret else _VMEM_LIMIT,
        )(xR, kR, maskR, temb, *packed)
        out = jnp.concatenate([out_c, out_d], axis=1)
        return out.reshape(B, N, dim_c + vocab)[:B_in].astype(x.dtype)

    @jax.custom_vjp
    def epic_train_forward_wide(packed, t, x, k, mask):
        return fwd_impl(packed, t, x, k, mask)

    def vjp_fwd(packed, t, x, k, mask):
        return fwd_impl(packed, t, x, k, mask), (packed, t, x, k, mask)

    def vjp_bwd(res, g):
        packed, t, x, k, mask = res
        B_in, N = x.shape[0], x.shape[1]
        TB = _WIDE_TILE_BWD
        xR, kR, maskR, temb, B = _layout_rows(t, x, k, mask, dim_emb_time, TB)
        # cotangent → row-major, padded jets get zero cotangents (their
        # masked chains then contribute nothing to any weight grad)
        g = g.astype(jnp.float32)
        if B != B_in:
            g = jnp.pad(g, ((0, B - B_in), (0, 0), (0, 0)))
        gR = g.reshape(B * N, dim_c + vocab)
        gc = gR[:, :dim_c]
        gd = gR[:, dim_c:]

        base, wspecs, full, row_spec = _specs(N, TB, packed)
        kernel = functools.partial(_bwd_kernel, TB=TB, N=N, **static)
        grads = pl.pallas_call(
            kernel,
            grid=(B // TB,),
            in_specs=base
            + [row_spec(dim_c, TB * N), row_spec(vocab, TB * N)]
            + wspecs,
            out_specs=tuple(full(w) for w in packed),
            out_shape=tuple(
                jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in packed
            ),
            interpret=interpret,
            compiler_params=None if interpret else _VMEM_LIMIT,
        )(xR, kR, maskR, temb, gc, gd, *packed)
        # inputs get zero cotangents (params-only training)
        return (
            tuple(grads),
            jnp.zeros_like(res[1]),
            jnp.zeros_like(res[2]),
            jnp.zeros_like(res[3]),
            jnp.zeros_like(res[4]),
        )

    epic_train_forward_wide.defvjp(vjp_fwd, vjp_bwd)
    return epic_train_forward_wide
