"""Custom-VJP Pallas EPiC: fused forward AND backward kernels for training.

`ops/epic_pallas.py` fuses the forward for the sampling loop; training also
needs gradients. This module provides `epic_train_forward`, a
`jax.custom_vjp` whose

  * forward is the fused Pallas kernel (re-implemented here with the
    backward's layout conventions), and whose
  * backward is a SECOND Pallas kernel that RECOMPUTES the forward
    activations tile-by-tile in VMEM (zero residual traffic to HBM — the
    recompute is MXU-cheap) and accumulates the ~27 weight cotangents
    across the grid (constant-index output blocks, the standard Mosaic
    accumulation pattern).

The custom_vjp boundary sits at the PACKED effective weights: weight-norm
reparameterization (g·v/‖v‖) and the flax→packed mapping happen in plain
jnp outside the kernel, so jax chains d(packed) → d(v,g) automatically.
Inputs (t, x, k, mask) receive zero cotangents — the training loss never
differentiates through bridge samples.

Gradient math is verified against jax.grad of the flax stack in
tests/test_ops/test_epic_pallas_vjp.py. Reference architecture:
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
from multimodal_particles_tpu.ops.epic_pallas import (
    WEIGHT_NAMES,
    _VMEM_LIMIT,
    _bcast_jets,
    _forward_acts,
    _leaky,
    _mm,
    _pool_sum,
    _selu,
    _weights_dict,
    pack_mbm_encoder_params,
)


def _dg(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())), preferred_element_type=jnp.float32)


def _mm_at(w, dz):
    """W^T @ dz without materializing the transpose: contract dim 0 × dim 0."""
    return _dg(w, dz, ((0,), (0,)))


def _outer(dz, a):
    """dW = dz · a^T: contract the lane (rows) axis of both."""
    return _dg(dz, a, ((1,), (1,)))


def _rowsum(dz):
    return jnp.sum(dz, axis=1, keepdims=True)


def _dleaky(z):
    return jnp.where(z >= 0, 1.0, 0.01)


def _dselu(z):
    alpha = 1.6732632423543772
    scale = 1.0507009873554805
    return scale * jnp.where(z >= 0, 1.0, alpha * jnp.exp(z))


def _fwd_kernel(x_ref, k_ref, mask_ref, temb_ref, *rest, TB, N, vocab,
                num_blocks, use_skip, add_discrete_head):
    w_refs, (out_c_ref, out_d_ref) = rest[:-2], rest[-2:]
    W = _weights_dict([r[:] for r in w_refs])
    cont, disc, acts = _forward_acts(
        x_ref[:], k_ref[:].reshape(1, -1) if k_ref[:].ndim == 1 else k_ref[:],
        mask_ref[:], temb_ref[:], W,
        TB=TB, N=N, vocab=vocab, num_blocks=num_blocks, use_skip=use_skip,
    )
    out_c_ref[:] = cont
    out_d_ref[:] = disc if add_discrete_head else acts["disc_pre"]


def _bwd_kernel(x_ref, k_ref, mask_ref, temb_ref, gc_ref, gd_ref, *rest,
                TB, N, vocab, num_blocks, use_skip, add_discrete_head):
    n_w = len(WEIGHT_NAMES)
    w_refs = rest[:n_w]
    grad_refs = rest[n_w:]
    W = _weights_dict([r[:] for r in w_refs])

    mask = mask_ref[:]
    cont, disc, A = _forward_acts(
        x_ref[:], k_ref[:], mask, temb_ref[:], W,
        TB=TB, N=N, vocab=vocab, num_blocks=num_blocks, use_skip=use_skip,
    )
    denom = A["denom"]

    gc = gc_ref[:]  # (dim_c, rows)
    gd = gd_ref[:]  # (V, rows)

    G = {}

    # ---- heads
    if add_discrete_head:
        G["w_h1"] = _outer(gd, A["a_h0"])
        G["b_h1"] = _rowsum(gd)
        dz_h0 = _mm_at(W["w_h1"], gd) * _dselu(A["z_h0"])
        G["w_h0"] = _outer(dz_h0, A["disc_pre"])
        G["b_h0"] = _rowsum(dz_h0)
        d_disc_pre = _mm_at(W["w_h0"], dz_h0)
    else:
        G["w_h1"] = jnp.zeros_like(W["w_h1"])
        G["b_h1"] = jnp.zeros_like(W["b_h1"])
        G["w_h0"] = jnp.zeros_like(W["w_h0"])
        G["b_h0"] = jnp.zeros_like(W["b_h0"])
        d_disc_pre = gd

    dzc = gc * mask
    dzd = d_disc_pre * mask
    G["w_out_c"] = _outer(dzc, A["h_final"])
    G["b_out_c"] = _rowsum(dzc)
    G["w_out_d"] = _outer(dzd, A["h_final"])
    G["b_out_d"] = _rowsum(dzd)
    dh = _mm_at(W["w_out_c"], dzc) + _mm_at(W["w_out_d"], dzd)
    dg = jnp.zeros((W["w_g2"].shape[0], TB), jnp.float32)
    d_skip_local = jnp.zeros_like(dh)
    d_skip_global = jnp.zeros_like(dg)

    E = A["ctx"].shape[0]
    hidden = W["w_l0"].shape[0]
    gdim = W["w_g2"].shape[0]

    # per-layer grads collected in python lists (each layer contributes
    # exactly once) and stacked at the end — .at[i].add on values lowers to
    # scatter-add, which Mosaic has no TPU lowering for
    layer_grads = {
        name: [None] * num_blocks
        for name in ("w_fg1", "b_fg1", "w_fg2", "b_fg2", "w_fl1", "b_fl1", "w_fl2", "b_fl2")
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

        # h_new = leaky(z_fl2), z_fl2 = Wfl2 l1 + b + h_in
        dz_fl2 = dh_new * _dleaky(la["z_fl2"])
        layer_grads["w_fl2"][i] = _outer(dz_fl2, la["l1"])
        layer_grads["b_fl2"][i] = _rowsum(dz_fl2)
        dh_in = dz_fl2  # residual into h_in
        dl1 = _mm_at(W["w_fl2"][i], dz_fl2)

        dz_fl1 = dl1 * _dleaky(la["z_fl1"])
        layer_grads["w_fl1"][i] = _outer(dz_fl1, la["hcat"])
        layer_grads["b_fl1"][i] = _rowsum(dz_fl1)
        dhcat = _mm_at(W["w_fl1"][i], dz_fl1)  # (hidden+gdim+E, rows)
        dh_in = dh_in + dhcat[0:hidden, :]
        dg_new = dg_new + _pool_sum(dhcat[hidden : hidden + gdim, :], TB, N)
        # ctx cotangent dropped (no trainable params upstream)

        # g_new = leaky(z_fg2), z_fg2 = Wfg2 g1 + b + g_in
        dz_fg2 = dg_new * _dleaky(la["z_fg2"])
        layer_grads["w_fg2"][i] = _outer(dz_fg2, la["g1"])
        layer_grads["b_fg2"][i] = _rowsum(dz_fg2)
        dg_in = dz_fg2
        dg1 = _mm_at(W["w_fg2"][i], dz_fg2)

        dz_fg1 = dg1 * _dleaky(la["z_fg1"])
        layer_grads["w_fg1"][i] = _outer(dz_fg1, la["p"])
        layer_grads["b_fg1"][i] = _rowsum(dz_fg1)
        dp = _mm_at(W["w_fg1"][i], dz_fg1)  # (2*hidden+gdim+E, TB)
        dmean = dp[0:hidden, :]
        dsum = dp[hidden : 2 * hidden, :] + dmean / denom
        dg_in = dg_in + dp[2 * hidden : 2 * hidden + gdim, :]
        # s = pool(h_in*mask)  →  dh_in += bcast(dsum) * mask
        dh_in = dh_in + _bcast_jets(dsum, TB, N) * mask

        dh, dg = dh_in, dg_in

    # ---- skips fold into the projection outputs
    if use_skip:
        dh = dh + d_skip_local
        dg = dg + d_skip_global

    # ---- projection backward: h = leaky(z_l0)*mask; g chain over p0
    dz_g2 = dg * _dleaky(A["z_g2"])
    G["w_g2"] = _outer(dz_g2, A["a_g1"])
    G["b_g2"] = _rowsum(dz_g2)
    da_g1 = _mm_at(W["w_g2"], dz_g2)
    dz_g1 = da_g1 * _dleaky(A["z_g1"])
    G["w_g1"] = _outer(dz_g1, A["a_g0"])
    G["b_g1"] = _rowsum(dz_g1)
    da_g0 = _mm_at(W["w_g1"], dz_g1)
    dz_g0 = da_g0 * _dleaky(A["z_g0"])
    G["w_g0"] = _outer(dz_g0, A["p0"])
    G["b_g0"] = _rowsum(dz_g0)
    dp0 = _mm_at(W["w_g0"], dz_g0)  # (2*hidden+E, TB)
    dmean0 = dp0[0:hidden, :]
    dsum0 = dp0[hidden : 2 * hidden, :] + dmean0 / denom

    # h = h_act*mask; s0 = pool(h_act*mask)
    dh_act = dh * mask + _bcast_jets(dsum0, TB, N) * mask
    dz_l0 = dh_act * _dleaky(A["z_l0"])
    G["w_l0"] = _outer(dz_l0, A["feats"])
    G["b_l0"] = _rowsum(dz_l0)
    dfeats = _mm_at(W["w_l0"], dz_l0) * mask  # (E+E+E, rows) t|x|k blocks

    dx_emb = dfeats[E : E + W["w_x"].shape[0], :]
    dk_emb = dfeats[E + W["w_x"].shape[0] :, :]
    G["w_x"] = _outer(dx_emb, x_ref[:])
    G["b_x"] = _rowsum(dx_emb)
    G["table"] = _outer(dk_emb, A["k_onehot"])

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


def _pick_tile(B):
    # the recompute-backward keeps every layer activation live in VMEM:
    # TB=128 needs ~24.5MB (>16MB scoped limit); 64 fits
    for tb in (64, 32, 16, 8, 4, 2, 1):
        if B % tb == 0:
            return tb
    return 1


def _layout(t, x, k, mask, dim_emb_time):
    B, N, dim_c = x.shape
    temb = sinusoidal_positional_encoding(
        t.reshape(B).astype(jnp.float32), dim_emb_time
    )
    xT = x.astype(jnp.float32).reshape(B * N, dim_c).T
    kT = k.reshape(1, B * N).astype(jnp.int32)
    maskT = mask.astype(jnp.float32).reshape(1, B * N)
    tembT = (
        jnp.broadcast_to(temb[:, None, :], (B, N, dim_emb_time))
        .reshape(B * N, dim_emb_time)
        .T
    )
    return xT, kT, maskT, tembT


def make_epic_train_forward(*, num_blocks, use_skip, add_discrete_head, dim_c,
                            vocab, hidden, dim_emb_time, interpret=False):
    """Build the custom-VJP fused forward for a static architecture config.

    Returns fn(packed, t, x, k, mask) → (B, N, dim_c+vocab) that is
    differentiable w.r.t. `packed`.
    """

    static = dict(
        vocab=vocab, num_blocks=num_blocks, use_skip=use_skip,
        add_discrete_head=add_discrete_head,
    )

    def _specs(B, N, TB, packed):
        TBN = TB * N

        def lane_spec(d, block):
            return pl.BlockSpec((d, block), lambda i: (0, i), memory_space=pltpu.VMEM)

        full = lambda a: pl.BlockSpec(
            a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
        )
        base = [
            lane_spec(dim_c, TBN),
            lane_spec(1, TBN),
            lane_spec(1, TBN),
            lane_spec(dim_emb_time, TBN),
        ]
        return base, [full(w) for w in packed], full

    def fwd_impl(packed, t, x, k, mask):
        B, N = x.shape[0], x.shape[1]
        # the forward kernel has no recompute storage — larger tiles fit
        from multimodal_particles_tpu.ops.epic_pallas import (
            _pick_tile as _pick_tile_fwd,
        )

        TB = _pick_tile_fwd(B)
        xT, kT, maskT, tembT = _layout(t, x, k, mask, dim_emb_time)
        base, wspecs, _ = _specs(B, N, TB, packed)
        kernel = functools.partial(_fwd_kernel, TB=TB, N=N, **static)

        def lane_out(d):
            return pl.BlockSpec((d, TB * N), lambda i: (0, i), memory_space=pltpu.VMEM)

        out_c, out_d = pl.pallas_call(
            kernel,
            grid=(B // TB,),
            in_specs=base + wspecs,
            out_specs=(lane_out(dim_c), lane_out(vocab)),
            out_shape=(
                jax.ShapeDtypeStruct((dim_c, B * N), jnp.float32),
                jax.ShapeDtypeStruct((vocab, B * N), jnp.float32),
            ),
            interpret=interpret,
            compiler_params=None if interpret else _VMEM_LIMIT,
        )(xT, kT, maskT, tembT, *packed)
        out = jnp.concatenate([out_c, out_d], axis=0)
        return out.T.reshape(B, N, dim_c + vocab).astype(x.dtype)

    @jax.custom_vjp
    def epic_train_forward(packed, t, x, k, mask):
        return fwd_impl(packed, t, x, k, mask)

    def vjp_fwd(packed, t, x, k, mask):
        return fwd_impl(packed, t, x, k, mask), (packed, t, x, k, mask)

    def vjp_bwd(res, g):
        packed, t, x, k, mask = res
        B, N = x.shape[0], x.shape[1]
        TB = _pick_tile(B)
        xT, kT, maskT, tembT = _layout(t, x, k, mask, dim_emb_time)
        # cotangent → (features, lanes) layout
        gT = g.astype(jnp.float32).reshape(B * N, dim_c + vocab).T
        gc = gT[:dim_c]
        gd = gT[dim_c:]

        base, wspecs, full = _specs(B, N, TB, packed)

        def lane_in(d):
            return pl.BlockSpec((d, TB * N), lambda i: (0, i), memory_space=pltpu.VMEM)

        kernel = functools.partial(_bwd_kernel, TB=TB, N=N, **static)
        grads = pl.pallas_call(
            kernel,
            grid=(B // TB,),
            in_specs=base + [lane_in(dim_c), lane_in(vocab)] + wspecs,
            out_specs=tuple(full(w) for w in packed),
            out_shape=tuple(
                jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in packed
            ),
            interpret=interpret,
            compiler_params=None if interpret else _VMEM_LIMIT,
        )(xT, kT, maskT, tembT, gc, gd, *packed)
        # inputs get zero cotangents (params-only training)
        return (
            tuple(grads),
            jnp.zeros_like(t),
            jnp.zeros_like(x),
            jnp.zeros_like(k),
            jnp.zeros_like(mask),
        )

    epic_train_forward.defvjp(vjp_fwd, vjp_bwd)
    return epic_train_forward
