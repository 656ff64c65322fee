"""Fused EPiC forward for WIDE hidden sizes (the `--scaled` ~1M-param
backbone) as a row-major Pallas TPU kernel.

The narrow kernel (ops/epic_pallas.py) keeps activations as
(features, B·N) — features on sublanes, particles on lanes. That layout is
optimal for the shipped config (hidden 8-64: zero lane padding), but it
scales VMEM as hidden × (128 jets · N particles) lanes: at hidden 128 the
~10 live buffers are ~80 MB and Mosaic's compile does not terminate
(>18 min measured on v5e — docs/ARCHITECTURE.md perf ledger). Wide
backbones therefore used to fall back to plain XLA (7.3% MFU train /
0.27 TFLOP/s sampling at `--scaled`, round-3 ledger).

This kernel is the wide-regime complement, in ROW-MAJOR layout:
activations live as (B·N, features) — jets·particles on the SUBLANE axis,
features on the LANE axis. With every feature width a lane multiple (the
gate below), there is again ZERO lane padding, and the tile size in JETS is
now a free knob independent of hidden: at TB=8 jets the largest live buffer
is (8·128, 512) f32 = 2 MB, so the whole forward fits VMEM at any
practical hidden width.

Layout consequences, vs the narrow kernel:
  * matmuls are natural (rows, in) @ (in, out) GEMMs — weights are packed
    UN-transposed (pack_wide_encoder_params);
  * per-jet pooling is a SUBLANE-axis reduction: (TB·N, d) → (TB, N, d)
    → sum over N (the narrow kernel needed an iota-built jet-membership
    matmul for the equivalent lane reduction);
  * the per-jet time embedding enters as a (TB, E_t) block (one row per
    jet) and is broadcast to particle rows in-kernel — 128× less HBM
    traffic than the narrow kernel's pre-broadcast (E_t, B·N) input;
  * the global branch runs on (TB, ·) tiles — 8 sublanes, negligible
    FLOPs share.

Math matches models/architectures/epic.py exactly (parity-tested against
the flax stack at hidden 128 in tests/test_ops/test_epic_pallas_wide.py);
reference architecture: epic.py:93-241, utils.py:112-198.
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
    _leaky,
    _mm,
    _selu,
    pack_encoder_params_fold_discrete,
    pack_mbm_encoder_params,
)


def _flip_packed(packed):
    """Transpose a lane-layout weight tuple to NATURAL (in, out) orientation
    for the row-major kernel; biases become (1, d) rows. (Both cases are the
    same swap of the last two axes.)"""
    return tuple(jnp.swapaxes(w, -2, -1) for w in packed)


def pack_wide_encoder_params(encoder_params, num_blocks: int, dim_c: int = 3):
    """flax param tree → flat tuple of effective weights in natural
    orientation. Reuses pack_mbm_encoder_params (which resolves weight norm
    and splits the output layer) and transposes each piece back."""
    return _flip_packed(pack_mbm_encoder_params(encoder_params, num_blocks, dim_c))


def pack_wide_encoder_params_fold_discrete(
    encoder_params, num_blocks: int, dim_c: int = 3
):
    """Natural-orientation packing for Linear-discrete embeddings (the
    transdimensional trunk): the discrete Dense is folded block-diagonally
    into the continuous embedding — see pack_encoder_params_fold_discrete."""
    return _flip_packed(
        pack_encoder_params_fold_discrete(encoder_params, num_blocks, dim_c)
    )


def _pool(x, mask, TB, N):
    """Masked per-jet sum over the particle (sublane) axis:
    (TB·N, d) → (TB, d)."""
    xm = x * mask
    return jnp.sum(xm.reshape(TB, N, x.shape[1]), axis=1)


def _bcast(g, TB, N):
    """Per-jet rows → per-particle rows: (TB, d) → (TB·N, d)."""
    return jnp.broadcast_to(g[:, None, :], (TB, N, g.shape[1])).reshape(
        TB * N, g.shape[1]
    )


def _forward_acts_wide(x, k_col, mask, temb, W, *, TB, N, vocab, num_blocks,
                       use_skip, fold_discrete=False):
    """The EPiC forward in (rows, features) layout.

    Args (all in-kernel values):
      x:    (TB·N, dim_in) continuous features (with fold_discrete the
            one-hot channel VALUES ride here and w_x is block-diagonal)
      k_col:(TB·N, 1) int tokens (ignored when fold_discrete)
      mask: (TB·N, 1)
      temb: (TB, E_t) per-JET time embedding
      W:    dict of natural-orientation weights
    Returns (cont, disc, acts) — acts mirrors the narrow kernel's
    activation dict (keys incl. disc_pre/h_final) and is what the
    hand-written wide backward (ops/epic_pallas_wide_vjp.py) consumes.
    """
    f32 = jnp.float32
    rows = TB * N

    denom = jnp.maximum(
        jnp.sum(mask.reshape(TB, N, 1), axis=1), 1.0
    )  # (TB, 1)
    ctx = temb  # (TB, E_t): the per-jet context IS the time embedding
    t_local = _bcast(temb, TB, N)  # (rows, E_t)
    acts = {"denom": denom, "ctx": ctx}

    # ---- input embeddings (reference: utils.py:112-172)
    x_emb = _mm(x, W["w_x"]) + W["b_x"]
    if fold_discrete:
        # Linear-discrete mode: x_emb IS [x_emb ‖ k_emb] (block-diagonal
        # w_x); the token-embedding block is skipped entirely
        feats = jnp.concatenate([t_local, x_emb], axis=1) * mask
    else:
        k_onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, vocab), 1) == k_col
        ).astype(f32)
        k_emb = _mm(k_onehot, W["table"])
        feats = jnp.concatenate([t_local, x_emb, k_emb], axis=1) * mask
        acts["k_onehot"] = k_onehot
    acts["feats"] = feats

    # ---- projection (reference: epic.py:164-191)
    z_l0 = _mm(feats, W["w_l0"]) + W["b_l0"]
    h_act = _leaky(z_l0)
    acts["z_l0"] = z_l0
    s0 = _pool(h_act, mask, TB, N)
    p0 = jnp.concatenate([s0 / denom, s0, ctx], axis=1)
    acts["p0"] = p0
    z_g0 = _mm(p0, W["w_g0"]) + W["b_g0"]
    a_g0 = _leaky(z_g0)
    z_g1 = _mm(a_g0, W["w_g1"]) + W["b_g1"]
    a_g1 = _leaky(z_g1)
    z_g2 = _mm(a_g1, W["w_g2"]) + W["b_g2"]
    g = _leaky(z_g2)
    acts.update(z_g0=z_g0, a_g0=a_g0, z_g1=z_g1, a_g1=a_g1, z_g2=z_g2)

    h = h_act * mask
    skip_local = h if use_skip else 0.0
    skip_global = g if use_skip else 0.0

    # ---- EPiC layers (reference: epic.py:193-241)
    layers = []
    for i in range(num_blocks):
        la = {"h_in": h, "g_in": g}
        s = _pool(h, mask, TB, N)
        p = jnp.concatenate([s / denom, s, g, ctx], axis=1)
        la["p"] = p
        z_fg1 = _mm(p, W["w_fg1"][i]) + W["b_fg1"][i]
        g1 = _leaky(z_fg1)
        z_fg2 = _mm(g1, W["w_fg2"][i]) + W["b_fg2"][i] + g
        g_new = _leaky(z_fg2)
        la.update(z_fg1=z_fg1, g1=g1, z_fg2=z_fg2, g_new=g_new)

        hcat = jnp.concatenate([h, _bcast(g_new, TB, N), t_local], axis=1)
        la["hcat"] = hcat
        z_fl1 = _mm(hcat, W["w_fl1"][i]) + W["b_fl1"][i]
        l1 = _leaky(z_fl1)
        z_fl2 = _mm(l1, W["w_fl2"][i]) + W["b_fl2"][i] + h
        h_new = _leaky(z_fl2)
        la.update(z_fl1=z_fl1, l1=l1, z_fl2=z_fl2)

        h = h_new * mask + skip_local
        g = g_new + skip_global
        layers.append(la)

    acts["layers"] = layers
    acts["h_final"] = h

    # ---- output + heads (reference: epic.py:145-162, mbm :102-113)
    cont = (_mm(h, W["w_out_c"]) + W["b_out_c"]) * mask
    disc_pre = (_mm(h, W["w_out_d"]) + W["b_out_d"]) * mask
    z_h0 = _mm(disc_pre, W["w_h0"]) + W["b_h0"]
    a_h0 = _selu(z_h0)
    disc = _mm(a_h0, W["w_h1"]) + W["b_h1"]
    acts.update(disc_pre=disc_pre, z_h0=z_h0, a_h0=a_h0)
    return cont, disc, acts


def _epic_wide_kernel(
    x_ref, k_ref, mask_ref, temb_ref, *rest,
    TB, N, vocab, num_blocks, use_skip, add_discrete_head, output_hidden,
    fold_discrete=False,
):
    n_outs = 3 if output_hidden else 2
    w_refs, out_refs = rest[:-n_outs], rest[-n_outs:]
    W = dict(zip(WEIGHT_NAMES, [r[:] for r in w_refs]))
    cont, disc, acts = _forward_acts_wide(
        x_ref[:], k_ref[:], mask_ref[:], temb_ref[:], W,
        TB=TB, N=N, vocab=vocab, num_blocks=num_blocks, use_skip=use_skip,
        fold_discrete=fold_discrete,
    )
    out_refs[0][:] = cont
    out_refs[1][:] = disc if add_discrete_head else acts["disc_pre"]
    if output_hidden:
        out_refs[2][:] = acts["h_final"]


# jets per grid step: the largest live buffer at hidden 128 is
# (TB·128, 512) f32 = TB·256 KB; TB=8 keeps the whole forward (weights +
# ~8 live activations) well under VMEM while the 1024-row GEMMs still tile
# the MXU fully.
_WIDE_TILE_JETS = 8


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_blocks", "use_skip", "add_discrete_head", "dim_c", "vocab",
        "hidden", "dim_emb_time", "output_hidden_local", "interpret",
        "fold_discrete",
    ),
)
def epic_forward_pallas_wide(
    packed,
    t,
    x,
    k,
    mask,
    *,
    num_blocks,
    use_skip,
    add_discrete_head,
    dim_c,
    vocab,
    hidden,
    dim_emb_time,
    output_hidden_local=False,
    interpret=False,
    fold_discrete=False,
):
    """Fused EPiC forward, wide-hidden row-major variant.

    Same contract as ops/epic_pallas.epic_forward_pallas but `packed` comes
    from pack_wide_encoder_params. N not a sublane-tile multiple is padded
    per jet (exact: trunk reductions are masked); B is padded to the jet
    tile.
    """
    B_in, N_in = x.shape[0], x.shape[1]
    dim_in = x.shape[2]
    # particle rows only need SUBLANE alignment (8) in this layout, but a
    # multiple of 8 keeps every (TB, N, d) reshape tile-exact
    N = ((N_in + 7) // 8) * 8
    if N != N_in:
        pad = ((0, 0), (0, N - N_in), (0, 0))
        x = jnp.pad(x, pad)
        k = jnp.pad(k, pad)
        mask = jnp.pad(mask, pad)
    TB = _WIDE_TILE_JETS
    B = -(-B_in // TB) * TB
    if B != B_in:
        pad = ((0, B - B_in), (0, 0), (0, 0))
        x = jnp.pad(x, pad)
        k = jnp.pad(k, pad)
        mask = jnp.pad(mask, pad)
        t = jnp.pad(t, pad)
    TBN = TB * N

    temb = sinusoidal_positional_encoding(
        t.reshape(B).astype(jnp.float32), dim_emb_time
    )  # (B, E_t) — broadcast to particle rows happens IN-kernel

    xR = x.astype(jnp.float32).reshape(B * N, dim_in)
    kR = k.reshape(B * N, 1).astype(jnp.int32)
    maskR = mask.astype(jnp.float32).reshape(B * N, 1)

    kernel = functools.partial(
        _epic_wide_kernel,
        TB=TB,
        N=N,
        vocab=vocab,
        num_blocks=num_blocks,
        use_skip=use_skip,
        add_discrete_head=add_discrete_head,
        output_hidden=output_hidden_local,
        fold_discrete=fold_discrete,
    )

    def row_spec(d, block_rows):
        return pl.BlockSpec(
            (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    full = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )

    in_specs = [
        row_spec(dim_in, TBN),  # xR
        row_spec(1, TBN),  # kR
        row_spec(1, TBN),  # maskR
        row_spec(dim_emb_time, TB),  # temb: one row per jet
    ] + [full(w) for w in packed]

    out_specs = [row_spec(dim_c, TBN), row_spec(vocab, TBN)]
    out_shape = [
        jax.ShapeDtypeStruct((B * N, dim_c), jnp.float32),
        jax.ShapeDtypeStruct((B * N, vocab), jnp.float32),
    ]
    if output_hidden_local:
        out_specs.append(row_spec(hidden, TBN))
        out_shape.append(jax.ShapeDtypeStruct((B * N, hidden), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(xR, kR, maskR, temb, *packed)

    out = jnp.concatenate([outs[0], outs[1]], axis=1)  # (B·N, dim_c+vocab)
    out = out.reshape(B, N, dim_c + vocab)[:B_in, :N_in].astype(x.dtype)
    if output_hidden_local:
        hid = outs[2].reshape(B, N, hidden)[:B_in, :N_in]
        return out, hid
    return out


def wide_pallas_supported(config, allow_linear_discrete: bool = False) -> bool:
    """True when the wide row-major kernel covers the encoder: the narrow
    kernel's pattern gate plus every feature width a LANE multiple (so all
    in-kernel concatenations are lane-aligned — the regime where the narrow
    kernel's (features, lanes) layout OOMs VMEM).

    allow_linear_discrete additionally accepts the Linear (one-hot valued)
    discrete embedding — callers must then feed [x ‖ one-hot] with
    fold_discrete=True and pack via pack_wide_encoder_params_fold_discrete
    (the transdimensional trunk does). In that mode the folded embedding
    width is the SUM of the two embedding widths, so the sum must be a lane
    multiple (each being one suffices)."""
    from multimodal_particles_tpu.ops.epic_pallas import epic_pattern_supported

    # tensor-parallel runs shard the block kernels over 'model'
    # (parallel/tp.py) — same exclusion as mbm_pallas_supported
    if getattr(getattr(config, "parallel", None), "model_axis", 1) > 1:
        return False

    e = config.encoder
    if not (
        epic_pattern_supported(config, allow_linear_discrete)
        and e.dim_hidden_local % 128 == 0
        and e.dim_hidden_glob % 128 == 0
        and e.dim_emb_time % 128 == 0
    ):
        return False
    if allow_linear_discrete and e.embedding_features_discrete == "Linear":
        return (
            e.dim_emb_features_continuous + e.dim_emb_features_discrete
        ) % 128 == 0
    return (
        e.dim_emb_features_continuous % 128 == 0
        and e.dim_emb_features_discrete % 128 == 0
    )
