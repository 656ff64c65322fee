"""Fused EPiC forward as a single Pallas TPU kernel.

The MBM sampling hot loop runs the EPiC encoder once per SDE step
(SURVEY.md §3.2). As separate XLA ops the forward is ~20 small matmuls and
elementwise kernels over (B·N, 16..64) activations — each op round-trips
32-192 MB through HBM, which dominates the step at config-berlin scale.

This kernel keeps one batch tile resident in VMEM and runs the ENTIRE
encoder in one pass: input embeddings → EPiC projection → num_blocks ×
EPiC layer → weight-normed output → per-modality heads (incl. the SELU
discrete refinement head).

TPU layout: activations live as (features, B·N) — features on the SUBLANE
axis (8-16-48 wide), batch·particles on the LANE axis (multiples of 128).
This gives ZERO lane padding (a (B, N, 16) layout would pad 16 → 128 lanes,
an 8× VMEM/VPU waste). The per-jet masked mean+sum pooling and the
global→particle broadcast are MXU matmuls against a jet-membership 0/1
matrix built from iota — no reshapes or gathers anywhere in the kernel.

Weight-norm reparameterization (g·v/‖v‖) is resolved OUTSIDE the kernel in
plain jnp (tiny, fuses into the surrounding graph). Math matches
models/architectures/epic.py exactly (parity-tested against the flax stack
in tests/test_ops/test_epic_pallas.py); reference architecture:
epic.py:93-241, utils.py:112-198.
"""

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_particles_tpu.models.architectures.utils import (
    sinusoidal_positional_encoding,
)


def _wn_kernel(p):
    """Resolve weight normalization: W = g · v / ||v||_col."""
    v, g = p["v"], p["g"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
    return (g[None, :] / jnp.maximum(norm, 1e-12)) * v


def pack_mbm_encoder_params(encoder_params: Dict[str, Any], num_blocks: int, dim_c: int = 3):
    """flax param tree → flat tuple of effective weights for the kernel.

    All matrices are stored TRANSPOSED ((out, in)) for the (features, lanes)
    layout; the output layer is pre-split into continuous/discrete parts so
    the kernel never slices the sublane axis.
    """
    emb = encoder_params["epic"]["embedding"]
    net = encoder_params["epic"]["epic"]

    w_x = emb["embedding_continuous"]["kernel"].T  # (E, dim_c)
    b_x = emb["embedding_continuous"]["bias"][:, None]
    if "embedding" in emb["embedding_discrete"]:
        table_k = emb["embedding_discrete"]["embedding"].T  # (E, vocab)
    else:  # Linear-discrete params: folded by pack_encoder_params_fold_discrete
        table_k = jnp.zeros((8, 128))

    proj = net["epic_proj"]
    w_l0, b_l0 = _wn_kernel(proj["local_0"]).T, proj["local_0"]["bias"][:, None]
    w_g0, b_g0 = _wn_kernel(proj["global_0"]).T, proj["global_0"]["bias"][:, None]
    w_g1, b_g1 = _wn_kernel(proj["global_1"]).T, proj["global_1"]["bias"][:, None]
    w_g2, b_g2 = _wn_kernel(proj["global_2"]).T, proj["global_2"]["bias"][:, None]

    def stack_w(field):
        return jnp.stack(
            [_wn_kernel(net[f"epic_layer_{i}"][field]).T for i in range(num_blocks)]
        )

    def stack_b(field):
        return jnp.stack(
            [net[f"epic_layer_{i}"][field]["bias"][:, None] for i in range(num_blocks)]
        )

    w_fg1, b_fg1 = stack_w("fc_global1"), stack_b("fc_global1")
    w_fg2, b_fg2 = stack_w("fc_global2"), stack_b("fc_global2")
    w_fl1, b_fl1 = stack_w("fc_local1"), stack_b("fc_local1")
    w_fl2, b_fl2 = stack_w("fc_local2"), stack_b("fc_local2")

    w_out = _wn_kernel(net["output_layer"])  # (hidden, out_dim)
    b_out = net["output_layer"]["bias"]
    w_out_c, b_out_c = w_out[:, :dim_c].T, b_out[:dim_c][:, None]
    w_out_d, b_out_d = w_out[:, dim_c:].T, b_out[dim_c:][:, None]

    fc = encoder_params.get("fc_layer")
    if fc is not None:
        w_h0, b_h0 = fc["layers_0"]["kernel"].T, fc["layers_0"]["bias"][:, None]
        w_h1, b_h1 = fc["layers_2"]["kernel"].T, fc["layers_2"]["bias"][:, None]
    else:
        dd = w_out_d.shape[0]
        w_h0, b_h0 = jnp.eye(dd), jnp.zeros((dd, 1))
        w_h1, b_h1 = jnp.eye(dd), jnp.zeros((dd, 1))

    return (
        w_x, b_x, table_k,
        w_l0, b_l0, w_g0, b_g0, w_g1, b_g1, w_g2, b_g2,
        w_fg1, b_fg1, w_fg2, b_fg2, w_fl1, b_fl1, w_fl2, b_fl2,
        w_out_c, b_out_c, w_out_d, b_out_d, w_h0, b_h0, w_h1, b_h1,
    )


def pack_encoder_params_fold_discrete(
    encoder_params: Dict[str, Any], num_blocks: int, dim_c: int = 3
):
    """Packing variant for Linear-discrete embeddings (the transdimensional
    trunk): the discrete Dense is folded block-diagonally into the
    continuous embedding, so the kernel input is [x ‖ one-hot values] of
    width dim_c + vocab and the token-embedding block is skipped
    (fold_discrete=True). `dim_c` still names the OUTPUT continuous width
    (the output-layer split is unchanged)."""
    emb = encoder_params["epic"]["embedding"]

    w_x = emb["embedding_continuous"]["kernel"].T  # (E1, Dc)
    b_x = emb["embedding_continuous"]["bias"][:, None]
    w_k = emb["embedding_discrete"]["kernel"].T  # (E2, V)
    b_k = emb["embedding_discrete"]["bias"][:, None]

    E1, Dc = w_x.shape
    E2, V = w_k.shape
    w_fold = jnp.zeros((E1 + E2, Dc + V), w_x.dtype)
    w_fold = w_fold.at[:E1, :Dc].set(w_x).at[E1:, Dc:].set(w_k)
    b_fold = jnp.concatenate([b_x, b_k], axis=0)

    base = pack_mbm_encoder_params(encoder_params, num_blocks, dim_c)
    # slots 0-2 are (w_x, b_x, table); table becomes an unused placeholder
    return (w_fold, b_fold, jnp.zeros((8, 128), w_x.dtype)) + base[3:]


def _leaky(x):
    return jnp.where(x >= 0, x, 0.01 * x)


def _selu(x):
    alpha = 1.6732632423543772
    scale = 1.0507009873554805
    return scale * jnp.where(x >= 0, x, alpha * (jnp.exp(x) - 1.0))


def _mm(a, b):
    """(m, k) @ (k, n) on the MXU with f32 accumulation.

    Default TPU matmul precision rounds f32 inputs to bf16 on the MXU —
    the same behavior the XLA (flax) path has for its Dense layers, so the
    kernel matches the baseline's effective precision. (HIGHEST would be
    bit-accurate vs CPU but needs 6-pass matmuls whose scratch overflows
    VMEM at production tile sizes.)"""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )



WEIGHT_NAMES = (
    "w_x", "b_x", "table",
    "w_l0", "b_l0", "w_g0", "b_g0", "w_g1", "b_g1", "w_g2", "b_g2",
    "w_fg1", "b_fg1", "w_fg2", "b_fg2", "w_fl1", "b_fl1", "w_fl2", "b_fl2",
    "w_out_c", "b_out_c", "w_out_d", "b_out_d", "w_h0", "b_h0", "w_h1", "b_h1",
)


def _weights_dict(ws):
    return dict(zip(WEIGHT_NAMES, ws))


def _pool_sum(x, TB, N):
    """Per-jet lane reduction: (d, TB·N) → (d, TB) via the Mosaic-supported
    (d, b·128) → (d, b, 128) lane split."""
    return jnp.sum(x.reshape(x.shape[0], TB, N), axis=2)


def _bcast_jets(g, TB, N):
    """Per-jet values → per-particle lanes: (d, TB) → (d, TB·N)."""
    return jnp.broadcast_to(g[:, :, None], (g.shape[0], TB, N)).reshape(
        g.shape[0], TB * N
    )


def _forward_acts(x, k_col, mask, t_local, W, *, TB, N, vocab, num_blocks,
                  use_skip, fold_discrete=False):
    """The EPiC forward in (features, lanes) layout, shared by the sampling
    kernel, the training (custom-VJP) kernels and their jnp parity oracle.
    Returns (cont, disc, activations-dict) — the activation set is what the
    hand-written backward (ops/epic_pallas_vjp.py) consumes."""
    f32 = jnp.float32
    rows = TB * N

    denom = jnp.maximum(_pool_sum(mask, TB, N), 1.0)  # (1, TB)
    # per-jet context = time embedding (identical across a jet's lanes)
    ctx = _pool_sum(t_local, TB, N) / f32(N)  # (E, TB)

    acts = {"denom": denom, "ctx": ctx}

    # ---- input embeddings (reference: utils.py:112-172)
    x_emb = _mm(W["w_x"], x) + W["b_x"]
    if fold_discrete:
        # Linear-discrete mode: the one-hot channel VALUES ride in x and the
        # block-diagonal w_x already contains the discrete Dense — x_emb IS
        # [x_emb ‖ k_emb]; the token-embedding block is skipped entirely.
        feats = jnp.concatenate([t_local, x_emb], axis=0) * mask
        acts["feats"] = feats
    else:
        k_onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (vocab, rows), 0) == k_col
        ).astype(f32)
        k_emb = _mm(W["table"], k_onehot)
        feats = jnp.concatenate([t_local, x_emb, k_emb], axis=0) * mask
        acts["k_onehot"] = k_onehot
        acts["feats"] = feats

    # ---- projection (reference: epic.py:164-191)
    z_l0 = _mm(W["w_l0"], feats) + W["b_l0"]
    h_act = _leaky(z_l0)
    acts["z_l0"] = z_l0

    s0 = _pool_sum(h_act * mask, TB, N)
    p0 = jnp.concatenate([s0 / denom, s0, ctx], axis=0)
    acts["p0"] = p0
    z_g0 = _mm(W["w_g0"], p0) + W["b_g0"]
    a_g0 = _leaky(z_g0)
    z_g1 = _mm(W["w_g1"], a_g0) + W["b_g1"]
    a_g1 = _leaky(z_g1)
    z_g2 = _mm(W["w_g2"], a_g1) + W["b_g2"]
    g = _leaky(z_g2)
    acts.update(z_g0=z_g0, a_g0=a_g0, z_g1=z_g1, a_g1=a_g1, z_g2=z_g2)

    h = h_act * mask
    skip_local = h if use_skip else 0.0
    skip_global = g if use_skip else 0.0

    # ---- EPiC layers (reference: epic.py:193-241)
    layers = []
    for i in range(num_blocks):
        la = {"h_in": h, "g_in": g}
        s = _pool_sum(h * mask, TB, N)
        p = jnp.concatenate([s / denom, s, g, ctx], axis=0)
        la["p"] = p
        z_fg1 = _mm(W["w_fg1"][i], p) + W["b_fg1"][i]
        g1 = _leaky(z_fg1)
        z_fg2 = _mm(W["w_fg2"][i], g1) + W["b_fg2"][i] + g
        g_new = _leaky(z_fg2)
        la.update(z_fg1=z_fg1, g1=g1, z_fg2=z_fg2, g_new=g_new)

        hcat = jnp.concatenate(
            [h, _bcast_jets(g_new, TB, N), _bcast_jets(ctx, TB, N)], axis=0
        )
        la["hcat"] = hcat
        z_fl1 = _mm(W["w_fl1"][i], hcat) + W["b_fl1"][i]
        l1 = _leaky(z_fl1)
        z_fl2 = _mm(W["w_fl2"][i], l1) + W["b_fl2"][i] + h
        h_new = _leaky(z_fl2)
        la.update(z_fl1=z_fl1, l1=l1, z_fl2=z_fl2)

        h = h_new * mask + skip_local
        g = g_new + skip_global
        layers.append(la)

    acts["layers"] = layers
    acts["h_final"] = h

    # ---- output + heads (reference: epic.py:145-162, mbm :102-113)
    cont = (_mm(W["w_out_c"], h) + W["b_out_c"]) * mask
    disc_pre = (_mm(W["w_out_d"], h) + W["b_out_d"]) * mask
    z_h0 = _mm(W["w_h0"], disc_pre) + W["b_h0"]
    a_h0 = _selu(z_h0)
    disc = _mm(W["w_h1"], a_h0) + W["b_h1"]
    acts.update(disc_pre=disc_pre, z_h0=z_h0, a_h0=a_h0)
    return cont, disc, acts


def _epic_kernel(
    x_ref, k_ref, mask_ref, temb_ref, *rest,
    TB, N, vocab, num_blocks, use_skip, add_discrete_head, output_hidden,
    fold_discrete=False,
):
    """Sampling-path kernel: shared forward math + output writes."""
    n_outs = 3 if output_hidden else 2
    w_refs, out_refs = rest[:-n_outs], rest[-n_outs:]
    W = _weights_dict([r[:] for r in w_refs])
    cont, disc, acts = _forward_acts(
        x_ref[:], k_ref[:], mask_ref[:], temb_ref[:], W,
        TB=TB, N=N, vocab=vocab, num_blocks=num_blocks, use_skip=use_skip,
        fold_discrete=fold_discrete,
    )
    out_refs[0][:] = cont
    out_refs[1][:] = disc if add_discrete_head else acts["disc_pre"]
    if output_hidden:
        out_refs[2][:] = acts["h_final"]


def _pick_tile(B):
    for tb in (128, 64, 32, 16, 8, 4, 2, 1):
        if B % tb == 0:
            return tb
    return 1


# Compiled (Mosaic) tile: ALWAYS the full 128-jet tile, padding B up to a
# multiple (exact — jets are independent; padded jets carry mask 0 and the
# pooled denominator is clamped at 1). Sub-128 tiles hit a pathological
# Mosaic compile (>470 s vs 75 s at TB=128 for the identical kernel body,
# measured on v5e at B=64/N=128); interpret (CPU-test) mode keeps the
# divisor-based tile so tiny parity tests don't pay 64x padding.
_COMPILED_TILE = 128

# At hidden 64 / 4 blocks the tile's live set is ~16.04 MB — 36 KB over
# Mosaic's conservative 16 MB default scoped-VMEM limit (measured on-chip:
# the 20k-jet scaled-quality config OOMs at compile time; config-berlin at
# hidden<=50 fits). The chip has 128 MB VMEM; raise the limit rather than
# shrinking the tile (sub-128 tiles hit the pathological compile above).
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_blocks", "use_skip", "add_discrete_head", "dim_c", "vocab",
        "hidden", "dim_emb_time", "output_hidden_local", "interpret",
        "fold_discrete",
    ),
)
def epic_forward_pallas(
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
    """Fused EPiC forward.

    Args:
      packed: tuple from pack_mbm_encoder_params.
      t:    (B, 1, 1) time
      x:    (B, N, dim_c) continuous — with fold_discrete=True this is
            [x ‖ one-hot channel values] of width dim_c + vocab (packed via
            pack_encoder_params_fold_discrete); `dim_c` always names the
            OUTPUT continuous width.
      k:    (B, N, 1) tokens (ignored when fold_discrete)
      mask: (B, N, 1)
    Returns:
      (B, N, dim_c + vocab) head outputs (continuous ‖ refined discrete);
      with output_hidden_local also the (B, N, hidden) trunk local state.

    N that is not a lane multiple is zero-padded per jet up to the next
    multiple of 128 — exact for the trunk because every cross-particle
    reduction is masked (the padded slots carry mask 0) — and the outputs
    are sliced back to N.
    """
    B_in, N_in = x.shape[0], x.shape[1]
    dim_in = x.shape[2]
    N = ((N_in + 127) // 128) * 128
    if N != N_in:
        pad = ((0, 0), (0, N - N_in), (0, 0))
        x = jnp.pad(x, pad)
        k = jnp.pad(k, pad)
        mask = jnp.pad(mask, pad)
    TB = _pick_tile(B_in) if interpret else _COMPILED_TILE
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
    )

    # host-side layout change: (B, N, C) → (C, B·N); lanes are particles
    xT = x.astype(jnp.float32).reshape(B * N, dim_in).T
    kT = k.reshape(1, B * N).astype(jnp.int32)
    maskT = mask.astype(jnp.float32).reshape(1, B * N)
    # broadcast the per-jet time embedding to per-particle lanes (E, B·N)
    tembT = jnp.broadcast_to(temb[:, None, :], (B, N, dim_emb_time)).reshape(
        B * N, dim_emb_time
    ).T

    kernel = functools.partial(
        _epic_kernel,
        TB=TB,
        N=N,
        vocab=vocab,
        num_blocks=num_blocks,
        use_skip=use_skip,
        add_discrete_head=add_discrete_head,
        output_hidden=output_hidden_local,
        fold_discrete=fold_discrete,
    )

    def lane_spec(d, block_lanes):
        return pl.BlockSpec(
            (d, block_lanes), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    full = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )

    in_specs = [
        lane_spec(dim_in, TBN),  # xT
        lane_spec(1, TBN),  # kT
        lane_spec(1, TBN),  # maskT
        lane_spec(dim_emb_time, TBN),  # tembT (per-particle lanes)
    ] + [full(w) for w in packed]

    out_specs = [lane_spec(dim_c, TBN), lane_spec(vocab, TBN)]
    out_shape = [
        jax.ShapeDtypeStruct((dim_c, B * N), jnp.float32),
        jax.ShapeDtypeStruct((vocab, B * N), jnp.float32),
    ]
    if output_hidden_local:
        out_specs.append(lane_spec(hidden, TBN))
        out_shape.append(jax.ShapeDtypeStruct((hidden, B * N), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        compiler_params=None if interpret else _VMEM_LIMIT,
    )(xT, kT, maskT, tembT, *packed)

    out = jnp.concatenate([outs[0], outs[1]], axis=0)  # (dim_c+vocab, B·N)
    out = out.T.reshape(B, N, dim_c + vocab)[:B_in, :N_in].astype(x.dtype)
    if output_hidden_local:
        hid = outs[2].T.reshape(B, N, hidden)[:B_in, :N_in]
        return out, hid
    return out


def epic_pattern_supported(config, allow_linear_discrete: bool = False) -> bool:
    """True when the encoder matches the kernel's covered pattern (the
    config-berlin / config-nyc family); other embedding switches fall back
    to the flax path. `epic_forward_pallas` itself handles any N by padding
    jets to the next lane multiple (exact: trunk reductions are masked).

    allow_linear_discrete additionally accepts the Linear (one-hot valued)
    discrete embedding — callers must then feed [x ‖ one-hot] with
    fold_discrete=True (the transdimensional trunk does)."""
    e = config.encoder
    d = config.data
    discrete_ok = e.embedding_features_discrete == "Embedding" or (
        allow_linear_discrete and e.embedding_features_discrete == "Linear"
    )
    return (
        e.embedding_time == "SinusoidalPositionalEncoding"
        and e.embedding_features_continuous == "Linear"
        and discrete_ok
        and d.dim_context_continuous == 0
        and d.dim_context_discrete == 0
        and d.dim_features_discrete == 1
    )


def mbm_pallas_supported(config) -> bool:
    """Gate for the MBM fused paths (fully-fused sampler step + custom-VJP
    training kernels), which additionally keep the telegraph/solver state in
    lane layout: the per-jet lane split (d, TB·N) → (d, TB, N) is only a
    Mosaic-supported reshape when N is a lane multiple.

    Hidden width is capped at 64: the whole-step kernel holds ~10 live
    (hidden, 128·N) f32 buffers in VMEM, and at hidden 128 (the --scaled
    backbone) Mosaic's compile does not terminate in >18 min on v5e while
    the plain-XLA sampler runs 2,296 jets/s there — wide backbones default
    to the XLA path (docs/ARCHITECTURE.md perf ledger)."""
    return (
        epic_pattern_supported(config)
        and config.data.max_num_particles % 128 == 0
        and config.encoder.dim_hidden_local <= 64
        # tensor-parallel runs shard the block kernels over 'model'
        # (parallel/tp.py); a pallas_call consumes full arrays and would
        # force XLA to all-gather them back — TP routes through the flax/XLA
        # stack instead
        and getattr(getattr(config, "parallel", None), "model_axis", 1) <= 1
    )
