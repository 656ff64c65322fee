"""Transformer pieces for the rate/creation heads (flax).

Re-design of the reference channel-first Conv1d transformer blocks
(reference: models/architectures/gsdm.py:8-169) in (B, N, C) layout — on TPU
a kernel-size-1 Conv1d IS a Dense over the channel axis, and keeping the
particle axis last-but-one gives XLA clean (B·N, C) GEMMs for the MXU.

GroupNorm statistics are computed over (channel-group × particle) axes,
matching torch.nn.GroupNorm on (B, C, N).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_particles_tpu.models.architectures.utils import (
    get_timestep_embedding,
)


def swish(x):
    return x * nn.sigmoid(x)


class ResnetBlock(nn.Module):
    """norm → swish → dense → +time-emb → norm → swish → dropout → dense → +x
    (reference: gsdm.py:38-66)."""

    channels: int
    dropout: float = 0.0
    temb_channels: int = 512

    @nn.compact
    def __call__(self, x, temb, deterministic: bool = True):
        """x: (B, N, C); temb: (B, temb_channels)."""
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm1")(x)
        h = swish(h)
        h = nn.Dense(self.channels, name="conv1")(h)
        h = h + nn.Dense(self.channels, name="temb_proj")(swish(temb))[:, None, :]
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm2")(h)
        h = swish(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.channels, name="conv2")(h)
        return x + h


class AttnBlock(nn.Module):
    """Multi-head self-attention over the particle axis with residual
    (reference: gsdm.py:69-168). Optional additive mask (the reference
    attends over padded slots too; pass `mask` to restrict).

    A fused Pallas attention core exists (ops/attention_pallas.py) but is
    OFF by default: measured on v5e at these shapes (N ≤ 128, C = 128,
    B = 2048) XLA's batched einsum attention is ~9× faster than both the
    per-jet and batched-dot_general kernel variants — the score matrices
    are small enough that XLA's native batched GEMMs win ("don't
    hand-schedule what the compiler already does"). The kernel remains
    parity-tested infrastructure for larger-N regimes."""

    in_channels: int
    n_heads: int = 1
    attn_dim_reduce: int = 1
    use_pallas: object = False

    def _pallas_on(self) -> bool:
        if not self.use_pallas or self.attn_dim_reduce != 1:
            return False
        if self.use_pallas == "auto":
            return jax.default_backend() != "cpu"
        return True

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        """x: (B, N, C); mask: optional (B, N, 1) validity mask."""
        B, N, C = x.shape
        c = self.in_channels // self.attn_dim_reduce
        heads = self.n_heads
        head_dim = c // heads

        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        q = nn.Dense(c, name="q")(h)
        k = nn.Dense(c, name="k")(h)
        v = nn.Dense(c, name="v")(h)

        if self._pallas_on():
            from multimodal_particles_tpu.ops.attention_pallas import (
                attention_core_pallas,
            )

            out = attention_core_pallas(q, k, v, mask, n_heads=heads)
        else:
            q = q.reshape(B, N, heads, head_dim)
            k = k.reshape(B, N, heads, head_dim)
            v = v.reshape(B, N, heads, head_dim)
            # (B, heads, Nq, Nk)
            w = jnp.einsum("bkhd,bqhd->bhqk", k, q) * (head_dim**-0.5)
            if mask is not None:
                bias = jnp.where(mask[:, None, None, :, 0] > 0, 0.0, -1e9)
                w = w + bias
            w = nn.softmax(w, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, N, c)
        out = nn.Dense(self.in_channels, name="proj_out")(out)
        return x + out
