"""Registered-pytree state containers for the hybrid bridges.

`HybridState` replaces the reference's torch dataclass with `.to/.detach/.cpu`
plumbing (reference: models/generative/multimodal_bridge_matching.py:13-75) —
in JAX, states are immutable pytrees that flow through `jit`/`scan`/`shard_map`
untouched; device movement and detaching are no-ops by construction.

`AbsorbingBridgeState` carries a *time-dependent* mask `mask_t` instead of the
fixed `absorbing` mask (reference: models/generative/absorbing/states.py:16-72).
"""

from typing import List, Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class HybridState:
    """Time-dependent hybrid bridge state (t, x, k, mask).

    Shapes:
      time:       (B, 1, 1) or (B, 1)
      continuous: (B, N, dim_continuous)
      discrete:   (B, N, 1) integer tokens
      absorbing:  (B, N, 1) binary mask (fixed during MBM dynamics)
    """

    time: Optional[jnp.ndarray] = None
    continuous: Optional[jnp.ndarray] = None
    discrete: Optional[jnp.ndarray] = None
    absorbing: Optional[jnp.ndarray] = None

    @staticmethod
    def cat(states: List["HybridState"], axis: int = 0) -> "HybridState":
        def cat_attr(name):
            attrs = [getattr(s, name) for s in states if getattr(s, name) is not None]
            return jnp.concatenate(attrs, axis=axis) if attrs else None

        return HybridState(
            time=cat_attr("time"),
            continuous=cat_attr("continuous"),
            discrete=cat_attr("discrete"),
            absorbing=cat_attr("absorbing"),
        )


@struct.dataclass
class MultiHeadOutput:
    """Network head outputs (drift prediction, token logits, survival logits)."""

    continuous: Optional[jnp.ndarray] = None
    discrete: Optional[jnp.ndarray] = None
    absorbing: Optional[jnp.ndarray] = None


@struct.dataclass
class AbsorbingBridgeState:
    """State evolved by the absorbing-flow dynamics: the mask itself is
    generated (killed/created) by the absorbing bridge."""

    time: Optional[jnp.ndarray] = None
    continuous: Optional[jnp.ndarray] = None
    discrete: Optional[jnp.ndarray] = None
    mask_t: Optional[jnp.ndarray] = None

    @staticmethod
    def cat(states: List["AbsorbingBridgeState"], axis: int = 0) -> "AbsorbingBridgeState":
        def cat_attr(name):
            attrs = [getattr(s, name) for s in states if getattr(s, name) is not None]
            return jnp.concatenate(attrs, axis=axis) if attrs else None

        return AbsorbingBridgeState(
            time=cat_attr("time"),
            continuous=cat_attr("continuous"),
            discrete=cat_attr("discrete"),
            mask_t=cat_attr("mask_t"),
        )


# The absorbing model's head container shares the MultiHeadOutput layout; the
# reference defines a duplicate `OutputHeads` dataclass
# (absorbing/states.py:8-12) — here it is a plain alias.
OutputHeads = MultiHeadOutput
