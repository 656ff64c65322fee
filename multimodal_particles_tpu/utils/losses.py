"""Multi-task loss combination.

The learnable variant implements uncertainty weighting
Σ_i exp(-w_i)·L_i + w_i with trainable log-variances w (reference:
utils/losses.py:9-35). In JAX the weights are a plain parameter leaf that the
model owns inside its param pytree — they receive gradients through the same
jitted value_and_grad as the network weights.
"""

from typing import List, Sequence, Tuple

import jax.numpy as jnp


def multihead_loss(losses: Sequence[jnp.ndarray], weights: jnp.ndarray, mode: str = "learnable") -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Combine per-head losses.

    Args:
      losses: sequence of scalar losses.
      weights: (num_losses,) — learnable log-variances, or fixed weights.
      mode: 'learnable' → Σ exp(-w_i)·L_i + w_i; 'fixed' → Σ w_i·L_i.
    """
    losses = list(losses)
    if mode == "learnable":
        combined = sum(
            jnp.exp(-weights[i]) * losses[i] + weights[i] for i in range(len(losses))
        )
    elif mode == "fixed":
        combined = sum(weights[i] * losses[i] for i in range(len(losses)))
    else:
        raise ValueError(f"unknown multihead loss mode {mode!r}")
    return combined, losses


def multihead_weights(weights: jnp.ndarray, mode: str = "learnable"):
    """Effective per-head weights (exp(-w) for learnable mode)."""
    if mode == "learnable":
        return jnp.exp(-weights)
    return weights
