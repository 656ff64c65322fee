"""Masked-tensor helpers (reference: utils/tensor_operations.py:3-61).

In the TPU rebuild most of these collapsed into `StructuredState` mask
algebra; the standalone functions are kept for API parity and for host-side
assertions in tests."""

import jax
import jax.numpy as jnp


def remove_mean(x):
    return x - jnp.mean(x, axis=1, keepdims=True)


def remove_mean_with_mask(x, node_mask):
    n = jnp.sum(node_mask, axis=1, keepdims=True)
    mean = jnp.sum(x, axis=1, keepdims=True) / jnp.maximum(n, 1.0)
    return x - mean * node_mask


def create_and_apply_mask_3(x, new_dims):
    """Zero rows >= new_dims for (B, N, F) tensors; returns (masked, mask)."""
    mask = (
        jnp.arange(x.shape[1])[None, :, None] < new_dims[:, None, None]
    ).astype(x.dtype)
    mask = jnp.broadcast_to(mask, x.shape)
    return x * mask, mask


def create_and_apply_mask_2(x, new_dims):
    """Zero columns >= new_dims for (B, N) tensors; returns (masked, mask)."""
    mask = (jnp.arange(x.shape[1])[None, :] < new_dims[:, None]).astype(x.dtype)
    return x * mask, mask


def sample_gaussian_with_mask(key, size, node_mask):
    return jax.random.normal(key, size) * node_mask


def sample_center_gravity_zero_gaussian_with_mask(key, size, node_mask):
    assert len(size) == 3
    x = jax.random.normal(key, size) * node_mask
    return remove_mean_with_mask(x, node_mask)


def assert_correctly_masked(variable, node_mask, atol=1e-4):
    import numpy as np

    err = np.abs(np.asarray(variable) * (1 - np.asarray(node_mask))).max()
    assert err < atol, f"Variables not masked properly ({err})."


def assert_mean_zero_with_mask(x, node_mask, eps=1e-10):
    import numpy as np

    assert_correctly_masked(x, node_mask)
    largest = np.abs(np.asarray(x)).max()
    error = np.abs(np.asarray(x).sum(axis=1, keepdims=True)).max()
    rel_error = error / (largest + eps)
    assert rel_error < 1e-2, f"Mean is not zero, relative_error {rel_error}"


def check_mask_correct(variables, node_mask):
    for variable in variables:
        if len(variable) > 0:
            assert_correctly_masked(variable, node_mask)
