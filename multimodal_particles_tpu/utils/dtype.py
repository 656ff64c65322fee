"""Mixed-precision helpers: fp32 master parameters with bfloat16 compute
inside the network forward (the standard TPU recipe — MXU is 2× faster and
HBM traffic halves in bf16, while optimizer state and bridge updates stay
fp32)."""

import jax
import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "f32": jnp.float32,
    "bf16": jnp.bfloat16,
}


def resolve_dtype(name):
    if name is None:
        return jnp.float32
    if isinstance(name, str):
        return _DTYPES[name]
    return name


def cast_floating(tree, dtype):
    """Cast floating leaves of a pytree to dtype, leave ints/bools alone."""
    dtype = resolve_dtype(dtype)

    def cast(x):
        if x is None:
            return None
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def compute_dtype_of(config):
    par = getattr(config, "parallel", None)
    return resolve_dtype(getattr(par, "compute_dtype", "float32") if par else "float32")
