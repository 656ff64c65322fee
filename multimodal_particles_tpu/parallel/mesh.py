"""Device mesh construction and sharding helpers.

The TPU-native replacement for the reference's (absent) distributed backend
(SURVEY.md §2.9/§5.8): a global `jax.sharding.Mesh` over ICI with named axes

    ('data', 'model')

Training and bulk sampling shard the batch axis over 'data'. Parameters are
replicated at `model_axis=1` (the default — the shipped models are
10^5-10^6 params, below where model parallelism pays); at `model_axis>1`
the trainer places them tensor-parallel via parallel/tp.py (Megatron-paired
EPiC-block kernels over 'model') with the step functions untouched.

Collectives are inserted by XLA from sharding annotations on jitted
functions ("compiler-first" collectives, the scaling-book recipe) — there are
no hand-written NCCL-style calls to port.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_device_mesh(
    data_axis: int = -1, model_axis: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'model') mesh.

    data_axis == -1 means "all devices / model_axis". On multi-host
    platforms `jax.devices()` is the global device list, so the same call
    works on a v5e-8 slice or a DCN-spanning multi-slice job.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data_axis == -1:
        assert n % model_axis == 0, f"{n} devices not divisible by model={model_axis}"
        data_axis = n // model_axis
    assert data_axis * model_axis <= n, (
        f"mesh {data_axis}x{model_axis} needs more than {n} devices"
    )
    grid = np.asarray(devices[: data_axis * model_axis]).reshape(
        data_axis, model_axis
    )
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host-side batch pytree onto the mesh, batch-sharded on axis 0.

    Works for single-process (device_put with a NamedSharding) and is the
    single point to swap in `jax.make_array_from_process_local_data` for
    multi-host data loading.
    """
    sharding = batch_sharding(mesh)

    def put(x):
        if x is None:
            return None
        # multi-host path: exercised for real by the 2-process localhost
        # jax.distributed test (tests/test_parallel/test_multihost.py)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(np.asarray(x), sharding)

    return jax.tree_util.tree_map(put, batch)


def pad_to_multiple(batch, multiple: int):
    """Pad the leading axis of every array in `batch` up to a multiple (for
    even sharding), returning (padded_batch, original_size).

    Padding REPLICATES the last sample rather than zero-filling: losses that
    follow the reference's unmasked reductions (e.g. the absorbing-flow CE,
    absorbing_flows.py:224-236) would otherwise average fake all-zero rows
    into the final partial batch of every epoch.

    Leaves whose leading dim differs from the batch size (scalar context
    fields, (1, d) global conditioning, 0-d metadata) pass through unchanged
    — only per-sample arrays are padded."""
    leaves = [np.asarray(v) for v in jax.tree_util.tree_leaves(batch)]
    sizes = [v.shape[0] for v in leaves if v.ndim > 0]
    if not sizes:
        return batch, 0
    # the batch size is the modal leading dim; anything else is context.
    # Ties (e.g. one per-sample leaf + one (1, d) context leaf) break
    # toward the LARGER dim — context fields are the small ones.
    b = max(set(sizes), key=lambda s: (sizes.count(s), s))
    target = ((b + multiple - 1) // multiple) * multiple
    if target == b:
        return batch, b

    def pad(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] != b:
            return x
        reps = [(0, target - b)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, reps, mode="edge")

    return jax.tree_util.tree_map(pad, batch), b
