"""Named-axis collectives layer (SURVEY.md §2.9 item 2).

A thin convention wrapper over the XLA collectives so the same train/sample
step runs on 1 chip or a v5e/v5p slice: the data-parallel axis is always
called 'data', the (currently size-1) model axis 'model'. Inside
`shard_map`-mapped functions these helpers are the only way ranks
communicate; under plain `jit`+shardings XLA inserts the equivalents
automatically and this module is not needed.
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def psum_data(x):
    """Sum over the data-parallel axis (gradient reduction)."""
    return jax.lax.psum(x, DATA_AXIS)


def pmean_data(x):
    """Mean over the data-parallel axis (loss/metric averaging)."""
    return jax.lax.pmean(x, DATA_AXIS)


def all_gather_data(x, axis=0, tiled=True):
    """Gather per-shard arrays along the data axis (e.g. for evaluation)."""
    return jax.lax.all_gather(x, DATA_AXIS, axis=axis, tiled=tiled)


def ppermute_data(x, perm):
    """Ring permutation over the data axis (building block for pipelined
    sweeps)."""
    return jax.lax.ppermute(x, DATA_AXIS, perm)


def axis_index_data():
    return jax.lax.axis_index(DATA_AXIS)


def data_spec(*trailing):
    """PartitionSpec sharding the leading axis over 'data'."""
    return P(DATA_AXIS, *trailing)


def replicated_spec():
    return P()


def make_shard_map_train_step(model, tx, mesh, ema_decay=None, skip_nonfinite=False):
    """Explicit-collectives train step: each rank computes grads on its
    batch shard, `pmean`s them over 'data', and applies the update
    replicated — the shard_map formulation of what the jit+shardings path
    lets XLA derive (training/trainer.py). Provided as the explicit SPMD
    variant; numerically identical.
    """
    from multimodal_particles_tpu.training.trainer import TrainState

    def _step(state, key, batch):
        step_key = jax.random.fold_in(key, state.step)
        # decorrelate bridge sampling across ranks
        step_key = jax.random.fold_in(step_key, jax.lax.axis_index(DATA_AXIS))
        (loss, metrics), grads = jax.value_and_grad(model.loss_fn, has_aux=True)(
            state.params, step_key, batch
        )
        grads = jax.tree_util.tree_map(pmean_data, grads)
        metrics = jax.tree_util.tree_map(pmean_data, metrics)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        import optax

        new_params = optax.apply_updates(state.params, updates)
        if skip_nonfinite:
            finite = jnp.all(
                jnp.asarray(
                    [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]
                )
            )
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), new_params, state.params
            )
            new_opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old)
                if hasattr(new, "dtype")
                else new,
                new_opt_state,
                state.opt_state,
            )
            metrics = {**metrics, "nonfinite_grads": 1.0 - finite}
        new_ema = state.ema_params
        if ema_decay is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                state.ema_params,
                new_params,
            )
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
                ema_params=new_ema,
            ),
            metrics,
        )

    state_specs = TrainState(step=P(), params=P(), opt_state=P(), ema_params=P())
    mapped = jax.shard_map(
        _step,
        mesh=mesh,
        in_specs=(state_specs, P(), data_spec()),
        out_specs=(state_specs, P()),
        check_vma=False,
    )
    return jax.jit(mapped)
