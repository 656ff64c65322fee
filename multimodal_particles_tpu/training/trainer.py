"""JAX trainer: the TPU-native replacement of the reference's
PyTorch-Lightning loop (reference: training/basic_experiments.py:22-147).

One jitted, donated `train_step(state, key, batch)` runs data-parallel over a
('data','model') mesh: parameters are replicated, the batch is sharded on the
leading axis, and XLA inserts the gradient all-reduce from the sharding
annotations. The same step runs unchanged on 1 chip or a v5e/v5p slice.

Includes the reference's training amenities re-built natively:
  * AdamW/Adam + per-epoch cosine annealing (configure_optimizers parity —
    multimodal_bridge_matching.py:259-269),
  * global-norm gradient clipping (`gradient_clip_val`),
  * best/last checkpointing on val_loss via orbax
    (basic_experiments.py:76-88),
  * JSONL metrics logging + optional MLflow (utils/callbacks.py),
  * jax.profiler trace hooks (SURVEY.md §5.1 gap).
"""

import json
import math
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from multimodal_particles_tpu.parallel.mesh import (
    batch_sharding,
    make_device_mesh,
    pad_to_multiple,
    replicated_sharding,
    shard_batch,
)


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any = None


def cosine_annealing_schedule(lr: float, eta_min: float, t_max: int, steps_per_epoch: int):
    """Per-epoch CosineAnnealingLR (torch semantics: argument is the epoch
    index, annealed over T_max epochs)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        cos = jnp.cos(jnp.pi * jnp.minimum(epoch, t_max) / t_max)
        return eta_min + (lr - eta_min) * (1.0 + cos) / 2.0

    return schedule


def resolve_train_config(config):
    """Return a TrainingConfig-like object for any model family's config.

    The transdimensional config tree carries `optimizer_kwargs` (EDM-style)
    instead of a `train` section (reference:
    config_classes/transdimensional_unconditional_config.py:86-90);
    synthesize the fields the optimizer builder needs."""
    train = getattr(config, "train", None)
    if train is not None:
        return train

    class _Synth:
        pass

    ok = config.optimizer_kwargs
    synth = _Synth()
    synth.epochs = 1
    synth.optimizer_name = "AdamW" if "AdamW" in ok.class_name else "Adam"
    synth.lr = ok.lr
    synth.betas = list(ok.betas)
    synth.eps = ok.eps
    synth.weight_decay = 0.0
    synth.gradient_clip_val = getattr(
        config.grad_conditioner_kwargs, "grad_norm_clip", 0.0
    )
    synth.scheduler_name = None
    synth.scheduler_params = {}
    return synth


def build_optimizer(train_config, steps_per_epoch: int):
    """Optimizer + schedule from the config tree (reference:
    config TrainingConfig fields)."""
    sched_params = train_config.scheduler_params or {}
    if train_config.scheduler_name == "CosineAnnealingLR":
        schedule = cosine_annealing_schedule(
            train_config.lr,
            float(sched_params.get("eta_min", 0.0)),
            int(sched_params.get("T_max", 1000)),
            steps_per_epoch,
        )
    else:
        schedule = train_config.lr

    name = (train_config.optimizer_name or "Adam").lower()
    b1, b2 = train_config.betas
    if name == "adamw":
        opt = optax.adamw(
            schedule,
            b1=b1,
            b2=b2,
            eps=train_config.eps,
            weight_decay=train_config.weight_decay,
        )
    elif name == "adam":
        opt = optax.adam(schedule, b1=b1, b2=b2, eps=train_config.eps)
    else:
        raise ValueError(f"unsupported optimizer {train_config.optimizer_name!r}")

    chain = []
    if train_config.gradient_clip_val:
        chain.append(optax.clip_by_global_norm(train_config.gradient_clip_val))
    chain.append(opt)
    return optax.chain(*chain)


class Trainer:
    """Data-parallel trainer over a device mesh.

    Args:
      model: object exposing `init(key, batch)` and
        `loss_fn(params, key, batch) -> (loss, metrics)` and optionally
        `predict(params, batch, key)`.
      config: full config tree (train/parallel sections used).
      experiment_files: optional ExperimentsFiles for checkpoints/metrics.
    """

    def __init__(self, model, config, experiment_files=None, mesh=None, seed: int = 0,
                 ema_decay=None):
        self.model = model
        self.config = config
        self.files = experiment_files
        # EDM-style EMA: halflife in thousands of samples (the reference
        # transdimensional config carries ema_halflife_kimg)
        if ema_decay is None and getattr(config, "ema_halflife_kimg", None):
            batch = getattr(config, "batch_size", None) or getattr(
                config.data, "batch_size", 64
            )
            ema_decay = 0.5 ** (batch / (config.ema_halflife_kimg * 1000.0))
        self.ema_decay = ema_decay
        par = getattr(config, "parallel", None)
        self.mesh = mesh if mesh is not None else make_device_mesh(
            data_axis=par.data_axis if par else -1,
            model_axis=par.model_axis if par else 1,
        )
        self.data_parallel = self.mesh.shape["data"]
        self.root_key = jax.random.PRNGKey(seed)
        self._train_step = None
        self._eval_step = None
        self.state: Optional[TrainState] = None
        self.tx = None
        self._metrics_fh = None
        # 'jit' lets XLA insert collectives from shardings; 'shard_map' uses
        # the explicit psum/pmean formulation (parallel/collectives.py)
        self.spmd_mode = getattr(
            getattr(config, "parallel", None), "spmd_mode", "jit"
        ) or "jit"
        self.skip_nonfinite_updates = bool(
            getattr(getattr(config, "parallel", None), "skip_nonfinite_updates", False)
        )

    # ------------------------------------------------------------- build

    def setup(self, example_batch, steps_per_epoch: int = 1):
        """Initialize params/optimizer and compile the step functions."""
        self.tx = build_optimizer(resolve_train_config(self.config), steps_per_epoch)
        # pad like fit/predict do: an example batch whose size is not a
        # device-count multiple must not crash the sharded device_put
        example_batch, _ = pad_to_multiple(example_batch, self.data_parallel)
        batch = shard_batch(example_batch, self.mesh)
        params = self.model.init(self.root_key, batch)
        if self.mesh.shape["model"] > 1:
            # tensor-parallel placement (parallel/tp.py): Megatron-paired
            # EPiC-block kernels shard over 'model'; the step functions are
            # untouched — XLA SPMD derives the collectives. Optimizer
            # moments mirror the param tree: EAGER tx.init zeros_like the
            # sharded params, so the moments inherit their shardings (a
            # jitted init would let the partitioner re-choose).
            from multimodal_particles_tpu.parallel.tp import shard_params_tp

            params = shard_params_tp(params, self.mesh)
            opt_state = self.tx.init(params)
        else:
            params = jax.device_put(params, replicated_sharding(self.mesh))
            opt_state = jax.device_put(
                self.tx.init(params), replicated_sharding(self.mesh)
            )
        # fresh buffers: aliasing params would double-donate under jit
        ema_params = (
            jax.tree_util.tree_map(jnp.copy, params)
            if self.ema_decay is not None
            else None
        )
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
        )

        model, tx, ema_decay = self.model, self.tx, self.ema_decay

        skip_nonfinite = self.skip_nonfinite_updates

        def train_step(state: TrainState, key, batch):
            step_key = jax.random.fold_in(key, state.step)
            (loss, metrics), grads = jax.value_and_grad(model.loss_fn, has_aux=True)(
                state.params, step_key, batch
            )
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            if skip_nonfinite:
                # numerical fault tolerance (SURVEY §5.3): a step whose grads
                # contain NaN/inf leaves params and optimizer state untouched
                finite = jnp.all(
                    jnp.asarray(
                        [
                            jnp.all(jnp.isfinite(g))
                            for g in jax.tree_util.tree_leaves(grads)
                        ]
                    )
                )
                new_params = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(finite, new, old),
                    new_params,
                    state.params,
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
            new_state = TrainState(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
                ema_params=new_ema,
            )
            return new_state, metrics

        def eval_step(state: TrainState, key, batch, epoch, batch_idx):
            # fold epoch AND batch index in HERE, inside the jit: state.step
            # is constant across an epoch's validation (same bridge noise per
            # batch) and a fixed per-batch key would correlate epochs; doing
            # it host-side costs two ~100 ms axon dispatches per epoch
            step_key = jax.random.fold_in(key, 7919 + batch_idx)
            step_key = jax.random.fold_in(step_key, epoch)
            _, metrics = model.loss_fn(state.params, step_key, batch)
            return metrics

        if self.spmd_mode == "shard_map":
            if self.mesh.shape["model"] > 1:
                raise ValueError(
                    "spmd_mode='shard_map' is the explicit data-parallel "
                    "formulation (in_specs replicate params); tensor "
                    "parallelism (parallel.model_axis > 1) requires "
                    "spmd_mode='jit' so XLA derives the 'model'-axis "
                    "collectives from the parallel/tp.py shardings"
                )
            from multimodal_particles_tpu.parallel.collectives import (
                make_shard_map_train_step,
            )

            self._train_step = make_shard_map_train_step(
                model,
                tx,
                self.mesh,
                ema_decay=ema_decay,
                skip_nonfinite=skip_nonfinite,
            )
        else:
            donate = (
                (0,) if getattr(self.config.parallel, "donate_buffers", True) else ()
            )
            self._train_step = jax.jit(train_step, donate_argnums=donate)
        self._eval_step = jax.jit(eval_step)
        return self.state

    # -------------------------------------------------------------- loops

    def fit(self, datamodule, epochs: Optional[int] = None, log_every: int = 1):
        """Full training loop with validation, best/last checkpoints and
        JSONL metrics (Lightning Trainer.fit parity)."""
        epochs = epochs if epochs is not None else resolve_train_config(self.config).epochs
        steps_per_epoch = max(len(datamodule.train), 1)
        example = next(iter(datamodule.train))
        if self.state is None:
            self.setup(example, steps_per_epoch)

        best_val = math.inf
        key = jax.random.fold_in(self.root_key, 1)
        history = []
        for epoch in range(epochs):
            t0 = time.time()
            train_losses = []
            for batch in datamodule.train:
                batch, _ = pad_to_multiple(batch, self.data_parallel)
                batch = shard_batch(batch, self.mesh)
                self.state, metrics = self._train_step(self.state, key, batch)
                train_losses.append(metrics)
            train_loss = float(
                np.mean([float(m["loss"]) for m in train_losses])
            ) if train_losses else float("nan")
            # per-head / diagnostic components, epoch-averaged
            components = {}
            if train_losses:
                for name in train_losses[0]:
                    if name == "loss":
                        continue
                    try:
                        components[f"train_{name}"] = float(
                            np.mean([float(m[name]) for m in train_losses])
                        )
                    except (TypeError, ValueError):
                        pass

            val_loss = None
            if datamodule.valid is not None:
                val_losses = []
                for i, batch in enumerate(datamodule.valid):
                    batch, _ = pad_to_multiple(batch, self.data_parallel)
                    batch = shard_batch(batch, self.mesh)
                    m = self._eval_step(self.state, key, batch, epoch, i)
                    val_losses.append(float(m["loss"]))
                val_loss = float(np.mean(val_losses)) if val_losses else None

            record = {
                "epoch": epoch,
                "step": int(self.state.step),
                "train_loss": train_loss,
                "val_loss": val_loss,
                "epoch_time_s": time.time() - t0,
                **components,
            }
            history.append(record)
            self._log_metrics(record)

            if self.files is not None:
                self.save_checkpoint("last")
                if val_loss is not None and val_loss < best_val:
                    best_val = val_loss
                    self.save_checkpoint("best")
        return history

    def predict(self, datamodule_or_batches, key=None, use_ema: bool = True):
        """Run the model's sampler over all (test/val) batches and return the
        list of final states (reference Trainer.predict parity).

        Samples with the EMA parameters when EMA is enabled (EDM practice,
        matching the reference transdimensional ema_halflife_kimg intent)."""
        key = key if key is not None else jax.random.fold_in(self.root_key, 2)
        batches = datamodule_or_batches
        if hasattr(batches, "test") or hasattr(batches, "valid"):
            loader = getattr(batches, "test", None) or batches.valid or batches.train
            batches = list(loader)
        predict_fn = jax.jit(self.model.predict)
        params = (
            self.state.ema_params
            if use_ema and self.state.ema_params is not None
            else self.state.params
        )
        outs = []
        for i, batch in enumerate(batches):
            batch, orig = pad_to_multiple(batch, self.data_parallel)
            batch = shard_batch(batch, self.mesh)
            out = predict_fn(params, batch, jax.random.fold_in(key, i))
            out = jax.tree_util.tree_map(
                lambda x: np.asarray(x)[:orig] if x is not None else None, out
            )
            outs.append(out)
        return outs

    # -------------------------------------------------------- check/metrics

    def save_checkpoint(self, tag: str):
        import orbax.checkpoint as ocp

        path = os.path.abspath(self.files.checkpoint_path(tag))
        ckptr = ocp.StandardCheckpointer()
        payload = {
            "step": np.asarray(self.state.step),
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
        }
        if self.state.ema_params is not None:
            payload["ema_params"] = jax.device_get(self.state.ema_params)
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()

    def load_checkpoint(self, tag_or_path: str):
        import orbax.checkpoint as ocp

        path = (
            tag_or_path
            if os.path.isdir(tag_or_path)
            else self.files.get_checkpoint_path(tag_or_path)
        )
        ckptr = ocp.StandardCheckpointer()
        target = {
            "step": np.asarray(self.state.step),
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
        }
        if self.state.ema_params is not None:
            target["ema_params"] = jax.device_get(self.state.ema_params)
        restored = ckptr.restore(os.path.abspath(path), target=target)
        if self.mesh.shape["model"] > 1:
            from multimodal_particles_tpu.parallel.tp import shard_params_tp

            params = shard_params_tp(restored["params"], self.mesh)
            # optimizer moments mirror the param tree: take the shardings a
            # fresh (eager, sharding-inheriting) tx.init gives them, then
            # place the RESTORED values onto exactly those
            placed = self.tx.init(params)
            opt_state = jax.tree_util.tree_map(
                lambda v, ref: jax.device_put(np.asarray(v), ref.sharding)
                if hasattr(ref, "sharding")
                else v,
                restored["opt_state"],
                placed,
            )
            ema_params = (
                shard_params_tp(restored["ema_params"], self.mesh)
                if "ema_params" in restored
                else None
            )
        else:
            params = jax.device_put(
                restored["params"], replicated_sharding(self.mesh)
            )
            opt_state = jax.device_put(
                restored["opt_state"], replicated_sharding(self.mesh)
            )
            ema_params = (
                jax.device_put(restored["ema_params"], replicated_sharding(self.mesh))
                if "ema_params" in restored
                else None
            )
        self.state = TrainState(
            step=jnp.asarray(restored["step"]),
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
        )
        return self.state

    def _log_metrics(self, record: dict):
        if self.files is not None:
            with open(self.files.metrics_file, "a") as fh:
                fh.write(json.dumps(record) + "\n")
        # optional MLflow (reference: utils/callbacks.py) — gated import
        try:  # pragma: no cover
            import mlflow

            if mlflow.active_run() is not None:
                mlflow.log_metrics(
                    {k: v for k, v in record.items() if isinstance(v, (int, float)) and v is not None},
                    step=record.get("step", 0),
                )
        except ImportError:
            # a torch-reference parity run installs an mlflow stub into
            # sys.modules; utils/torch_reference.py makes it answer
            # active_run() -> None so this block stays a no-op there
            pass

    # ------------------------------------------------------------ profiling

    def profile(self, log_dir: str):
        """Context manager emitting a jax.profiler trace for one block."""
        return jax.profiler.trace(log_dir)
