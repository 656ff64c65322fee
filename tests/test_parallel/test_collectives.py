"""Explicit-collectives (shard_map) train step vs the jit+shardings path."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_particles_tpu import test_resources_dir
from multimodal_particles_tpu.config_classes import MultimodalBridgeMatchingConfig
from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
    JetsDataloaderModule,
)
from multimodal_particles_tpu.models.generative.multimodal_bridge_matching import (
    MultiModalBridgeMatching,
)
from multimodal_particles_tpu.parallel.mesh import shard_batch
from multimodal_particles_tpu.training.trainer import Trainer

import os

CONFIG_PATH = os.path.join(test_resources_dir, "configs_files", "config-mbm-test.yaml")


def _cfg():
    cfg = MultimodalBridgeMatchingConfig.from_yaml(CONFIG_PATH)
    cfg.data.batch_size = 16
    cfg.data.max_num_particles = 16
    cfg.bridge.num_timesteps = 4
    return cfg


def test_shard_map_train_step_reduces_loss():
    cfg = _cfg()
    cfg.parallel.spmd_mode = "shard_map"
    model = MultiModalBridgeMatching(cfg)
    trainer = Trainer(model, cfg)
    batch = JetsDataloaderModule.random_databatch(cfg)
    trainer.setup(batch, steps_per_epoch=1)
    sb = shard_batch(batch, trainer.mesh)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(10):
        trainer.state, metrics = trainer._train_step(trainer.state, key, sb)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_skip_nonfinite_updates_guard():
    cfg = _cfg()
    cfg.parallel.skip_nonfinite_updates = True
    model = MultiModalBridgeMatching(cfg)

    # poison the loss for one step via a batch of NaNs
    trainer = Trainer(model, cfg)
    batch = JetsDataloaderModule.random_databatch(cfg)
    trainer.setup(batch, steps_per_epoch=1)
    key = jax.random.PRNGKey(0)
    sb = shard_batch(batch, trainer.mesh)
    trainer.state, m0 = trainer._train_step(trainer.state, key, sb)
    params_before = jax.device_get(trainer.state.params)

    bad = type(batch)(*[
        (np.full_like(np.asarray(v, dtype=np.float32), np.nan)
         if np.issubdtype(np.asarray(v).dtype, np.floating) else v)
        for v in batch
    ])
    sb_bad = shard_batch(bad, trainer.mesh)
    trainer.state, m1 = trainer._train_step(trainer.state, key, sb_bad)
    assert float(m1["nonfinite_grads"]) == 1.0
    params_after = jax.device_get(trainer.state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        params_before,
        params_after,
    )
