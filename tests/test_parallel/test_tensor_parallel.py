"""Tensor-parallel param shardings (parallel/tp.py) on the virtual 8-device
CPU mesh: the Megatron pairing places EPiC-block kernels over 'model', the
step functions are untouched, and the TP loss trajectory matches the
replicated data-parallel one (the reference has no model parallelism at
all — this is rebuild-only scaling surface, SURVEY.md §2.9)."""

import os

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from multimodal_particles_tpu import test_resources_dir
from multimodal_particles_tpu.config_classes import MultimodalBridgeMatchingConfig
from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
    JetsDataloaderModule,
)
from multimodal_particles_tpu.models.generative.multimodal_bridge_matching import (
    MultiModalBridgeMatching,
)
from multimodal_particles_tpu.parallel.mesh import make_device_mesh, shard_batch
from multimodal_particles_tpu.parallel.tp import (
    shard_params_tp,
    tp_param_specs,
)
from multimodal_particles_tpu.training.trainer import Trainer

CONFIG_PATH = os.path.join(test_resources_dir, "configs_files", "config-mbm-test.yaml")


def _tiny_config(model_axis=1):
    cfg = MultimodalBridgeMatchingConfig.from_yaml(CONFIG_PATH)
    cfg.data.batch_size = 16
    cfg.data.max_num_particles = 16
    cfg.bridge.num_timesteps = 5
    cfg.parallel.model_axis = model_axis
    return cfg


def _params(cfg):
    model = MultiModalBridgeMatching(cfg)
    batch = JetsDataloaderModule.random_databatch(cfg)
    mesh = make_device_mesh(model_axis=cfg.parallel.model_axis)
    sb = shard_batch(batch, mesh)
    return model, batch, mesh, model.init(jax.random.PRNGKey(0), sb)


def test_tp_specs_follow_megatron_pairing():
    cfg = _tiny_config(model_axis=2)
    _, _, mesh, params = _params(cfg)
    specs = tp_param_specs(params, mesh)
    block = specs["encoder"]["epic"]["epic"]["epic_layer_0"]
    # column-parallel first layer: v out-dim sharded, g/bias follow
    assert block["fc_local1"]["v"] == P(None, "model")
    assert block["fc_local1"]["g"] == P("model")
    assert block["fc_local1"]["bias"] == P("model")
    assert block["fc_global1"]["v"] == P(None, "model")
    # row-parallel second layer: v in-dim sharded, g/bias replicated
    assert block["fc_local2"]["v"] == P("model", None)
    assert block["fc_local2"]["g"] == P()
    assert block["fc_global2"]["v"] == P("model", None)
    # everything outside the pairing is replicated
    assert specs["encoder"]["epic"]["embedding"]["embedding_continuous"]["kernel"] == P()
    assert specs["loss_weights"] == P()


def test_tp_indivisible_dims_fall_back_to_replicated():
    cfg = _tiny_config(model_axis=2)
    _, _, mesh, params = _params(cfg)
    # a fake 3-wide kernel under a column-parallel name must not shard
    from multimodal_particles_tpu.parallel.tp import _spec_for

    import jax.numpy as jnp

    assert _spec_for("['fc_local1']['v']", jnp.zeros((8, 3)), 2) == P()
    assert _spec_for("['fc_local2']['v']", jnp.zeros((3, 8)), 2) == P()


def test_tp_placement_halves_shard_shapes():
    cfg = _tiny_config(model_axis=2)
    _, _, mesh, params = _params(cfg)
    placed = shard_params_tp(params, mesh)
    v = placed["encoder"]["epic"]["epic"]["epic_layer_0"]["fc_local1"]["v"]
    assert not v.sharding.is_fully_replicated
    shard = v.addressable_shards[0].data
    assert shard.shape == (v.shape[0], v.shape[1] // 2)
    v2 = placed["encoder"]["epic"]["epic"]["epic_layer_0"]["fc_local2"]["v"]
    assert v2.addressable_shards[0].data.shape == (v2.shape[0] // 2, v2.shape[1])


def test_tp_trainer_matches_data_parallel_losses():
    """model_axis=2 must be a pure re-layout: identical seeds/batches give
    the replicated trajectory up to summation order."""
    losses = {}
    for axis in (1, 2):
        cfg = _tiny_config(model_axis=axis)
        model = MultiModalBridgeMatching(cfg)
        trainer = Trainer(model, cfg, experiment_files=None, seed=0)
        batch = JetsDataloaderModule.random_databatch(cfg)
        trainer.setup(batch, steps_per_epoch=1)
        assert trainer.mesh.shape["model"] == axis
        if axis == 2:
            # params actually went out tensor-parallel, moments followed
            v = trainer.state.params["encoder"]["epic"]["epic"][
                "epic_layer_0"]["fc_local1"]["v"]
            assert not v.sharding.is_fully_replicated
            moment_leaves = [
                leaf
                for path, leaf in jax.tree_util.tree_flatten_with_path(
                    trainer.state.opt_state
                )[0]
                if "fc_local1" in jax.tree_util.keystr(path)
                and hasattr(leaf, "shape")
                and leaf.shape == v.shape
            ]
            assert moment_leaves and all(
                not m.sharding.is_fully_replicated for m in moment_leaves
            )
        sb = shard_batch(batch, trainer.mesh)
        key = jax.random.PRNGKey(7)
        run = []
        for _ in range(6):
            trainer.state, metrics = trainer._train_step(trainer.state, key, sb)
            run.append(float(metrics["loss"]))
        losses[axis] = run
    np.testing.assert_allclose(losses[1], losses[2], rtol=2e-4, atol=1e-5)


def test_tp_rejects_shard_map_mode():
    import pytest

    cfg = _tiny_config(model_axis=2)
    cfg.parallel.spmd_mode = "shard_map"
    model = MultiModalBridgeMatching(cfg)
    trainer = Trainer(model, cfg, experiment_files=None, seed=0)
    with pytest.raises(ValueError, match="shard_map"):
        trainer.setup(JetsDataloaderModule.random_databatch(cfg),
                      steps_per_epoch=1)


def test_tp_predict_runs_and_is_finite():
    cfg = _tiny_config(model_axis=2)
    model, batch, mesh, params = _params(cfg)
    placed = shard_params_tp(params, mesh)
    sb = shard_batch(batch, mesh)
    out = jax.jit(model.predict)(placed, sb, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out.continuous)).all()
