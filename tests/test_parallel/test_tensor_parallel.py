"""Tensor-parallel param shardings (parallel/tp.py) on the virtual 8-device
CPU mesh: the Megatron pairing places EPiC-block kernels over 'model', the
step functions are untouched, and the TP loss trajectory matches the
replicated data-parallel one (the reference has no model parallelism at
all — this is rebuild-only scaling surface, SURVEY.md §2.9)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
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


def _tiny_family(family, model_axis=1):
    """(model, cfg, batch) for one family at trajectory-test shapes."""
    B, N = 16, 16
    if family == "mbm":
        cfg = _tiny_config(model_axis)
        return (
            MultiModalBridgeMatching(cfg),
            cfg,
            JetsDataloaderModule.random_databatch(cfg),
        )
    if family == "absorbing":
        from multimodal_particles_tpu.config_classes import AbsorbingConfig
        from multimodal_particles_tpu.models.generative.absorbing.absorbing_flows import (
            AbsorbingFlow,
        )

        cfg = AbsorbingConfig()
        cfg.data.batch_size, cfg.data.max_num_particles = B, N
        cfg.bridge.num_timesteps = 5
        cfg.parallel.model_axis = model_axis
        return AbsorbingFlow(cfg), cfg, JetsDataloaderModule.random_databatch(cfg)
    if family == "transdimensional":
        from multimodal_particles_tpu.config_classes.transdimensional_unconditional_config import (
            TransdimensionalEpicConfig,
        )
        from multimodal_particles_tpu.models.generative.transdimensional import (
            TransdimensionalJumpDiffusion,
        )

        cfg = TransdimensionalEpicConfig()
        cfg.data.batch_size, cfg.data.max_num_particles = B, N
        cfg.sampler_kwargs.dt = 1.0 / 5.0
        cfg.parallel.model_axis = model_axis
        rng = np.random.default_rng(0)
        batch = [
            jnp.asarray(rng.integers(1, N + 1, B)),
            jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32),
            jnp.asarray(np.eye(8, dtype=np.float32)[rng.integers(0, 8, (B, N))]),
        ]
        return TransdimensionalJumpDiffusion(cfg), cfg, batch
    raise ValueError(family)


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


def _find_tp_leaf(params):
    """One leaf the TP rules are expected to shard, with its path."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        ps = jax.tree_util.keystr(path)
        if "fc_local1" in ps and ps.endswith("['v']"):
            return ps, leaf
    raise AssertionError("no fc_local1 v leaf found")


@pytest.mark.parametrize("family", ["mbm", "absorbing", "transdimensional"])
def test_tp_trainer_matches_data_parallel_losses(family):
    """model_axis=2 must be a pure re-layout for EVERY family: identical
    seeds/batches give the replicated trajectory up to summation order."""
    losses = {}
    for axis in (1, 2):
        model, cfg, batch = _tiny_family(family, model_axis=axis)
        trainer = Trainer(model, cfg, experiment_files=None, seed=0)
        trainer.setup(batch, steps_per_epoch=1)
        assert trainer.mesh.shape["model"] == axis
        if axis == 2:
            # params actually went out tensor-parallel, moments followed
            vpath, v = _find_tp_leaf(trainer.state.params)
            assert not v.sharding.is_fully_replicated, vpath
            if family == "transdimensional":
                # the gsdm-stack pairing sharded the attention QKV too
                attn_sharded = [
                    leaf
                    for path, leaf in jax.tree_util.tree_flatten_with_path(
                        trainer.state.params
                    )[0]
                    if "attn_0']['q']['kernel" in jax.tree_util.keystr(path)
                ]
                assert attn_sharded and all(
                    not l.sharding.is_fully_replicated for l in attn_sharded
                )
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


def test_tp_specs_shard_gsdm_stack_pairs():
    """The transdim trunk is ~88% gsdm-stack FLOPs; the Megatron pairing
    must cover its attention QKV/proj and resnet conv1/conv2 pairs."""
    model, cfg, batch = _tiny_family("transdimensional", model_axis=2)
    mesh = make_device_mesh(model_axis=2)
    params = model.init(jax.random.PRNGKey(0), batch)
    specs = tp_param_specs(params, mesh)
    flat = {
        jax.tree_util.keystr(p): s
        for p, s in jax.tree_util.tree_flatten_with_path(specs)[0]
    }
    col = [k for k in flat if "attn_0']['q']['kernel" in k]
    row = [k for k in flat if "attn_0']['proj_out']['kernel" in k]
    c1 = [k for k in flat if "res_0']['conv1']['kernel" in k]
    c2 = [k for k in flat if "res_0']['conv2']['kernel" in k]
    assert col and row and c1 and c2
    assert all(flat[k] == P(None, "model") for k in col + c1)
    assert all(flat[k] == P("model", None) for k in row + c2)
    # proj_out / conv2 biases span the replicated out-dim
    for k in flat:
        if "proj_out']['bias" in k or "conv2']['bias" in k:
            assert flat[k] == P()


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
