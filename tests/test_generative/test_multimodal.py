"""MBM model tests: param init, forward shapes, losses, sampler smoke
(reference test style: tests/test_generative/test_multimodal.py:39-46, plus
numerical checks the reference lacks)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_particles_tpu import test_resources_dir
from multimodal_particles_tpu.config_classes import MultimodalBridgeMatchingConfig
from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
    JetsDataloaderModule,
)
from multimodal_particles_tpu.models.generative.multimodal_bridge_matching import (
    MultiModalBridgeMatching,
)

CONFIG_PATH = os.path.join(test_resources_dir, "configs_files", "config-mbm-test.yaml")


def _jnp_batch(batch):
    return type(batch)(*[jnp.asarray(v) if v is not None else None for v in batch])


@pytest.fixture(scope="module")
def setup():
    cfg = MultimodalBridgeMatchingConfig.from_yaml(CONFIG_PATH)
    cfg.data.batch_size = 16
    cfg.data.max_num_particles = 32
    cfg.bridge.num_timesteps = 10
    batch = _jnp_batch(JetsDataloaderModule.random_databatch(cfg))
    model = MultiModalBridgeMatching(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    return cfg, model, params, batch


def test_init_params(setup):
    cfg, model, params, batch = setup
    assert "encoder" in params and "loss_weights" in params
    assert params["loss_weights"].shape == (2,)


def test_sample_bridges_and_forward(setup):
    cfg, model, params, batch = setup
    state = model.sample_bridges(jax.random.PRNGKey(1), batch)
    B, N = batch.target_continuous.shape[:2]
    assert state.continuous.shape == (B, N, 3)
    assert state.discrete.shape == (B, N, 1)
    heads = model.forward(params, state, batch)
    assert heads.continuous.shape == (B, N, 3)
    assert heads.discrete.shape == (B, N, 8)


def test_loss_finite_and_grads(setup):
    cfg, model, params, batch = setup
    (loss, metrics), grads = jax.value_and_grad(model.loss_fn, has_aux=True)(
        params, jax.random.PRNGKey(2), batch
    )
    assert np.isfinite(float(loss))
    # every leaf gets a finite gradient
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # loss-weight gradient flows (learnable multihead loss)
    assert np.abs(np.asarray(grads["loss_weights"])).sum() > 0


def test_simulate_dynamics_smoke(setup):
    cfg, model, params, batch = setup
    final = model.predict(params, batch, jax.random.PRNGKey(3))
    B, N = batch.target_continuous.shape[:2]
    assert final.continuous.shape == (B, N, 3)
    assert np.isfinite(np.asarray(final.continuous)).all()
    tokens = np.asarray(final.discrete)
    assert (tokens >= 0).all() and (tokens < 8).all()
    # continuous output masked by source mask
    mask = np.asarray(batch.source_mask)
    assert (np.asarray(final.continuous) * (1 - mask) == 0).all()


def test_sampler_is_jittable(setup):
    cfg, model, params, batch = setup
    jitted = jax.jit(model.predict)
    out = jitted(params, batch, jax.random.PRNGKey(4))
    assert np.isfinite(np.asarray(out.continuous)).all()


def test_schrodinger_bridge_dispatch():
    """config.bridge.continuous='SchrodingerBridge' builds and samples
    (the reference defines it but never wires it — SURVEY §2.3)."""
    cfg = MultimodalBridgeMatchingConfig.from_yaml(CONFIG_PATH)
    cfg.data.batch_size = 8
    cfg.data.max_num_particles = 16
    cfg.bridge.num_timesteps = 5
    cfg.bridge.continuous = "SchrodingerBridge"
    cfg.bridge.sigma = 0.1
    batch = _jnp_batch(JetsDataloaderModule.random_databatch(cfg))
    model = MultiModalBridgeMatching(cfg)
    from multimodal_particles_tpu.models.generative.bridges import SchrodingerBridge

    assert isinstance(model.bridge_continuous, SchrodingerBridge)
    params = model.init(jax.random.PRNGKey(0), batch)
    loss, _ = model.loss_fn(params, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(loss))
    final = model.predict(params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(final.continuous)).all()
