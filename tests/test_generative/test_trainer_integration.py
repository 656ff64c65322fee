"""Trainer integration across all three model families on the 8-device CPU
mesh (tiny shapes): loss decreases and sampling runs through Trainer.predict."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_particles_tpu.config_classes import (
    AbsorbingConfig,
    MultimodalBridgeMatchingConfig,
)
from multimodal_particles_tpu.config_classes.transdimensional_unconditional_config import (
    TransdimensionalEpicConfig,
)
from multimodal_particles_tpu.data.particle_clouds.jets import JetDataclass
from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
    JetsDataloaderModule,
)
from multimodal_particles_tpu.models.generative.absorbing.absorbing_flows import (
    AbsorbingFlow,
)
from multimodal_particles_tpu.models.generative.multimodal_bridge_matching import (
    MultiModalBridgeMatching,
)
from multimodal_particles_tpu.models.generative.transdimensional import (
    TransdimensionalJumpDiffusion,
)
from multimodal_particles_tpu.training.trainer import Trainer


def _fit_two_epochs(cfg, model, dm):
    trainer = Trainer(model, cfg)
    history = trainer.fit(dm, epochs=2)
    assert len(history) == 2
    assert history[1]["train_loss"] < history[0]["train_loss"]
    outs = trainer.predict(dm)
    assert len(outs) >= 1
    return trainer, outs


def test_absorbing_through_trainer():
    cfg = AbsorbingConfig.from_yaml(
        "tests/resources/configs_files/config-absorbing-test.yaml"
    )
    cfg.data.num_jets = 100
    cfg.data.max_num_particles = 16
    cfg.data.batch_size = 16
    cfg.bridge.num_timesteps = 4
    cfg.generator.transformer_dim = 32
    cfg.generator.n_attn_blocks = 1
    jets = JetDataclass(cfg)
    jets.preprocess()
    dm = JetsDataloaderModule(cfg, jets)
    model = AbsorbingFlow(cfg)
    trainer, outs = _fit_two_epochs(cfg, model, dm)
    final = outs[0]
    assert np.isfinite(np.asarray(final.continuous)).all()
    # generated masks are binary and not all-dead
    m = np.asarray(final.mask_t)
    assert ((m == 0) | (m == 1)).all()
    assert m.sum() > 0


def test_transdimensional_through_trainer():
    cfg = TransdimensionalEpicConfig()
    cfg.data.return_type = "list"
    cfg.data.num_jets = 100
    cfg.data.max_num_particles = 16
    cfg.data.batch_size = 16
    cfg.encoder.transformer_dim = 32
    cfg.encoder.n_attn_blocks = 1
    cfg.sampler_kwargs.dt = 0.25  # 4-step sampler
    jets = JetDataclass(config=cfg)
    jets.preprocess()
    dm = JetsDataloaderModule(config=cfg, jetdataset=jets)
    model = TransdimensionalJumpDiffusion(cfg, dm)
    trainer, outs = _fit_two_epochs(cfg, model, dm)
    final = outs[0]
    d = np.asarray(final.dims)
    assert (d >= 1).all() and (d <= 16).all()
