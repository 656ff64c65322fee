"""Bulk-sampling driver test on the 8-device CPU mesh."""

import os

import jax
import numpy as np

from multimodal_particles_tpu import test_resources_dir
from multimodal_particles_tpu.config_classes import MultimodalBridgeMatchingConfig
from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
    JetsDataloaderModule,
)
from multimodal_particles_tpu.models.generative.multimodal_bridge_matching import (
    MultiModalBridgeMatching,
)
from multimodal_particles_tpu.parallel.bulk_sampling import bulk_sample

CONFIG_PATH = os.path.join(test_resources_dir, "configs_files", "config-mbm-test.yaml")


def test_bulk_sample_counts_and_shapes():
    cfg = MultimodalBridgeMatchingConfig.from_yaml(CONFIG_PATH)
    cfg.data.batch_size = 16
    cfg.data.max_num_particles = 16
    cfg.bridge.num_timesteps = 5
    import jax.numpy as jnp

    batch = jax.tree_util.tree_map(
        jnp.asarray, JetsDataloaderModule.random_databatch(cfg)
    )
    model = MultiModalBridgeMatching(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)

    result, stats = bulk_sample(
        model, params, cfg, num_jets=40, batch_size=16, seed=1
    )
    assert stats["num_jets"] == 40
    assert result["continuous"].shape == (40, 16, 3)
    assert result["discrete"].shape == (40, 16, 1)
    assert np.isfinite(result["continuous"]).all()
    assert stats["jets_per_sec"] > 0

def test_bulk_sample_transdimensional():
    """bulk_sample drives the transdimensional family too: the source is a
    shapes-only template (the jump sampler starts from dims=1, x~N(0,I))
    and the collected output converts dims to masks and one-hot channels
    to tokens."""
    import jax.numpy as jnp

    from multimodal_particles_tpu.config_classes.transdimensional_unconditional_config import (
        TransdimensionalEpicConfig,
    )
    from multimodal_particles_tpu.models.generative.transdimensional import (
        TransdimensionalJumpDiffusion,
    )

    cfg = TransdimensionalEpicConfig()
    cfg.data.batch_size = 8
    cfg.data.max_num_particles = 16
    cfg.encoder.transformer_dim = 32
    cfg.encoder.n_attn_blocks = 1
    cfg.sampler_kwargs.dt = 0.1  # 10-step sampler

    model = TransdimensionalJumpDiffusion(cfg)
    rng = np.random.default_rng(0)
    batch = [
        jnp.asarray(rng.integers(1, 17, 8)),
        jnp.asarray(rng.standard_normal((8, 16, 3)), jnp.float32),
        jnp.asarray(np.eye(8, dtype=np.float32)[rng.integers(0, 8, (8, 16))]),
    ]
    params = model.init(jax.random.PRNGKey(0), batch)

    result, stats = bulk_sample(
        model, params, cfg, num_jets=20, batch_size=8, seed=2
    )
    assert stats["num_jets"] == 20
    assert result["continuous"].shape == (20, 16, 3)
    assert result["discrete"].shape == (20, 16, 1)
    assert result["mask"].shape == (20, 16, 1)
    # mask rows match the generated dims (>= 1 live particle per jet)
    m = result["mask"][..., 0].sum(1)
    assert (m >= 1).all() and (m <= 16).all()
    assert np.isfinite(result["continuous"]).all()
