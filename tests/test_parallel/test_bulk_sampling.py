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
