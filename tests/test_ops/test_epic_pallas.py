"""Parity test: fused Pallas EPiC forward vs the flax module stack."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_particles_tpu import test_resources_dir
from multimodal_particles_tpu.config_classes import MultimodalBridgeMatchingConfig
from multimodal_particles_tpu.models.generative.multimodal_bridge_matching import (
    MultiModalBridgeMatching,
)
from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
    JetsDataloaderModule,
)
from multimodal_particles_tpu.models.generative.states import HybridState
from multimodal_particles_tpu.ops.epic_pallas import (
    epic_forward_pallas,
    mbm_pallas_supported,
    pack_mbm_encoder_params,
)

CONFIG_PATH = os.path.join(test_resources_dir, "configs_files", "config-mbm-test.yaml")


@pytest.mark.parametrize("B,N", [(8, 16), (4, 128)])
def test_pallas_matches_flax(B, N):
    cfg = MultimodalBridgeMatchingConfig.from_yaml(CONFIG_PATH)
    cfg.data.batch_size = B
    cfg.data.max_num_particles = N
    # the TPU-lowering gate requires N % 128 == 0; interpret mode (this
    # test) runs any N
    assert mbm_pallas_supported(cfg) == (N % 128 == 0)

    batch = jax.tree_util.tree_map(
        jnp.asarray, JetsDataloaderModule.random_databatch(cfg)
    )
    model = MultiModalBridgeMatching(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)

    key = jax.random.PRNGKey(1)
    t = jax.random.uniform(key, (B, 1, 1))
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, N, 3))
    k = jax.random.randint(jax.random.fold_in(key, 2), (B, N, 1), 0, 8)
    mask = jax.random.randint(jax.random.fold_in(key, 3), (B, N, 1), 0, 2).astype(
        jnp.float32
    )

    state = HybridState(time=t, continuous=x, discrete=k, absorbing=mask)
    heads = model.forward(params, state, batch)
    flax_out = jnp.concatenate([heads.continuous, heads.discrete], axis=-1)

    packed = pack_mbm_encoder_params(params["encoder"], cfg.encoder.num_blocks)
    pallas_out = epic_forward_pallas(
        packed, t, x, k, mask,
        num_blocks=cfg.encoder.num_blocks,
        use_skip=cfg.encoder.skip_connection,
        add_discrete_head=cfg.encoder.add_discrete_head,
        dim_c=cfg.data.dim_features_continuous,
        vocab=cfg.data.vocab_size_features,
        hidden=cfg.encoder.dim_hidden_local,
        dim_emb_time=cfg.encoder.dim_emb_time,
        interpret=True,  # CPU test environment
    )
    np.testing.assert_allclose(
        np.asarray(pallas_out), np.asarray(flax_out), atol=2e-4, rtol=2e-4
    )
