"""Parity test: wide-hidden row-major Pallas EPiC forward vs the flax
stack at the `--scaled` backbone widths (ops/epic_pallas_wide.py)."""

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
from multimodal_particles_tpu.models.generative.states import HybridState
from multimodal_particles_tpu.ops.epic_pallas import mbm_pallas_supported
from multimodal_particles_tpu.ops.epic_pallas_wide import (
    epic_forward_pallas_wide,
    pack_wide_encoder_params,
    wide_pallas_supported,
)

CONFIG_PATH = os.path.join(test_resources_dir, "configs_files", "config-mbm-test.yaml")


def _scaled_config(B, N):
    """The bench.py --scaled backbone: every feature width 128."""
    cfg = MultimodalBridgeMatchingConfig.from_yaml(CONFIG_PATH)
    cfg.data.batch_size = B
    cfg.data.max_num_particles = N
    cfg.encoder.num_blocks = 2  # keep the CPU interpret run cheap
    cfg.encoder.dim_hidden_local = 128
    cfg.encoder.dim_hidden_glob = 128
    cfg.encoder.dim_emb_time = 128
    cfg.encoder.dim_emb_features_continuous = 128
    cfg.encoder.dim_emb_features_discrete = 128
    return cfg


@pytest.mark.parametrize("B,N", [(2, 128), (3, 40)])
def test_wide_pallas_matches_flax(B, N):
    cfg = _scaled_config(B, N)
    # the wide gate covers exactly the regime the narrow kernel refuses
    assert wide_pallas_supported(cfg)
    assert not mbm_pallas_supported(cfg)

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

    packed = pack_wide_encoder_params(params["encoder"], cfg.encoder.num_blocks)
    pallas_out = epic_forward_pallas_wide(
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


def test_wide_gate_rejects_narrow_config():
    cfg = MultimodalBridgeMatchingConfig.from_yaml(CONFIG_PATH)
    assert not wide_pallas_supported(cfg)  # hidden 16-ish: narrow regime
