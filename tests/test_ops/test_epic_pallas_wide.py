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


def test_wide_transdim_trunk_matches_flax():
    """Fold-discrete (Linear-embedding) wide trunk: the transdimensional
    _network_fused at scaled widths must reproduce the flax network."""
    from multimodal_particles_tpu.config_classes.transdimensional_unconditional_config import (
        TransdimensionalEpicConfig,
    )
    from multimodal_particles_tpu.models.generative.transdimensional import (
        TransdimensionalJumpDiffusion,
    )
    from multimodal_particles_tpu.models.generative.transdimensional.structure import (
        StructuredState,
    )

    cfg = TransdimensionalEpicConfig()
    cfg.data.return_type = "list"
    cfg.data.max_num_particles = 24
    cfg.encoder.num_blocks = 2
    cfg.encoder.dim_hidden_local = 128
    cfg.encoder.dim_hidden_glob = 128
    cfg.encoder.dim_emb_time = 128
    cfg.encoder.dim_emb_features_continuous = 128
    cfg.encoder.dim_emb_features_discrete = 128
    assert wide_pallas_supported(cfg, allow_linear_discrete=True)
    model = TransdimensionalJumpDiffusion(cfg)

    B, N = 2, cfg.data.max_num_particles
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    dims = jnp.asarray([5, 17], jnp.int32)
    state = StructuredState(
        continuous=jax.random.normal(k1, (B, N, 3)),
        discrete=jax.random.normal(k2, (B, N, 8)),
        dims=dims,
    ).delete_dims(dims)
    params = model.init(k3, state)
    ts = jnp.asarray([0.3, 0.8])
    nearest = jnp.asarray([1, 4], jnp.int32)

    expected = model.network.apply(
        {"params": params["network"]}, state, ts, nearest, False, None
    )
    got = model._network_fused(
        params["network"], state, ts, nearest, False, None, interpret=True
    )
    names = ("D_xt", "rate_emb", "near_logits", "auto_mean", "auto_std", "nearest")
    for name, e, g in zip(names, expected, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(e), atol=5e-4, err_msg=name
        )


def test_wide_absorbing_trunk_matches_flax():
    """The absorbing forward_sampling at scaled widths routes the trunk
    through the wide kernel and must match the flax forward."""
    from multimodal_particles_tpu.config_classes import AbsorbingConfig
    from multimodal_particles_tpu.models.generative.absorbing.absorbing_flows import (
        AbsorbingFlow,
    )
    from multimodal_particles_tpu.models.generative.states import (
        AbsorbingBridgeState,
    )

    config = AbsorbingConfig()
    config.data.batch_size = 4
    config.data.max_num_particles = 24
    config.encoder.num_blocks = 2
    config.encoder.dim_hidden_local = 128
    config.encoder.dim_hidden_glob = 128
    config.encoder.dim_emb_time = 128
    config.encoder.dim_emb_features_continuous = 128
    config.encoder.dim_emb_features_discrete = 128
    config.parallel.use_pallas = True  # force the kernels (interpret on CPU)
    assert wide_pallas_supported(config)

    model = AbsorbingFlow(config)
    batch = jax.tree_util.tree_map(
        jnp.asarray, JetsDataloaderModule.random_databatch(config)
    )
    params = model.init(jax.random.PRNGKey(0), batch)

    rng = np.random.default_rng(7)
    B = config.data.batch_size
    state = AbsorbingBridgeState(
        time=jnp.asarray(rng.uniform(0.05, 0.95, (B, 1, 1)), jnp.float32),
        continuous=jnp.asarray(batch.source_continuous, jnp.float32),
        discrete=jnp.asarray(batch.source_discrete),
        mask_t=jnp.asarray(batch.source_mask, jnp.int32),
    )

    fused = model.forward_sampling(params, state, batch)
    flax_heads = model.forward(params, state, batch)
    for field in ("continuous", "discrete", "absorbing"):
        np.testing.assert_allclose(
            np.asarray(getattr(fused, field)),
            np.asarray(getattr(flax_heads, field)),
            rtol=5e-4, atol=5e-4, err_msg=field,
        )
