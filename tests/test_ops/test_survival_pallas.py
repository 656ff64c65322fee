"""Parity of the fused survival-head kernel vs the flax AbsorbingGenerator
head (which is itself torch-parity-tested in tests/test_parity_reference.py).

Runs in Pallas interpret mode on CPU; the same kernel compiles via Mosaic on
TPU (exercised by bench.py --model absorbing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_particles_tpu.config_classes import AbsorbingConfig
from multimodal_particles_tpu.models.generative.absorbing.absorbing_flows import (
    AbsorbingFlow,
)
from multimodal_particles_tpu.models.generative.states import AbsorbingBridgeState
from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
    JetsDataloaderModule,
)
from multimodal_particles_tpu.ops.survival_pallas import (
    pack_survival_head_params,
    project_time_embeddings,
    survival_head_pallas,
    survival_pallas_supported,
)


@pytest.mark.parametrize("N,B", [(109, 8), (128, 8), (109, 7)])
def test_survival_head_kernel_parity(N, B):
    """Kernel output matches the flax absorbing head at both the reference
    N=109 (non-lane-multiple) and N=128, and at a batch size that is not a
    jet-tile multiple (jets padded inside the kernel wrapper)."""
    config = AbsorbingConfig()
    config.data.batch_size = B
    config.data.max_num_particles = N
    assert survival_pallas_supported(config)

    model = AbsorbingFlow(config)
    batch = jax.tree_util.tree_map(
        jnp.asarray, JetsDataloaderModule.random_databatch(config)
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    gen_params = params["generator"]

    rng = np.random.default_rng(3)
    B = config.data.batch_size
    t = jnp.asarray(rng.uniform(0.05, 0.95, (B, 1, 1)), jnp.float32)
    state = AbsorbingBridgeState(
        time=t,
        continuous=jnp.asarray(batch.source_continuous, jnp.float32),
        discrete=jnp.asarray(batch.source_discrete),
        mask_t=jnp.asarray(batch.source_mask, jnp.int32),
    )

    # flax oracle: full generator forward → absorbing head
    heads = model.generator.apply({"params": gen_params}, state, batch)

    # kernel path: trunk hidden from the flax trunk, head via Pallas
    net_out, last = model.generator.apply(
        {"params": gen_params},
        state.time,
        state.continuous,
        state.discrete,
        state.mask_t.astype(jnp.float32),
        None,
        None,
        True,
        method=lambda m, *a: m.epic(*a),
    )
    gen_cfg = config.generator
    packed = pack_survival_head_params(gen_params, gen_cfg.n_attn_blocks)
    temb_proj = project_time_embeddings(
        gen_params, state.time, gen_cfg.n_attn_blocks, gen_cfg.transformer_dim
    )
    logits = survival_head_pallas(
        packed,
        temb_proj,
        last,
        state.mask_t,
        n_blocks=gen_cfg.n_attn_blocks,
        n_heads=gen_cfg.n_heads,
        transformer_dim=gen_cfg.transformer_dim,
        interpret=jax.default_backend() == "cpu",
    )

    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(heads.absorbing), rtol=2e-4, atol=2e-4
    )


def test_survival_gate():
    config = AbsorbingConfig()
    assert survival_pallas_supported(config)
    config.generator.transformer_dim = 96  # not a lane multiple
    assert not survival_pallas_supported(config)


@pytest.mark.parametrize("N", [109, 128])
def test_forward_sampling_full_parity(N):
    """forward_sampling (fused trunk via jet padding + fused survival head)
    matches the flax forward at reference N=109 and lane-aligned N=128."""
    config = AbsorbingConfig()
    config.data.batch_size = 8
    config.data.max_num_particles = N
    config.parallel.use_pallas = True  # force the kernels (interpret on CPU)

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

    np.testing.assert_allclose(
        np.asarray(fused.continuous), np.asarray(flax_heads.continuous),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(fused.discrete), np.asarray(flax_heads.discrete),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(fused.absorbing), np.asarray(flax_heads.absorbing),
        rtol=2e-4, atol=2e-4,
    )
