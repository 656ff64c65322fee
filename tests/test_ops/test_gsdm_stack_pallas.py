"""Parity: the generic fused gsdm stack kernel (interpret mode) vs the flax
ResnetBlock/AttnBlock stack it replaces in the transdimensional heads."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_particles_tpu.models.architectures.gsdm import (
    AttnBlock,
    ResnetBlock,
)
from multimodal_particles_tpu.ops.gsdm_stack_pallas import (
    gsdm_stack_pallas,
    pack_gsdm_stack_params,
    stack_time_embeddings,
)

C = 128
N_BLOCKS = 2
N_HEADS = 2


class _Stack(nn.Module):
    """proj_in → n × (ResnetBlock, AttnBlock): the transdim head pattern
    (transdimensional_model.py rate/creation heads)."""

    @nn.compact
    def __call__(self, x_in, temb):
        h = nn.Dense(C, name="proj_in")(x_in)
        for i in range(N_BLOCKS):
            h = ResnetBlock(
                channels=C, dropout=0.0, temb_channels=C, name=f"res_{i}"
            )(h, temb)
            h = AttnBlock(C, N_HEADS, name=f"attn_{i}")(h)
        return h


@pytest.mark.parametrize("N,B", [(128, 4), (40, 4), (40, 7)])
def test_fused_stack_matches_flax(N, B):
    # B=7: odd batch not divisible by the jet tile — the kernel must pad
    # jets up to a sublane-valid tile multiple (regression: generation with
    # a tiled template batch of 1036 jets hit an invalid (4, C) block)
    Din = 27
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x_in = jax.random.normal(k1, (B, N, Din))
    temb = jax.random.normal(k2, (B, C))

    module = _Stack()
    params = module.init(k3, x_in, temb)["params"]
    expected = module.apply({"params": params}, x_in, temb)

    packed = pack_gsdm_stack_params(
        params["proj_in"],
        [params[f"res_{i}"] for i in range(N_BLOCKS)],
        [params[f"attn_{i}"] for i in range(N_BLOCKS)],
    )
    tembs = stack_time_embeddings(
        temb, [params[f"res_{i}"] for i in range(N_BLOCKS)]
    )
    got = gsdm_stack_pallas(
        packed,
        tembs,
        x_in,
        n_blocks=N_BLOCKS,
        n_heads=N_HEADS,
        transformer_dim=C,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4)
