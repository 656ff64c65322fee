"""EPiC (Equivariant Point Cloud) backbone in flax.

Permutation-equivariant deep-sets stack with masked mean+sum pooling and
local/global cross-updates, re-designed from the reference EPiC network
(reference: models/architectures/epic.py:10-241; itself based on EPiC-GAN).

TPU notes:
  * all matmuls are (B·N, d) × (d, h) batched GEMMs that tile onto the MXU;
  * pooling is a masked reduction over the particle axis N — XLA fuses it
    with the surrounding elementwise ops;
  * masking is multiplicative with static shapes (no ragged tensors);
  * a fused Pallas kernel for the (pool → global MLP → broadcast → local MLP)
    inner loop lives in ops/epic_pallas.py and is used on the sampling hot
    path when shapes allow.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from multimodal_particles_tpu.models.architectures.utils import (
    InputEmbeddings,
    WeightNormDense,
)


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=0.01)


def meansum_pool(mask, x_local, *x_global):
    """Masked mean+sum pooling of local features, concatenated with globals.

    Guards against fully-masked clouds (the reference divides by mask.sum and
    NaNs on empty clouds — epic.py:140-141; not replicated).
    """
    x_sum = jnp.sum(x_local * mask, axis=1)  # (B, d)
    denom = jnp.maximum(jnp.sum(mask, axis=1), 1.0)  # (B, 1)
    x_mean = x_sum / denom
    return jnp.concatenate([x_mean, x_sum, *x_global], axis=1)


class EPiCProjection(nn.Module):
    """Input projection: local lift + pooled global init
    (reference: epic.py:164-191)."""

    dim_hidden_local: int
    dim_hidden_global: int

    @nn.compact
    def __call__(self, x_local, x_global, mask):
        x_local = leaky_relu(WeightNormDense(self.dim_hidden_local, name="local_0")(x_local))
        pooled = meansum_pool(mask, x_local, x_global)
        h = leaky_relu(WeightNormDense(self.dim_hidden_local, name="global_0")(pooled))
        h = leaky_relu(WeightNormDense(self.dim_hidden_local, name="global_1")(h))
        x_global = leaky_relu(WeightNormDense(self.dim_hidden_global, name="global_2")(h))
        return x_local * mask, x_global


class EPiCLayer(nn.Module):
    """One local/global cross-update block with residuals
    (reference: epic.py:193-241)."""

    dim_local: int
    dim_global: int
    dim_hidden: int

    @nn.compact
    def __call__(self, x_local, x_global, context, mask):
        B, N = x_local.shape[0], x_local.shape[1]

        # global update: pool(local) ⊕ global ⊕ context → MLP → residual
        pooled = meansum_pool(mask, x_local, x_global, context)
        g1 = leaky_relu(WeightNormDense(self.dim_hidden, name="fc_global1")(pooled))
        x_global = leaky_relu(
            WeightNormDense(self.dim_global, name="fc_global2")(g1) + x_global
        )

        # local update: local ⊕ broadcast(global) ⊕ broadcast(context) → MLP → residual
        g2l = jnp.broadcast_to(x_global[:, None, :], (B, N, x_global.shape[-1]))
        c2l = jnp.broadcast_to(context[:, None, :], (B, N, context.shape[-1]))
        h = jnp.concatenate([x_local, g2l, c2l], axis=-1)
        l1 = leaky_relu(WeightNormDense(self.dim_hidden, name="fc_local1")(h))
        x_local = leaky_relu(
            WeightNormDense(self.dim_local, name="fc_local2")(l1) + x_local
        )
        return x_local * mask, x_global


class EPiCNetwork(nn.Module):
    """Projection + num_blocks EPiC layers + weight-normed output
    (reference: epic.py:93-162)."""

    dim_output: int = 3
    num_blocks: int = 6
    dim_hidden_local: int = 128
    dim_hidden_global: int = 10
    use_skip_connection: bool = False

    @nn.compact
    def __call__(self, x_local, context=None, mask=None, output_hidden_local=False):
        x_local, x_global = EPiCProjection(
            dim_hidden_local=self.dim_hidden_local,
            dim_hidden_global=self.dim_hidden_global,
            name="epic_proj",
        )(x_local, context, mask)

        x_local_skip = x_local if self.use_skip_connection else 0.0
        x_global_skip = x_global if self.use_skip_connection else 0.0

        for i in range(self.num_blocks):
            x_local, x_global = EPiCLayer(
                dim_local=self.dim_hidden_local,
                dim_global=self.dim_hidden_global,
                dim_hidden=self.dim_hidden_local,
                name=f"epic_layer_{i}",
            )(x_local, x_global, context, mask)
            x_local = x_local + x_local_skip
            x_global = x_global + x_global_skip

        h = WeightNormDense(self.dim_output, name="output_layer")(x_local)
        if output_hidden_local:
            return h * mask, x_local
        return h * mask


class EPiCWrapper(nn.Module):
    """Embeds (t, x, k, context) then runs the EPiC network
    (reference: epic.py:10-91)."""

    config: object

    def setup(self):
        cfg_d = self.config.data
        cfg_e = self.config.encoder
        self.embedding = InputEmbeddings(self.config, name="embedding")
        self.epic = EPiCNetwork(
            dim_output=cfg_d.dim_features_continuous
            + cfg_d.dim_features_discrete * cfg_d.vocab_size_features,
            num_blocks=cfg_e.num_blocks,
            dim_hidden_local=cfg_e.dim_hidden_local,
            dim_hidden_global=cfg_e.dim_hidden_glob,
            use_skip_connection=cfg_e.skip_connection,
            name="epic",
        )

    def __call__(
        self,
        t,
        x,
        k=None,
        mask=None,
        context_continuous=None,
        context_discrete=None,
        output_hidden_local=False,
    ):
        x_local_emb, context_emb = self.embedding(
            t, x, k, mask, context_continuous, context_discrete
        )
        return self.epic(x_local_emb, context_emb, mask, output_hidden_local)
