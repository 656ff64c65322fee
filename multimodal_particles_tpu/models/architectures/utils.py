"""Embedding layer and small building blocks for the particle-cloud backbones.

JAX re-design of the reference input embeddings (reference:
models/architectures/utils.py:6-198). All modules are flax.linen; shapes are
static and masking is multiplicative so the whole stack jits cleanly.
"""

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_positional_encoding(timesteps, dim, max_period=10000.0):
    """Log-spaced frequency time encoding.

    Args:
      timesteps: (B,) or (B, 1) float times.
    Returns:
      (B, dim) embedding [cos | sin] (cos first, matching the reference
      reference: architectures/utils.py:175-198).
    """
    t = timesteps.reshape(timesteps.shape[0])  # (B,)
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    # keep the caller's compute dtype (bf16 path)
    if jnp.issubdtype(timesteps.dtype, jnp.floating):
        emb = emb.astype(timesteps.dtype)
    return emb


def get_timestep_embedding(timesteps, embedding_dim, max_timesteps=10000.0):
    """DDPM-style sinusoidal embedding, [sin | cos] ordering with the
    (half_dim - 1) frequency denominator (reference: architectures/gsdm.py:8-26)."""
    half_dim = embedding_dim // 2
    emb_scale = math.log(max_timesteps) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb_scale)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    if jnp.issubdtype(timesteps.dtype, jnp.floating):
        emb = emb.astype(timesteps.dtype)
    return emb


class WeightNormDense(nn.Module):
    """Dense layer with weight normalization: W = g · v / ||v||, with the norm
    taken per output unit (the torch `weight_norm(nn.Linear)` convention used
    throughout the reference EPiC stack, e.g. architectures/epic.py:134,171-176).
    """

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        v = self.param(
            "v",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
            jnp.float32,
        )
        # g initialized to ||v|| so the layer starts as a plain Dense
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(v, axis=0),
            (self.features,),
        )
        v_norm = jnp.linalg.norm(v, axis=0, keepdims=True)
        kernel = (g[None, :] / jnp.maximum(v_norm, 1e-12)) * v
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
            x = x.astype(self.dtype)
        y = x @ kernel
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + (b.astype(y.dtype) if self.dtype is not None else b)
        return y


class InputEmbeddings(nn.Module):
    """Config-switched per-particle and context embeddings.

    Concatenates per-particle features [t_emb, x_emb, k_emb] (masked) and a
    global context [t_emb, ctx_cont_emb, ctx_disc_emb]
    (reference: architectures/utils.py:112-172).
    """

    config: object  # MultimodalBridgeMatchingConfig-compatible

    @nn.compact
    def __call__(self, t, x, k, mask=None, context_continuous=None, context_discrete=None):
        cfg_d = self.config.data
        cfg_e = self.config.encoder

        dim_emb_time = cfg_e.dim_emb_time
        dim_emb_cont = cfg_e.dim_emb_features_continuous or cfg_d.dim_features_continuous
        dim_emb_disc = cfg_e.dim_emb_features_discrete
        dim_emb_ctx_cont = cfg_e.dim_emb_context_continuous or cfg_d.dim_context_continuous
        dim_emb_ctx_disc = cfg_e.dim_emb_context_discrete

        B, N = x.shape[0], x.shape[1]

        # ...time
        t_flat = t.reshape(B, -1)[:, :1]  # (B, 1)
        if cfg_e.embedding_time == "SinusoidalPositionalEncoding":
            t_emb = sinusoidal_positional_encoding(t_flat, dim_emb_time)
        elif cfg_e.embedding_time == "Linear":
            t_emb = nn.Dense(dim_emb_time, name="embedding_time")(t_flat)
        else:
            raise NotImplementedError(
                f"Time embedding {cfg_e.embedding_time!r} not implemented"
            )
        t_context_emb = t_emb  # (B, dim_emb_time)
        t_local_emb = jnp.broadcast_to(t_emb[:, None, :], (B, N, dim_emb_time))

        features = [t_local_emb]
        context = [t_context_emb]

        # ...continuous features
        if dim_emb_cont:
            if cfg_e.embedding_features_continuous == "Linear":
                x_emb = nn.Dense(dim_emb_cont, name="embedding_continuous")(x)
            elif cfg_e.embedding_features_continuous is None:
                x_emb = x
            else:
                raise NotImplementedError(
                    f"Continuous embedding {cfg_e.embedding_features_continuous!r}"
                )
            features.append(x_emb)

        # ...discrete features
        if cfg_d.dim_features_discrete:
            if cfg_e.embedding_features_discrete == "Embedding":
                k_tokens = k.reshape(B, N).astype(jnp.int32)
                k_emb = nn.Embed(
                    cfg_d.vocab_size_features, dim_emb_disc, name="embedding_discrete"
                )(k_tokens)
            elif cfg_e.embedding_features_discrete == "Linear":
                k_emb = nn.Dense(dim_emb_disc, name="embedding_discrete")(
                    k.astype(jnp.float32)
                )
            else:
                raise NotImplementedError(
                    f"Discrete embedding {cfg_e.embedding_features_discrete!r}"
                )
            features.append(k_emb)

        # ...context
        if cfg_d.dim_context_continuous:
            ctx_emb = nn.Dense(dim_emb_ctx_cont, name="embedding_continuous_context")(
                context_continuous
            )
            context.append(ctx_emb)

        if cfg_d.dim_context_discrete:
            ctx_tokens = context_discrete.reshape(B, -1).astype(jnp.int32)
            ctx_emb = nn.Embed(
                cfg_d.vocab_size_context,
                dim_emb_ctx_disc,
                name="embedding_context_discrete",
            )(ctx_tokens).reshape(B, -1)
            context.append(ctx_emb)

        features = jnp.concatenate(features, axis=-1)  # (B, N, dim_local)
        context = jnp.concatenate(context, axis=-1)  # (B, dim_context)
        if mask is not None:
            features = features * mask
        return features, context
