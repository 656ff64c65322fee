"""MultiModalBridgeMatching (MBM): hybrid continuous flow-matching bridge +
discrete telegraph (CTMC) bridge over fixed-mask particle clouds.

TPU-native re-design of the reference Lightning module (reference:
models/generative/multimodal_bridge_matching.py:77-269):

  * the model is a plain Python object holding flax modules and static bridge
    dataclasses; parameters live in one pytree (encoder weights + learnable
    multi-head loss log-variances);
  * training is a pure `loss_fn(params, key, batch)` suitable for
    `jax.value_and_grad` under `jit`/`shard_map`;
  * generation (`simulate_dynamics`) is a `lax.scan` over the time grid with
    the EPiC forward as the scanned body — 100 sampler steps compile to one
    XLA program, vmappable/shardable over the batch axis.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_particles_tpu.models.architectures.epic import EPiCWrapper
from multimodal_particles_tpu.models.generative.bridges import (
    LinearUniformBridge,
    SchrodingerBridge,
    TelegraphBridge,
)
from multimodal_particles_tpu.models.generative.states import (
    HybridState,
    MultiHeadOutput,
)
from multimodal_particles_tpu.utils.losses import multihead_loss

CONTINUOUS_BRIDGES = {
    "LinearUniformBridge": LinearUniformBridge,
    "SchrodingerBridge": SchrodingerBridge,
}


class MultiModalEPiC(nn.Module):
    """EPiC trunk + per-modality output heads (reference:
    multimodal_bridge_matching.py:77-113).

    The absorbing head passes the input mask through unchanged; MBM evolves a
    fixed mask (the reference marks this with a TODO at :108 — the mask
    *generating* model is AbsorbingFlow)."""

    config: object

    def setup(self):
        cfg_d = self.config.data
        self.dim_features_continuous = cfg_d.dim_features_continuous
        self.dim_discrete_out = cfg_d.dim_features_discrete * cfg_d.vocab_size_features
        self.epic = EPiCWrapper(self.config, name="epic")
        if self.config.encoder.add_discrete_head:
            self.fc_layer = nn.Sequential(
                [
                    nn.Dense(self.dim_discrete_out),
                    nn.selu,
                    nn.Dense(self.dim_discrete_out),
                ]
            )

    def __call__(self, t, x, k, mask=None, context_continuous=None, context_discrete=None):
        h = self.epic(t, x, k, mask, context_continuous, context_discrete)
        continuous_head = h[..., : self.dim_features_continuous]
        discrete_head = h[..., self.dim_features_continuous :]
        absorbing_head = mask
        if self.config.encoder.add_discrete_head:
            discrete_head = self.fc_layer(discrete_head)
        return continuous_head, discrete_head, absorbing_head


class MultiModalBridgeMatching:
    """Hybrid bridge-matching model for fixed-cardinality particle clouds."""

    num_heads = 2  # continuous + discrete

    def __init__(self, config):
        self.config = config
        self.vocab_size = config.data.vocab_size_features
        self.encoder = MultiModalEPiC(config)
        self.bridge_continuous = CONTINUOUS_BRIDGES[config.bridge.continuous].from_config(config)
        self.bridge_discrete = TelegraphBridge.from_config(config)
        self.bridge_absorbing = None  # mask is fixed in MBM

    # ----------------------------------------------------------------- params

    def init(self, key, batch):
        """Initialize the full parameter pytree from one example batch."""
        state = HybridState(
            time=jnp.zeros((batch.target_continuous.shape[0], 1, 1)),
            continuous=batch.source_continuous,
            discrete=batch.source_discrete,
            absorbing=batch.source_mask.astype(jnp.float32),
        )
        encoder_params = self.encoder.init(
            key,
            state.time,
            state.continuous,
            state.discrete,
            state.absorbing,
            getattr(batch, "context_continuous", None),
            getattr(batch, "context_discrete", None),
        )["params"]
        return {
            "encoder": encoder_params,
            "loss_weights": jnp.zeros(self.num_heads),
        }

    # ---------------------------------------------------------------- forward

    def _pallas_enabled(self) -> bool:
        """Narrow fused tier (ops/epic_pallas.py + the whole-step sampler
        kernel): hidden ≤ 64 in the lane-layout regime."""
        from multimodal_particles_tpu.ops.epic_pallas import mbm_pallas_supported

        flag = getattr(getattr(self.config, "parallel", None), "use_pallas", "auto")
        if flag is False:
            return False
        supported = mbm_pallas_supported(self.config)
        if flag == "auto":
            return supported and jax.default_backend() != "cpu"
        return bool(flag) and supported

    def _wide_pallas_enabled(self) -> bool:
        """Wide fused tier (ops/epic_pallas_wide.py, row-major): every
        feature width a lane multiple — the --scaled backbone regime where
        the narrow kernel's VMEM footprint is pathological."""
        from multimodal_particles_tpu.ops.epic_pallas_wide import (
            wide_pallas_supported,
        )

        flag = getattr(getattr(self.config, "parallel", None), "use_pallas", "auto")
        if flag is False:
            return False
        supported = wide_pallas_supported(self.config)
        if flag == "auto":
            return supported and jax.default_backend() != "cpu"
        return bool(flag) and supported

    def _train_fused_fn(self):
        """Cached custom-VJP fused forward for the training path: the
        narrow lane-layout pair (ops/epic_pallas_vjp.py) at hidden ≤ 64,
        the wide row-major pair (ops/epic_pallas_wide_vjp.py) at
        lane-multiple widths."""
        if getattr(self, "_train_fused_cache", None) is None:
            if self._wide_pallas_enabled():
                from multimodal_particles_tpu.ops.epic_pallas_wide_vjp import (
                    make_epic_train_forward_wide as make_fn,
                )
            else:
                from multimodal_particles_tpu.ops.epic_pallas_vjp import (
                    make_epic_train_forward as make_fn,
                )

            cfg_d, cfg_e = self.config.data, self.config.encoder
            self._train_fused_cache = make_fn(
                num_blocks=cfg_e.num_blocks,
                use_skip=cfg_e.skip_connection,
                add_discrete_head=cfg_e.add_discrete_head,
                dim_c=cfg_d.dim_features_continuous,
                vocab=cfg_d.vocab_size_features,
                hidden=cfg_e.dim_hidden_local,
                dim_emb_time=cfg_e.dim_emb_time,
                interpret=jax.default_backend() == "cpu",
            )
        return self._train_fused_cache

    def forward_train(self, params, state: HybridState, batch) -> MultiHeadOutput:
        """Training-path forward: the fused Pallas kernel with its
        hand-written backward kernel when enabled, else the flax stack."""
        wide = self._wide_pallas_enabled()
        if not (self._pallas_enabled() or wide):
            return self.forward(params, state, batch)
        if wide:
            from multimodal_particles_tpu.ops.epic_pallas_wide import (
                pack_wide_encoder_params as pack_fn,
            )
        else:
            from multimodal_particles_tpu.ops.epic_pallas import (
                pack_mbm_encoder_params as pack_fn,
            )

        cfg_d, cfg_e = self.config.data, self.config.encoder
        packed = pack_fn(
            params["encoder"], cfg_e.num_blocks, cfg_d.dim_features_continuous
        )
        out = self._train_fused_fn()(
            packed, state.time, state.continuous, state.discrete, state.absorbing
        )
        dc = cfg_d.dim_features_continuous
        return MultiHeadOutput(out[..., :dc], out[..., dc:], state.absorbing)

    def forward_pallas(self, params, state: HybridState, batch) -> MultiHeadOutput:
        """Fused-kernel forward: one Pallas call runs the entire encoder;
        used on the sampling hot path. Narrow backbones use the lane-layout
        kernel (ops/epic_pallas.py), wide (--scaled) ones the row-major
        variant (ops/epic_pallas_wide.py)."""
        if self._wide_pallas_enabled():
            from multimodal_particles_tpu.ops.epic_pallas_wide import (
                epic_forward_pallas_wide as kernel_fn,
                pack_wide_encoder_params as pack_fn,
            )
        else:
            from multimodal_particles_tpu.ops.epic_pallas import (
                epic_forward_pallas as kernel_fn,
                pack_mbm_encoder_params as pack_fn,
            )

        cfg_d, cfg_e = self.config.data, self.config.encoder
        packed = pack_fn(
            params["encoder"], cfg_e.num_blocks, cfg_d.dim_features_continuous
        )
        out = kernel_fn(
            packed,
            state.time,
            state.continuous,
            state.discrete,
            state.absorbing,
            num_blocks=cfg_e.num_blocks,
            use_skip=cfg_e.skip_connection,
            add_discrete_head=cfg_e.add_discrete_head,
            dim_c=cfg_d.dim_features_continuous,
            vocab=cfg_d.vocab_size_features,
            hidden=cfg_e.dim_hidden_local,
            dim_emb_time=cfg_e.dim_emb_time,
            interpret=jax.default_backend() == "cpu",
        )
        dc = cfg_d.dim_features_continuous
        return MultiHeadOutput(out[..., :dc], out[..., dc:], state.absorbing)

    def forward(self, params, state: HybridState, batch) -> MultiHeadOutput:
        from multimodal_particles_tpu.utils.dtype import cast_floating, compute_dtype_of

        dtype = compute_dtype_of(self.config)
        enc_params = params["encoder"]
        t, x, mask = state.time, state.continuous, state.absorbing
        ctx_c = getattr(batch, "context_continuous", None)
        ctx_d = getattr(batch, "context_discrete", None)
        if dtype != jnp.float32:
            enc_params = cast_floating(enc_params, dtype)
            t, x, mask, ctx_c = cast_floating((t, x, mask, ctx_c), dtype)

        continuous, discrete, absorbing = self.encoder.apply(
            {"params": enc_params}, t, x, state.discrete, mask, ctx_c, ctx_d
        )
        if dtype != jnp.float32:
            continuous = continuous.astype(jnp.float32)
            discrete = discrete.astype(jnp.float32)
            absorbing = state.absorbing  # pass the original mask through
        return MultiHeadOutput(continuous, discrete, absorbing)

    # ---------------------------------------------------------------- bridges

    def sample_bridges(self, key, batch) -> HybridState:
        """Draw t ~ U(0,1) and the bridge states at t
        (reference: multimodal_bridge_matching.py:148-165)."""
        key_t, key_x, key_k = jax.random.split(key, 3)
        B = batch.target_continuous.shape[0]
        t = jax.random.uniform(key_t, (B,), dtype=batch.target_continuous.dtype)
        time = t.reshape(B, 1, 1)
        continuous = self.bridge_continuous.sample(
            key_x, time, batch.source_continuous, batch.target_continuous
        )
        discrete = self.bridge_discrete.sample(
            key_k, time, batch.source_discrete, batch.target_discrete
        )
        absorbing = batch.target_mask.astype(continuous.dtype)
        return HybridState(time, continuous, discrete, absorbing)

    # ----------------------------------------------------------------- losses

    def loss_continuous(self, heads: MultiHeadOutput, state: HybridState, batch):
        """Masked MSE against the conditional drift
        (reference: multimodal_bridge_matching.py:167-183)."""
        targets = self.bridge_continuous.drift(
            t=state.time,
            x=state.continuous,
            x0=batch.source_continuous,
            x1=batch.target_continuous,
        )
        mask = state.absorbing
        mse = (heads.continuous - targets) ** 2 * mask
        return jnp.sum(mse) / jnp.maximum(jnp.sum(mask), 1.0)

    def loss_discrete(self, heads: MultiHeadOutput, state: HybridState, batch):
        """Masked cross-entropy on target tokens
        (reference: multimodal_bridge_matching.py:185-197)."""
        logits = heads.discrete.reshape(-1, self.vocab_size)
        targets = batch.target_discrete.reshape(-1).astype(jnp.int32)
        mask = state.absorbing.reshape(-1)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(log_probs, targets[:, None], axis=-1)[:, 0]
        return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def loss_fn(self, params, key, batch):
        """Full training loss: bridge sampling + forward + multi-head combine."""
        state = self.sample_bridges(key, batch)
        heads = self.forward_train(params, state, batch)
        loss_0 = self.loss_continuous(heads, state, batch)
        loss_1 = self.loss_discrete(heads, state, batch)
        loss, per_head = multihead_loss([loss_0, loss_1], params["loss_weights"])
        metrics = {
            "loss": loss,
            "loss_continuous": per_head[0],
            "loss_discrete": per_head[1],
        }
        return loss, metrics

    # --------------------------------------------------------------- sampling

    def simulate_dynamics(self, params, state: HybridState, batch, key) -> HybridState:
        """Generate target data from the source state: `num_timesteps` hybrid
        Euler + tau-leaping steps as one `lax.scan`
        (reference: multimodal_bridge_matching.py:199-216).

        With Pallas enabled and the shipped bridge pair (linear Euler +
        telegraph), the ENTIRE step — EPiC forward, Euler update, telegraph
        single-jump update — runs as one kernel over lane-layout state
        (ops/sampler_pallas.py)."""
        cfg_b = self.config.bridge
        if (
            self._pallas_enabled()
            and cfg_b.continuous == "LinearUniformBridge"
            and cfg_b.discrete == "TelegraphBridge"
        ):
            from multimodal_particles_tpu.ops.sampler_pallas import (
                fused_simulate_dynamics,
            )

            return fused_simulate_dynamics(self, params, state, batch, key)
        time_steps = jnp.linspace(0.0, 1.0 - cfg_b.time_eps, cfg_b.num_timesteps)
        delta_t = (time_steps[-1] - time_steps[0]) / (cfg_b.num_timesteps - 1)
        B = state.continuous.shape[0]

        forward = (
            self.forward_pallas
            if (self._pallas_enabled() or self._wide_pallas_enabled())
            else self.forward
        )

        def step(carry, t):
            state, key = carry
            key, key_cont, key_disc = jax.random.split(key, 3)
            state = state.replace(
                time=jnp.full((B, 1, 1), t, dtype=state.continuous.dtype)
            )
            heads = forward(params, state, batch)
            state = self.bridge_continuous.solver_step(key_cont, state, heads, delta_t)
            state = self.bridge_discrete.solver_step(key_disc, state, heads, delta_t)
            return (state, key), None

        (final_state, _), _ = jax.lax.scan(step, (state, key), time_steps[1:])
        return final_state

    def predict(self, params, batch, key) -> HybridState:
        """Source → generated target (reference predict_step:252-257)."""
        initial_state = HybridState(
            time=jnp.zeros((batch.source_continuous.shape[0], 1, 1)),
            continuous=batch.source_continuous,
            discrete=batch.source_discrete,
            absorbing=batch.source_mask.astype(batch.source_continuous.dtype),
        )
        return self.simulate_dynamics(params, initial_state, batch, key)
