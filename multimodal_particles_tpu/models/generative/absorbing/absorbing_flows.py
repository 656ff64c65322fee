"""AbsorbingFlow: MBM plus a third *absorbing* bridge that stochastically
kills/creates particles — the existence mask itself is generated.

TPU-native re-design of the reference Lightning module (reference:
models/generative/absorbing/absorbing_flows.py:14-336): the generator is a
flax module (EPiC trunk + three heads, the absorbing head being a small
transformer over the trunk's local hidden state), training is a pure loss_fn,
and generation is a `lax.scan` interleaving absorbing → continuous → discrete
solver steps per time step (reference ordering: absorbing_flows.py:271-273).

Fixes vs the reference (SURVEY.md §7.4): `predict_step` reads a nonexistent
`config.pipeline` and skips the absorbing step (absorbing_flows.py:303-325);
here `predict` uses the bridge config and the correct step ordering.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_particles_tpu.models.architectures.epic import EPiCWrapper
from multimodal_particles_tpu.models.architectures.gsdm import AttnBlock, ResnetBlock
from multimodal_particles_tpu.models.architectures.utils import (
    get_timestep_embedding,
)
from multimodal_particles_tpu.models.generative.bridges import (
    AbsorbingBridge,
    LinearUniformBridge,
    TelegraphBridge,
)
from multimodal_particles_tpu.models.generative.states import (
    AbsorbingBridgeState,
    OutputHeads,
)
from multimodal_particles_tpu.utils.losses import multihead_loss


class AbsorbingGenerator(nn.Module):
    """EPiC trunk + continuous/discrete/absorbing heads
    (reference: absorbing_flows.py:14-159)."""

    config: object

    def setup(self):
        cfg = self.config
        self.dim_features_continuous = cfg.data.dim_features_continuous
        self.dim_discrete_out = (
            cfg.data.dim_features_discrete * cfg.data.vocab_size_features
        )
        self.epic = EPiCWrapper(cfg, name="epic")

        if cfg.encoder.add_discrete_head:
            self.discrete_head_mlp = nn.Sequential(
                [
                    nn.Dense(cfg.generator.discrete_head_hidden_dim),
                    nn.selu,
                    nn.Dense(self.dim_discrete_out),
                ]
            )

        gen = cfg.generator
        self.transformer_dim = gen.transformer_dim
        self.temb_dim = gen.transformer_dim
        self.temb_net = nn.Dense(self.temb_dim, name="temb_net")
        self.transformer_1_proj_in = nn.Dense(
            self.transformer_dim, name="transformer_1_proj_in"
        )
        self.res_blocks = [
            ResnetBlock(
                channels=self.transformer_dim,
                dropout=0.0,
                temb_channels=self.temb_dim,
                name=f"res_block_{i}",
            )
            for i in range(gen.n_attn_blocks)
        ]
        self.attn_blocks = [
            AttnBlock(
                self.transformer_dim,
                n_heads=gen.n_heads,
                attn_dim_reduce=1,
                name=f"attn_block_{i}",
            )
            for i in range(gen.n_attn_blocks)
        ]
        self.pre_rate_proj = nn.Dense(self.transformer_dim, name="pre_rate_proj")
        self.post_rate_proj = nn.Dense(1, name="post_rate_proj")

    def absorbing_head(self, state: AbsorbingBridgeState, net_out, net_last_layer):
        """Survival-logit head: one-hot(mask_t) ⊕ trunk hidden → projection →
        n × (ResnetBlock, AttnBlock) with time embedding → per-particle logit
        (reference: absorbing_flows.py:94-131)."""
        B, N = state.mask_t.shape[:2]
        mask_one_hot = jax.nn.one_hot(state.mask_t[..., 0].astype(jnp.int32), 2)

        if self.config.generator.detach_last_layer:
            net_last_layer = jax.lax.stop_gradient(net_last_layer)

        ts = state.time.reshape(B)
        temb = get_timestep_embedding(ts * 1000.0, self.temb_dim)
        temb = self.temb_net(temb)  # (B, C)

        h = jnp.concatenate([net_last_layer, mask_one_hot], axis=-1)
        h = self.transformer_1_proj_in(h)  # (B, N, C)
        for res_block, attn_block in zip(self.res_blocks, self.attn_blocks):
            h = res_block(h, temb)
            h = attn_block(h)

        rate_emb = self.pre_rate_proj(h)
        return self.post_rate_proj(rate_emb)  # (B, N, 1)

    def trunk_and_heads(self, state: AbsorbingBridgeState, batch):
        """EPiC trunk + continuous/discrete heads; returns the trunk's local
        hidden state so the survival head can run externally (the fused
        Pallas path, ops/survival_pallas.py)."""
        net_out, net_last_layer = self.epic(
            state.time,
            state.continuous,
            state.discrete,
            state.mask_t.astype(state.continuous.dtype),
            getattr(batch, "context_continuous", None),
            getattr(batch, "context_discrete", None),
            output_hidden_local=True,
        )
        continuous_head = net_out[..., : self.dim_features_continuous]
        discrete_head = net_out[..., self.dim_features_continuous :]
        if self.config.encoder.add_discrete_head:
            discrete_head = self.discrete_head_mlp(discrete_head)
        return continuous_head, discrete_head, net_last_layer

    def __call__(self, state: AbsorbingBridgeState, batch) -> OutputHeads:
        continuous_head, discrete_head, net_last_layer = self.trunk_and_heads(
            state, batch
        )
        absorbing_head = self.absorbing_head(state, None, net_last_layer)
        return OutputHeads(continuous_head, discrete_head, absorbing_head)


class AbsorbingFlow:
    """Mask-generating hybrid bridge model (reference:
    absorbing_flows.py:161-336)."""

    num_heads = 3  # continuous + discrete + absorbing

    def __init__(self, config):
        self.config = config
        self.vocab_size = config.data.vocab_size_features
        self.generator = AbsorbingGenerator(config)
        self.bridge_continuous = LinearUniformBridge.from_config(config)
        self.bridge_discrete = TelegraphBridge.from_config(config)
        self.bridge_absorbing = AbsorbingBridge.from_config(config)
        self.min_t = config.bridge.time_eps

    # ----------------------------------------------------------------- params

    def init(self, key, batch):
        state = AbsorbingBridgeState(
            time=jnp.full((batch.target_continuous.shape[0], 1, 1), 0.5),
            continuous=batch.source_continuous,
            discrete=batch.source_discrete,
            mask_t=batch.target_mask.astype(jnp.int32),
        )
        gen_params = self.generator.init(key, state, batch)["params"]
        return {"generator": gen_params, "loss_weights": jnp.zeros(self.num_heads)}

    def _pallas_enabled(self) -> bool:
        from multimodal_particles_tpu.ops.survival_pallas import (
            survival_pallas_supported,
        )

        flag = getattr(getattr(self.config, "parallel", None), "use_pallas", "auto")
        if flag is False:
            return False
        supported = survival_pallas_supported(self.config)
        if flag == "auto":
            return supported and jax.default_backend() != "cpu"
        return bool(flag) and supported

    def forward_sampling(self, params, state, batch) -> OutputHeads:
        """Sampling-path forward: fused Pallas EPiC trunk (ops/epic_pallas.py,
        jets padded to a lane multiple — exact, its reductions are masked) +
        fused Pallas survival head (ops/survival_pallas.py) when supported —
        the head alone is ~65% of the sampler step as separate XLA ops."""
        if not self._pallas_enabled():
            return self.forward(params, state, batch)
        from multimodal_particles_tpu.ops.epic_pallas import (
            epic_forward_pallas,
            epic_pattern_supported,
            pack_mbm_encoder_params,
        )
        from multimodal_particles_tpu.ops.survival_pallas import (
            pack_survival_head_params,
            project_time_embeddings,
            survival_head_pallas,
        )

        from multimodal_particles_tpu.ops.epic_pallas_wide import (
            epic_forward_pallas_wide,
            pack_wide_encoder_params,
            wide_pallas_supported,
        )

        gen_params = params["generator"]
        interpret = jax.default_backend() == "cpu"
        # trunk tier: wide row-major kernel when every feature width is a
        # lane multiple (the narrow kernel's VMEM footprint is pathological
        # there — see ops/epic_pallas_wide.py), narrow lane-layout kernel in
        # its hidden ≤ 64 regime, flax otherwise
        use_wide = wide_pallas_supported(self.config)
        use_narrow = (
            not use_wide
            and epic_pattern_supported(self.config)
            and self.config.encoder.dim_hidden_local <= 64
        )
        if use_wide or use_narrow:
            trunk_fn = epic_forward_pallas_wide if use_wide else epic_forward_pallas
            trunk_pack = (
                pack_wide_encoder_params if use_wide else pack_mbm_encoder_params
            )
            cfg_d, cfg_e = self.config.data, self.config.encoder
            trunk_tree = {"epic": gen_params["epic"]}
            if cfg_e.add_discrete_head:
                trunk_tree["fc_layer"] = gen_params["discrete_head_mlp"]
            packed_trunk = trunk_pack(
                trunk_tree, cfg_e.num_blocks, cfg_d.dim_features_continuous
            )
            mask_f = state.mask_t.astype(state.continuous.dtype)
            out, last = trunk_fn(
                packed_trunk,
                state.time,
                state.continuous,
                state.discrete,
                mask_f,
                num_blocks=cfg_e.num_blocks,
                use_skip=cfg_e.skip_connection,
                add_discrete_head=cfg_e.add_discrete_head,
                dim_c=cfg_d.dim_features_continuous,
                vocab=cfg_d.vocab_size_features,
                hidden=cfg_e.dim_hidden_local,
                dim_emb_time=cfg_e.dim_emb_time,
                output_hidden_local=True,
                interpret=interpret,
            )
            continuous_head = out[..., : cfg_d.dim_features_continuous]
            discrete_head = out[..., cfg_d.dim_features_continuous :]
        else:
            continuous_head, discrete_head, last = self.generator.apply(
                {"params": gen_params},
                state,
                batch,
                method=AbsorbingGenerator.trunk_and_heads,
            )
        gen_cfg = self.config.generator
        packed = pack_survival_head_params(gen_params, gen_cfg.n_attn_blocks)
        temb_proj = project_time_embeddings(
            gen_params, state.time, gen_cfg.n_attn_blocks, gen_cfg.transformer_dim
        )
        absorbing_head = survival_head_pallas(
            packed,
            temb_proj,
            last,
            state.mask_t,
            n_blocks=gen_cfg.n_attn_blocks,
            n_heads=gen_cfg.n_heads,
            transformer_dim=gen_cfg.transformer_dim,
            interpret=jax.default_backend() == "cpu",
        )
        return OutputHeads(continuous_head, discrete_head, absorbing_head)

    def forward(self, params, state, batch) -> OutputHeads:
        from multimodal_particles_tpu.utils.dtype import cast_floating, compute_dtype_of

        dtype = compute_dtype_of(self.config)
        gen_params = params["generator"]
        if dtype != jnp.float32:
            gen_params = cast_floating(gen_params, dtype)
            state = state.replace(
                time=state.time.astype(dtype),
                continuous=state.continuous.astype(dtype),
            )
        heads = self.generator.apply({"params": gen_params}, state, batch)
        if dtype != jnp.float32:
            heads = OutputHeads(
                heads.continuous.astype(jnp.float32),
                heads.discrete.astype(jnp.float32),
                heads.absorbing.astype(jnp.float32),
            )
        return heads

    # ---------------------------------------------------------------- bridges

    def sample_bridges(self, key, batch) -> AbsorbingBridgeState:
        """t ~ U(min_t, 1) + bridge states incl. the absorbing mask
        (reference: absorbing_flows.py:187-207)."""
        key_t, key_x, key_k, key_m = jax.random.split(key, 4)
        B = batch.target_continuous.shape[0]
        t = self.min_t + (1.0 - self.min_t) * jax.random.uniform(
            key_t, (B,), dtype=batch.target_continuous.dtype
        )
        time = t.reshape(B, 1, 1)
        continuous = self.bridge_continuous.sample(
            key_x, time, batch.source_continuous, batch.target_continuous
        )
        discrete = self.bridge_discrete.sample(
            key_k, time, batch.source_discrete, batch.target_discrete
        )
        mask_t = self.bridge_absorbing.sample(key_m, time, batch.target_mask)
        return AbsorbingBridgeState(time, continuous, discrete, mask_t)

    # ----------------------------------------------------------------- losses

    def loss_continuous(self, heads, state, batch):
        """MSE vs drift, summed over particles, meaned over batch & features
        (reference: absorbing_flows.py:209-222)."""
        ut = self.bridge_continuous.drift(
            t=state.time,
            x=state.continuous,
            x0=batch.source_continuous,
            x1=batch.target_continuous,
        )
        mse = (heads.continuous - ut) ** 2
        return mse.sum(axis=1).mean()

    def loss_discrete(self, heads, batch):
        """Token CE, summed over particles, meaned over batch
        (reference: absorbing_flows.py:224-236)."""
        B, N = heads.discrete.shape[:2]
        logits = heads.discrete.reshape(-1, self.vocab_size)
        targets = batch.target_discrete.reshape(-1).astype(jnp.int32)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(log_probs, targets[:, None], axis=-1)[:, 0]
        return ce.reshape(B, N).sum(axis=1).mean()

    def loss_absorbing(self, heads, batch):
        """BCE-with-logits on the survival head vs the target mask
        (reference: absorbing_flows.py:238-243)."""
        logits = heads.absorbing.reshape(-1)
        targets = batch.target_mask.reshape(-1).astype(logits.dtype)
        bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
            jnp.exp(-jnp.abs(logits))
        )
        return bce.mean()

    def loss_fn(self, params, key, batch):
        state = self.sample_bridges(key, batch)
        heads = self.forward(params, state, batch)
        loss_c = self.loss_continuous(heads, state, batch)
        loss_d = self.loss_discrete(heads, batch)
        loss_a = self.loss_absorbing(heads, batch)
        loss, per_head = multihead_loss(
            [loss_c, loss_d, loss_a], params["loss_weights"]
        )
        return loss, {
            "loss": loss,
            "loss_continuous": per_head[0],
            "loss_discrete": per_head[1],
            "loss_absorbing": per_head[2],
        }

    # --------------------------------------------------------------- sampling

    def simulate_dynamics(self, params, state, batch, key) -> AbsorbingBridgeState:
        """Scan over time: absorbing → continuous → discrete solver steps
        (reference: absorbing_flows.py:255-275)."""
        cfg_b = self.config.bridge
        time_steps = jnp.linspace(0.0, 1.0 - cfg_b.time_eps, cfg_b.num_timesteps)
        delta_t = (time_steps[-1] - time_steps[0]) / (cfg_b.num_timesteps - 1)
        B = state.continuous.shape[0]

        def step(carry, t):
            state, key = carry
            key, key_m, key_k = jax.random.split(key, 3)
            state = state.replace(
                time=jnp.full((B, 1, 1), t, dtype=state.continuous.dtype)
            )
            heads = self.forward_sampling(params, state, batch)
            state = self.bridge_absorbing.solver_step(key_m, state, heads, delta_t)
            state = self.bridge_continuous.solver_step(
                None, state, heads, delta_t, multimodal=False
            )
            state = self.bridge_discrete.solver_step(
                key_k, state, heads, delta_t, multimodal=False
            )
            return (state, key), None

        (final_state, _), _ = jax.lax.scan(step, (state, key), time_steps[1:])
        return final_state

    def predict(self, params, batch, key) -> AbsorbingBridgeState:
        initial_state = AbsorbingBridgeState(
            time=jnp.zeros((batch.source_continuous.shape[0], 1, 1)),
            continuous=batch.source_continuous,
            discrete=batch.source_discrete,
            mask_t=batch.source_mask.astype(jnp.int32),
        )
        return self.simulate_dynamics(params, initial_state, batch, key)
