"""Jump-diffusion training loss (JumpLossFinalDim).

Pure-function re-derivation of the reference loss (reference:
models/generative/transdimensional/loss.py:17-251): forward-rate Poisson
dimension deletion + VP noising (`add_noise`), two network passes (x_t and
the delete-one-dim batch), and the weighted sum of

  score matching (eps/x0/edm weighting)  (loss.py:140-147)
  birth-rate loss  rate(xt) − f·log rate(del xt)  (loss.py:154-157)
  creation Gaussian NLL on the deleted particle  (loss.py:172-180)
  x0-dimension CE + nearest-atom CE  (loss.py:106-109,182-186)

The reference *drops* rows with NaNs and recomputes the batch (loss.py:
188-223) — shape surgery that cannot jit; here invalid rows get zero weight
and the mean is taken over valid rows, which is the same estimator.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from multimodal_particles_tpu.models.generative.transdimensional.structure import (
    StructuredState,
    adjust_state,
    get_auto_target,
    get_nearest_atom,
)


def corrupt_with(state: StructuredState, noise_schedule, ts, dims_xt, noise_raw):
    """Deterministic corruption core given the random draws: delete dims to
    dims_xt, CoM-adjust, then VP-noise the survivors with noise_raw
    (reference: loss.py:17-50). Split out of `add_noise` so torch-golden
    tests can drive both implementations with identical draws.

    Returns (noised_state, ts, x0_dims, dims_xt, noise_flat, x_flat, std)."""
    x0_dims = state.dims
    state = state.delete_dims(dims_xt)
    state, _ = adjust_state(state)

    x = state.get_flat_lats()
    mean, std = noise_schedule.get_p0t_stats(x, ts)

    noise_state = state.set_flat_lats(noise_raw).delete_dims(dims_xt)
    noise_state, _ = adjust_state(noise_state)
    noise = noise_state.get_flat_lats()

    xt = mean + std * noise
    state = state.set_flat_lats(xt).delete_dims(dims_xt)
    state, _ = adjust_state(state)
    return state, ts, x0_dims, dims_xt, noise, x, std


def add_noise(state: StructuredState, noise_schedule, forward_rate, min_t, key):
    """Forward corruption: delete dims via Poisson(∫rate), CoM-adjust, then
    VP-noise the survivors (reference: loss.py:17-50).

    Returns (noised_state, ts, x0_dims, dims_xt, noise_flat, x_flat, std)."""
    B = state.B
    key_t, key_dims, key_noise = jax.random.split(key, 3)

    ts = min_t + (1.0 - min_t) * jax.random.uniform(key_t, (B,))
    dims_xt = forward_rate.get_dims_at_t(key_dims, start_dims=state.dims, ts=ts)
    noise_raw = jax.random.normal(key_noise, (B, state.flat_dim))
    return corrupt_with(state, noise_schedule, ts, dims_xt, noise_raw)


@dataclass(frozen=True)
class JumpLossFinalDim:
    forward_rate: object
    noise_schedule: object
    min_t: float
    loss_type: str
    x0_logit_ce_loss_weight: float
    rate_loss_weight: float
    score_loss_weight: float
    auto_loss_weight: float
    mean_or_sum_over_dim: str
    nearest_atom_pred: bool
    nearest_atom_loss_weight: float
    # "dims" = reference normalization (score error effectively / full flat
    # dim D); "live" divides each sample's score error by its live-entry
    # count so low-dims samples keep full gradient weight — see
    # LossKwargs.score_loss_normalization for why the reference's choice
    # breaks the dims=1 regime the reverse sampler starts in.
    score_loss_normalization: str = "dims"

    def __call__(self, model, params, st_state: StructuredState, key):
        key_noise, key_net = jax.random.split(key)
        corrupted = add_noise(
            st_state, self.noise_schedule, self.forward_rate, self.min_t, key_noise
        )
        return self.compute(model, params, corrupted)

    def compute(self, model, params, corrupted):
        """Deterministic loss given the `corrupt_with`/`add_noise` output —
        the golden-testable core (both network passes + all loss terms)."""
        st_state, ts, x0_dims, dims_xt, noise, x, std_p0t = corrupted
        B = st_state.B
        max_dim = st_state.N

        to_predict = {"eps": "eps", "x0": "x0", "edm": "x0"}[self.loss_type]

        # --- first network pass on x_t
        D_xt, rate_xt, _dummy_mean_std, x0_dim_logits, _, _ = model.net_forward(
            params,
            st_state,
            ts,
            nearest_atom=jnp.zeros((B,), jnp.int32),
            predict=to_predict,
        )

        # x0-dimension CE (dims are 1-based)
        log_probs = jax.nn.log_softmax(x0_dim_logits, axis=1)
        ce_loss = -jnp.take_along_axis(
            log_probs, (x0_dims - 1)[:, None].astype(jnp.int32), axis=1
        )[:, 0]

        D_mask = st_state.get_mask_flat()
        D_xt = D_xt * D_mask

        # --- second network pass on the delete-one-dim batch
        delxt_state = st_state.delete_one_dim()
        nearest_atom = get_nearest_atom(st_state, delxt_state)
        delxt_state, adjust_val = adjust_state(delxt_state)

        _, rate_delxt, mean_std, _, near_atom_logits, _ = model.net_forward(
            params, delxt_state, ts, nearest_atom=nearest_atom, predict=to_predict
        )

        # --- score matching
        target = {"eps": noise, "x0": x}[to_predict]
        score_loss = 0.5 * D_mask * (D_xt - target) ** 2  # (B, D)
        if self.loss_type == "edm":
            vp_sigma = std_p0t
            vp_alpha = jnp.sqrt(1.0 - vp_sigma**2)
            ve_sigma = vp_sigma / vp_alpha
            score_loss = score_loss * (ve_sigma**2 + 1.0) / ve_sigma**2
        if self.score_loss_normalization == "live":
            # rescale so the downstream Σ_D (… /D) gives a per-LIVE-entry
            # mean: low-dims samples keep full score gradient weight
            live = jnp.maximum(jnp.sum(D_mask, axis=1, keepdims=True), 1.0)
            score_loss = score_loss * (D_mask.shape[1] / live)
        elif self.score_loss_normalization != "dims":
            raise ValueError(self.score_loss_normalization)

        # --- rate loss
        f_rate_vs_t = self.forward_rate.get_rate(dims_xt, ts)  # (B,)
        rate_loss = (dims_xt < max_dim) * rate_xt[:, 0] - (
            dims_xt > 1
        ) * f_rate_vs_t * jnp.log(rate_delxt[:, 0] + 1e-12)

        # --- creation (auto) loss on the deleted particle
        final_dim_mask = st_state.get_next_dim_deleted_mask()
        mean = mean_std[0]
        std = jax.nn.softplus(mean_std[1])
        auto_target = get_auto_target(st_state, adjust_val)
        gauss_ll = final_dim_mask * (
            -jnp.log(std + 1e-20) - 0.5 * (auto_target - mean) ** 2 / (std**2 + 1e-20)
        )
        auto_loss = -f_rate_vs_t * (dims_xt > 1) * jnp.sum(gauss_ll, axis=1)

        # --- nearest-atom CE
        if self.nearest_atom_pred:
            na_log_probs = jax.nn.log_softmax(near_atom_logits, axis=1)
            na_ce = -jnp.take_along_axis(
                na_log_probs, nearest_atom[:, None].astype(jnp.int32), axis=1
            )[:, 0]
            nearest_atom_loss = (dims_xt > 1) * na_ce
        else:
            nearest_atom_loss = jnp.zeros_like(rate_loss)

        # --- NaN handling: zero-weight invalid rows (reference drops them)
        def row_finite(t):
            return jnp.all(jnp.isfinite(t.reshape(B, -1)), axis=1)

        valid = (
            row_finite(rate_delxt)
            & row_finite(mean)
            & row_finite(mean_std[1])
            & row_finite(near_atom_logits)
            & row_finite(score_loss)
        )
        valid_f = valid.astype(score_loss.dtype)

        D = x.shape[1]
        per_elem = (
            self.score_loss_weight * score_loss
            + (self.rate_loss_weight / D) * rate_loss[:, None]
            + (self.auto_loss_weight / D) * auto_loss[:, None]
            + (self.x0_logit_ce_loss_weight / D) * ce_loss[:, None]
            + (self.nearest_atom_loss_weight / D) * nearest_atom_loss[:, None]
        )  # (B, D)

        if self.mean_or_sum_over_dim == "mean":
            per_sample = jnp.sum(per_elem, axis=1) / D
        elif self.mean_or_sum_over_dim == "sum":
            per_sample = jnp.sum(per_elem, axis=1)
        else:
            raise ValueError(self.mean_or_sum_over_dim)

        denom = jnp.maximum(jnp.sum(valid_f), 1.0)
        loss = jnp.sum(per_sample * valid_f) / denom

        components = {
            "score_loss": jnp.sum(jnp.sum(score_loss, axis=1) * valid_f) / denom,
            "rate_loss": jnp.sum(rate_loss * valid_f) / denom,
            "auto_loss": jnp.sum(auto_loss * valid_f) / denom,
            "ce_loss": jnp.sum(ce_loss * valid_f) / denom,
            "nearest_atom_loss": jnp.sum(nearest_atom_loss * valid_f) / denom,
            "max_rate_xt": jnp.max(rate_xt),
            "min_rate_delxt": jnp.min(rate_delxt),
            "min_auto_std": jnp.min(std),
            "max_auto_L2": jnp.max((auto_target - mean) ** 2),
            "num_valid": jnp.sum(valid_f),
        }
        return loss, components
