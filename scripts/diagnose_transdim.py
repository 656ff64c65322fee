"""Offline diagnosis of a trained transdimensional model's sampling
trajectories (uses the params pickle saved by scripts/quality_families.py).

Runs the jump sampler with collect_diagnostics=True and prints a per-step
trajectory table (max |x|, mean dims, birth fraction, mean learned rate) so
divergence and multiplicity-calibration issues can be localized in time
without retraining. Optionally sweeps sampler-side mitigations.

  python scripts/diagnose_transdim.py --workdir /tmp/quality_transdim_run
"""

import argparse
import os
import pickle
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/quality_transdim_run")
    ap.add_argument("--gen-jets", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None, choices=[None, "cpu"])
    ap.add_argument("--print-every", type=int, default=50)
    ap.add_argument("--no-fused", action="store_true",
                    help="force the flax (non-Pallas) network forward")
    ap.add_argument("--sampler-steps", type=int, default=None,
                    help="override the config's 1/dt step count")
    ap.add_argument("--multi-birth", type=int, default=None,
                    help="override sampler_kwargs.multi_birth (1 = "
                         "reference single-birth semantics)")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from multimodal_particles_tpu.config_classes.transdimensional_unconditional_config import (
        TransdimensionalEpicConfig,
    )
    from multimodal_particles_tpu.training.transdimensional_experiment import (
        TransdimensionalExperiment,
    )

    config = TransdimensionalEpicConfig()
    config.data.num_jets = 100
    if args.no_fused:
        config.parallel.use_pallas = False
    if args.sampler_steps:
        config.sampler_kwargs.dt = 1.0 / args.sampler_steps
    if args.multi_birth is not None:
        config.sampler_kwargs.multi_birth = args.multi_birth

    experiment = TransdimensionalExperiment(config, experiment_dir=None)
    with open(os.path.join(args.workdir, "trained_params.pkl"), "rb") as f:
        params = pickle.load(f)
    model = experiment.model

    template = next(iter(experiment.datamodule.train))
    reps = max(1, -(-args.gen_jets // len(template[0])))
    template = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.repeat(np.asarray(x), reps, axis=0))
        if x is not None
        else None,
        template,
    )
    state = model._as_state(template)

    @jax.jit
    def run(params, key):
        final, nfe, diag = model.sample(
            params, key, state, collect_diagnostics=True
        )
        return final, diag

    final, diag = run(params, jax.random.PRNGKey(args.seed))
    diag = {k: np.asarray(v) for k, v in diag.items()}
    T = diag["ts"].shape[0]

    # analytic forward marginal E[dims_t] = E_d0[E[clip(d0 - Poisson(L(t)), 1)]]
    # over the data dims — the curve a perfectly-calibrated reverse chain's
    # mean_dims would track (in reverse time); realized-minus-forward
    # localizes where births lag
    from scipy.stats import poisson as _poisson  # scipy ships with jax deps

    d0 = np.asarray(template[0]).astype(np.int64)

    def fwd_marginal(t):
        lam = float(model.forward_rate.get_rate_integral(jnp.float32(t)))
        kmax = int(lam + 10 * np.sqrt(lam) + d0.max() + 10)
        k = np.arange(kmax + 1)
        pmf = _poisson.pmf(k, lam)
        surv = np.clip(d0[:, None] - k[None, :], 1, None)  # (B0, K)
        return float((surv * pmf[None, :]).sum(axis=1).mean())

    dts = -np.diff(np.concatenate([diag["ts"], [0.0]]))
    # 'births' = mean births per jet this step: equals the birth fraction
    # (<=1) in single-birth mode, can exceed 1 with the multi-birth chain
    print(f"{'step':>5} {'t':>8} {'max|x|':>12} {'mean_dims':>10} "
          f"{'fwd_marg':>9} {'births':>10} {'rate_mean':>10}")
    for i in list(range(0, T, args.print_every)) + [T - 1]:
        t_after = max(diag["ts"][i] - dts[i], 0.0)
        print(f"{i:>5} {diag['ts'][i]:>8.4f} {diag['max_abs_x'][i]:>12.4g} "
              f"{diag['mean_dims'][i]:>10.2f} {fwd_marginal(t_after):>9.2f} "
              f"{diag['birth_frac'][i]:>10.4f} "
              f"{diag['rate_mean'][i]:>10.4f}")

    # where does max|x| first exceed thresholds?
    for thresh in (10.0, 100.0, 1e4, 1e8):
        idx = np.argmax(diag["max_abs_x"] > thresh)
        if diag["max_abs_x"][idx] > thresh:
            print(f"max|x| first > {thresh:g} at step {idx} "
                  f"(t={diag['ts'][idx]:.4f}, mean_dims="
                  f"{diag['mean_dims'][idx]:.1f})")
        else:
            print(f"max|x| never exceeds {thresh:g}")

    x = np.asarray(final.continuous)
    d = np.asarray(final.dims)
    alive = np.arange(x.shape[1])[None, :] < d[:, None]
    vals = np.abs(x[..., 0][alive])
    print(f"final: mean_dims={d.mean():.2f}  "
          f"frac |pt_std|>50 = {(vals > 50).mean():.5f}  "
          f"per-jet diverged frac = "
          f"{(np.abs(x[..., 0] * alive).max(1) > 50).mean():.5f}")

    # realized births per jet (sum of per-step birth fractions) and the
    # learned rate's own expectation sum(rate*dt) — if these disagree with
    # the data's mean multiplicity the rate head is miscalibrated
    dts = -np.diff(np.concatenate([diag["ts"], [0.0]]))
    print(f"realized births/jet = {diag['birth_frac'].sum():.2f}; "
          f"sum(rate*dt) = {np.sum(diag['rate_mean'] * dts):.2f}; "
          f"final mean_dims = {d.mean():.2f}")


if __name__ == "__main__":
    main()
