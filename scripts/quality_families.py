"""Quality artifacts for the absorbing and transdimensional families
(VERDICT r1 #3): train each model on the AOJ-mini shard, generate at the
config's sampler fidelity, and score the physics marginals — the absorbing
family on its mask/multiplicity dynamics (that is its whole point,
reference: models/generative/absorbing/absorbing_flows.py:255-320), the
transdimensional family on the multiplicity distribution its birth jumps
produce, scored against both the data and the `DistributionNodes` prior
(reference: models/architectures/egnn/utils.py:1049-1086).

  python scripts/quality_families.py --family absorbing \
      --out benchmarks/quality_absorbing.json
  python scripts/quality_families.py --family transdimensional \
      --out benchmarks/quality_transdim.json

Runs on the default platform (TPU when the axon tunnel is live); pass
--platform cpu to force CPU.
"""

import argparse
import copy
import json
import os
import sys
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quality_parity import make_gen_databatch, score, state_to_cloud  # noqa: E402


def _hist_kl(gen_counts, ref_counts, lo, hi):
    """Symmetric-support integer-histogram KL(gen || ref) with add-eps
    smoothing (for multiplicity distributions)."""
    bins = np.arange(lo, hi + 2) - 0.5
    p, _ = np.histogram(gen_counts, bins=bins, density=True)
    q, _ = np.histogram(ref_counts, bins=bins, density=True)
    p = p + 1e-8
    q = q + 1e-8
    p /= p.sum()
    q /= q.sum()
    return float(np.sum(p * np.log(p / q)))


def run_absorbing(args):
    import jax
    import jax.numpy as jnp

    from multimodal_particles_tpu import test_resources_dir
    from multimodal_particles_tpu.config_classes import AbsorbingConfig
    from multimodal_particles_tpu.data.particle_clouds.jets import (
        JetClassHighLevelFeatures,
    )
    from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
        MultimodalDatabatch,
    )
    from multimodal_particles_tpu.data.particle_clouds.particles import (
        ParticleClouds,
    )
    from multimodal_particles_tpu.training.absorbing_experiment import (
        AbsorbingExperiment,
    )

    config = AbsorbingConfig.from_yaml(
        os.path.join(test_resources_dir, "configs_files", "config-absorbing-test.yaml")
    )
    config.data.num_jets = 100  # the bundled AOJ-mini shard
    config.data.seed = args.seed
    config.train.epochs = args.epochs
    config.train.scheduler_params["T_max"] = args.epochs
    if args.sampler_steps:
        config.bridge.num_timesteps = args.sampler_steps

    experiment = AbsorbingExperiment(config, experiment_dir=args.workdir)
    # skip per-epoch orbax checkpoints: this harness scores in-process and
    # thousands of tiny-epoch best/last writes dominate the wall clock
    experiment.trainer.files = None
    t0 = time.time()
    history = experiment.train()
    train_s = time.time() - t0
    final = history[-1]
    print(f"[absorbing] trained {args.epochs} epochs in {train_s:.1f}s: "
          f"train={final['train_loss']:.4f} val={final['val_loss']:.4f}")

    config = experiment.config  # stats filled in by preprocessing
    target = experiment.datamodule.dataclass.target

    # generation sources: fresh noise, multiplicities from the data histogram
    # (the reference generation protocol starts predict_step from
    # batch.source_mask — absorbing_flows.py:303-320 — and the absorbing
    # bridge then kills/creates particles along the trajectory)
    src_kwargs = dict(config.data.__dict__)
    src_kwargs.update(
        num_jets=args.gen_jets,
        target_multiplicity=target.multiplicity,
        seed=args.seed + 1,
    )
    gen_src = ParticleClouds(dataset=config.data.source_name, **src_kwargs)
    gen_src.preprocess(
        output_continuous=config.data.source_preprocess_continuous,
        output_discrete=config.data.source_preprocess_discrete,
        stats=config.data.source_preprocess_stats,
    )

    model = experiment.model
    trainer = experiment.trainer
    params = (
        trainer.state.ema_params
        if trainer.state.ema_params is not None
        else trainer.state.params
    )
    _save_params(params, args.workdir)
    predict = jax.jit(model.predict)
    key = jax.random.PRNGKey(args.seed + 2)
    chunks = [
        np.arange(i, min(i + args.gen_chunk, args.gen_jets))
        for i in range(0, args.gen_jets, args.gen_chunk)
    ]
    outs = []
    t0 = time.time()
    for i, chunk in enumerate(chunks):
        db = make_gen_databatch(MultimodalDatabatch, gen_src, chunk)
        db = jax.tree_util.tree_map(jnp.asarray, db)
        out = predict(params, db, jax.random.fold_in(key, i))
        outs.append(jax.tree_util.tree_map(np.asarray, out))
    gen_s = time.time() - t0
    print(f"[absorbing] generated {args.gen_jets} jets in {gen_s:.1f}s")

    mask_gen = np.concatenate([np.asarray(o.mask_t, np.int64) for o in outs])
    gen_cloud = state_to_cloud(
        np.concatenate([o.continuous for o in outs]),
        np.concatenate([o.discrete for o in outs]),
        mask_gen,
        config.data.target_preprocess_stats,
        ParticleClouds,
    )

    data_cloud = copy.deepcopy(target)
    data_cloud.postprocess(
        input_continuous=config.data.target_preprocess_continuous,
        input_discrete=config.data.target_preprocess_discrete,
        stats=config.data.target_preprocess_stats,
    )
    hl_data = JetClassHighLevelFeatures(data_cloud)
    features = ["pt", "m", "eta", "phi", "multiplicity", "Q_total", "Q_jet"]
    metrics = score(JetClassHighLevelFeatures(gen_cloud), hl_data, features)

    # mask-dynamics specifics: the absorbing family's own observables
    mult_gen = mask_gen[..., 0].sum(1)
    mult_data = np.asarray(target.multiplicity).reshape(-1)
    mult_init = np.asarray(gen_src.mask[..., 0].sum(1))
    N = config.data.max_num_particles
    # per-slot survival rate: P(slot alive) over pt-sorted slots
    slot_gen = mask_gen[..., 0].mean(0)
    slot_data = np.asarray(
        experiment.datamodule.dataclass.target.mask[..., 0]
    ).mean(0)
    mask_metrics = {
        "mult_mean_gen": round(float(mult_gen.mean()), 3),
        "mult_std_gen": round(float(mult_gen.std()), 3),
        "mult_mean_data": round(float(mult_data.mean()), 3),
        "mult_std_data": round(float(mult_data.std()), 3),
        "mult_mean_source_init": round(float(mult_init.mean()), 3),
        "KL_mult_hist": round(_hist_kl(mult_gen, mult_data, 0, N), 4),
        "KL_mult_hist_init": round(_hist_kl(mult_init, mult_data, 0, N), 4),
        "slot_survival_L1": round(
            float(np.abs(slot_gen - slot_data).mean()), 4
        ),
        "mask_changed_fraction": round(
            float((mult_gen != mult_init).mean()), 4
        ),
    }

    return {
        "family": "absorbing",
        "protocol": (
            "AbsorbingFlow trained on the AOJ-mini shard "
            "(config-absorbing-test); generation starts from fresh noise "
            "clouds with source masks drawn from the data multiplicity "
            "histogram (reference predict_step protocol) and the absorbing "
            "bridge evolves the mask; gen-vs-data KL/W1 plus "
            "mask/multiplicity dynamics observables"
        ),
        "config": "config-absorbing-test (AOJ mini, 100 jets)",
        "epochs": args.epochs,
        "sampler_steps": config.bridge.num_timesteps,
        "gen_jets": args.gen_jets,
        "final_train_loss": None
        if final["train_loss"] is None
        else round(final["train_loss"], 4),
        "final_val_loss": round(final["val_loss"], 4),
        "train_wall_s": round(train_s, 1),
        "gen_wall_s": round(gen_s, 1),
        "metrics": metrics,
        "mask_dynamics": mask_metrics,
    }


def run_transdimensional(args):
    import jax
    import jax.numpy as jnp

    from multimodal_particles_tpu.config_classes.transdimensional_unconditional_config import (
        TransdimensionalEpicConfig,
    )
    from multimodal_particles_tpu.data.particle_clouds.jets import (
        JetClassHighLevelFeatures,
    )
    from multimodal_particles_tpu.data.particle_clouds.particles import (
        ParticleClouds,
    )
    from multimodal_particles_tpu.models.generative.transdimensional import (
        TransdimensionalJumpDiffusion,
    )
    from multimodal_particles_tpu.models.generative.transdimensional.structure import (
        DistributionNodes,
    )
    from multimodal_particles_tpu.training.transdimensional_experiment import (
        TransdimensionalExperiment,
    )

    config = TransdimensionalEpicConfig()
    config.data.num_jets = 100
    # THE headline operating point (one number everywhere — VERDICT r3 #7):
    # the tau-leaped multi-birth solver at 96 steps (config default
    # multi_birth=16), matching bench.py's transdim line and
    # benchmarks/quality_transdim.json; the reference's ≤1-birth-per-step
    # structure needs ~1000 steps for ~46-particle jets and is scored
    # separately below as the reference-mode anchor
    headline_steps = args.sampler_steps or 96
    config.sampler_kwargs.dt = 1.0 / headline_steps
    # Loss balance for a usable generator: at the reference's default
    # weights the objective is ~92% creation-NLL (the forward rate's ~150x
    # ELBO factor), the x0-dim classifier CE and rate terms get ~0.1%, and
    # the classifier that drives the reverse birth rate never trains
    # (diagnosed via scripts/diagnose_transdim.py: CE worse than uniform on
    # train data, eps-MSE ~ 1 at the dims=1 states sampling starts in).
    # score_loss_normalization='live' (the config default) plus these
    # config-exposed weights give every head an O(1) share.
    config.loss_kwargs.x0_logit_ce_loss_weight = 200.0
    config.loss_kwargs.rate_loss_weight = 100.0
    # The EDM-style defaults (lr 3e-5, ema_halflife 500 kimg) are scaled
    # for multi-million-step molecular runs; at 4 steps/epoch on the
    # 100-jet shard they amount to ~100 effective updates and an EMA window
    # ~6x the whole run (the eval params stay half-trained). Scale to the
    # actual run length.
    config.optimizer_kwargs.lr = 1e-3
    config.ema_halflife_kimg = 10

    experiment = TransdimensionalExperiment(config, experiment_dir=args.workdir)
    experiment.trainer.files = None  # see absorbing note
    if args.reuse_params:
        # re-score saved params (e.g. the converged 3000-epoch run in
        # .cache/transdim_3000ep_params.pkl) without retraining
        import pickle

        with open(args.reuse_params, "rb") as f:
            params = pickle.load(f)
        train_s = 0.0
        final = {"train_loss": None}  # reused params: no train run
        print(f"[transdim] reusing params from {args.reuse_params}")
    else:
        t0 = time.time()
        history = experiment.trainer.fit(
            experiment.datamodule, epochs=args.epochs
        )
        train_s = time.time() - t0
        final = history[-1]
        print(f"[transdim] trained {args.epochs} epochs in {train_s:.1f}s: "
              f"train={final['train_loss']:.4f}")

        trainer = experiment.trainer
        params = (
            trainer.state.ema_params
            if trainer.state.ema_params is not None
            else trainer.state.params
        )
        _save_params(params, args.workdir)
    model = experiment.model
    # the sampler only takes SHAPES from the template (trajectories start at
    # dims=1, x ~ N(0, I)) — tile the first loader batch up to gen_chunk so
    # generation runs in a few big jitted calls instead of many tiny ones
    template = next(iter(experiment.datamodule.train))
    reps = max(1, -(-args.gen_chunk // len(template[0])))
    template = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.repeat(np.asarray(x), reps, axis=0))
        if x is not None
        else None,
        template,
    )

    N = config.data.max_num_particles
    mult_data = np.asarray(
        experiment.datamodule.dataset.target_mask[..., 0].sum(1)
    ).astype(np.int64)
    hist = {int(k): int(v) for k, v in zip(*np.unique(mult_data, return_counts=True))}
    prior = DistributionNodes(hist)
    prior_key = jax.random.PRNGKey(args.seed + 3)
    dims_prior = np.asarray(prior.sample(prior_key, args.gen_jets))
    x_data = np.asarray(experiment.datamodule.dataset.target_continuous)
    m_data = np.asarray(experiment.datamodule.dataset.target_mask[..., 0]) > 0
    pt_data = x_data[..., 0][m_data]

    data_cloud = copy.deepcopy(experiment.datamodule.dataclass.target)
    data_cloud.postprocess(
        input_continuous=config.data.target_preprocess_continuous,
        input_discrete=config.data.target_preprocess_discrete,
        stats=config.data.target_preprocess_stats,
    )
    hl_data = JetClassHighLevelFeatures(data_cloud)
    features = ["pt", "m", "eta", "phi", "multiplicity", "Q_total", "Q_jet",
                "tau21", "tau32", "d2"]

    def generate(steps, multi_birth):
        """Sample gen_jets jets at the given solver setting; returns
        (dims (G,), continuous (G,N,3) standardized, tokens (G,N,1),
        wall seconds)."""
        cfg2 = copy.deepcopy(config)
        cfg2.sampler_kwargs.dt = 1.0 / steps
        cfg2.sampler_kwargs.multi_birth = multi_birth
        model2 = TransdimensionalJumpDiffusion(cfg2, experiment.datamodule)
        predict = jax.jit(model2.predict)
        key = jax.random.PRNGKey(args.seed + 2)
        dims_l, cont_l, tok_l = [], [], []
        t0 = time.time()
        n, r = 0, 0
        while n < args.gen_jets:
            out = predict(params, template, jax.random.fold_in(key, r))
            r += 1
            # truncate each chunk to the remaining quota so every metric
            # scores the SAME first gen_jets jets
            take = min(np.asarray(out.dims).shape[0], args.gen_jets - n)
            dims_l.append(np.asarray(out.dims)[:take])
            cont_l.append(np.asarray(out.continuous)[:take])
            tok_l.append(np.argmax(np.asarray(out.discrete)[:take], axis=-1))
            n += take
        gen_s = time.time() - t0
        print(f"[transdim] generated {args.gen_jets} jets in {gen_s:.1f}s "
              f"({steps} steps, multi_birth={multi_birth})")
        return (
            np.concatenate(dims_l),
            np.concatenate(cont_l),
            np.concatenate(tok_l)[..., None],
            gen_s,
        )

    def score_setting(dims_gen, cont, tokens, gen_s, steps, multi_birth):
        metrics = {
            "mult_mean_gen": round(float(dims_gen.mean()), 3),
            "mult_std_gen": round(float(dims_gen.std()), 3),
            "mult_mean_data": round(float(mult_data.mean()), 3),
            "mult_std_data": round(float(mult_data.std()), 3),
            "KL_mult_gen_vs_data": round(_hist_kl(dims_gen, mult_data, 0, N), 4),
            "KL_mult_gen_vs_prior": round(_hist_kl(dims_gen, dims_prior, 0, N), 4),
            # mean prior log-likelihood of generated dims vs of the data's
            # own multiplicities: how plausible the birth-jump counts are
            # under the DistributionNodes prior the reference targets
            "prior_logp_gen": round(
                float(np.mean(np.asarray(prior.log_prob(np.clip(dims_gen, 1, N))))), 4
            ),
            "prior_logp_data": round(
                float(np.mean(np.asarray(prior.log_prob(mult_data)))), 4
            ),
            "W1_mult_gen_vs_data": round(_w1(dims_gen, mult_data), 4),
        }
        # constituent-pt marginal in standardized space. A small fraction of
        # trajectories can diverge through the creation-head feedback loop
        # (births anchored at an already-exploded nearest particle); report
        # the diverged fraction, score the marginal on non-diverged
        # constituents, and drop diverged JETS from the physics cloud so one
        # exploded jet cannot dominate the KL/W1 table.
        alive = np.arange(N)[None, :] < dims_gen[:, None]
        pt_gen = cont[..., 0][alive]
        finite = np.abs(pt_gen) < 50.0  # standardized units; data is O(1)
        metrics["diverged_constituent_frac"] = round(float(1.0 - finite.mean()), 5)
        metrics["pt_median_gen"] = round(float(np.median(pt_gen)), 4)
        metrics["pt_median_data"] = round(float(np.median(pt_data)), 4)
        if finite.any():
            metrics["W1_pt_standardized"] = round(_w1(pt_gen[finite], pt_data), 4)
        metrics["pt_mean_data"] = round(float(pt_data.mean()), 4)

        # full physics scoring in physical units (VERDICT r2 #3): the same
        # postprocess → JetClassHighLevelFeatures KL/W1 suite the reference
        # evaluates with (reference: data/particle_clouds/jets.py:86-332)
        jet_ok = np.abs(cont[..., 0] * alive).max(axis=1) < 50.0
        gen_cloud = state_to_cloud(
            cont[jet_ok],
            tokens[jet_ok],
            alive[jet_ok][..., None].astype(np.int64),
            config.data.target_preprocess_stats,
            ParticleClouds,
        )
        physics = score(JetClassHighLevelFeatures(gen_cloud), hl_data, features)
        physics["scored_jet_fraction"] = round(float(jet_ok.mean()), 5)
        return {
            "sampler_steps": steps,
            "multi_birth": multi_birth,
            "gen_wall_s": round(gen_s, 1),
            "metrics": metrics,
            "physics_metrics": physics,
        }

    headline_mb = args.multi_birth or config.sampler_kwargs.multi_birth
    headline = score_setting(
        *generate(headline_steps, headline_mb), headline_steps, headline_mb
    )
    # reference-mode anchor: the ≤1-birth-per-step solver at its own
    # quality-valid step count (the reference structure being redesigned:
    # models/generative/transdimensional/sampler.py:237-255). Skippable for
    # fast (e.g. CPU) iteration on the headline point.
    ref_mode = (
        None if args.skip_ref_mode else score_setting(*generate(1000, 1), 1000, 1)
    )

    return {
        "family": "transdimensional",
        "protocol": (
            "TransdimensionalJumpDiffusion trained on the AOJ-mini shard "
            "(Linear-discrete trunk, per-live score normalization, "
            "O(1)-balanced CE/rate weights, run-length-scaled lr/EMA — see "
            "the config block in run_transdimensional); sampling starts at "
            "dims=1, x~N(0,I) and births particles via the learned jump "
            "rate. Headline = tau-leaped multi-birth solver; "
            "reference_mode = single-birth at 1000 steps. Scored on "
            "multiplicity (data + DistributionNodes prior), standardized "
            "constituent pt, and the full physical-unit KL/W1 observable "
            "suite"
        ),
        "config": (
            "TransdimensionalEpicConfig + ce_w=200 rate_w=100 lr=1e-3 "
            "ema_halflife_kimg=10 (AOJ mini, 100 jets)"
        ),
        # provenance of the SCORED params, not the harness default: with
        # --reuse-params the checkpoint's own training run is what matters
        # (VERDICT r3 #7)
        "epochs": None if args.reuse_params else args.epochs,
        "params_source": args.reuse_params or "trained in-run",
        "params_provenance": (
            args.params_provenance
            if args.reuse_params
            else f"trained in-run: {args.epochs} epochs, seed {args.seed}"
        ),
        "sampler_steps": headline["sampler_steps"],
        "multi_birth": headline["multi_birth"],
        "gen_jets": args.gen_jets,
        "final_train_loss": None
        if final["train_loss"] is None
        else round(final["train_loss"], 4),
        "train_wall_s": round(train_s, 1),
        "gen_wall_s": headline["gen_wall_s"],
        "metrics": headline["metrics"],
        "physics_metrics": headline["physics_metrics"],
        "reference_mode_1000step_single_birth": ref_mode,
    }


def _save_params(params, workdir):
    """Pickle the sampled-from params so artifacts can be re-scored or
    diagnosed without retraining."""
    import pickle

    import jax

    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "trained_params.pkl"), "wb") as f:
        pickle.dump(jax.device_get(params), f)


def _w1(a, b):
    """1-Wasserstein distance between two empirical samples via quantile
    integration (no scipy on this box)."""
    qs = np.linspace(0.0, 1.0, 1001)
    return float(np.mean(np.abs(np.quantile(a, qs) - np.quantile(b, qs))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True,
                    choices=["absorbing", "transdimensional"])
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--gen-jets", type=int, default=4096)
    ap.add_argument("--gen-chunk", type=int, default=1024)
    ap.add_argument("--sampler-steps", type=int, default=None,
                    help="override the config's sampler step count")
    ap.add_argument("--multi-birth", type=int, default=None,
                    help="override the config's max births/step "
                         "(transdimensional only; operating-point sweeps)")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--reuse-params", default=None,
                    help="pickle of trained params: skip training and "
                         "re-score (transdimensional only)")
    ap.add_argument("--params-provenance",
                    default="3000-epoch converged run (round-2 headline; "
                            "ce_w=200 rate_w=100 lr=1e-3 ema 10 kimg)",
                    help="training provenance of --reuse-params, recorded "
                         "in the artifact (VERDICT r3 #7)")
    ap.add_argument("--skip-ref-mode", action="store_true",
                    help="skip the 1000-step single-birth reference-mode "
                         "anchor (slow; for headline iteration)")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.workdir is None:
        args.workdir = f"/tmp/quality_{args.family}_run"
    if args.out is None:
        short = "transdim" if args.family == "transdimensional" else args.family
        args.out = os.path.join(REPO_ROOT, "benchmarks", f"quality_{short}.json")

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    runner = run_absorbing if args.family == "absorbing" else run_transdimensional
    result = runner(args)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
