"""Absorbing-family head-to-head quality gate: the upstream torch reference
`AbsorbingFlow` vs the TPU rebuild, trained on the identical AOJ-mini data,
sampled at equal steps, scored with identical metric machinery — the
absorbing analog of scripts/quality_parity.py (VERDICT r2 #1).

The reference's absorbing family is functional upstream
(reference: training/absorbing_experiment.py:19-26,
models/generative/absorbing/absorbing_flows.py:161-336), so the reference
model is trained here, in-process, on the exact preprocessed arrays the
rebuild trains on. Generation drives the reference's `simulate_dynamics`
(absorbing_flows.py:255-275) — the absorbing → continuous → discrete solver
ordering the rebuild's `predict` re-designs — NOT its `predict_step`, which
is broken upstream (reads the nonexistent `config.pipeline`, never evolves
the mask; absorbing_flows.py:303-325).

Adds the mask-dynamics STRESS test the plain quality artifact lacks: the
standard protocol draws source masks from the data multiplicity histogram
(an already-correct init), so this script also generates from deliberately
WRONG source histograms — a downshifted one (multiplicity halved) and a
uniform one — and reports whether the learned absorbing dynamics move the
multiplicity KL toward the data. The absorbing rate is creation-only (dead
slots revive at rate SP(t)·sigmoid(logit), live slots never die,
reference: bridges.py:260-286), so the downshifted init is the one the
dynamics can fully correct; the uniform init can only be corrected from
below.

  python scripts/quality_parity_absorbing.py --epochs 400 --gen-jets 2048 \
      --seeds 0 1 --out benchmarks/quality_parity_absorbing.json
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

from quality_parity import (  # noqa: E402
    make_gen_databatch,
    score,
    state_to_cloud,
    to_torch_databatch,
)
from quality_families import _hist_kl  # noqa: E402


def gen_rebuild(model, params, gen_src, config, chunks, key, Databatch, jax, jnp):
    outs = []
    predict = jax.jit(model.predict)
    for i, chunk in enumerate(chunks):
        db = make_gen_databatch(Databatch, gen_src, chunk)
        db = jax.tree_util.tree_map(jnp.asarray, db)
        out = predict(params, db, jax.random.fold_in(key, i))
        outs.append(jax.tree_util.tree_map(np.asarray, out))
    return (
        np.concatenate([o.continuous for o in outs]),
        np.concatenate([o.discrete for o in outs]),
        np.concatenate([np.asarray(o.mask_t, np.int64) for o in outs]),
    )


def gen_reference(ref_model, gen_src, chunks, Databatch, torch, RefState):
    c_l, d_l, m_l = [], [], []
    with torch.no_grad():
        for chunk in chunks:
            db = make_gen_databatch(Databatch, gen_src, chunk)
            tb = to_torch_databatch(db, torch)
            state = RefState(
                None,
                tb.source_continuous,
                tb.source_discrete,
                tb.source_mask,
            )
            final = ref_model.simulate_dynamics(state, tb)
            c_l.append(final.continuous.numpy())
            d_l.append(final.discrete.numpy())
            m_l.append(final.mask_t.numpy().astype(np.int64))
    return np.concatenate(c_l), np.concatenate(d_l), np.concatenate(m_l)


def run_seed(args, seed):
    import jax
    import jax.numpy as jnp
    import torch

    torch.manual_seed(seed)

    from multimodal_particles_tpu import test_resources_dir
    from multimodal_particles_tpu.config_classes import AbsorbingConfig
    from multimodal_particles_tpu.data.particle_clouds.jets import (
        JetClassHighLevelFeatures,
        JetDataclass,
    )
    from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
        JetsDataloaderModule,
        MultimodalDatabatch,
    )
    from multimodal_particles_tpu.data.particle_clouds.particles import (
        ParticleClouds,
    )
    from multimodal_particles_tpu.models.generative.absorbing.absorbing_flows import (
        AbsorbingFlow,
    )
    from multimodal_particles_tpu.training.trainer import Trainer

    config_path = os.path.join(
        test_resources_dir, "configs_files", "config-absorbing-test.yaml"
    )
    config = AbsorbingConfig.from_yaml(config_path)
    config.data.num_jets = 100
    config.data.seed = seed
    config.bridge.num_timesteps = args.sampler_steps
    # rebuild-only augmentations (the torch reference has no such knobs);
    # head-to-head runs keep the defaults 0.0 = exact reference semantics
    config.bridge.target_dropout = args.target_dropout
    # sampling-time-only death channel (BridgeConfig.death_rate_scale):
    # affects generation, never training — cached params are reusable
    # across death-scale sweeps
    config.bridge.death_rate_scale = args.death_rate_scale
    epochs = args.epochs
    config.train.epochs = epochs
    config.train.scheduler_params["T_max"] = epochs

    # ------------------------------------------------------------ shared data
    jets = JetDataclass(config)
    jets.preprocess()
    dm = JetsDataloaderModule(config, jets)
    config = dm.update_config(config)
    steps_per_epoch = max(len(dm.train), 1)
    print(f"[seed {seed}] data: {len(dm.dataset)} jets, {steps_per_epoch} "
          f"steps/epoch, {epochs} epochs")

    # ------------------------------------------------------------- JAX train
    model = AbsorbingFlow(config)
    cache_path = None
    if args.params_cache:
        os.makedirs(args.params_cache, exist_ok=True)
        # death_rate_scale is sampling-only, so it is deliberately NOT part
        # of the cache key: one trained model serves a death-scale sweep
        cache_path = os.path.join(
            args.params_cache,
            f"absorbing_s{seed}_d{args.target_dropout}_e{epochs}"
            f"_st{args.sampler_steps}.pkl",
        )
    if cache_path and os.path.exists(cache_path):
        import pickle

        with open(cache_path, "rb") as f:
            cached = pickle.load(f)
        params = jax.tree_util.tree_map(jnp.asarray, cached["params"])
        jax_final = {"train_loss": cached["final_train_loss"]}
        jax_train_s = 0.0
        print(f"[seed {seed}][jax] loaded cached params from {cache_path}")
    else:
        trainer = Trainer(model, config, experiment_files=None, seed=seed)
        dm.set_dataloader()
        t0 = time.time()
        history = trainer.fit(dm, epochs=epochs)
        jax_train_s = time.time() - t0
        jax_final = history[-1]
        params = (
            trainer.state.ema_params
            if trainer.state.ema_params is not None
            else trainer.state.params
        )
        print(f"[seed {seed}][jax] trained in {jax_train_s:.1f}s: "
              f"train={jax_final['train_loss']:.4f}")
        if cache_path:
            import pickle

            with open(cache_path, "wb") as f:
                pickle.dump(
                    {
                        "params": jax.tree_util.tree_map(np.asarray, params),
                        "final_train_loss": jax_final["train_loss"],
                    },
                    f,
                )
            print(f"[seed {seed}][jax] cached params to {cache_path}")

    # ----------------------------------------------------------- torch train
    ref_model = ref_final_loss = torch_train_s = None
    RefState = None
    if not args.skip_reference:
        from multimodal_particles_tpu.utils.torch_reference import load_reference

        assert load_reference() is not None, "reference tree not mounted"
        from multimodal_particles.config_classes.absorbing_flows_config import (
            AbsorbingConfig as RefConfig,
        )
        from multimodal_particles.models.generative.absorbing.absorbing_flows import (
            AbsorbingFlow as RefAF,
        )
        from multimodal_particles.models.generative.absorbing.states import (
            AbsorbingBridgeState as _RefState,
        )

        RefState = _RefState
        ref_config = RefConfig.from_yaml(config_path)
        ref_config.data.num_jets = 100
        ref_config.bridge.num_timesteps = args.sampler_steps
        ref_model = RefAF(ref_config)
        # the reference's own optimizer setup (absorbing_flows.py:327-336):
        # Adam + CosineAnnealingLR, per-epoch cadence
        opt = torch.optim.Adam(ref_model.parameters(), lr=ref_config.train.lr)
        sp = config.train.scheduler_params
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=sp["T_max"], eta_min=sp["eta_min"], last_epoch=-1
        )
        dm.set_dataloader()  # identical batch sequence as the JAX run
        ref_model.train()
        t0 = time.time()
        final_loss = float("nan")
        for epoch in range(epochs):
            for batch in dm.train:
                tb = to_torch_databatch(batch, torch)
                loss = ref_model.training_step(tb, 0)
                opt.zero_grad()
                loss.backward()
                opt.step()
                final_loss = float(loss.detach())
            sched.step()
        torch_train_s = time.time() - t0
        ref_final_loss = final_loss
        ref_model.eval()
        print(f"[seed {seed}][torch-ref] trained in {torch_train_s:.1f}s: "
              f"train={final_loss:.4f}")

    # ------------------------------------------------------------ generation
    target = dm.dataclass.target
    mult_data_all = np.asarray(target.multiplicity).reshape(-1)
    N = config.data.max_num_particles
    chunks = [
        np.arange(i, min(i + args.gen_chunk, args.gen_jets))
        for i in range(0, args.gen_jets, args.gen_chunk)
    ]

    data_cloud = copy.deepcopy(target)
    data_cloud.postprocess(
        input_continuous=config.data.target_preprocess_continuous,
        input_discrete=config.data.target_preprocess_discrete,
        stats=config.data.target_preprocess_stats,
    )
    hl_data = JetClassHighLevelFeatures(data_cloud)
    features = ["pt", "m", "eta", "phi", "multiplicity", "Q_total", "Q_jet",
                "tau21", "tau32", "d2"]

    def score_gen(cont, disc, mask):
        cloud = state_to_cloud(
            cont, disc, mask, config.data.target_preprocess_stats, ParticleClouds
        )
        return score(JetClassHighLevelFeatures(cloud), hl_data, features)

    def src_for(mult, s):
        src_kwargs = dict(config.data.__dict__)
        src_kwargs.update(
            num_jets=args.gen_jets, target_multiplicity=mult, seed=s
        )
        src = ParticleClouds(dataset=config.data.source_name, **src_kwargs)
        src.preprocess(
            output_continuous=config.data.source_preprocess_continuous,
            output_discrete=config.data.source_preprocess_discrete,
            stats=config.data.source_preprocess_stats,
        )
        return src

    gen_src = src_for(mult_data_all, seed + 1)
    key = jax.random.PRNGKey(seed + 2)

    t0 = time.time()
    j_cont, j_disc, j_mask = gen_rebuild(
        model, params, gen_src, config, chunks, key, MultimodalDatabatch, jax, jnp
    )
    jax_gen_s = time.time() - t0
    rebuilt_metrics = score_gen(j_cont, j_disc, j_mask)
    print(f"[seed {seed}][jax] generated {args.gen_jets} jets in {jax_gen_s:.1f}s")

    reference_metrics = torch_gen_s = None
    if ref_model is not None:
        t0 = time.time()
        r_cont, r_disc, r_mask = gen_reference(
            ref_model, gen_src, chunks, MultimodalDatabatch, torch, RefState
        )
        torch_gen_s = time.time() - t0
        reference_metrics = score_gen(r_cont, r_disc, r_mask)
        print(f"[seed {seed}][torch-ref] generated {args.gen_jets} jets "
              f"in {torch_gen_s:.1f}s")

    ratios = None
    if reference_metrics:
        ratios = {
            k: round(rebuilt_metrics[k] / max(reference_metrics[k], 1e-9), 3)
            for k in rebuilt_metrics
            if rebuilt_metrics[k] is not None and reference_metrics.get(k)
        }

    # -------------------------------------------------- mask-dynamics stress
    # generate from deliberately WRONG source-multiplicity histograms and ask
    # whether the learned dynamics move multiplicity toward the data
    rng = np.random.default_rng(seed + 7)
    stress_hists = {
        "halved": np.clip(mult_data_all // 2, 1, N),
        "uniform": rng.integers(1, N + 1, size=mult_data_all.shape),
    }
    stress_chunks = [
        c[c < args.stress_jets] for c in chunks if (c < args.stress_jets).any()
    ]
    stress = {}
    for name, mult in stress_hists.items():
        src = src_for(mult, seed + 11)
        mult_init = np.asarray(src.mask[..., 0].sum(1))[: args.stress_jets]
        j_out = gen_rebuild(
            model, params, src, config, stress_chunks, key, MultimodalDatabatch,
            jax, jnp,
        )
        mult_fin = j_out[2][..., 0].sum(1)
        entry = {
            "rebuilt": {
                "mult_mean_init": round(float(mult_init.mean()), 3),
                "mult_mean_final": round(float(mult_fin.mean()), 3),
                "mult_mean_data": round(float(mult_data_all.mean()), 3),
                "KL_mult_init": round(_hist_kl(mult_init, mult_data_all, 0, N), 4),
                "KL_mult_final": round(_hist_kl(mult_fin, mult_data_all, 0, N), 4),
            }
        }
        entry["rebuilt"]["dynamics_correct_init"] = bool(
            entry["rebuilt"]["KL_mult_final"] < entry["rebuilt"]["KL_mult_init"]
        )
        if ref_model is not None:
            r_out = gen_reference(
                ref_model, src, stress_chunks, MultimodalDatabatch, torch,
                RefState,
            )
            r_fin = r_out[2][..., 0].sum(1)
            entry["reference"] = {
                "mult_mean_final": round(float(r_fin.mean()), 3),
                "KL_mult_final": round(_hist_kl(r_fin, mult_data_all, 0, N), 4),
            }
        stress[name] = entry
        print(f"[seed {seed}][stress {name}] "
              f"init KL {entry['rebuilt']['KL_mult_init']} -> "
              f"final KL {entry['rebuilt']['KL_mult_final']}")

    return {
        "seed": seed,
        "train_steps": epochs * steps_per_epoch,
        "rebuilt": {
            "final_train_loss": round(jax_final["train_loss"], 4),
            "train_wall_s": round(jax_train_s, 1),
            "gen_wall_s": round(jax_gen_s, 1),
            "metrics": rebuilt_metrics,
        },
        "reference": None
        if reference_metrics is None
        else {
            "final_train_loss": round(ref_final_loss, 4),
            "train_wall_s": round(torch_train_s, 1),
            "gen_wall_s": round(torch_gen_s, 1),
            "metrics": reference_metrics,
        },
        "ratio_rebuilt_over_reference": ratios,
        "mask_dynamics_stress": stress,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--gen-jets", type=int, default=2048)
    ap.add_argument("--gen-chunk", type=int, default=1024)
    ap.add_argument("--sampler-steps", type=int, default=500)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument(
        "--out",
        default=os.path.join(REPO_ROOT, "benchmarks",
                             "quality_parity_absorbing.json"),
    )
    ap.add_argument("--stress-jets", type=int, default=512,
                    help="stress-test generation size (gen from a wrong "
                         "histogram is 2 extra gens per model per seed)")
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--death-rate-scale", type=float, default=0.0,
                    help="opt-in sampling-time death channel on the REBUILD "
                         "side (see BridgeConfig.death_rate_scale); 0.0 = "
                         "exact reference birth-only solver")
    ap.add_argument("--params-cache", default=None,
                    help="directory to cache/reuse trained rebuild params "
                         "(keyed on seed/dropout/epochs/steps; death scale "
                         "excluded — it is sampling-only)")
    ap.add_argument("--target-dropout", type=float, default=0.0,
                    help="source-consistent mask-bridge augmentation for "
                         "the REBUILD side (see BridgeConfig.target_dropout"
                         "); keep 0.0 for reference-semantics head-to-head")
    args = ap.parse_args()
    args.stress_jets = min(args.stress_jets, args.gen_jets)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    def write_out(runs):
        median_ratios = None
        keyed = [
            r["ratio_rebuilt_over_reference"]
            for r in runs
            if r["ratio_rebuilt_over_reference"]
        ]
        if keyed:
            common = set(keyed[0])
            for k in keyed[1:]:
                common &= set(k)
            median_ratios = {
                k: round(float(np.median([r[k] for r in keyed])), 3)
                for k in sorted(common)
            }

        result = {
            "protocol": (
                "both models trained on the identical preprocessed AOJ-mini "
                "split (config-absorbing-test), identical batch sequence, "
                "equal steps; generation from identical noise sources with "
                "source masks from the data multiplicity histogram at equal "
                "sampler steps — reference side via its own "
                "simulate_dynamics (predict_step is broken upstream); "
                "gen-vs-data KL/W1 with the reference's metric machinery, "
                "plus wrong-histogram mask-dynamics stress tests"
            ),
            "config": "config-absorbing-test (AOJ mini, 100 jets)",
            "epochs": args.epochs,
            "sampler_steps": args.sampler_steps,
            "gen_jets": args.gen_jets,
            "stress_jets": args.stress_jets,
            "target_dropout": args.target_dropout,
            "death_rate_scale": args.death_rate_scale,
            "platform": args.platform,
            "seeds_done": [r["seed"] for r in runs],
            "seeds": runs,
            "median_ratio_rebuilt_over_reference": median_ratios,
        }
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
        return median_ratios

    runs = []
    for s in args.seeds:
        runs.append(run_seed(args, s))
        median_ratios = write_out(runs)  # crash-proof: persist per seed
    print(json.dumps({"median_ratios": median_ratios}, indent=2))


if __name__ == "__main__":
    main()
