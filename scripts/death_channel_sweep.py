"""Death-channel operating-point sweep for the absorbing family
(VERDICT r4 task 3).

`BridgeConfig.death_rate_scale` (bridges.py `absorbing_death_hazard` /
`AbsorbingBridge.solver_step`) was built to close the over-multiplicity
correction gap: the reference's mask solver is birth-only
(reference: models/generative/bridges.py:233-249), so a generation init with
too-high multiplicity can never be corrected — the d=0.1 uniform stress in
`quality_absorbing_source_consistent.json` fails 1/3 seeds. The channel is
sampling-time only, so one trained d=0.1 model per seed serves the whole
scale sweep (params cached via the same key scheme as
scripts/quality_parity_absorbing.py).

Per seed x scale this records, on the exact protocol of the 3-seed d=0.1
artifact (config-absorbing-test, 2000 epochs, 250 sampler steps):
  - nominal generation (source masks from the data multiplicity histogram):
    full KL/W1 feature table -> the nominal-protocol cost of the channel;
  - uniform over-multiplicity stress: KL_mult init -> final (the failure the
    channel was designed to fix);
  - halved under-multiplicity stress: KL_mult init -> final (regression
    guard - deaths must not break the birth-side correction).

The result is merged into `quality_absorbing_source_consistent.json` as a
top-level `death_channel` block with a recommended (dropout, scale)
operating point.

  python scripts/death_channel_sweep.py --seeds 0 1 2 --scales 0.0 0.5 1.0 \
      --params-cache .cache/absorbing_params
"""

import argparse
import copy
import json
import os
import pickle
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
)
from quality_parity_absorbing import gen_rebuild  # noqa: E402
from quality_families import _hist_kl  # noqa: E402


def train_or_load(args, seed, config, dm, jax, jnp):
    from multimodal_particles_tpu.models.generative.absorbing.absorbing_flows import (
        AbsorbingFlow,
    )
    from multimodal_particles_tpu.training.trainer import Trainer

    model = AbsorbingFlow(config)
    cache_path = None
    if args.params_cache:
        os.makedirs(args.params_cache, exist_ok=True)
        # identical key scheme to quality_parity_absorbing.py so the two
        # harnesses share trained models; death_rate_scale is sampling-only
        # and deliberately not part of the key
        cache_path = os.path.join(
            args.params_cache,
            f"absorbing_s{seed}_d{args.target_dropout}_e{args.epochs}"
            f"_st{args.sampler_steps}.pkl",
        )
    if cache_path and os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            cached = pickle.load(f)
        params = jax.tree_util.tree_map(jnp.asarray, cached["params"])
        print(f"[seed {seed}] loaded cached params from {cache_path}")
        return model, params, cached["final_train_loss"], 0.0
    trainer = Trainer(model, config, experiment_files=None, seed=seed)
    dm.set_dataloader()
    t0 = time.time()
    history = trainer.fit(dm, epochs=args.epochs)
    train_s = time.time() - t0
    params = (
        trainer.state.ema_params
        if trainer.state.ema_params is not None
        else trainer.state.params
    )
    final_loss = history[-1]["train_loss"]
    print(f"[seed {seed}] trained in {train_s:.1f}s: train={final_loss:.4f}")
    if cache_path:
        with open(cache_path, "wb") as f:
            pickle.dump(
                {
                    "params": jax.tree_util.tree_map(np.asarray, params),
                    "final_train_loss": final_loss,
                },
                f,
            )
    return model, params, final_loss, train_s


def run_seed(args, seed):
    import jax
    import jax.numpy as jnp

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

    config_path = os.path.join(
        test_resources_dir, "configs_files", "config-absorbing-test.yaml"
    )
    config = AbsorbingConfig.from_yaml(config_path)
    config.data.num_jets = 100
    config.data.seed = seed
    config.bridge.num_timesteps = args.sampler_steps
    config.bridge.target_dropout = args.target_dropout
    config.train.epochs = args.epochs
    config.train.scheduler_params["T_max"] = args.epochs

    jets = JetDataclass(config)
    jets.preprocess()
    dm = JetsDataloaderModule(config, jets)
    config = dm.update_config(config)

    model, params, final_loss, train_s = train_or_load(
        args, seed, config, dm, jax, jnp
    )

    # --------------------------------------------- shared generation setup
    # (mirrors quality_parity_absorbing.py run_seed so numbers are
    # protocol-comparable with the 3-seed d=0.1 artifact)
    target = dm.dataclass.target
    mult_data_all = np.asarray(target.multiplicity).reshape(-1)
    N = config.data.max_num_particles
    chunks = [
        np.arange(i, min(i + args.gen_chunk, args.gen_jets))
        for i in range(0, args.gen_jets, args.gen_chunk)
    ]
    stress_chunks = [
        c[c < args.stress_jets] for c in chunks if (c < args.stress_jets).any()
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

    rng = np.random.default_rng(seed + 7)
    sources = {
        "nominal": src_for(mult_data_all, seed + 1),
        "halved": src_for(np.clip(mult_data_all // 2, 1, N), seed + 11),
        "uniform": src_for(
            rng.integers(1, N + 1, size=mult_data_all.shape), seed + 11
        ),
    }
    key = jax.random.PRNGKey(seed + 2)

    out = {"seed": seed, "final_train_loss": round(final_loss, 4),
           "train_wall_s": round(train_s, 1), "scales": {}}
    for scale in args.scales:
        cfg_s = copy.deepcopy(config)
        cfg_s.bridge.death_rate_scale = scale
        model_s = AbsorbingFlow(cfg_s)
        entry = {}
        t0 = time.time()
        for name, src in sources.items():
            ch = chunks if name == "nominal" else stress_chunks
            n_gen = args.gen_jets if name == "nominal" else args.stress_jets
            cont, disc, mask = gen_rebuild(
                model_s, params, src, cfg_s, ch, key, MultimodalDatabatch,
                jax, jnp,
            )
            mult_init = np.asarray(src.mask[..., 0].sum(1))[:n_gen]
            mult_fin = mask[..., 0].sum(1)
            rec = {
                "mult_mean_init": round(float(mult_init.mean()), 3),
                "mult_mean_final": round(float(mult_fin.mean()), 3),
                "mult_mean_data": round(float(mult_data_all.mean()), 3),
                "KL_mult_init": round(_hist_kl(mult_init, mult_data_all, 0, N), 4),
                "KL_mult_final": round(_hist_kl(mult_fin, mult_data_all, 0, N), 4),
            }
            rec["dynamics_correct_init"] = bool(
                rec["KL_mult_final"] < rec["KL_mult_init"]
            )
            if name == "nominal":
                rec["metrics"] = score_gen(cont, disc, mask)
            entry[name] = rec
            print(f"[seed {seed}][scale {scale}][{name}] "
                  f"KL {rec['KL_mult_init']} -> {rec['KL_mult_final']} "
                  f"(mean {rec['mult_mean_init']} -> {rec['mult_mean_final']}, "
                  f"data {rec['mult_mean_data']})")
        entry["gen_wall_s"] = round(time.time() - t0, 1)
        out["scales"][str(scale)] = entry
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--gen-jets", type=int, default=1024)
    ap.add_argument("--gen-chunk", type=int, default=1024)
    ap.add_argument("--sampler-steps", type=int, default=250)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--scales", type=float, nargs="+", default=[0.0, 0.5, 1.0])
    ap.add_argument("--stress-jets", type=int, default=512)
    ap.add_argument("--target-dropout", type=float, default=0.1)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--params-cache",
                    default=os.path.join(REPO_ROOT, ".cache",
                                         "absorbing_params"))
    ap.add_argument(
        "--artifact",
        default=os.path.join(REPO_ROOT, "benchmarks",
                             "quality_absorbing_source_consistent.json"),
        help="artifact to merge the death_channel block into",
    )
    ap.add_argument("--out", default=None,
                    help="optional standalone JSON copy of the block")
    args = ap.parse_args()
    args.stress_jets = min(args.stress_jets, args.gen_jets)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    block = {
        "protocol": (
            "same protocol as the top-level 3-seed d=0.1 artifact "
            "(config-absorbing-test, 2000 epochs, 250 sampler steps, "
            "nominal 1024 jets / stresses 512); death_rate_scale is "
            "sampling-time only, so each seed's trained d=0.1 params are "
            "shared across the whole scale sweep"
        ),
        "target_dropout": args.target_dropout,
        "scales": args.scales,
        "platform": args.platform,
        "seeds": [],
    }

    def persist():
        artifact = {}
        if os.path.exists(args.artifact):
            with open(args.artifact) as f:
                artifact = json.load(f)
        artifact["death_channel"] = block
        with open(args.artifact, "w") as f:
            json.dump(artifact, f, indent=2)
        if args.out:
            with open(args.out, "w") as f:
                json.dump(block, f, indent=2)

    for s in args.seeds:
        block["seeds"].append(run_seed(args, s))
        persist()  # crash-proof: persist per seed

    # ------------------------------------------------------------- summary
    def col(name, field, scale):
        return [sd["scales"][str(scale)][name][field] for sd in block["seeds"]]

    summary = {}
    for scale in args.scales:
        summary[str(scale)] = {
            "uniform_KL_final": col("uniform", "KL_mult_final", scale),
            "uniform_corrects": col("uniform", "dynamics_correct_init", scale),
            "halved_KL_final": col("halved", "KL_mult_final", scale),
            "halved_corrects": col("halved", "dynamics_correct_init", scale),
            "nominal_W1_multiplicity": [
                sd["scales"][str(scale)]["nominal"]["metrics"]
                ["W1_multiplicity"] for sd in block["seeds"]
            ],
        }
    block["per_scale_summary"] = summary
    persist()
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
