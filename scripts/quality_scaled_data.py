"""MBM quality at a data scale where the metrics discriminate (VERDICT r4 #2).

Every prior quality artifact scores against the bundled 100-jet AOJ-mini
shard, where a PERFECT model floors at KL_pt ~ 1.6 / KL_multiplicity ~ 10
(benchmarks/metric_floors.json) — the metric cannot fail a model there.
This harness trains the flagship MBM family on a synthetic 20k-jet
JetClass-schema shard (scripts/make_jetclass_synth.py — honest label: the
physics is SYNTHETIC, a 3-class prong mixture; the schema, featurization,
preprocessing, training, sampling and scoring paths are the production
ones), measures the metric floors AT THIS SCALE with the same plug-in
bootstrap as scripts/metric_floors.py, generates 10k jets, and reports
gen-vs-data KL/W1 next to those floors.

Pass/fail intent: the floors here are ~10-100x smaller than at 100 jets
(the metric can fail), and the rebuild's absolute numbers should sit within
a small multiple of them. Reference scoring contract:
/root/reference/multimodal_particles/data/particle_clouds/jets.py:314-332.

  PYTHONPATH=/root/.axon_site:/root/repo python scripts/quality_scaled_data.py \
      --train-steps 6000 --gen-jets 10000 --platform tpu \
      --out benchmarks/quality_mbm_scaled_data.json
"""

import argparse
import copy
import json
import math
import os
import sys
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_jetclass_synth import write_synthetic_jetclass_shard  # noqa: E402
from metric_floors import bootstrap_floors  # noqa: E402
from quality_families import _hist_kl  # noqa: E402
from quality_parity import (  # noqa: E402
    make_gen_databatch,
    score,
    state_to_cloud,
)

FEATURES = ["pt", "m", "eta", "phi", "multiplicity", "Q_total", "Q_jet",
            "tau21", "tau32", "d2"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-data", type=int, default=20000)
    ap.add_argument("--max-particles", type=int, default=64)
    ap.add_argument("--data-seed", type=int, default=20260819)
    ap.add_argument("--train-steps", type=int, default=6000)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--hidden", type=int, default=64,
                    help="encoder width (<=64 keeps the narrow fused "
                         "kernels; the 20k-jet mixture underfits at the "
                         "config-mbm-test width 16)")
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--gen-jets", type=int, default=10000)
    ap.add_argument("--gen-chunk", type=int, default=2048)
    ap.add_argument("--sampler-steps", type=int, default=0,
                    help="0 = keep the config value")
    ap.add_argument("--boots", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--shard", default=None,
                    help="existing shard path (default: generate into .cache)")
    ap.add_argument("--out",
                    default=os.path.join(REPO_ROOT, "benchmarks",
                                         "quality_mbm_scaled_data.json"))
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from multimodal_particles_tpu import test_resources_dir
    from multimodal_particles_tpu.config_classes import (
        MultimodalBridgeMatchingConfig,
    )
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
    from multimodal_particles_tpu.models.generative.multimodal_bridge_matching import (
        MultiModalBridgeMatching,
    )
    from multimodal_particles_tpu.training.trainer import Trainer

    # ------------------------------------------------------------------ data
    shard = args.shard or os.path.join(
        REPO_ROOT, ".cache", f"jetclass_synth_{args.n_data}.h5"
    )
    if not os.path.exists(shard):
        t0 = time.time()
        write_synthetic_jetclass_shard(
            shard, args.n_data, args.max_particles, args.data_seed
        )
        print(f"[data] generated {shard} in {time.time() - t0:.1f}s")

    config = MultimodalBridgeMatchingConfig.from_yaml(
        os.path.join(test_resources_dir, "configs_files", "config-mbm-test.yaml")
    )
    config.data.target_name = "JetClass"
    config.data.target_path = [shard]
    config.data.num_jets = args.n_data
    config.data.max_num_particles = args.max_particles
    config.data.batch_size = args.batch_size
    config.data.seed = args.seed
    if args.sampler_steps:
        config.bridge.num_timesteps = args.sampler_steps
    enc = config.encoder
    enc.num_blocks = args.blocks
    enc.dim_hidden_local = enc.dim_hidden_glob = args.hidden
    enc.dim_emb_time = args.hidden
    enc.dim_emb_features_continuous = args.hidden
    enc.dim_emb_features_discrete = args.hidden

    jets = JetDataclass(config)
    jets.preprocess()
    dm = JetsDataloaderModule(config, jets)
    config = dm.update_config(config)
    steps_per_epoch = max(len(dm.train), 1)
    epochs = max(1, math.ceil(args.train_steps / steps_per_epoch))
    config.train.epochs = epochs
    config.train.scheduler_params["T_max"] = epochs
    print(f"[data] {len(dm.dataset)} jets, {steps_per_epoch} steps/epoch, "
          f"{epochs} epochs (~{epochs * steps_per_epoch} steps)")

    # ----------------------------------------------------------------- train
    model = MultiModalBridgeMatching(config)
    trainer = Trainer(model, config, experiment_files=None, seed=args.seed)
    dm.set_dataloader()
    t0 = time.time()
    history = trainer.fit(dm, epochs=epochs)
    train_s = time.time() - t0
    final = history[-1]
    print(f"[train] {epochs} epochs in {train_s:.1f}s: "
          f"train={final['train_loss']:.4f} val={final['val_loss']:.4f}")
    params = (
        trainer.state.ema_params
        if trainer.state.ema_params is not None
        else trainer.state.params
    )

    # ------------------------------------------------------------ generation
    src_kwargs = dict(config.data.__dict__)
    src_kwargs.update(
        num_jets=args.gen_jets,
        target_multiplicity=jets.target.multiplicity,
        seed=args.seed + 1,
    )
    gen_src = ParticleClouds(dataset=config.data.source_name, **src_kwargs)
    gen_src.preprocess(
        output_continuous=config.data.source_preprocess_continuous,
        output_discrete=config.data.source_preprocess_discrete,
        stats=config.data.source_preprocess_stats,
    )
    chunks = [
        np.arange(i, min(i + args.gen_chunk, args.gen_jets))
        for i in range(0, args.gen_jets, args.gen_chunk)
    ]
    predict = jax.jit(model.predict)
    key = jax.random.PRNGKey(args.seed + 2)
    outs = []
    t0 = time.time()
    for i, chunk in enumerate(chunks):
        db = make_gen_databatch(MultimodalDatabatch, gen_src, chunk)
        db = jax.tree_util.tree_map(jnp.asarray, db)
        out = predict(params, db, jax.random.fold_in(key, i))
        outs.append(jax.tree_util.tree_map(np.asarray, out))
    gen_s = time.time() - t0
    gen_cloud = state_to_cloud(
        np.concatenate([o.continuous for o in outs]),
        np.concatenate([o.discrete for o in outs]),
        np.concatenate([np.asarray(o.absorbing, np.int64) for o in outs]),
        config.data.target_preprocess_stats,
        ParticleClouds,
    )
    print(f"[gen] {args.gen_jets} jets in {gen_s:.1f}s")

    # --------------------------------------------------------------- scoring
    data_cloud = copy.deepcopy(jets.target)
    data_cloud.postprocess(
        input_continuous=config.data.target_preprocess_continuous,
        input_discrete=config.data.target_preprocess_discrete,
        stats=config.data.target_preprocess_stats,
    )
    hl_data = JetClassHighLevelFeatures(data_cloud)
    N = config.data.max_num_particles
    mult_data = np.asarray(data_cloud.multiplicity).reshape(-1)

    metrics = score(JetClassHighLevelFeatures(gen_cloud), hl_data, FEATURES)
    mult_gen = np.asarray(gen_cloud.multiplicity).reshape(-1)
    metrics["KL_mult_hist"] = round(_hist_kl(mult_gen, mult_data, 0, N), 4)

    # ------------------------------------------------- floors at THIS scale
    t0 = time.time()
    floors = bootstrap_floors(
        data_cloud, hl_data, FEATURES, args.gen_jets, args.boots, args.seed
    )
    print(f"[floors] {args.boots} boots at gen_jets={args.gen_jets}: "
          f"{time.time() - t0:.1f}s")

    ratio_to_floor = {}
    for k, v in metrics.items():
        fl = floors.get(k)
        if v is not None and fl and fl["median"]:
            ratio_to_floor[k] = round(v / max(fl["median"], 1e-9), 2)

    result = {
        "protocol": (
            "SYNTHETIC JetClass-schema data (3-class prong mixture, "
            "make_jetclass_synth.py — the physics is synthetic; schema, "
            "featurization, preprocessing, training, sampling and scoring "
            "are the production paths); MBM trained on the full shard; "
            "gen-vs-data KL/W1 with the reference's metric machinery; "
            "floors = plug-in bootstrap at the same generation size "
            "(metric_floors.py)"
        ),
        "data": {
            "shard": os.path.basename(shard),
            "n_jets": args.n_data,
            "max_particles": args.max_particles,
            "data_seed": args.data_seed,
        },
        "train_steps": epochs * steps_per_epoch,
        "batch_size": args.batch_size,
        "sampler_steps": config.bridge.num_timesteps,
        "gen_jets": args.gen_jets,
        "platform": args.platform,
        "seed": args.seed,
        "rebuilt": {
            "final_train_loss": round(final["train_loss"], 4),
            "final_val_loss": round(final["val_loss"], 4),
            "train_wall_s": round(train_s, 1),
            "gen_wall_s": round(gen_s, 1),
            "metrics": metrics,
        },
        "floors_at_this_scale": floors,
        "ratio_to_floor_median": ratio_to_floor,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"metrics": metrics,
                      "ratio_to_floor": ratio_to_floor}, indent=2))
    print(f"[out] wrote {args.out}")


if __name__ == "__main__":
    main()
