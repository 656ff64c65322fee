"""Head-to-head quality gate: the upstream torch reference model vs the TPU
rebuild, trained on the identical AOJ-mini data, sampled at equal steps,
scored with identical metric machinery.

This is the BASELINE.md quality gate ("match the CPU reference's physics
marginals at equal sampler steps") made concrete: because the reference
publishes no numbers, the reference model is trained *here*, in-process
(utils/torch_reference.py stubs its absent heavy deps), on the exact
preprocessed arrays the rebuild trains on, and both models' generated jets
are scored gen-vs-data with the same KL/W1 observables
(reference: data/particle_clouds/jets.py:314-332, inference.ipynb cells 2-7).

  python scripts/quality_parity.py --train-steps 6000 --gen-jets 4096 \
      --out benchmarks/quality_parity_mbm.json

Runs on CPU by default (the torch reference is CPU-only here and the
config-mbm-test model is tiny); pass --platform tpu to put the JAX side on
the chip.
"""

import argparse
import copy
import json
import math
import os
import sys
import time
from types import SimpleNamespace

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def to_torch_databatch(batch, torch):
    """numpy MultimodalDatabatch → the same namedtuple of torch tensors."""
    fields = {}
    for name, value in batch._asdict().items():
        if value is None:
            continue
        t = torch.from_numpy(np.ascontiguousarray(value))
        fields[name] = t.float() if t.dtype == torch.float64 else t
    cls = type(batch)
    return cls(**{k: fields.get(k) for k in batch._fields})


def make_gen_databatch(Databatch, src, chunk):
    """Generation databatch: source fields from the noise cloud, target
    fields shape-correct dummies (unused by either sampler)."""
    return Databatch(
        source_continuous=src.continuous[chunk].astype(np.float32),
        source_discrete=src.discrete[chunk],
        source_mask=src.mask[chunk],
        target_continuous=np.zeros_like(src.continuous[chunk], dtype=np.float32),
        target_discrete=np.zeros_like(src.discrete[chunk]),
        target_mask=src.mask[chunk],
    )


def state_to_cloud(continuous, discrete, mask, stats, ParticleClouds):
    """Final sampler state → postprocessed physics-space cloud."""
    state = SimpleNamespace(
        continuous=np.asarray(continuous, np.float32),
        discrete=np.asarray(discrete, np.int64),
        absorbing=np.asarray(mask, np.int64),
    )
    cloud = ParticleClouds(state)
    cloud.stats = stats
    cloud.postprocess()
    return cloud


def score(hl_gen, hl_data, features):
    out = {}
    for feat in features:
        try:
            out[f"KL_{feat}"] = round(float(hl_gen.KLmetric1D(feat, hl_data)), 4)
            out[f"W1_{feat}"] = round(float(hl_gen.Wassertein1D(feat, hl_data)), 4)
        except Exception:
            out[f"KL_{feat}"] = None
            out[f"W1_{feat}"] = None
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=6000)
    ap.add_argument("--gen-jets", type=int, default=4096)
    ap.add_argument("--gen-chunk", type=int, default=1024)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--out", default=os.path.join(REPO_ROOT, "benchmarks", "quality_parity_mbm.json"))
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import torch

    torch.manual_seed(args.seed)

    from multimodal_particles_tpu import test_resources_dir
    from multimodal_particles_tpu.config_classes import MultimodalBridgeMatchingConfig
    from multimodal_particles_tpu.data.particle_clouds.jets import (
        JetClassHighLevelFeatures,
        JetDataclass,
    )
    from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
        JetsDataloaderModule,
        MultimodalDatabatch,
    )
    from multimodal_particles_tpu.data.particle_clouds.particles import ParticleClouds
    from multimodal_particles_tpu.models.generative.multimodal_bridge_matching import (
        MultiModalBridgeMatching,
    )
    from multimodal_particles_tpu.training.trainer import Trainer

    config_path = os.path.join(test_resources_dir, "configs_files", "config-mbm-test.yaml")
    config = MultimodalBridgeMatchingConfig.from_yaml(config_path)

    # ---------------------------------------------------------------- data
    # one shared dataset: both models see the exact same preprocessed arrays
    config.data.seed = args.seed  # deterministic noise source
    jets = JetDataclass(config)
    jets.preprocess()
    dm = JetsDataloaderModule(config, jets)
    config = dm.update_config(config)
    steps_per_epoch = max(len(dm.train), 1)
    epochs = max(1, math.ceil(args.train_steps / steps_per_epoch))
    config.train.epochs = epochs
    # identical annealing for both: anneal to eta_min exactly at the end of
    # the run (past T_max my schedule clamps at eta_min while torch's cycles
    # back up — setting T_max = epochs keeps both in the monotone regime)
    config.train.scheduler_params["T_max"] = epochs
    print(f"data: {len(dm.dataset)} jets, {steps_per_epoch} steps/epoch, "
          f"{epochs} epochs (~{epochs * steps_per_epoch} steps)")

    # ------------------------------------------------------------ JAX train
    model = MultiModalBridgeMatching(config)
    trainer = Trainer(model, config, experiment_files=None, seed=args.seed)
    dm.set_dataloader()
    t0 = time.time()
    history = trainer.fit(dm, epochs=epochs)
    jax_train_s = time.time() - t0
    jax_final = history[-1]
    print(f"[jax] trained {epochs} epochs in {jax_train_s:.1f}s: "
          f"train_loss={jax_final['train_loss']:.4f} val_loss={jax_final['val_loss']:.4f}")

    # ---------------------------------------------------------- torch train
    ref_metrics, ref_final_loss, torch_train_s = None, None, None
    if not args.skip_reference:
        from multimodal_particles_tpu.utils.torch_reference import load_reference

        ref_pkg = load_reference()
        assert ref_pkg is not None, "reference tree not mounted (MMP_REFERENCE_ROOT)"
        from multimodal_particles.config_classes.multimodal_bridge_matching_config import (
            MultimodalBridgeMatchingConfig as RefConfig,
        )
        from multimodal_particles.models.generative.multimodal_bridge_matching import (
            MultiModalBridgeMatching as RefMBM,
        )

        ref_config = RefConfig.from_yaml(config_path)
        ref_model = RefMBM(ref_config)
        opt = torch.optim.Adam(ref_model.parameters(), lr=ref_config.train.lr)
        sp = config.train.scheduler_params  # same (epoch-count) T_max as the JAX run
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
            sched.step()  # per-epoch, Lightning default cadence
        torch_train_s = time.time() - t0
        ref_final_loss = final_loss
        print(f"[torch-ref] trained {epochs} epochs in {torch_train_s:.1f}s: "
              f"final train_loss={final_loss:.4f}")

    # ------------------------------------------------------- shared sources
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

    # ------------------------------------------------------------- JAX gen
    import jax.numpy as jnp

    predict = jax.jit(model.predict)
    key = jax.random.PRNGKey(args.seed + 2)
    jax_outs = []
    t0 = time.time()
    for i, chunk in enumerate(chunks):
        db = make_gen_databatch(MultimodalDatabatch, gen_src, chunk)
        db = jax.tree_util.tree_map(jnp.asarray, db)
        out = predict(trainer.state.params, db, jax.random.fold_in(key, i))
        jax_outs.append(jax.tree_util.tree_map(np.asarray, out))
    jax_gen_s = time.time() - t0
    jax_gen = state_to_cloud(
        np.concatenate([o.continuous for o in jax_outs]),
        np.concatenate([o.discrete for o in jax_outs]),
        np.concatenate([np.asarray(o.absorbing, np.int64) for o in jax_outs]),
        config.data.target_preprocess_stats,
        ParticleClouds,
    )
    print(f"[jax] generated {args.gen_jets} jets in {jax_gen_s:.1f}s")

    # ----------------------------------------------------------- torch gen
    ref_gen, torch_gen_s = None, None
    if not args.skip_reference:
        ref_model.eval()
        t_outs = []
        t0 = time.time()
        with torch.no_grad():
            for chunk in chunks:
                db = make_gen_databatch(MultimodalDatabatch, gen_src, chunk)
                tb = to_torch_databatch(db, torch)
                final = ref_model.predict_step(tb, 0)
                t_outs.append(
                    (
                        final.continuous.numpy(),
                        final.discrete.numpy(),
                        final.absorbing.numpy(),
                    )
                )
        torch_gen_s = time.time() - t0
        ref_gen = state_to_cloud(
            np.concatenate([o[0] for o in t_outs]),
            np.concatenate([o[1] for o in t_outs]),
            np.concatenate([o[2] for o in t_outs]).astype(np.int64),
            config.data.target_preprocess_stats,
            ParticleClouds,
        )
        print(f"[torch-ref] generated {args.gen_jets} jets in {torch_gen_s:.1f}s")

    # -------------------------------------------------------------- scoring
    data_cloud = copy.deepcopy(jets.target)
    data_cloud.postprocess(
        input_continuous=config.data.target_preprocess_continuous,
        input_discrete=config.data.target_preprocess_discrete,
        stats=config.data.target_preprocess_stats,
    )
    hl_data = JetClassHighLevelFeatures(data_cloud)
    features = ["pt", "m", "eta", "phi", "multiplicity", "Q_total", "Q_jet",
                "tau21", "tau32", "d2"]

    rebuilt = score(JetClassHighLevelFeatures(jax_gen), hl_data, features)
    reference = (
        score(JetClassHighLevelFeatures(ref_gen), hl_data, features)
        if ref_gen is not None
        else None
    )

    ratios = None
    if reference:
        ratios = {}
        for k in rebuilt:
            if rebuilt[k] is not None and reference.get(k):
                ratios[k] = round(rebuilt[k] / max(reference[k], 1e-9), 3)

    result = {
        "protocol": (
            "both models trained on the identical preprocessed AOJ-mini split "
            "(config-mbm-test), identical batch sequence, equal steps; "
            "generation from the identical noise sources at equal sampler "
            "steps; gen-vs-data KL/W1 with the reference's metric machinery"
        ),
        "config": "config-mbm-test (AOJ mini, 100 jets)",
        "train_steps": epochs * steps_per_epoch,
        "sampler_steps": config.bridge.num_timesteps,
        "gen_jets": args.gen_jets,
        "platform": args.platform,
        "rebuilt": {
            "final_train_loss": round(jax_final["train_loss"], 4),
            "final_val_loss": round(jax_final["val_loss"], 4),
            "train_wall_s": round(jax_train_s, 1),
            "gen_wall_s": round(jax_gen_s, 1),
            "metrics": rebuilt,
        },
        "reference": None
        if reference is None
        else {
            "final_train_loss": round(ref_final_loss, 4),
            "train_wall_s": round(torch_train_s, 1),
            "gen_wall_s": round(torch_gen_s, 1),
            "metrics": reference,
        },
        "ratio_rebuilt_over_reference": ratios,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
