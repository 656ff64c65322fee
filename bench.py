"""Benchmark: particle-cloud generation throughput at the 100-step sampler
(the BASELINE.md primary metric).

Default (no args) prints THREE JSON lines — absorbing and transdimensional
at their ledger shapes first, then the flagship MBM hybrid sampler LAST
(the driver parses the last line):
  {"metric": ..., "value": N, "unit": "jets/sec/chip", "vs_baseline": N,
   "tflops_per_sec": N, "mfu_vs_v5e_peak": N}

Baseline target: 1M 128-particle jets/min on a v5e-8 at 100 sampler steps
≙ ~2083 jets/sec/chip (BASELINE.md).

Model: config-berlin scale (EPiC 2 blocks, hidden 16/16, N=128, vocab 8),
the reference's shipped hybrid-bridge workload. `--scaled` bumps the
backbone to hidden 128/128 x 6 blocks (~1M params) — the scale the
parallel 'model' axis plumbing is meant to serve (VERDICT r2 #4).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_JETS_PER_SEC_PER_CHIP = 1_000_000 / 60 / 8  # ≈ 2083.3
# TPU v5e peak: 197 bf16 TFLOP/s per chip (the default matmul precision on
# this path runs bf16 passes, CLAUDE.md). MFU is reported against this even
# on CPU runs — it is a chip-utilization figure, not a portability one.
V5E_PEAK_TFLOPS = 197.0


def build(batch_size: int, num_timesteps: int, compute_dtype: str, family="mbm",
          num_particles: int = 128, scaled: bool = False, pallas: str = "auto"):
    from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
        JetsDataloaderModule,
    )

    def _scale_encoder(cfg):
        cfg.encoder.num_blocks = 6
        cfg.encoder.dim_hidden_local = 128
        cfg.encoder.dim_hidden_glob = 128
        cfg.encoder.dim_emb_time = 128
        cfg.encoder.dim_emb_features_continuous = 128
        cfg.encoder.dim_emb_features_discrete = 128

    if family == "mbm":
        from multimodal_particles_tpu.config_classes import (
            MultimodalBridgeMatchingConfig,
        )
        from multimodal_particles_tpu.models.generative.multimodal_bridge_matching import (
            MultiModalBridgeMatching,
        )

        config = MultimodalBridgeMatchingConfig()
        config.data.batch_size = batch_size
        config.data.max_num_particles = num_particles
        config.bridge.num_timesteps = num_timesteps
        config.parallel.compute_dtype = compute_dtype
        if scaled:
            _scale_encoder(config)
        model = MultiModalBridgeMatching(config)
        batch = jax.tree_util.tree_map(
            jnp.asarray, JetsDataloaderModule.random_databatch(config)
        )
    elif family == "absorbing":
        from multimodal_particles_tpu.config_classes import AbsorbingConfig
        from multimodal_particles_tpu.models.generative.absorbing.absorbing_flows import (
            AbsorbingFlow,
        )

        config = AbsorbingConfig()
        config.data.batch_size = batch_size
        config.data.max_num_particles = num_particles
        config.bridge.num_timesteps = num_timesteps
        config.parallel.compute_dtype = compute_dtype
        if scaled:
            _scale_encoder(config)
        model = AbsorbingFlow(config)
        batch = jax.tree_util.tree_map(
            jnp.asarray, JetsDataloaderModule.random_databatch(config)
        )
    elif family == "transdimensional":
        from multimodal_particles_tpu.config_classes.transdimensional_unconditional_config import (
            TransdimensionalEpicConfig,
        )
        from multimodal_particles_tpu.models.generative.transdimensional import (
            TransdimensionalJumpDiffusion,
        )

        config = TransdimensionalEpicConfig()
        config.data.batch_size = batch_size
        config.data.max_num_particles = num_particles
        config.sampler_kwargs.dt = 1.0 / num_timesteps
        if scaled:
            _scale_encoder(config)
        model = TransdimensionalJumpDiffusion(config)
        rng = np.random.default_rng(0)
        n_particles = rng.integers(1, num_particles + 1, batch_size)
        # attach a multiplicity prior so the bench times the full
        # quality-valid sampler (analytic dims=1 posterior incl. the
        # per-step gammainc survival term), exactly like trained use
        from types import SimpleNamespace

        from multimodal_particles_tpu.models.generative.transdimensional.structure import (
            DistributionNodes,
        )

        vals, counts = np.unique(n_particles, return_counts=True)
        model.graphical_structure = SimpleNamespace(
            nodes_dist=DistributionNodes(
                {int(v): int(c) for v, c in zip(vals, counts)}
            )
        )
        batch = [
            jnp.asarray(n_particles),
            jnp.asarray(rng.standard_normal((batch_size, num_particles, 3)), jnp.float32),
            jnp.asarray(
                np.eye(8, dtype=np.float32)[rng.integers(0, 8, (batch_size, num_particles))]
            ),
        ]
    else:
        raise ValueError(family)

    if pallas != "auto" and hasattr(config, "parallel"):
        config.parallel.use_pallas = False if pallas == "off" else True
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, config, params, batch


def _flops_of(compiled):
    """Algebraic FLOPs of one call of a compiled executable, via XLA
    cost analysis; None when the backend doesn't expose it."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):  # older JAX returns [dict]
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def _with_mfu(result, flops_per_call, calls, dt):
    if flops_per_call:
        tflops = flops_per_call * calls / dt / 1e12
        result["tflops_per_sec"] = round(tflops, 4)
        result["mfu_vs_v5e_peak"] = round(tflops / V5E_PEAK_TFLOPS, 6)
        result["flops_per_call"] = flops_per_call
    return result


def bench_train(args, family, batch_size=None, particles=None):
    import optax

    from multimodal_particles_tpu.training.trainer import resolve_train_config

    batch_size = batch_size or args.batch_size
    particles = particles or args.particles
    n_chips = jax.device_count()
    model, config, params, batch = build(
        batch_size, args.steps, args.dtype, family, particles,
        args.scaled, args.pallas,
    )
    tx = optax.adamw(resolve_train_config(config).lr)
    opt_state = tx.init(params)

    def train_step(params, opt_state, key):
        (loss, _), grads = jax.value_and_grad(model.loss_fn, has_aux=True)(
            params, key, batch
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(0)
    compiled = jax.jit(train_step).lower(params, opt_state, key).compile()
    flops = _flops_of(compiled)
    params, opt_state, loss = compiled(params, opt_state, key)
    float(loss)  # sync after compile
    iters = max(args.iters * 5, 10)
    keys = np.asarray(jax.random.split(key, iters))
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, loss = compiled(params, opt_state, jnp.asarray(keys[i]))
    # the params chain forces sequential execution of every step; one
    # 4-byte fetch at the end synchronizes the whole run
    float(loss)
    dt = time.perf_counter() - t0
    steps_per_sec = iters / dt
    result = {
        "metric": f"{family} train steps/sec (batch {batch_size}"
                  f"{', scaled backbone' if args.scaled else ''})",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec",
        "vs_baseline": round(
            steps_per_sec * batch_size / (1_000_000 / 60 / 8), 3
        ),
    }
    # cost_analysis covers the whole (sharded) executable; report per-chip
    # TFLOP/s so MFU is against the per-chip peak like jets/sec/chip
    print(json.dumps(_with_mfu(result, flops and flops / n_chips, iters, dt)))


def bench_sample(args, family, batch_size, steps, particles):
    n_chips = jax.device_count()
    model, config, params, batch = build(
        batch_size, steps, args.dtype, family, particles, args.scaled,
        args.pallas
    )

    # the sampler returns a checksum scalar alongside the state so each timed
    # iteration can be synchronized by fetching 4 bytes (block_until_ready is
    # not a reliable barrier on the axon-tunnelled platform, and fetching the
    # full (B, N, 3) output would time the tunnel, not the chip)
    def run(params, batch, key):
        out = model.predict(params, batch, key)
        return jnp.sum(out.continuous) + jnp.sum(
            jnp.asarray(out.discrete, jnp.float32)
        )

    key = jax.random.PRNGKey(42)
    compiled = jax.jit(run).lower(params, batch, key).compile()
    flops = _flops_of(compiled)
    if flops:
        flops /= n_chips  # per-chip, like jets/sec/chip

    float(compiled(params, batch, key))  # warmup

    t0 = time.perf_counter()
    for i in range(args.iters):
        float(compiled(params, batch, jax.random.fold_in(key, i)))
    dt = time.perf_counter() - t0

    jets = batch_size * args.iters
    jets_per_sec_per_chip = jets / dt / n_chips

    label = {
        "mbm": "hybrid",
        "absorbing": "absorbing",
        "transdimensional": "jump-diffusion",
    }[family]
    result = {
        "metric": "particle-cloud samples/sec/chip at {}-step {} sampler"
                  "{}".format(steps, label,
                              " (scaled backbone)" if args.scaled else ""),
        "value": round(jets_per_sec_per_chip, 2),
        "unit": "jets/sec/chip",
        "vs_baseline": round(jets_per_sec_per_chip / BASELINE_JETS_PER_SEC_PER_CHIP, 3),
    }
    print(json.dumps(_with_mfu(result, flops, args.iters, dt)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--smoke", action="store_true", help="tiny shapes for CI")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--particles", type=int, default=128,
                    help="max_num_particles (109 = reference absorbing scale)")
    ap.add_argument(
        "--train", action="store_true", help="measure train steps/sec instead"
    )
    ap.add_argument(
        "--pallas", default="auto", choices=["auto", "off", "on"],
        help="force the Pallas kernel path on/off (default: model's auto gate)",
    )
    ap.add_argument(
        "--scaled", action="store_true",
        help="hidden 128/128 x 6 blocks (~1M-param backbone)",
    )
    ap.add_argument(
        "--model",
        default="all",
        choices=["all", "mbm", "absorbing", "transdimensional"],
        help="model family to benchmark ('all' = one line per family, MBM last)",
    )
    args = ap.parse_args()

    if args.smoke:
        args.batch_size, args.steps, args.iters = 64, 10, 2

    if args.train:
        if args.model != "all":
            bench_train(args, args.model)
        else:  # ledger shapes per family, MBM last (driver reads last line)
            for family, bsz, n in (
                ("absorbing", 4096, 109),
                ("transdimensional", 1024, 128),
                ("mbm", min(args.batch_size, 8192), args.particles),
            ):
                if args.smoke:
                    bsz, n = args.batch_size, 64
                bench_train(args, family, batch_size=bsz, particles=n)
        return

    if args.model != "all":
        bench_sample(args, args.model, args.batch_size, args.steps, args.particles)
        return

    # all-families default: ledger shapes for the two auxiliary families,
    # flagship MBM LAST — the driver records the last line (VERDICT r2 #5)
    if args.smoke:
        fam_shapes = [("absorbing", 64, 10, 64), ("transdimensional", 64, 10, 64)]
    else:
        fam_shapes = [
            ("absorbing", 4096, args.steps, 109),
            # 96 steps = the quality-valid operating point (multi-birth
            # tau-leap, KL_mult 0.554 vs 0.602 at 1000 single-birth steps —
            # benchmarks/quality_transdim.json)
            ("transdimensional", 4096, 96, 128),
        ]
    for family, bsz, steps, n in fam_shapes:
        bench_sample(args, family, bsz, steps, n)
    bench_sample(args, "mbm", args.batch_size, args.steps, args.particles)


if __name__ == "__main__":
    main()
