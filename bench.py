"""Benchmark: particle-cloud generation throughput at the 100-step hybrid
sampler (the BASELINE.md primary metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "jets/sec/chip", "vs_baseline": N}

Baseline target: 1M 128-particle jets/min on a v5e-8 at 100 sampler steps
≙ ~2083 jets/sec/chip (BASELINE.md).

Model: config-berlin scale (EPiC 2 blocks, hidden 16/16, N=128, vocab 8),
the reference's shipped hybrid-bridge workload.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_JETS_PER_SEC_PER_CHIP = 1_000_000 / 60 / 8  # ≈ 2083.3


def build(batch_size: int, num_timesteps: int, compute_dtype: str, family="mbm",
          num_particles: int = 128):
    from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
        JetsDataloaderModule,
    )

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
        model = TransdimensionalJumpDiffusion(config)
        rng = np.random.default_rng(0)
        n_particles = rng.integers(1, num_particles + 1, batch_size)
        batch = [
            jnp.asarray(n_particles),
            jnp.asarray(rng.standard_normal((batch_size, num_particles, 3)), jnp.float32),
            jnp.asarray(
                np.eye(8, dtype=np.float32)[rng.integers(0, 8, (batch_size, num_particles))]
            ),
        ]
    else:
        raise ValueError(family)

    params = model.init(jax.random.PRNGKey(0), batch)
    return model, config, params, batch


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
        "--model",
        default="mbm",
        choices=["mbm", "absorbing", "transdimensional"],
        help="model family to benchmark",
    )
    args = ap.parse_args()

    if args.smoke:
        args.batch_size, args.steps, args.iters = 64, 10, 2

    n_chips = jax.device_count()
    model, config, params, batch = build(
        args.batch_size, args.steps, args.dtype, args.model, args.particles
    )

    if args.train:
        import optax

        from multimodal_particles_tpu.training.trainer import resolve_train_config

        tx = optax.adamw(resolve_train_config(config).lr)
        opt_state = tx.init(params)

        @jax.jit
        def train_step(params, opt_state, key):
            (loss, _), grads = jax.value_and_grad(model.loss_fn, has_aux=True)(
                params, key, batch
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        key = jax.random.PRNGKey(0)
        params, opt_state, loss = train_step(params, opt_state, key)
        float(loss)  # sync after compile
        iters = max(args.iters * 5, 10)
        keys = np.asarray(jax.random.split(key, iters))
        t0 = time.perf_counter()
        for i in range(iters):
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(keys[i])
            )
        # the params chain forces sequential execution of every step; one
        # 4-byte fetch at the end synchronizes the whole run
        float(loss)
        dt = time.perf_counter() - t0
        steps_per_sec = iters / dt
        print(
            json.dumps(
                {
                    "metric": f"train steps/sec (batch {args.batch_size})",
                    "value": round(steps_per_sec, 3),
                    "unit": "steps/sec",
                    "vs_baseline": round(
                        steps_per_sec * args.batch_size / (1_000_000 / 60 / 8), 3
                    ),
                }
            )
        )
        return

    # the sampler returns a checksum scalar alongside the state so each timed
    # iteration can be synchronized by fetching 4 bytes (block_until_ready is
    # not a reliable barrier on the axon-tunnelled platform, and fetching the
    # full (B, N, 3) output would time the tunnel, not the chip)
    def run(params, batch, key):
        out = model.predict(params, batch, key)
        return jnp.sum(out.continuous) + jnp.sum(
            jnp.asarray(out.discrete, jnp.float32)
        )

    sampler = jax.jit(run)
    key = jax.random.PRNGKey(42)

    float(sampler(params, batch, key))  # warmup / compile

    t0 = time.perf_counter()
    for i in range(args.iters):
        float(sampler(params, batch, jax.random.fold_in(key, i)))
    dt = time.perf_counter() - t0

    jets = args.batch_size * args.iters
    jets_per_sec = jets / dt
    jets_per_sec_per_chip = jets_per_sec / n_chips

    label = {
        "mbm": "hybrid",
        "absorbing": "absorbing",
        "transdimensional": "jump-diffusion",
    }[args.model]
    result = {
        "metric": "particle-cloud samples/sec/chip at {}-step {} sampler".format(
            args.steps, label
        ),
        "value": round(jets_per_sec_per_chip, 2),
        "unit": "jets/sec/chip",
        "vs_baseline": round(jets_per_sec_per_chip / BASELINE_JETS_PER_SEC_PER_CHIP, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
