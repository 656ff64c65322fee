"""The 1M-jet bulk generation sweep (BASELINE.md workload 5).

Shards the batch axis over all local chips and streams noise-source batches
through the jitted 100-step hybrid sampler.

  python examples/bulk_generation_sweep.py --num-jets 1000000 --no-collect
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-jets", type=int, default=100_000)
    ap.add_argument("--batch-size", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--no-collect", action="store_true")
    ap.add_argument("--checkpoint", default=None, help="experiment dir to load")
    args = ap.parse_args()

    from multimodal_particles_tpu.config_classes import (
        MultimodalBridgeMatchingConfig,
    )
    from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
        JetsDataloaderModule,
    )
    from multimodal_particles_tpu.models.generative.multimodal_bridge_matching import (
        MultiModalBridgeMatching,
    )
    from multimodal_particles_tpu.parallel.bulk_sampling import bulk_sample

    if args.checkpoint:
        from multimodal_particles_tpu.training.multimodal_experiment import (
            MultimodalBridgeMatchingExperiment,
        )

        exp = MultimodalBridgeMatchingExperiment(experiment_dir=args.checkpoint)
        model, config = exp.model, exp.config
        params = exp.trainer.state.params
    else:
        config = MultimodalBridgeMatchingConfig()
        config.data.batch_size = args.batch_size
        config.bridge.num_timesteps = args.steps
        model = MultiModalBridgeMatching(config)
        batch = jax.tree_util.tree_map(
            jnp.asarray, JetsDataloaderModule.random_databatch(config)
        )
        params = model.init(jax.random.PRNGKey(0), batch)

    result, stats = bulk_sample(
        model,
        params,
        config,
        num_jets=args.num_jets,
        batch_size=args.batch_size,
        collect=not args.no_collect,
    )
    print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
