"""Emit a jax.profiler trace of the hybrid sampler (SURVEY.md §5.1: the
reference has no profiling; this is the framework's tracing hook).

  python scripts/profile_sampler.py --out /tmp/mbm_trace
  # then: tensorboard --logdir /tmp/mbm_trace  (or xprof)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/mbm_trace")
    ap.add_argument("--batch-size", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=100)
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

    config = MultimodalBridgeMatchingConfig()
    config.data.batch_size = args.batch_size
    config.bridge.num_timesteps = args.steps
    model = MultiModalBridgeMatching(config)
    batch = jax.tree_util.tree_map(
        jnp.asarray, JetsDataloaderModule.random_databatch(config)
    )
    params = model.init(jax.random.PRNGKey(0), batch)

    def run(params, batch, key):
        out = model.predict(params, batch, key)
        return jnp.sum(out.continuous)

    f = jax.jit(run)
    float(f(params, batch, jax.random.PRNGKey(0)))  # compile outside trace

    with jax.profiler.trace(args.out):
        float(f(params, batch, jax.random.PRNGKey(1)))
    print("trace written to", args.out)


if __name__ == "__main__":
    main()
