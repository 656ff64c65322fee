"""Reconstruction-guidance conditioning demo for the transdimensional
family: complete a jet whose first k particles are observed.

Trains TransdimensionalJumpDiffusion briefly on the bundled AOJ-mini shard,
then samples with `do_conditioning=True`: at every reverse step the l2
reconstruction error of the observed entries under the model's x0
prediction is differentiated through the network (jax.value_and_grad) and
added to the score — the reference's autograd guidance re-designed as a
jit-able branch (reference: models/generative/transdimensional/
sampler.py:102-155; the reference only ever wired the condition builder for
its dead QM9 pipeline — qm9.py:1981 — so jet conditioning is new here).

  python examples/conditional_generation_demo.py --epochs 100
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--sampler-steps", type=int, default=100)
    ap.add_argument("--observed-particles", type=int, default=4)
    ap.add_argument("--guidance-weight", type=float, default=2.0)
    ap.add_argument("--out", default="/tmp/conditional_demo_run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_particles_tpu.config_classes.transdimensional_unconditional_config import (
        TransdimensionalEpicConfig,
    )
    from multimodal_particles_tpu.models.generative.transdimensional.sampler import (
        Condition,
    )
    from multimodal_particles_tpu.models.generative.transdimensional.structure import (
        adjust_state,
    )
    from multimodal_particles_tpu.training.transdimensional_experiment import (
        TransdimensionalExperiment,
    )

    config = TransdimensionalEpicConfig()
    config.data.num_jets = 100
    config.sampler_kwargs.dt = 1.0 / args.sampler_steps
    config.sampler_kwargs.do_conditioning = True
    config.sampler_kwargs.guidance_weight = args.guidance_weight
    # the guidance gradient can push a briefly-trained model off-manifold;
    # the robustness clamp keeps tail trajectories bounded (data is O(1))
    config.sampler_kwargs.clip_lats = 10.0
    # run-length-scaled optimization (see scripts/quality_families.py)
    config.optimizer_kwargs.lr = 1e-3
    config.ema_halflife_kimg = 10

    experiment = TransdimensionalExperiment(config, experiment_dir=args.out)
    experiment.trainer.files = None
    experiment.trainer.fit(experiment.datamodule, epochs=args.epochs)
    model = experiment.model
    trainer = experiment.trainer
    params = (
        trainer.state.ema_params
        if trainer.state.ema_params is not None
        else trainer.state.params
    )

    batch = next(iter(experiment.datamodule.train))
    state = model._as_state(batch)
    B = state.B

    # observe the first k (highest-pT) particles of each data jet, in the
    # conditioned-state geometry (the guidance l2 compares CoM-adjusted
    # k-particle states — reference sampler.py:115-129)
    k = args.observed_particles
    cond_dims = jnp.full((B,), k, jnp.int32)
    cond_state, _ = adjust_state(state.delete_dims(cond_dims))
    cond_mask = state.get_mask_flat(cond_dims)
    cond_lats = cond_state.get_flat_lats() * cond_mask
    condition = Condition(lats=cond_lats, mask=cond_mask, dims=cond_dims)

    final, nfe = jax.jit(
        lambda p, key: model.sample(p, key, state, condition)
    )(params, jax.random.PRNGKey(1))

    d = np.asarray(final.dims)
    # score in the same geometry: project the generated jets onto their
    # first k particles and CoM-adjust, then compare with the condition
    gen_proj, _ = adjust_state(final.delete_dims(cond_dims))
    gen_k = np.asarray(gen_proj.continuous[:, :k, :])
    obs_k = np.asarray(cond_state.continuous[:, :k, :])
    err = np.abs(gen_k - obs_k).mean()
    print(
        f"conditioned sampling: {B} jets, NFE={nfe}, "
        f"mean dims {d.mean():.1f} (data {np.asarray(state.dims).mean():.1f})"
    )
    print(
        f"mean |generated - observed| over the {k} conditioned particles "
        f"(CoM-adjusted geometry): {err:.3f} standardized units "
        f"(unconditioned jets differ by O(1))"
    )


if __name__ == "__main__":
    main()
