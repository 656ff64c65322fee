"""Bulk generation driver: the data-parallel 1M-jet sampling sweep
(BASELINE.md workload 5).

Generation is embarrassingly parallel across jets: the batch axis is sharded
over the 'data' mesh axis, the jitted 100-step sampler scan runs once per
chunk, and no cross-chip collectives occur inside the sampler (SURVEY.md
§2.9). Source clouds are drawn on the fly from the configured noise source,
so arbitrarily many jets stream through a fixed-shape compiled program.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
    MultimodalDatabatch,
)
from multimodal_particles_tpu.data.particle_clouds.utils import (
    sample_masks,
    sample_noise,
)
from multimodal_particles_tpu.parallel.mesh import make_device_mesh, shard_batch


def make_source_batch(rng, config, batch_size, target_multiplicity=None):
    """Draw a source noise batch shaped like the training source coupling."""
    continuous, discrete = sample_noise(
        rng,
        config.data.source_name,
        num_jets=batch_size,
        max_num_particles=config.data.max_num_particles,
    )
    mask = sample_masks(
        rng,
        target_multiplicity=target_multiplicity,
        min_num_particles=config.data.min_num_particles,
        max_num_particles=config.data.max_num_particles,
        num_jets=batch_size,
    )
    # tokenized source (the model consumes tokens after preprocessing)
    flavor = discrete[..., :5]
    charge = discrete[..., 5]
    from multimodal_particles_tpu.data.particle_clouds.utils import physics_to_onehot

    tokens = np.argmax(physics_to_onehot(flavor, charge), axis=-1)[..., None]
    zeros = np.zeros_like(continuous)
    return MultimodalDatabatch(
        source_continuous=continuous * mask,
        source_discrete=tokens * mask,
        source_mask=mask,
        target_continuous=zeros,
        target_discrete=np.zeros_like(tokens),
        target_mask=mask,
    )


def bulk_sample(
    model,
    params,
    config,
    num_jets,
    batch_size=8192,
    seed=0,
    mesh=None,
    target_multiplicity=None,
    collect=True,
):
    """Generate `num_jets` particle clouds with the trained model.

    Returns (dict of stacked arrays or None, stats dict with throughput).
    """
    mesh = mesh if mesh is not None else make_device_mesh()
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    sampler = jax.jit(model.predict)

    chunks = []
    done = 0
    t0 = time.perf_counter()
    n_chunks = (num_jets + batch_size - 1) // batch_size
    for i in range(n_chunks):
        batch = make_source_batch(rng, config, batch_size, target_multiplicity)
        batch = shard_batch(batch, mesh)
        out = sampler(params, batch, jax.random.fold_in(key, i))
        take = min(batch_size, num_jets - done)
        if collect:
            chunks.append(
                {
                    "continuous": np.asarray(out.continuous)[:take],
                    "discrete": np.asarray(out.discrete)[:take],
                    "mask": np.asarray(
                        out.absorbing
                        if getattr(out, "absorbing", None) is not None
                        else out.mask_t
                    )[:take],
                }
            )
        else:
            # force execution with a 4-byte fetch
            float(jnp.sum(out.continuous[0, 0]))
        done += take
    dt = time.perf_counter() - t0

    stats = {
        "num_jets": done,
        "wall_time_s": dt,
        "jets_per_sec": done / dt,
        "jets_per_sec_per_chip": done / dt / max(jax.device_count(), 1),
        "devices": jax.device_count(),
        "mesh": dict(mesh.shape),
    }
    if collect:
        result = {
            k: np.concatenate([c[k] for c in chunks], axis=0) for k in chunks[0]
        }
        return result, stats
    return None, stats
