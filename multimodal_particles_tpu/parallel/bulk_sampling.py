"""Bulk generation driver: the data-parallel 1M-jet sampling sweep
(BASELINE.md workload 5).

Generation is embarrassingly parallel across jets: the batch axis is sharded
over the 'data' mesh axis, the jitted 100-step sampler scan runs once per
chunk, and no cross-chip collectives occur inside the sampler (SURVEY.md
§2.9).

Source clouds are drawn ON DEVICE inside the jitted program (Gaussian
kinematics + categorical tokens + histogram-sampled masks): with a single
host core, host-side numpy noise generation throttles the sweep ~25×
(measured 2.1k vs 53k jets/s/chip), so the host loop only dispatches keys.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_particles_tpu.data.particle_clouds.jets_dataloader import (
    MultimodalDatabatch,
)

# token distribution implied by the reference noise source: flavor uniform
# over 5 species (cat_probs), charged species split ± with prob 1/2
# (reference: data/particle_clouds/utils.py:222-251 + physics_to_onehot)
def token_probs_from_cat_probs(cat_probs):
    p = np.asarray(cat_probs, dtype=np.float64)
    return np.array(
        [p[0], p[1], p[2] / 2, p[2] / 2, p[3] / 2, p[3] / 2, p[4] / 2, p[4] / 2]
    )


def make_device_source_sampler(config, batch_size, multiplicity_hist=None, scale=1.0,
                               cat_probs=(0.2, 0.2, 0.2, 0.2, 0.2)):
    """Returns a jit-able fn key → MultimodalDatabatch with device-side
    GaussNoise kinematics, categorical tokens and histogram masks."""
    N = config.data.max_num_particles
    dim_c = config.data.dim_features_continuous
    token_logp = jnp.log(jnp.asarray(token_probs_from_cat_probs(cat_probs)))

    if multiplicity_hist is not None:
        counts = np.zeros(N + 1)
        for n, c in multiplicity_hist.items():
            counts[min(int(n), N)] += c
        mult_logp = jnp.log(jnp.asarray(counts / counts.sum() + 1e-30))
    else:
        mult_logp = None

    def sample(key):
        key_x, key_k, key_m = jax.random.split(key, 3)
        continuous = jax.random.normal(key_x, (batch_size, N, dim_c)) * scale
        tokens = jax.random.categorical(
            key_k, token_logp, shape=(batch_size, N)
        )[..., None]
        if mult_logp is not None:
            mult = jax.random.categorical(key_m, mult_logp, shape=(batch_size,))
            mask = (jnp.arange(N)[None, :] < mult[:, None]).astype(jnp.int32)[..., None]
        else:
            mask = jnp.ones((batch_size, N, 1), jnp.int32)
        zeros = jnp.zeros_like(continuous)
        return MultimodalDatabatch(
            source_continuous=continuous * mask,
            source_discrete=tokens * mask,
            source_mask=mask,
            target_continuous=zeros,
            target_discrete=jnp.zeros_like(tokens),
            target_mask=mask,
        )

    return sample


def bulk_sample(
    model,
    params,
    config,
    num_jets,
    batch_size=8192,
    seed=0,
    mesh=None,
    target_multiplicity=None,
    multiplicity_hist=None,
    collect=True,
):
    """Generate `num_jets` particle clouds with the trained model.

    The per-chunk program = device-side source sampling + the full sampler
    scan, compiled once; chunks differ only by the folded PRNG key.

    Returns (dict of stacked arrays or None, stats dict with throughput).
    """
    from multimodal_particles_tpu.parallel.mesh import make_device_mesh

    mesh = mesh if mesh is not None else make_device_mesh()
    key = jax.random.PRNGKey(seed)

    # the transdimensional family needs no source cloud — its sampler draws
    # x ~ N(0, I) at dims=1 internally and only takes SHAPES from the batch
    is_transdim = hasattr(model, "jump_diffusion_loss")

    if not is_transdim:
        if multiplicity_hist is None and target_multiplicity is not None:
            from multimodal_particles_tpu.data.particle_clouds.utils import (
                sizes_to_histograms,
            )

            multiplicity_hist = sizes_to_histograms(target_multiplicity)
        if multiplicity_hist is None:
            hist_cfg = (config.data.target_info or {}).get("hist_num_particles")
            multiplicity_hist = hist_cfg

        source_sampler = make_device_source_sampler(
            config, batch_size, multiplicity_hist
        )
    else:
        if multiplicity_hist is not None or target_multiplicity is not None:
            raise ValueError(
                "the transdimensional family generates its own multiplicity "
                "via birth jumps — target_multiplicity/multiplicity_hist "
                "would be silently ignored"
            )
        N = config.data.max_num_particles
        Dc = config.data.dim_features_continuous
        V = config.data.vocab_size_features

        def source_sampler(key):
            # shapes-only template (the jump sampler starts from dims=1,
            # x ~ N(0, I) drawn internally); built inside the jitted chunk
            # so the zeros are device-materialized, never jaxpr constants
            del key
            return [
                jnp.ones((batch_size,), jnp.int32),
                jnp.zeros((batch_size, N, Dc), jnp.float32),
                jnp.zeros((batch_size, N, V), jnp.float32),
            ]

    from multimodal_particles_tpu.parallel.mesh import batch_sharding

    sharding = batch_sharding(mesh)

    def chunk(params, key):
        key_src, key_samp = jax.random.split(key)
        batch = source_sampler(key_src)
        # pin the generated batch to the 'data' axis so the sampler runs
        # embarrassingly parallel across chips
        batch = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, sharding), batch
        )
        out = model.predict(params, batch, key_samp)
        # in-program checksum: syncing a chunk costs one 4-byte fetch
        if is_transdim:
            checksum = jnp.sum(out.continuous[0, 0]) + jnp.sum(out.dims[0])
            # token/mask conversion in-program (a host-loop argmax would
            # cost one extra ~30 ms remote dispatch per chunk)
            out = {
                "continuous": out.continuous,
                "discrete": jnp.argmax(out.discrete, axis=-1)[..., None],
                "mask": out.particle_mask().astype(jnp.int32)[..., None],
            }
        else:
            checksum = jnp.sum(out.continuous[0, 0]) + jnp.sum(out.discrete[0, 0])
        return out, checksum

    chunk_fn = jax.jit(chunk)

    chunks = []
    done = 0
    n_chunks = (num_jets + batch_size - 1) // batch_size
    # precompute all chunk keys in ONE device call (a per-chunk fold_in
    # dispatch costs ~100 ms over the remote tunnel)
    all_keys = np.asarray(jax.random.split(key, max(n_chunks, 1)))
    # warm up / compile outside the timer (chunk 0 is re-run timed below)
    _, warm = chunk_fn(params, jnp.asarray(all_keys[0]))
    float(warm)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        out, checksum = chunk_fn(params, jnp.asarray(all_keys[i]))
        take = min(batch_size, num_jets - done)
        if collect:
            if is_transdim:
                chunks.append(
                    {k: np.asarray(v)[:take] for k, v in out.items()}
                )
            else:
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
            float(checksum)  # 4-byte sync per chunk
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
