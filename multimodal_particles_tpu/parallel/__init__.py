from multimodal_particles_tpu.parallel.mesh import (
    batch_sharding,
    make_device_mesh,
    replicated_sharding,
    shard_batch,
)
