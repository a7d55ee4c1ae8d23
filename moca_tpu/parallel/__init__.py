from moca_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, make_sharded_unet_apply, replicate, shard_batch,
)
