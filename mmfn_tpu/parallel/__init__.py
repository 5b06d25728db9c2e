from mmfn_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, replicate, shard_batch, tensor_parallel_sharding)
