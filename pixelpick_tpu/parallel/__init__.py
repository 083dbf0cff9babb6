from pixelpick_tpu.parallel.mesh import get_mesh, shard_batch, shard_pytree
