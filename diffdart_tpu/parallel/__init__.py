from diffdart_tpu.parallel.comm import make_mesh, shard_batch, data_parallel_grad  # noqa: F401
