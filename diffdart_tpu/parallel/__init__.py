from diffdart_tpu.parallel.comm import make_mesh, shard_batch, data_parallel_grad  # noqa: F401
from diffdart_tpu.parallel.distributed import (  # noqa: F401
    global_mesh,
    init_distributed,
    local_env_slice,
    make_global_batch,
    shutdown_distributed,
)
