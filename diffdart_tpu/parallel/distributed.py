"""Multi-process / multi-host runtime (SURVEY.md §2.4 "multi-process").

The reference is single-process (Eigen + std::thread); scaling past one host
here is the standard JAX SPMD recipe: every host runs the SAME program,
`jax.distributed.initialize` forms the cluster, `jax.devices()` becomes the
GLOBAL device list, and the existing mesh/sharding layer (parallel/comm.py)
works unchanged on top — XLA routes the psum/pmean collectives over ICI
within a slice and DCN across hosts. Nothing above this module knows how
many processes exist.

Host-local data feeding uses `make_global_batch`: each process contributes
its local shard of the env axis and the result is one global jax.Array —
the multi-host analogue of `shard_batch`.

Single-process degenerate mode is a first-class path (num_processes=1):
the test suite drives the REAL `jax.distributed` initialize/shutdown API
against a 1-process coordinator with an 8-device CPU mesh
(tests/test_distributed.py); real multi-host launch just sets the standard
env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID or
a supported cluster autodetect) on every host.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffdart_tpu.parallel.comm import ENV_AXIS


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Form (or join) the JAX process cluster.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); on managed platforms (Cloud TPU,
    SLURM) jax.distributed autodetects everything and no arguments are
    needed. Returns True if a multi-process runtime was initialized, False
    for the single-process no-op (nothing configured — the common local
    case; all APIs below still work on the local devices).

    Idempotent: calling again after a successful initialize is a no-op.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False  # single-process local run
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
    return True


def shutdown_distributed() -> None:
    """Tear down the cluster (end of job / between tests)."""
    try:
        jax.distributed.shutdown()
    except Exception:  # not initialized — fine
        pass


def global_mesh(axis: str = ENV_AXIS, devices=None) -> Mesh:
    """1-D mesh over the GLOBAL device list (all processes' devices after
    init_distributed; the local devices otherwise)."""
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), (axis,))


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def local_env_slice(global_batch_size: int) -> slice:
    """The slice of the global env axis this process is responsible for
    feeding (uniform split; global_batch_size must divide evenly)."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} must divide the "
            f"{n}-process cluster"
        )
    per = global_batch_size // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def make_global_batch(mesh: Mesh, local_tree, axis: str = ENV_AXIS):
    """Assemble a GLOBAL env-sharded batch from per-process local data.

    local_tree: pytree of host arrays holding THIS process's rows of the env
    axis (shape (B_local, ...)); the result is a pytree of global jax.Arrays
    of shape (B_local * process_count, ...) sharded over the mesh. The
    multi-host analogue of parallel.comm.shard_batch (which it reduces to in
    a single process)."""
    sharding = NamedSharding(mesh, P(axis))

    def one(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(one, local_tree)
