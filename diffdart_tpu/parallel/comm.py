"""Device mesh / sharding layer: everything above this module is
topology-agnostic.

SURVEY.md §2.4: the reference has NO distributed backend (single-process
Eigen + std::thread); env-parallelism is first-class here instead. The only
collectives the workloads need are psum/pmean of losses and gradients over
the env-sharded mesh axis — they ride ICI within a slice, DCN across hosts
(jax.distributed), inserted by XLA from these annotations.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(
    n_devices: int | None = None, axis: str = ENV_AXIS, devices=None
) -> Mesh:
    """1-D mesh over all (or the first n) devices; the single axis shards the
    environment/batch dimension (pure data parallelism — SURVEY.md §2.4).

    Pass `devices` to build the mesh on an explicit device list (e.g.
    ``jax.devices("cpu")`` for a virtual host mesh regardless of the default
    backend). Raises if fewer devices exist than requested — silently
    truncating would validate nothing (round-1 VERDICT weak-spot #2).
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"make_mesh: requested {n_devices} devices but only "
                f"{len(devs)} are available ({[d.platform for d in devs]})"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = ENV_AXIS):
    """Place a batched pytree with leading env axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_grad(loss_fn, mesh: Mesh, axis: str = ENV_AXIS):
    """Build a jitted (value, grad) function for loss_fn(params, batch) where
    `batch` is env-sharded over the mesh and `params` is replicated.

    loss_fn must return a PER-ENV loss vector (shape (B,)); the wrapper means
    it across the full batch. XLA inserts the psum for the replicated-param
    gradient automatically from the shardings.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))

    def total_loss(params, batch):
        return jnp.mean(loss_fn(params, batch))

    vg = jax.value_and_grad(total_loss)

    @partial(jax.jit, in_shardings=(repl, shard), out_shardings=(repl, repl))
    def step(params, batch):
        return vg(params, batch)

    return step
