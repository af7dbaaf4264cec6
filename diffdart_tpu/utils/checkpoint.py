"""Checkpoint/resume via orbax.

SURVEY.md §5: the reference has RestorableSnapshot (in-memory world
save/restore — trivial here, states are immutable pytrees) and replayable
OptimizationRecords but no durable training checkpoints. Here any pytree of
(params, optimizer state, env states, RNG keys) checkpoints to disk and
restores for elastic restart (jax.distributed re-init is the multi-host
story — data-parallel means batch-level elasticity)."""
from __future__ import annotations

import os


def save_checkpoint(path: str, tree, step: int | None = None):
    """Save a pytree checkpoint (orbax if available, else pickle of numpy).

    Only orbax *unavailability* falls back to pickle; a genuine orbax save
    failure (bad tree, partial write, permissions) propagates so it can't
    masquerade as a successful save in a different format.
    """
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        ocp = None
    if ocp is not None:
        ckptr = ocp.PyTreeCheckpointer()
        target = os.path.join(path, f"step_{step}") if step is not None else path
        ckptr.save(target, tree, force=True)
        return target
    else:
        import pickle

        import jax
        import numpy as np

        host_tree = jax.tree.map(lambda x: np.asarray(x), tree)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fname = path if path.endswith(".pkl") else path + ".pkl"
        with open(fname, "wb") as f:
            pickle.dump(host_tree, f)
        return fname


def restore_checkpoint(path: str, like=None):
    """Restore a checkpoint saved by save_checkpoint.

    SECURITY: the `.pkl` fallback uses pickle.load, which executes arbitrary
    code from the file — restore only checkpoints you wrote yourself
    (trusted-input-only path; orbax is the default and is safe).
    """
    if path.endswith(".pkl") or os.path.isfile(path + ".pkl"):
        import pickle

        fname = path if path.endswith(".pkl") else path + ".pkl"
        with open(fname, "rb") as f:
            return pickle.load(f)
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(path, item=like)
