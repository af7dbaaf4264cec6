"""Trajectory recording/replay (simulation::Recording parity — SURVEY.md §2.1).

States are immutable pytrees, so a recording is just the stacked State from
lax.scan; this module adds save/load (.npz) and golden-trajectory helpers for
the stored-golden test harness (SURVEY.md §4 rebuild plan #2b)."""
from __future__ import annotations

import numpy as np

from diffdart_tpu.dynamics.model import State


def save_recording(path: str, traj: State, meta: dict | None = None):
    np.savez_compressed(
        path,
        q=np.asarray(traj.q),
        v=np.asarray(traj.v),
        t=np.asarray(traj.t) if traj.t is not None else np.zeros(len(np.asarray(traj.q))),
        **{f"meta_{k}": v for k, v in (meta or {}).items()},
    )
    return path


def load_recording(path: str) -> State:
    import jax.numpy as jnp

    data = np.load(path)
    return State(q=jnp.asarray(data["q"]), v=jnp.asarray(data["v"]), t=jnp.asarray(data["t"]))


def compare_to_golden(traj: State, golden_path: str, q_tol=1e-6, v_tol=1e-6) -> dict:
    """Max deviation from a stored golden trajectory (returns metrics; callers
    assert on them)."""
    g = np.load(golden_path)
    dq = float(np.max(np.abs(np.asarray(traj.q) - g["q"])))
    dv = float(np.max(np.abs(np.asarray(traj.v) - g["v"])))
    return {"max_dq": dq, "max_dv": dv, "q_ok": dq <= q_tol, "v_ok": dv <= v_tol}
