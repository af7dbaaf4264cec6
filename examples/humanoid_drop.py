#!/usr/bin/env python
"""BASELINE #5 — 30-DOF Atlas-class humanoid: full contact solve + per-step
timestep Jacobians, with step-rate measurement."""
import sys

sys.path.insert(0, ".")
import time

import jax
import jax.numpy as jnp

from diffdart_tpu.dynamics.model import State, make_state
from diffdart_tpu.models.humanoid import humanoid, humanoid_init_q
from diffdart_tpu.neural import timestep_jacobians
from diffdart_tpu.sim import rollout


def main():
    m = humanoid(dt=2e-3)
    print(f"humanoid: {m.nbody} bodies, nv={m.nv}, {m.ngeom} geoms, "
          f"{len(m.col_pairs)} collision pairs")
    s = make_state(m, q=humanoid_init_q(m))

    # batched stepping rate
    B = 512
    batch = State(q=jnp.tile(s.q, (B, 1)), v=jnp.zeros((B, m.nv), m.mass.dtype),
                  t=jnp.zeros(B, m.mass.dtype))
    roll = jax.jit(jax.vmap(lambda st: rollout(m, st, jnp.zeros((50, m.nv), m.mass.dtype))[0]))
    out = roll(batch)
    out.q.block_until_ready()
    t0 = time.time()
    for _ in range(5):
        out = roll(batch)
    out.q.block_until_ready()
    rate = 5 * B * 50 / (time.time() - t0)
    print(f"humanoid contact steps: {rate:,.0f} steps/s (B={B})")

    # per-step Jacobians
    t0 = time.time()
    J = jax.jit(lambda st: timestep_jacobians(m, st))(s)
    J.vel_vel.block_until_ready()
    print(f"timestep Jacobians (30x30 x 7) computed; vel_vel spectral radius "
          f"{float(jnp.max(jnp.abs(jnp.linalg.eigvals(J.vel_vel)))):.4f}")

    final, traj = jax.jit(lambda st: rollout(m, st, jnp.zeros((500, m.nv), m.mass.dtype)))(s)
    print(f"drop: root z {float(s.q[6]):.2f} -> {float(final.q[6]):.2f} after 1 s")
    try:
        from diffdart_tpu.viewer import save_html

        save_html(m, traj.q, "humanoid_replay.html", stride=4)
        print("wrote humanoid_replay.html")
    except Exception as e:
        print("viewer export skipped:", e)


if __name__ == "__main__":
    main()
