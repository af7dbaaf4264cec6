#!/usr/bin/env python
"""BASELINE #2 — cube drop/stack with frictional contact; gradient of the
final pose w.r.t. the initial velocity, verified against finite differences."""
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models import cube_drop
from diffdart_tpu.sim import rollout


def main():
    m = cube_drop(dt=2e-3, half=0.1, friction=0.5, n_cubes=2)
    q0 = m.neutral_q().at[6].set(0.1).at[13].set(0.35)  # stacked pair

    def final_x(vx):
        v0 = jnp.zeros(m.nv).at[3].set(vx)  # bottom cube kicked in +x
        s = State(q=q0, v=v0, t=jnp.zeros((), q0.dtype))
        final, _ = rollout(m, s, jnp.zeros((500, m.nv)))
        return final.q[4] + final.q[11]  # sum of both cubes' x

    g = jax.jit(jax.grad(final_x))(1.0)
    eps = 1e-4
    fd = (final_x(1.0 + eps) - final_x(1.0 - eps)) / (2 * eps)
    print(f"d(final poses)/d(v0): AD = {float(g):.6f}   FD = {float(fd):.6f}")


if __name__ == "__main__":
    main()
