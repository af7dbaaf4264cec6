#!/usr/bin/env python
"""BASELINE #1 — cartpole swing-up with backprop-through-time."""
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from diffdart_tpu.dynamics.model import make_state
from diffdart_tpu.models import cartpole
from diffdart_tpu.sim import rollout


def main():
    m = cartpole(dt=0.01)
    s0 = make_state(m, q=jnp.array([0.0, 3.14159], m.mass.dtype))  # pole down
    T = 200

    def loss(taus):
        final, _ = rollout(m, s0, taus)
        return jnp.sum(final.q**2) + 0.1 * jnp.sum(final.v**2) + 1e-3 * jnp.sum(taus**2)

    value_grad = jax.jit(jax.value_and_grad(loss))
    taus = jnp.zeros((T, 2), m.mass.dtype)
    for i in range(60):
        l, g = value_grad(taus)
        taus = taus - 0.05 * g
        if i % 10 == 0:
            print(f"iter {i:3d}  loss {float(l):8.4f}")
    final, traj = jax.jit(rollout)(m, s0, taus)
    print(f"final pole angle: {float(final.q[1]):+.4f} rad (target 0)")
    try:
        from diffdart_tpu.viewer import save_html

        save_html(m, traj.q, "cartpole_replay.html", stride=2)
        print("wrote cartpole_replay.html")
    except Exception as e:
        print("viewer export skipped:", e)


if __name__ == "__main__":
    main()
