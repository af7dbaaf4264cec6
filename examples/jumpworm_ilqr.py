#!/usr/bin/env python
"""Paper demo — jump-worm: iLQR finds a pumping motion that launches the
planar worm off the ground."""
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from diffdart_tpu.dynamics.model import State, make_state
from diffdart_tpu.models.scenes import jump_worm
from diffdart_tpu.sim.step import step
from diffdart_tpu.trajectory.ilqr import ilqr


def main():
    m = jump_worm(dt=5e-3, n_links=3)
    nx = m.nq + m.nv

    def f(x, u):
        s = State(q=x[: m.nq], v=x[m.nq :], t=jnp.zeros((), x.dtype))
        tau = jnp.zeros(m.nv, x.dtype).at[3:].set(u)  # actuate the 2 hinges
        s2 = step(m, s, tau)
        return jnp.concatenate([s2.q, s2.v])

    # start resting on the ground
    q0 = m.neutral_q().at[0].set(0.045)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv, q0.dtype)])
    for _ in range(100):
        x0 = f(x0, jnp.zeros(2))

    def rc(x, u, t):
        return 1e-3 * jnp.sum(u**2)

    def tc(x):
        return -20.0 * x[0] - 5.0 * x[m.nq + 0]  # maximize height + upward velocity

    # warm-start with an out-of-phase pumping motion (the jump requires a
    # coordinated crouch-extend cycle that zero controls cannot discover)
    t = jnp.arange(60)[:, None] * 5e-3
    us0 = 2.5 * jnp.sin(2 * jnp.pi * 2.5 * t + jnp.array([[0.0, 3.14]]))
    res = jax.jit(lambda u: ilqr(f, rc, tc, x0, u, iters=40))(us0)
    apex = float(jnp.max(res.xs[:, 0]))
    print(f"worm root height: start {float(x0[0]):.3f} -> apex {apex:.3f} m")
    try:
        from diffdart_tpu.viewer import save_html

        save_html(m, res.xs[:, : m.nq], "jumpworm_replay.html", stride=1)
        print("wrote jumpworm_replay.html")
    except Exception as e:
        print("viewer export skipped:", e)


if __name__ == "__main__":
    main()
