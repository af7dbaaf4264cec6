#!/usr/bin/env python
"""BASELINE #3 — catapult: multiple-shooting trajectory optimization with
hinge joints + contact (fling the ball as far as possible downrange)."""
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models.scenes import catapult, catapult_init_q
from diffdart_tpu.sim.step import step
from diffdart_tpu.trajectory.shooting import MultipleShooting


def main():
    m = catapult(dt=2e-3)
    q0 = catapult_init_q(m)
    T, S = 120, 30
    nx = m.nq + m.nv

    def f(x, u):
        s = State(q=x[: m.nq], v=x[m.nq :], t=jnp.zeros((), x.dtype))
        tau = jnp.zeros(m.nv, x.dtype).at[0].set(u[0]).at[1].set(u[1])
        s2 = step(m, s, tau)
        return jnp.concatenate([s2.q, s2.v])

    target_x = 2.5

    def rc(x, u, t):
        return 1e-4 * jnp.sum(u**2)

    def tc(x):
        ball_x = x[m.nq - 3]  # ball free-joint x position (last body)
        return (ball_x - target_x) ** 2 + 0.2 * (x[m.nq - 1] - 0.0) ** 2

    x0 = jnp.concatenate([q0, jnp.zeros(m.nv, q0.dtype)])
    # settle the ball onto the cradle first
    for _ in range(100):
        x0 = f(x0, jnp.zeros(2))

    ms = MultipleShooting(f, rc, tc, T=T, segment_len=S, nx=nx, nu=2)
    res = ms.solve(x0, jnp.zeros((T, 2)), outer_iters=4, inner_iters=60)
    ball_x = float(res.xs[-1][m.nq - 3])
    print(f"ball landing x = {ball_x:.3f} (target {target_x}), defect norm {float(res.defect_norm):.2e}")
    try:
        from diffdart_tpu.viewer import save_html

        save_html(m, res.xs[:, : m.nq], "catapult_replay.html", stride=2)
        print("wrote catapult_replay.html")
    except Exception as e:
        print("viewer export skipped:", e)


if __name__ == "__main__":
    main()
