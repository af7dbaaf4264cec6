#!/usr/bin/env python
"""BASELINE #3 — catapult: trajectory optimization with hinge joints + contact.

Optimizes the arm torque tape by backprop-through-time (the same
differentiable-contact machinery the reference's MultiShot uses; a
MultipleShooting variant is available in diffdart_tpu.trajectory.shooting —
see tests/test_trajectory.py). Reports landing-distance improvement."""
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import optax

from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models.scenes import catapult, catapult_init_q
from diffdart_tpu.sim.step import step


def main():
    m = catapult(dt=2e-3)
    q0 = catapult_init_q(m)
    s = State(q=q0, v=jnp.zeros(m.nv, q0.dtype), t=jnp.zeros((), q0.dtype))
    stp = jax.jit(lambda s, t: step(m, s, t))
    hold = jnp.zeros(m.nv, q0.dtype).at[0].set(8.0)
    for _ in range(50):  # settle the ball onto the cradle under a holding torque
        s = stp(s, hold)

    T = 150

    def rollout_ball_x(us):
        def body(st, u):
            tau = jnp.zeros(m.nv, q0.dtype).at[0].set(u[0]).at[1].set(u[1])
            return step(m, st, tau), st.q

        body = jax.checkpoint(body)
        final, qs = jax.lax.scan(body, s, us)
        return final.q[6], qs

    def loss(us):
        ball_x, _ = rollout_ball_x(us)
        return -ball_x + 1e-5 * jnp.sum(us**2)

    vg = jax.jit(jax.value_and_grad(loss))
    us = jnp.tile(jnp.array([[8.0, 0.0]], q0.dtype), (T, 1))
    x_init, _ = rollout_ball_x(us)
    opt = optax.adam(1.0)
    opt_state = opt.init(us)
    for i in range(200):
        l, g = vg(us)
        updates, opt_state = opt.update(g, opt_state, us)
        us = optax.apply_updates(us, updates)
        if i % 40 == 0:
            print(f"iter {i:3d}  ball landing x {-float(l):6.3f} m")
    x_final, qs = rollout_ball_x(us)
    print(f"landing distance: {float(x_init):.3f} m (hold) -> {float(x_final):.3f} m (optimized)")
    try:
        from diffdart_tpu.viewer import save_html

        save_html(m, qs, "catapult_replay.html", stride=2)
        print("wrote catapult_replay.html")
    except Exception as e:
        print("viewer export skipped:", e)


if __name__ == "__main__":
    main()
