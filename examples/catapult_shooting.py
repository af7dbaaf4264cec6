#!/usr/bin/env python
"""BASELINE #3 — catapult: trajectory optimization with hinge joints + contact.

Optimizes the arm torque tape by backprop-through-time (the same
differentiable-contact machinery the reference's MultiShot uses; a
MultipleShooting variant is available in diffdart_tpu.trajectory.shooting —
see tests/test_trajectory.py).

Loss = ballistic landing distance of the ball from the end-of-horizon state
(x + vx * t_fall, differentiable), so the objective measures launch quality
no matter where in flight the horizon ends. The hold torque is the computed
gravity compensation at the initial pose (the ball must stay cradled for
gradients to flow through the arm->cradle->ball contact), and a short
swing-pulse warm start breaks the hold plateau."""
import os
import sys

sys.path.insert(0, ".")
import jax

# Runs on the DEFAULT backend (TPU under the driver; CPU elsewhere).
# BPTT gradients through the launch contact's LCP active set are
# conditioning-sensitive in plain f32, so the simulation runs f32 with the
# LCP solve + IFT gradient promoted to an f64 precision island
# (Model.lcp_dtype='f64' — see examples/jumpworm_ilqr.py for measurements).
jax.config.update("jax_enable_x64", True)
if jax.default_backend() != "cpu":
    os.makedirs(".jax_cache/device", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache/device")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import optax

from diffdart_tpu.dynamics import dynamics as D
from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models.scenes import catapult, catapult_init_q
from diffdart_tpu.sim.step import step

G = 9.81


def main():
    m = catapult(dt=2e-3).astype(jnp.float32).replace(lcp_dtype="f64")
    q0 = catapult_init_q(m)
    s0 = State(q=q0, v=jnp.zeros(m.nv, q0.dtype), t=jnp.zeros((), q0.dtype))
    # hold = gravity-compensating torque at q0 (keeps the ball cradled)
    cache = D.kinematics_cache(m, q0, jnp.zeros(m.nv))
    C = D.bias_forces(m, q0, jnp.zeros(m.nv), cache)
    hold = jnp.asarray([C[0], C[1]], q0.dtype)

    T = 150
    ball_r = float(m.geom_size[4, 0])

    def roll(us):
        def body(st, u):
            tau = jnp.zeros(m.nv, q0.dtype).at[0].set(u[0]).at[1].set(u[1])
            return step(m, st, tau), st.q

        final, qs = jax.lax.scan(jax.checkpoint(body), s0, us)
        return final, qs

    def landing_x(final):
        x, z = final.q[6], final.q[8]
        vx, vz = final.v[3], final.v[5]
        t_fall = (vz + jnp.sqrt(jnp.maximum(vz**2 + 2 * G * jnp.maximum(z - ball_r, 0.0), 1e-9))) / G
        return x + vx * t_fall

    def loss(us):
        final, _ = roll(us)
        return -landing_x(final) + 1e-5 * jnp.sum(us**2)

    vg = jax.jit(jax.value_and_grad(loss))
    us_hold = jnp.tile(hold[None], (T, 1))
    x_hold = float(landing_x(roll(us_hold)[0]))
    # swing-pulse warm start: extra torque for the first 40 steps
    us = us_hold.at[:40, 0].add(-20.0).at[:40, 1].add(-6.0)
    opt = optax.adam(0.5)
    opt_state = opt.init(us)
    for i in range(200):
        l, g = vg(us)
        updates, opt_state = opt.update(g, opt_state, us)
        us = optax.apply_updates(us, updates)
        if i % 40 == 0:
            print(f"iter {i:3d}  ball landing distance {-float(l):6.2f} m")
    final, qs = roll(us)
    x_final = float(landing_x(final))
    print(f"landing distance: {x_hold:.2f} m (hold) -> {x_final:.2f} m (optimized)")
    assert x_final > x_hold + 5.0, (
        f"catapult demo failed: optimized landing {x_final:.2f} m did not beat "
        f"the hold baseline {x_hold:.2f} m by >5 m"
    )
    print(f"SUCCESS: BPTT through the launch contact flung the ball {x_final - x_hold:.1f} m further")
    try:
        from diffdart_tpu.viewer import save_html

        save_html(m, qs, "catapult_replay.html", stride=2)
        print("wrote catapult_replay.html")
    except Exception as e:
        print("viewer export skipped:", e)


if __name__ == "__main__":
    main()
