#!/usr/bin/env python
"""Paper demo — jump-worm: iLQR finds a pumping motion that launches the
planar worm off the ground.

Controls are torque-squashed (u = U_MAX tanh(w/U_MAX)): with unbounded
torques iLQR discovers a non-physical exploit — tunnel through the floor
and ride the penetration-correction impulse to a 3 km/s launch. Bounded
actuation forces a genuine crouch-extend jump."""
import os
import sys

sys.path.insert(0, ".")
import jax

# Runs on the DEFAULT backend (TPU under the driver; CPU elsewhere).
# Contact-rich trajectory optimization is conditioning-sensitive: plain-f32
# iLQR through the LCP active set stalls (cost frozen at iteration 0), so
# the simulation runs f32 with the LCP solve + IFT gradient promoted to an
# f64 PRECISION ISLAND (Model.lcp_dtype='f64'; the island is hand-rolled
# small linalg, so it compiles on TPU's f64 emulation and costs ~nothing).
# Measured (CPU, identical code): plain f32 jump 0.003 m (FAILURE) ->
# f32+island jump 0.097 m (SUCCESS); full f64 0.299 m remains the oracle.
jax.config.update("jax_enable_x64", True)
if jax.default_backend() != "cpu":
    # big scan-of-step programs compile slowly on the remote tunnel; cache
    os.makedirs(".jax_cache/device", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache/device")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models.scenes import jump_worm
from diffdart_tpu.sim.step import step
from diffdart_tpu.trajectory.ilqr import ilqr

U_MAX = 6.0


def main():
    m = jump_worm(dt=5e-3, n_links=3).astype(jnp.float32).replace(lcp_dtype="f64")

    def f(x, w):
        u = U_MAX * jnp.tanh(w / U_MAX)
        s = State(q=x[: m.nq], v=x[m.nq :], t=jnp.zeros((), x.dtype))
        tau = jnp.zeros(m.nv, x.dtype).at[3:].set(u)  # actuate the 2 hinges
        s2 = step(m, s, tau)
        return jnp.concatenate([s2.q, s2.v])

    # start resting on the ground
    q0 = m.neutral_q().at[0].set(0.045)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv, q0.dtype)])
    fj = jax.jit(f)
    for _ in range(100):
        x0 = fj(x0, jnp.zeros(2, q0.dtype))
    rest = float(x0[0])

    def rc(x, w, t):
        return 2e-3 * jnp.sum(w**2)

    def tc(x):
        return -20.0 * x[0] - 5.0 * x[m.nq + 0]  # maximize height + upward velocity

    # warm-start with an out-of-phase pumping motion (the jump requires a
    # coordinated crouch-extend cycle that zero controls cannot discover)
    t = jnp.arange(60, dtype=q0.dtype)[:, None] * 5e-3
    us0 = 2.5 * jnp.sin(2 * jnp.pi * 2.5 * t + jnp.asarray([[0.0, 3.14]], q0.dtype))
    res = jax.jit(lambda u: ilqr(f, rc, tc, x0, u, iters=20))(us0)
    apex = float(jnp.max(res.xs[:, 0]))
    lowest = float(jnp.min(res.xs[:, 0]))
    print(f"worm root height: rest {rest:.3f} -> apex {apex:.3f} m (lowest {lowest:.3f})")
    assert apex > rest + 0.08, (
        f"jump-worm demo failed: apex {apex:.3f} m is not a jump above the resting height {rest:.3f} m"
    )
    assert lowest > 0.0 and apex < 1.0, (
        f"non-physical trajectory (tunneling/launch exploit): lowest {lowest:.3f}, apex {apex:.3f}"
    )
    print(f"SUCCESS: the worm jumped {apex - rest:.3f} m off the ground")
    try:
        from diffdart_tpu.viewer import save_html

        save_html(m, res.xs[:, : m.nq], "jumpworm_replay.html", stride=1)
        print("wrote jumpworm_replay.html")
    except Exception as e:
        print("viewer export skipped:", e)


if __name__ == "__main__":
    main()
