"""Experiment: jump-worm iLQR in f32 (CPU) — reproduce the conditioning
failure that forced the CPU-f64 pin (commit 3a418d8), then test fixes.

Usage: python scripts/exp_f32_worm.py [x64|f32] [pivot_iters]
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

mode = sys.argv[1] if len(sys.argv) > 1 else "f32"
jax.config.update("jax_platforms", "cpu")
if mode in ("x64", "island"):
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models.scenes import jump_worm
from diffdart_tpu.sim.step import step
from diffdart_tpu.trajectory.ilqr import ilqr

U_MAX = 6.0


def main():
    m = jump_worm(dt=5e-3, n_links=3)
    if mode == "island":
        # f32 simulation + f64 LCP precision island
        m = m.astype(jnp.float32).replace(lcp_dtype="f64")
    if len(sys.argv) > 2:
        m = m.replace(lcp_pivot_iters=int(sys.argv[2]))
    print("dtype:", m.mass.dtype, "lcp_dtype:", m.lcp_dtype)

    def f(x, w):
        u = U_MAX * jnp.tanh(w / U_MAX)
        s = State(q=x[: m.nq], v=x[m.nq :], t=jnp.zeros((), x.dtype))
        tau = jnp.zeros(m.nv, x.dtype).at[3:].set(u)
        s2 = step(m, s, tau)
        return jnp.concatenate([s2.q, s2.v])

    q0 = m.neutral_q().at[0].set(0.045)
    x0 = jnp.concatenate([q0, jnp.zeros(m.nv, q0.dtype)])
    fj = jax.jit(f)
    for _ in range(100):
        x0 = fj(x0, jnp.zeros(2, q0.dtype))
    rest = float(x0[0])

    def rc(x, w, t):
        return 2e-3 * jnp.sum(w**2)

    def tc(x):
        return -20.0 * x[0] - 5.0 * x[m.nq + 0]

    t = jnp.arange(60, dtype=q0.dtype)[:, None] * 5e-3
    us0 = 2.5 * jnp.sin(2 * jnp.pi * 2.5 * t + jnp.asarray([[0.0, 3.14]], q0.dtype))
    res = jax.jit(lambda u: ilqr(f, rc, tc, x0, u, iters=20))(us0)
    apex = float(jnp.max(res.xs[:, 0]))
    lowest = float(jnp.min(res.xs[:, 0]))
    print("cost trace:", [f"{c:.3f}" for c in res.cost_trace[::4]])
    print(f"rest {rest:.4f} apex {apex:.4f} lowest {lowest:.4f} "
          f"jump {apex-rest:.4f} (need > 0.08)")
    ok = apex > rest + 0.08 and lowest > 0.0 and apex < 1.0
    print("SUCCESS" if ok else "FAILURE")


if __name__ == "__main__":
    main()
