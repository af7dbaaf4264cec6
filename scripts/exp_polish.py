"""Experiment: damped / line-searched policy iteration for the stalled cases.

Variants tested against the 60-random-state population of repro_lcp_stall:
  A. status quo (passes=3, full steps)
  B. passes=10 full steps (does it ever converge, or cycle?)
  C. fractional-step candidates {1, 1/2, 1/4} per pass, best-residual select
  D. C + Tikhonov damping of S scaled to its diagonal
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from diffdart_tpu.ops.lcp import _bounds, _classify, _const_bound_values, _jacobi, _nat_residual
from diffdart_tpu.ops.lcp_lowrank import _apply_B, _solve_G_lowrank
from diffdart_tpu.ops.smalllinalg import cholesky_small, cho_solve_small
from scripts.repro_lcp_stall import capsule_flat, cube_drop, lcp_from, dantzig_residual
from diffdart_tpu.math.lie import quat_exp, quat_mul


def polish_ls(lam0, J, L_M, cfm, A, b, lo, hi, mu, fidx, passes=3,
              alphas=(1.0, 0.5, 0.25)):
    """Policy iteration with per-pass fractional-step line search on the
    natural-map residual."""

    def res(lam):
        return _nat_residual(lam, A, b, lo, hi, mu, fidx)

    def one_full(lam):
        free, fr_bound, s = _classify(lam, A, b, lo, hi, mu, fidx)
        F = free.astype(lam.dtype)
        c = _const_bound_values(lam, lo, hi, mu, fidx, free)
        Ac = J @ cho_solve_small(L_M, J.T @ c) + cfm * c
        x = _solve_G_lowrank(-F * (b + Ac), J, L_M, cfm, free, fr_bound, s, mu, fidx)
        lam_new = x + _apply_B(x, fr_bound, s, mu, fidx) + c
        lo_eff, hi_eff = _bounds(lam_new, lo, hi, mu, fidx)
        lam_new = jnp.clip(lam_new, lo_eff, hi_eff)
        return jnp.where(jnp.all(jnp.isfinite(lam_new)), lam_new, lam)

    best = lam0
    best_res = res(lam0)
    lam = lam0
    for _ in range(passes):
        full = one_full(lam)
        cands, ress = [], []
        for a in alphas:
            c_pre = (1 - a) * lam + a * full
            lo_eff, hi_eff = _bounds(c_pre, lo, hi, mu, fidx)
            cand = jnp.clip(c_pre, lo_eff, hi_eff)
            cands.append(cand)
            ress.append(res(cand))
        ress = jnp.stack(ress)
        k = jnp.argmin(ress)
        lam = jnp.stack(cands)[k]
        r = ress[k]
        better = r < best_res
        best = jnp.where(better, lam, best)
        best_res = jnp.where(better, r, best_res)
    return best, best_res


def run_population():
    rng = np.random.default_rng(0)
    m = capsule_flat()
    mc = cube_drop(dt=2e-3, friction=0.8)
    q0 = np.array(m.neutral_q(), float); q0[6] = 0.048
    qc = np.array(mc.neutral_q(), float); qc[6] = 0.099

    def tilt(q, scale):
        dq = np.asarray(quat_exp(jnp.asarray(rng.normal(size=3) * scale)))
        q = q.copy()
        q[:4] = np.asarray(quat_mul(jnp.asarray(q[:4]), jnp.asarray(dq)))
        return q

    probs = []
    for k in range(30):
        q = tilt(q0, 0.05); q[6] = 0.044 + 0.01 * rng.random()
        v = rng.normal(size=m.nv) * (2.0 if k % 2 else 0.3)
        probs.append(lcp_from(m, q, v))
    for k in range(30):
        q = tilt(qc, 0.04); q[6] = 0.094 + 0.01 * rng.random()
        v = rng.normal(size=mc.nv) * (2.0 if k % 2 else 0.3)
        probs.append(lcp_from(mc, q, v))
    return probs


def main():
    probs = run_population()
    from diffdart_tpu.ops.lcp_lowrank import _polish_lowrank

    stats = {}
    for name, fn in [
        ("A status quo p=3", lambda lcp, M, lam0, L:
            _polish_lowrank(lam0, lcp.J, L, 1e-6, jnp.asarray(lcp.A), lcp.b,
                            lcp.lo, lcp.hi, lcp.mu, lcp.fidx, passes=3)),
        ("B status quo p=10", lambda lcp, M, lam0, L:
            _polish_lowrank(lam0, lcp.J, L, 1e-6, jnp.asarray(lcp.A), lcp.b,
                            lcp.lo, lcp.hi, lcp.mu, lcp.fidx, passes=10)),
        ("C linesearch p=3", lambda lcp, M, lam0, L:
            polish_ls(lam0, lcp.J, L, 1e-6, jnp.asarray(lcp.A), lcp.b,
                      lcp.lo, lcp.hi, lcp.mu, lcp.fidx, passes=3)[0]),
        ("D linesearch p=6", lambda lcp, M, lam0, L:
            polish_ls(lam0, lcp.J, L, 1e-6, jnp.asarray(lcp.A), lcp.b,
                      lcp.lo, lcp.hi, lcp.mu, lcp.fidx, passes=6)[0]),
        ("E ls p=6 alpha8", lambda lcp, M, lam0, L:
            polish_ls(lam0, lcp.J, L, 1e-6, jnp.asarray(lcp.A), lcp.b,
                      lcp.lo, lcp.hi, lcp.mu, lcp.fidx, passes=6,
                      alphas=(1.0, 0.5, 0.25, 0.125))[0]),
    ]:
        bad, worst = 0, 0.0
        for lcp, M in probs:
            A = jnp.asarray(lcp.A)
            lam0 = _jacobi(A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx, 4)
            L = cholesky_small(M)
            lam = fn(lcp, M, lam0, L)
            r = float(_nat_residual(lam, A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx))
            bad += r > 1e-5
            worst = max(worst, r)
        stats[name] = (bad, worst)
        print(f"{name:20s}: {bad}/60 above 1e-5, worst {worst:.3e}")


if __name__ == "__main__":
    main()
