"""Dissect a stalled case: per-pass residuals, classification trace, S conditioning."""
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
from scripts.exp_polish import run_population
from scripts.repro_lcp_stall import dantzig_residual


def trace_case(lcp, M, passes=6):
    A = jnp.asarray(lcp.A)
    b, lo, hi, mu, fidx = lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx
    J = lcp.J
    cfm = 1e-6
    L_M = cholesky_small(M)
    lam = _jacobi(A, b, lo, hi, mu, fidx, 4)
    print(f"  warmstart res {float(_nat_residual(lam, A, b, lo, hi, mu, fidx)):.3e}")
    rd, lam_d = dantzig_residual(lcp)
    print(f"  dantzig res {rd:.3e}")
    for p in range(passes):
        free, fr_bound, s = _classify(lam, A, b, lo, hi, mu, fidx)
        F = free.astype(lam.dtype)
        # S conditioning
        JF = J * F[:, None]
        from diffdart_tpu.ops.lcp_lowrank import _apply_B_mat
        IB_JF = JF + _apply_B_mat(JF, fr_bound, s, mu, fidx)
        S = cfm * (L_M @ L_M.T) + J.T @ IB_JF
        try:
            cond = float(np.linalg.cond(np.asarray(S)))
        except Exception:
            cond = float("nan")
        c = _const_bound_values(lam, lo, hi, mu, fidx, free)
        Ac = J @ cho_solve_small(L_M, J.T @ c) + cfm * c
        x = _solve_G_lowrank(-F * (b + Ac), J, L_M, cfm, free, fr_bound, s, mu, fidx)
        lam_new = x + _apply_B(x, fr_bound, s, mu, fidx) + c
        finite = bool(jnp.all(jnp.isfinite(lam_new)))
        mx = float(jnp.max(jnp.abs(lam_new))) if finite else float("nan")
        lo_eff, hi_eff = _bounds(lam_new, lo, hi, mu, fidx)
        lam_proj = jnp.clip(lam_new, lo_eff, hi_eff)
        lam_next = jnp.where(jnp.all(jnp.isfinite(lam_proj)), lam_proj, lam)
        r = float(_nat_residual(lam_next, A, b, lo, hi, mu, fidx))
        nfree = int(jnp.sum(free))
        nfr = int(jnp.sum(fr_bound))
        print(f"  pass {p}: free={nfree} frbound={nfr} cond(S)={cond:9.2e} "
              f"finite={finite} max|lam_raw|={mx:9.2e} res_after={r:.3e}")
        lam = lam_next
    # compare against dantzig classification
    free_d, frb_d, _ = _classify(jnp.asarray(lam_d), A, b, lo, hi, mu, fidx)
    free_o, frb_o, _ = _classify(lam, A, b, lo, hi, mu, fidx)
    print(f"  dantzig free set: {np.nonzero(np.asarray(free_d))[0].tolist()}")
    print(f"  ours    free set: {np.nonzero(np.asarray(free_o))[0].tolist()}")


def main():
    probs = run_population()
    shown = 0
    for idx, (lcp, M) in enumerate(probs):
        A = jnp.asarray(lcp.A)
        lam0 = _jacobi(A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx, 4)
        from diffdart_tpu.ops.lcp_lowrank import _polish_lowrank
        L = cholesky_small(M)
        lam = _polish_lowrank(lam0, lcp.J, L, 1e-6, A, lcp.b, lcp.lo, lcp.hi,
                              lcp.mu, lcp.fidx, passes=3)
        r = float(_nat_residual(lam, A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx))
        if r > 1e-5:
            print(f"=== stalled case {idx} (res {r:.3e}) D={A.shape[0]}")
            trace_case(lcp, M)
            shown += 1
            if shown >= 3:
                break


if __name__ == "__main__":
    main()
