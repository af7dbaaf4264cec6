"""Prototype: batched single-flip principal pivoting (Murty-style) fallback.

Maintains the complementarity classification as EXPLICIT state (class in
{FREE=0, LO=1, HI=2} per row) and flips ONE violated row per iteration
(max-violation or least-index), re-solving the active-set system each time.
This is the anti-cycling counterpart of the all-at-once policy iteration:
the trace in exp_polish2 shows the policy iteration converging to spurious
fixed points (wrong friction signs), which single flips escape.
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
from diffdart_tpu.ops.lcp_lowrank import _apply_B, _solve_G_lowrank, _polish_lowrank
from diffdart_tpu.ops.smalllinalg import cholesky_small, cho_solve_small
from scripts.exp_polish import run_population

FREE, LO, HI = 0, 1, 2


def solve_with_classes(cls, J, L_M, cfm, A, b, lo, hi, mu, fidx):
    """Solve the complementarity system for an explicit classification.
    Returns (lam_raw, w_raw) BEFORE projection."""
    dtype = b.dtype
    is_fr = fidx >= 0
    free = cls == FREE
    # friction rows at a moving bound: sign +1 at HI, -1 at LO
    fr_bound = is_fr & ~free
    s = jnp.where(cls == HI, 1.0, -1.0)
    # non-friction rows at finite bounds contribute constants
    at_lo_c = ~is_fr & (cls == LO) & jnp.isfinite(lo)
    at_hi_c = ~is_fr & (cls == HI) & jnp.isfinite(hi)
    c = jnp.where(at_hi_c, hi, 0.0) + jnp.where(at_lo_c, lo, 0.0)
    F = free.astype(dtype)
    Ac = J @ cho_solve_small(L_M, J.T @ c) + cfm * c
    x = _solve_G_lowrank(-F * (b + Ac), J, L_M, cfm, free, fr_bound, s, mu, fidx)
    lam_raw = x + _apply_B(x, fr_bound, s, mu, fidx) + c
    w_raw = A @ lam_raw + b
    return lam_raw, w_raw


def classes_from_lam(lam, A, b, lo, hi, mu, fidx):
    free, fr_bound, s = _classify(lam, A, b, lo, hi, mu, fidx)
    lo_eff, hi_eff = _bounds(lam, lo, hi, mu, fidx)
    scale = jnp.maximum(jnp.abs(lam), 1.0)
    at_hi = lam >= hi_eff - 1e-8 * scale
    cls = jnp.where(free, FREE, jnp.where(at_hi, HI, LO))
    return cls


def pivot_fallback(lam_in, J, L_M, cfm, A, b, lo, hi, mu, fidx, valid_mask,
                   iters=24, rule="maxviol"):
    """Single-flip pivoting from the current iterate's classification."""
    D = A.shape[0]
    is_fr = fidx >= 0
    cls0 = classes_from_lam(lam_in, A, b, lo, hi, mu, fidx)
    # invalid rows (zero-width box) stay pinned LO forever
    zero_width = (~is_fr & (hi <= lo + 1e-30)) | (is_fr & (mu <= 0))

    best = lam_in
    best_res = _nat_residual(lam_in, A, b, lo, hi, mu, fidx)

    cls = jnp.where(zero_width, LO, cls0)
    for _ in range(iters):
        lam_raw, w_raw = solve_with_classes(cls, J, L_M, cfm, A, b, lo, hi, mu, fidx)
        ok = jnp.all(jnp.isfinite(lam_raw))
        lo_eff, hi_eff = _bounds(lam_raw, lo, hi, mu, fidx)
        lam_proj = jnp.clip(lam_raw, lo_eff, hi_eff)
        lam_proj = jnp.where(ok, lam_proj, best)
        res = _nat_residual(lam_proj, A, b, lo, hi, mu, fidx)
        better = ok & (res < best_res)
        best = jnp.where(better, lam_proj, best)
        best_res = jnp.where(better, res, best_res)

        # violations per row under the EXPLICIT classification
        lam_n = lam_raw[jnp.maximum(fidx, 0)]
        lo_r = jnp.where(is_fr, -mu * jnp.abs(lam_n), lo)
        hi_r = jnp.where(is_fr, mu * jnp.abs(lam_n), hi)
        scale = jnp.maximum(jnp.abs(lam_raw), 1.0)
        v_lo = jnp.where(cls == FREE, jnp.maximum(lo_r - lam_raw, 0.0), 0.0)
        v_hi = jnp.where(cls == FREE, jnp.maximum(lam_raw - hi_r, 0.0), 0.0)
        v_w_lo = jnp.where(cls == LO, jnp.maximum(-w_raw, 0.0), 0.0)
        v_w_hi = jnp.where(cls == HI, jnp.maximum(w_raw, 0.0), 0.0)
        viol = jnp.where(zero_width, 0.0, v_lo + v_hi + v_w_lo + v_w_hi)
        viol = jnp.where(jnp.isfinite(viol), viol, 0.0)
        if rule == "maxviol":
            k = jnp.argmax(viol)
        else:  # least index violated
            k = jnp.argmax(viol > 1e-9)
        any_viol = jnp.max(viol) > 1e-9
        # flip row k
        new_k = jnp.where(
            cls[k] == FREE,
            jnp.where(v_hi[k] > v_lo[k], HI, LO),
            FREE,
        )
        cls = jnp.where(
            any_viol & ok,
            cls.at[k].set(new_k),
            cls,
        )
    return best, best_res


def main():
    probs = run_population()
    for rule in ("maxviol", "leastidx"):
        bad, worst = 0, 0.0
        stalled_fixed = 0
        for lcp, M in probs:
            A = jnp.asarray(lcp.A)
            L = cholesky_small(M)
            lam0 = _jacobi(A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx, 4)
            lam = _polish_lowrank(lam0, lcp.J, L, 1e-6, A, lcp.b, lcp.lo,
                                  lcp.hi, lcp.mu, lcp.fidx, passes=3)
            r0 = float(_nat_residual(lam, A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx))
            lam2, r2 = pivot_fallback(lam, lcp.J, L, 1e-6, A, lcp.b, lcp.lo,
                                      lcp.hi, lcp.mu, lcp.fidx, None, rule=rule)
            r2 = float(r2)
            if r0 > 1e-5 and r2 <= 1e-5:
                stalled_fixed += 1
            bad += r2 > 1e-5
            worst = max(worst, r2)
        print(f"rule={rule:9s}: after pivot fallback {bad}/60 above 1e-5, "
              f"worst {worst:.3e}, fixed {stalled_fixed} stalled cases")


if __name__ == "__main__":
    main()
