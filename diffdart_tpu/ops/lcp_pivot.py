"""Single-flip principal pivoting refinement for the boxed LCP.

Role: Dantzig-grade robustness on degenerate/redundant contact sets (the
numerical heart of the reference's contact solve — dSolveLCP,
dart/external/odelcpsolver/lcp.cpp). The fast chain (phased-Jacobi sweeps +
all-at-once active-set policy iteration, ops/lcp.py / ops/lcp_lowrank.py)
converges on ~70% of random redundant-contact states but has SPURIOUS FIXED
POINTS: the all-rows-at-once reclassification can settle on a self-consistent
but wrong active set (wrong friction signs), leaving natural-map residuals up
to ~1e-1 where a pivot solver reaches 1e-6 (measured:
scripts/repro_lcp_stall.py, 18/60 states stalled).

This module is the TPU-native counterpart of Dantzig pivoting: the
complementarity classification is EXPLICIT STATE (class in {FREE, LO, HI} per
row), and each iteration flips exactly ONE row — the most-violated — then
re-solves the active-set system through the same (nv, nv) Woodbury solve as
the polish. Single flips escape the all-at-once cycles (Murty's-method
style); a second canonical start (all normals FREE, all frictions LO)
escapes the rare trapped search (measured: starts x flips solve 60/60 of the
stall population to <=1e-9 where the policy chain alone left 18 stalled).

Branch-free and batchable: the flip is a masked scatter, the loop is a
lax.while_loop (under vmap, lanes that converge stop changing and the loop
exits when every lane is done), and the best-by-residual iterate is returned
so refinement can never make an env worse.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from diffdart_tpu.ops.lcp import _bounds, _nat_residual
from diffdart_tpu.ops.lcp_lowrank import _apply_B, _solve_G_lowrank
from diffdart_tpu.ops.smalllinalg import cho_solve_small

FREE, LO, HI = 0, 1, 2

_VIOL_TOL = 1e-9


def _classes_from_lam(lam, A, b, lo, hi, mu, fidx):
    """Initial explicit classification from an iterate (same tolerances as
    ops/lcp._classify)."""
    lo_eff, hi_eff = _bounds(lam, lo, hi, mu, fidx)
    scale = jnp.maximum(jnp.abs(lam), 1.0)
    at_lo = lam <= lo_eff + 1e-8 * scale
    at_hi = lam >= hi_eff - 1e-8 * scale
    free = ~at_lo & ~at_hi
    return jnp.where(free, FREE, jnp.where(at_hi & ~at_lo, HI, LO))


def _solve_classes(cls, J, L_M, cfm, b, lo, hi, mu, fidx):
    """Active-set solve for an explicit classification; returns the
    UNPROJECTED lam (violations are measured on it)."""
    dtype = b.dtype
    is_fr = fidx >= 0
    free = cls == FREE
    fr_bound = is_fr & ~free
    s = jnp.where(cls == HI, 1.0, -1.0)
    at_lo_c = ~is_fr & (cls == LO) & jnp.isfinite(lo)
    at_hi_c = ~is_fr & (cls == HI) & jnp.isfinite(hi)
    c = jnp.where(at_hi_c, hi, 0.0) + jnp.where(at_lo_c, lo, 0.0)
    F = free.astype(dtype)
    Ac = J @ cho_solve_small(L_M, J.T @ c) + cfm * c
    x = _solve_G_lowrank(-F * (b + Ac), J, L_M, cfm, free, fr_bound, s, mu, fidx)
    return x + _apply_B(x, fr_bound, s, mu, fidx) + c


def _pivot_from(cls0, best, best_res, J, L_M, cfm, A, b, lo, hi, mu, fidx,
                zero_width, iters):
    """Run up to `iters` single flips from classification cls0; fold the
    best-by-residual iterate into (best, best_res). `iters` may be a traced
    scalar (a zero budget skips the search for that lane under vmap)."""
    is_fr = fidx >= 0
    iters = jnp.asarray(iters, jnp.int32)

    def cond(carry):
        cls, best, best_res, it, done = carry
        return (~done) & (it < iters)

    def body(carry):
        cls, best, best_res, it, done = carry
        lam_raw = _solve_classes(cls, J, L_M, cfm, b, lo, hi, mu, fidx)
        w_raw = A @ lam_raw + b
        ok = jnp.all(jnp.isfinite(lam_raw)) & jnp.all(jnp.isfinite(w_raw))
        # violations of complementarity under the EXPLICIT classes
        lam_n = lam_raw[jnp.maximum(fidx, 0)]
        lo_r = jnp.where(is_fr, -mu * jnp.abs(lam_n), lo)
        hi_r = jnp.where(is_fr, mu * jnp.abs(lam_n), hi)
        v_lo = jnp.where(cls == FREE, jnp.maximum(lo_r - lam_raw, 0.0), 0.0)
        v_hi = jnp.where(cls == FREE, jnp.maximum(lam_raw - hi_r, 0.0), 0.0)
        v_w_lo = jnp.where(cls == LO, jnp.maximum(-w_raw, 0.0), 0.0)
        v_w_hi = jnp.where(cls == HI, jnp.maximum(w_raw, 0.0), 0.0)
        viol = jnp.where(zero_width, 0.0, v_lo + v_hi + v_w_lo + v_w_hi)
        viol = jnp.where(jnp.isfinite(viol), viol, 0.0)
        # best-by-residual bookkeeping on the projected iterate
        lo_eff, hi_eff = _bounds(lam_raw, lo, hi, mu, fidx)
        lam_p = jnp.clip(lam_raw, lo_eff, hi_eff)
        res = _nat_residual(lam_p, A, b, lo, hi, mu, fidx)
        better = ok & (res < best_res)
        best = jnp.where(better, lam_p, best)
        best_res = jnp.where(better, res, best_res)
        # flip the most-violated row (no-op when consistent or non-finite)
        k = jnp.argmax(viol)
        scale = 1.0 + jnp.max(jnp.abs(lam_p))
        any_viol = jnp.max(viol) > _VIOL_TOL * scale
        new_k = jnp.where(
            cls[k] == FREE, jnp.where(v_hi[k] > v_lo[k], HI, LO), FREE
        )
        cls = jnp.where(any_viol & ok, cls.at[k].set(new_k), cls)
        done = ~any_viol | ~ok
        return cls, best, best_res, it + 1, done

    init = (cls0, best, best_res, jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    _, best, best_res, _, _ = jax.lax.while_loop(cond, body, init)
    return best, best_res


def pivot_refine(lam, J, L_M, cfm, A, b, lo, hi, mu, fidx, iters=16,
                 tol=1e-6):
    """Refine an LCP iterate to pivot-solver accuracy.

    Single-problem (vmap for batches). Runs the single-flip loop from the
    iterate's own classification and, if still above `tol`, from the
    canonical start (normals FREE / frictions LO). Returns the best iterate
    seen — never worse than the input.
    """
    if iters <= 0:
        return lam
    is_fr = fidx >= 0
    zero_width = (~is_fr & (hi <= lo + 1e-30)) | (is_fr & (mu <= 0))

    best = lam
    best_res = _nat_residual(lam, A, b, lo, hi, mu, fidx)

    # zero-budget the search for lanes the polish already solved: under vmap
    # the while_loop runs while ANY lane is pending, so an all-healthy batch
    # (the common case along a trajectory) exits after one cond check
    # instead of paying the flip/solve body for every lane.
    budget0 = jnp.where(best_res > tol, iters, 0)
    cls0 = jnp.where(zero_width, LO, _classes_from_lam(lam, A, b, lo, hi, mu, fidx))
    best, best_res = _pivot_from(
        cls0, best, best_res, J, L_M, cfm, A, b, lo, hi, mu, fidx, zero_width,
        budget0,
    )

    # canonical second start, zero-budget for lanes already below tol
    cls1 = jnp.where(zero_width, LO, jnp.where(is_fr, LO, FREE))
    budget = jnp.where(best_res > tol, iters, 0)
    best, best_res = _pivot_from(
        cls1, best, best_res, J, L_M, cfm, A, b, lo, hi, mu, fidx, zero_width,
        budget,
    )
    return best


def solve_residual(lam, A, b, lo, hi, mu, fidx):
    """Per-problem natural-map residual — the 'solver stalled' diagnostic.
    ~1e-6 or below: pivot-accurate; ~1e-2+: the solve (and therefore the IFT
    gradient's active set) did not converge for this env."""
    return _nat_residual(lam, A, b, lo, hi, mu, fidx)
