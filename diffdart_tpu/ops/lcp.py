"""Batched boxed LCP with friction-index coupling + implicit-function-theorem
gradients.

Capability parity with the reference's contact solve chain
(DantzigBoxedLcpSolver/PgsBoxedLcpSolver wrapping ODE dSolveLCP —
dart/constraint/BoxedLcpConstraintSolver.cpp + dart/external/odelcpsolver/
lcp.cpp, SURVEY.md §2.1) and with its analytical gradients
(BackpropSnapshot / ConstrainedGroupGradientMatrices — SURVEY.md §2.2),
re-designed for TPU:

* forward: projected Gauss-Seidel sweeps (fixed iteration count, jit-static)
  followed by ONE active-set polish solve — a dense linear solve on the
  clamping set with friction-bound coupling folded in, which recovers
  pivot-solver ("Dantzig") accuracy on the smooth manifold while staying
  branch-free and batchable;
* backward: custom_vjp via the implicit function theorem on the active-set
  KKT system. The CLAMPING / UPPER_BOUND / NOT_CLAMPING classification of
  the reference (ConstrainedGroupGradientMatrices::constructMatrices) becomes
  boolean masks, and the paper's  A_c + A_ub E  combined matrix becomes
  T = (I + B) F  below.

Problem: find lambda with, per row i,
    w = A lambda + b
    lo_i(lambda) <= lambda_i <= hi_i(lambda)
    lambda_i = lo_i  =>  w_i >= 0
    lambda_i = hi_i  =>  w_i <= 0
    lo_i < lambda_i < hi_i  =>  w_i = 0
where rows with fidx[i] >= 0 (friction rows) have moving bounds
lo_i = -mu_i * lambda_{fidx[i]}, hi_i = +mu_i * lambda_{fidx[i]}.

All functions are single-problem; batch with vmap.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_TOL = 1e-8


def _bounds(lam, lo, hi, mu, fidx):
    """Effective bounds given current lambda (friction coupling)."""
    lam_n = lam[fidx]  # fidx = 0 for non-friction rows; masked below
    is_fr = fidx >= 0
    lo_eff = jnp.where(is_fr, -mu * lam_n, lo)
    hi_eff = jnp.where(is_fr, mu * lam_n, hi)
    return lo_eff, hi_eff


def _pgs(A, b, lo, hi, mu, fidx, iters):
    n = A.shape[0]
    inv_diag = 1.0 / jnp.maximum(jnp.diagonal(A), 1e-12)
    fidx_c = jnp.maximum(fidx, 0)

    def row_update(i, lam):
        w_i = jnp.dot(A[i], lam) + b[i]
        cand = lam[i] - w_i * inv_diag[i]
        lo_eff, hi_eff = _bounds(lam, lo, hi, mu, fidx)
        cand = jnp.clip(cand, lo_eff[i], hi_eff[i])
        return lam.at[i].set(cand)

    def sweep(_, lam):
        return jax.lax.fori_loop(0, n, row_update, lam)

    lam0 = jnp.zeros_like(b)
    lam = jax.lax.fori_loop(0, iters, sweep, lam0)
    return lam

    # NOTE: the Gauss-Seidel row loop is sequential per env; under vmap the
    # batch axis supplies the parallelism (each row op is a (B, n) contraction).


def _classify(lam, A, b, lo, hi, mu, fidx):
    """CLAMPING / bound / separating masks at the solution (the reference's
    ConstrainedGroupGradientMatrices classification as booleans)."""
    lo_eff, hi_eff = _bounds(lam, lo, hi, mu, fidx)
    scale = jnp.maximum(jnp.abs(lam), 1.0)
    at_lo = lam <= lo_eff + _TOL * scale
    at_hi = lam >= hi_eff - _TOL * scale
    degenerate = at_lo & at_hi  # zero-width box (e.g. invalid row, mu*0)
    free = ~at_lo & ~at_hi & ~degenerate
    # sign of the active friction bound: +1 at hi (= +mu lam_n), -1 at lo
    s = jnp.where(at_hi, 1.0, -1.0)
    fr_bound = (fidx >= 0) & (at_lo | at_hi) & ~degenerate
    return free, fr_bound, s


def _build_T_G(A, free, fr_bound, s, mu, fidx):
    """T = (I + B) F  (the paper's A_c + A_ub E algebra as masks) and the
    free-set KKT matrix G = F A T + (I - F)."""
    n = A.shape[0]
    F = free.astype(A.dtype)
    # B[i, fidx[i]] = s_i mu_i for friction rows stuck at a moving bound
    fidx_c = jnp.maximum(fidx, 0)
    Bvals = jnp.where(fr_bound, s * mu, 0.0)
    B = jnp.zeros_like(A).at[jnp.arange(n), fidx_c].set(Bvals)
    T = (jnp.eye(n, dtype=A.dtype) + B) * F[None, :]
    G = F[:, None] * (A @ T) + jnp.diag(1.0 - F)
    return T, G


def _polish(lam_pgs, A, b, lo, hi, mu, fidx):
    """One exact solve on the PGS-identified active set; fall back to the PGS
    iterate where the polished point violates its own classification."""
    free, fr_bound, s = _classify(lam_pgs, A, b, lo, hi, mu, fidx)
    T, G = _build_T_G(A, free, fr_bound, s, mu, fidx)
    F = free.astype(A.dtype)
    rhs = -F * b
    lam_hat = jnp.linalg.solve(G, rhs)
    lam_pol = T @ lam_hat
    # keep rows at constant bounds where they were
    lo_eff, hi_eff = _bounds(lam_pol, lo, hi, mu, fidx)
    at_const = ~free & ~fr_bound
    lam_pol = jnp.where(at_const, lam_pgs, lam_pol)
    # validity: polished free rows inside bounds, w sign correct at bounds
    lo2, hi2 = _bounds(lam_pol, lo, hi, mu, fidx)
    inside = jnp.all(jnp.where(free, (lam_pol >= lo2 - 1e-6) & (lam_pol <= hi2 + 1e-6), True))
    w = A @ lam_pol + b
    comp_ok = jnp.all(
        jnp.where(free, jnp.abs(w) <= 1e-5 * jnp.maximum(1.0, jnp.abs(b)), True)
    )
    ok = inside & comp_ok & jnp.all(jnp.isfinite(lam_pol))
    return jnp.where(ok, lam_pol, lam_pgs)


@partial(jax.custom_jvp, nondiff_argnums=(6,))
def boxed_lcp(A, b, lo, hi, mu, fidx, iters=30):
    """Solve the boxed LCP. Differentiable via IFT.

    The implicit derivative is declared as a custom_jvp whose rule is linear
    in the tangents (one structured solve against the active-set KKT matrix),
    so BOTH jacfwd (the reference's forward-mode Jacobians) and jacrev/grad
    (backprop) work — JAX transposes the linear rule for reverse mode.

    Args:
      A: (n, n) SPD-ish constraint-space matrix (J M^-1 J^T + cfm I).
      b: (n,) constraint-space bias.
      lo, hi: (n,) constant bounds for non-friction rows (use 0/inf for
        contacts & limits; lo=hi=0 disables a row).
      mu: (n,) friction coefficient per row (used when fidx >= 0).
      fidx: (n,) int; >= 0 marks a friction row coupled to that normal row.
      iters: static PGS sweep count.
    Returns lambda: (n,) impulses.
    """
    lam = _pgs(A, b, lo, hi, mu, fidx, iters)
    return _polish(lam, A, b, lo, hi, mu, fidx)


@boxed_lcp.defjvp
def _boxed_lcp_jvp(iters, primals, tangents):
    A, b, lo, hi, mu, fidx = primals
    dA, db, dlo, dhi, dmu, _ = tangents
    lam = boxed_lcp(A, b, lo, hi, mu, fidx, iters)

    free, fr_bound, s = _classify(lam, A, b, lo, hi, mu, fidx)
    T, G = _build_T_G(A, free, fr_bound, s, mu, fidx)
    F = free.astype(A.dtype)
    dA = _materialize(dA, A)
    db = _materialize(db, b)
    dlo = _materialize(dlo, lo)
    dhi = _materialize(dhi, hi)
    dmu = _materialize(dmu, mu)

    # dB (F lam): friction-bound rows move with their bound as mu changes
    lam_n = lam[jnp.maximum(fidx, 0)]
    w = jnp.where(fr_bound, s * dmu * lam_n, 0.0)
    # rows pinned at constant finite bounds track the bound itself
    lo_eff, hi_eff = _bounds(lam, lo, hi, mu, fidx)
    scale = jnp.maximum(jnp.abs(lam), 1.0)
    at_hi_c = (fidx < 0) & ~free & (lam >= hi_eff - _TOL * scale) & jnp.isfinite(hi)
    at_lo_c = (fidx < 0) & ~free & ~at_hi_c & (lam <= lo_eff + _TOL * scale) & jnp.isfinite(lo) & (jnp.abs(lo) > 0)
    w = w + jnp.where(at_hi_c, dhi, 0.0) + jnp.where(at_lo_c, dlo, 0.0)

    # IFT: G dlam_hat = -F (dA lam + A w + db)
    rhs = -F * (dA @ lam + A @ w + db)
    dlam_hat = jnp.linalg.solve(G, rhs)
    dlam = w + T @ dlam_hat
    return lam, dlam


def _materialize(t, like):
    if type(t) is jax.custom_derivatives.SymbolicZero or t is None:
        return jnp.zeros_like(like)
    return t
