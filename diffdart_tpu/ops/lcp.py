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
    """Projected Gauss-Seidel: serial row sweep (reference-fidelity solver;
    the row loop is sequential per env — use on CPU/f64 validation paths)."""
    n = A.shape[0]
    inv_diag = 1.0 / jnp.maximum(jnp.diagonal(A), 1e-12)

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


def _jacobi(A, b, lo, hi, mu, fidx, iters):
    """Vectorized phased projected Jacobi — the TPU hot-path solver.

    Each sweep is two batched matvecs (MXU-friendly, no per-row serial loop):
    phase 1 updates normal/limit rows, phase 2 updates friction rows against
    the fresh normal impulses. Row steps use ADAPTIVE scaling
    omega_i = clip(diag_i / rowsum_i, 0.3, 0.9) applied to the diagonal step:
    weakly-coupled rows take near-full Jacobi steps (fast), while
    rank-deficient redundant-contact blocks (e.g. 4 coplanar cube corners,
    where rowsum ~ 4*diag) are automatically damped below the oscillation
    threshold. Measured: 100-2000x lower natural-map residual than pure L1
    scaling at equal sweeps on cheetah/cube contact problems. The active-set
    polish afterwards restores exact ("Dantzig-class") values on the smooth
    manifold, so the sweeps only need to land the right active set."""
    is_fr = fidx >= 0
    diag = jnp.maximum(jnp.diagonal(A), 1e-12)
    rowsum = jnp.maximum(jnp.sum(jnp.abs(A), axis=1), 1e-12)
    row_scale = jnp.clip(diag / rowsum, 0.3, 0.9) / diag

    def half_sweep(lam, update_mask):
        r = A @ lam + b
        cand = lam - r * row_scale
        lo_eff, hi_eff = _bounds(lam, lo, hi, mu, fidx)
        cand = jnp.clip(cand, lo_eff, hi_eff)
        return jnp.where(update_mask, cand, lam)

    def sweep(_, lam):
        lam = half_sweep(lam, ~is_fr)
        lam = half_sweep(lam, is_fr)
        return lam

    lam0 = jnp.zeros_like(b)
    return jax.lax.fori_loop(0, iters, sweep, lam0)


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


def _const_bound_values(lam, lo, hi, mu, fidx, free):
    """c: the values of rows pinned at constant FINITE bounds (servo/
    joint-friction rows at +-F*dt; zero for separating normals/limits).
    The free-set equations must include A @ c."""
    lo_eff, hi_eff = _bounds(lam, lo, hi, mu, fidx)
    scale = jnp.maximum(jnp.abs(lam), 1.0)
    not_fr = fidx < 0
    at_hi_c = not_fr & ~free & (lam >= hi_eff - _TOL * scale) & jnp.isfinite(hi)
    at_lo_c = not_fr & ~free & ~at_hi_c & (lam <= lo_eff + _TOL * scale) & jnp.isfinite(lo)
    return jnp.where(at_hi_c, hi, 0.0) + jnp.where(at_lo_c, lo, 0.0)


def _nat_residual(lam, A, b, lo, hi, mu, fidx):
    """Natural-map residual: ||lam - proj(lam - w)||_inf. Zero iff lam solves
    the boxed LCP (the standard projected-equation optimality measure)."""
    w = A @ lam + b
    lo_eff, hi_eff = _bounds(lam, lo, hi, mu, fidx)
    return jnp.max(jnp.abs(lam - jnp.clip(lam - w, lo_eff, hi_eff)))


def _polish(lam0, A, b, lo, hi, mu, fidx, passes: int = 4):
    """Active-set policy iteration ('Newton/Robinson' method for LCPs):
    classify the current iterate -> exact solve on the clamping set with the
    friction-bound coupling folded in (the paper's A_c + A_ub E algebra) ->
    project -> repeat. Converges to pivot-solver ('Dantzig') accuracy in a
    few passes; the best-residual iterate is returned, so a bad pass can
    never make the answer worse than the sweep warm start."""
    nan_guard = lambda x, alt: jnp.where(jnp.all(jnp.isfinite(x)), x, alt)

    def one_pass(lam):
        free, fr_bound, s = _classify(lam, A, b, lo, hi, mu, fidx)
        T, G = _build_T_G(A, free, fr_bound, s, mu, fidx)
        F = free.astype(A.dtype)
        # rows pinned at nonzero constant bounds (servo/joint-friction)
        # contribute A @ c to the free-set equations
        c = _const_bound_values(lam, lo, hi, mu, fidx, free)
        lam_hat = jnp.linalg.solve(G, -F * (b + A @ c))
        lam_new = T @ lam_hat + c
        # project onto the (moving) box so the next classification is feasible
        lo_eff, hi_eff = _bounds(lam_new, lo, hi, mu, fidx)
        lam_new = jnp.clip(lam_new, lo_eff, hi_eff)
        return nan_guard(lam_new, lam)

    best = lam0
    best_res = _nat_residual(lam0, A, b, lo, hi, mu, fidx)
    lam = lam0
    for _ in range(passes):
        lam = one_pass(lam)
        res = _nat_residual(lam, A, b, lo, hi, mu, fidx)
        better = res < best_res
        best = jnp.where(better, lam, best)
        best_res = jnp.where(better, res, best_res)
    return best


@partial(jax.custom_jvp, nondiff_argnums=(6, 7, 8))
def boxed_lcp(A, b, lo, hi, mu, fidx, iters=30, solver="jacobi", polish=True):
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
      iters: static sweep count.
      solver: 'jacobi' (vectorized phased sweeps, TPU hot path) or 'pgs'
        (serial Gauss-Seidel rows, reference-fidelity/CPU path).
      polish: run the active-set exact solve after the sweeps.
    Returns lambda: (n,) impulses.
    """
    sweep = _jacobi if solver == "jacobi" else _pgs
    lam = sweep(A, b, lo, hi, mu, fidx, iters)
    if polish:
        lam = _polish(lam, A, b, lo, hi, mu, fidx)
    return lam


@boxed_lcp.defjvp
def _boxed_lcp_jvp(iters, solver, polish, primals, tangents):
    A, b, lo, hi, mu, fidx = primals
    dA, db, dlo, dhi, dmu, _ = tangents
    lam = boxed_lcp(A, b, lo, hi, mu, fidx, iters, solver, polish)

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
