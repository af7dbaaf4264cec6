"""Low-rank boxed-LCP solve: the TPU hot path.

The constraint-space matrix is A = J M^-1 J^T + cfm I with J (D, nv) and
nv << D (a 9-DOF cheetah has D = 42 LCP rows). The dense polish/IFT solves
against the active-set matrix G are therefore rank-nv + cfm — so instead of a
batched (D, D) LU (measured 95% of step time on TPU: 10ms -> 214ms/step), we
solve through the Woodbury identity with ONE (nv, nv) system:

    G x = r   on the free set, with friction-bound coupling B, reduces to
    (cfm M + J^T (I+B) F J) u = J^T (I+B) r        [nv x nv]
    x = (r - F J u) / cfm,      lam = (I+B) x  (+ rows at constant bounds)

Same algebra serves the forward polish passes and the implicit-function jvp
(and its transpose for reverse mode). Capability parity: the reference's
BoxedLcpConstraintSolver + ConstrainedGroupGradientMatrices
(SURVEY.md §2.1/§2.2) with the per-constraint impulse tests replaced by
structured dense algebra on the MXU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from diffdart_tpu.ops.lcp import _bounds, _classify, _const_bound_values, _jacobi, _nat_residual
from diffdart_tpu.ops.smalllinalg import cholesky_small, cho_solve_small, solve_nopivot_small

_TOL = 1e-8


def _apply_B(x, fr_bound, s, mu, fidx):
    """(Bx)_k = s_k mu_k x_{n(k)} on friction-bound rows."""
    xn = x[jnp.maximum(fidx, 0)]
    return jnp.where(fr_bound, s * mu * xn, 0.0)


def _applyT_B(y, fr_bound, s, mu, fidx, n):
    """(B^T y)_j = sum_{k: n(k)=j} s_k mu_k y_k."""
    vals = jnp.where(fr_bound, s * mu * y, 0.0)
    return jnp.zeros(n, y.dtype).at[jnp.maximum(fidx, 0)].add(vals)


def _solve_G_lowrank(r, J, L_M, cfm, free, fr_bound, s, mu, fidx):
    """Solve G x = r with G = F A T + (I-F), A = J Minv J^T + cfm I,
    T = (I+B)F, using the nv x nv Woodbury system. r must be supported on the
    free set; returns x supported on the free set."""
    dtype = r.dtype
    F = free.astype(dtype)
    JF = J * F[:, None]  # F J  (rows masked to free)

    def IB(x):  # (I+B) x
        return x + _apply_B(x, fr_bound, s, mu, fidx)

    # S = cfm M + J^T (I+B) F J     (nv, nv)
    IB_JF = JF + _apply_B_mat(JF, fr_bound, s, mu, fidx)
    M = L_M @ L_M.T
    S = cfm * M + J.T @ IB_JF
    u = solve_nopivot_small(S, J.T @ IB(r))
    x = (r - JF @ u) / cfm
    return x * F


def _apply_B_mat(X, fr_bound, s, mu, fidx):
    """Row-wise B applied to a (D, k) matrix: (BX)_k-row = s mu X_{n(k)}."""
    Xn = X[jnp.maximum(fidx, 0)]
    return jnp.where(fr_bound[:, None], (s * mu)[:, None] * Xn, 0.0)


def _polish_lowrank(lam0, J, L_M, cfm, A, b, lo, hi, mu, fidx, passes=3):
    """Active-set policy iteration with Woodbury inner solves."""

    def one_pass(lam):
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
    best_res = _nat_residual(lam0, A, b, lo, hi, mu, fidx)
    lam = lam0
    for _ in range(passes):
        lam = one_pass(lam)
        res = _nat_residual(lam, A, b, lo, hi, mu, fidx)
        better = res < best_res
        best = jnp.where(better, lam, best)
        best_res = jnp.where(better, res, best_res)
    return best


def _solve_impl(J, M, cfm, b, lo, hi, mu, fidx, iters, passes, fidx_pallas,
                pivot_iters=16):
    """Boxed LCP with A = J M^-1 J^T + cfm I formed internally.
    fidx_pallas: static tuple of fidx values — when given, the warm-start
    sweeps run in the fused Pallas TPU kernel (A stays in VMEM across all
    iterations) instead of XLA matvecs. pivot_iters > 0 appends the
    single-flip principal-pivoting refinement (ops/lcp_pivot.py) that closes
    the policy-iteration chain's spurious fixed points on redundant contact
    sets; its while_loop exits immediately for already-converged lanes.
    Returns lambda (D,)."""
    # full f32 matmul precision is REQUIRED here: TPU matmuls default to
    # bf16 MXU passes, and the 1/cfm amplification in the Woodbury solve
    # turns that 8e-3 relative error into exploding (1e17) gradients
    with jax.default_matmul_precision("highest"):
        L_M = cholesky_small(M)
        W = cho_solve_small(L_M, J.T)  # (nv, D) = Minv J^T
        A = J @ W + cfm * jnp.eye(J.shape[0], dtype=J.dtype)
        if fidx_pallas is not None:
            from diffdart_tpu.ops.pallas_lcp import jacobi_sweeps_pallas_single

            lam = jacobi_sweeps_pallas_single(A, b, lo, hi, mu, fidx_pallas, iters)
        else:
            lam = _jacobi(A, b, lo, hi, mu, fidx, iters)
        lam = _polish_lowrank(lam, J, L_M, cfm, A, b, lo, hi, mu, fidx, passes)
        # pivot refinement only where it can work: the flip decisions need
        # residuals resolvable below the stall signal, and the Woodbury solve
        # floor is ~eps/cfm — at the default cfm=1e-6 that is ~0.04 in f32
        # (measured on TPU: refinement left the capsule-flat residual
        # bit-identical in f32, while the f64 island reached 4e-5). f32
        # callers wanting Dantzig-grade robustness use Model.lcp_dtype='f64',
        # which routes this solve through f64 and re-enables the pivot.
        if pivot_iters and b.dtype == jnp.float64:
            from diffdart_tpu.ops.lcp_pivot import pivot_refine

            lam = pivot_refine(
                lam, J, L_M, cfm, A, b, lo, hi, mu, fidx, iters=pivot_iters
            )
        return lam


# ---------------------------------------------------------------------------
# Two AD wrappers over the same implementation and the same linear IFT rule:
#
#  * boxed_lcp_lowrank (default, custom_vjp): residuals (inputs + lam) are
#    STORED, and the backward pass is jax.linear_transpose of the tangent
#    rule — so reverse-mode BPTT never re-runs the sweeps/polish.
#  * boxed_lcp_lowrank_jvp (custom_jvp): supports jacfwd (forward-mode
#    Jacobians); its rule recomputes the primal during linearization.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def boxed_lcp_lowrank(J, M, cfm, b, lo, hi, mu, fidx, iters=8, passes=3, fidx_pallas=None, pivot_iters=16):
    """Default reverse-mode-optimized entry point (see _solve_impl)."""
    return _solve_impl(J, M, cfm, b, lo, hi, mu, fidx, iters, passes, fidx_pallas, pivot_iters)


def _vjp_fwd(J, M, cfm, b, lo, hi, mu, fidx, iters, passes, fidx_pallas, pivot_iters):
    lam = _solve_impl(J, M, cfm, b, lo, hi, mu, fidx, iters, passes, fidx_pallas, pivot_iters)
    return lam, (J, M, cfm, b, lo, hi, mu, fidx, lam)


def _vjp_bwd(iters, passes, fidx_pallas, pivot_iters, res, g):
    J, M, cfm, b, lo, hi, mu, fidx, lam = res
    with jax.default_matmul_precision("highest"):
        def tangent_map(dJ, dM, dcfm, db, dlo, dhi, dmu):
            return _lowrank_jvp_tangent(
                J, M, cfm, b, lo, hi, mu, fidx, lam, dJ, dM, dcfm, db, dlo, dhi, dmu
            )

        transpose = jax.linear_transpose(tangent_map, J, M, cfm, b, lo, hi, mu)
        dJ, dM, dcfm, db, dlo, dhi, dmu = transpose(g)
    return (dJ, dM, dcfm, db, dlo, dhi, dmu, None)


boxed_lcp_lowrank.defvjp(_vjp_fwd, _vjp_bwd)


@partial(jax.custom_jvp, nondiff_argnums=(8, 9, 10, 11))
def boxed_lcp_lowrank_jvp(J, M, cfm, b, lo, hi, mu, fidx, iters=8, passes=3, fidx_pallas=None, pivot_iters=16):
    """Forward-mode-capable variant (jacfwd); see _solve_impl."""
    return _solve_impl(J, M, cfm, b, lo, hi, mu, fidx, iters, passes, fidx_pallas, pivot_iters)


@boxed_lcp_lowrank_jvp.defjvp
def _lowrank_jvp(iters, passes, fidx_pallas, pivot_iters, primals, tangents):
    J, M, cfm, b, lo, hi, mu, fidx = primals
    dJ, dM, dcfm, db, dlo, dhi, dmu, _ = tangents
    lam = _solve_impl(J, M, cfm, b, lo, hi, mu, fidx, iters, passes, fidx_pallas, pivot_iters)
    with jax.default_matmul_precision("highest"):
        return lam, _lowrank_jvp_tangent(
            J, M, cfm, b, lo, hi, mu, fidx, lam, dJ, dM, dcfm, db, dlo, dhi, dmu
        )


def _lowrank_jvp_tangent(J, M, cfm, b, lo, hi, mu, fidx, lam, dJ, dM, dcfm, db, dlo, dhi, dmu):

    dtype = J.dtype
    D, nv = J.shape
    L_M = cholesky_small(M)
    W = cho_solve_small(L_M, J.T)
    A = J @ W + cfm * jnp.eye(D, dtype=dtype)

    dJ = _mat(dJ, J)
    dM = _mat(dM, M)
    dcfm = _mat(dcfm, cfm)
    db = _mat(db, b)
    dlo = _mat(dlo, lo)
    dhi = _mat(dhi, hi)
    dmu = _mat(dmu, mu)

    free, fr_bound, s = _classify(lam, A, b, lo, hi, mu, fidx)
    F = free.astype(dtype)

    # bound-motion vector w (friction bounds move with mu; const bounds w/ lo, hi)
    lam_n = lam[jnp.maximum(fidx, 0)]
    w = jnp.where(fr_bound, s * dmu * lam_n, 0.0)
    lo_eff, hi_eff = _bounds(lam, lo, hi, mu, fidx)
    scale = jnp.maximum(jnp.abs(lam), 1.0)
    at_hi_c = (fidx < 0) & ~free & (lam >= hi_eff - _TOL * scale) & jnp.isfinite(hi)
    at_lo_c = (fidx < 0) & ~free & ~at_hi_c & (lam <= lo_eff + _TOL * scale) & jnp.isfinite(lo) & (jnp.abs(lo) > 0)
    w = w + jnp.where(at_hi_c, dhi, 0.0) + jnp.where(at_lo_c, dlo, 0.0)

    # d(A lam) = dJ y + J dy + dcfm lam,  y = Minv J^T lam
    y = W @ lam
    dy = cho_solve_small(L_M, dJ.T @ lam - dM @ y)
    dAlam = dJ @ y + J @ dy + dcfm * lam
    # A w = J (W w) + cfm w
    Aw = J @ (W @ w) + cfm * w
    rho = dAlam + Aw + db

    x = _solve_G_lowrank(-F * rho, J, L_M, cfm, free, fr_bound, s, mu, fidx)
    dlam = w + x + _apply_B(x, fr_bound, s, mu, fidx)
    # NaN hygiene: a degenerate active set (singular S at a stalled LCP
    # iterate) makes the IFT solve blow up and one bad env poisons the whole
    # batch gradient. The guard mask must be PRIMAL-only — this rule is
    # linear in the tangents and gets jax.linear_transpose'd for reverse
    # mode — so probe the same solve with a primal rhs and zero the tangent
    # where the probe misbehaves (zero subgradient instead of garbage).
    probe = _solve_G_lowrank(-F, J, L_M, cfm, free, fr_bound, s, mu, fidx)
    ok = jnp.all(jnp.isfinite(probe)) & (jnp.max(jnp.abs(probe)) < 1e12)
    return jnp.where(ok, dlam, 0.0)


def _mat(t, like):
    if t is None or type(t).__name__ == "SymbolicZero" or type(t).__name__ == "Zero":
        return jnp.zeros_like(like)
    return t
