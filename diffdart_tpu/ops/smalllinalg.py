"""Unrolled small-matrix linear algebra for the TPU hot path.

XLA's batched `linalg.cholesky` / `linalg.solve` lower to sequential pivoting
loops that run ~10-50x slower than necessary for the tiny (nv <= ~40) systems
articulated dynamics needs (measured: (4096,42,42) LU ~ 50 ms, (4096,9,9)
solves ~ 8 ms on one v5e core). These unrolled versions emit n small fused
vector ops instead — batch parallelism comes from vmap.

All functions are single-matrix; vmap for batches. Sizes are static.
"""
from __future__ import annotations

import jax.numpy as jnp


def cholesky_small(A):
    """(n, n) SPD -> lower-triangular L with A = L L^T (outer-product form,
    unrolled over the static size)."""
    n = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(n):
        s = A[j, j] - (L[j, :j] @ L[j, :j] if j else 0.0)
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        L = L.at[j, j].set(d)
        if j + 1 < n:
            col = (A[j + 1 :, j] - (L[j + 1 :, :j] @ L[j, :j] if j else 0.0)) / d
            L = L.at[j + 1 :, j].set(col)
    return L


def tri_solve_lower(L, b):
    """Solve L x = b, L lower-triangular. b: (n,) or (n, k)."""
    n = L.shape[-1]
    xs = []
    for i in range(n):
        acc = b[i]
        if i:
            acc = acc - L[i, :i] @ jnp.stack(xs)
        xs.append(acc / L[i, i])
    return jnp.stack(xs)


def tri_solve_upper(U, b):
    """Solve U x = b, U upper-triangular. b: (n,) or (n, k)."""
    n = U.shape[-1]
    xs = [None] * n
    for i in range(n - 1, -1, -1):
        acc = b[i]
        if i + 1 < n:
            acc = acc - U[i, i + 1 :] @ jnp.stack(xs[i + 1 :])
        xs[i] = acc / U[i, i]
    return jnp.stack(xs)


def cho_solve_small(L, b):
    """Solve (L L^T) x = b given the Cholesky factor."""
    return tri_solve_upper(L.T, tri_solve_lower(L, b))


def spd_solve_small(A, b):
    """Solve SPD A x = b via unrolled Cholesky."""
    return cho_solve_small(cholesky_small(A), b)


def _safe_piv(piv):
    """TPU-safe pivot handling for the no-pivot GE below: exactly-singular
    systems (degenerate active sets; TPU flushes subnormal fill-in to zero)
    would emit inf factors and then NaN (0*inf) even against a ZERO rhs —
    poisoning whole-batch gradients through the untaken branches of
    downstream `where` guards. Dead pivots therefore contribute NOTHING
    (factor/solution zeroed) instead of being clamped-and-divided, so no
    inf is ever created; the garbage-but-finite solution is discarded by
    the callers' probe guards."""
    dead = jnp.abs(piv) <= 1e-20
    return jnp.where(dead, 1.0, piv), dead


def solve_nopivot_small(A, b):
    """Solve general (diagonally regularized) A x = b by Gaussian elimination
    WITHOUT pivoting — valid for the near-SPD active-set systems here whose
    diagonal is bounded below by the CFM regularizer. b: (n,) or (n, k).

    f32 (the TPU path) uses dead-pivot zeroing (_safe_piv): singular systems
    yield finite garbage, never inf/NaN. f64 (the CPU verification path)
    keeps the plain algorithm — the extra selects inflate XLA:CPU compile
    time ~20x, and f64 never hits the subnormal-flush failure in practice.
    """
    if A.dtype == jnp.float64:
        n = A.shape[-1]
        for k in range(n - 1):
            piv = A[k, k]
            factor = A[k + 1 :, k] / piv
            A = A.at[k + 1 :, k:].add(-factor[:, None] * A[k, k:][None, :])
            if b.ndim > 1:
                b = b.at[k + 1 :].add(-factor[:, None] * b[k][None, :])
            else:
                b = b.at[k + 1 :].add(-factor * b[k])
        return tri_solve_upper(jnp.triu(A), b)
    n = A.shape[-1]
    for k in range(n - 1):
        piv, dead = _safe_piv(A[k, k])
        factor = jnp.where(dead, 0.0, A[k + 1 :, k] / piv)
        A = A.at[k + 1 :, k:].add(-factor[:, None] * A[k, k:][None, :])
        if b.ndim > 1:
            b = b.at[k + 1 :].add(-factor[:, None] * b[k][None, :])
        else:
            b = b.at[k + 1 :].add(-factor * b[k])
    xs = [None] * n
    for i in range(n - 1, -1, -1):
        acc = b[i]
        if i + 1 < n:
            stacked = jnp.stack(xs[i + 1 :])
            acc = acc - (A[i, i + 1 :] @ stacked if b.ndim == 1 else jnp.tensordot(A[i, i + 1 :], stacked, axes=1))
        piv, dead = _safe_piv(A[i, i])
        xs[i] = jnp.where(dead, 0.0, acc / piv)
    return jnp.stack(xs)


def inv_small_spd(A):
    """Explicit inverse of a small SPD matrix via unrolled Cholesky."""
    n = A.shape[-1]
    return spd_solve_small(A, jnp.eye(n, dtype=A.dtype))
