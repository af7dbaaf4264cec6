"""Trace-time tile math: scalar algebra over lane-tiled env blocks.

The batch-last execution layout (sim/tilestep.py, ops/pallas_step.py): every
per-env SCALAR is one (8, 128) float32 tile holding 1024 envs — the native
VPU shape — and every small vector/matrix of the physics (positions, rotation
matrices, mass matrices, LCP rows) is a plain Python list of such tiles. All
small-dimension indexing happens at TRACE time, so the compiled program (XLA
or Mosaic) sees only full-tile elementwise ops: the hardware never touches a
(9, 9)-shaped array.

Elements are one of:
  * None          — structural zero (skipped entirely),
  * python float  — trace-time constant (folded; reaches the kernel as an
                    immediate only where it survives),
  * jnp array     — a live tile.

This gives free constant folding through fixed frame offsets / axis-aligned
rotations and free sparsity through the ancestor mask, replacing the dense
masked einsums of the vmap path (where XLA multiplies by runtime zeros).

No reference-code counterpart: this layer exists because of the TPU memory
hierarchy (VPU lanes + VMEM residency), see SURVEY.md §7 redesign notes.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# element ops (None = structural zero, float = constant, array = tile)
#
# TRACE-SPEED NOTE (round 4): every live op binds a jax.lax primitive
# DIRECTLY instead of going through the jnp operator overloads — each jnp
# binary op routes through a pjit-wrapped ufunc whose cache lookup costs
# ~250 us at trace time vs ~40 us for a bare lax bind (measured; it cut the
# nv=30 humanoid hybrid step trace from 143 s to tens of seconds). The
# emitted HLO is identical to what the jnp forms produced.
#
# Const-vs-tile binds go through _c(): a bare Python float is WEAKLY typed,
# which lax accepts only when its default dtype matches the tile — under
# jax_enable_x64 the float becomes weak f64 and lax.sub(1.0, f32_tile)
# raises. A 0-d numpy array carries an exact dtype, costs nothing at trace
# time, and folds identically.
# ---------------------------------------------------------------------------


def _c(v, like):
    """Exact-dtype 0-d constant matching `like`'s dtype (x64-safe)."""
    return np.asarray(v, dtype=like.dtype)


def is_zero(a) -> bool:
    return a is None or (isinstance(a, (int, float)) and a == 0.0)


def is_const(a) -> bool:
    return a is None or isinstance(a, (int, float))


def add(a, b):
    if is_zero(a):
        return None if is_zero(b) else b
    if is_zero(b):
        return a
    if is_const(a) and is_const(b):
        return float(a) + float(b)
    if is_const(a):
        return lax.add(b, _c(a, b))
    if is_const(b):
        return lax.add(a, _c(b, a))
    return lax.add(a, b)


def sub(a, b):
    if is_zero(b):
        return None if is_zero(a) else a
    if is_zero(a):
        return neg(b)
    if is_const(a) and is_const(b):
        return float(a) - float(b)
    if is_const(a):
        return lax.sub(_c(a, b), b)
    if is_const(b):
        return lax.sub(a, _c(b, a))
    return lax.sub(a, b)


def neg(a):
    if is_zero(a):
        return None
    if is_const(a):
        return -float(a)
    return lax.neg(a)


def mul(a, b):
    if is_zero(a) or is_zero(b):
        return None
    if is_const(a) and is_const(b):
        return float(a) * float(b)
    if is_const(a):
        return b if float(a) == 1.0 else lax.mul(b, _c(a, b))
    if is_const(b):
        return a if float(b) == 1.0 else lax.mul(a, _c(b, a))
    return lax.mul(a, b)


def fma(acc, a, b):
    return add(acc, mul(a, b))


def div(a, b):
    if is_zero(a):
        return None
    if is_const(a) and is_const(b):
        return float(a) / float(b)
    if is_const(a):
        return lax.div(_c(a, b), b)
    if is_const(b):
        return lax.div(a, _c(b, a))
    return lax.div(a, b)


def rsqrt(a):
    if is_const(a):
        return 1.0 / float(a) ** 0.5
    return lax.rsqrt(a)


def sqrt(a):
    if is_zero(a):
        return None
    if is_const(a):
        return float(a) ** 0.5
    return lax.sqrt(a)


def maximum(a, b):
    # None (structural zero) must be coerced BEFORE the const-const fold:
    # is_const(None) is True but float(None) raises — reachable when a
    # depth/violation expression constant-folds (e.g. geom on a static body).
    aa = 0.0 if a is None else a
    bb = 0.0 if b is None else b
    if is_const(aa) and is_const(bb):
        return max(float(aa), float(bb))
    if is_const(aa):
        return lax.max(bb, _c(aa, bb))
    if is_const(bb):
        return lax.max(aa, _c(bb, aa))
    return lax.max(aa, bb)


def minimum(a, b):
    aa = 0.0 if a is None else a
    bb = 0.0 if b is None else b
    if is_const(aa) and is_const(bb):
        return min(float(aa), float(bb))
    if is_const(aa):
        return lax.min(bb, _c(aa, bb))
    if is_const(bb):
        return lax.min(aa, _c(bb, aa))
    return lax.min(aa, bb)


def where(c, a, b, like=None):
    aa = 0.0 if a is None else a
    bb = 0.0 if b is None else b
    if is_const(aa) and is_const(bb):
        if like is not None:  # pin dtype: bare floats go weak-f64 under x64
            return jnp.where(c, _c(aa, like), _c(bb, like))
        return jnp.where(c, aa, bb)  # dtype from context; rare, keep jnp
    # lax.select needs equal-shaped branches: materialize the const side
    if is_const(aa):
        aa = lax.full_like(bb, float(aa))
    elif is_const(bb):
        bb = lax.full_like(aa, float(bb))
    if aa.shape == bb.shape == c.shape and aa.dtype == bb.dtype:
        return lax.select(c, aa, bb)
    return jnp.where(c, aa, bb)


def materialize(a, like):
    """Force an element to a real tile (for outputs)."""
    if a is None:
        return lax.full_like(like, 0.0)
    if is_const(a):
        return lax.full_like(like, float(a))
    return a


def abs_(a):
    if is_zero(a):
        return None
    if is_const(a):
        return abs(float(a))
    return lax.abs(a)


def clip(x, lo, hi):
    """minimum(maximum(x, lo), hi) — jnp.clip semantics via lax binds."""
    return minimum(maximum(x, lo), hi)


def gt0(a, like):
    """a > 0 as a bool tile (None/const folded against `like`'s shape)."""
    x = materialize(a, like)
    return lax.gt(x, _c(0.0, x))


# ---------------------------------------------------------------------------
# small linear algebra over element lists
# ---------------------------------------------------------------------------


def dot(xs, ys):
    """Sum_k xs[k]*ys[k], skipping structural zeros."""
    acc = None
    for x, y in zip(xs, ys):
        acc = fma(acc, x, y)
    return acc


def vadd(xs, ys):
    return [add(x, y) for x, y in zip(xs, ys)]


def vsub(xs, ys):
    return [sub(x, y) for x, y in zip(xs, ys)]


def vscale(xs, s):
    return [mul(x, s) for x in xs]


def cross3(a, b):
    return [
        sub(mul(a[1], b[2]), mul(a[2], b[1])),
        sub(mul(a[2], b[0]), mul(a[0], b[2])),
        sub(mul(a[0], b[1]), mul(a[1], b[0])),
    ]


def matvec3(R, x):
    """R: 3x3 nested list, x: len-3 list."""
    return [dot(R[i], x) for i in range(3)]


def matTvec3(R, x):
    return [dot([R[0][i], R[1][i], R[2][i]], x) for i in range(3)]


def matmul3(A, B):
    return [[dot(A[i], [B[0][j], B[1][j], B[2][j]]) for j in range(3)] for i in range(3)]


def transpose3(A):
    return [[A[j][i] for j in range(3)] for i in range(3)]


def eye3():
    return [[1.0, None, None], [None, 1.0, None], [None, None, 1.0]]


def tf_compose_t(Ra, pa, Rb, pb):
    """(Ra, pa) ∘ (Rb, pb): R = Ra Rb, p = Ra pb + pa."""
    return matmul3(Ra, Rb), vadd(matvec3(Ra, pb), pa)


def exp_so3_const_axis(axis, theta):
    """Rodrigues for a CONSTANT unit axis (python floats) and a tile angle:
    R = I + sin t [a]x + (1 - cos t) [a]x^2 — entries fold where axis
    components are zero (axis-aligned hinges cost 2 transcendentals + a few
    muls)."""
    ax, ay, az = (float(a) for a in axis)
    s = jnp.sin(theta) if not is_const(theta) else float(jnp.sin(jnp.float32(theta)))
    c = jnp.cos(theta) if not is_const(theta) else float(jnp.cos(jnp.float32(theta)))
    one_m_c = sub(1.0, c)
    K = [[None, -az or None, ay or None], [az or None, None, -ax or None], [-ay or None, ax or None, None]]
    # K2 = a a^T - I (for unit axis)
    a = [ax, ay, az]
    K2 = [[mul(a[i], a[j]) if i != j else add(mul(a[i], a[j]), -1.0) for j in range(3)] for i in range(3)]
    R = [
        [
            add(add(1.0 if i == j else None, mul(s, K[i][j])), mul(one_m_c, K2[i][j]))
            for j in range(3)
        ]
        for i in range(3)
    ]
    return R


def chol_factor(M):
    """Unrolled Cholesky of a small SPD element matrix (nested lists)."""
    n = len(M)
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = M[i][j]
            for k in range(j):
                s = sub(s, mul(L[i][k], L[j][k]))
            if i == j:
                L[i][i] = sqrt(maximum(s, 1e-12))
            else:
                L[i][j] = div(s, L[j][j]) if s is not None else None
    return L


def chol_solve(L, b):
    """Solve (L L^T) x = b given a chol_factor result."""
    n = len(b)
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = sub(s, mul(L[i][k], y[k]))
        y[i] = div(s, L[i][i]) if s is not None else None
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = sub(s, mul(L[k][i], x[k]))
        x[i] = div(s, L[i][i]) if s is not None else None
    return x


def solve_spd(M, b):
    """Solve M x = b for a small symmetric positive-definite element matrix
    (nested lists) by unrolled Cholesky. All loops unroll at trace time."""
    return chol_solve(chol_factor(M), b)


def safe_div(num, den):
    """num/den with dead denominators (|den| <= 1e-20; TPU flushes subnormal
    fill-in to zero) contributing ZERO instead of inf — singular systems
    yield finite garbage that callers' probe guards discard, never NaN
    through untaken where-branches. f64 (the CPU verification path) keeps a
    plain division: it never hits the subnormal flush, and the extra selects
    inflate XLA:CPU compile time ~20x (mirrors
    ops/smalllinalg.solve_nopivot_small)."""
    if is_zero(num):
        return None
    if is_const(den):
        return div(num, den) if abs(float(den)) > 1e-20 else None
    if den.dtype == jnp.float64:
        return div(num, den)
    dead = jnp.abs(den) <= 1e-20
    num_t = float(num) if is_const(num) else num
    return jnp.where(dead, 0.0, num_t / jnp.where(dead, 1.0, den))


def solve_ge(M, b):
    """Solve M x = b by Gaussian elimination WITHOUT pivoting, unrolled at
    trace time. Valid for diagonally-regularized near-SPD systems (the
    active-set KKT matrix S = cfm M + J^T (I+B) F J, which is UNSYMMETRIC
    when friction-bound coupling B is active — Cholesky is wrong there).
    Mirrors ops/smalllinalg.solve_nopivot_small."""
    n = len(b)
    A = [[M[i][j] for j in range(n)] for i in range(n)]
    x = list(b)
    for k in range(n - 1):
        for i in range(k + 1, n):
            if is_zero(A[i][k]):
                continue
            f = safe_div(A[i][k], A[k][k])
            for j in range(k + 1, n):
                A[i][j] = sub(A[i][j], mul(f, A[k][j]))
            x[i] = sub(x[i], mul(f, x[k]))
    out = [None] * n
    for i in reversed(range(n)):
        s = x[i]
        for j in range(i + 1, n):
            s = sub(s, mul(A[i][j], out[j]))
        out[i] = safe_div(s, A[i][i])
    return out


_EPS = 1e-8  # mirrors math/lie.py small-angle threshold


def quat_normalize_t(q):
    """q: list of 4 tiles -> normalized (mirrors lie.quat_normalize)."""
    n2 = dot(q, q)
    inv = rsqrt(n2)
    return [mul(x, inv) for x in q]


def quat_to_mat_t(q):
    """Unit quaternion (list of 4 tiles) -> 3x3 nested-list rotation
    (mirrors lie.quat_to_mat)."""
    w, x, y, z = q
    xx, yy, zz = mul(x, x), mul(y, y), mul(z, z)
    xy, xz, yz = mul(x, y), mul(x, z), mul(y, z)
    wx, wy, wz = mul(w, x), mul(w, y), mul(w, z)
    two = 2.0
    return [
        [sub(1.0, mul(two, add(yy, zz))), mul(two, sub(xy, wz)), mul(two, add(xz, wy))],
        [mul(two, add(xy, wz)), sub(1.0, mul(two, add(xx, zz))), mul(two, sub(yz, wx))],
        [mul(two, sub(xz, wy)), mul(two, add(yz, wx)), sub(1.0, mul(two, add(xx, yy)))],
    ]


def _cos_sqrt_t(t2):
    """cos(sqrt(t2)) with Taylor-safe gradient at 0 (lie._cos_sqrt)."""
    t2m = 0.0 + t2 if not is_const(t2) else jnp.asarray(float(t2))
    small = t2m < _EPS
    safe = jnp.where(small, jnp.ones_like(t2m), t2m)
    return jnp.where(small, 1.0 - t2m / 2.0 + t2m * t2m / 24.0, jnp.cos(jnp.sqrt(safe)))


def _sinc_t2_t(t2):
    """sin(sqrt(t2))/sqrt(t2), Taylor-safe (lie._sinc_t2)."""
    t2m = 0.0 + t2 if not is_const(t2) else jnp.asarray(float(t2))
    small = t2m < _EPS
    safe = jnp.sqrt(jnp.where(small, jnp.ones_like(t2m), t2m))
    return jnp.where(small, 1.0 - t2m / 6.0 + t2m * t2m / 120.0, jnp.sin(safe) / safe)


def quat_exp_t(v):
    """R^3 (list of 3 tiles) -> unit quaternion, half-angle convention
    (mirrors lie.quat_exp)."""
    h2 = mul(0.25, dot(v, v))
    if h2 is None:
        return [1.0, None, None, None]
    w = _cos_sqrt_t(h2)
    s = mul(0.5, _sinc_t2_t(h2))
    return [w] + [mul(s, x) for x in v]


def quat_mul_t(a, b):
    """Hamilton product of two quaternion tile lists (lie.quat_mul)."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return [
        sub(sub(mul(aw, bw), mul(ax, bx)), add(mul(ay, by), mul(az, bz))),
        sub(add(add(mul(aw, bx), mul(ax, bw)), mul(ay, bz)), mul(az, by)),
        add(sub(mul(aw, by), mul(ax, bz)), add(mul(ay, bw), mul(az, bx))),
        add(add(mul(aw, bz), mul(ax, by)), sub(mul(az, bw), mul(ay, bx))),
    ]


def spatial_transform_motion(R, p, w, v):
    """World-origin Plucker coordinates of a child-frame motion vector
    (w, v): w_w = R w; v_w = R v + p x (R w)."""
    ww = matvec3(R, w)
    vv = vadd(matvec3(R, v), cross3(p, ww))
    return ww, vv
