"""SO(3)/SE(3) Lie-group operations, batched and differentiable.

Capability parity with the reference's dart/math/Geometry.hpp (anchors:
math::expMap, math::logMap, math::expToQuat; see SURVEY.md §2.1 "Math/Lie"),
re-designed as pure batched jnp ops: everything broadcasts over leading axes
and is safe under jit/vmap/grad (small-angle branches use Taylor series
selected by jnp.where with poisoned denominators, so gradients are finite).

Quaternions are (w, x, y, z). Transforms are (R, p) pairs with
x_world = R @ x_body + p.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def skew(v):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix such that skew(a) @ b = a x b."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


# All small-angle helpers are functions of t2 = theta^2 (a SMOOTH function of
# the input vector), so jnp.where-guarded Taylor branches have finite gradients
# at exactly zero — norm(w) itself has a NaN gradient at w=0 and must never be
# differentiated outside the guarded branch.


def _sinc_t2(t2):
    """sin(sqrt(t2))/sqrt(t2), Taylor-safe at 0 (finite value and gradient)."""
    small = t2 < _EPS
    safe = jnp.sqrt(jnp.where(small, jnp.ones_like(t2), t2))
    return jnp.where(small, 1.0 - t2 / 6.0 + t2 * t2 / 120.0, jnp.sin(safe) / safe)


def _cosc_t2(t2):
    """(1 - cos(sqrt(t2)))/t2, Taylor-safe at 0."""
    small = t2 < _EPS
    safe = jnp.where(small, jnp.ones_like(t2), t2)
    return jnp.where(small, 0.5 - t2 / 24.0 + t2 * t2 / 720.0, (1.0 - jnp.cos(jnp.sqrt(safe))) / safe)


def _sinc3_t2(t2):
    """(sqrt(t2) - sin(sqrt(t2)))/t2^1.5, Taylor-safe at 0."""
    small = t2 < _EPS
    safe = jnp.where(small, jnp.ones_like(t2), t2)
    st = jnp.sqrt(safe)
    return jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (st - jnp.sin(st)) / (st * safe))


def _cos_sqrt(t2):
    """cos(sqrt(t2)), Taylor-safe gradient at 0."""
    small = t2 < _EPS
    safe = jnp.where(small, jnp.ones_like(t2), t2)
    return jnp.where(small, 1.0 - t2 / 2.0 + t2 * t2 / 24.0, jnp.cos(jnp.sqrt(safe)))


def _sinc(theta):
    return _sinc_t2(theta * theta)


def _cosc(theta):
    return _cosc_t2(theta * theta)


def exp_so3(w):
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation matrix."""
    t2 = jnp.sum(w * w, axis=-1)
    W = skew(w)
    W2 = W @ W
    a = _sinc_t2(t2)[..., None, None]
    b = _cosc_t2(t2)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def log_so3(R):
    """(..., 3, 3) rotation matrix -> (..., 3) axis-angle (theta in [0, pi])."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # Generic case: w = theta/(2 sin theta) * vee(R - R^T)
    vee = 0.5 * jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    near_pi = theta > jnp.pi - 1e-4
    factor = jnp.where(_sinc(theta) < _EPS, jnp.ones_like(theta), 1.0 / _sinc(theta))
    generic = vee * factor[..., None]
    # Near pi: extract axis from diagonal of (R + I)/2 = aa^T approx
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag - cos_t[..., None]) / jnp.clip(1.0 - cos_t[..., None], _EPS, None), 0.0, 1.0)
    axis = jnp.sqrt(axis_sq)
    # fix signs using off-diagonal sums (R + R^T entries)
    s_xy = R[..., 0, 1] + R[..., 1, 0]
    s_xz = R[..., 0, 2] + R[..., 2, 0]
    sign_x = jnp.where(vee[..., 0] < 0, -1.0, 1.0)
    sx = axis[..., 0] * sign_x
    sy = jnp.where(s_xy * sx < 0, -axis[..., 1], axis[..., 1])
    sz = jnp.where(s_xz * sx < 0, -axis[..., 2], axis[..., 2])
    axis_signed = jnp.stack([sx, sy, sz], axis=-1)
    near = axis_signed * theta[..., None]
    return jnp.where(near_pi[..., None], near, generic)


def exp_se3(xi):
    """se(3) exp map: (..., 6) twist (omega, v) -> transform (R, p).

    p = V(omega) @ v where V = I + cosc(t) W + sinc3(t) W^2 (left Jacobian).
    Parity anchor: reference math::expMap (dart/math/Geometry.cpp).
    """
    w, v = xi[..., :3], xi[..., 3:]
    t2 = jnp.sum(w * w, axis=-1)
    W = skew(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + _sinc_t2(t2)[..., None, None] * W + _cosc_t2(t2)[..., None, None] * W2
    V = eye + _cosc_t2(t2)[..., None, None] * W + _sinc3_t2(t2)[..., None, None] * W2
    p = jnp.einsum("...ij,...j->...i", V, v)
    return R, p


def log_se3(R, p):
    """Inverse of exp_se3: transform (R, p) -> (..., 6) twist (omega, v)."""
    w = log_so3(R)
    t2 = jnp.sum(w * w, axis=-1)
    W = skew(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), W.shape)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - sinc(t)/(2 cosc(t))) W^2
    small = t2 < _EPS
    safe_t2 = jnp.where(small, jnp.ones_like(t2), t2)
    coef = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        (1.0 - _sinc_t2(safe_t2) / (2.0 * _cosc_t2(safe_t2))) / safe_t2,
    )
    Vinv = eye - 0.5 * W + coef[..., None, None] * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, p)
    return jnp.concatenate([w, v], axis=-1)


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------


def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mul(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q, v):
    """Rotate vector v by quaternion q (same as quat_to_mat(q) @ v)."""
    qw, qv = q[..., :1], q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_mat(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def mat_to_quat(R):
    """Branchless Shepperd method: (..., 3, 3) -> (..., 4) unit quaternion."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions, pick numerically best by largest pivot
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    case = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 cases, 4)
    q = jnp.take_along_axis(cands, case[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = quat_normalize(q)
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_exp(v):
    """Exponential map R^3 -> unit quaternion (half-angle convention):
    quat_to_mat(quat_exp(w)) == exp_so3(w)."""
    h2 = 0.25 * jnp.sum(v * v, axis=-1)  # (theta/2)^2, smooth in v
    w = _cos_sqrt(h2)[..., None]
    xyz = 0.5 * _sinc_t2(h2)[..., None] * v
    return jnp.concatenate([w, xyz], axis=-1)


def quat_log(q):
    """Inverse of quat_exp: unit quaternion -> R^3 axis-angle.

    NaN-safe gradient at the identity: the small-angle branch is a function of
    n2 = |xyz|^2 (smooth), never of |xyz| itself."""
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    xyz = q[..., 1:]
    n2 = jnp.sum(xyz * xyz, axis=-1, keepdims=True)
    small = n2 < _EPS
    norm = jnp.sqrt(jnp.where(small, jnp.ones_like(n2), n2))
    half = jnp.arctan2(norm, w)
    w_safe = jnp.maximum(w, 0.5)  # |xyz| tiny => w ~ 1
    taylor = 2.0 / w_safe - 2.0 * n2 / (3.0 * w_safe**3)
    scale = jnp.where(small, taylor, 2.0 * half / norm)
    return scale * xyz


# ---------------------------------------------------------------------------
# Rigid transforms as (R, p) pairs
# ---------------------------------------------------------------------------


def tf_identity(dtype=jnp.float32, batch=()):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
    p = jnp.zeros(batch + (3,), dtype=dtype)
    return R, p


def tf_compose(Ra, pa, Rb, pb):
    """(Ra, pa) o (Rb, pb): first apply b, then a."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, pb) + pa


def tf_inverse(R, p):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, p)


def tf_apply(R, p, x):
    return jnp.einsum("...ij,...j->...i", R, x) + p
