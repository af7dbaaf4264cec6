"""Per-joint-type kinematic maps: q -> joint transform, motion subspace S.

Capability parity with the reference Joint hierarchy's getRelativeTransform /
getRelativeJacobian / getRelativeJacobianTimeDeriv (dart/dynamics/
GenericJoint.hpp and the per-type *Joint.cpp files — SURVEY.md §2.1).

Because topology is STATIC, dispatch happens at Python trace time (no
lax.switch): each body's joint code is specialized into the XLA program.

Conventions:
  * joint_transform returns (R, p): successor(child-body) frame expressed in
    the joint predecessor frame.
  * motion_subspace returns S with shape (nv_j, 6), rows are spatial motion
    vectors (angular-first) expressed in the CHILD body frame: the joint's
    relative spatial velocity in child coordinates is S^T-combination
    V_rel = sum_k S[k] * qdot[k].
  * S may depend on q (universal/euler); time-derivative bias terms are
    obtained with jax.jvp in the dynamics layer rather than hand-derived
    dS/dq tables.
"""
from __future__ import annotations

import jax.numpy as jnp

from diffdart_tpu.dynamics.model import JointType
from diffdart_tpu.math.lie import exp_so3, quat_to_mat, quat_mul, quat_exp, quat_normalize

_J = JointType


def _zeros3(q):
    return jnp.zeros(3, dtype=q.dtype)


def _eye(q):
    return jnp.eye(3, dtype=q.dtype)


def joint_transform(jtype: int, q, axis, axis2, pitch):
    """(R, p) of child frame in predecessor frame. q is this joint's slice."""
    if jtype == _J.WELD:
        return jnp.eye(3, dtype=axis.dtype), jnp.zeros(3, dtype=axis.dtype)
    if jtype == _J.REVOLUTE:
        return exp_so3(axis * q[0]), _zeros3(q)
    if jtype == _J.PRISMATIC:
        return _eye(q), axis * q[0]
    if jtype == _J.SCREW:
        return exp_so3(axis * q[0]), axis * (q[0] * pitch)
    if jtype == _J.UNIVERSAL:
        R = exp_so3(axis * q[0]) @ exp_so3(axis2 * q[1])
        return R, _zeros3(q)
    if jtype == _J.BALL:
        return quat_to_mat(quat_normalize(q)), _zeros3(q)
    if jtype == _J.EULER:
        # intrinsic rotations about axis, axis2, then axis x axis2 completion
        a3 = jnp.cross(axis, axis2)
        R = exp_so3(axis * q[0]) @ exp_so3(axis2 * q[1]) @ exp_so3(a3 * q[2])
        return R, _zeros3(q)
    if jtype == _J.TRANSLATIONAL:
        return _eye(q), q
    if jtype == _J.TRANSLATIONAL2D:
        return _eye(q), axis * q[0] + axis2 * q[1]
    if jtype == _J.PLANAR:
        # translate in span(axis, axis2), rotate about the plane normal
        n = jnp.cross(axis, axis2)
        return exp_so3(n * q[2]), axis * q[0] + axis2 * q[1]
    if jtype == _J.FREE:
        return quat_to_mat(quat_normalize(q[:4])), q[4:]
    raise ValueError(f"unknown joint type {jtype}")


def motion_subspace(jtype: int, q, axis, axis2, pitch):
    """S: (nv_j, 6) joint motion subspace in the CHILD body frame."""
    dt = axis.dtype

    def row(w, v):
        return jnp.concatenate([w, v])

    if jtype == _J.WELD:
        return jnp.zeros((0, 6), dtype=dt)
    if jtype == _J.REVOLUTE:
        return row(axis, _zeros3(axis))[None]
    if jtype == _J.PRISMATIC:
        return row(_zeros3(axis), axis)[None]
    if jtype == _J.SCREW:
        return row(axis, axis * pitch)[None]
    if jtype == _J.UNIVERSAL:
        # child frame: second axis fixed; first axis rotated back through q2
        R2T = exp_so3(-axis2 * q[1])
        return jnp.stack([row(R2T @ axis, _zeros3(q)), row(axis2, _zeros3(q))])
    if jtype == _J.BALL:
        Z = jnp.zeros((3, 3), dtype=dt)
        return jnp.concatenate([jnp.eye(3, dtype=dt), Z], axis=1)
    if jtype == _J.EULER:
        a3 = jnp.cross(axis, axis2)
        R3T = exp_so3(-a3 * q[2])
        R2T = exp_so3(-axis2 * q[1])
        z = _zeros3(q)
        return jnp.stack(
            [row(R3T @ (R2T @ axis), z), row(R3T @ axis2, z), row(a3, z)]
        )
    if jtype == _J.TRANSLATIONAL:
        Z = jnp.zeros((3, 3), dtype=dt)
        return jnp.concatenate([Z, jnp.eye(3, dtype=dt)], axis=1)
    if jtype == _J.TRANSLATIONAL2D:
        # translation axes are fixed in the (non-rotating) predecessor = child frame
        z = _zeros3(axis)
        return jnp.stack([row(z, axis), row(z, axis2)])
    if jtype == _J.PLANAR:
        n = jnp.cross(axis, axis2)
        RT = exp_so3(-n * q[2])
        z = _zeros3(q)
        return jnp.stack([row(z, RT @ axis), row(z, RT @ axis2), row(n, z)])
    if jtype == _J.FREE:
        # (omega_child, v_child): quaternion + position integrated in child coords
        return jnp.eye(6, dtype=dt)
    raise ValueError(f"unknown joint type {jtype}")


def integrate_joint(jtype: int, q, vj, dt):
    """Position integration q_{t+1} = q ⊕ vj*dt per joint type.

    Parity: Skeleton::integratePositions (geometric integration for ball/free
    joints via the quaternion exponential — no Euler-angle drift)."""
    if jtype == _J.WELD:
        return q
    if jtype == _J.BALL:
        return quat_normalize(quat_mul(quat_normalize(q), quat_exp(vj * dt)))
    if jtype == _J.FREE:
        quat = quat_normalize(q[:4])
        new_quat = quat_normalize(quat_mul(quat, quat_exp(vj[:3] * dt)))
        # linear velocity is expressed in the child frame
        R = quat_to_mat(quat)
        new_pos = q[4:] + R @ vj[3:] * dt
        return jnp.concatenate([new_quat, new_pos])
    return q + vj * dt


def joint_difference(jtype: int, q1, q2):
    """Tangent-space difference d such that q1 ⊕ d ≈ q2 (for velocity-level
    comparisons; parity: Skeleton::getPositionDifferences)."""
    from diffdart_tpu.math.lie import quat_conj, quat_log

    if jtype == _J.WELD:
        return jnp.zeros(0, dtype=q1.dtype)
    if jtype == _J.BALL:
        return quat_log(quat_mul(quat_conj(quat_normalize(q1)), quat_normalize(q2)))
    if jtype == _J.FREE:
        quat1, quat2 = quat_normalize(q1[:4]), quat_normalize(q2[:4])
        dw = quat_log(quat_mul(quat_conj(quat1), quat2))
        R1T = quat_to_mat(quat1).T
        dp = R1T @ (q2[4:] - q1[4:])
        return jnp.concatenate([dw, dp])
    return q2 - q1
