"""Forward kinematics and world-frame Jacobian quantities.

Replaces the reference's BodyNode::updateTransform/updateVelocity recursion
(dart/dynamics/BodyNode.cpp — SURVEY.md §3.1 pass 1) with a trace-time-unrolled
sweep over the (static) topology: per-body work becomes batched array ops under
vmap; the serial chain is only as deep as the kinematic tree.

All world quantities are Plucker coordinates at the WORLD ORIGIN, which makes
every per-dof Jacobian column a single 6-vector (`Sw`) and turns mass-matrix /
bias-force assembly into dense einsums that map onto the MXU (see dynamics.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from diffdart_tpu.dynamics.joints import joint_transform, motion_subspace
from diffdart_tpu.dynamics.model import Model
from diffdart_tpu.math.lie import tf_compose
from diffdart_tpu.math.spatial import transform_motion, motion_cross


def _body_q(model: Model, q, i: int):
    lo = model.q_off[i]
    return q[lo : lo + model.body_nq(i)]


def fk(model: Model, q):
    """Forward kinematics. Returns (R, p): (nbody, 3, 3), (nbody, 3) world pose
    of every body frame."""
    Rs, ps = [], []
    for i in range(model.nbody):
        Rj, pj = joint_transform(
            model.jtype[i], _body_q(model, q, i), model.axis[i], model.axis2[i], model.screw_pitch[i]
        )
        # parent body frame -> joint predecessor -> child
        R_pc, p_pc = tf_compose(model.X_rot[i], model.X_pos[i], Rj, pj)
        par = model.parent[i]
        if par < 0:
            Rs.append(R_pc)
            ps.append(p_pc)
        else:
            R, p = tf_compose(Rs[par], ps[par], R_pc, p_pc)
            Rs.append(R)
            ps.append(p)
    return jnp.stack(Rs), jnp.stack(ps)


def world_jacobian(model: Model, q, R, p):
    """Per-dof world Jacobian columns Sw: (nv, 6).

    Sw[j] is dof j's motion subspace vector expressed in world-origin Plucker
    coordinates; the world spatial velocity of body b is
    V[b] = sum_j ancestor_mask[b, j] * Sw[j] * v[j].
    (Equivalent capability: BodyNode::getJacobian / Skeleton::getJacobian.)
    """
    cols = []
    for i in range(model.nbody):
        S = motion_subspace(
            model.jtype[i], _body_q(model, q, i), model.axis[i], model.axis2[i], model.screw_pitch[i]
        )  # (nv_i, 6) in child frame
        if S.shape[0]:
            cols.append(transform_motion(R[i][None], p[i][None], S))
    if not cols:
        return jnp.zeros((0, 6), dtype=q.dtype)
    return jnp.concatenate(cols, axis=0)


def world_jacobian_dot_terms(model: Model, q, v, R, p, Sw, V):
    """Sw_dot: (nv, 6) time derivatives of the world Jacobian columns.

    For dof j carried by body b(j): d/dt Ad_{X_b} S_local =
    ad_{V[b]} Sw[j] + Ad_{X_b} (dS_local/dq_j qdot_j); the second term (only
    nonzero for q-dependent subspaces: universal/euler/planar) is computed by
    jax.jvp of the local subspace map instead of hand-derived tables.
    (Equivalent capability: Joint::getRelativeJacobianTimeDeriv.)"""
    dof_body = model.dof_body
    Vb = jnp.stack([V[b] for b in dof_body]) if len(dof_body) else jnp.zeros((0, 6), q.dtype)
    sdot = motion_cross(Vb, Sw)
    # add Ad_X * (dS/dq qdot) for joints whose S depends on q
    extra_types = {4, 6, 9}  # UNIVERSAL, EULER, PLANAR
    for i in range(model.nbody):
        if model.jtype[i] not in extra_types:
            continue
        lo_q, nq_i = model.q_off[i], model.body_nq(i)
        lo_v, nv_i = model.v_off[i], model.body_nv(i)
        qi = q[lo_q : lo_q + nq_i]
        vi = v[lo_v : lo_v + nv_i]

        def S_of_q(qq, i=i):
            return motion_subspace(model.jtype[i], qq, model.axis[i], model.axis2[i], model.screw_pitch[i])

        _, dS = jax.jvp(S_of_q, (qi,), (vi,))  # qdot == v for these joint types
        sdot = sdot.at[lo_v : lo_v + nv_i].add(transform_motion(R[i][None], p[i][None], dS))
    return sdot


def body_velocities(model: Model, Sw, v, mask):
    """World spatial velocity of each body: (nbody, 6) = (mask * v) @ Sw."""
    return jnp.einsum("bj,jk->bk", mask * v[None, :], Sw)


def com_positions(model: Model, R, p):
    """World COM of each body: (nbody, 3)."""
    return jnp.einsum("bij,bj->bi", R, model.com) + p


def total_com(model: Model, R, p):
    """World center of mass of the whole mechanism (Skeleton::getCOM parity)."""
    coms = com_positions(model, R, p)
    m = model.mass
    return jnp.einsum("b,bi->i", m, coms) / jnp.sum(m)
