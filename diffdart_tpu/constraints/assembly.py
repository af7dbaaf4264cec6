"""Constraint assembly: contacts + joint limits -> one boxed LCP.

Capability parity with the reference's ConstraintSolver::solve pipeline
(dart/constraint/ConstraintSolver.cpp, ContactConstraint.cpp [friction basis
anchor getTangentBasisMatrixODE], JointLimitConstraint.cpp — SURVEY.md §2.1),
redesigned: no islanding/ConstrainedGroups (vmap over envs amortizes the full
fixed-size system), no per-constraint impulse tests (A = J M^-1 J^T computed
as dense batched matmuls on the MXU).

Row layout (static):
  [ nc normals | nc tangent-1 | nc tangent-2 | 2*nlim limits |
    nservo servo rows | nfric joint-friction rows |
    3*nball ball-constraint rows | 6*nweld weld-constraint rows |
    nmimic mimic rows ]
fidx couples each tangent row to its normal row. Servo rows
(ServoMotorConstraint parity) drive dof velocity to the commanded target
within +-force_limit*dt impulse bounds; joint-friction rows
(JointCoulombFrictionConstraint parity) drive dof velocity to zero within
+-joint_friction*dt.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from diffdart_tpu.collision import Contacts
from diffdart_tpu.collision.collide import contact_slots
from diffdart_tpu.dynamics.model import Model


class LCPData(NamedTuple):
    J: jnp.ndarray  # (D, nv) constraint Jacobian
    A: jnp.ndarray  # (D, D)
    b: jnp.ndarray  # (D,)
    lo: jnp.ndarray  # (D,)
    hi: jnp.ndarray  # (D,)
    mu: jnp.ndarray  # (D,)
    fidx: jnp.ndarray  # (D,) int32
    valid: jnp.ndarray  # (D,) bool


def static_fidx(model: Model) -> tuple:
    """The (static) friction-index row layout as a Python tuple — used to
    specialize kernels (e.g. the Pallas sweep) at trace time."""
    from diffdart_tpu.collision.collide import effective_contacts

    nc = effective_contacts(model)
    nlim = len(model.limited_dofs)
    nservo = len(model.servo_dofs)
    nfric = len(model.friction_dofs)
    nbi = 3 * len(model.ball_pairs) + 6 * len(model.weld_pairs)
    nmimic = len(model.mimic_pairs)
    out = [-1] * nc + list(range(nc)) + list(range(nc)) + [-1] * (
        2 * nlim + nservo + nfric + nbi + nmimic)
    return tuple(out)


def tangent_basis(n):
    """Deterministic orthonormal (t1, t2) ⊥ n, branchless (the analogue of
    ContactConstraint::getTangentBasisMatrixODE)."""
    # pick the world axis least aligned with n
    ax = jnp.argmin(jnp.abs(n), axis=-1)
    e = jnp.eye(3, dtype=n.dtype)[ax]
    t1 = jnp.cross(n, e)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(n, t1)
    return t1, t2


def point_jacobian(Sw, mask_a, mask_b, pos):
    """(nv, 3) Jacobian of the relative velocity of world point `pos` between
    body a and body b: column j = (maskA_j - maskB_j)(Sw_lin_j + Sw_ang_j x pos)."""
    lin = Sw[:, 3:] + jnp.cross(Sw[:, :3], pos[None, :])
    return (mask_a - mask_b)[:, None] * lin


def assemble_constraints(
    model: Model,
    contacts: Contacts,
    Sw,
    mask,
    Minv,
    v_star,
    v_pre,
    qt,
    dt,
    R_body=None,
    p_body=None,
    body_a=None,
    body_b=None,
) -> LCPData:
    """Build the boxed LCP over [normals | tangents1 | tangents2 | limits].

    Args:
      Sw: (nv, 6) world Jacobian columns; mask: (nbody, nv) ancestor mask.
      Minv: (nv, nv) inverse mass matrix (explicitly formed — nv is small).
      v_star: unconstrained post-step velocity; v_pre: pre-step velocity
        (for restitution).
      qt: (nv,) tangent-space positions (for joint limits).
      body_a, body_b: per-contact body index arrays (from select_contacts);
        default = the static slot layout. body -1 = world.
    """
    dtype = v_star.dtype
    nc = contacts.pos.shape[0]
    if body_a is None or body_b is None:
        sa, sb = contact_slots(model)
        body_a = jnp.asarray(np.array(sa, np.int32)) if sa else jnp.zeros((0,), jnp.int32)
        body_b = jnp.asarray(np.array(sb, np.int32)) if sb else jnp.zeros((0,), jnp.int32)
    nlim = len(model.limited_dofs)
    nservo = len(model.servo_dofs)
    nfric = len(model.friction_dofs)
    nball = len(model.ball_pairs)
    nweld = len(model.weld_pairs)
    nmimic = len(model.mimic_pairs)
    D = 3 * nc + 2 * nlim + nservo + nfric + 3 * nball + 6 * nweld + nmimic

    rows = []
    # world row for mask lookup: body -1 -> zero mask
    zero_mask = jnp.zeros(model.nv, dtype)

    def bmask(b):
        return zero_mask if b < 0 else mask[b]

    # ---- contact rows (vectorized over contacts; body indices may be
    # dynamic when a contact budget gathered the slots) ----
    J_n = jnp.zeros((0, model.nv), dtype)
    if nc:
        t1, t2 = tangent_basis(contacts.normal)
        nb = mask.shape[0]
        mask_pad = jnp.concatenate([mask, jnp.zeros((1, model.nv), dtype)], axis=0)
        ma = mask_pad[jnp.where(body_a < 0, nb, body_a)]  # (nc, nv)
        mb = mask_pad[jnp.where(body_b < 0, nb, body_b)]
        lin = Sw[None, :, 3:] + jnp.cross(Sw[None, :, :3], contacts.pos[:, None, :])
        Jp = (ma - mb)[:, :, None] * lin  # (nc, nv, 3)
        J_n = jnp.einsum("cvk,ck->cv", Jp, contacts.normal)
        J_t1 = jnp.einsum("cvk,ck->cv", Jp, t1)
        J_t2 = jnp.einsum("cvk,ck->cv", Jp, t2)
        rows += [J_n, J_t1, J_t2]
    # ---- joint limit rows (lower then upper per limited dof) ----
    if nlim:
        lim = jnp.asarray(np.array(model.limited_dofs), jnp.int32)
        e = jnp.zeros((nlim, model.nv), dtype).at[jnp.arange(nlim), lim].set(1.0)
        rows += [e, -e]
    if nservo:
        sv = jnp.asarray(np.array(model.servo_dofs), jnp.int32)
        rows += [jnp.zeros((nservo, model.nv), dtype).at[jnp.arange(nservo), sv].set(1.0)]
    if nfric:
        fr = jnp.asarray(np.array(model.friction_dofs), jnp.int32)
        rows += [jnp.zeros((nfric, model.nv), dtype).at[jnp.arange(nfric), fr].set(1.0)]
    # bilateral ball / weld constraint rows (+ their stabilization errors)
    ball_errs, weld_lin_errs, weld_ang_errs = [], [], []
    if nball or nweld:
        from diffdart_tpu.math.lie import log_so3, tf_apply

        def body_pose(bi):
            if bi < 0:
                return jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype)
            return R_body[bi], p_body[bi]

        for k, (ba, bb) in enumerate(model.ball_pairs):
            Ra_, pa_ = body_pose(ba)
            Rb_, pb_ = body_pose(bb)
            aw = tf_apply(Ra_, pa_, model.ball_anchor_a[k])
            bw = tf_apply(Rb_, pb_, model.ball_anchor_b[k])
            mid = 0.5 * (aw + bw)
            Jp = point_jacobian(Sw, bmask(ba), bmask(bb), mid)  # (nv, 3)
            rows += [Jp.T]
            ball_errs.append(aw - bw)
        for k, (ba, bb) in enumerate(model.weld_pairs):
            Ra_, pa_ = body_pose(ba)
            Rb_, pb_ = body_pose(bb)
            aw = tf_apply(Ra_, pa_, model.weld_anchor_a[k])
            bw = tf_apply(Rb_, pb_, model.weld_anchor_b[k])
            mid = 0.5 * (aw + bw)
            Jp = point_jacobian(Sw, bmask(ba), bmask(bb), mid)
            J_ang = (bmask(ba) - bmask(bb))[:, None] * Sw[:, :3]  # (nv, 3)
            rows += [Jp.T, J_ang.T]
            weld_lin_errs.append(aw - bw)
            # orientation error: E = R_a rel R_b^T should be identity
            E_rot = Ra_ @ model.weld_rel_rot[k] @ Rb_.T
            weld_ang_errs.append(log_so3(E_rot))
    # mimic rows (URDF <mimic> / Joint::setMimicJoint parity): one bilateral
    # row per coupling, J = e_dof - mult * e_src
    if nmimic:
        md = np.array([p[0] for p in model.mimic_pairs])
        ms = np.array([p[1] for p in model.mimic_pairs])
        e_d = jnp.zeros((nmimic, model.nv), dtype).at[jnp.arange(nmimic), md].set(1.0)
        e_s = jnp.zeros((nmimic, model.nv), dtype).at[jnp.arange(nmimic), ms].set(1.0)
        rows += [e_d - model.mimic_mult[:, None] * e_s]
    J = jnp.concatenate(rows, axis=0) if rows else jnp.zeros((0, model.nv), dtype)

    A = J @ Minv @ J.T
    A = A + model.contact_cfm * jnp.eye(D, dtype=dtype)

    # ---- b / bounds / fidx / validity ----
    # max error-correction velocity (the reference caps ERV similarly so deep
    # initial penetrations don't launch bodies)
    erp_vel_cap = 2.0
    slop = 1e-5
    b_parts, lo_parts, hi_parts, mu_parts, fidx_parts, valid_parts = [], [], [], [], [], []
    inf = jnp.full((nc,), jnp.inf, dtype) if nc else None
    if nc:
        v_n_pre = J_n @ v_pre
        push = jnp.minimum(model.baumgarte_erp * jnp.maximum(contacts.depth - slop, 0.0) / dt, erp_vel_cap)
        bounce = contacts.restitution * jnp.maximum(-v_n_pre - 0.01, 0.0)
        target = jnp.maximum(push, bounce)
        b_n = J_n @ v_star - target
        b_t1 = rows[1] @ v_star
        b_t2 = rows[2] @ v_star
        zero = jnp.zeros((nc,), dtype)
        b_parts += [b_n, b_t1, b_t2]
        lo_parts += [zero, zero, zero]  # friction lo/hi come from fidx coupling
        hi_parts += [inf, zero, zero]
        mu_parts += [zero, contacts.friction, contacts.friction]
        fidx_parts += [
            jnp.full((nc,), -1, jnp.int32),
            jnp.arange(nc, dtype=jnp.int32),
            jnp.arange(nc, dtype=jnp.int32),
        ]
        valid_parts += [contacts.valid] * 3
    if nlim:
        lim = jnp.asarray(np.array(model.limited_dofs), jnp.int32)
        q_j = qt[lim]
        v_j = v_pre[lim]
        lo_lim = model.q_lo[lim]
        hi_lim = model.q_hi[lim]
        # lower limit: v_j' >= target_lo; active if violated now or predicted
        viol_lo = lo_lim - q_j
        act_lo = (viol_lo > 0) | (lo_lim - (q_j + dt * v_j) > 0)
        target_lo = jnp.minimum(model.baumgarte_erp * jnp.maximum(viol_lo, 0.0) / dt, erp_vel_cap)
        b_lo = v_star[lim] - target_lo
        viol_hi = q_j - hi_lim
        act_hi = (viol_hi > 0) | ((q_j + dt * v_j) - hi_lim > 0)
        target_hi = jnp.minimum(model.baumgarte_erp * jnp.maximum(viol_hi, 0.0) / dt, erp_vel_cap)
        b_hi = -v_star[lim] - target_hi
        zero = jnp.zeros((nlim,), dtype)
        infl = jnp.full((nlim,), jnp.inf, dtype)
        b_parts += [b_lo, b_hi]
        lo_parts += [zero, zero]
        hi_parts += [infl, infl]
        mu_parts += [zero, zero]
        fidx_parts += [jnp.full((nlim,), -1, jnp.int32)] * 2
        valid_parts += [act_lo, act_hi]
    if nservo:
        sv = jnp.asarray(np.array(model.servo_dofs), jnp.int32)
        b_parts += [v_star[sv] - model.servo_target[sv]]
        lo_parts += [-model.force_limit[sv] * dt]
        hi_parts += [model.force_limit[sv] * dt]
        mu_parts += [jnp.zeros((nservo,), dtype)]
        fidx_parts += [jnp.full((nservo,), -1, jnp.int32)]
        valid_parts += [jnp.ones((nservo,), bool)]
    if nfric:
        fr = jnp.asarray(np.array(model.friction_dofs), jnp.int32)
        b_parts += [v_star[fr]]
        lo_parts += [-model.joint_friction[fr] * dt]
        hi_parts += [model.joint_friction[fr] * dt]
        mu_parts += [jnp.zeros((nfric,), dtype)]
        fidx_parts += [jnp.full((nfric,), -1, jnp.int32)]
        valid_parts += [jnp.ones((nfric,), bool)]
    if nball or nweld:
        # bilateral rows: unbounded impulses, Baumgarte-stabilized equalities
        err_vec = []
        for e in ball_errs:
            err_vec.append(e)
        for el, ea in zip(weld_lin_errs, weld_ang_errs):
            err_vec.append(el)
            err_vec.append(ea)
        err = jnp.concatenate(err_vec)  # (3*nball + 6*nweld,)
        nbi = err.shape[0]
        start = 3 * nc + 2 * nlim + nservo + nfric
        Jbi = J[start : start + nbi]
        b_parts += [Jbi @ v_star + (model.baumgarte_erp / dt) * err]
        lo_parts += [jnp.full((nbi,), -jnp.inf, dtype)]
        hi_parts += [jnp.full((nbi,), jnp.inf, dtype)]
        mu_parts += [jnp.zeros((nbi,), dtype)]
        fidx_parts += [jnp.full((nbi,), -1, jnp.int32)]
        valid_parts += [jnp.ones((nbi,), bool)]
    if nmimic:
        md = jnp.asarray(np.array([p[0] for p in model.mimic_pairs]), jnp.int32)
        ms = jnp.asarray(np.array([p[1] for p in model.mimic_pairs]), jnp.int32)
        start = 3 * nc + 2 * nlim + nservo + nfric + 3 * nball + 6 * nweld
        Jmi = J[start : start + nmimic]
        # position error q_d - mult*q_s - offset, corrected at erp-rate with
        # the same velocity cap as the other stabilized rows
        err = qt[md] - model.mimic_mult * qt[ms] - model.mimic_offset
        corr = jnp.clip(model.baumgarte_erp * err / dt, -erp_vel_cap, erp_vel_cap)
        b_parts += [Jmi @ v_star + corr]
        lo_parts += [jnp.full((nmimic,), -jnp.inf, dtype)]
        hi_parts += [jnp.full((nmimic,), jnp.inf, dtype)]
        mu_parts += [jnp.zeros((nmimic,), dtype)]
        fidx_parts += [jnp.full((nmimic,), -1, jnp.int32)]
        valid_parts += [jnp.ones((nmimic,), bool)]

    b = jnp.concatenate(b_parts) if b_parts else jnp.zeros((0,), dtype)
    lo = jnp.concatenate(lo_parts) if lo_parts else jnp.zeros((0,), dtype)
    hi = jnp.concatenate(hi_parts) if hi_parts else jnp.zeros((0,), dtype)
    mu = jnp.concatenate(mu_parts) if mu_parts else jnp.zeros((0,), dtype)
    fidx = jnp.concatenate(fidx_parts) if fidx_parts else jnp.zeros((0,), jnp.int32)
    valid = jnp.concatenate(valid_parts) if valid_parts else jnp.zeros((0,), bool)

    # disable invalid rows: lo = hi = 0 (and sever friction coupling)
    lo = jnp.where(valid, lo, 0.0)
    hi = jnp.where(valid, hi, 0.0)
    mu = jnp.where(valid, mu, 0.0)
    return LCPData(J=J, A=A, b=b, lo=lo, hi=hi, mu=mu, fidx=fidx, valid=valid)
