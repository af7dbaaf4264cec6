"""Articulated-body dynamics: mass matrix, bias forces, forward/inverse
dynamics, and geometric position integration.

Capability parity with the reference's Featherstone stack
(Skeleton::computeForwardDynamics [ABA], Skeleton::getMassMatrix [CRBA],
getCoriolisAndGravityForces, integratePositions/integrateVelocities —
dart/dynamics/Skeleton.cpp, SURVEY.md §2.1/§3.1), redesigned for TPU:

Instead of the O(n) serial ABA recursion, we use the world-frame
composite-rigid-body formulation
    M(q)   = sum_b J_b^T I_b^w J_b          (dense einsum -> MXU)
    C(q,v) = sum_b J_b^T (I_b^w a_b^vp + V_b x* I_b^w V_b)
    qdd    = solve(M, tau_total - C)        (batched Cholesky)
where J_b = ancestor_mask[b] * Sw are world-origin-Plucker Jacobians. For the
<= ~40-DOF mechanisms this framework targets, batched dense linear algebra over
thousands of vmapped envs beats a serial scan on TPU by a wide margin; the
only sequential section left is the depth-of-tree FK sweep.

All functions are single-env; batch with vmap.
"""
from __future__ import annotations

import jax.numpy as jnp

from diffdart_tpu.dynamics import kinematics as K
from diffdart_tpu.dynamics.joints import integrate_joint, joint_difference
from diffdart_tpu.dynamics.model import JointType, Model
from diffdart_tpu.math.spatial import force_cross, spatial_inertia, transform_inertia


def _mask(model: Model, dtype):
    return jnp.asarray(model.ancestor_mask, dtype)


def kinematics_cache(model: Model, q, v):
    """Shared per-step kinematic quantities (the analogue of the reference's
    'update all BodyNode transforms/velocities' dirty-flag pass).

    Outputs carry checkpoint names so remat policies
    (sim.rollout_checkpointed) can SAVE them: the BPTT backward pass then
    skips re-running the FK sweep and inertia transforms."""
    from jax.ad_checkpoint import checkpoint_name

    R, p = K.fk(model, q)
    Sw = K.world_jacobian(model, q, R, p)
    mask = _mask(model, q.dtype)
    V = K.body_velocities(model, Sw, v, mask)
    I_body = spatial_inertia(model.mass, model.com, model.inertia)
    I_w = transform_inertia(R, p, I_body)
    R = checkpoint_name(R, "kin_R")
    p = checkpoint_name(p, "kin_p")
    Sw = checkpoint_name(Sw, "kin_Sw")
    I_w = checkpoint_name(I_w, "kin_Iw")
    return dict(R=R, p=p, Sw=Sw, mask=mask, V=V, I_w=I_w)


def mass_matrix(model: Model, q, cache=None):
    """(nv, nv) joint-space inertia matrix (CRBA parity)."""
    if cache is None:
        cache = kinematics_cache(model, q, jnp.zeros(model.nv, q.dtype))
    J = cache["mask"][:, :, None] * cache["Sw"][None, :, :]  # (nbody, nv, 6)
    M = jnp.einsum("bnu,buw,bmw->nm", J, cache["I_w"], J)
    return M + jnp.diag(model.armature)


def bias_forces(model: Model, q, v, cache=None):
    """(nv,) Coriolis + centrifugal + gravity generalized forces
    (getCoriolisAndGravityForces parity). Does NOT include joint damping or
    springs — those are applied as explicit joint forces in forward_dynamics."""
    if cache is None:
        cache = kinematics_cache(model, q, v)
    R, p, Sw, mask, V, I_w = (cache[k] for k in ("R", "p", "Sw", "mask", "V", "I_w"))
    sdot = K.world_jacobian_dot_terms(model, q, v, R, p, Sw, V)
    # velocity-product acceleration of each body + gravity as base acceleration
    a_grav = jnp.concatenate([jnp.zeros(3, q.dtype), model.gravity])
    a_vp = jnp.einsum("bj,jk->bk", mask * v[None, :], sdot) - a_grav[None, :]
    F = jnp.einsum("buw,bw->bu", I_w, a_vp) + force_cross(V, jnp.einsum("buw,bw->bu", I_w, V))
    J = mask[:, :, None] * Sw[None, :, :]
    return jnp.einsum("bnu,bu->n", J, F)


def q_tangent(model: Model, q):
    """Project q to (nv,) tangent coordinates (identity for scalar joints,
    log map for quaternion joints) — used for springs and joint limits."""
    return position_difference(model, _neutral_like(model, q), q)


def _neutral_like(model: Model, q):
    qn = jnp.zeros_like(q)
    for i in range(model.nbody):
        if model.jtype[i] in (JointType.BALL, JointType.FREE):
            qn = qn.at[model.q_off[i]].set(1.0)
    return qn


def joint_forces(model: Model, q, v):
    """Explicit per-dof joint forces: viscous damping + linear springs
    (Joint::getDampingForces / getSpringForces parity)."""
    f = -model.damping * v
    if model.has_springs:
        f = f - model.spring_stiff * (q_tangent(model, q) - model.q_rest)
    return f


def implicit_joint_terms(model: Model, q, v, dt):
    """Implicit (backward-Euler) spring/damper treatment, the reference's
    stability trick for stiff joint PD (DART folds spring/damping into the
    augmented mass matrix — GenericJoint implicit spring/damper):

        M_eff = M + dt diag(d) + dt^2 diag(k)
        f     = -d v - k (qt - q_rest) - dt k v

    so  v' = v + dt M_eff^{-1} (tau - C + f)  is unconditionally stable in
    the joint-local stiffness. Returns (M_extra_diag, f)."""
    d = model.damping
    f = -d * v
    extra = dt * d
    if model.has_springs:
        k = model.spring_stiff
        f = f - k * (q_tangent(model, q) - model.q_rest) - dt * k * v
        extra = extra + dt * dt * k
    return extra, f


def forward_dynamics(model: Model, q, v, tau, f_ext=None, cache=None):
    """Unconstrained forward dynamics: qdd = M^{-1}(tau_total - C).

    f_ext: optional (nv,) additional generalized force (e.g. from contact
    impulses converted to forces)."""
    if cache is None:
        cache = kinematics_cache(model, q, v)
    from diffdart_tpu.ops.smalllinalg import spd_solve_small

    M = mass_matrix(model, q, cache)
    C = bias_forces(model, q, v, cache)
    rhs = tau + joint_forces(model, q, v) - C
    if f_ext is not None:
        rhs = rhs + f_ext
    return spd_solve_small(M, rhs)


def inverse_dynamics(model: Model, q, v, qdd):
    """tau = M qdd + C (RNEA capability: Skeleton::computeInverseDynamics)."""
    cache = kinematics_cache(model, q, v)
    M = mass_matrix(model, q, cache)
    C = bias_forces(model, q, v, cache)
    return M @ qdd + C - joint_forces(model, q, v)


def integrate_positions(model: Model, q, v, dt):
    """Geometric position integration q' = q ⊕ v*dt (quaternion exp for
    ball/free joints). Parity: Skeleton::integratePositions."""
    parts = []
    for i in range(model.nbody):
        lo_q, nq_i = model.q_off[i], model.body_nq(i)
        lo_v, nv_i = model.v_off[i], model.body_nv(i)
        parts.append(
            integrate_joint(model.jtype[i], q[lo_q : lo_q + nq_i], v[lo_v : lo_v + nv_i], dt)
        )
    if not parts:
        return q
    return jnp.concatenate(parts)


def position_difference(model: Model, q1, q2):
    """(nv,) tangent-space difference q2 ⊖ q1.
    Parity: Skeleton::getPositionDifferences."""
    parts = []
    for i in range(model.nbody):
        lo_q, nq_i = model.q_off[i], model.body_nq(i)
        parts.append(joint_difference(model.jtype[i], q1[lo_q : lo_q + nq_i], q2[lo_q : lo_q + nq_i]))
    if not parts:
        return jnp.zeros(0, dtype=q1.dtype)
    return jnp.concatenate(parts)


def kinetic_energy(model: Model, q, v):
    cache = kinematics_cache(model, q, v)
    return 0.5 * jnp.einsum("bu,buw,bw->", cache["V"], cache["I_w"], cache["V"])


def potential_energy(model: Model, q):
    R, p = K.fk(model, q)
    coms = K.com_positions(model, R, p)
    return -jnp.einsum("b,bi,i->", model.mass, coms, model.gravity)
