"""Coordinate mappings: optimize/backprop in alternate (e.g. task-space)
coordinates.

Capability parity with dart/neural/Mapping.cpp + IKMapping.cpp +
MappedBackpropSnapshot.cpp (SURVEY.md §2.2): in JAX, any differentiable
reparametrization composes with the step for free, so a Mapping is just a
(map, unmap) pair; IKMapping targets world positions of chosen bodies and
inverts with damped-least-squares Gauss-Newton on the batched FK.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from diffdart_tpu.dynamics import dynamics as D
from diffdart_tpu.dynamics import kinematics as K
from diffdart_tpu.dynamics.model import Model


class IdentityMapping:
    """Trivial mapping (neural::IdentityMapping parity)."""

    def __init__(self, model: Model):
        self.model = model

    def map_pos(self, q):
        return q

    def unmap_pos(self, z, q_guess=None):
        return z


def solve_ik(model: Model, body: int, target_pos, q0, iters: int = 50, damping: float = 1e-4):
    """Position IK for one body origin: find q with fk(q)[body] ~ target_pos
    (InverseKinematics::solve parity — dart/dynamics/InverseKinematics.cpp,
    JacobianDLS gradient method). Jittable; returns (q, err_norm)."""
    mp = IKMapping(model, [body], iters=iters, damping=damping)
    q = mp.unmap_pos(jnp.asarray(target_pos, q0.dtype), q0)
    err = jnp.linalg.norm(mp.map_pos(q) - jnp.asarray(target_pos, q0.dtype))
    return q, err


class IKMapping:
    """Task-space mapping: z = world positions of selected body frames
    (neural::IKMapping parity). `unmap_pos` solves IK by damped Gauss-Newton
    (JacobianDLS parity — dart/dynamics/InverseKinematics.cpp) on top of the
    differentiable FK, entirely jittable."""

    def __init__(self, model: Model, bodies, iters: int = 30, damping: float = 1e-4):
        self.model = model
        self.bodies = tuple(bodies)
        self.iters = iters
        self.damping = damping

    def map_pos(self, q):
        """(3*len(bodies),) world positions of the selected body origins."""
        R, p = K.fk(self.model, q)
        return jnp.concatenate([p[b] for b in self.bodies])

    def map_vel(self, q, v):
        """Task-space velocity via the point Jacobian."""
        J = self.jacobian(q)
        return J @ v

    def jacobian(self, q):
        """(3*nb, nv) task Jacobian in tangent coordinates."""
        m = self.model

        def f(dq):
            q_ = D.integrate_positions(m, q, dq, jnp.asarray(1.0, q.dtype))
            return self.map_pos(q_)

        return jax.jacfwd(f)(jnp.zeros(m.nv, q.dtype))

    def unmap_pos(self, z, q_guess):
        """Damped-least-squares IK: find q with map_pos(q) ~ z."""
        m = self.model

        def body(_, q):
            err = z - self.map_pos(q)
            J = self.jacobian(q)
            H = J @ J.T + self.damping * jnp.eye(J.shape[0], dtype=q.dtype)
            dq = J.T @ jnp.linalg.solve(H, err)
            return D.integrate_positions(m, q, dq, jnp.asarray(1.0, q.dtype))

        return jax.lax.fori_loop(0, self.iters, body, q_guess)


class HierarchicalIK:
    """Whole-body IK over PRIORITIZED task levels with nullspace projection
    (dart/dynamics/HierarchicalIK.cpp parity): each level is a list of
    (body, offset, target) point tasks; lower levels only move within the
    nullspace of all higher levels. Fully jittable (fixed level structure).

    levels: [[(body, offset_xyz), ...], ...] — highest priority first.
    solve(targets, q0): targets is a list matching `levels`, each an
    (n_tasks_i, 3) array of world targets.
    """

    def __init__(self, model: Model, levels, iters: int = 40, damping: float = 1e-4,
                 step: float = 1.0):
        self.model = model
        self.levels = [tuple((int(b), jnp.asarray(off)) for (b, off) in lvl) for lvl in levels]
        self.iters = iters
        self.damping = damping
        self.step = step

    def _level_pos(self, q, lvl):
        from diffdart_tpu.math.lie import tf_apply

        R, p = K.fk(self.model, q)
        return jnp.concatenate(
            [tf_apply(R[b], p[b], jnp.asarray(off, q.dtype)) for (b, off) in lvl]
        )

    def _level_jac(self, q, lvl):
        m = self.model

        def f(dq):
            q_ = D.integrate_positions(m, q, dq, jnp.asarray(1.0, q.dtype))
            return self._level_pos(q_, lvl)

        return jax.jacfwd(f)(jnp.zeros(m.nv, q.dtype))

    def solve(self, targets, q0):
        """Returns (q, per-level error norms)."""
        m = self.model
        dtype = q0.dtype
        zs = [jnp.reshape(jnp.asarray(t, dtype), (-1,)) for t in targets]

        def body(_, q):
            dq = jnp.zeros(m.nv, dtype)
            N = jnp.eye(m.nv, dtype=dtype)  # nullspace of higher levels
            for lvl, z in zip(self.levels, zs):
                err = z - self._level_pos(q, lvl)
                J = self._level_jac(q, lvl) @ N  # restrict to remaining freedom
                H = J @ J.T + self.damping * jnp.eye(J.shape[0], dtype=dtype)
                dq_l = N @ (J.T @ jnp.linalg.solve(H, err - self._level_jac(q, lvl) @ dq))
                dq = dq + dq_l
                # shrink the nullspace: N <- N (I - J+ J)
                Jp = J.T @ jnp.linalg.solve(H, J)
                N = N @ (jnp.eye(m.nv, dtype=dtype) - Jp)
            return D.integrate_positions(m, q, self.step * dq, jnp.asarray(1.0, dtype))

        q = jax.lax.fori_loop(0, self.iters, body, q0)
        errs = jnp.stack(
            [jnp.linalg.norm(z - self._level_pos(q, lvl)) for lvl, z in zip(self.levels, zs)]
        )
        return q, errs
