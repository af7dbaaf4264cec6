"""Timestep Jacobians and reverse-mode backprop through the step.

Capability parity with the reference's dart/neural/ layer (SURVEY.md §2.2):
BackpropSnapshot::getPosPosJacobian / getPosVelJacobian / getVelPosJacobian /
getVelVelJacobian / getForceVelJacobian / getMassVelJacobian and
BackpropSnapshot::backprop(world, LossGradient), plus the WithRespectTo
abstraction (wrt::POSITION/VELOCITY/FORCE/GROUP_MASSES/GROUP_COMS/
GROUP_INERTIAS).

Where the reference records impulse tests during the LCP solve and assembles
these matrices by hand (ConstrainedGroupGradientMatrices), here they are
jax.jacrev of the SAME step function (the contact solver exposes a
reverse-optimized custom_vjp by default and a custom_jvp variant,
ops.lcp_lowrank.boxed_lcp_lowrank_jvp, for forward-mode consumers) whose LCP carries an
implicit-function-theorem custom_vjp — one code path for simulation and
differentiation. `backprop` is a single VJP (no Jacobian materialization),
which is what BPTT training loops should use; the full matrices exist for
API parity, analysis, and iLQR-style consumers.

For models with quaternion joints the position Jacobians are reported in
TANGENT coordinates (nv x nv), matching DART's vector-space semantics: a
perturbation dq is applied via the exponential map and the output difference
is pulled back with position_difference.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from diffdart_tpu.dynamics import dynamics as D
from diffdart_tpu.dynamics.model import Model, State
from diffdart_tpu.sim import step


class TimestepJacobians(NamedTuple):
    pos_pos: jnp.ndarray  # (nv, nv) d q_{t+1} / d q_t   (tangent coords)
    pos_vel: jnp.ndarray  # (nv, nv) d v_{t+1} / d q_t
    vel_pos: jnp.ndarray  # (nv, nv) d q_{t+1} / d v_t
    vel_vel: jnp.ndarray  # (nv, nv) d v_{t+1} / d v_t
    force_pos: jnp.ndarray  # (nv, nv) d q_{t+1} / d tau_t
    force_vel: jnp.ndarray  # (nv, nv) d v_{t+1} / d tau_t
    mass_vel: jnp.ndarray  # (nbody, nv) d v_{t+1} / d mass


def _tangent_step(model: Model, q0, v, tau, dq):
    """Step from q0 perturbed by tangent dq; outputs (tangent position of
    q_{t+1} relative to step(q0)'s own output frame, v_{t+1})."""
    q = D.integrate_positions(model, q0, dq, jnp.asarray(1.0, q0.dtype))
    s = step(model, State(q=q, v=v, t=jnp.zeros((), q0.dtype)), tau)
    return s


def timestep_jacobians(model: Model, state: State, tau=None) -> TimestepJacobians:
    """All analytical timestep Jacobians at (q, v, tau). BackpropSnapshot
    parity; every entry has an FD twin in tests/test_neural.py.

    Cost structure (round-5 rewrite): the step factors exactly as
    q_{t+1} = integrate(q_t (+) dq, v_{t+1}), so every position-output
    Jacobian is the chain-rule composition
        d q_out / d x = P_q * (d dq / d x) + P_v * (d v_{t+1} / d x)
    where P_q, P_v are tangent maps of the INTEGRATION ONLY (O(nq) work,
    jacfwd over 2*nv trivial columns). AD therefore only has to run reverse
    rows for the nv velocity outputs — half the rows of the naive
    (dq_out, v_out) jacrev, and those rows no longer drag the
    collision/LCP cotangent graph through the position pullback. Measured
    ~1.9x on the 30-DOF humanoid Jacobian set, and a visibly smaller XLA
    program (compile time matters: the r1 version took 8+ min to compile)."""
    q, v = state.q, state.v
    dtype = q.dtype
    if tau is None:
        tau = jnp.zeros(model.nv, dtype)
    dt = model.dt.astype(dtype)
    base = step(model, State(q=q, v=v, t=jnp.zeros((), dtype)), tau)

    def vel_out(dq, v_, tau_, mass):
        mm = model.replace(mass=mass)
        q_ = D.integrate_positions(mm, q, dq, jnp.asarray(1.0, dtype))
        s = step(mm, State(q=q_, v=v_, t=jnp.zeros((), dtype)), tau_)
        return s.v

    zeros_dq = jnp.zeros(model.nv, dtype)

    def int_map(dq, v_new):
        # the exact position half of the step as a function of (tangent
        # perturbation of q_t, end-of-step velocity), pulled back to tangent
        # coordinates around the unperturbed output
        q_ = D.integrate_positions(model, q, dq, jnp.asarray(1.0, dtype))
        q_new = D.integrate_positions(model, q_, v_new, dt)
        return D.position_difference(model, base.q, q_new)

    def all_jacs(dq0, v_, tau_, mass):
        Jv = jax.jacrev(vel_out, argnums=(0, 1, 2, 3))(dq0, v_, tau_, mass)
        P_q = jax.jacfwd(int_map, argnums=0)(dq0, base.v)
        P_v = jax.jacfwd(int_map, argnums=1)(dq0, base.v)
        return Jv, P_q, P_v

    # jit: eager dispatch of the linearized graph costs minutes for a 30-DOF
    # model; compiled (and persistently cached) it runs in seconds
    Jv, P_q, P_v = jax.jit(all_jacs)(zeros_dq, v, tau, model.mass)
    vel_q, vel_v, vel_tau, vel_mass = Jv
    return TimestepJacobians(
        pos_pos=P_q + P_v @ vel_q,
        pos_vel=vel_q,
        vel_pos=P_v @ vel_v,
        vel_vel=vel_v,
        force_pos=P_v @ vel_tau,
        force_vel=vel_tau,
        mass_vel=vel_mass.T if vel_mass.ndim == 2 else vel_mass,
    )


class LossGradient(NamedTuple):
    """BackpropSnapshot::LossGradient parity."""

    wrt_position: jnp.ndarray  # (nv,) tangent cotangent
    wrt_velocity: jnp.ndarray  # (nv,)
    wrt_torque: jnp.ndarray  # (nv,)


def backprop(model: Model, state: State, tau, next_grad: LossGradient) -> LossGradient:
    """One reverse step: pull (dL/dq', dL/dv') back to (dL/dq, dL/dv, dL/dtau)
    with a single VJP — the on-device analogue of snapshot.backprop()."""
    q, v = state.q, state.v
    dtype = q.dtype
    base = step(model, State(q=q, v=v, t=jnp.zeros((), dtype)), tau)

    def f(dq, v_, tau_):
        q_ = D.integrate_positions(model, q, dq, jnp.asarray(1.0, dtype))
        s = step(model, State(q=q_, v=v_, t=jnp.zeros((), dtype)), tau_)
        return D.position_difference(model, base.q, s.q), s.v

    zeros_dq = jnp.zeros(model.nv, dtype)
    _, vjp = jax.vjp(f, zeros_dq, v, tau)
    gq, gv, gt = vjp((next_grad.wrt_position, next_grad.wrt_velocity))
    return LossGradient(wrt_position=gq, wrt_velocity=gv, wrt_torque=gt)


def jacobian_wrt(model: Model, state: State, tau, wrt: str):
    """WithRespectTo parity: d(q', v') / d(param). wrt in
    {'position','velocity','force','group_masses','group_coms','group_inertias'}."""
    q, v = state.q, state.v
    dtype = q.dtype
    base = step(model, State(q=q, v=v, t=jnp.zeros((), dtype)), tau)

    def stepped(mm, q_, v_, tau_):
        s = step(mm, State(q=q_, v=v_, t=jnp.zeros((), dtype)), tau_)
        return D.position_difference(mm, base.q, s.q), s.v

    if wrt == "position":
        zeros_dq = jnp.zeros(model.nv, dtype)
        return jax.jacrev(
            lambda dq: stepped(model, D.integrate_positions(model, q, dq, jnp.asarray(1.0, dtype)), v, tau)
        )(zeros_dq)
    if wrt == "velocity":
        return jax.jacrev(lambda v_: stepped(model, q, v_, tau))(v)
    if wrt == "force":
        return jax.jacrev(lambda t_: stepped(model, q, v, t_))(tau)
    if wrt == "group_masses":
        return jax.jacrev(lambda p: stepped(model.replace(mass=p), q, v, tau))(model.mass)
    if wrt == "group_coms":
        return jax.jacrev(lambda p: stepped(model.replace(com=p), q, v, tau))(model.com)
    if wrt == "group_inertias":
        return jax.jacrev(lambda p: stepped(model.replace(inertia=p), q, v, tau))(model.inertia)
    raise ValueError(f"unknown wrt: {wrt}")
