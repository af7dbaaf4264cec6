"""The simulation timestep: a pure function `step(model, state, tau) -> state`.

Capability parity with World::step (dart/simulation/World.cpp — SURVEY.md
§3.1): semi-implicit Euler — forces -> unconstrained velocity update ->
constraint impulses (contact + joint limits via boxed LCP) -> position
integration. Entirely on-device; differentiable end-to-end (AD through
dynamics/collision, implicit-function-theorem custom_vjp through the LCP).

Single-env; batch with vmap, rollout with lax.scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from diffdart_tpu.dynamics import dynamics as D
from diffdart_tpu.dynamics.model import Model, State


def step_unconstrained(model: Model, state: State, tau=None) -> State:
    """Contact-free semi-implicit Euler step (the reference's World::step with
    no collisions: forward dynamics + integrateVelocities + integratePositions)."""
    if tau is None:
        tau = jnp.zeros(model.nv, dtype=state.q.dtype)
    from diffdart_tpu.ops.smalllinalg import spd_solve_small

    q, v = state.q, state.v
    dt = model.dt.astype(q.dtype)
    cache = D.kinematics_cache(model, q, v)
    M = D.mass_matrix(model, q, cache)
    C = D.bias_forces(model, q, v, cache)
    extra_diag, f_joint = D.implicit_joint_terms(model, q, v, dt)
    M_eff = M + jnp.diag(extra_diag)
    qdd = spd_solve_small(M_eff, tau + f_joint - C)
    v_new = v + dt * qdd
    q_new = D.integrate_positions(model, q, v_new, dt)
    t = state.t + dt if state.t is not None else None
    return State(q=q_new, v=v_new, t=t)


def step(model: Model, state: State, tau=None) -> State:
    """Full timestep with contacts and joint limits (falls back to the
    unconstrained step when the model has no collision pairs or limits)."""
    has_limits = model.enable_joint_limits and model.has_joint_limits
    has_actuation_rows = bool(model.servo_dofs) or bool(model.friction_dofs)
    has_bilateral = (bool(model.ball_pairs) or bool(model.weld_pairs)
                     or bool(model.mimic_pairs))
    if not model.col_pairs and not has_limits and not has_actuation_rows and not has_bilateral:
        return step_unconstrained(model, state, tau)
    from diffdart_tpu.sim.constrained import step_constrained

    return step_constrained(model, state, tau)


def rollout(model: Model, state: State, taus) -> tuple[State, State]:
    """Scan `step` over a (T, nv) control tape; returns (final, trajectory).
    The reference's per-step Python loop becomes one fused lax.scan."""

    def body(s, tau):
        s2 = step(model, s, tau)
        return s2, s2

    return jax.lax.scan(body, state, taus)


def rollout_final(model: Model, state: State, taus) -> State:
    """Plain BPTT rollout (NO rematerialization): scan `step`, return the
    final state, let XLA store every step's residuals for the backward pass.

    Fastest gradient path for short/medium horizons: the backward never
    re-runs kinematics/collision/assembly (measured ~1.9x faster fwd+grad
    than per-step remat on cheetah B=4096 T=50). Memory grows linearly in T;
    use `rollout_checkpointed` for long horizons or big models."""

    def body(s, tau):
        return step(model, s, tau), None

    final, _ = jax.lax.scan(body, state, taus)
    return final


def rollout_checkpointed(model: Model, state: State, taus) -> State:
    """BPTT-ready rollout: per-step rematerialization (the knot-point memory
    trick — SURVEY.md §5) with the LCP impulse saved by name, so the backward
    pass re-runs kinematics/assembly but NOT the contact solve. Returns the
    final state only (per-step outputs would defeat the memory savings)."""
    # measured: saving the kinematics names too ('kin_R', 'kin_p', 'kin_Sw',
    # 'kin_Iw') gives no speedup — the backward is dominated by the LCP
    # linearization, not the FK recompute — so save only the impulse
    policy = jax.checkpoint_policies.save_only_these_names("lcp_lam")

    def body(s, tau):
        return step(model, s, tau), None

    body = jax.checkpoint(body, policy=policy)
    final, _ = jax.lax.scan(body, state, taus)
    return final


def rollout_segmented(model: Model, state: State, taus, segment: int = 10) -> State:
    """Segment-remat BPTT: remat at SEGMENT granularity (sqrt-style tradeoff
    between `rollout_final` and per-step `rollout_checkpointed`): inside a
    segment residuals are stored; across segments only the carried state is.
    `taus` length must be a multiple of `segment`."""
    T = taus.shape[0]
    if T % segment:
        raise ValueError(f"horizon {T} not a multiple of segment {segment}")
    seg_taus = taus.reshape(T // segment, segment, *taus.shape[1:])

    @jax.checkpoint
    def seg_body(s, tau_seg):
        def body(ss, tau):
            return step(model, ss, tau), None

        out, _ = jax.lax.scan(body, s, tau_seg)
        return out, None

    final, _ = jax.lax.scan(seg_body, state, seg_taus)
    return final
