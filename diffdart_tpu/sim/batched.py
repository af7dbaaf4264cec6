"""Batched-step execution path: the LCP sweeps run OUTSIDE vmap so the
block Pallas kernel (A resident in VMEM across iterations, envs blocked per
grid program) can be used.

`step_batched(model, states, taus)` is semantically vmap(step) but splits the
pipeline: per-env assembly (vmapped) -> BATCHED fused sweeps -> per-env
active-set polish + integration (vmapped).

MEASURED (cheetah B=4096, one v5e core): 21.5 ms/step vs 5.5 ms for the
vmapped-XLA path, with outputs matching to f32 eps. The VMEM-blocked kernel
loses because D~42 blocks carry too little compute to hide the A-block DMA,
and the mul-reduce temporaries force small (64-env) blocks. Verdict recorded
for round 2: kernel-level wins at this problem size require a batch-last
layout redesign (batch dim on the 128-lane axis), not VMEM blocking of
batch-first tensors. The default `vmap(step)` path remains canonical.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from diffdart_tpu.constraints.assembly import assemble_constraints, static_fidx
from diffdart_tpu.dynamics import dynamics as D
from diffdart_tpu.dynamics.model import Model, State

from diffdart_tpu.ops.lcp_lowrank import _polish_lowrank
from diffdart_tpu.ops.smalllinalg import cholesky_small, cho_solve_small


def _pre(model: Model, state: State, tau):
    """Everything before the LCP solve (single env)."""
    q, v = state.q, state.v
    dtype = q.dtype
    dt = model.dt.astype(dtype)
    cache = D.kinematics_cache(model, q, v)
    M_plain = D.mass_matrix(model, q, cache)
    C = D.bias_forces(model, q, v, cache)
    extra_diag, f_joint = D.implicit_joint_terms(model, q, v, dt)
    M = M_plain + jnp.diag(extra_diag)
    L = cholesky_small(M)
    Minv = cho_solve_small(L, jnp.eye(model.nv, dtype=dtype))
    v_star = v + dt * (Minv @ (tau + f_joint - C))
    from diffdart_tpu.collision.collide import collide_world_with_bodies

    contacts, ba, bb = collide_world_with_bodies(model, cache["R"], cache["p"])
    qt = D.q_tangent(model, q)
    lcp = assemble_constraints(
        model, contacts, cache["Sw"], cache["mask"], Minv, v_star, v, qt, dt,
        R_body=cache["R"], p_body=cache["p"], body_a=ba, body_b=bb,
    )
    return lcp, M, L, Minv, v_star


def _post(model: Model, state: State, lcp, L, Minv, v_star, lam):
    dtype = state.q.dtype
    dt = model.dt.astype(dtype)
    with jax.default_matmul_precision("highest"):
        A = lcp.J @ (cho_solve_small(L, lcp.J.T)) + model.contact_cfm * jnp.eye(
            lcp.J.shape[0], dtype=dtype
        )
        lam = _polish_lowrank(
            lam, lcp.J, L, jnp.asarray(model.contact_cfm, dtype), A,
            lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx, passes=2,
        )
        v_new = v_star + Minv @ (lcp.J.T @ lam)
    q_new = D.integrate_positions(model, state.q, v_new, dt)
    t = state.t + dt if state.t is not None else None
    return State(q=q_new, v=v_new, t=t)


def step_batched(model: Model, states: State, taus):
    """Semantically equivalent to vmap(step)(states, taus) but with the LCP
    warm-start sweeps executed by the BLOCK Pallas kernel over the whole
    batch. NOTE: no custom_jvp on this path yet — use for forward simulation
    (rollouts, evaluation); training uses the vmapped step."""
    from diffdart_tpu.ops.pallas_lcp import jacobi_sweeps_pallas

    lcp, M, L, Minv, v_star = jax.vmap(lambda s, t: _pre(model, s, t))(states, taus)
    if lcp.b.shape[-1] == 0:
        dtype = states.q.dtype
        dt = model.dt.astype(dtype)
        q_new = jax.vmap(lambda q, v: D.integrate_positions(model, q, v, dt))(states.q, v_star)
        return State(q=q_new, v=v_star, t=states.t + dt)

    with jax.default_matmul_precision("highest"):
        W = jax.vmap(cho_solve_small)(L, jnp.swapaxes(lcp.J, -1, -2))
        A = jnp.einsum("bij,bjk->bik", lcp.J, W) + model.contact_cfm * jnp.eye(
            lcp.J.shape[-1] * 0 + lcp.b.shape[-1], dtype=states.q.dtype
        )
        if jax.default_backend() == "tpu":
            lam = jacobi_sweeps_pallas(
                A, lcp.b, lcp.lo, lcp.hi, lcp.mu, static_fidx(model), model.contact_iters
            )
        else:
            from diffdart_tpu.ops.lcp import _jacobi

            lam = jax.vmap(
                lambda A_, b_, lo_, hi_, mu_, f_: _jacobi(A_, b_, lo_, hi_, mu_, f_, model.contact_iters)
            )(A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx)
    return jax.vmap(lambda s, l, L_, Mi, vs, lm: _post(model, s, l, L_, Mi, vs, lm))(
        states, lcp, L, Minv, v_star, lam
    )
