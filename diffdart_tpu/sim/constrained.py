"""Constrained timestep: collision -> LCP -> impulse -> integrate.

The full World::step pipeline of the reference (SURVEY.md §3.1) as one pure
differentiable function: gradients flow through dynamics and contact geometry
by plain AD and through the LCP solve by the IFT custom_vjp in ops/lcp.py —
replacing the reference's BackpropSnapshot/ConstrainedGroupGradientMatrices
recorded-impulse machinery (SURVEY.md §2.2) entirely.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from diffdart_tpu.constraints.assembly import assemble_constraints
from diffdart_tpu.dynamics import dynamics as D
from diffdart_tpu.dynamics.model import Model, State
from diffdart_tpu.ops.lcp import boxed_lcp


def prepare_constrained(model: Model, state: State, tau=None):
    """Everything before the LCP solve: (lcp, M, Minv, v_star, dt). Factored
    out so oracle tests can drive the IDENTICAL pipeline with an external
    per-step solver (tests/test_oracle_trajectory.py)."""
    q, v = state.q, state.v
    dtype = q.dtype
    if tau is None:
        tau = jnp.zeros(model.nv, dtype)
    dt = model.dt.astype(dtype)

    from diffdart_tpu.ops.smalllinalg import cholesky_small, cho_solve_small

    cache = D.kinematics_cache(model, q, v)
    M_plain = D.mass_matrix(model, q, cache)
    C = D.bias_forces(model, q, v, cache)
    # implicit joint spring/damping: augment the mass matrix (DART parity)
    extra_diag, f_joint = D.implicit_joint_terms(model, q, v, dt)
    M = M_plain + jnp.diag(extra_diag)
    L = cholesky_small(M)
    Minv = cho_solve_small(L, jnp.eye(model.nv, dtype=dtype))

    # unconstrained end-of-step velocity
    v_star = v + dt * (Minv @ (tau + f_joint - C))

    from diffdart_tpu.collision.collide import collide_world_with_bodies, select_contacts

    contacts, ba, bb = collide_world_with_bodies(model, cache["R"], cache["p"])
    contacts, body_a, body_b = select_contacts(model, contacts, ba, bb)
    qt = D.q_tangent(model, q)
    lcp = assemble_constraints(
        model, contacts, cache["Sw"], cache["mask"], Minv, v_star, v, qt, dt,
        R_body=cache["R"], p_body=cache["p"], body_a=body_a, body_b=body_b,
    )
    return lcp, M, Minv, v_star, dt


def solve_contact_lcp(model: Model, lcp, M):
    """The configured LCP solve on an assembled problem (shared by
    step_constrained and solver_diagnostics)."""
    dtype = lcp.b.dtype
    if model.lcp_dtype == "f64" and dtype != jnp.float64:
        # f64 precision island (see Model.lcp_dtype): promote the solve and
        # its IFT gradient, demote the impulses. The casts are linear, so AD
        # composes; everything inside is hand-rolled small linalg that
        # compiles on TPU's f64 emulation.
        if not jax.config.jax_enable_x64:
            raise ValueError(
                "Model.lcp_dtype='f64' requires jax_enable_x64 "
                "(jax.config.update('jax_enable_x64', True))"
            )
        f64 = jnp.float64
        lcp64 = lcp._replace(
            J=lcp.J.astype(f64), A=lcp.A.astype(f64), b=lcp.b.astype(f64),
            lo=lcp.lo.astype(f64), hi=lcp.hi.astype(f64), mu=lcp.mu.astype(f64),
        )
        lam = solve_contact_lcp(
            model.replace(lcp_dtype="state"), lcp64, M.astype(f64)
        )
        return lam.astype(dtype)
    if model.contact_solver in ("lowrank", "lowrank_pallas"):
        from diffdart_tpu.constraints.assembly import static_fidx
        from diffdart_tpu.ops.lcp_lowrank import boxed_lcp_lowrank

        # 'lowrank_pallas': fused-VMEM Pallas sweeps. Measured SLOWER than
        # the XLA path under per-env vmap (grid overhead dominates the
        # tiny per-env blocks: 10.5ms vs 6.6ms at B=4096, D=42), so the
        # default stays XLA; the kernel is kept for the batched-block
        # execution path and as the template for future fusion work.
        use_pallas = model.contact_solver == "lowrank_pallas" and jax.default_backend() == "tpu"
        fidx_pallas = static_fidx(model) if use_pallas else None
        return boxed_lcp_lowrank(
            lcp.J, M, jnp.asarray(model.contact_cfm, dtype), lcp.b,
            lcp.lo, lcp.hi, lcp.mu, lcp.fidx,
            model.contact_iters, 2 if model.lcp_polish else 0, fidx_pallas,
            model.lcp_pivot_iters,
        )
    return boxed_lcp(
        lcp.A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx,
        model.contact_iters, model.contact_solver, model.lcp_polish,
    )


def solver_diagnostics(model: Model, state: State, tau=None):
    """Per-state contact-solver health: the natural-map residual of the LCP
    solution at this state (vmap for per-env values).

    Interpretation: <= ~1e-6 (f64) means a pivot-accurate solve; values far
    above the precision floor mean the solver stalled on this state — the
    impulses AND the IFT gradient's active-set classification are unreliable
    there. The floor itself is dtype-bound: the Woodbury active-set solve
    amplifies rounding by ~eps/cfm, so plain f32 at the default cfm=1e-6
    bottoms out near ~4e-2 EVEN WHEN THE ACTIVE SET IS CORRECT (measured on
    TPU: capsule-flat state reads 3.9e-2 in f32, 4.3e-5 with
    lcp_dtype='f64', 3.2e-4 at cfm=1e-4 — scaling exactly as eps/cfm).
    For a stall-vs-precision diagnosis in f32, query with
    model.replace(lcp_dtype='f64').

    The reference surfaces the analogous condition through dSolveLCP's
    return status (dart/external/odelcpsolver/lcp.cpp); here it is an
    explicit queryable (and loggable) quantity instead of a silent
    zero-subgradient fallback."""
    from diffdart_tpu.ops.lcp import _nat_residual

    lcp, M, Minv, v_star, dt = prepare_constrained(model, state, tau)
    if lcp.A.shape[0] == 0:
        return jnp.zeros((), state.q.dtype)
    lam = solve_contact_lcp(model, lcp, M)
    return _nat_residual(lam, lcp.A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx)


def step_constrained(model: Model, state: State, tau=None) -> State:
    q, v = state.q, state.v
    dtype = q.dtype
    lcp, M, Minv, v_star, dt = prepare_constrained(model, state, tau)
    if lcp.A.shape[0] == 0:
        v_new = v_star
    else:
        lam = solve_contact_lcp(model, lcp, M)
        # named for remat policies: rollout_checkpointed saves lambda so the
        # backward pass never re-runs the LCP sweeps/polish
        from jax.ad_checkpoint import checkpoint_name

        lam = checkpoint_name(lam, "lcp_lam")
        v_new = v_star + Minv @ (lcp.J.T @ lam)

    q_new = D.integrate_positions(model, q, v_new, dt)
    t = state.t + dt if state.t is not None else None
    return State(q=q_new, v=v_new, t=t)
