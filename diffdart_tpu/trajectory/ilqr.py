"""iLQR over the differentiable step, fully on-device.

Capability parity with the reference's trajectory optimization + nimble-era
iLQRLocal (dart/trajectory/, dart/realtime/ — SURVEY.md §2.3), redesigned per
the north star: the entire solve (rollout, linearization via AD, Riccati
backward sweep, line-searched forward sweep, iteration loop) is ONE jitted
program built from lax.scan — no per-step host round-trips, no IPOPT.

State is the flattened (q, v) vector. For scalar-joint models the default
Euclidean charts make this classical iLQR. For models with quaternion dofs
(FREE/BALL joints) pass `tangent_ops(model)` — linearization, the Riccati
sweep, and the feedback law then run in the 2·nv-dimensional tangent space
(retraction = Skeleton::integratePositions, local difference =
Skeleton::getPositionDifferences), which is the sound on-manifold iLQR for
free-floating bases (r3 VERDICT missing #8: ambient-q linearization is
rank-deficient along the quaternion-norm direction).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from diffdart_tpu.dynamics.model import Model, State
from diffdart_tpu.sim import step


class ILQRResult(NamedTuple):
    us: jnp.ndarray  # (T, nu) optimized controls
    xs: jnp.ndarray  # (T+1, nx) optimized state trajectory
    cost: jnp.ndarray  # () final cost
    cost_trace: jnp.ndarray  # (iters,) cost per iteration


def _pack(state: State):
    return jnp.concatenate([state.q, state.v])


def _unpack(model: Model, x):
    return State(q=x[: model.nq], v=x[model.nq :], t=jnp.zeros((), x.dtype))


def tangent_ops(model: Model):
    """(retract, local_diff, tangent_dim) charts for iLQR on a model whose
    configuration lives on a manifold (quaternion FREE/BALL joints).

    retract(x, e): x ⊞ e with e = (dq ∈ R^nv, dv ∈ R^nv) — geometric
    position integration (Skeleton::integratePositions parity).
    local_diff(a, b): b ⊟ a — tangent-space difference
    (Skeleton::getPositionDifferences parity). For scalar-joint models both
    reduce exactly to +/- and iLQR behaves classically."""
    from diffdart_tpu.dynamics import integrate_positions, position_difference

    nq, nv = model.nq, model.nv

    def retract(x, e):
        q = integrate_positions(model, x[:nq], e[:nv], 1.0)
        return jnp.concatenate([q, x[nq:] + e[nv:]])

    def local_diff(a, b):
        dq = position_difference(model, a[:nq], b[:nq])
        return jnp.concatenate([dq, b[nq:] - a[nq:]])

    return retract, local_diff, 2 * nv


def make_dynamics(model: Model, control_map=None) -> Callable:
    """x_{t+1} = f(x_t, u_t) on flattened state. control_map lifts the control
    vector to full (nv,) generalized force (e.g. actuated-dof selector)."""

    def f(x, u):
        tau = u if control_map is None else control_map(u)
        s = step(model, _unpack(model, x), tau)
        return jnp.concatenate([s.q, s.v])

    return f


def ilqr(
    f: Callable,
    running_cost: Callable,
    terminal_cost: Callable,
    x0: jnp.ndarray,
    us_init: jnp.ndarray,
    iters: int = 50,
    reg_init: float = 1e-6,
    alphas=(1.0, 0.6, 0.3, 0.1, 0.03, 0.01),
    diagnose_model: Model | None = None,
    diagnose_control_map: Callable | None = None,
    charts=None,
) -> ILQRResult:
    """Iterative LQR. f(x, u) -> x'; running_cost(x, u, t) -> scalar;
    terminal_cost(x) -> scalar. Everything jit-compatible; call under jit.

    charts: optional (retract, local_diff, tangent_dim) triple — pass
    `tangent_ops(model)` for models with quaternion dofs so linearization,
    Riccati, and feedback run on the state manifold's tangent space. None =
    Euclidean (classical iLQR; exact for scalar-joint models).
    diagnose_model: pass the physics Model behind `f` to check the contact
    solver's health along the optimized trajectory — a SolverStallWarning
    fires (at run time, jit-safe) if the LCP stalled anywhere, instead of
    the optimization silently freezing (trajectory/stall.py).
    diagnose_control_map: the same control lift given to make_dynamics."""
    T, nu = us_init.shape
    nx = x0.shape[0]
    dtype = x0.dtype
    alphas = jnp.asarray(alphas, dtype)
    if charts is None:
        retract = lambda x, e: x + e  # noqa: E731
        local_diff = lambda a, b: b - a  # noqa: E731
        nt = nx
    else:
        retract, local_diff, nt = charts
    e0 = jnp.zeros(nt, dtype)

    def rollout_cost(us):
        def body(x, tu):
            t, u = tu
            c = running_cost(x, u, t)
            return f(x, u), (x, c)

        xT, (xs, cs) = jax.lax.scan(body, x0, (jnp.arange(T), us))
        xs = jnp.concatenate([xs, xT[None]], axis=0)
        return xs, jnp.sum(cs) + terminal_cost(xT)

    zu = jnp.zeros(nu, dtype)

    # all derivatives are taken in the tangent chart at the nominal point:
    # e |-> local_diff(x̄', f(x̄ ⊞ e, ū + du)) for dynamics, e |-> cost(x̄ ⊞ e)
    # for costs. With Euclidean charts these reduce to the classical ambient
    # Jacobians/Hessians (retract/local_diff differentiate to identity).
    def _dyn_jacs(x_bar, u_bar, x_next_bar):
        def g(e, du):
            return local_diff(x_next_bar, f(retract(x_bar, e), u_bar + du))

        return jax.jacobian(g, argnums=(0, 1))(e0, zu)

    def _run_derivs(x_bar, u_bar, t):
        def c(e, du):
            return running_cost(retract(x_bar, e), u_bar + du, t)

        lx = jax.grad(c, argnums=0)(e0, zu)
        lu = jax.grad(c, argnums=1)(e0, zu)
        lxx = jax.hessian(c, argnums=0)(e0, zu)
        luu = jax.hessian(c, argnums=1)(e0, zu)
        lux = jax.jacobian(jax.grad(c, argnums=1), argnums=0)(e0, zu)
        return lx, lu, lxx, luu, lux

    def _term_derivs(x_bar):
        def c(e):
            return terminal_cost(retract(x_bar, e))

        return jax.grad(c)(e0), jax.hessian(c)(e0)

    def backward(xs, us, reg):
        fx, fu = jax.vmap(_dyn_jacs)(xs[:-1], us, xs[1:])
        ts = jnp.arange(T)
        lx, lu, lxx, luu, lux = jax.vmap(_run_derivs)(xs[:-1], us, ts)

        def bstep(carry, inp):
            Vx, Vxx, ok = carry
            fx_t, fu_t, lx_t, lu_t, lxx_t, luu_t, lux_t = inp
            Qx = lx_t + fx_t.T @ Vx
            Qu = lu_t + fu_t.T @ Vx
            Qxx = lxx_t + fx_t.T @ Vxx @ fx_t
            Quu = luu_t + fu_t.T @ Vxx @ fu_t + reg * jnp.eye(nu, dtype=dtype)
            Qux = lux_t + fu_t.T @ Vxx @ fx_t
            L = jnp.linalg.cholesky(Quu)
            good = jnp.all(jnp.isfinite(L))
            k = -jax.scipy.linalg.cho_solve((L, True), Qu)
            K = -jax.scipy.linalg.cho_solve((L, True), Qux)
            Vx_n = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            Vxx_n = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
            return (Vx_n, Vxx_n, ok & good), (k, K)

        vx_T, vxx_T = _term_derivs(xs[-1])
        init = (vx_T, vxx_T, jnp.array(True))
        (Vx, Vxx, ok), (ks, Ks) = jax.lax.scan(
            bstep, init, (fx, fu, lx, lu, lxx, luu, lux), reverse=True
        )
        return ks, Ks, ok

    def forward(xs, us, ks, Ks, alpha):
        def body(x, inp):
            x_ref, u_ref, k, K, t = inp
            u = u_ref + alpha * k + K @ local_diff(x_ref, x)
            c = running_cost(x, u, t)
            return f(x, u), (x, u, c)

        xT, (xs_n, us_n, cs) = jax.lax.scan(
            body, x0, (xs[:-1], us, ks, Ks, jnp.arange(T))
        )
        xs_n = jnp.concatenate([xs_n, xT[None]], axis=0)
        return xs_n, us_n, jnp.sum(cs) + terminal_cost(xT)

    def iteration(carry, _):
        xs, us, cost, reg = carry
        ks, Ks, ok = backward(xs, us, reg)

        def try_alpha(a):
            return forward(xs, us, ks, Ks, a)

        xs_c, us_c, costs_c = jax.vmap(try_alpha)(alphas)
        best = jnp.argmin(jnp.where(jnp.isfinite(costs_c), costs_c, jnp.inf))
        improved = ok & (costs_c[best] < cost)
        xs_n = jnp.where(improved, xs_c[best], xs)
        us_n = jnp.where(improved, us_c[best], us)
        cost_n = jnp.where(improved, costs_c[best], cost)
        reg_n = jnp.where(improved, jnp.maximum(reg * 0.5, 1e-9), jnp.minimum(reg * 10.0, 1e6))
        return (xs_n, us_n, cost_n, reg_n), cost_n

    xs0, cost0 = rollout_cost(us_init)
    (xs, us, cost, _), trace = jax.lax.scan(
        iteration, (xs0, us_init, cost0, jnp.asarray(reg_init, dtype)), None, length=iters
    )
    if diagnose_model is not None:
        from diffdart_tpu.trajectory.stall import check_trajectory_stall

        check_trajectory_stall(
            diagnose_model, xs, us, diagnose_control_map, context="ilqr"
        )
    return ILQRResult(us=us, xs=xs, cost=cost, cost_trace=trace)
