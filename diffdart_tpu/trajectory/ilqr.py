"""iLQR over the differentiable step, fully on-device.

Capability parity with the reference's trajectory optimization + nimble-era
iLQRLocal (dart/trajectory/, dart/realtime/ — SURVEY.md §2.3), redesigned per
the north star: the entire solve (rollout, linearization via AD, Riccati
backward sweep, line-searched forward sweep, iteration loop) is ONE jitted
program built from lax.scan — no per-step host round-trips, no IPOPT.

State is the flattened (q, v) vector (models with quaternion dofs work too:
linearization treats q ambiently, which is exact for the scalar-joint models
this solver targets; use tangent-space shooting for free-floating bases).
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
) -> ILQRResult:
    """Iterative LQR. f(x, u) -> x'; running_cost(x, u, t) -> scalar;
    terminal_cost(x) -> scalar. Everything jit-compatible; call under jit.

    diagnose_model: pass the physics Model behind `f` to check the contact
    solver's health along the optimized trajectory — a SolverStallWarning
    fires (at run time, jit-safe) if the LCP stalled anywhere, instead of
    the optimization silently freezing (trajectory/stall.py).
    diagnose_control_map: the same control lift given to make_dynamics."""
    T, nu = us_init.shape
    nx = x0.shape[0]
    dtype = x0.dtype
    alphas = jnp.asarray(alphas, dtype)

    def rollout_cost(us):
        def body(x, tu):
            t, u = tu
            c = running_cost(x, u, t)
            return f(x, u), (x, c)

        xT, (xs, cs) = jax.lax.scan(body, x0, (jnp.arange(T), us))
        xs = jnp.concatenate([xs, xT[None]], axis=0)
        return xs, jnp.sum(cs) + terminal_cost(xT)

    fx_fn = jax.jacobian(f, argnums=0)
    fu_fn = jax.jacobian(f, argnums=1)
    lx_fn = jax.grad(running_cost, argnums=0)
    lu_fn = jax.grad(running_cost, argnums=1)
    lxx_fn = jax.hessian(running_cost, argnums=0)
    luu_fn = jax.hessian(running_cost, argnums=1)
    lux_fn = jax.jacobian(jax.grad(running_cost, argnums=1), argnums=0)
    vx_fn = jax.grad(terminal_cost)
    vxx_fn = jax.hessian(terminal_cost)

    def backward(xs, us, reg):
        fx = jax.vmap(fx_fn)(xs[:-1], us)
        fu = jax.vmap(fu_fn)(xs[:-1], us)
        ts = jnp.arange(T)
        lx = jax.vmap(lx_fn)(xs[:-1], us, ts)
        lu = jax.vmap(lu_fn)(xs[:-1], us, ts)
        lxx = jax.vmap(lxx_fn)(xs[:-1], us, ts)
        luu = jax.vmap(luu_fn)(xs[:-1], us, ts)
        lux = jax.vmap(lux_fn)(xs[:-1], us, ts)

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

        init = (vx_fn(xs[-1]), vxx_fn(xs[-1]), jnp.array(True))
        (Vx, Vxx, ok), (ks, Ks) = jax.lax.scan(
            bstep, init, (fx, fu, lx, lu, lxx, luu, lux), reverse=True
        )
        return ks, Ks, ok

    def forward(xs, us, ks, Ks, alpha):
        def body(x, inp):
            x_ref, u_ref, k, K, t = inp
            u = u_ref + alpha * k + K @ (x - x_ref)
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
