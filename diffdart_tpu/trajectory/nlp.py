"""Host NLP driver for multiple-shooting trajectory problems.

Capability parity with trajectory::IPOptOptimizer (dart/trajectory/
IPOptOptimizer.cpp — SURVEY.md §2.3): the trajectory problem solved as a
host-side nonlinear program with HARD per-variable bounds and EXACT defect
equality constraints, instead of the on-device augmented-Lagrangian loop
(MultipleShooting.solve) that only drives defects to zero asymptotically.

Redesign: IPOPT itself is replaced by scipy's SLSQP (same problem class —
dense-Jacobian SQP; the reference links a vendored Ipopt). The device does
everything heavy: objective value+gradient and the defect Jacobian are one
jitted JAX program each, evaluated on accelerator and shipped to the host
as float64. The defect Jacobian is block-bidiagonal (d defect_k / d knot_j
is nonzero only for j in {k-1, k} and the k-th control segment), and is
computed SEGMENT-WISE: a vmapped jacrev of each segment-end state wrt its
own (start state, control slice) — K·nx reverse passes over S-step
rollouts, a factor-K saving over jacrev of the full T-step flattening
(this is exactly the sparsity IPOptShotWrapper::eval_jac_g exploits in the
reference). The blocks are scattered into the dense matrix SLSQP consumes
on the host; a sparse-IPOPT backend could slot in behind the same
callbacks.

Decision vector z = [ us.ravel() | knots.ravel() ] with knots the interior
segment-start states, exactly the reference's MultiShot flattening
(Problem::getFlatDimension)."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from diffdart_tpu.trajectory.shooting import MultipleShooting, ShootingResult, _rollout


class NLPInfo(NamedTuple):
    status: int
    message: str
    n_iter: int
    constraint_violation: float


def _defect_jacobian_fns(ms: MultipleShooting, x0, dtype):
    """(con_val, con_jac) for the defect equality constraints.

    con_val: jitted device function z -> raveled defects ((K-1)*nx,).
    con_jac: host function z -> dense float64 Jacobian, assembled from
    segment-wise device blocks. defect_k = end_k - knot_k with
    end_k = segment_rollout(start_k, u_k), start_0 = x0 (constant),
    start_k = knot_{k-1}; only segments 0..K-2 feed defects, so the
    Jacobian is block-bidiagonal: d defect_k/d u_seg_k, d defect_k/
    d knot_{k-1}, and -I wrt knot_k. K·nx reverse passes over S-step
    rollouts instead of (K-1)·nx passes over the full T-step program."""
    T, K, S, nx, nu = ms.T, ms.K, ms.S, ms.nx, ms.nu
    n_u = T * nu
    n_k = (K - 1) * nx

    def unpack(z):
        return z[n_u:].reshape(K - 1, nx), z[:n_u].reshape(T, nu)

    @jax.jit
    def con_val(z):
        knots, us = unpack(z)
        _, defects, _ = ms._eval(knots, us, x0)
        return defects.ravel()

    @jax.jit
    def seg_jac_blocks(z):
        knots, us = unpack(z)
        starts = jnp.concatenate([x0[None], knots], axis=0)  # (K, nx)
        us_seg = us.reshape(K, S, nu)
        t0s = jnp.arange(K) * S

        def end_of(start, u_seg, t0):
            xT, _, _ = ms._segment_rollout(start, u_seg, t0)
            return xT

        def one(start, u_seg, t0):
            return jax.jacrev(end_of, argnums=(0, 1))(start, u_seg, t0)

        jx, ju = jax.vmap(one)(starts[: K - 1], us_seg[: K - 1], t0s[: K - 1])
        return jx, ju.reshape(K - 1, nx, S * nu)

    def con_jac(z):
        jx, ju = seg_jac_blocks(jnp.asarray(z, dtype))
        jx = np.asarray(jx, np.float64)
        ju = np.asarray(ju, np.float64)
        J = np.zeros(((K - 1) * nx, n_u + n_k))
        eye = np.eye(nx)
        for k in range(K - 1):
            r = slice(k * nx, (k + 1) * nx)
            J[r, k * S * nu : (k + 1) * S * nu] = ju[k]
            if k >= 1:  # jx[0] differentiates wrt the constant x0: unused
                J[r, n_u + (k - 1) * nx : n_u + k * nx] = jx[k]
            J[r, n_u + k * nx : n_u + (k + 1) * nx] = -eye
        return J

    return con_val, con_jac


def solve_slsqp(
    ms: MultipleShooting,
    x0,
    us_init,
    u_lo=None,
    u_hi=None,
    x_lo=None,
    x_hi=None,
    max_iter: int = 100,
    tol: float = 1e-8,
    intermediate_callback=None,
    diagnose_model=None,
    diagnose_control_map=None,
):
    """Solve the multiple-shooting problem as a host NLP.

    u_lo/u_hi: scalar or (nu,) hard control bounds (applied to every step);
    x_lo/x_hi: scalar or (nx,) hard bounds on the knot states. None = free.
    intermediate_callback(iteration, xs, us, cost): called once per major
    SQP iteration with the current single-shooting rollout
    (Problem::registerIntermediateCallback parity).
    diagnose_model: the physics Model behind ms.f — when given, the contact
    solver's health is checked along the solution trajectory and a
    SolverStallWarning fires if the LCP stalled anywhere
    (trajectory/stall.py).

    Returns (ShootingResult, NLPInfo). Defects at the solution satisfy the
    SQP equality tolerance (reported in NLPInfo.constraint_violation) —
    hard constraints, not a penalty residual.
    """
    from scipy.optimize import minimize

    T, K, S, nx, nu = ms.T, ms.K, ms.S, ms.nx, ms.nu
    n_u = T * nu
    n_k = (K - 1) * nx
    dtype = x0.dtype

    def unpack(z):
        us = z[:n_u].reshape(T, nu)
        knots = z[n_u:].reshape(K - 1, nx)
        return knots, us

    @jax.jit
    def obj_vg(z):
        def obj(z_):
            knots, us = unpack(z_)
            total, _, _ = ms._eval(knots, us, x0)
            return total

        return jax.value_and_grad(obj)(z)

    con_val, con_jac = _defect_jacobian_fns(ms, x0, dtype)

    # initial knots from the us_init rollout (feasible defects at z0)
    xs_init, _ = _rollout(ms.f, x0, jnp.asarray(us_init, dtype), ms.rc, ms.tc)
    knots0 = xs_init[S::S][: K - 1]
    z0 = np.concatenate([
        np.asarray(us_init, np.float64).ravel(),
        np.asarray(knots0, np.float64).ravel(),
    ])

    def _tile_bound(b, n_per, count, default):
        if b is None:
            return np.full(n_per * count, default)
        arr = np.broadcast_to(np.asarray(b, np.float64), (n_per,))
        return np.tile(arr, count)

    lo = np.concatenate([
        _tile_bound(u_lo, nu, T, -np.inf),
        _tile_bound(x_lo, nx, K - 1, -np.inf),
    ])
    hi = np.concatenate([
        _tile_bound(u_hi, nu, T, np.inf),
        _tile_bound(x_hi, nx, K - 1, np.inf),
    ])

    def f_and_g(z):
        v, g = obj_vg(jnp.asarray(z, dtype))
        return float(v), np.asarray(g, np.float64)

    it_count = [0]

    def cb(z):
        it_count[0] += 1
        if intermediate_callback is not None:
            us = jnp.asarray(z[:n_u].reshape(T, nu), dtype)
            xs_it, cost_it = _rollout(ms.f, x0, us, ms.rc, ms.tc)
            intermediate_callback(it_count[0], xs_it, us, cost_it)

    constraints = []
    if n_k:
        constraints.append(
            dict(
                type="eq",
                fun=lambda z: np.asarray(con_val(jnp.asarray(z, dtype)), np.float64),
                jac=con_jac,
            )
        )

    res = minimize(
        f_and_g,
        z0,
        jac=True,
        bounds=list(zip(lo, hi)),
        constraints=constraints,
        method="SLSQP",
        tol=tol,
        callback=cb,
        options=dict(maxiter=max_iter),
    )

    us = jnp.asarray(res.x[:n_u].reshape(T, nu), dtype)
    xs, cost = _rollout(ms.f, x0, us, ms.rc, ms.tc)
    if diagnose_model is not None:
        from diffdart_tpu.trajectory.stall import check_trajectory_stall

        check_trajectory_stall(
            diagnose_model, xs, us, diagnose_control_map, context="SLSQP NLP"
        )
    viol = float(np.abs(np.asarray(con_val(jnp.asarray(res.x, dtype)))).max()) if n_k else 0.0
    result = ShootingResult(
        us=us,
        xs=xs,
        cost=cost,
        cost_trace=jnp.asarray([res.fun], dtype),
        defect_norm=jnp.asarray(viol, dtype),
    )
    info = NLPInfo(
        status=int(res.status),
        message=str(res.message),
        n_iter=int(res.nit),
        constraint_violation=viol,
    )
    return result, info
