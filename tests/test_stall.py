"""Solver-stall surfacing during trajectory optimization (r3 VERDICT next #8).

The reference surfaces LCP non-convergence through dSolveLCP's return status
(dart/external/odelcpsolver/lcp.cpp anchor: dSolveLCP); the rebuild's
equivalent is trajectory/stall.py: the natural-map residual checked along the
optimized trajectory, warning loudly instead of letting an optimization
silently freeze (the plain-f32 jump-worm failure mode)."""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdart_tpu.dynamics.model import make_state
from diffdart_tpu.math.lie import quat_exp, quat_mul
from diffdart_tpu.models import cube_drop
from diffdart_tpu.trajectory.stall import (
    SolverStallWarning,
    check_trajectory_stall,
    rollout_solver_residuals,
    stall_threshold,
)


def _cube_population_xs(model, n=12, seed=0):
    """Near-coplanar cube states (the rank-deficient population of
    tests/test_lcp.py::TestPivotRefine) packed as an ilqr-layout trajectory
    xs=(n+1, nq+nv), us=(n, nv)."""
    q0 = np.array(model.neutral_q(), float)
    rng = np.random.default_rng(seed)
    xs = []
    for k in range(n + 1):
        q = q0.copy()
        dq = np.asarray(quat_exp(jnp.asarray(rng.normal(size=3) * 0.04)))
        q[:4] = np.asarray(quat_mul(jnp.asarray(q[:4]), jnp.asarray(dq)))
        q[6] = 0.094 + 0.01 * rng.random()
        v = rng.normal(size=model.nv) * (2.0 if k % 2 else 0.3)
        xs.append(np.concatenate([q, v]))
    xs = jnp.asarray(np.stack(xs))
    us = jnp.zeros((n, model.nv), xs.dtype)
    return xs, us


class TestStallCheck:
    def test_stalled_solver_warns(self):
        """With the pivot refinement disabled, the rank-deficient cube
        population leaves genuine stalls (residual >> 1e-3); the check must
        fire SolverStallWarning."""
        m = cube_drop(dt=2e-3, friction=0.8).replace(lcp_pivot_iters=0)
        xs, us = _cube_population_xs(m)
        res = rollout_solver_residuals(m, xs, us)
        assert float(jnp.max(res)) > stall_threshold(m, xs.dtype), (
            "population no longer stalls at pivot_iters=0 — pick new states"
        )
        with pytest.warns(SolverStallWarning, match="lcp_pivot_iters"):
            check_trajectory_stall(m, xs, us)

    def test_healthy_solver_is_silent(self):
        """Same states with the default pivot refinement: residuals sit at
        the f64 floor, no warning."""
        m = cube_drop(dt=2e-3, friction=0.8)
        xs, us = _cube_population_xs(m)
        with warnings.catch_warnings():
            warnings.simplefilter("error", SolverStallWarning)
            mx = check_trajectory_stall(m, xs, us)
        assert float(mx) < stall_threshold(m, xs.dtype)

    def test_check_works_under_jit(self):
        """The warning path must survive jit (debug.callback fires at run
        time) — optimizers call this from inside jitted loops."""
        m = cube_drop(dt=2e-3, friction=0.8).replace(lcp_pivot_iters=0)
        xs, us = _cube_population_xs(m, n=4)

        @jax.jit
        def run(xs, us):
            return check_trajectory_stall(m, xs, us)

        with pytest.warns(SolverStallWarning):
            run(xs, us).block_until_ready()


class TestOptimizerWiring:
    def test_ilqr_diagnose_model(self):
        """ilqr(diagnose_model=...) runs the check on the optimized
        trajectory: healthy config stays silent, pivot-disabled config
        warns when the trajectory passes through a rank-deficient state.

        The start state is picked FROM the stall population (a straight
        symmetric drop solves fine even without the pivot refinement, so the
        x0 must provably stall at pivot_iters=0 — asserted below before the
        optimizer runs)."""
        from diffdart_tpu.trajectory.ilqr import ilqr, make_dynamics

        m = cube_drop(dt=2e-3, friction=0.8)
        m0 = m.replace(lcp_pivot_iters=0)
        xs_pop, us_pop = _cube_population_xs(m0)
        res_pop = np.asarray(rollout_solver_residuals(m0, xs_pop, us_pop))
        thr = stall_threshold(m0, xs_pop.dtype)
        stalled = np.nonzero(res_pop > thr)[0]
        assert stalled.size, "population no longer stalls — pick new states"
        x0 = xs_pop[int(stalled[0])]
        us = jnp.zeros((3, m.nv), x0.dtype)

        def rc(x, u, t):
            return 1e-3 * jnp.sum(u**2)

        def tc(x):
            return jnp.sum(x[4:7] ** 2)

        with warnings.catch_warnings():
            warnings.simplefilter("error", SolverStallWarning)
            res = ilqr(make_dynamics(m), rc, tc, x0, us, iters=2,
                       diagnose_model=m)
        assert jnp.all(jnp.isfinite(res.us))

        # the stalled x0 is step 0 of every candidate trajectory, so the
        # diagnostics must flag it regardless of where the optimizer moves
        with pytest.warns(SolverStallWarning):
            ilqr(make_dynamics(m0), rc, tc, x0, us, iters=2, diagnose_model=m0)
