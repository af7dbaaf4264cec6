"""Trajectory optimization converges on toy tasks; gradients of rollout losses
are exercised by the optimizers themselves — analogue of the reference's
unittests/comprehensive/test_Trajectory.cpp (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdart_tpu.models import cartpole, pendulum
from diffdart_tpu.trajectory import MultipleShooting, ilqr, single_shooting
from diffdart_tpu.trajectory.ilqr import make_dynamics


def pendulum_problem(T=60, dt=0.02):
    m = pendulum(dt=dt, damping=0.05)
    f = make_dynamics(m)
    # state x = (q, v); swing from hanging (-pi/2) to upright (+pi/2)
    x0 = jnp.array([-jnp.pi / 2, 0.0])
    target = jnp.array([jnp.pi / 2, 0.0])

    def rc(x, u, t):
        return 0.001 * jnp.sum(u**2) + 0.05 * jnp.sum((x - target) ** 2)

    def tc(x):
        return 200.0 * jnp.sum((x - target) ** 2)

    return m, f, rc, tc, x0, target, T


class TestILQR:
    def test_pendulum_swingup(self):
        m, f, rc, tc, x0, target, T = pendulum_problem()
        us0 = jnp.zeros((T, 1))
        res = jax.jit(lambda u: ilqr(f, rc, tc, x0, u, iters=60))(us0)
        assert float(res.cost) < float(res.cost_trace[0])
        np.testing.assert_allclose(np.asarray(res.xs[-1]), np.asarray(target), atol=0.15)

    def test_cartpole_balance(self):
        m = cartpole(dt=0.02)
        f = make_dynamics(m)
        x0 = jnp.array([0.0, 0.4, 0.0, 0.0])  # pole tilted 0.4 rad
        target = jnp.zeros(4)

        def rc(x, u, t):
            return 0.001 * u[0] ** 2 + 1.0 * x[1] ** 2 + 0.1 * x[0] ** 2 + 0.01 * (x[2] ** 2 + x[3] ** 2)

        def tc(x):
            return 500.0 * jnp.sum(x**2)

        def cmap(u):
            return jnp.array([u[0], 0.0])  # only the cart is actuated

        f = make_dynamics(m, control_map=cmap)
        res = jax.jit(lambda u: ilqr(f, rc, tc, x0, u, iters=100))(jnp.zeros((100, 1)))
        np.testing.assert_allclose(np.asarray(res.xs[-1]), 0.0, atol=0.05)


class TestShooting:
    def test_single_shooting_pendulum(self):
        m, f, rc, tc, x0, target, T = pendulum_problem()
        res = single_shooting(f, rc, tc, x0, jnp.zeros((T, 1)), iters=300)
        assert float(res.cost) < float(res.cost_trace[0])
        np.testing.assert_allclose(np.asarray(res.xs[-1]), np.asarray(target), atol=0.3)

    def test_multiple_shooting_pendulum(self):
        m, f, rc, tc, x0, target, T = pendulum_problem(T=60)
        ms = MultipleShooting(f, rc, tc, T=T, segment_len=15, nx=2, nu=1)
        res = ms.solve(x0, jnp.zeros((T, 1)), outer_iters=6, inner_iters=150)
        # defects must close and the real (defect-free) rollout must solve the task
        assert float(res.defect_norm) < 1e-2
        np.testing.assert_allclose(np.asarray(res.xs[-1]), np.asarray(target), atol=0.3)
