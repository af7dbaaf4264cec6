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


class TestTangentILQR:
    """On-manifold iLQR via tangent_ops (r3 VERDICT missing #8: ambient-q
    linearization is unsound on quaternion coordinates)."""

    def test_euclidean_charts_are_identity_on_scalar_joints(self):
        """For scalar-joint models the tangent charts reduce exactly to +/-:
        the chart-lifted solver must reproduce the classical one."""
        from diffdart_tpu.trajectory import tangent_ops

        m, f, rc, tc, x0, target, T = pendulum_problem()
        us0 = jnp.zeros((T, 1))
        res_e = jax.jit(lambda u: ilqr(f, rc, tc, x0, u, iters=20))(us0)
        res_t = jax.jit(
            lambda u: ilqr(f, rc, tc, x0, u, iters=20, charts=tangent_ops(m))
        )(us0)
        np.testing.assert_allclose(
            np.asarray(res_t.cost_trace), np.asarray(res_e.cost_trace),
            rtol=1e-8,
        )
        np.testing.assert_allclose(
            np.asarray(res_t.us), np.asarray(res_e.us), atol=1e-7
        )

    def test_free_floating_attitude_reorientation(self):
        """A gravity-free FREE-joint rigid body driven by body torques must
        reorient 90° about x. State is (7+6)-dim with a unit quaternion; the
        tangent charts make the Riccati sweep run in R^12."""
        from diffdart_tpu.dynamics.model import JointType, ModelBuilder
        from diffdart_tpu.trajectory import tangent_ops
        from diffdart_tpu.trajectory.ilqr import make_dynamics

        b = ModelBuilder(gravity=(0.0, 0.0, 0.0), dt=0.02)
        b.add_body(parent=-1, jtype=JointType.FREE, mass=1.0,
                   inertia=0.05 * np.eye(3))
        m = b.finalize()
        # controls = the 3 angular dofs of the FREE joint
        sel = jnp.zeros((m.nv, 3)).at[:3, :].set(jnp.eye(3))
        f = make_dynamics(m, control_map=lambda u: sel @ u)
        charts = tangent_ops(m)
        retract, local, nt = charts
        assert nt == 12

        q_tgt = jnp.array([np.cos(np.pi / 4), np.sin(np.pi / 4), 0.0, 0.0])

        def att_err(x):
            # quaternion geodesic-ish error: 1 - <q, q_tgt>^2
            d = jnp.sum(x[:4] * q_tgt)
            return 1.0 - d * d

        # running attitude shaping keeps the landscape benign (a pure
        # terminal cost admits wrap-around local minima for ANY solver)
        def rc(x, u, t):
            return 0.05 * jnp.sum(u**2) + 20.0 * att_err(x)

        def tc(x):
            return 200.0 * att_err(x) + 1.0 * jnp.sum(x[m.nq:] ** 2)

        x0 = jnp.concatenate([m.neutral_q(), jnp.zeros(m.nv)])
        T = 50
        us0 = jnp.zeros((T, 3))
        res = jax.jit(lambda u: ilqr(f, rc, tc, x0, u, iters=40, charts=charts))(us0)
        assert float(res.cost) < 0.7 * float(res.cost_trace[0]), (
            float(res.cost_trace[0]), float(res.cost))
        # reached the target attitude exactly, with tiny residual motion
        xT = np.asarray(res.xs[-1])
        assert 1.0 - float(np.abs(np.sum(xT[:4] * np.asarray(q_tgt)))) < 1e-3
        assert float(np.abs(xT[m.nq:]).max()) < 0.2


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
