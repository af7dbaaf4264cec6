"""World/Skeleton facade API tests (the pybind-surface semantics of the
reference: setPositions/getVelocities/step — SURVEY.md §2.3)."""
import jax.numpy as jnp
import numpy as np

from diffdart_tpu.dynamics.model import GeomType, JointType
from diffdart_tpu.sim.world import World


def _build_pendulum(b):
    b.add_body(parent=-1, jtype=JointType.REVOLUTE, axis=(0, 1, 0),
               mass=1.0, com=(0.5, 0, 0), inertia=np.eye(3) * 0.02)


def _build_ball(b):
    body = b.add_body(parent=-1, jtype=JointType.FREE, mass=0.5, inertia=np.eye(3) * 1e-3)
    b.add_geom(body, GeomType.SPHERE, size=(0.05, 0, 0))


class TestWorldAPI:
    def test_skeleton_views(self):
        w = World(time_step=1e-3)
        pend = w.addSkeleton(_build_pendulum, name="pendulum")
        ball = w.addSkeleton(_build_ball, name="ball")
        assert w.getNumSkeletons() == 2
        assert pend.getNumDofs() == 1
        assert ball.getNumDofs() == 6
        pend.setPositions(jnp.array([0.3]))
        np.testing.assert_allclose(np.asarray(pend.getPositions()), [0.3])
        assert w.getSkeleton("ball") is ball

    def test_step_advances_time(self):
        w = World(time_step=2e-3)
        w.addSkeleton(_build_pendulum)
        for _ in range(5):
            w.step()
        np.testing.assert_allclose(w.getTime(), 0.01, atol=1e-12)

    def test_mass_matrix_and_forces(self):
        w = World()
        pend = w.addSkeleton(_build_pendulum)
        pend.setPositions(jnp.array([0.5]))
        M = pend.getMassMatrix()
        assert M.shape == (1, 1)
        I_pivot = 0.02 + 1.0 * 0.25
        np.testing.assert_allclose(float(M[0, 0]), I_pivot, rtol=1e-10)
        C = pend.getCoriolisAndGravityForces()
        np.testing.assert_allclose(float(C[0]), -1.0 * 9.81 * 0.5 * np.cos(0.5), rtol=1e-10)

    def test_control_forces(self):
        w = World(time_step=1e-3)
        pend = w.addSkeleton(_build_pendulum)
        pend.setControlForces(jnp.array([2.0]))
        w.step(reset_command=False)
        np.testing.assert_allclose(np.asarray(pend.getControlForces()), [2.0])
        w.step()  # resetCommand=True clears
        np.testing.assert_allclose(np.asarray(pend.getControlForces()), [0.0])

    def test_gravity_projectile_through_world(self):
        w = World(time_step=1e-3)
        ball = w.addSkeleton(_build_ball)
        q = np.zeros(7)
        q[0] = 1.0
        q[6] = 1.0  # z = 1
        ball.setPositions(jnp.asarray(q))
        for _ in range(100):
            w.step()
        z = float(ball.getPositions()[6])
        np.testing.assert_allclose(z, 1.0 - 0.5 * 9.81 * 0.1**2, atol=1e-3)
