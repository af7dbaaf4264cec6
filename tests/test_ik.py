"""Inverse kinematics (InverseKinematics/JacobianDLS + IKMapping parity)."""
import jax
import jax.numpy as jnp
import numpy as np

from diffdart_tpu.dynamics.kinematics import fk
from diffdart_tpu.models import chain
from diffdart_tpu.neural import IKMapping, solve_ik


class TestIK:
    def test_solve_reaches_target(self):
        m = chain(n=4, length=0.3)
        q0 = jnp.zeros(m.nv)
        # pick a reachable target: FK of a known configuration
        q_true = jnp.array([0.4, -0.3, 0.6, 0.2])
        R, p = fk(m, q_true)
        target = p[3]
        q_sol, err = jax.jit(lambda t, q: solve_ik(m, 3, t, q, iters=80))(target, q0)
        assert float(err) < 1e-5, float(err)
        R2, p2 = fk(m, q_sol)
        np.testing.assert_allclose(np.asarray(p2[3]), np.asarray(target), atol=1e-5)

    def test_ik_mapping_roundtrip(self):
        m = chain(n=3, length=0.3)
        mp = IKMapping(m, [2], iters=60)
        q = jnp.array([0.3, -0.5, 0.8])
        z = mp.map_pos(q)
        q2 = mp.unmap_pos(z, jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(mp.map_pos(q2)), np.asarray(z), atol=1e-6)

    def test_task_velocity_consistent(self):
        """map_vel == d/dt map_pos along a trajectory tangent."""
        m = chain(n=3, length=0.3)
        mp = IKMapping(m, [2])
        q = jnp.array([0.2, 0.4, -0.1])
        v = jnp.array([1.0, -0.5, 0.3])
        zdot = mp.map_vel(q, v)
        eps = 1e-6
        from diffdart_tpu.dynamics.dynamics import integrate_positions

        fd = (mp.map_pos(integrate_positions(m, q, v, eps)) - mp.map_pos(integrate_positions(m, q, -v, eps))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(zdot), np.asarray(fd), atol=1e-6)
