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


class TestHierarchicalIK:
    def test_two_level_priorities(self):
        """Level-0 (end effector) is met exactly; level-1 (mid-chain) is
        satisfied only as far as the remaining nullspace allows
        (HierarchicalIK parity)."""
        from diffdart_tpu.neural import HierarchicalIK

        m = chain(n=6, length=0.3)
        q_true = jnp.array([0.4, -0.3, 0.5, 0.2, -0.4, 0.3])
        R, p = fk(m, q_true)
        t_ee = p[5]
        t_mid = p[2]
        hik = HierarchicalIK(m, levels=[[(5, (0, 0, 0))], [(2, (0, 0, 0))]], iters=80)
        q, errs = jax.jit(hik.solve)([t_ee[None], t_mid[None]], jnp.zeros(m.nv))
        assert float(errs[0]) < 1e-4, f"primary task unmet: {float(errs[0])}"
        assert float(errs[1]) < 5e-2  # secondary roughly met via nullspace

    def test_primary_wins_on_conflict(self):
        """When targets conflict, the higher-priority level is the one that
        stays satisfied."""
        from diffdart_tpu.neural import HierarchicalIK

        m = chain(n=4, length=0.3)
        R, p = fk(m, jnp.array([0.3, 0.3, 0.3, 0.3]))
        t_ee = p[3]
        t_conflict = jnp.asarray(p[1]) + jnp.array([0.5, 0.0, 0.5])  # unreachable with level-0 held
        hik = HierarchicalIK(m, levels=[[(3, (0, 0, 0))], [(1, (0, 0, 0))]], iters=80)
        q, errs = hik.solve([t_ee[None], t_conflict[None]], jnp.zeros(m.nv))
        assert float(errs[0]) < 1e-4
        assert float(errs[1]) > 0.1  # genuinely conflicting

    def test_offsets_and_multi_task_level(self):
        from diffdart_tpu.neural import HierarchicalIK
        from diffdart_tpu.math.lie import tf_apply

        m = chain(n=5, length=0.3)
        off = (0.0, 0.0, 0.15)
        q_true = jnp.array([0.2, -0.2, 0.4, -0.1, 0.3])
        R, p = fk(m, q_true)
        t0 = tf_apply(R[4], p[4], jnp.asarray(off))
        t1 = p[2]
        hik = HierarchicalIK(m, levels=[[(4, off), (2, (0, 0, 0))]], iters=100)
        q, errs = hik.solve([jnp.stack([t0, t1])], jnp.zeros(m.nv))
        assert float(errs[0]) < 1e-3
