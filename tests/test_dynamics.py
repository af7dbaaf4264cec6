"""Dynamics correctness: closed forms, conservation laws, oracle comparisons,
FD twins, and batching invariance — the analogue of the reference's
unittests/comprehensive/test_Dynamics.cpp + test_Joints.cpp (SURVEY.md §4).
MuJoCo (CPU) serves as the cross-engine oracle in place of DART itself."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdart_tpu.dynamics.dynamics import (
    bias_forces,
    forward_dynamics,
    inverse_dynamics,
    kinetic_energy,
    mass_matrix,
    potential_energy,
)
from diffdart_tpu.dynamics.model import JointType, ModelBuilder, make_state
from diffdart_tpu.models import cartpole, chain, double_pendulum, pendulum, projectile
from diffdart_tpu.sim import rollout, step_unconstrained


class TestPendulum:
    def test_closed_form_accel(self):
        m = pendulum(length=0.5, mass=1.0)
        # I_pivot * qdd = m g l/2 cos(q)  (rotation about +y drives +x downward)
        for q0 in [0.0, 0.3, -1.1, 2.0]:
            qdd = forward_dynamics(m, jnp.array([q0]), jnp.array([0.0]), jnp.zeros(1))
            I_pivot = float(m.inertia[0, 1, 1]) + 1.0 * 0.25**2
            expected = 1.0 * 9.81 * 0.25 * np.cos(q0) / I_pivot
            np.testing.assert_allclose(float(qdd[0]), expected, rtol=1e-10)

    def test_energy_conservation(self):
        m = double_pendulum()
        s = make_state(m, q=jnp.array([0.4, -0.2]))
        E0 = kinetic_energy(m, s.q, s.v) + potential_energy(m, s.q)
        final, traj = jax.jit(rollout)(m, s, jnp.zeros((2000, 2)))
        E = jax.vmap(lambda q, v: kinetic_energy(m, q, v) + potential_energy(m, q))(traj.q, traj.v)
        # symplectic Euler: energy oscillates but stays bounded near E0
        assert float(jnp.max(jnp.abs(E - E0))) < 0.05 * abs(float(E0)) + 0.05

    def test_coriolis_vanishes_at_rest(self):
        m = double_pendulum()
        m0 = m.replace(gravity=jnp.zeros(3, m.gravity.dtype))
        C = bias_forces(m0, jnp.array([0.7, -0.3]), jnp.zeros(2))
        np.testing.assert_allclose(C, 0.0, atol=1e-12)


class TestProjectile:
    def test_ballistic(self):
        m = projectile(dt=1e-3)
        q0 = m.neutral_q()
        # launch with world velocity (1, 0, 2); FREE joint v is (omega_child, v_child)
        v0 = jnp.array([0.0, 0.0, 0.0, 1.0, 0.0, 2.0])
        s = make_state(m, q=q0, v=v0)
        final, _ = jax.jit(rollout)(m, s, jnp.zeros((500, 6)))
        t = 0.5
        # semi-implicit Euler matches closed form up to O(dt) in z
        np.testing.assert_allclose(float(final.q[4]), 1.0 * t, atol=1e-9)
        np.testing.assert_allclose(float(final.q[6]), 2.0 * t - 0.5 * 9.81 * t**2, atol=0.01)
        np.testing.assert_allclose(float(final.v[5]), 2.0 - 9.81 * t, atol=1e-6)

    def test_tumbling_preserves_angular_momentum_norm(self):
        m = projectile(dt=1e-3)
        m = m.replace(inertia=m.inertia.at[0].set(jnp.diag(jnp.array([0.01, 0.02, 0.03]))),
                      gravity=jnp.zeros(3, m.gravity.dtype))
        v0 = jnp.array([3.0, 0.1, 0.05, 0.0, 0.0, 0.0])
        s = make_state(m, v=v0)
        final, _ = jax.jit(rollout)(m, s, jnp.zeros((2000, 6)))
        # |L_world| conserved for torque-free rigid body
        from diffdart_tpu.math.lie import quat_to_mat

        def L_world(q, v):
            R = quat_to_mat(q[:4])
            return R @ (m.inertia[0] @ v[:3])

        L0, L1 = L_world(s.q, s.v), L_world(final.q, final.v)
        np.testing.assert_allclose(np.asarray(L1), np.asarray(L0), rtol=2e-3)


class TestStructure:
    def _rand_model(self):
        b = ModelBuilder()
        r = b.add_body(parent=-1, jtype=JointType.FREE, mass=2.0, com=(0.1, 0, 0.05),
                       inertia=np.diag([0.1, 0.12, 0.08]))
        c1 = b.add_body(parent=r, jtype=JointType.BALL, X_pos=(0.3, 0, 0), mass=1.0,
                        com=(0.15, 0, 0), inertia=np.diag([0.02, 0.03, 0.03]))
        b.add_body(parent=c1, jtype=JointType.REVOLUTE, axis=(0, 0, 1), X_pos=(0.3, 0, 0),
                   mass=0.5, com=(0.1, 0, 0), inertia=np.eye(3) * 0.01)
        b.add_body(parent=r, jtype=JointType.PRISMATIC, axis=(0, 0, 1), X_pos=(-0.2, 0.1, 0),
                   mass=0.4, com=(0, 0, 0.1), inertia=np.eye(3) * 0.008)
        b.add_body(parent=r, jtype=JointType.UNIVERSAL, axis=(1, 0, 0), axis2=(0, 1, 0),
                   X_pos=(0, 0.25, 0), mass=0.3, com=(0, 0.1, 0), inertia=np.eye(3) * 0.006)
        return b.finalize()

    def _rand_qv(self, m, key):
        k1, k2 = jax.random.split(key)
        q = m.neutral_q() + 0.3 * jax.random.normal(k1, (m.nq,))
        v = jax.random.normal(k2, (m.nv,))
        return q, v

    def test_mass_matrix_spd(self):
        m = self._rand_model()
        for seed in range(3):
            q, _ = self._rand_qv(m, jax.random.PRNGKey(seed))
            M = np.asarray(mass_matrix(m, q))
            np.testing.assert_allclose(M, M.T, atol=1e-10)
            assert np.all(np.linalg.eigvalsh(M) > 0)

    def test_inverse_forward_roundtrip(self):
        m = self._rand_model()
        q, v = self._rand_qv(m, jax.random.PRNGKey(7))
        tau = jax.random.normal(jax.random.PRNGKey(8), (m.nv,))
        qdd = forward_dynamics(m, q, v, tau)
        tau2 = inverse_dynamics(m, q, v, qdd)
        np.testing.assert_allclose(np.asarray(tau2), np.asarray(tau), atol=1e-8)

    def test_kinetic_energy_matches_mass_matrix(self):
        m = self._rand_model()
        q, v = self._rand_qv(m, jax.random.PRNGKey(3))
        ke1 = float(kinetic_energy(m, q, v))
        ke2 = 0.5 * float(v @ (mass_matrix(m, q) - jnp.diag(m.armature)) @ v)
        np.testing.assert_allclose(ke1, ke2, rtol=1e-10)

    def test_bias_matches_lagrangian_fd(self):
        """FD twin: for a vector configuration space (no quaternion joints) the
        Euler-Lagrange identity tau(qdd=0) = (dM/dq . v) v - dL/dq must hold.
        (For ball/free joints the body-frame-increment version picks up an
        Euler-Poincare ad* term, so we restrict to scalar joints here; those
        joints are covered by the roundtrip + energy + oracle tests.)"""
        m = chain(n=4, jtypes=[JointType.REVOLUTE, JointType.PRISMATIC,
                               JointType.REVOLUTE, JointType.REVOLUTE])
        key = jax.random.PRNGKey(11)
        q = 0.4 * jax.random.normal(key, (m.nv,))
        v = jax.random.normal(jax.random.PRNGKey(12), (m.nv,))

        def momentum(q_):
            return mass_matrix(m, q_) @ v

        def lagrangian(q_):
            return kinetic_energy(m, q_, v) - potential_energy(m, q_)

        eps = 1e-6
        dMv = (momentum(q + eps * v) - momentum(q - eps * v)) / (2 * eps)
        dLdq = jnp.stack(
            [(lagrangian(q + eps * _e(m.nv, i)) - lagrangian(q - eps * _e(m.nv, i))) / (2 * eps) for i in range(m.nv)]
        )
        tau_expected = dMv - dLdq
        tau_id = inverse_dynamics(m, q, v, jnp.zeros(m.nv))
        np.testing.assert_allclose(np.asarray(tau_id), np.asarray(tau_expected), atol=1e-6)


def _e(n, i):
    return jnp.zeros(n).at[i].set(1.0)


class TestBatching:
    def test_vmap_invariance(self):
        """vmap(step)(batch)[i] == step(env_i) — SURVEY.md §4 rebuild plan #3."""
        m = cartpole()
        qs = jnp.stack([jnp.array([0.1 * i, 0.2 - 0.05 * i]) for i in range(4)])
        vs = jnp.stack([jnp.array([0.3, -0.1 * i]) for i in range(4)])
        taus = jnp.stack([jnp.array([0.5 * i, 0.0]) for i in range(4)])
        from diffdart_tpu.dynamics.model import State

        batch = State(q=qs, v=vs, t=jnp.zeros(4))
        out_b = jax.jit(jax.vmap(lambda s, t: step_unconstrained(m, s, t)))(batch, taus)
        for i in range(4):
            s_i = State(q=qs[i], v=vs[i], t=jnp.zeros(()))
            out_i = step_unconstrained(m, s_i, taus[i])
            # ULP-level tolerance: XLA fuses differently under vmap, which
            # reorders float reductions (deviations observed ~1e-17 on f64)
            np.testing.assert_allclose(np.asarray(out_b.q[i]), np.asarray(out_i.q), atol=1e-13, rtol=0)
            np.testing.assert_allclose(np.asarray(out_b.v[i]), np.asarray(out_i.v), atol=1e-13, rtol=0)


class TestBPTT:
    def test_rollout_gradient_vs_fd(self):
        """Gradient of a rollout loss w.r.t. initial velocity and controls
        matches central finite differences — the reference's every-analytical-
        quantity-has-an-FD-twin pattern applied to BPTT."""
        m = cartpole(dt=5e-3)
        s0 = make_state(m, q=jnp.array([0.0, 0.2]))
        T = 40

        def loss(v0, taus):
            s = s0.replace(v=v0)
            final, _ = rollout(m, s, taus)
            return jnp.sum(final.q**2) + 0.1 * jnp.sum(final.v**2)

        v0 = jnp.array([0.1, -0.3])
        taus = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (T, 2))
        g_v0, g_tau = jax.jit(jax.grad(loss, argnums=(0, 1)))(v0, taus)
        eps = 1e-6
        for i in range(2):
            d = jnp.zeros(2).at[i].set(eps)
            fd = (loss(v0 + d, taus) - loss(v0 - d, taus)) / (2 * eps)
            np.testing.assert_allclose(float(g_v0[i]), float(fd), rtol=1e-5, atol=1e-8)
        for (t, i) in [(0, 0), (T // 2, 1), (T - 1, 0)]:
            d = jnp.zeros((T, 2)).at[t, i].set(eps)
            fd = (loss(v0, taus + d) - loss(v0, taus - d)) / (2 * eps)
            np.testing.assert_allclose(float(g_tau[t, i]), float(fd), rtol=1e-5, atol=1e-8)
