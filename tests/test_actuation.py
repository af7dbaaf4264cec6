"""Servo motor + joint Coulomb friction LCP rows (ServoMotorConstraint /
JointCoulombFrictionConstraint parity — SURVEY.md §2.1 constraint solver)."""
import jax
import jax.numpy as jnp
import numpy as np

from diffdart_tpu.dynamics.model import enable_joint_friction, enable_servo, make_state
from diffdart_tpu.models import pendulum, double_pendulum
from diffdart_tpu.sim import rollout, step


class TestServo:
    def test_servo_tracks_velocity(self):
        """Strong servo: joint velocity reaches the commanded value."""
        m = pendulum(dt=1e-3)
        m = enable_servo(m, [0], force_limit=100.0, target=jnp.array([1.5]))
        s = make_state(m)
        final, _ = jax.jit(rollout)(m, s, jnp.zeros((200, 1)))
        np.testing.assert_allclose(float(final.v[0]), 1.5, atol=1e-6)

    def test_servo_force_limit_saturates(self):
        """Weak servo cannot hold against gravity: the impulse saturates at
        force_limit*dt and the pendulum still falls."""
        m = pendulum(dt=1e-3)  # gravity torque ~ m g l/2 cos q ~ 2.45 Nm at q=0
        m = enable_servo(m, [0], force_limit=0.5, target=jnp.array([0.0]))
        s = make_state(m, q=jnp.array([0.0]))
        final, traj = jax.jit(rollout)(m, s, jnp.zeros((300, 1)))
        assert abs(float(final.v[0])) > 0.5  # fell despite servo
        # and with a strong servo it holds
        m2 = enable_servo(pendulum(dt=1e-3), [0], force_limit=50.0, target=jnp.array([0.0]))
        final2, _ = jax.jit(rollout)(m2, make_state(m2, q=jnp.array([0.0])), jnp.zeros((300, 1)))
        np.testing.assert_allclose(float(final2.v[0]), 0.0, atol=1e-6)

    def test_servo_differentiable(self):
        """Gradients flow through the servo rows (target is a traced leaf)."""
        m = pendulum(dt=1e-3)
        m = enable_servo(m, [0], force_limit=100.0)

        def final_q(target):
            mm = m.replace(servo_target=jnp.array([target]))
            final, _ = rollout(mm, make_state(mm), jnp.zeros((100, 1)))
            return final.q[0]

        g = jax.grad(final_q)(1.0)
        fd = (final_q(1.0 + 1e-6) - final_q(1.0 - 1e-6)) / 2e-6
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-6)


class TestJointFriction:
    def test_dry_friction_holds_small_loads(self):
        """Coulomb joint friction holds the pendulum static when the friction
        torque exceeds the gravity torque, and lets it creep when not."""
        # gravity torque at q=0 is ~2.45 Nm
        m = enable_joint_friction(pendulum(dt=1e-3), [0], friction=5.0)
        final, _ = jax.jit(rollout)(m, make_state(m, q=jnp.array([0.0])), jnp.zeros((300, 1)))
        np.testing.assert_allclose(float(final.v[0]), 0.0, atol=1e-8)
        np.testing.assert_allclose(float(final.q[0]), 0.0, atol=1e-6)

        m2 = enable_joint_friction(pendulum(dt=1e-3), [0], friction=0.5)
        final2, _ = jax.jit(rollout)(m2, make_state(m2, q=jnp.array([0.0])), jnp.zeros((300, 1)))
        assert abs(float(final2.v[0])) > 0.3  # slips

    def test_friction_decelerates_spinning_joint(self):
        m = pendulum(dt=1e-3)
        m = m.replace(gravity=jnp.zeros(3, m.gravity.dtype))
        m = enable_joint_friction(m, [0], friction=1.0)
        s = make_state(m, v=jnp.array([5.0]))
        final, traj = jax.jit(rollout)(m, s, jnp.zeros((550, 1)))
        v = np.asarray(traj.v[:, 0])
        # constant deceleration tau/I then full stop
        I_pivot = float(m.inertia[0, 1, 1]) + 1.0 * 0.25**2  # I_com + m l^2, com at l=0.25
        decel = (v[10] - v[100]) / (90 * 1e-3)
        np.testing.assert_allclose(decel, 1.0 / I_pivot, rtol=0.02)
        np.testing.assert_allclose(float(final.v[0]), 0.0, atol=1e-8)
