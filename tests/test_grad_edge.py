"""Gradient correctness at contact edge cases — graze, impact, friction-cone
boundary — per the 'Do differentiable simulators have correct gradients?'
methodology (PAPERS.md arXiv:2207.05060; SURVEY.md §4 rebuild plan #4).

The property asserted is SELF-CONSISTENCY: AD of the discrete dynamics equals
finite differences of the same discrete dynamics away from measure-zero
kinks, and at kinks AD lands between the one-sided derivatives."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdart_tpu.dynamics.model import GeomType, JointType, ModelBuilder, State, make_state
from diffdart_tpu.sim import rollout


def _ball_world(restitution=0.0, friction=0.5, dt=1e-3):
    b = ModelBuilder(dt=dt)
    b.add_geom(-1, GeomType.PLANE, friction=friction, restitution=1.0)
    ball = b.add_body(parent=-1, jtype=JointType.FREE, mass=0.2, inertia=np.eye(3) * 8e-5)
    b.add_geom(ball, GeomType.SPHERE, size=(0.05, 0, 0), friction=friction, restitution=restitution)
    return b.finalize()


class TestImpactGradients:
    def test_grad_through_bounce_vs_fd(self):
        """Height gradient through a restitution bounce. Two facts asserted:

        1. AD == FD of the same discrete dynamics (self-consistency). Note the
           value is 1.0, NOT the continuous-time e^2 = 0.64: within a window
           where the impact lands on the same step, discrete free-fall
           velocity is independent of z0, so the rebound shifts 1:1; the e^2
           slope only appears across impact-step-boundary jumps. This is the
           discrete-impact gradient phenomenon of arXiv:2207.05060.
        2. The MACROSCOPIC slope (across many step boundaries) recovers e^2.
        """
        m = _ball_world(restitution=0.8)

        def apex_after_bounce(z0):
            s = make_state(m, q=m.neutral_q().at[6].set(z0))
            _, traj = rollout(m, s, jnp.zeros((700, 6)))
            return jnp.max(traj.q[300:, 6])

        z0 = 0.31
        g = jax.grad(apex_after_bounce)(z0)
        eps = 1e-6
        fd = (apex_after_bounce(z0 + eps) - apex_after_bounce(z0 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=5e-3)
        macro = (apex_after_bounce(0.36) - apex_after_bounce(0.26)) / 0.1
        np.testing.assert_allclose(float(macro), 0.8**2, rtol=0.05)

    def test_graze_subgradient_bounded(self):
        """Sphere thrown horizontally just above the ground: at the graze
        threshold the outcome kinks; AD must lie within (or near) the hull of
        the one-sided FD derivatives."""
        m = _ball_world(restitution=0.5)

        def final_x(z0):
            s = make_state(m, q=m.neutral_q().at[6].set(z0), v=jnp.zeros(6).at[3].set(2.0))
            final, _ = rollout(m, s, jnp.zeros((300, 6)))
            return final.q[4]

        # graze altitude: falls ~ 0.044 m in 0.3 s from v=0 -> z0 = r + 0.0441
        z_graze = 0.05 + 0.5 * 9.81 * 0.3**2 / 2  # approximate
        g = jax.grad(final_x)(z_graze)
        h = 1e-4
        fd_plus = (final_x(z_graze + 2 * h) - final_x(z_graze + h)) / h
        fd_minus = (final_x(z_graze - h) - final_x(z_graze - 2 * h)) / h
        lo_g, hi_g = min(fd_plus, fd_minus), max(fd_plus, fd_minus)
        margin = 0.1 * (abs(lo_g) + abs(hi_g)) + 1e-6
        assert lo_g - margin <= float(g) <= hi_g + margin, (float(g), lo_g, hi_g)

    def test_friction_cone_crossing(self):
        """Gradient of slide distance w.r.t. initial speed is continuous and
        FD-consistent on both sides of the stick/slip transition."""
        m = _ball_world(friction=0.4)
        b = ModelBuilder(dt=1e-3)
        b.add_geom(-1, GeomType.PLANE, friction=0.4)
        cube = b.add_body(parent=-1, jtype=JointType.FREE, mass=1.0, inertia=np.eye(3) * 6.7e-3)
        b.add_geom(cube, GeomType.BOX, size=(0.1, 0.1, 0.1), friction=0.4)
        m = b.finalize()

        def final_x(v0):
            s = make_state(m, q=m.neutral_q().at[6].set(0.09999), v=jnp.zeros(6).at[3].set(v0))
            final, _ = rollout(m, s, jnp.zeros((300, 6)))
            return final.q[4]

        for v0 in [0.3, 1.5]:  # stops mid-rollout vs still sliding at the end
            g = jax.grad(final_x)(v0)
            eps = 1e-6
            fd = (final_x(v0 + eps) - final_x(v0 - eps)) / (2 * eps)
            np.testing.assert_allclose(float(g), float(fd), rtol=1e-4, atol=1e-8)
