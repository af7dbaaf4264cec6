"""Dynamic bilateral constraints: BallJointConstraint / WeldJointConstraint
parity (dart/constraint — SURVEY.md §2.1)."""
import jax
import jax.numpy as jnp
import numpy as np

from diffdart_tpu.dynamics.model import (
    GeomType,
    JointType,
    ModelBuilder,
    add_ball_constraint,
    add_weld_constraint,
    make_state,
)
from diffdart_tpu.dynamics.kinematics import fk
from diffdart_tpu.math.lie import tf_apply
from diffdart_tpu.sim import rollout


def _two_free_bodies(dx=0.5):
    b = ModelBuilder(dt=1e-3)
    b.add_body(parent=-1, jtype=JointType.FREE, mass=1.0, inertia=np.eye(3) * 0.01)
    b.add_body(parent=-1, jtype=JointType.FREE, mass=1.0, inertia=np.eye(3) * 0.01)
    m = b.finalize()
    q = m.neutral_q()
    q = q.at[11].set(dx)  # body2 offset in x
    return m, q


class TestBallConstraint:
    def test_pendulum_from_ball_constraint(self):
        """Free body pinned to the WORLD by a ball constraint swings like a
        pendulum: the anchor stays fixed and energy stays bounded."""
        b = ModelBuilder(dt=1e-3)
        b.add_body(parent=-1, jtype=JointType.FREE, mass=1.0, com=(0.3, 0, 0),
                   inertia=np.eye(3) * 0.01)
        m = b.finalize()
        m = add_ball_constraint(m, -1, 0, world_point=(0.0, 0.0, 0.0))
        s = make_state(m)
        final, traj = jax.jit(rollout)(m, s, jnp.zeros((800, m.nv)))
        # the body-frame origin (= anchor) must stay at the world origin
        for t in [100, 400, 799]:
            q = traj.q[t]
            np.testing.assert_allclose(np.asarray(q[4:7]), 0.0, atol=2e-3)
        # and the COM swings (nonzero rotation)
        assert abs(float(final.q[2])) + abs(float(final.q[1])) + abs(float(final.q[3])) > 1e-3

    def test_two_body_chain(self):
        """Two free bodies ball-jointed together stay connected while falling."""
        m, q0 = _two_free_bodies(dx=0.5)
        m = m.replace(gravity=jnp.asarray([0.0, 0.0, -9.81], m.mass.dtype))
        m = add_ball_constraint(m, 0, 1, world_point=(0.25, 0.0, 0.0), q=q0)
        s = make_state(m, q=q0, v=jnp.zeros(m.nv).at[0].set(2.0))  # spin body 1
        final, traj = jax.jit(rollout)(m, s, jnp.zeros((500, m.nv)))

        def anchor_gap(q):
            R, p = fk(m, q)
            aw = tf_apply(R[0], p[0], m.ball_anchor_a[0])
            bw = tf_apply(R[1], p[1], m.ball_anchor_b[0])
            return float(jnp.linalg.norm(aw - bw))

        assert anchor_gap(final.q) < 5e-3
        assert bool(jnp.all(jnp.isfinite(final.q)))


class TestWeldConstraint:
    def test_welded_pair_moves_rigidly(self):
        """Two welded free bodies keep their relative pose under tumbling."""
        m, q0 = _two_free_bodies(dx=0.4)
        m = m.replace(gravity=jnp.zeros(3, m.mass.dtype))
        m = add_weld_constraint(m, 0, 1, q=q0)
        v0 = jnp.zeros(m.nv).at[0].set(1.5).at[4].set(0.5)  # spin + translate body 1
        s = make_state(m, q=q0, v=v0)
        final, _ = jax.jit(rollout)(m, s, jnp.zeros((500, m.nv)))
        R, p = fk(m, final.q)
        # relative pose preserved: R_a^T R_b == initial rel, |p_b - p_a| == 0.4
        rel = np.asarray(R[0].T @ R[1])
        np.testing.assert_allclose(rel, np.asarray(m.weld_rel_rot[0]), atol=5e-3)
        np.testing.assert_allclose(float(jnp.linalg.norm(p[1] - p[0])), 0.4, atol=5e-3)


class TestRowLayout:
    def test_static_fidx_covers_bilateral_rows(self):
        """static_fidx length must equal the assembled LCP dimension D even
        with ball/weld rows present (round-1 latent bug: bilateral rows were
        omitted, so the Pallas path would get a wrong-length one-hot)."""
        from diffdart_tpu.collision.collide import max_contacts
        from diffdart_tpu.constraints.assembly import static_fidx

        m, q0 = _two_free_bodies(dx=0.5)
        m = add_ball_constraint(m, 0, 1, world_point=(0.25, 0.0, 0.0), q=q0)
        m = add_weld_constraint(m, 0, 1, q=q0)
        D = (
            3 * max_contacts(m)
            + 2 * len(m.limited_dofs)
            + len(m.servo_dofs)
            + len(m.friction_dofs)
            + 3 * len(m.ball_pairs)
            + 6 * len(m.weld_pairs)
        )
        fidx = static_fidx(m)
        assert len(fidx) == D
        # bilateral rows are not friction-coupled
        assert all(f == -1 for f in fidx[-9:])
