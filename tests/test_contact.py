"""Contact physics: resting, friction, restitution, stacking, and gradients
through impact — the analogue of the reference's test_Collision.cpp +
test_Friction.cpp + the contact sections of test_Gradients.cpp (SURVEY.md §4).
BASELINE.json config 2 ('rigid cube drop/stack, gradient of final pose wrt
initial velocity') lives here."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdart_tpu.dynamics.model import GeomType, JointType, ModelBuilder, State, make_state
from diffdart_tpu.models import cube_drop
from diffdart_tpu.sim import rollout, step


def _roll(m, s, T):
    return jax.jit(rollout)(m, s, jnp.zeros((T, m.nv)))


class TestResting:
    def test_cube_drop_rests_at_half_extent(self):
        m = cube_drop(dt=2e-3, half=0.1)
        s = make_state(m, q=m.neutral_q().at[6].set(0.5))
        final, _ = _roll(m, s, 600)
        assert abs(float(final.q[6]) - 0.1) < 2e-3
        np.testing.assert_allclose(np.asarray(final.v), 0.0, atol=1e-6)
        # orientation must not drift
        np.testing.assert_allclose(np.asarray(final.q[:4]), [1, 0, 0, 0], atol=1e-6)

    def test_sphere_rest(self):
        b = ModelBuilder(dt=2e-3)
        b.add_geom(-1, GeomType.PLANE)
        ball = b.add_body(parent=-1, jtype=JointType.FREE, mass=0.5, inertia=np.eye(3) * 2e-3)
        b.add_geom(ball, GeomType.SPHERE, size=(0.05, 0, 0))
        m = b.finalize()
        s = make_state(m, q=m.neutral_q().at[6].set(0.3))
        final, _ = _roll(m, s, 600)
        assert abs(float(final.q[6]) - 0.05) < 2e-3
        np.testing.assert_allclose(np.asarray(final.v), 0.0, atol=1e-6)

    def test_tilted_cube_settles_flat(self):
        from diffdart_tpu.math.lie import quat_exp

        m = cube_drop(dt=1e-3, half=0.1)
        q0 = m.neutral_q()
        q0 = q0.at[:4].set(quat_exp(jnp.array([0.2, 0.1, 0.0]))).at[6].set(0.25)
        s = make_state(m, q=q0)
        final, _ = _roll(m, s, 2500)
        # settles onto a face: rotation becomes one of the 24 box symmetries;
        # z of every bottom corner ~ 0 => height ~ half extent
        assert abs(float(final.q[6]) - 0.1) < 5e-3
        assert float(jnp.linalg.norm(final.v)) < 1e-3


class TestFriction:
    def test_slide_deceleration_rate(self):
        """Sliding cube decelerates at mu*g (Coulomb)."""
        mu = 0.3
        m = cube_drop(dt=1e-3, half=0.1, friction=mu)
        s = make_state(m, q=m.neutral_q().at[6].set(0.09999), v=jnp.zeros(6).at[3].set(2.0))
        _, traj = _roll(m, s, 100)
        vx = np.asarray(traj.v[:, 3])
        decel = (vx[4] - vx[84]) / (80 * 1e-3)
        np.testing.assert_allclose(decel, mu * 9.81, rtol=0.02)

    def test_frictionless_slide_keeps_velocity(self):
        m = cube_drop(dt=1e-3, half=0.1, friction=0.0)
        s = make_state(m, q=m.neutral_q().at[6].set(0.09999), v=jnp.zeros(6).at[3].set(2.0))
        final, _ = _roll(m, s, 300)
        np.testing.assert_allclose(float(final.v[3]), 2.0, rtol=1e-6)

    def test_incline_stick_vs_slip(self):
        """On a 20-degree incline: mu=0.6 > tan(20deg)=0.36 sticks,
        mu=0.2 slides."""
        import math

        from diffdart_tpu.math.lie import exp_so3

        theta = math.radians(20)
        for mu, should_stick in [(0.6, True), (0.2, False)]:
            b = ModelBuilder(dt=1e-3)
            tilt = np.asarray(exp_so3(jnp.array([0.0, theta, 0.0])))
            b.add_geom(-1, GeomType.PLANE, rot=tilt, friction=mu)
            cube = b.add_body(parent=-1, jtype=JointType.FREE, mass=1.0,
                              inertia=np.eye(3) * 6.7e-3)
            b.add_geom(cube, GeomType.BOX, size=(0.1, 0.1, 0.1), friction=mu)
            m = b.finalize()
            q0 = m.neutral_q()
            q0 = q0.at[:4].set(jnp.asarray(np.r_[np.cos(theta / 2), 0, np.sin(theta / 2), 0]))
            # place slightly above the tilted plane along its normal
            n = tilt[:, 2]
            q0 = q0.at[4:].set(jnp.asarray(n * 0.10001))
            s = make_state(m, q=q0)
            final, _ = _roll(m, s, 800)
            speed = float(jnp.linalg.norm(final.v[3:]))
            if should_stick:
                assert speed < 0.02, f"mu={mu} should stick, speed={speed}"
            else:
                assert speed > 0.5, f"mu={mu} should slide, speed={speed}"


class TestRestitution:
    def test_bouncing_sphere(self):
        b = ModelBuilder(dt=5e-4)
        b.add_geom(-1, GeomType.PLANE, restitution=1.0)
        ball = b.add_body(parent=-1, jtype=JointType.FREE, mass=0.2, inertia=np.eye(3) * 1e-4)
        b.add_geom(ball, GeomType.SPHERE, size=(0.05, 0, 0), restitution=0.8)
        m = b.finalize()
        s = make_state(m, q=m.neutral_q().at[6].set(0.55))
        _, traj = _roll(m, s, 2500)
        z = np.asarray(traj.q[:, 6])
        # drop 0.5m, bounce apex ~ e^2 * 0.5 + r
        apex = z[400:1400].max() - 0.05
        np.testing.assert_allclose(apex, 0.8**2 * 0.5, rtol=0.08)

    def test_inelastic_no_bounce(self):
        m = cube_drop(dt=1e-3, half=0.1, restitution=0.0)
        s = make_state(m, q=m.neutral_q().at[6].set(0.3))
        _, traj = _roll(m, s, 800)
        z = np.asarray(traj.q[:, 6])
        touchdown = np.argmax(z <= 0.1 + 1e-6)
        assert z[touchdown:].max() < 0.105  # no rebound above slop


class TestCapsuleBox:
    """Exact segment-box closest point (capsule_box): cases the old
    3-sample (endpoints+midpoint) approximation provably missed."""

    def _cb(self, pa, axis, r, hl, half):
        from diffdart_tpu.collision.narrowphase import capsule_box

        axis = np.asarray(axis, float)
        axis = axis / np.linalg.norm(axis)
        # rotation with z = axis
        e = np.eye(3)[np.argmin(np.abs(axis))]
        x = np.cross(axis, e)
        x /= np.linalg.norm(x)
        y = np.cross(axis, x)
        Ra = jnp.asarray(np.stack([x, y, axis], axis=1))
        return capsule_box(
            Ra, jnp.asarray(np.asarray(pa, float)), jnp.array([r, hl, 0.0]),
            jnp.eye(3), jnp.zeros(3), jnp.asarray(np.asarray(half, float)),
        )

    def test_interior_closest_point_off_midpoint(self):
        """Segment spans x in [-1, 0.3] at z=0.25 over a 0.2-half box: the
        closest region is x in [-0.2, 0.2] — neither an endpoint nor the
        midpoint (-0.35). The interior candidate must find depth ~0.01."""
        pos, n, depth, valid = self._cb(
            pa=(-0.35, 0.0, 0.25), axis=(1, 0, 0), r=0.06, hl=0.65, half=(0.2, 0.2, 0.2)
        )
        hits = np.asarray(valid)
        assert hits.any(), "interior contact missed"
        d = float(np.asarray(depth)[hits].max())
        assert abs(d - 0.01) < 1e-3
        k = int(np.argmax(np.where(hits, np.asarray(depth), -np.inf)))
        np.testing.assert_allclose(np.asarray(n)[k], [0, 0, 1], atol=1e-5)

    def test_lying_flat_gives_two_end_contacts(self):
        pos, n, depth, valid = self._cb(
            pa=(0.0, 0.0, 0.25), axis=(1, 0, 0), r=0.06, hl=0.1, half=(0.2, 0.2, 0.2)
        )
        assert int(np.asarray(valid).sum()) >= 2
        d = np.asarray(depth)[np.asarray(valid)]
        np.testing.assert_allclose(d, 0.01, atol=1e-3)

    def test_separated_reports_nothing(self):
        _, _, _, valid = self._cb(
            pa=(0.0, 0.0, 0.5), axis=(1, 0, 0), r=0.06, hl=0.3, half=(0.2, 0.2, 0.2)
        )
        assert not bool(np.asarray(valid).any())

    def test_gradient_finite_at_contact(self):
        from diffdart_tpu.collision.narrowphase import capsule_box

        def deepest(z):
            _, _, depth, valid = capsule_box(
                jnp.eye(3), jnp.array([0.05, 0.0, z]), jnp.array([0.06, 0.3, 0.0]),
                jnp.eye(3), jnp.zeros(3), jnp.array([0.2, 0.2, 0.2]),
            )
            return jnp.max(jnp.where(valid, depth, -jnp.inf))

        g = jax.grad(deepest)(jnp.asarray(0.45))
        assert np.isfinite(float(g))
        # deeper as z decreases: d(depth)/dz = -1
        np.testing.assert_allclose(float(g), -1.0, atol=1e-4)


class TestCylinder:
    """collideCylinderPlane parity (DARTCollide.cpp)."""

    def _world(self, rot=None):
        b = ModelBuilder(dt=1e-3)
        b.add_geom(-1, GeomType.PLANE, friction=0.8)
        body = b.add_body(parent=-1, jtype=JointType.FREE, mass=1.0,
                          inertia=np.diag([0.02, 0.02, 0.01]))
        b.add_geom(body, GeomType.CYLINDER, size=(0.05, 0.1, 0),
                   rot=rot if rot is not None else np.eye(3), friction=0.8)
        return b.finalize()

    def test_upright_rests_on_cap(self):
        m = self._world()
        s = make_state(m, q=m.neutral_q().at[6].set(0.3))
        final, _ = _roll(m, s, 700)
        assert abs(float(final.q[6]) - 0.10) < 2e-3
        assert float(jnp.max(jnp.abs(final.v))) < 1e-6

    def test_lying_rests_on_side(self):
        from diffdart_tpu.math.lie import exp_so3

        rot = np.asarray(exp_so3(jnp.array([np.pi / 2, 0, 0])))
        m = self._world(rot=rot)
        s = make_state(m, q=m.neutral_q().at[6].set(0.3))
        final, _ = _roll(m, s, 700)
        assert abs(float(final.q[6]) - 0.05) < 2e-3
        assert float(jnp.max(jnp.abs(final.v))) < 1e-6


class TestSphereCylinder:
    """collideCylinderSphere parity (DARTCollide.cpp): true flat-capped
    cylinder, not the r4 capsule approximation. Pure narrowphase geometry
    (cylinder at origin, radius 0.1, half-height 0.2; unit-ish sphere)."""

    R = np.eye(3)
    sc = jnp.asarray([0.1, 0.2, 0.0])  # cylinder (radius, half-height)

    def _call(self, p_sph, r_sph):
        from diffdart_tpu.collision.narrowphase import sphere_cylinder

        pos, n, depth, valid = sphere_cylinder(
            jnp.eye(3), jnp.asarray(p_sph, jnp.float64), jnp.asarray([r_sph, 0, 0.0]),
            jnp.eye(3), jnp.zeros(3), self.sc,
        )
        return np.asarray(pos[0]), np.asarray(n[0]), float(depth[0]), bool(valid[0])

    def test_cap_contact(self):
        # sphere r=0.05 centered 0.24 above the cap plane: depth 0.01, normal +z
        pos, n, depth, valid = self._call([0.0, 0.0, 0.24], 0.05)
        assert valid and abs(depth - 0.01) < 1e-12
        np.testing.assert_allclose(n, [0, 0, 1], atol=1e-12)
        np.testing.assert_allclose(pos, [0, 0, 0.2], atol=1e-12)  # on the cap

    def test_wall_contact(self):
        pos, n, depth, valid = self._call([0.14, 0.0, 0.0], 0.05)
        assert valid and abs(depth - 0.01) < 1e-12
        np.testing.assert_allclose(n, [1, 0, 0], atol=1e-12)
        np.testing.assert_allclose(pos, [0.1, 0, 0], atol=1e-12)  # on the wall

    def test_rim_contact_differs_from_capsule(self):
        """Diagonal approach to the rim edge: the capsule approximation puts
        the surface 0.1 beyond the cap along the axis; the true cylinder
        clamps to the rim circle."""
        c = np.array([0.1, 0.0, 0.2]) + 0.04 / np.sqrt(2) * np.array([1.0, 0.0, 1.0])
        pos, n, depth, valid = self._call(c, 0.05)
        assert valid and abs(depth - 0.01) < 1e-9
        np.testing.assert_allclose(n, [1 / np.sqrt(2), 0, 1 / np.sqrt(2)], atol=1e-9)
        np.testing.assert_allclose(pos, [0.1, 0, 0.2], atol=1e-9)  # the rim point

    def test_center_inside_pushes_out_nearest_feature(self):
        # closer to the wall than the caps -> lateral push-out
        pos, n, depth, valid = self._call([0.08, 0.0, 0.0], 0.05)
        assert valid and abs(depth - (0.05 + 0.02)) < 1e-12
        np.testing.assert_allclose(n, [1, 0, 0], atol=1e-12)
        # closer to the top cap -> axial push-out
        pos, n, depth, valid = self._call([0.0, 0.0, 0.19], 0.05)
        assert valid and abs(depth - (0.05 + 0.01)) < 1e-12
        np.testing.assert_allclose(n, [0, 0, 1], atol=1e-12)

    def test_separated_invalid_and_grad_clean(self):
        import jax

        _, _, depth, valid = self._call([0.3, 0.0, 0.0], 0.05)
        assert not valid and depth < 0

        # gradient of depth wrt sphere position is finite everywhere sampled,
        # including ON the axis above the cap (the NaN-guard case)
        from diffdart_tpu.collision.narrowphase import sphere_cylinder

        def d_of(p):
            return sphere_cylinder(
                jnp.eye(3), p, jnp.asarray([0.05, 0, 0.0]),
                jnp.eye(3), jnp.zeros(3), self.sc,
            )[2][0]

        for p in ([0.0, 0.0, 0.24], [0.14, 0.0, 0.0], [0.12, 0.0, 0.22]):
            g = jax.grad(d_of)(jnp.asarray(p, jnp.float64))
            assert np.all(np.isfinite(np.asarray(g))), (p, g)

    def test_rolling_sphere_rests_on_cylinder_dynamics(self):
        """End-to-end: a sphere dropped onto an upright cylinder's cap comes
        to rest at cap height + sphere radius."""
        b = ModelBuilder(dt=1e-3)
        b.add_geom(-1, GeomType.PLANE, friction=0.8)
        cyl = b.add_body(parent=-1, jtype=JointType.FREE, mass=4.0,
                         inertia=np.diag([0.05, 0.05, 0.03]))
        b.add_geom(cyl, GeomType.CYLINDER, size=(0.12, 0.1, 0), friction=0.8)
        sph = b.add_body(parent=-1, jtype=JointType.FREE, mass=0.2,
                         inertia=0.001 * np.eye(3))
        b.add_geom(sph, GeomType.SPHERE, size=(0.04, 0, 0), friction=0.8)
        m = b.finalize()
        q0 = m.neutral_q()
        q0 = q0.at[6].set(0.1)          # cylinder resting on the plane
        q0 = q0.at[7 + 6].set(0.35)     # sphere above the cap
        s = make_state(m, q=q0)
        final, _ = _roll(m, s, 800)
        assert abs(float(final.q[7 + 6]) - 0.24) < 5e-3  # 0.2 cap + 0.04 r
        assert float(jnp.max(jnp.abs(final.v))) < 1e-4


class TestStacking:
    def test_two_cube_stack_stable(self):
        """box_box: a stacked pair stays stacked (reference collideBoxBox
        capability)."""
        m = cube_drop(dt=1e-3, half=0.1, n_cubes=2, friction=0.8)
        q0 = m.neutral_q()
        q0 = q0.at[6].set(0.1).at[7 + 6].set(0.3005)  # cube1 resting, cube2 on top
        s = make_state(m, q=q0)
        final, _ = _roll(m, s, 1000)
        assert abs(float(final.q[6]) - 0.1) < 5e-3
        assert abs(float(final.q[13]) - 0.3) < 8e-3
        assert float(jnp.linalg.norm(final.v)) < 5e-3


class TestContactGradients:
    """BASELINE config 2: gradient of final pose wrt initial velocity,
    FD-verified through impact + friction (test_Gradients.cpp pattern)."""

    def _final_x(self, m, vx, z0=0.3, T=300):
        s = State(q=m.neutral_q().at[6].set(z0), v=jnp.zeros(6).at[3].set(vx), t=jnp.zeros(()))
        final, _ = rollout(m, s, jnp.zeros((T, 6)))
        return final.q[4]

    def test_grad_final_pose_wrt_initial_velocity(self):
        m = cube_drop(dt=2e-3, half=0.1, friction=0.5)
        f = lambda vx: self._final_x(m, vx)
        g = jax.grad(f)(1.0)
        eps = 1e-5
        fd = (f(1.0 + eps) - f(1.0 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)

    def test_grad_wrt_friction_coefficient(self):
        m = cube_drop(dt=2e-3, half=0.1, friction=0.5)

        def f(mu):
            mm = m.replace(geom_friction=jnp.full_like(m.geom_friction, mu))
            s = State(q=mm.neutral_q().at[6].set(0.15), v=jnp.zeros(6).at[3].set(2.0), t=jnp.zeros(()))
            final, _ = rollout(mm, s, jnp.zeros((250, 6)))
            return final.q[4]

        g = jax.grad(f)(0.4)
        eps = 1e-6
        fd = (f(0.4 + eps) - f(0.4 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-3)
        assert float(g) < 0  # more friction => less travel

    def test_grad_wrt_mass(self):
        """WithRespectTo::GROUP_MASSES capability: gradients w.r.t. inertial
        params flow through contact for free. Uses a two-sphere collision —
        the momentum exchange depends on the mass RATIO (a single body's
        frictional slide is mass-invariant, so it can't probe this)."""
        b = ModelBuilder(dt=1e-3, gravity=(0, 0, 0))
        s0 = b.add_body(parent=-1, jtype=JointType.FREE, mass=1.0, inertia=np.eye(3) * 1e-3)
        b.add_geom(s0, GeomType.SPHERE, size=(0.1, 0, 0), restitution=0.5)
        s1 = b.add_body(parent=-1, jtype=JointType.FREE, mass=2.0, inertia=np.eye(3) * 1e-3)
        b.add_geom(s1, GeomType.SPHERE, size=(0.1, 0, 0), restitution=0.5)
        m = b.finalize()
        q0 = m.neutral_q()
        q0 = q0.at[4].set(-0.3).at[7 + 4].set(0.3)  # spheres at x = -0.3 and +0.3

        def f(mass0):
            mm = m.replace(mass=m.mass.at[0].set(mass0))
            v0 = jnp.zeros(12).at[3].set(2.0)  # sphere 0 moves +x into sphere 1
            s = State(q=q0, v=v0, t=jnp.zeros(()))
            final, _ = rollout(mm, s, jnp.zeros((300, 12)))
            return final.v[3] + 2.0 * final.v[9]  # post-collision velocities

        g = jax.grad(f)(1.0)
        eps = 1e-5
        fd = (f(1.0 + eps) - f(1.0 - eps)) / (2 * eps)
        assert abs(float(fd)) > 1e-3  # the objective really depends on mass
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)


class TestBatchedContact:
    def test_vmap_invariance_with_contacts(self):
        m = cube_drop(dt=2e-3, half=0.1)
        zs = jnp.array([0.3, 0.15, 0.11, 0.5])
        qs = jnp.stack([m.neutral_q().at[6].set(z) for z in zs])
        vs = jnp.zeros((4, 6)).at[:, 3].set(jnp.array([1.0, -0.5, 0.0, 2.0]))
        batch = State(q=qs, v=vs, t=jnp.zeros(4))
        stepb = jax.jit(jax.vmap(lambda s: step(m, s)))
        out = stepb(batch)
        for i in range(4):
            s_i = State(q=qs[i], v=vs[i], t=jnp.zeros(()))
            out_i = step(m, s_i)
            np.testing.assert_allclose(np.asarray(out.q[i]), np.asarray(out_i.q), atol=1e-13, rtol=0)
            np.testing.assert_allclose(np.asarray(out.v[i]), np.asarray(out_i.v), atol=1e-13, rtol=0)
