"""Mesh pipeline + convex-hull narrowphase (collision/convex.py, io/mesh.py,
URDF <mesh> loading). Reference parity: MeshShape + FCLCollisionDetector
(SURVEY.md §2.1) and Shape::computeInertia."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdart_tpu.dynamics.model import (
    GeomType,
    JointType,
    ModelBuilder,
    make_state,
)
from diffdart_tpu.io.mesh import (
    box_mesh,
    convex_hull,
    cylinder_mesh,
    load_mesh,
    mesh_volume_com_inertia,
    save_obj,
    save_stl,
)
from diffdart_tpu.sim import rollout


class TestMeshIO:
    def test_box_inertia_exact(self):
        v, f = box_mesh([0.1, 0.2, 0.3])
        m, com, I = mesh_volume_com_inertia(v, f, density=1000.0)
        m_ref = 1000 * 8 * 0.1 * 0.2 * 0.3
        I_ref = m_ref / 3.0 * np.diag([0.2**2 + 0.3**2, 0.1**2 + 0.3**2, 0.1**2 + 0.2**2])
        assert abs(m - m_ref) < 1e-9 * m_ref
        np.testing.assert_allclose(com, 0.0, atol=1e-12)
        np.testing.assert_allclose(I, I_ref, rtol=1e-9, atol=1e-12)

    def test_shifted_com_and_parallel_axis(self):
        v, f = box_mesh([0.1, 0.1, 0.1])
        off = np.array([0.5, -0.2, 0.1])
        m, com, I = mesh_volume_com_inertia(v + off, f)
        m0, _, I0 = mesh_volume_com_inertia(v, f)
        np.testing.assert_allclose(com, off, rtol=1e-9)
        np.testing.assert_allclose(I, I0, rtol=1e-9, atol=1e-12)  # inertia about COM is shift-invariant

    def test_stl_obj_roundtrip(self, tmp_path):
        v, f = box_mesh([0.1, 0.2, 0.3])
        save_obj(str(tmp_path / "b.obj"), v, f)
        save_stl(str(tmp_path / "b.stl"), v, f)
        for name in ("b.obj", "b.stl"):
            v2, f2 = load_mesh(str(tmp_path / name))
            m2, _, _ = mesh_volume_com_inertia(v2, f2)
            assert abs(m2 - 48.0) < 1e-3

    def test_hull_decimation_and_planes(self):
        pts = np.random.RandomState(0).randn(500, 3)
        hv, hn, hb = convex_hull(pts)
        assert (hv @ hn.T - hb[None, :] < 1e-9).all()  # verts satisfy planes
        hv2, _, _ = convex_hull(pts, max_verts=16)
        assert hv2.shape[0] <= 16

    def test_shape_inertia_facility(self):
        """Shape::computeInertia parity for every finite shape type."""
        from diffdart_tpu.dynamics.shapes import shape_mass_properties

        # sphere vs mesh-sphere would need a fine mesh; check closed forms
        m, _, I = shape_mass_properties(GeomType.SPHERE, (0.2, 0, 0), density=500.0)
        m_ref = 500 * 4 / 3 * np.pi * 0.2**3
        np.testing.assert_allclose(m, m_ref, rtol=1e-12)
        np.testing.assert_allclose(I, 0.4 * m_ref * 0.04 * np.eye(3), rtol=1e-12)
        # capsule ~ cylinder mesh + caps: compare against a fine convex mesh
        mc, _, Ic = shape_mass_properties(GeomType.CYLINDER, (0.1, 0.3, 0))
        v, f = cylinder_mesh(0.1, 0.3, n=128)
        mm, _, Im = mesh_volume_com_inertia(v, f)
        np.testing.assert_allclose(mc, mm, rtol=2e-3)
        np.testing.assert_allclose(Ic, Im, rtol=4e-3, atol=1e-8)
        # convex: box mesh == box closed form
        vb, fb = box_mesh([0.1, 0.2, 0.3])
        mv, _, Iv = shape_mass_properties(GeomType.CONVEX, (0, 0, 0), verts=vb, faces=fb)
        mb, _, Ib = shape_mass_properties(GeomType.BOX, (0.1, 0.2, 0.3))
        np.testing.assert_allclose(mv, mb, rtol=1e-9)
        np.testing.assert_allclose(Iv, Ib, rtol=1e-9, atol=1e-12)
        # convex without faces (hull built internally)
        mv2, _, Iv2 = shape_mass_properties(GeomType.CONVEX, (0, 0, 0), verts=vb)
        np.testing.assert_allclose(mv2, mb, rtol=1e-9)
        np.testing.assert_allclose(Iv2, Ib, rtol=1e-9, atol=1e-12)


def _free_body_with(geom_adder, dt=2e-3, drop_z=0.3, inertia=0.01):
    b = ModelBuilder(dt=dt)
    b.add_body(parent=-1, jtype=JointType.FREE, mass=1.0, inertia=np.eye(3) * inertia)
    b.add_geom(-1, GeomType.PLANE)
    geom_adder(b)
    m = b.finalize()
    s = make_state(m, q=m.neutral_q().at[6].set(drop_z))
    return m, s


class TestConvexNarrowphase:
    def test_convex_cube_rests_at_half_extent(self):
        v, _ = box_mesh([0.1, 0.1, 0.1])
        m, s = _free_body_with(lambda b: b.add_geom(0, GeomType.CONVEX, verts=v))
        final, _ = jax.jit(rollout)(m, s, jnp.zeros((400, m.nv)))
        assert abs(float(final.q[6]) - 0.1) < 5e-3

    def test_convex_contact_gradient_fd_twin(self):
        """d(final pose)/d(initial lateral velocity) through a convex-plane
        contact matches finite differences."""
        v, _ = box_mesh([0.1, 0.1, 0.1])
        m, s = _free_body_with(lambda b: b.add_geom(0, GeomType.CONVEX, verts=v), drop_z=0.12)

        def loss(vx):
            s2 = s.replace(v=s.v.at[3].set(vx))
            fin, _ = rollout(m, s2, jnp.zeros((60, m.nv)))
            return jnp.sum(fin.q[4:7] ** 2)

        g = float(jax.grad(loss)(0.4))
        eps = 1e-6
        fd = float((loss(0.4 + eps) - loss(0.4 - eps)) / (2 * eps))
        assert np.isfinite(g)
        np.testing.assert_allclose(g, fd, rtol=2e-4, atol=1e-9)

    def test_sphere_on_convex_slab(self):
        m, s = _free_body_with(
            lambda b: (
                b.add_geom(-1, GeomType.CONVEX, verts=box_mesh([0.5, 0.5, 0.1])[0]),
                b.add_geom(0, GeomType.SPHERE, size=(0.05, 0, 0)),
            ),
            drop_z=0.5,
            inertia=0.004,
        )
        final, _ = jax.jit(rollout)(m, s, jnp.zeros((400, m.nv)))
        assert abs(float(final.q[6]) - 0.15) < 5e-3

    def test_convex_on_convex_prism(self):
        m, s = _free_body_with(
            lambda b: (
                b.add_geom(-1, GeomType.CONVEX, verts=box_mesh([0.5, 0.5, 0.1])[0]),
                b.add_geom(0, GeomType.CONVEX, verts=cylinder_mesh(0.08, 0.1, n=10)[0]),
            ),
            drop_z=0.4,
        )
        final, _ = jax.jit(rollout)(m, s, jnp.zeros((500, m.nv)))
        assert abs(float(final.q[6]) - 0.2) < 1e-2

    def test_ellipsoid_plane_rest(self):
        m, s = _free_body_with(
            lambda b: b.add_geom(0, GeomType.ELLIPSOID, size=(0.1, 0.15, 0.2)), drop_z=0.4
        )
        final, _ = jax.jit(rollout)(m, s, jnp.zeros((400, m.nv)))
        assert abs(float(final.q[6]) - 0.2) < 8e-3

    def test_sphere_ellipsoid_contact(self):
        """Sphere dropped onto a world ellipsoid comes to rest at
        r_sphere + c_ellipsoid on the top axis."""
        m, s = _free_body_with(
            lambda b: (
                b.add_geom(-1, GeomType.ELLIPSOID, size=(0.3, 0.3, 0.15)),
                b.add_geom(0, GeomType.SPHERE, size=(0.05, 0, 0)),
            ),
            drop_z=0.35,
            inertia=0.004,
        )
        final, _ = jax.jit(rollout)(m, s, jnp.zeros((500, m.nv)))
        assert abs(float(final.q[6]) - 0.2) < 1e-2


URDF_MESH = """
<robot name="meshbot">
  <link name="base">
    <collision><geometry><mesh filename="{mesh}"/></geometry></collision>
  </link>
</robot>
"""


class TestUrdfMesh:
    def test_mesh_collision_loaded_as_hull(self, tmp_path):
        v, f = box_mesh([0.1, 0.2, 0.05])
        save_stl(str(tmp_path / "part.stl"), v, f)
        urdf = tmp_path / "bot.urdf"
        urdf.write_text(URDF_MESH.format(mesh="part.stl"))
        from diffdart_tpu.io import load_urdf_into_builder

        b = ModelBuilder()
        load_urdf_into_builder(b, str(urdf))
        m = b.finalize()
        assert m.geom_type[0] == GeomType.CONVEX
        assert m.hull_vcounts[0] == 8  # true box corners, not a fabricated sphere
        np.testing.assert_allclose(
            np.sort(np.asarray(m.hull_verts[0][:, 2])), np.sort(np.tile([-0.05, 0.05], 4)), atol=1e-9
        )
        # no <inertial>: mass derived from the mesh (Shape::computeInertia)
        m_ref = 1000 * 8 * 0.1 * 0.2 * 0.05
        np.testing.assert_allclose(float(m.mass[0]), m_ref, rtol=1e-6)

    def test_skip_meshes_actually_skips(self, tmp_path):
        v, f = box_mesh([0.1, 0.1, 0.1])
        save_stl(str(tmp_path / "part.stl"), v, f)
        urdf = tmp_path / "bot.urdf"
        urdf.write_text(URDF_MESH.format(mesh="part.stl"))
        from diffdart_tpu.io import load_urdf_into_builder

        b = ModelBuilder()
        load_urdf_into_builder(b, str(urdf), skip_meshes=True)
        assert len(b.geoms) == 0  # round-1 bug: a bogus sphere was injected

    def test_missing_mesh_raises(self, tmp_path):
        urdf = tmp_path / "bot.urdf"
        urdf.write_text(URDF_MESH.format(mesh="nope.stl"))
        from diffdart_tpu.io import load_urdf_into_builder

        b = ModelBuilder()
        with pytest.raises(FileNotFoundError, match="nope.stl"):
            load_urdf_into_builder(b, str(urdf))


class TestAtlasAsset:
    def test_flagship_loads_from_urdf(self):
        from diffdart_tpu.models.humanoid import ATLAS_URDF, humanoid

        assert os.path.exists(ATLAS_URDF)
        m = humanoid()
        assert m.nv == 30
        assert 70.0 < float(jnp.sum(m.mass)) < 95.0
        # mesh collision geometry made it through (pelvis, torso, 2 feet)
        n_convex = sum(1 for t in m.geom_type if t == GeomType.CONVEX)
        assert n_convex == 4
