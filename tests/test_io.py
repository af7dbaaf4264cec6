"""URDF/.skel loader tests, with MuJoCo as the cross-engine dynamics oracle
(SURVEY.md §4 rebuild plan #2: DART itself is unavailable, MuJoCo CPU is the
independent reference for parser+dynamics round trips)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdart_tpu.dynamics.dynamics import forward_dynamics, mass_matrix
from diffdart_tpu.dynamics.kinematics import fk
from diffdart_tpu.dynamics.model import JointType, ModelBuilder
from diffdart_tpu.io import load_urdf_into_builder, load_skel_into_builder

URDF_2LINK = """
<robot name="twolink">
  <link name="base">
    <inertial><mass value="2.0"/><origin xyz="0.1 0 0"/>
      <inertia ixx="0.02" iyy="0.03" izz="0.04" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><geometry><box size="0.2 0.1 0.1"/></geometry></collision>
  </link>
  <link name="link1">
    <inertial><mass value="1.0"/><origin xyz="0.15 0 0"/>
      <inertia ixx="0.01" iyy="0.02" izz="0.02" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0.15 0 0"/><geometry><sphere radius="0.05"/></geometry></collision>
  </link>
  <link name="link2">
    <inertial><mass value="0.5"/><origin xyz="0.1 0 0"/>
      <inertia ixx="0.005" iyy="0.008" izz="0.008" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0.1 0 0" rpy="0 1.5707963 0"/><geometry><cylinder radius="0.03" length="0.2"/></geometry></collision>
  </link>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="link1"/>
    <origin xyz="0.2 0 0.05" rpy="0 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-1.5" upper="1.5" effort="50" velocity="10"/>
    <dynamics damping="0.1"/>
  </joint>
  <joint name="j2" type="continuous">
    <parent link="link1"/><child link="link2"/>
    <origin xyz="0.3 0 0" rpy="0 0 0.5"/><axis xyz="0 0 1"/>
  </joint>
</robot>
"""

SKEL_PENDULUM = """
<world name="w">
  <physics><time_step>0.002</time_step><gravity>0 0 -9.81</gravity></physics>
  <skeleton name="pend">
    <body name="link0">
      <transformation>0 0 1 0 0 0</transformation>
      <inertia><mass>1.5</mass><offset>0.25 0 0</offset>
        <moment_of_inertia><ixx>0.01</ixx><iyy>0.03</iyy><izz>0.03</izz></moment_of_inertia></inertia>
      <collision_shape><transformation>0.25 0 0 0 0 0</transformation>
        <geometry><box><size>0.5 0.05 0.05</size></box></geometry></collision_shape>
    </body>
    <joint type="revolute" name="j0">
      <parent>world</parent><child>link0</child>
      <axis><xyz>0 1 0</xyz><limit><lower>-2.0</lower><upper>2.0</upper></limit></axis>
    </joint>
  </skeleton>
</world>
"""


class TestURDF:
    def _load(self, root_joint=JointType.WELD):
        b = ModelBuilder()
        load_urdf_into_builder(b, URDF_2LINK, root_joint=root_joint)
        return b.finalize()

    def test_topology(self):
        m = self._load()
        assert m.nbody == 3
        assert m.jtype[0] == JointType.WELD
        assert m.jtype[1] == JointType.REVOLUTE
        assert m.jtype[2] == JointType.REVOLUTE
        assert m.nv == 2
        np.testing.assert_allclose(np.asarray(m.mass), [2.0, 1.0, 0.5])
        # limits from <limit>
        assert float(m.q_lo[0]) == -1.5 and float(m.q_hi[0]) == 1.5
        assert float(m.damping[0]) == 0.1

    def test_fk_matches_mujoco(self):
        mujoco = pytest.importorskip("mujoco")
        m = self._load()
        MJCF = """
        <mujoco><option gravity="0 0 -9.81"/><worldbody>
          <body name="base">
            <inertial pos="0.1 0 0" mass="2.0" diaginertia="0.02 0.03 0.04"/>
            <body name="link1" pos="0.2 0 0.05">
              <joint name="j1" type="hinge" axis="0 1 0"/>
              <inertial pos="0.15 0 0" mass="1.0" diaginertia="0.01 0.02 0.02"/>
              <body name="link2" pos="0.3 0 0" euler="0 0 28.64788975654116">
                <joint name="j2" type="hinge" axis="0 0 1"/>
                <inertial pos="0.1 0 0" mass="0.5" diaginertia="0.005 0.008 0.008"/>
              </body>
            </body>
          </body>
        </worldbody></mujoco>
        """
        mj = mujoco.MjModel.from_xml_string(MJCF)
        dj = mujoco.MjData(mj)
        q = np.array([0.4, -0.7])
        dj.qpos[:] = q
        mujoco.mj_forward(mj, dj)
        R, p = fk(m, jnp.asarray(q))
        for name, bi in [("link1", 1), ("link2", 2)]:
            mb = mj.body(name)
            np.testing.assert_allclose(np.asarray(p[bi]), dj.xpos[mb.id], atol=1e-8)

    def test_dynamics_match_mujoco(self):
        mujoco = pytest.importorskip("mujoco")
        m = self._load()
        MJCF = """
        <mujoco><option gravity="0 0 -9.81"/><worldbody>
          <body name="base">
            <inertial pos="0.1 0 0" mass="2.0" diaginertia="0.02 0.03 0.04"/>
            <body name="link1" pos="0.2 0 0.05">
              <joint name="j1" type="hinge" axis="0 1 0" damping="0"/>
              <inertial pos="0.15 0 0" mass="1.0" diaginertia="0.01 0.02 0.02"/>
              <body name="link2" pos="0.3 0 0" euler="0 0 28.64788975654116">
                <joint name="j2" type="hinge" axis="0 0 1"/>
                <inertial pos="0.1 0 0" mass="0.5" diaginertia="0.005 0.008 0.008"/>
              </body>
            </body>
          </body>
        </worldbody></mujoco>
        """
        mj = mujoco.MjModel.from_xml_string(MJCF)
        dj = mujoco.MjData(mj)
        q = np.array([0.4, -0.7])
        v = np.array([1.0, -2.0])
        tau = np.array([0.5, 0.2])
        dj.qpos[:], dj.qvel[:], dj.ctrl = q, v, 0
        dj.qfrc_applied[:] = tau
        mujoco.mj_forward(mj, dj)
        # mass matrix
        Mmj = np.zeros((2, 2))
        mujoco.mj_fullM(mj, dj, Mmj)
        m0 = m.replace(damping=m.damping * 0.0)
        Mj = np.asarray(mass_matrix(m0, jnp.asarray(q)))
        np.testing.assert_allclose(Mj, Mmj, atol=1e-8)
        qdd = np.asarray(forward_dynamics(m0, jnp.asarray(q), jnp.asarray(v), jnp.asarray(tau)))
        np.testing.assert_allclose(qdd, dj.qacc, atol=1e-6)


MJCF_ANCHORED = """
<mujoco><option gravity="0 0 -9.81" timestep="0.002"/><worldbody>
  <geom type="plane" size="5 5 0.1"/>
  <body name="link1" pos="0.1 0 0.5">
    <joint name="j1" type="hinge" axis="0 1 0" pos="0 0 0.1" damping="0.2" armature="0.01"/>
    <inertial pos="0.2 0 0" mass="1.5" diaginertia="0.01 0.02 0.02"/>
    <geom type="capsule" size="0.04 0.15" pos="0.2 0 0"/>
    <body name="link2" pos="0.4 0 0">
      <joint name="j2" type="hinge" axis="0 0 1"/>
      <inertial pos="0.1 0 0" mass="0.7" diaginertia="0.005 0.006 0.006"/>
      <geom type="sphere" size="0.05" pos="0.1 0 0"/>
    </body>
  </body>
</worldbody></mujoco>"""


class TestMJCF:
    def test_matches_mujoco_including_anchors(self):
        """MJCF import reproduces MuJoCo's own dynamics exactly — including
        off-origin joint anchors, per-dof damping and armature."""
        mujoco = pytest.importorskip("mujoco")
        from diffdart_tpu.dynamics.kinematics import com_positions
        from diffdart_tpu.io.mjcf import load_mjcf_into_builder

        b = ModelBuilder()
        load_mjcf_into_builder(b, MJCF_ANCHORED)
        m = b.finalize()
        mj = mujoco.MjModel.from_xml_string(MJCF_ANCHORED)
        dj = mujoco.MjData(mj)
        q = np.array([0.4, -0.9])
        v = np.array([1.2, -0.5])
        tau = np.array([0.3, -0.2])
        dj.qpos[:], dj.qvel[:] = q, v
        dj.qfrc_applied[:] = tau
        mujoco.mj_forward(mj, dj)
        R, p = fk(m, jnp.asarray(q))
        coms = np.asarray(com_positions(m, R, p))
        np.testing.assert_allclose(coms, dj.xipos[1:], atol=1e-12)
        qdd = np.asarray(forward_dynamics(m, jnp.asarray(q), jnp.asarray(v), jnp.asarray(tau)))
        np.testing.assert_allclose(qdd, dj.qacc, atol=1e-7)


SDF_PENDULUM = """
<sdf version="1.7"><world name="w"><model name="pend">
  <link name="base">
    <pose>0 0 1 0 0 0</pose>
    <inertial><mass>2.0</mass><inertia><ixx>0.02</ixx><iyy>0.02</iyy><izz>0.02</izz></inertia></inertial>
    <collision name="c"><geometry><box><size>0.2 0.2 0.1</size></box></geometry></collision>
  </link>
  <link name="arm">
    <pose>0.3 0 1 0 0 0</pose>
    <inertial><mass>0.8</mass><pose>0.2 0 0 0 0 0</pose>
      <inertia><ixx>0.005</ixx><iyy>0.02</iyy><izz>0.02</izz></inertia></inertial>
    <collision name="c2"><geometry><cylinder><radius>0.03</radius><length>0.4</length></cylinder></geometry></collision>
  </link>
  <joint name="root" type="fixed"><parent>world</parent><child>base</child></joint>
  <joint name="j1" type="revolute">
    <parent>base</parent><child>arm</child>
    <axis><xyz>0 1 0</xyz><limit><lower>-1.2</lower><upper>1.2</upper></limit>
      <dynamics><damping>0.05</damping></dynamics></axis>
  </joint>
</model></world></sdf>
"""


class TestSDF:
    def test_load_and_simulate(self):
        from diffdart_tpu.dynamics.model import make_state
        from diffdart_tpu.io.sdf import load_sdf_into_builder
        from diffdart_tpu.sim import step

        b = ModelBuilder()
        load_sdf_into_builder(b, SDF_PENDULUM)
        m = b.finalize()
        assert m.nbody == 2
        assert m.jtype[0] == JointType.WELD and m.jtype[1] == JointType.REVOLUTE
        np.testing.assert_allclose(np.asarray(m.mass), [2.0, 0.8])
        assert float(m.q_lo[0]) == -1.2 and float(m.damping[0]) == 0.05
        # base placed at z=1, arm offset +0.3 in x
        np.testing.assert_allclose(np.asarray(m.X_pos[0]), [0, 0, 1], atol=1e-12)
        np.testing.assert_allclose(np.asarray(m.X_pos[1]), [0.3, 0, 0], atol=1e-12)
        s = make_state(m)
        for _ in range(10):
            s = step(m, s)
        assert np.all(np.isfinite(np.asarray(s.q)))

    def test_static_model_surface_and_ellipsoid(self):
        """r5 subset widening: <static> models anchor geoms to the world;
        per-collision <surface> friction/restitution override the defaults;
        <ellipsoid> parses to GeomType.ELLIPSOID (SdfParser parity)."""
        from diffdart_tpu.dynamics.model import GeomType
        from diffdart_tpu.io.sdf import load_sdf_into_builder

        SDF = """
        <sdf version="1.9"><world name="w">
          <model name="ground"><static>true</static>
            <link name="g">
              <collision name="c">
                <geometry><plane><normal>0 0 1</normal></plane></geometry>
                <surface>
                  <friction><ode><mu>1.25</mu></ode></friction>
                  <bounce><restitution_coefficient>0.5</restitution_coefficient></bounce>
                </surface>
              </collision>
            </link>
          </model>
          <model name="egg">
            <link name="body">
              <pose>0 0 0.5 0 0 0</pose>
              <inertial><mass>1.0</mass>
                <inertia><ixx>0.01</ixx><iyy>0.01</iyy><izz>0.01</izz></inertia>
              </inertial>
              <collision name="e">
                <geometry><ellipsoid><radii>0.1 0.15 0.2</radii></ellipsoid></geometry>
              </collision>
            </link>
          </model>
        </world></sdf>"""
        b = ModelBuilder()
        load_sdf_into_builder(b, SDF)
        m = b.finalize()
        # one dynamic body (the static model contributes no bodies)
        assert m.nbody == 1 and m.jtype[0] == JointType.FREE
        gt = np.asarray(m.geom_type)
        gb = np.asarray(m.geom_body)
        plane = int(np.nonzero(gt == GeomType.PLANE)[0][0])
        ell = int(np.nonzero(gt == GeomType.ELLIPSOID)[0][0])
        assert gb[plane] == -1  # world-anchored
        np.testing.assert_allclose(float(m.geom_friction[plane]), 1.25)
        np.testing.assert_allclose(float(m.geom_restitution[plane]), 0.5)
        np.testing.assert_allclose(np.asarray(m.geom_size[ell]), [0.1, 0.15, 0.2])


class TestSkel:
    def test_load_pendulum(self):
        b = ModelBuilder()
        load_skel_into_builder(b, SKEL_PENDULUM)
        m = b.finalize()
        assert m.nbody == 1
        assert m.jtype[0] == JointType.REVOLUTE
        np.testing.assert_allclose(float(m.mass[0]), 1.5)
        np.testing.assert_allclose(float(b.dt), 0.002)
        # world placement z=1 becomes the tree transform
        np.testing.assert_allclose(np.asarray(m.X_pos[0]), [0, 0, 1], atol=1e-12)
        assert float(m.q_lo[0]) == -2.0

    def test_skel_dynamics_sane(self):
        from diffdart_tpu.dynamics.model import make_state
        from diffdart_tpu.sim import step

        b = ModelBuilder()
        load_skel_into_builder(b, SKEL_PENDULUM)
        m = b.finalize()
        s = make_state(m)
        for _ in range(10):
            s = step(m, s)
        assert np.all(np.isfinite(np.asarray(s.q)))
        # hanging rod swings down: q accelerates negative (com at +x, gravity -z)
        assert float(s.v[0]) != 0.0


URDF_MIMIC = """
<robot name="gripper">
  <link name="palm">
    <inertial><mass value="1.0"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <link name="finger_l">
    <inertial><mass value="0.2"/><origin xyz="0 0 0.05"/>
      <inertia ixx="0.001" iyy="0.001" izz="0.001" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <link name="finger_r">
    <inertial><mass value="0.2"/><origin xyz="0 0 0.05"/>
      <inertia ixx="0.001" iyy="0.001" izz="0.001" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <joint name="jl" type="prismatic">
    <parent link="palm"/><child link="finger_l"/>
    <origin xyz="0.05 0 0"/><axis xyz="1 0 0"/>
    <limit lower="0.0" upper="0.04"/>
  </joint>
  <joint name="jr" type="prismatic">
    <parent link="palm"/><child link="finger_r"/>
    <origin xyz="-0.05 0 0"/><axis xyz="-1 0 0"/>
    <limit lower="0.0" upper="0.04"/>
    <mimic joint="jl" multiplier="1.0" offset="0.0"/>
  </joint>
</robot>
"""


class TestURDFMimic:
    """URDF <mimic> -> bilateral LCP coupling rows (DartLoader::
    createDartJoint + Joint::setMimicJoint parity; r2 VERDICT missing #7)."""

    def _load(self):
        b = ModelBuilder(dt=2e-3, gravity=(0.0, 0.0, 0.0))
        load_urdf_into_builder(b, URDF_MIMIC, root_joint=JointType.WELD)
        return b.finalize()

    def test_parse_and_topology(self):
        m = self._load()
        # WELD root has no dofs: finger_l is dof 0, finger_r is dof 1
        assert m.mimic_pairs == ((1, 0),)
        np.testing.assert_allclose(np.asarray(m.mimic_mult), [1.0])
        np.testing.assert_allclose(np.asarray(m.mimic_offset), [0.0])

    def test_mimic_tracks_under_drive(self):
        """Drive only the mimicked finger; the mimicking finger must follow
        q_r = q_l through the coupling row (symmetric gripper close)."""
        from diffdart_tpu.dynamics.model import make_state
        from diffdart_tpu.sim import rollout

        m = self._load()
        s = make_state(m)
        T = 150
        taus = jnp.zeros((T, m.nv), m.mass.dtype).at[:, 0].set(0.4)
        final, traj = jax.jit(rollout)(m, s, taus)
        q = np.asarray(traj.q)
        assert float(q[-1, 0]) > 5e-3  # the driven finger moved
        np.testing.assert_allclose(q[:, 1], q[:, 0], atol=5e-4)

    def test_mimic_multiplier_offset(self):
        """Post-build coupling with multiplier/offset: q1 = 0.5 q0 + 0.01."""
        from diffdart_tpu.dynamics.model import add_mimic_constraint, make_state
        from diffdart_tpu.sim import rollout

        b = ModelBuilder(dt=2e-3, gravity=(0.0, 0.0, 0.0))
        load_urdf_into_builder(b, URDF_MIMIC, root_joint=JointType.WELD)
        m = b.finalize()
        m = m.replace(mimic_pairs=(), mimic_mult=m.mimic_mult[:0],
                      mimic_offset=m.mimic_offset[:0])
        m = add_mimic_constraint(m, 1, 0, multiplier=0.5, offset=0.01)
        s = make_state(m)
        T = 200
        taus = jnp.zeros((T, m.nv), m.mass.dtype).at[:, 0].set(0.3)
        final, traj = jax.jit(rollout)(m, s, taus)
        q = np.asarray(traj.q)
        # converges to the coupling manifold (starts off it: q=0 vs offset)
        err = np.abs(q[-1, 1] - (0.5 * q[-1, 0] + 0.01))
        assert err < 1e-3, err

    def test_mimic_only_model_takes_constrained_path(self):
        """A model whose ONLY constraint rows are mimic couplings (no
        contacts, no limits) must still route through the constrained step —
        regression for the step() dispatch guard."""
        from diffdart_tpu.dynamics.model import make_state
        from diffdart_tpu.sim import rollout

        b = ModelBuilder(dt=2e-3, gravity=(0.0, 0.0, 0.0))
        j0 = b.add_body(parent=-1, jtype=JointType.REVOLUTE, mass=0.5,
                        axis=(0, 0, 1))
        j1 = b.add_body(parent=-1, jtype=JointType.REVOLUTE, mass=0.5,
                        axis=(0, 0, 1), X_pos=(0.3, 0, 0))
        b.add_mimic(j1, j0, multiplier=-1.0)
        m = b.finalize()
        s = make_state(m)
        taus = jnp.zeros((100, m.nv), m.mass.dtype).at[:, 0].set(0.2)
        final, traj = jax.jit(rollout)(m, s, taus)
        q = np.asarray(traj.q)
        assert abs(q[-1, 0]) > 1e-3  # the driven joint moved
        np.testing.assert_allclose(q[:, 1], -q[:, 0], atol=1e-3)
