"""VSK (Vicon mocap skeleton) parser — utils::VskParser parity."""
import jax.numpy as jnp
import numpy as np

from diffdart_tpu.dynamics.model import JointType, ModelBuilder
from diffdart_tpu.io import load_vsk_into_builder, parse_vsk

VSK = """
<KinematicModel>
  <Parameters>
    <Parameter NAME="THIGH_LEN" VALUE="400"/>
    <Parameter NAME="SHIN_LEN" VALUE="380"/>
  </Parameters>
  <Skeleton>
    <Segment NAME="pelvis" BOUNDS="100 150 80">
      <JointFree/>
      <Segment NAME="thigh" POSITION="0 100 -50">
        <JointBall POSITION="0 100 -50"/>
        <Segment NAME="shin" POSITION="0 0 THIGH_LEN">
          <JointHinge AXIS="0 1 0" POSITION="0 0 THIGH_LEN"/>
          <Segment NAME="foot" POSITION="0 0 SHIN_LEN">
            <JointHardDof/>
          </Segment>
        </Segment>
      </Segment>
    </Segment>
  </Skeleton>
  <MarkerSet>
    <Markers>
      <Marker NAME="LKNE" SEGMENT="thigh" POSITION="0 0 THIGH_LEN"/>
      <Marker NAME="LANK" SEGMENT="shin" POSITION="0 0 SHIN_LEN"/>
    </Markers>
  </MarkerSet>
</KinematicModel>
"""


class TestVsk:
    def test_parse_structure_and_units(self):
        vsk = parse_vsk(VSK)
        assert [s["name"] for s in vsk["segments"]] == ["pelvis", "thigh", "shin", "foot"]
        types = {s["name"]: s["jtype"] for s in vsk["segments"]}
        assert types["pelvis"] == JointType.FREE
        assert types["thigh"] == JointType.BALL
        assert types["shin"] == JointType.REVOLUTE
        assert types["foot"] == JointType.WELD
        shin = next(s for s in vsk["segments"] if s["name"] == "shin")
        np.testing.assert_allclose(shin["offset"], [0, 0, 0.4])  # mm -> m + param
        np.testing.assert_allclose(shin["axis"], [0, 1, 0])
        assert vsk["markers"]["LKNE"][0] == "thigh"
        np.testing.assert_allclose(vsk["markers"]["LANK"][1], [0, 0, 0.38])

    def test_load_into_builder_and_fk(self):
        from diffdart_tpu.dynamics.kinematics import fk

        b = ModelBuilder()
        out = load_vsk_into_builder(b, VSK)
        m = b.finalize()
        assert m.nbody == 4
        assert m.nv == 6 + 3 + 1 + 0
        # marker world position at neutral pose: chain of offsets
        R, p = fk(m, m.neutral_q())
        body, off = out["markers"]["LANK"]
        w = np.asarray(R[body]) @ np.asarray(off) + np.asarray(p[body])
        np.testing.assert_allclose(w, [0, 0.1, -0.05 + 0.4 + 0.38], atol=1e-9)
