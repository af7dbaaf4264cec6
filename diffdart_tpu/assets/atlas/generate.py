"""Generator for the vendored Atlas-class URDF asset.

Produces atlas.urdf + meshes/*.obj (convex collision meshes for pelvis,
torso and feet; cylinders-as-capsules for limbs; sphere head). Run once at
asset-authoring time; the committed output is what models/humanoid.py loads.
Topology, masses and limits mirror the validated round-1 programmatic build
(BASELINE config 5: "~30-DOF skeleton from URDF").
"""
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
MESH_DIR = os.path.join(HERE, "meshes")


def chamfered_box(h, c=0.25):
    """Convex mesh: box with corners chamfered by fraction c of each
    half-extent (24 vertices) — a realistic 'cast part' convex shape."""
    h = np.asarray(h, float)
    pts = []
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                corner = np.array([sx, sy, sz]) * h
                for ax in range(3):
                    p = corner.copy()
                    p[ax] *= 1.0 - c
                    pts.append(p)
    return np.asarray(pts)


def foot_mesh():
    """Foot: flat box with a tapered toe (heel thicker than toe tip)."""
    hx, hy, hz = 0.13, 0.065, 0.025
    pts = []
    # heel block (rear 60%)
    for sx, x in ((-1, -hx), (1, 0.6 * hx)):
        for sy in (-1, 1):
            for sz in (-1, 1):
                pts.append([x, sy * hy, sz * hz])
    # toe tip: narrower and thinner
    for sy in (-1, 1):
        for sz in (-1, 1):
            pts.append([hx, sy * 0.8 * hy, sz * 0.6 * hz if sz > 0 else -hz])
    return np.asarray(pts)


def hull_obj(path, pts):
    from scipy.spatial import ConvexHull

    from diffdart_tpu.io.mesh import save_obj

    hull = ConvexHull(pts)
    v = hull.points[hull.vertices]
    hull2 = ConvexHull(v)
    f = hull2.simplices.astype(np.int32)
    # outward winding
    centroid = v.mean(axis=0)
    tri = v[f]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    flip = np.einsum("ij,ij->i", n, tri[:, 0] - centroid) < 0
    f[flip] = f[flip][:, [0, 2, 1]]
    save_obj(path, v, f)


def I_box(m, hx, hy, hz):
    return np.diag([m * (hy**2 + hz**2) / 3, m * (hx**2 + hz**2) / 3, m * (hx**2 + hy**2) / 3])


def I_cap(m, r, hl):
    L = 2 * hl
    i = m * (3 * r**2 + L**2) / 12.0
    return np.diag([i, i, 0.5 * m * r**2])


def _fmt_inertia(I):
    return (
        f'ixx="{I[0,0]:.6g}" iyy="{I[1,1]:.6g}" izz="{I[2,2]:.6g}" '
        f'ixy="{I[0,1]:.6g}" ixz="{I[0,2]:.6g}" iyz="{I[1,2]:.6g}"'
    )


def link(name, mass, com, I, collision=""):
    com_s = f"{com[0]} {com[1]} {com[2]}"
    return f"""  <link name="{name}">
    <inertial>
      <origin xyz="{com_s}"/>
      <mass value="{mass}"/>
      <inertia {_fmt_inertia(I)}/>
    </inertial>
{collision}  </link>
"""


def col_mesh(fname, xyz="0 0 0"):
    return f"""    <collision>
      <origin xyz="{xyz}"/>
      <geometry><mesh filename="meshes/{fname}"/></geometry>
    </collision>
"""


def col_cyl(r, length, xyz="0 0 0"):
    return f"""    <collision>
      <origin xyz="{xyz}"/>
      <geometry><cylinder radius="{r}" length="{length}"/></geometry>
    </collision>
"""


def col_sphere(r, xyz="0 0 0"):
    return f"""    <collision>
      <origin xyz="{xyz}"/>
      <geometry><sphere radius="{r}"/></geometry>
    </collision>
"""


def joint(name, parent, child, axis, xyz, lo, hi, damping):
    return f"""  <joint name="{name}" type="revolute">
    <parent link="{parent}"/>
    <child link="{child}"/>
    <origin xyz="{xyz[0]} {xyz[1]} {xyz[2]}"/>
    <axis xyz="{axis[0]} {axis[1]} {axis[2]}"/>
    <limit lower="{lo}" upper="{hi}" effort="300" velocity="12"/>
    <dynamics damping="{damping}"/>
  </joint>
"""


def main():
    os.makedirs(MESH_DIR, exist_ok=True)
    hull_obj(os.path.join(MESH_DIR, "pelvis.obj"), chamfered_box([0.12, 0.15, 0.1]))
    hull_obj(os.path.join(MESH_DIR, "torso.obj"), chamfered_box([0.15, 0.18, 0.23]))
    hull_obj(os.path.join(MESH_DIR, "foot.obj"), foot_mesh())

    L, J = [], []
    tiny = np.eye(3) * 2e-3

    L.append(link("pelvis", 12.0, (0, 0, 0), I_box(12.0, 0.12, 0.15, 0.1), col_mesh("pelvis.obj")))
    # back chain + head
    L.append(link("ltorso", 1.0, (0, 0, 0), tiny))
    J.append(joint("back_bkz", "pelvis", "ltorso", (0, 0, 1), (0, 0, 0.12), -0.7, 0.7, 0.5))
    L.append(link("mtorso", 1.0, (0, 0, 0), tiny))
    J.append(joint("back_bky", "ltorso", "mtorso", (0, 1, 0), (0, 0, 0), -0.5, 0.8, 0.5))
    L.append(link("utorso", 25.0, (0, 0, 0.2), I_box(25.0, 0.15, 0.18, 0.25), col_mesh("torso.obj", "0 0 0.2")))
    J.append(joint("back_bkx", "mtorso", "utorso", (1, 0, 0), (0, 0, 0), -0.5, 0.5, 0.5))
    L.append(link("head", 4.0, (0, 0, 0.1), np.eye(3) * 0.02, col_sphere(0.11, "0 0 0.1")))
    J.append(joint("neck_ry", "utorso", "head", (0, 1, 0), (0, 0, 0.45), -0.6, 0.6, 0.5))

    for side, sy in (("l", 1.0), ("r", -1.0)):
        # leg
        L.append(link(f"{side}_uglut", 0.8, (0, 0, 0), tiny))
        J.append(joint(f"{side}_leg_hpz", "pelvis", f"{side}_uglut", (0, 0, 1), (0, sy * 0.1, -0.08), -0.6, 0.6, 2.0))
        L.append(link(f"{side}_lglut", 0.8, (0, 0, 0), tiny))
        J.append(joint(f"{side}_leg_hpx", f"{side}_uglut", f"{side}_lglut", (1, 0, 0), (0, 0, 0), -0.5, 0.5, 2.0))
        L.append(link(f"{side}_uleg", 7.5, (0, 0, -0.21), I_cap(7.5, 0.07, 0.2),
                      col_cyl(0.07, 0.48, "0 0 -0.21")))
        J.append(joint(f"{side}_leg_hpy", f"{side}_lglut", f"{side}_uleg", (0, 1, 0), (0, 0, 0), -1.8, 0.6, 2.0))
        L.append(link(f"{side}_lleg", 4.0, (0, 0, -0.2), I_cap(4.0, 0.055, 0.19),
                      col_cyl(0.055, 0.43, "0 0 -0.2")))
        J.append(joint(f"{side}_leg_kny", f"{side}_uleg", f"{side}_lleg", (0, 1, 0), (0, 0, -0.42), 0.0, 2.3, 1.5))
        L.append(link(f"{side}_talus", 0.5, (0, 0, 0), tiny))
        J.append(joint(f"{side}_leg_aky", f"{side}_lleg", f"{side}_talus", (0, 1, 0), (0, 0, -0.41), -1.0, 0.7, 1.0))
        L.append(link(f"{side}_foot", 2.0, (0.04, 0, -0.04), I_box(2.0, 0.13, 0.065, 0.025),
                      col_mesh("foot.obj", "0.04 0 -0.05")))
        J.append(joint(f"{side}_leg_akx", f"{side}_talus", f"{side}_foot", (1, 0, 0), (0, 0, 0), -0.5, 0.5, 1.0))
        # arm
        L.append(link(f"{side}_clav", 0.8, (0, 0, 0), tiny))
        J.append(joint(f"{side}_arm_shz", "utorso", f"{side}_clav", (0, 0, 1), (0, sy * 0.25, 0.4), -1.5, 1.5, 1.0))
        hi_shx = 0.8 if sy > 0 else 2.0
        L.append(link(f"{side}_uarm", 3.5, (0, sy * 0.02, -0.14), I_cap(3.5, 0.045, 0.13),
                      col_cyl(0.045, 0.31, "0 0 -0.14")))
        J.append(joint(f"{side}_arm_shx", f"{side}_clav", f"{side}_uarm", (1, 0, 0), (0, 0, 0), -2.0, hi_shx, 1.0))
        L.append(link(f"{side}_larm", 2.0, (0, 0, -0.12), I_cap(2.0, 0.04, 0.12),
                      col_cyl(0.04, 0.28, "0 0 -0.12")))
        J.append(joint(f"{side}_arm_ely", f"{side}_uarm", f"{side}_larm", (0, 1, 0), (0, 0, -0.3), -2.2, 0.0, 0.8))
        L.append(link(f"{side}_hand", 0.6, (0, 0, -0.05), np.eye(3) * 1e-3))
        J.append(joint(f"{side}_arm_wry", f"{side}_larm", f"{side}_hand", (0, 1, 0), (0, 0, -0.26), -1.0, 1.0, 0.5))

    urdf = '<?xml version="1.0"?>\n<robot name="atlas_class_humanoid">\n' + "".join(L) + "".join(J) + "</robot>\n"
    with open(os.path.join(HERE, "atlas.urdf"), "w") as f:
        f.write(urdf)
    print("wrote", os.path.join(HERE, "atlas.urdf"), "and", MESH_DIR)


if __name__ == "__main__":
    main()
