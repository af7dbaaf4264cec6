"""Atlas-class humanoid: 30-DOF skeleton with full contact.

BASELINE.json config 5: 'Atlas humanoid: ~30-DOF skeleton from URDF, full
contact solve + per-step Jacobians'. Built programmatically with Atlas-like
topology and mass distribution (~80 kg); a URDF round-trip of the same
structure is exercised in tests/test_io.py.

DOF layout (nv = 30):
  free root (6) | back z,y,x (3) | neck y (1) |
  per leg: hip z,x,y + knee y + ankle y,x (6 x 2) |
  per arm: shoulder z,x + elbow y + wrist y (4 x 2)
"""
from __future__ import annotations

import numpy as np

from diffdart_tpu.dynamics.model import GeomType, JointType, Model, ModelBuilder


def _box_inertia(m, hx, hy, hz):
    return np.diag([m * (hy**2 + hz**2) / 3, m * (hx**2 + hz**2) / 3, m * (hx**2 + hy**2) / 3])


def _capsule_inertia(m, r, hl):
    L = 2 * hl
    i = m * (3 * r**2 + L**2) / 12.0
    return np.diag([i, i, 0.5 * m * r**2])


def humanoid(dt=2e-3) -> Model:
    b = ModelBuilder(dt=dt)
    b.add_geom(-1, GeomType.PLANE, friction=0.9)

    pelvis = b.add_body(
        parent=-1, jtype=JointType.FREE, mass=12.0, com=(0, 0, 0),
        inertia=_box_inertia(12.0, 0.12, 0.15, 0.1), name="pelvis",
    )
    b.add_geom(pelvis, GeomType.BOX, size=(0.12, 0.15, 0.1), friction=0.9)

    def rev(parent, name, axis, X_pos, mass=0.5, com=(0, 0, 0), inertia=None,
            lo=-1.5, hi=1.5, damping=0.5, geom=None):
        idx = b.add_body(
            parent=parent, jtype=JointType.REVOLUTE, axis=axis, X_pos=X_pos,
            mass=mass, com=com, inertia=inertia if inertia is not None else np.eye(3) * 2e-3,
            damping=damping, q_lo=lo, q_hi=hi, name=name,
        )
        if geom is not None:
            b.add_geom(idx, *geom)
        return idx

    # --- back (3 dof) + head ---
    bk1 = rev(pelvis, "back_z", (0, 0, 1), (0, 0, 0.12), mass=1.0, lo=-0.7, hi=0.7)
    bk2 = rev(bk1, "back_y", (0, 1, 0), (0, 0, 0), mass=1.0, lo=-0.5, hi=0.8)
    torso = rev(bk2, "back_x", (1, 0, 0), (0, 0, 0), mass=25.0, com=(0, 0, 0.2),
                inertia=_box_inertia(25.0, 0.15, 0.18, 0.25), lo=-0.5, hi=0.5,
                geom=(GeomType.BOX, (0.15, 0.18, 0.23), np.eye(3), (0, 0, 0.2), 0.9, 0.0))
    head = rev(torso, "neck_y", (0, 1, 0), (0, 0, 0.45), mass=4.0, com=(0, 0, 0.1),
               inertia=np.eye(3) * 0.02, lo=-0.6, hi=0.6,
               geom=(GeomType.SPHERE, (0.11, 0, 0), np.eye(3), (0, 0, 0.1), 0.9, 0.0))

    # --- legs ---
    def leg(side, sy):
        hip1 = rev(pelvis, f"{side}_hip_z", (0, 0, 1), (0, sy * 0.1, -0.08),
                   mass=0.8, lo=-0.6, hi=0.6, damping=2.0)
        hip2 = rev(hip1, f"{side}_hip_x", (1, 0, 0), (0, 0, 0),
                   mass=0.8, lo=-0.5, hi=0.5, damping=2.0)
        thigh = rev(hip2, f"{side}_hip_y", (0, 1, 0), (0, 0, 0), mass=7.5,
                    com=(0, 0, -0.21), inertia=_capsule_inertia(7.5, 0.07, 0.2),
                    lo=-1.8, hi=0.6, damping=2.0,
                    geom=(GeomType.CAPSULE, (0.07, 0.17, 0), np.eye(3), (0, 0, -0.21), 0.9, 0.0))
        shin = rev(thigh, f"{side}_knee_y", (0, 1, 0), (0, 0, -0.42), mass=4.0,
                   com=(0, 0, -0.2), inertia=_capsule_inertia(4.0, 0.055, 0.19),
                   lo=0.0, hi=2.3, damping=1.5,
                   geom=(GeomType.CAPSULE, (0.055, 0.16, 0), np.eye(3), (0, 0, -0.2), 0.9, 0.0))
        ank1 = rev(shin, f"{side}_ankle_y", (0, 1, 0), (0, 0, -0.41),
                   mass=0.5, lo=-1.0, hi=0.7, damping=1.0)
        foot = rev(ank1, f"{side}_ankle_x", (1, 0, 0), (0, 0, 0), mass=2.0,
                   com=(0.04, 0, -0.04), inertia=_box_inertia(2.0, 0.13, 0.065, 0.025),
                   lo=-0.5, hi=0.5, damping=1.0,
                   geom=(GeomType.BOX, (0.13, 0.065, 0.025), np.eye(3), (0.04, 0, -0.05), 0.9, 0.0))
        return foot

    leg("l", +1)
    leg("r", -1)

    # --- arms ---
    def arm(side, sy):
        sh1 = rev(torso, f"{side}_shoulder_z", (0, 0, 1), (0, sy * 0.25, 0.4),
                  mass=0.8, lo=-1.5, hi=1.5, damping=1.0)
        uarm = rev(sh1, f"{side}_shoulder_x", (1, 0, 0), (0, 0, 0), mass=3.5,
                   com=(0, sy * 0.02, -0.14), inertia=_capsule_inertia(3.5, 0.045, 0.13),
                   lo=-2.0, hi=0.8 if sy > 0 else 2.0, damping=1.0,
                   geom=(GeomType.CAPSULE, (0.045, 0.11, 0), np.eye(3), (0, 0, -0.14), 0.9, 0.0))
        larm = rev(uarm, f"{side}_elbow_y", (0, 1, 0), (0, 0, -0.3), mass=2.0,
                   com=(0, 0, -0.12), inertia=_capsule_inertia(2.0, 0.04, 0.12),
                   lo=-2.2, hi=0.0, damping=0.8,
                   geom=(GeomType.CAPSULE, (0.04, 0.1, 0), np.eye(3), (0, 0, -0.12), 0.9, 0.0))
        hand = rev(larm, f"{side}_wrist_y", (0, 1, 0), (0, 0, -0.26), mass=0.6,
                   com=(0, 0, -0.05), inertia=np.eye(3) * 1e-3, lo=-1.0, hi=1.0, damping=0.5)
        return hand

    arm("l", +1)
    arm("r", -1)

    m = b.finalize()
    # collisions: keep only ground vs (feet, pelvis, torso, head, hands/arms)
    ground = 0
    keep_geoms = []
    for g in range(m.ngeom):
        if m.geom_body[g] == -1:
            continue
        keep_geoms.append(g)
    keep = {(min(ground, g), max(ground, g)) for g in keep_geoms}
    pairs = tuple(p for p in m.col_pairs if p in keep)
    return m.replace(col_pairs=pairs)


def humanoid_init_q(model: Model):
    """Standing pose, feet on the ground (root z ~ 0.95)."""
    import jax.numpy as jnp

    q = np.zeros(model.nq)
    q[0] = 1.0  # quat w
    # hip offset 0.08 + thigh 0.42 + shin 0.41 + ankle-to-sole 0.075
    q[6] = 0.986  # root height: soles just touching the ground
    return jnp.asarray(q, model.mass.dtype)
