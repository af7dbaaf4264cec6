"""World-state wire protocol: model -> scene JSON, state -> frame JSON.

Capability parity with the reference's GUIWebsocketServer JSON protocol
(dart/server/GUIWebsocketServer.cpp anchors renderWorld/renderSkeleton/
createBox/createSphere — SURVEY.md §2.3): a static scene description (geom
types/sizes/colors) plus per-frame body transforms (position + quaternion),
consumed by the bundled canvas-3D client (viewer/client.py HTML)."""
from __future__ import annotations

import numpy as np

from diffdart_tpu.dynamics.kinematics import fk
from diffdart_tpu.dynamics.model import GeomType, Model
from diffdart_tpu.math.lie import mat_to_quat, tf_compose

_TYPE_NAMES = {
    GeomType.SPHERE: "sphere",
    GeomType.BOX: "box",
    GeomType.CAPSULE: "capsule",
    GeomType.PLANE: "plane",
    GeomType.CYLINDER: "cylinder",
    GeomType.ELLIPSOID: "ellipsoid",
    GeomType.CONVEX: "convex",
}

_PALETTE = ["#4c78a8", "#f58518", "#54a24b", "#e45756", "#72b7b2", "#eeca3b", "#b279a2"]


def scene_description(model: Model) -> dict:
    geoms = []
    for g in range(model.ngeom):
        body = model.geom_body[g]
        entry = dict(
            id=g,
            body=body,
            type=_TYPE_NAMES[model.geom_type[g]],
            size=np.asarray(model.geom_size[g]).tolist(),
            color=_PALETTE[(body + 1) % len(_PALETTE)] if body >= 0 else "#999999",
        )
        if model.geom_type[g] == GeomType.CONVEX:
            h = model.geom_hull[g]
            nvert = model.hull_vcounts[h]
            entry["verts"] = np.asarray(model.hull_verts[h][:nvert]).round(4).tolist()
        geoms.append(entry)
    return dict(kind="scene", nbody=model.nbody, geoms=geoms)


def state_frame(model: Model, q, t=0.0) -> dict:
    """One frame: world pose (pos + wxyz quat) per GEOM."""
    R, p = fk(model, q)
    poses = []
    for g in range(model.ngeom):
        body = model.geom_body[g]
        if body < 0:
            Rg, pg = np.asarray(model.geom_rot[g]), np.asarray(model.geom_pos[g])
        else:
            Rg, pg = tf_compose(R[body], p[body], model.geom_rot[g], model.geom_pos[g])
            Rg, pg = np.asarray(Rg), np.asarray(pg)
        quat = np.asarray(mat_to_quat(Rg))
        poses.append(dict(pos=pg.round(5).tolist(), quat=quat.round(5).tolist()))
    return dict(kind="frame", t=float(t), poses=poses)


def trajectory_frames(model: Model, qs, dt=None, stride=1) -> list[dict]:
    """Frames for a (T, nq) trajectory (decimated by stride)."""
    dt = float(model.dt) if dt is None else dt
    qs = np.asarray(qs)
    return [state_frame(model, qs[i], t=i * dt) for i in range(0, len(qs), stride)]
