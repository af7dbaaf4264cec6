from diffdart_tpu.io.urdf import load_urdf_into_builder, parse_urdf  # noqa: F401
from diffdart_tpu.io.skel import load_skel_into_builder  # noqa: F401
from diffdart_tpu.io.mjcf import load_mjcf_into_builder  # noqa: F401
from diffdart_tpu.io.sdf import load_sdf_into_builder  # noqa: F401
from diffdart_tpu.io.vsk import load_vsk_into_builder, parse_vsk  # noqa: F401


def load_into_builder(builder, path: str, **kw):
    """Dispatch by extension / root tag (UniversalLoader parity — dart/utils)."""
    import os

    p = str(path)
    if p.endswith(".urdf"):
        return load_urdf_into_builder(builder, p, **kw)
    if p.endswith(".skel"):
        return load_skel_into_builder(builder, p, **kw)
    if p.endswith(".vsk"):
        return load_vsk_into_builder(builder, p, **kw)
    if p.endswith(".sdf") or p.endswith(".world"):
        return load_sdf_into_builder(builder, p, **kw)
    if p.endswith(".xml") or p.strip().startswith("<"):
        # sniff the root tag: <robot> = URDF, <mujoco> = MJCF, <world>/<skel> = SKEL
        text = open(p).read() if os.path.exists(p) else p
        head = text.lstrip()[:200]
        if "<robot" in head:
            return load_urdf_into_builder(builder, p, **kw)
        if "<mujoco" in head:
            return load_mjcf_into_builder(builder, p, **kw)
        if "<world" in head or "<skel" in head:
            return load_skel_into_builder(builder, p, **kw)
    raise ValueError(f"unsupported scene format: {path}")
