from diffdart_tpu.io.urdf import load_urdf_into_builder, parse_urdf  # noqa: F401
from diffdart_tpu.io.skel import load_skel_into_builder  # noqa: F401


def load_into_builder(builder, path: str, **kw):
    """Dispatch by extension (UniversalLoader parity — dart/utils)."""
    p = str(path)
    if p.endswith(".urdf") or p.endswith(".xml"):
        return load_urdf_into_builder(builder, p, **kw)
    if p.endswith(".skel"):
        return load_skel_into_builder(builder, p, **kw)
    raise ValueError(f"unsupported scene format: {path}")
