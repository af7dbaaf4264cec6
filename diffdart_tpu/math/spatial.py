"""Spatial (6-D) vector algebra in Plucker coordinates, batched.

Capability parity with the reference's dart/math (anchors: math::AdT,
math::dAdT, math::transformInertia — see SURVEY.md §2.1), redesigned as
batched jnp ops over (..., 6) arrays.

Conventions:
  * ANGULAR-FIRST: motion V = (omega, v), force F = (n, f).
  * A transform (R, p) maps body coordinates to world coordinates.
  * The 6x6 motion transform is X = [[R, 0], [skew(p) @ R, R]] so that
    V_world = X @ V_body; forces map with X^{-T} = [[R, skew(p) @ R], [0, R]].
  * World-frame quantities are Plucker coordinates at the WORLD ORIGIN:
    a body's linear velocity at a world point x is  V[3:] + cross(V[:3], x).
"""
from __future__ import annotations

import jax.numpy as jnp

from diffdart_tpu.math.lie import skew


def motion_cross(v, m):
    """crm(v) @ m: spatial cross product of motion vectors (Lie bracket ad_v).

    v, m: (..., 6) motion vectors -> (..., 6).
    """
    w, u = v[..., :3], v[..., 3:]
    mw, mu = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, mu) + jnp.cross(u, mw)], axis=-1
    )


def force_cross(v, f):
    """crf(v) @ f = -crm(v)^T @ f: motion vector v acting on force vector f."""
    w, u = v[..., :3], v[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(u, fl), jnp.cross(w, fl)], axis=-1
    )


def transform_motion(R, p, V):
    """V_world = X(R, p) @ V_body for motion vectors (the Adjoint map AdT)."""
    w, u = V[..., :3], V[..., 3:]
    Rw = jnp.einsum("...ij,...j->...i", R, w)
    Ru = jnp.einsum("...ij,...j->...i", R, u)
    return jnp.concatenate([Rw, jnp.cross(p, Rw) + Ru], axis=-1)


def inv_transform_motion(R, p, V):
    """V_body = X(R, p)^{-1} @ V_world."""
    w, u = V[..., :3], V[..., 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    wb = jnp.einsum("...ij,...j->...i", Rt, w)
    ub = jnp.einsum("...ij,...j->...i", Rt, u - jnp.cross(p, w))
    return jnp.concatenate([wb, ub], axis=-1)


def transform_force(R, p, F):
    """F_world = X(R, p)^{-T} @ F_body for force vectors (the dual map dAdInvT)."""
    n, f = F[..., :3], F[..., 3:]
    Rf = jnp.einsum("...ij,...j->...i", R, f)
    Rn = jnp.einsum("...ij,...j->...i", R, n)
    return jnp.concatenate([Rn + jnp.cross(p, Rf), Rf], axis=-1)


def X_motion(R, p):
    """Dense (..., 6, 6) motion transform matrix [[R, 0], [skew(p) R, R]]."""
    pR = skew(p) @ R
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, Z], axis=-1)
    bot = jnp.concatenate([pR, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def spatial_inertia(mass, com, inertia):
    """Body-frame 6x6 spatial inertia about the body origin (angular-first).

    mass: (...,), com: (..., 3) COM offset in body frame,
    inertia: (..., 3, 3) rotational inertia about the COM.
    Parity anchor: dart/dynamics/Inertia.cpp (Inertia::getSpatialTensor).
    """
    c = skew(com)
    ct = jnp.swapaxes(c, -1, -2)
    m = mass[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=c.dtype), c.shape)
    top = jnp.concatenate([inertia + m * (c @ ct), m * c], axis=-1)
    bot = jnp.concatenate([m * ct, m * eye], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def transform_inertia(R, p, I_body):
    """World-origin Plucker coordinates of a body-frame spatial inertia:
    I_world = X^{-T} I_body X^{-1}.
    Parity anchor: math::transformInertia (dart/math/Geometry.cpp)."""
    X = X_motion(R, p)
    Xinv = _X_motion_inverse(R, p)
    return jnp.swapaxes(Xinv, -1, -2) @ I_body @ Xinv


def _X_motion_inverse(R, p):
    """X(R, p)^{-1} = [[R^T, 0], [-R^T skew(p), R^T]]."""
    Rt = jnp.swapaxes(R, -1, -2)
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([Rt, Z], axis=-1)
    bot = jnp.concatenate([-Rt @ skew(p), Rt], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
