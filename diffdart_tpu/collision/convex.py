"""Differentiable convex-hull narrowphase (the mesh-collision path).

Replaces the reference's FCL mesh backend
(dart/collision/fcl/FCLCollisionDetector.cpp) the TPU way (SURVEY.md §2.1
plan: "precomputed convex hulls"): meshes are reduced at load time to padded
vertex + face-plane buffers (io/mesh.py), and every pair function below is
fixed-size, branchless, vmappable and differentiable — masks instead of
control flow, so the jitted program is static.

Hull representation (local frame):
  verts: (V, 3) padded by repeating vertex 0 (duplicates never change
         supports / extrema); vmask: (V,) True for real vertices
  face_n / face_b: (F, 3), (F,) padded outward planes n·x <= b, padded by
         repeating face 0

Contact regimes (only depth > 0 matters — the LCP masks the rest):
  * hull vs plane: EXACT — top-k deepest vertices below the plane.
  * point/sphere vs hull: exact while the center is inside (max signed
    face distance); shallow outside contacts use the nearest-face
    approximation, exact over face interiors, conservative near edges.
  * hull vs hull: SAT over both hulls' face normals (exact depth for
    face-dominant contacts; edge-edge penetration depth is approximated by
    the best face axis) with a top-k vertex manifold.
"""
from __future__ import annotations

import jax.numpy as jnp

_BIG = 1e9


# ---------------------------------------------------------------------------
# small helpers
# ---------------------------------------------------------------------------

def _world_verts(R, p, verts):
    return verts @ R.T + p


def _topk_contacts(pos, depth, valid, k):
    """Select the k deepest valid candidates as fixed slots."""
    score = jnp.where(valid, depth, -_BIG)
    idx = jnp.argsort(-score)[:k]
    return pos[idx], depth[idx], valid[idx]


def box_as_hull(size, dtype):
    """An 8-vertex/6-face hull for a box half-extent triple — lets every
    hull pair function double as the exact box variant."""
    sx, sy, sz = size[0], size[1], size[2]
    sign = jnp.asarray(
        [[x, y, z] for x in (-1.0, 1.0) for y in (-1.0, 1.0) for z in (-1.0, 1.0)],
        dtype,
    )
    verts = sign * jnp.stack([sx, sy, sz])
    face_n = jnp.concatenate([jnp.eye(3, dtype=dtype), -jnp.eye(3, dtype=dtype)])
    face_b = jnp.concatenate([jnp.stack([sx, sy, sz]), jnp.stack([sx, sy, sz])])
    vmask = jnp.ones(8, bool)
    fmask = jnp.ones(6, bool)
    return verts, face_n, face_b, vmask, fmask


# ---------------------------------------------------------------------------
# pair functions
# ---------------------------------------------------------------------------

def convex_plane(Ra, pa, verts, vmask, Rb, pb, k=4):
    """A = hull, B = plane (normal = B z-axis). Exact: every hull vertex
    below the plane is a candidate; the k deepest become contact slots
    (box_plane's 8-corner analogue for arbitrary hulls)."""
    n = Rb[:, 2]
    w = _world_verts(Ra, pa, verts)  # (V, 3)
    depth = jnp.dot(pb, n) - w @ n  # >0 below the plane surface
    valid = (depth > 0) & vmask
    pos, depth, valid = _topk_contacts(w, depth, valid, k)
    normal = jnp.broadcast_to(n, (k, 3))
    return pos, normal, depth, valid


def point_hull_depth(c_local, verts, face_n, face_b, fmask):
    """Signed penetration of a point into a hull (local frame): depth > 0
    inside (distance to the nearest face plane), < 0 outside (nearest-face
    approximation — exact over face interiors)."""
    sd = face_n @ c_local - face_b  # per-face signed distance, <0 inside
    sd = jnp.where(fmask, sd, -_BIG)
    i = jnp.argmax(sd)
    return -sd[i], face_n[i]


def sphere_convex(Ra, pa, sa, Rb, pb, verts, face_n, face_b, fmask):
    """A = sphere, B = hull."""
    r = sa[0]
    c = Rb.T @ (pa - pb)  # sphere center in hull frame
    depth_c, n_local = point_hull_depth(c, verts, face_n, face_b, fmask)
    depth = depth_c + r
    n = Rb @ n_local  # pushes the sphere out of the hull
    pos = pa - n * (r - 0.5 * depth)
    return pos[None], n[None], depth[None], (depth > 0)[None]


def capsule_convex(Ra, pa, sa, Rb, pb, verts, face_n, face_b, fmask):
    """A = capsule (radius sa[0], half-length sa[1], axis = A z), B = hull.
    Three sample spheres along the axis (ends + middle) — the lying-flat
    manifold analogue of capsule_plane."""
    r, hl = sa[0], sa[1]
    axis = Ra[:, 2]
    outs = []
    for t in (-1.0, 0.0, 1.0):
        center = pa + axis * (hl * t)
        c = Rb.T @ (center - pb)
        depth_c, n_local = point_hull_depth(c, verts, face_n, face_b, fmask)
        depth = depth_c + r
        n = Rb @ n_local
        pos = center - n * (r - 0.5 * depth)
        outs.append((pos, n, depth, depth > 0))
    pos = jnp.stack([o[0] for o in outs])
    nrm = jnp.stack([o[1] for o in outs])
    dep = jnp.stack([o[2] for o in outs])
    val = jnp.stack([o[3] for o in outs])
    return pos, nrm, dep, val


def convex_convex(
    Ra, pa, va, na_, ba, vmask_a, fmask_a,
    Rb, pb, vb, nb_, bb, vmask_b, fmask_b,
    k=4,
):
    """A, B = hulls. SAT over the face normals of BOTH hulls:
    for each axis, overlap = (support of A along -axis) vs B's face offset —
    computed symmetrically as min over axes of penetration. The returned
    normal pushes A away from B. Manifold: the k deepest A-vertices inside B
    and (symmetrically) B-vertices inside A, merged by depth.
    """
    wa = _world_verts(Ra, pa, va)  # (VA, 3)
    wb = _world_verts(Rb, pb, vb)  # (VB, 3)

    # B's face planes in world: n·x <= b
    nB_w = nb_ @ Rb.T  # (FB, 3)
    bB_w = bb + nB_w @ pb
    # A's face planes in world
    nA_w = na_ @ Ra.T
    bA_w = ba + nA_w @ pa

    big = jnp.asarray(_BIG, wa.dtype)

    # penetration along B's axes: how far A's deepest vertex sits below each
    # B face plane; the SAT depth along axis i is max over faces? No: for a
    # separating test, axis i separates iff min_A(n_i·x) > b_i. Penetration
    # along axis i = b_i - min_A(n_i·x).
    minA_on_B = jnp.min(jnp.where(vmask_a[None, :], nB_w @ wa.T, big), axis=1)  # (FB,)
    pen_B = bB_w - minA_on_B  # >0 means A extends below this face plane
    pen_B = jnp.where(fmask_b, pen_B, big)

    minB_on_A = jnp.min(jnp.where(vmask_b[None, :], nA_w @ wb.T, big), axis=1)  # (FA,)
    pen_A = bA_w - minB_on_A
    pen_A = jnp.where(fmask_a, pen_A, big)

    # overall: the minimum-penetration axis over both sets (SAT)
    iB = jnp.argmin(pen_B)
    iA = jnp.argmin(pen_A)
    use_B = pen_B[iB] <= pen_A[iA]
    depth_sat = jnp.where(use_B, pen_B[iB], pen_A[iA])
    # normal pushes A out of B: B-axis normals point out of B (already good);
    # A-axis normals point out of A, so flip
    n_sat = jnp.where(use_B, nB_w[iB], -nA_w[iA])
    overlapping = depth_sat > 0

    # manifold: A-verts inside B (depth = min face clearance of B) and
    # B-verts inside A, each projected contact at the vertex position
    inB = bB_w[None, :] - wa @ nB_w.T  # (VA, FB) >=0 inside face
    inB = jnp.where(fmask_b[None, :], inB, big)
    depth_a = jnp.min(inB, axis=1)  # >0 = vertex inside B
    val_a = (depth_a > 0) & vmask_a & overlapping

    inA = bA_w[None, :] - wb @ nA_w.T  # (VB, FA)
    inA = jnp.where(fmask_a[None, :], inA, big)
    depth_b = jnp.min(inA, axis=1)
    val_b = (depth_b > 0) & vmask_b & overlapping

    pos = jnp.concatenate([wa, wb])
    depth = jnp.concatenate([depth_a, depth_b])
    valid = jnp.concatenate([val_a, val_b])
    pos, depth, valid = _topk_contacts(pos, depth, valid, k)
    normal = jnp.broadcast_to(n_sat, (k, 3))
    return pos, normal, depth, valid


# ---------------------------------------------------------------------------
# ellipsoid pairs (support-mapped; EllipsoidShape parity)
# ---------------------------------------------------------------------------

def ellipsoid_plane(Ra, pa, sa, Rb, pb, sb):
    """A = ellipsoid (radii sa), B = plane. Exact: the support point of the
    ellipsoid along -n is p - (E² n_l)/|E n_l| (E = diag radii, local)."""
    n = Rb[:, 2]
    nl = Ra.T @ n
    e2 = sa * sa
    denom = jnp.sqrt(jnp.maximum(jnp.sum(e2 * nl * nl), 1e-18))
    sup_l = -(e2 * nl) / denom  # deepest point, local
    sup = pa + Ra @ sup_l
    depth = jnp.dot(pb - sup, n)
    pos = sup + 0.5 * depth * n
    return pos[None], n[None], depth[None], (depth > 0)[None]


def sphere_ellipsoid(Ra, pa, sa, Rb, pb, sb, iters=12):
    """A = sphere, B = ellipsoid. Closest point on the ellipsoid to the
    sphere center by Newton on the single Lagrange multiplier t of
    x_i = c_i e_i² / (e_i² + t) — exact for outside centers, monotone
    convergent; the deep-inside case falls back to the max-axis push-out."""
    r = sa[0]
    e2 = sb * sb
    c = Rb.T @ (pa - pb)  # sphere center in ellipsoid frame

    # phi(t) = sum e2 c^2/(e2+t)^2 - 1 = 0, root t > -min(e2)
    def phi(t):
        return jnp.sum(e2 * c * c / (e2 + t) ** 2) - 1.0

    def dphi(t):
        return -2.0 * jnp.sum(e2 * c * c / (e2 + t) ** 3)

    inside = jnp.sum(c * c / jnp.maximum(e2, 1e-18)) < 1.0
    t = jnp.asarray(0.0, c.dtype)
    for _ in range(iters):
        step = phi(t) / jnp.where(jnp.abs(dphi(t)) > 1e-18, dphi(t), -1e-18)
        t_new = t - step
        # keep t in the valid branch (t > -min e2 for outside points)
        t = jnp.maximum(t_new, -0.9 * jnp.min(e2))
    x = e2 * c / (e2 + t)  # closest surface point (local)
    n_l = x / jnp.maximum(e2, 1e-18)
    n_l = n_l / jnp.maximum(jnp.linalg.norm(n_l), 1e-12)
    dist = jnp.linalg.norm(c - x) * jnp.where(inside, -1.0, 1.0)
    depth = r - dist
    n = Rb @ n_l  # pushes the sphere away from the ellipsoid
    pos = pa - n * (r - 0.5 * depth)
    return pos[None], n[None], depth[None], (depth > 0)[None]
