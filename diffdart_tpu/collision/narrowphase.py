"""Differentiable primitive narrowphase collision functions.

Capability parity with the reference's gradient-friendly native backend
(dart/collision/dart/DARTCollide.cpp — anchors collideSphereSphere,
collideSphereBox, collideBoxBox, collideCylinderPlane; SURVEY.md §2.1), built
as pure batched jnp ops that are differentiable by construction: every pair
type returns a FIXED number of candidate contacts with a validity mask, so
shapes are static under jit and the LCP decides activity.

Conventions:
  * all inputs are world-frame geom poses (R, p) + size params
  * returned `normal` points from geom B toward geom A (the direction that
    pushes A out of B); `depth` > 0 means penetrating; `valid` gates slots
  * sizes: sphere (r, -, -); box (hx, hy, hz half-extents); capsule
    (r, half_len, -) axis along geom z; plane: normal = geom z-axis,
    surface through geom origin.
"""
from __future__ import annotations

import jax.numpy as jnp

_BIG = 1e9


def _stack1(pos, normal, depth, valid):
    return pos[None], normal[None], depth[None], valid[None]


def sphere_sphere(Ra, pa, sa, Rb, pb, sb):
    ra, rb = sa[0], sb[0]
    d = pa - pb
    dist2 = jnp.sum(d * d)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-18))
    n = d / dist
    depth = ra + rb - dist
    pos = pb + n * (rb - 0.5 * depth)
    return _stack1(pos, n, depth, depth > 0)


def sphere_plane(Ra, pa, sa, Rb, pb, sb):
    """A = sphere, B = plane (normal = B's z axis)."""
    r = sa[0]
    n = Rb[:, 2]
    depth = r - jnp.dot(pa - pb, n)
    pos = pa - n * (r - 0.5 * depth)
    return _stack1(pos, n, depth, depth > 0)


def sphere_box(Ra, pa, sa, Rb, pb, sb):
    """A = sphere, B = box. Handles center-outside (clamp) and center-inside
    (face push-out) cases branchlessly."""
    r = sa[0]
    half = sb
    # sphere center in box frame
    c = Rb.T @ (pa - pb)
    clamped = jnp.clip(c, -half, half)
    delta = c - clamped
    dist2 = jnp.sum(delta * delta)
    outside = dist2 > 1e-16
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-18))
    n_out = delta / dist  # box-frame normal, pushes sphere away from box
    # inside: push along the axis with least distance to a face
    face_d = half - jnp.abs(c)  # distance to each face (>=0 inside)
    ax = jnp.argmin(face_d)
    sign = jnp.where(c[ax] >= 0, 1.0, -1.0)
    n_in = jnp.zeros(3, c.dtype).at[ax].set(sign)
    depth_out = r - dist
    depth_in = r + face_d[ax]
    n_local = jnp.where(outside, n_out, n_in)
    depth = jnp.where(outside, depth_out, depth_in)
    surf_local = jnp.where(outside, clamped, c + n_in * face_d[ax])
    n = Rb @ n_local
    pos = Rb @ surf_local + pb
    return _stack1(pos, n, depth, depth > 0)


def sphere_capsule(Ra, pa, sa, Rb, pb, sb):
    """A = sphere, B = capsule (axis = B z, half length sb[1], radius sb[0])."""
    r, rc, hl = sa[0], sb[0], sb[1]
    axis = Rb[:, 2]
    t = jnp.clip(jnp.dot(pa - pb, axis), -hl, hl)
    closest = pb + axis * t
    return sphere_sphere(Ra, pa, sa, Rb, closest, jnp.array([rc, 0.0, 0.0], sa.dtype))


def sphere_cylinder(Ra, pa, sa, Rb, pb, sb):
    """A = sphere, B = cylinder (axis = B z, radius sb[0], half-height sb[1]).

    Parity: collideCylinderSphere (DARTCollide.cpp) — true flat-capped
    cylinder contact (lateral wall, cap face, and rim edge all emerge from
    the clamp), replacing the r4 capsule approximation. Handles
    center-outside (closest point on the solid cylinder) and center-inside
    (nearest-feature push-out) branchlessly, NaN-safe on the axis."""
    r = sa[0]
    rc, h = sb[0], sb[1]
    c = Rb.T @ (pa - pb)  # sphere center in cylinder frame
    ez = jnp.array([0.0, 0.0, 1.0], c.dtype)
    rho2 = c[0] * c[0] + c[1] * c[1]
    rho = jnp.sqrt(jnp.maximum(rho2, 1e-18))
    on_axis = rho2 < 1e-16
    e_r = jnp.where(
        on_axis,
        jnp.array([1.0, 0.0, 0.0], c.dtype),
        jnp.array([c[0], c[1], 0.0], c.dtype) / rho,
    )
    # closest point on the SOLID cylinder to c (the outside case; the clamp
    # lands on the wall, the cap, or the rim edge as appropriate). Scale the
    # actual xy (exact 0 on the axis — no e_r epsilon leak) instead of e_r.
    s_xy = jnp.minimum(1.0, rc / rho)
    q = jnp.array([c[0] * s_xy, c[1] * s_xy, 0.0], c.dtype) + ez * jnp.clip(c[2], -h, h)
    delta = c - q
    dist2 = jnp.sum(delta * delta)
    outside = dist2 > 1e-16
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-18))
    n_out = delta / dist
    depth_out = r - dist
    # inside: push along lateral wall vs nearer cap, whichever is closer
    d_lat = rc - rho
    d_cap = h - jnp.abs(c[2])
    lat = d_lat <= d_cap
    sign = jnp.where(c[2] >= 0, 1.0, -1.0)
    n_in = jnp.where(lat, e_r, ez * sign)
    depth_in = r + jnp.where(lat, d_lat, d_cap)
    surf_in = jnp.where(
        lat,
        e_r * rc + ez * c[2],
        jnp.array([c[0], c[1], 0.0], c.dtype) + ez * (sign * h),
    )
    n_local = jnp.where(outside, n_out, n_in)
    depth = jnp.where(outside, depth_out, depth_in)
    surf_local = jnp.where(outside, q, surf_in)
    n = Rb @ n_local
    pos = Rb @ surf_local + pb
    return _stack1(pos, n, depth, depth > 0)


def capsule_plane(Ra, pa, sa, Rb, pb, sb):
    """A = capsule, B = plane: 2 candidate contacts at the end spheres."""
    r, hl = sa[0], sa[1]
    axis = Ra[:, 2]
    n = Rb[:, 2]
    outs = []
    for s in (-1.0, 1.0):
        c = pa + axis * (s * hl)
        depth = r - jnp.dot(c - pb, n)
        pos = c - n * (r - 0.5 * depth)
        outs.append((pos, n, depth, depth > 0))
    return tuple(jnp.stack([o[i] for o in outs]) for i in range(4))


def capsule_capsule(Ra, pa, sa, Rb, pb, sb):
    """Closest points between the two core segments -> one sphere-sphere contact."""
    ra, ha = sa[0], sa[1]
    rb, hb = sb[0], sb[1]
    ua, ub = Ra[:, 2], Rb[:, 2]
    # segment-segment closest points (Ericson, Real-Time Collision Detection)
    d = pa - pb
    a_dot_b = jnp.dot(ua, ub)
    denom = 1.0 - a_dot_b * a_dot_b
    ta_free = (-jnp.dot(d, ua) + a_dot_b * jnp.dot(d, ub)) / jnp.where(denom < 1e-12, 1.0, denom)
    ta = jnp.clip(jnp.where(denom < 1e-12, 0.0, ta_free), -ha, ha)
    tb = jnp.clip(jnp.dot(d + ua * ta, ub), -hb, hb)
    ta = jnp.clip(-jnp.dot(d, ua) + tb * a_dot_b, -ha, ha)
    ca = pa + ua * ta
    cb = pb + ub * tb
    return sphere_sphere(Ra, ca, jnp.array([ra, 0, 0], sa.dtype), Rb, cb, jnp.array([rb, 0, 0], sa.dtype))


def _seg_box_t(p0, u, hl, half, iters=40):
    """t in [-hl, hl] minimizing the distance from segment point p0 + t*u to
    the origin-centered box with half-extents `half` (all in the box frame).
    The squared distance to a convex set is convex in t, so a fixed-iteration
    ternary search is exact to (2/3)^iters * 2*hl and branchless."""
    import jax

    def dist2(t):
        c = p0 + t * u
        d = c - jnp.clip(c, -half, half)
        return jnp.sum(d * d)

    lo = -hl * jnp.ones((), p0.dtype)
    hi = hl * jnp.ones((), p0.dtype)

    def body(_, lohi):
        lo, hi = lohi
        m1 = lo + (hi - lo) / 3.0
        m2 = hi - (hi - lo) / 3.0
        shrink_lo = dist2(m1) > dist2(m2)
        return jnp.where(shrink_lo, m1, lo), jnp.where(shrink_lo, hi, m2)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)


def capsule_box(Ra, pa, sa, Rb, pb, sb):
    """Capsule A vs box B: exact segment-box closest point. 3 candidates —
    the two end spheres plus the interior closest point of the core segment
    to the box (ternary search on the convex squared distance, exact across
    face/edge/vertex regions) — each resolved as an exact sphere-box contact.
    Covers lying-flat (two end contacts), end-poke, and mid-segment edge
    crossings. Parity anchor: collideCapsuleBox via FCL in the reference."""
    r, hl = sa[0], sa[1]
    axis = Ra[:, 2]
    p0_l = Rb.T @ (pa - pb)
    u_l = Rb.T @ axis
    t_star = _seg_box_t(p0_l, u_l, hl, sb)
    outs = []
    for t in (-hl, t_star, hl):
        c = pa + axis * t
        o = sphere_box(Ra, c, jnp.array([r, 0, 0], sa.dtype), Rb, pb, sb)
        outs.append(tuple(x[0] for x in o))
    return tuple(jnp.stack([o[i] for o in outs]) for i in range(4))


def cylinder_plane(Ra, pa, sa, Rb, pb, sb):
    """A = cylinder (axis z, radius sa[0], half-height sa[1]), B = plane.
    Parity: collideCylinderPlane (DARTCollide.cpp). 8 rim candidates — the
    deepest rim direction and its orthogonal pair on both caps — cover the
    upright (flat cap, 4-point ring), lying (2-point line), and tilted
    (1-point) cases branchlessly."""
    r, h = sa[0], sa[1]
    axis = Ra[:, 2]
    n = Rb[:, 2]
    # rim direction steepest down the plane: project -n onto the cap plane
    d_raw = -n + jnp.dot(n, axis) * axis
    d2 = jnp.sum(d_raw * d_raw)
    ok = d2 > 1e-12
    d_hat = d_raw * jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, d2, 1.0)), 0.0)
    # fallback tangent basis for the flat case (axis parallel to n)
    t_fb = Ra[:, 0]
    d_hat = jnp.where(ok, d_hat, t_fb)
    t_hat = jnp.cross(axis, d_hat)
    poss, depths = [], []
    for s_cap in (-1.0, 1.0):
        c = pa + axis * (s_cap * h)
        for dvec in (d_hat, -d_hat, t_hat, -t_hat):
            p = c + r * dvec
            depth = -jnp.dot(p - pb, n)
            poss.append(p + 0.5 * depth * n)
            depths.append(depth)
    pos = jnp.stack(poss)
    depth = jnp.stack(depths)
    normal = jnp.broadcast_to(n, (8, 3))
    return pos, normal, depth, depth > 0


def box_plane(Ra, pa, sa, Rb, pb, sb):
    """A = box, B = plane: all 8 corners are candidate contacts."""
    half = sa
    n = Rb[:, 2]
    poss, depths = [], []
    for sx in (-1.0, 1.0):
        for sy in (-1.0, 1.0):
            for sz in (-1.0, 1.0):
                corner_local = half * jnp.array([sx, sy, sz], half.dtype)
                c = Ra @ corner_local + pa
                depth = -jnp.dot(c - pb, n)
                poss.append(c + 0.5 * depth * n)
                depths.append(depth)
    pos = jnp.stack(poss)
    depth = jnp.stack(depths)
    normal = jnp.broadcast_to(n, (8, 3))
    return pos, normal, depth, depth > 0


def box_box(Ra, pa, sa, Rb, pb, sb):
    """SAT box-box with face-clipping: capability parity with the ODE-style
    collideBoxBox (DARTCollide.cpp). Returns 8 candidate contacts.

    Branchless JAX version: evaluate both face-contact hypotheses (A's face /
    B's face) and the best edge-edge hypothesis, then select by the SAT axis
    with minimum penetration (with the ODE-style fudge preferring faces)."""
    dtype = pa.dtype
    eps = 1e-10
    d = pb - pa
    # rotation of B in A frame
    C = Ra.T @ Rb  # columns: B axes in A frame
    absC = jnp.abs(C) + 1e-6  # epsilon avoids SAT degeneracy at axis alignment
    dA = Ra.T @ d  # center offset in A frame
    dB = Rb.T @ (-d)

    # --- face axes of A (3) ---
    sep_A = jnp.abs(dA) - (sa + absC @ sb)  # negative => overlapping
    # --- face axes of B (3) ---
    sep_B = jnp.abs(dB) - (sb + absC.T @ sa)

    # --- edge-edge axes (9): axis = a_i x b_j ---
    def edge_axis_sep(i, j):
        axis_w = jnp.cross(Ra[:, i], Rb[:, j])
        # NaN-safe normalization: parallel edges give a zero cross product,
        # where norm() has a NaN gradient — guard n2 BEFORE the sqrt
        n2 = jnp.sum(axis_w * axis_w)
        ok = n2 > 1e-12
        axis_w = axis_w * jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, n2, 1.0)), 0.0)
        ra_proj = jnp.sum(sa * jnp.abs(Ra.T @ axis_w))
        rb_proj = jnp.sum(sb * jnp.abs(Rb.T @ axis_w))
        sep = jnp.abs(jnp.dot(d, axis_w)) - (ra_proj + rb_proj)
        return jnp.where(ok, sep, -_BIG * 0 - 1e3), axis_w, ok

    edge_seps, edge_axes, edge_oks = [], [], []
    for i in range(3):
        for j in range(3):
            s_, ax_, ok_ = edge_axis_sep(i, j)
            edge_seps.append(s_)
            edge_axes.append(ax_)
            edge_oks.append(ok_)
    edge_seps = jnp.stack(edge_seps)
    edge_axes = jnp.stack(edge_axes)
    edge_oks = jnp.stack(edge_oks)

    # any positive separation on any axis => disjoint
    all_seps = jnp.concatenate([sep_A, sep_B, edge_seps])
    disjoint = jnp.max(all_seps) > 0

    # pick best face axis (ODE fudge: prefer faces strongly over edges)
    face_seps = jnp.concatenate([sep_A, sep_B])
    face_best = jnp.argmax(face_seps)  # least-negative separation
    # edge case only if its separation beats the best face by a margin
    edge_pen = jnp.where(edge_oks, edge_seps, -_BIG)
    edge_best = jnp.argmax(edge_pen)
    fudge = 1.05
    use_edge = edge_pen[edge_best] * fudge > face_seps[face_best] + 1e-9

    # ---------- face-contact hypothesis ----------
    def face_contacts(ref_is_A):
        Rr, pr, sr = (Ra, pa, sa) if ref_is_A else (Rb, pb, sb)
        Ri, pi, si = (Rb, pb, sb) if ref_is_A else (Ra, pa, sa)
        sep3 = sep_A if ref_is_A else sep_B
        axf = jnp.argmax(sep3)
        dr = Rr.T @ (pi - pr)
        sign = jnp.where(jnp.take(dr, axf) >= 0, 1.0, -1.0)
        n_ref = jnp.zeros(3, dtype).at[axf].set(sign)  # ref-frame normal toward incident box
        n_world = Rr @ n_ref
        # incident face: the face of the incident box most anti-parallel to n
        n_inc = Ri.T @ (-n_world)
        axi = jnp.argmax(jnp.abs(n_inc))
        sign_i = jnp.where(jnp.take(n_inc, axi) >= 0, 1.0, -1.0)
        # 4 corners of the incident face, in incident local frame;
        # two tangent axes of the incident face
        t1 = (axi + 1) % 3
        t2 = (axi + 2) % 3
        corners = []
        for s1 in (-1.0, 1.0):
            for s2 in (-1.0, 1.0):
                cl = jnp.zeros(3, dtype)
                cl = cl.at[axi].set(sign_i * jnp.take(si, axi))
                cl = cl.at[t1].set(s1 * jnp.take(si, t1))
                cl = cl.at[t2].set(s2 * jnp.take(si, t2))
                corners.append(Ri @ cl + pi)
        corners = jnp.stack(corners)  # (4, 3) world
        # clip against the 4 side planes of the reference face (in ref frame),
        # by clamping in the ref-face tangent plane (clamp-clip preserves the
        # contact manifold for the resting/stacking cases)
        cr = jnp.einsum("ij,kj->ki", Rr.T, corners - pr)  # (4,3) ref frame
        rt1 = (axf + 1) % 3
        rt2 = (axf + 2) % 3
        clip = cr
        clip = clip.at[:, rt1].set(jnp.clip(cr[:, rt1], -jnp.take(sr, rt1), jnp.take(sr, rt1)))
        clip = clip.at[:, rt2].set(jnp.clip(cr[:, rt2], -jnp.take(sr, rt2), jnp.take(sr, rt2)))
        # penetration of each clipped corner below the reference face plane
        face_coord = jnp.take(sr, axf)
        depth = face_coord - sign * cr[:, axf]
        pos_world = jnp.einsum("ij,kj->ki", Rr, clip) + pr
        return pos_world, jnp.broadcast_to(n_world, (4, 3)), depth

    posA, nA_, depA = face_contacts(True)  # reference = A, normal pushes B away from A
    posB, nB_, depB = face_contacts(False)  # reference = B

    # our convention: normal pushes geom A away from geom B
    nA_out = -nA_  # ref=A: n points A->B, flip
    nB_out = nB_  # ref=B: n points B->A, correct

    use_A = sep_A[jnp.argmax(sep_A)] >= sep_B[jnp.argmax(sep_B)]
    pos_face = jnp.where(use_A, posA, posB)
    n_face = jnp.where(use_A, nA_out, nB_out)
    dep_face = jnp.where(use_A, depA, depB)

    # ---------- edge-contact hypothesis ----------
    ei = edge_best // 3
    ej = edge_best % 3
    axis_w = edge_axes[edge_best]
    # orient axis from B to A
    axis_w = axis_w * jnp.where(jnp.dot(axis_w, d) > 0, -1.0, 1.0)
    # support points: corner of A most along -axis, corner of B most along +axis
    signs_a = -jnp.sign(Ra.T @ axis_w)
    signs_a = signs_a.at[ei].set(0.0)
    pa_edge = pa + Ra @ (signs_a * sa)
    signs_b = jnp.sign(Rb.T @ axis_w)
    signs_b = signs_b.at[ej].set(0.0)
    pb_edge = pb + Rb @ (signs_b * sb)
    # closest points between the two edges (lines along Ra[:,ei], Rb[:,ej])
    ua, ub = Ra[:, ei], Rb[:, ej]
    dd = pa_edge - pb_edge
    adb = jnp.dot(ua, ub)
    den = 1.0 - adb * adb
    ta = (-jnp.dot(dd, ua) + adb * jnp.dot(dd, ub)) / jnp.where(den < 1e-12, 1.0, den)
    tb = jnp.dot(dd + ua * ta, ub)
    ca = pa_edge + ua * ta
    cb = pb_edge + ub * tb
    pos_edge = 0.5 * (ca + cb)
    dep_edge = -edge_pen[edge_best]

    # ---------- combine ----------
    pos8 = jnp.concatenate([pos_face, jnp.broadcast_to(pos_edge, (4, 3))], axis=0)
    n8 = jnp.concatenate([n_face, jnp.broadcast_to(axis_w, (4, 3))], axis=0)
    dep8 = jnp.concatenate([dep_face, jnp.stack([dep_edge, -1.0, -1.0, -1.0])], axis=0)
    slot_is_face = jnp.arange(8) < 4
    valid = jnp.where(
        use_edge,
        ~slot_is_face & (dep8 > 0),
        slot_is_face & (dep8 > 0),
    )
    valid = valid & ~disjoint
    return pos8, n8, dep8, valid
