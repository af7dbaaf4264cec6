"""World collision: static pair list -> fixed-size contact buffers.

Capability parity with CollisionDetector::collide + CollisionResult
(dart/collision/*.cpp — SURVEY.md §2.1 "Collision core"), redesigned around
static shapes: the pair list and per-pair slot counts are decided at build
time (model.col_pairs), so the jitted program sees fixed-size contact arrays
with validity masks — no dynamic islands, no result objects.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from diffdart_tpu.collision import convex as CX
from diffdart_tpu.collision import narrowphase as NP
from diffdart_tpu.dynamics.model import GeomType, Model
from diffdart_tpu.math.lie import tf_compose

_G = GeomType

# (typeA, typeB) -> (fn, n_slots, swap)  — canonical order; swapped pairs flip
# the normal, since fn's convention is "normal pushes A away from B".
_DISPATCH = {
    (_G.SPHERE, _G.SPHERE): (NP.sphere_sphere, 1),
    (_G.SPHERE, _G.PLANE): (NP.sphere_plane, 1),
    (_G.SPHERE, _G.BOX): (NP.sphere_box, 1),
    (_G.SPHERE, _G.CAPSULE): (NP.sphere_capsule, 1),
    (_G.CAPSULE, _G.PLANE): (NP.capsule_plane, 2),
    (_G.CAPSULE, _G.CAPSULE): (NP.capsule_capsule, 1),
    (_G.CAPSULE, _G.BOX): (NP.capsule_box, 3),
    (_G.BOX, _G.PLANE): (NP.box_plane, 8),
    (_G.BOX, _G.BOX): (NP.box_box, 8),
    (_G.CYLINDER, _G.PLANE): (NP.cylinder_plane, 8),
    # true flat-cap cylinder-sphere (collideCylinderSphere parity, r5)
    (_G.CYLINDER, _G.SPHERE): (lambda Ra, pa, sa, Rb, pb, sb: _swap(NP.sphere_cylinder(Rb, pb, sb, Ra, pa, sa)), 1),
    # cylinder vs capsule/box/cylinder: capsule approximation of the same
    # radius/length (beyond the reference's pair table — it has no
    # cylinder-box/cylinder-cylinder narrowphase at all)
    (_G.CYLINDER, _G.CAPSULE): (NP.capsule_capsule, 1),
    (_G.CYLINDER, _G.BOX): (NP.capsule_box, 3),
    (_G.CYLINDER, _G.CYLINDER): (NP.capsule_capsule, 1),
    (_G.ELLIPSOID, _G.PLANE): (CX.ellipsoid_plane, 1),
    (_G.SPHERE, _G.ELLIPSOID): (CX.sphere_ellipsoid, 1),
}


def _hull_args(model: Model, g: int):
    """Padded hull buffers + static masks for a CONVEX geom (or a box viewed
    as a hull)."""
    import numpy as np

    h = model.geom_hull[g]
    if h >= 0:
        HV = model.hull_verts.shape[1]
        HF = model.hull_face_n.shape[1]
        vmask = jnp.asarray(np.arange(HV) < model.hull_vcounts[h])
        fmask = jnp.asarray(np.arange(HF) < model.hull_fcounts[h])
        return (
            model.hull_verts[h],
            model.hull_face_n[h],
            model.hull_face_b[h],
            vmask,
            fmask,
        )
    if model.geom_type[g] == _G.BOX:
        return CX.box_as_hull(model.geom_size[g], model.mass.dtype)
    raise NotImplementedError(f"geom {g} has no hull representation")


# extended dispatch: pairs that need hull buffers (fn built per-pair inside
# _pair_plan; slots listed here). Canonical order as keyed.
_DISPATCH_HULL_SLOTS = {
    (_G.CONVEX, _G.PLANE): 4,
    (_G.SPHERE, _G.CONVEX): 1,
    (_G.CAPSULE, _G.CONVEX): 3,
    (_G.CYLINDER, _G.CONVEX): 3,  # capsule approximation (as cylinder-box)
    (_G.BOX, _G.CONVEX): 4,
    (_G.CONVEX, _G.CONVEX): 4,
}


def _make_hull_fn(model: Model, ta: int, tb: int, ga: int, gb: int):
    """Build fn(Ra, pa, Rb, pb) -> (pos, n, depth, valid) for a hull pair.
    Normal convention matches the primitive table: pushes geom A (first)
    away from geom B (second)."""
    if (ta, tb) == (_G.CONVEX, _G.PLANE):
        def fn(Ra, pa, Rb, pb):
            hv, _, _, vmask, _ = _hull_args(model, ga)
            return CX.convex_plane(Ra, pa, hv, vmask, Rb, pb)

        return fn
    if (ta, tb) == (_G.SPHERE, _G.CONVEX):
        def fn(Ra, pa, Rb, pb):
            hv, hn, hb, _, fmask = _hull_args(model, gb)
            return CX.sphere_convex(Ra, pa, model.geom_size[ga], Rb, pb, hv, hn, hb, fmask)

        return fn
    if (ta, tb) in ((_G.CAPSULE, _G.CONVEX), (_G.CYLINDER, _G.CONVEX)):
        def fn(Ra, pa, Rb, pb):
            hv, hn, hb, _, fmask = _hull_args(model, gb)
            return CX.capsule_convex(Ra, pa, model.geom_size[ga], Rb, pb, hv, hn, hb, fmask)

        return fn
    if (ta, tb) in ((_G.BOX, _G.CONVEX), (_G.CONVEX, _G.CONVEX)):
        def fn(Ra, pa, Rb, pb):
            hva, hna, hba, vma, fma = _hull_args(model, ga)
            hvb, hnb, hbb, vmb, fmb = _hull_args(model, gb)
            return CX.convex_convex(
                Ra, pa, hva, hna, hba, vma, fma,
                Rb, pb, hvb, hnb, hbb, vmb, fmb,
            )

        return fn
    raise NotImplementedError(f"no hull narrowphase for ({ta},{tb})")


def _swap(out):
    pos, n, d, v = out
    return pos, -n, d, v


class Contacts(NamedTuple):
    """Fixed-size contact set for one env. Static per-slot metadata (body
    indices) lives in parallel numpy arrays via `contact_slots(model)`."""

    pos: jnp.ndarray  # (nc, 3) world contact point
    normal: jnp.ndarray  # (nc, 3) world normal, pushes body_a away from body_b
    depth: jnp.ndarray  # (nc,) penetration depth (>0 = penetrating)
    valid: jnp.ndarray  # (nc,) bool
    friction: jnp.ndarray  # (nc,)
    restitution: jnp.ndarray  # (nc,)


def _pair_plan(model: Model):
    """Static narrowphase plan: per pair ->
    (kind, fn, slots, ga, gb, swapped) with kind in {'prim', 'hull'}."""
    plan = []
    for (a, b) in model.col_pairs:
        ta, tb = model.geom_type[a], model.geom_type[b]
        if (ta, tb) in _DISPATCH:
            fn, k = _DISPATCH[(ta, tb)]
            plan.append(("prim", fn, k, a, b, False))
        elif (tb, ta) in _DISPATCH:
            fn, k = _DISPATCH[(tb, ta)]
            plan.append(("prim", fn, k, b, a, True))
        elif (ta, tb) in _DISPATCH_HULL_SLOTS:
            k = _DISPATCH_HULL_SLOTS[(ta, tb)]
            plan.append(("hull", _make_hull_fn(model, ta, tb, a, b), k, a, b, False))
        elif (tb, ta) in _DISPATCH_HULL_SLOTS:
            k = _DISPATCH_HULL_SLOTS[(tb, ta)]
            plan.append(("hull", _make_hull_fn(model, tb, ta, b, a), k, b, a, True))
        else:
            raise NotImplementedError(f"no narrowphase for geom types ({ta},{tb})")
    return plan


def _grouped_plan(model: Model):
    """Group the pair plan by narrowphase function so each group runs as ONE
    vmapped call (many-contact scenes — e.g. an n-cube stack with O(n²)
    box-box pairs — trace a single SAT kernel instead of n² copies; XLA then
    fuses/tiles the batch). This replaces the reference's broadphase+islands
    (ConstraintSolver::updateConstraints): pair pruning is static (build
    time), and runtime cost scales as vectorized batches, not program size.

    Returns an ordered list of (kind, fn, k, members) with members =
    [(ga, gb, swapped), ...]. Slot order = group order (both contact_slots
    and collide_world derive from this, so layouts always agree)."""
    groups: dict = {}
    order = []
    for (kind, fn, k, ga, gb, swapped) in _pair_plan(model):
        key = fn if kind == "prim" else ("hull", ga, gb)  # hull fns stay 1:1
        if key not in groups:
            groups[key] = (kind, fn, k, [])
            order.append(key)
        groups[key][3].append((ga, gb, swapped))
    return [groups[key] for key in order]


def _group_cap(model: Model, kind: str, members) -> int:
    """Pairs from this group entering narrowphase: all of them, or the AABB
    broadphase budget (Model.pair_budget) for oversized 'prim' groups."""
    n = len(members)
    if kind == "prim" and model.pair_budget and n > model.pair_budget:
        return model.pair_budget
    return n


def max_contacts(model: Model) -> int:
    return sum(
        k * _group_cap(model, kind, members)
        for (kind, _, k, members) in _grouped_plan(model)
    )


def _aabb_halfext(model: Model, g: int, Rg):
    """World-AABB half-extents (3,) of geom g under world rotation Rg —
    the broadphase bound (conservative, cheap). Static type dispatch."""
    t = model.geom_type[g]
    size = model.geom_size[g]
    if t == _G.SPHERE:
        return jnp.broadcast_to(size[0], (3,))
    if t in (_G.BOX, _G.ELLIPSOID):
        return jnp.abs(Rg) @ size
    if t in (_G.CAPSULE, _G.CYLINDER):
        return jnp.abs(Rg[:, 2]) * size[1] + size[0]
    if t == _G.CONVEX:
        import numpy as np

        h = model.geom_hull[g]
        vc = model.hull_vcounts[h]
        r = float(np.linalg.norm(np.asarray(model.hull_verts)[h][:vc], axis=1).max())
        return jnp.full((3,), r, model.mass.dtype)
    raise NotImplementedError(f"no AABB for geom type {t}")


def effective_contacts(model: Model) -> int:
    """Number of contact slots entering the LCP: all narrowphase slots, or
    the static contact budget when one is set (see Model.contact_budget)."""
    nc = max_contacts(model)
    if model.contact_budget and nc > model.contact_budget:
        return model.contact_budget
    return nc


def select_contacts(model: Model, contacts: Contacts, body_a=None, body_b=None):
    """Gather the LCP's contact set + per-slot body indices.

    Without a budget: identity (static body indices as arrays). With a budget
    K < max_contacts: keep the K deepest VALID slots (lax.top_k on a masked
    depth score) — the TPU-native analogue of the reference's
    broadphase+island pruning (ConstraintSolver::updateConstraints): instead
    of dynamically-sized islands, a fixed-size gather bounds the LCP at K
    rows while many-pair scenes keep O(pairs) only in the (cheap, vectorized)
    narrowphase. Ties/ranking changes are active-set-style discontinuities —
    the same nature as contact making/breaking."""
    import jax
    import numpy as np

    if body_a is not None and body_b is not None:
        ba, bb = body_a, body_b  # dynamic slot->body mapping (pair budget)
    else:
        sa, sb = contact_slots(model)
        ba = jnp.asarray(np.array(sa, np.int32)) if sa else jnp.zeros((0,), jnp.int32)
        bb = jnp.asarray(np.array(sb, np.int32)) if sb else jnp.zeros((0,), jnp.int32)
    K = effective_contacts(model)
    if K == contacts.pos.shape[0]:
        return contacts, ba, bb
    score = jnp.where(contacts.valid, contacts.depth, -jnp.inf)
    _, idx = jax.lax.top_k(score, K)
    sel = Contacts(
        pos=contacts.pos[idx],
        normal=contacts.normal[idx],
        depth=contacts.depth[idx],
        valid=contacts.valid[idx],
        friction=contacts.friction[idx],
        restitution=contacts.restitution[idx],
    )
    return sel, ba[idx], bb[idx]


def contact_slots(model: Model):
    """Static per-slot metadata: (body_a, body_b) tuples of len max_contacts.
    body_a is the body pushed along +normal. Only meaningful without a
    runtime AABB pair budget — budgeted slots map to pairs dynamically (use
    collide_world_with_bodies)."""
    if model.pair_budget and any(
        _group_cap(model, kind, members) < len(members)
        for (kind, _, _, members) in _grouped_plan(model)
    ):
        raise ValueError(
            "contact_slots: slot->body mapping is dynamic under "
            "Model.pair_budget; use collide_world_with_bodies"
        )
    body_a, body_b = [], []
    for (_, fn, k, members) in _grouped_plan(model):
        for (ga, gb, swapped) in members:
            body_a += [model.geom_body[ga]] * k
            body_b += [model.geom_body[gb]] * k
    return tuple(body_a), tuple(body_b)


def geom_world_poses(model: Model, R_body, p_body):
    """World pose of each geom: body pose ∘ local geom pose; world geoms
    (body -1) use their local pose directly."""
    Rs, ps = [], []
    for g in range(model.ngeom):
        b = model.geom_body[g]
        if b < 0:
            Rs.append(model.geom_rot[g])
            ps.append(model.geom_pos[g])
        else:
            R, p = tf_compose(R_body[b], p_body[b], model.geom_rot[g], model.geom_pos[g])
            Rs.append(R)
            ps.append(p)
    return Rs, ps


def collide_world_with_bodies(model: Model, R_body, p_body):
    """Run the static pair plan's narrowphase; concatenate into fixed buffers.

    Returns (Contacts, body_a, body_b) with per-slot body index arrays
    (int32). Groups larger than Model.pair_budget first pass a runtime AABB
    broadphase: world-AABB overlap scores for every member, lax.top_k keeps
    the `pair_budget` most-overlapping pairs, and only those run narrowphase
    — bounding both narrowphase work and LCP rows at O(budget) in many-geom
    worlds (the TPU-native replacement for the reference's dynamic
    broadphase+islands, ConstraintSolver::updateConstraints). Body indices
    for budgeted groups are gathered at runtime, so slots stay fixed-size.

    The swapped flag flips normals so that slot convention is always
    'normal pushes body_a away from body_b'."""
    import jax
    import numpy as np

    Rg, pg = geom_world_poses(model, R_body, p_body)
    dtype = model.mass.dtype
    pos_l, n_l, d_l, v_l, fr_l, re_l, ba_l, bb_l = [], [], [], [], [], [], [], []
    for (kind, fn, k, members) in _grouped_plan(model):
        cap = _group_cap(model, kind, members)
        body_a_m = np.array([model.geom_body[ga] for (ga, _, _) in members], np.int32)
        body_b_m = np.array([model.geom_body[gb] for (_, gb, _) in members], np.int32)
        fr_m = jnp.stack([
            jnp.minimum(model.geom_friction[ga], model.geom_friction[gb])
            for (ga, gb, _) in members
        ])
        re_m = jnp.stack([
            model.geom_restitution[ga] * model.geom_restitution[gb]
            for (ga, gb, _) in members
        ])
        if kind == "hull":
            # hull fns close over per-pair buffers; members is a single pair
            (ga, gb, swapped) = members[0]
            pos, n, depth, valid = fn(Rg[ga], pg[ga], Rg[gb], pg[gb])
            ba = jnp.asarray(np.repeat(body_a_m, k))
            bb = jnp.asarray(np.repeat(body_b_m, k))
            fr = jnp.broadcast_to(fr_m[0], (k,))
            re = jnp.broadcast_to(re_m[0], (k,))
        elif len(members) == 1:
            (ga, gb, swapped) = members[0]
            pos, n, depth, valid = fn(
                Rg[ga], pg[ga], model.geom_size[ga], Rg[gb], pg[gb], model.geom_size[gb]
            )
            ba = jnp.asarray(np.repeat(body_a_m, k))
            bb = jnp.asarray(np.repeat(body_b_m, k))
            fr = jnp.broadcast_to(fr_m[0], (k,))
            re = jnp.broadcast_to(re_m[0], (k,))
        else:
            # one vmapped narrowphase call for the whole same-type group
            Ra = jnp.stack([Rg[ga] for (ga, _, _) in members])
            pa = jnp.stack([pg[ga] for (ga, _, _) in members])
            sa = jnp.stack([model.geom_size[ga] for (ga, _, _) in members])
            Rb = jnp.stack([Rg[gb] for (_, gb, _) in members])
            pb = jnp.stack([pg[gb] for (_, gb, _) in members])
            sb = jnp.stack([model.geom_size[gb] for (_, gb, _) in members])
            ba_m = jnp.asarray(body_a_m)
            bb_m = jnp.asarray(body_b_m)
            if cap < len(members):
                # ---- AABB broadphase: keep the `cap` most-overlapping pairs
                ha = jnp.stack([_aabb_halfext(model, ga, Rg[ga]) for (ga, _, _) in members])
                gb0 = members[0][1]
                if model.geom_type[gb0] == _G.PLANE:
                    # halfspace overlap along the plane normal (a world-AABB
                    # cannot bound an infinite plane; project on its normal)
                    nrm = jnp.stack([Rg[gb][:, 2] for (_, gb, _) in members])
                    off = jnp.einsum("mk,mk->m", nrm, pb)
                    score = jnp.einsum("mk,mk->m", ha, jnp.abs(nrm)) - (
                        jnp.einsum("mk,mk->m", nrm, pa) - off
                    )
                else:
                    hb = jnp.stack([_aabb_halfext(model, gb, Rg[gb]) for (_, gb, _) in members])
                    score = jnp.min(ha + hb - jnp.abs(pa - pb), axis=-1)
                _, idx = jax.lax.top_k(jax.lax.stop_gradient(score), cap)
                Ra, pa, sa = Ra[idx], pa[idx], sa[idx]
                Rb, pb, sb = Rb[idx], pb[idx], sb[idx]
                ba_m, bb_m = ba_m[idx], bb_m[idx]
                fr_m, re_m = fr_m[idx], re_m[idx]
            pos, n, depth, valid = jax.vmap(fn)(Ra, pa, sa, Rb, pb, sb)
            pos = pos.reshape(-1, 3)
            n = n.reshape(-1, 3)
            depth = depth.reshape(-1)
            valid = valid.reshape(-1)
            ba = jnp.repeat(ba_m, k)
            bb = jnp.repeat(bb_m, k)
            fr = jnp.repeat(fr_m, k)
            re = jnp.repeat(re_m, k)
        pos_l.append(pos)
        n_l.append(n)
        d_l.append(depth)
        v_l.append(valid)
        # combine: friction = min (ContactConstraint parity), restitution = product
        fr_l.append(fr)
        re_l.append(re)
        ba_l.append(ba)
        bb_l.append(bb)
    if not pos_l:
        z3 = jnp.zeros((0, 3), dtype)
        z = jnp.zeros((0,), dtype)
        zi = jnp.zeros((0,), jnp.int32)
        return Contacts(z3, z3, z, jnp.zeros((0,), bool), z, z), zi, zi
    return (
        Contacts(
            pos=jnp.concatenate(pos_l),
            normal=jnp.concatenate(n_l),
            depth=jnp.concatenate(d_l),
            valid=jnp.concatenate(v_l),
            friction=jnp.concatenate(fr_l),
            restitution=jnp.concatenate(re_l),
        ),
        jnp.concatenate(ba_l),
        jnp.concatenate(bb_l),
    )


def collide_world(model: Model, R_body, p_body) -> Contacts:
    """Contacts-only view of collide_world_with_bodies (body indices for the
    unbudgeted plan are also available statically via contact_slots)."""
    return collide_world_with_bodies(model, R_body, p_body)[0]
