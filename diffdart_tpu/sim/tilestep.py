"""Batch-last tiled timestep: the whole constrained step as trace-time
scalar algebra over env tiles (ops/tile.py).

This is the TPU speed-of-light execution path for the headline benchmark.
The vmap path (sim/step.py) lowers to hundreds of small batch-first HLOs,
each a round-trip through HBM; measured on a v5e core the articulated
dynamics + its VJP dominate the fwd+grad step (benchmarks/ablate2.py). Here
every per-env scalar is one (8, L) lane tile, every small-dimension loop
unrolls at trace time, structural zeros (ancestor mask, axis-aligned frames,
constant plane normals) fold away, and the whole step becomes one straight
chain of full-tile VPU ops — runnable as plain XLA or as the body of a
single Pallas kernel (ops/pallas_step.py).

Supported (v4): REVOLUTE / PRISMATIC / PLANAR / WELD / FREE / BALL joints
(quaternion FK + geometric integration); capsule-plane, sphere-plane,
box-plane (8-corner) and convex-hull-plane (4 deepest verts) contacts;
joint limits on scalar dofs; velocity-servo motors and joint Coulomb
friction (constant-box LCP rows, targets/limits baked as trace constants);
the lowrank boxed-LCP with Woodbury polish.
Models outside this subset raise TileStepUnsupported — callers fall back
to the vmap path. Gradients flow wrt (q, v, tau) only: model parameters
are baked as trace-time constants (use the vmap path for parameter
Jacobians / WithRespectTo). Large-D models (e.g. the Atlas-class humanoid,
D~141 LCP rows) run the HYBRID lcp='xla' mode: fused tile dynamics/FK/
assembly, with the rows materialized into batched dense arrays and solved
by the canonical vmapped lowrank chain (see build_tile_step).

Measured practical ceiling of the tile trace: the scalar-expression count
grows as O(nb * nv^2) (FK composition + CRBA + unrolled Cholesky), and at
the 25-body / nv=30 humanoid the PYTHON TRACE alone exceeds 25 minutes —
the hybrid is parity-tested at that scale
(tests/test_tilestep_hybrid.py::TestHumanoidHybrid, DIFFDART_SLOW_TESTS
gate) but is not a practical production path there; the batched vmap step
(98k fwd / 46k fwd+grad steps/s on one chip with contact_budget=16) is the
humanoid's production path. The hybrid's sweet spot is locomotion-scale
trees whose D exceeds the 'tile' LCP's O(D^2) trace budget but whose nv
keeps the dynamics trace tractable (nv <~ 15).

Solver-fidelity scope: the fully-traced tile LCP (_tile_lcp, lcp='tile')
runs the Jacobi + Woodbury-polish chain WITHOUT the single-flip pivot
refinement of ops/lcp_pivot.py — a data-dependent while_loop has no
trace-time tile form. The hybrid lcp='xla' mode and the vmap path both
include it (Model.lcp_pivot_iters). On rank-deficient contact sets the
tile path can therefore settle on a slightly different (policy-iteration)
impulse; cross-path agreement in the default config is gated at trajectory
level by tests/test_drift.py, per-step parity at lcp_pivot_iters=0 by
tests/test_tilestep.py.

Gradient semantics match ops/lcp_lowrank.py: the LCP warm start + all but
the final polish pass sit behind stop_gradient, and the final pass solves
the active-set KKT system from scratch — differentiating through that solve
IS the implicit-function-theorem gradient (same algebra as the custom_vjp,
without the custom_vjp).

Capability parity anchors: World::step / BoxedLcpConstraintSolver /
ConstrainedGroupGradientMatrices (SURVEY.md §2.1, §2.2, §3.1).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from diffdart_tpu.dynamics.model import GeomType, JointType, Model
from diffdart_tpu.ops import tile as T


class TileStepUnsupported(NotImplementedError):
    pass


def _sg(x):
    if x is None or isinstance(x, (int, float)):
        return x
    return jax.lax.stop_gradient(x)


def _barrier(xs, enabled: bool = True):
    """Materialization fence over a list of tile elements.

    Highly-reused expression chains (Minv, each LCP sweep's lam) otherwise
    get duplicated into every consumer by XLA fusion; an
    optimization_barrier pins each shared value to one materialization.
    NOTE XLA:CPU expands barriers away before fusion, so on CPU the real
    protection is the tuple-of-tiles output format (no concatenate-rooted
    fusions — their elemental emitter re-evaluates operand chains per output
    element; observed 13 s per jnp.stack of a 2k-op chain on CPU).
    Constants/Nones pass through untouched.

    `enabled=False` (build_pallas_step inside the Mosaic kernel) makes this
    a no-op; the flag is threaded through closures, never module state, so
    interleaved/nested traces of barrier and no-barrier builds can't
    cross-contaminate."""
    if not enabled:
        return list(xs)
    live_idx = [i for i, x in enumerate(xs) if not T.is_const(x)]
    if not live_idx:
        return list(xs)
    fenced = jax.lax.optimization_barrier(tuple(xs[i] for i in live_idx))
    out = list(xs)
    for i, f in zip(live_idx, fenced):
        out[i] = f
    return out


def _dot6(a, b):
    """a, b: ((w0,w1,w2),(v0,v1,v2)) 6-vectors as (w, v) pairs of lists."""
    return T.add(T.dot(a[0], b[0]), T.dot(a[1], b[1]))


def _tangent_basis_const(n):
    """Constant-normal tangent basis matching constraints.assembly.tangent_basis."""
    n = np.asarray(n, float)
    ax = int(np.argmin(np.abs(n)))
    e = np.eye(3)[ax]
    t1 = np.cross(n, e)
    t1 = t1 / np.linalg.norm(t1)
    t2 = np.cross(n, t1)
    return t1, t2


def build_tile_step(model: Model, output: str = "stacked", barriers: bool = True,
                    lcp: str = "auto"):
    """Specialize the full constrained step for `model`.

    output='stacked': step(q, v, tau) on stacked tiles of shape (nq|nv, S, L)
    (any S, L; (8, 128k) is the hardware layout) -> (q', v') same shapes.
    output='tiles': step(q_tuple, v_tuple, tau_tuple) on tuples of (S, L)
    tiles -> (q'_tuple, v'_tuple). Prefer 'tiles' inside lax.scan loops —
    it avoids concatenate-rooted fusions whose XLA:CPU elemental emitter
    re-evaluates the whole step chain per output element (see _barrier).

    barriers=False drops the optimization_barrier fences (used inside Pallas
    kernels, where Mosaic compiles the straight-line body directly).

    lcp: 'tile' runs the fully-unrolled trace-time LCP (_tile_lcp — every
    A entry a scalar expression; right for small D); 'xla' materializes the
    assembled rows into batched dense (B, D, nv) arrays and solves with the
    vmapped lowrank chain incl. pivot refinement (ops/lcp_lowrank) — the
    HYBRID path for big-D models (Atlas-class humanoid: D ~ 141), where the
    D^2 trace of the tile LCP would explode but fused tile dynamics/FK/
    assembly still pay; 'auto' picks 'xla' when D > 64. 'xla' cannot run
    inside a Pallas kernel (it needs a custom_vjp solve) — build_pallas_step
    rejects such models; scan the jitted tile step instead
    (ops/pallas_step.rollout_tiled dispatches automatically).
    """
    nb, nv, nq = model.nbody, model.nv, model.nq
    jt = tuple(int(j) for j in model.jtype)
    parent = tuple(int(p) for p in model.parent)
    q_off = tuple(int(o) for o in model.q_off)
    v_off = tuple(int(o) for o in model.v_off)
    X_rot = np.asarray(model.X_rot, float)
    X_pos = np.asarray(model.X_pos, float)
    axis = np.asarray(model.axis, float)
    axis2 = np.asarray(model.axis2, float)
    mass = np.asarray(model.mass, float)
    com = np.asarray(model.com, float)
    inertia = np.asarray(model.inertia, float)
    damping = np.asarray(model.damping, float)
    armature = np.asarray(model.armature, float)
    spring = np.asarray(model.spring_stiff, float)
    q_rest = np.asarray(model.q_rest, float)
    anc = np.asarray(model.ancestor_mask, float)  # (nb, nv) 0/1
    grav = np.asarray(model.gravity, float)
    dt = float(model.dt)
    cfm = float(model.contact_cfm)
    erp = float(model.baumgarte_erp)

    ok_joints = {
        JointType.REVOLUTE, JointType.PRISMATIC, JointType.PLANAR,
        JointType.WELD, JointType.FREE, JointType.BALL,
    }
    for j in jt:
        if j not in ok_joints:
            raise TileStepUnsupported(f"tile step: joint type {j} not supported yet")
    if model.ball_pairs or model.weld_pairs or model.mimic_pairs:
        raise TileStepUnsupported(
            "tile step: bilateral/mimic rows not supported yet")
    # servo (ServoMotorConstraint) / joint-Coulomb-friction rows are constant
    # symmetric-box LCP rows. Their targets/limits are baked as TRACE
    # CONSTANTS here (the fused step is specialized per model anyway);
    # changing servo_target/force_limit/joint_friction requires a rebuild —
    # the vmap path keeps them as traced leaves.
    servo = tuple(int(d) for d in model.servo_dofs)
    fric = tuple(int(d) for d in model.friction_dofs)
    nservo, nfric = len(servo), len(fric)
    servo_tgt = np.asarray(model.servo_target, float) if nservo else None
    servo_lim = np.asarray(model.force_limit, float) if nservo else None
    joint_mu = np.asarray(model.joint_friction, float) if nfric else None
    if int(getattr(model, "pair_budget", 0) or 0):
        raise TileStepUnsupported("tile step: AABB pair-budget broadphase not supported yet")

    # v-index -> q-index map (identity for scalar joints; None for quaternion
    # dofs, where springs/limits are unsupported in the tiled subset)
    dof_qidx = [None] * nv
    for i in range(nb):
        if jt[i] in (JointType.FREE, JointType.BALL):
            continue
        nvj = {JointType.WELD: 0, JointType.REVOLUTE: 1, JointType.PRISMATIC: 1, JointType.PLANAR: 3}[jt[i]]
        for k in range(nvj):
            dof_qidx[v_off[i] + k] = q_off[i] + k
    for i in range(nv):
        if dof_qidx[i] is None and float(spring[i]) != 0.0:
            raise TileStepUnsupported("tile step: joint springs on quaternion dofs not supported")
    if model.enable_joint_limits:
        for d in model.limited_dofs:
            if dof_qidx[int(d)] is None:
                raise TileStepUnsupported("tile step: joint limits on quaternion dofs not supported")

    # ---- static collision plan: (body, geom consts) per pair, plane side const
    # Materialize numpy copies of the geom leaves BEFORE indexing: indexing a
    # concrete jnp array under an active jit trace (e.g. rollout_tiled called
    # inside jax.jit(jax.grad(...))) stages a traced slice, which then fails
    # np.asarray. Whole-array np.asarray of a concrete closure constant is
    # always safe.
    g_rot = np.asarray(model.geom_rot, float)
    g_pos = np.asarray(model.geom_pos, float)
    g_size = np.asarray(model.geom_size, float)
    g_fric = np.asarray(model.geom_friction, float)
    g_rest = np.asarray(model.geom_restitution, float)
    plan = []
    gt = model.geom_type
    _vs_plane = (GeomType.CAPSULE, GeomType.SPHERE, GeomType.BOX, GeomType.CONVEX)
    for (a, b) in model.col_pairs:
        ta, tb = gt[a], gt[b]
        if tb == GeomType.PLANE and ta in _vs_plane:
            g, pl = a, b
        elif ta == GeomType.PLANE and tb in _vs_plane:
            g, pl = b, a
        else:
            raise TileStepUnsupported(f"tile step: pair types ({ta},{tb}) not supported yet")
        if model.geom_body[pl] >= 0:
            raise TileStepUnsupported("tile step: moving plane not supported")
        n_w = g_rot[pl][:, 2]
        p_pl = g_pos[pl]
        fr = float(min(g_fric[g], g_fric[pl]))
        rest = float(g_rest[g] * g_rest[pl])
        entry = dict(
            body=int(model.geom_body[g]),
            gtype=int(gt[g]),
            size=g_size[g],
            grot=g_rot[g],
            gpos=g_pos[g],
            n=n_w,
            p_pl=p_pl,
            friction=fr,
            restitution=rest,
        )
        if gt[g] == GeomType.CONVEX:
            # real (unpadded) hull vertices, geom-local, as trace constants
            h = model.geom_hull[g]
            vc = int(model.hull_vcounts[h])
            entry["verts"] = np.asarray(model.hull_verts, float)[h][:vc]
        plan.append(entry)
    # slots per pair: box 8 (all corners), capsule 2, sphere 1, convex hull 4
    # (k deepest vertices) — must match collide._DISPATCH /
    # _DISPATCH_HULL_SLOTS so row layout agrees with the vmap path
    _slot_table = {
        GeomType.BOX: 8, GeomType.CAPSULE: 2, GeomType.SPHERE: 1,
        GeomType.CONVEX: 4,
    }
    slots = [_slot_table[p["gtype"]] for p in plan]
    nc = sum(slots)
    lim = tuple(int(d) for d in model.limited_dofs) if model.enable_joint_limits else ()
    nlim = len(lim)
    q_lo = np.asarray(model.q_lo, float)
    q_hi = np.asarray(model.q_hi, float)
    D = 3 * nc + 2 * nlim + nservo + nfric
    # contact budget: top-K deepest valid slots enter the LCP
    # (collision/collide.select_contacts semantics — lax.top_k on the masked
    # depth score). Only the hybrid xla mode supports the per-env gather;
    # the fully-traced tile LCP has no runtime row permutation.
    budget = int(getattr(model, "contact_budget", 0) or 0)
    K_budget = budget if (budget and budget < nc) else 0
    D_eff = 3 * (K_budget or nc) + 2 * nlim + nservo + nfric
    iters = int(model.contact_iters)
    polish_passes = 2 if model.lcp_polish else 0
    if lcp == "auto":
        lcp = "xla" if (D_eff > 64 or K_budget) else "tile"
    if lcp not in ("tile", "xla"):
        raise ValueError(f"build_tile_step: unknown lcp mode {lcp!r}")
    if K_budget and lcp == "tile":
        raise TileStepUnsupported(
            "tile step: contact-budget top-K selection requires the hybrid "
            "lcp='xla' mode (per-env row gather has no trace-time tile form)")
    if lcp == "xla" and not barriers:
        # barriers=False marks a Pallas/Mosaic kernel body; the xla LCP's
        # custom_vjp solve cannot live inside a kernel
        raise TileStepUnsupported(
            "tile step: hybrid xla-LCP models cannot run inside a Pallas "
            "kernel; scan the jitted tile step instead"
        )

    anc_dofs = [tuple(int(j) for j in np.nonzero(anc[b])[0]) for b in range(nb)]

    def step(q_st, v_st, tau_st):
        q = [q_st[i] for i in range(nq)]
        v = [v_st[i] for i in range(nv)]
        tau = [tau_st[i] for i in range(nv)]
        zero_like = q_st[0] * 0.0  # tile of zeros for materialization

        # ---------------- FK ----------------
        R = [None] * nb
        P = [None] * nb
        for i in range(nb):
            o = q_off[i]
            if jt[i] == JointType.REVOLUTE:
                Rj = T.exp_so3_const_axis(axis[i], q[o])
                pj = [None, None, None]
            elif jt[i] == JointType.PRISMATIC:
                Rj = T.eye3()
                pj = T.vscale([float(a) for a in axis[i]], q[o])
            elif jt[i] == JointType.PLANAR:
                n_ax = np.cross(axis[i], axis2[i])
                Rj = T.exp_so3_const_axis(n_ax, q[o + 2])
                pj = T.vadd(
                    T.vscale([float(a) for a in axis[i]], q[o]),
                    T.vscale([float(a) for a in axis2[i]], q[o + 1]),
                )
            elif jt[i] == JointType.FREE:
                Rj = T.quat_to_mat_t(T.quat_normalize_t([q[o], q[o + 1], q[o + 2], q[o + 3]]))
                pj = [q[o + 4], q[o + 5], q[o + 6]]
            elif jt[i] == JointType.BALL:
                # quaternion-parameterized spherical joint
                # (joints.joint_transform BALL parity)
                Rj = T.quat_to_mat_t(T.quat_normalize_t([q[o], q[o + 1], q[o + 2], q[o + 3]]))
                pj = [None, None, None]
            else:  # WELD
                Rj = T.eye3()
                pj = [None, None, None]
            Xr = [[float(X_rot[i][r, c]) or None for c in range(3)] for r in range(3)]
            Xp = [float(x) or None for x in X_pos[i]]
            R_pc, p_pc = T.tf_compose_t(Xr, Xp, Rj, pj)
            if parent[i] < 0:
                R[i], P[i] = R_pc, p_pc
            else:
                R[i], P[i] = T.tf_compose_t(R[parent[i]], P[parent[i]], R_pc, p_pc)

        # ---------------- world Jacobian columns Sw (per dof) ----------------
        Sw = [None] * nv  # (w, v) pairs of len-3 lists
        dof_body = [None] * nv
        # local subspace rows per body (child frame) for the sdot extra terms
        for i in range(nb):
            o = v_off[i]
            if jt[i] == JointType.REVOLUTE:
                rows = [([float(a) or None for a in axis[i]], [None] * 3)]
            elif jt[i] == JointType.PRISMATIC:
                rows = [([None] * 3, [float(a) or None for a in axis[i]])]
            elif jt[i] == JointType.PLANAR:
                n_ax = np.cross(axis[i], axis2[i])
                # Rj^T @ axis: columns of Rj dotted with axis
                Rj = T.exp_so3_const_axis(n_ax, q[q_off[i] + 2])
                ra = T.matTvec3(Rj, [float(a) for a in axis[i]])
                rb = T.matTvec3(Rj, [float(a) for a in axis2[i]])
                rows = [([None] * 3, ra), ([None] * 3, rb), ([float(x) or None for x in n_ax], [None] * 3)]
            elif jt[i] == JointType.FREE:
                # S = I6 in the child frame: 3 angular then 3 linear unit rows
                rows = [([1.0 if a == k else None for a in range(3)], [None] * 3) for k in range(3)]
                rows += [([None] * 3, [1.0 if a == k else None for a in range(3)]) for k in range(3)]
            elif jt[i] == JointType.BALL:
                # S = [I3 | 0] in the child frame (joints.motion_subspace BALL)
                rows = [([1.0 if a == k else None for a in range(3)], [None] * 3) for k in range(3)]
            else:
                rows = []
            for k, (w_l, v_l) in enumerate(rows):
                ww, vv = T.spatial_transform_motion(R[i], P[i], w_l, v_l)
                Sw[o + k] = (ww, vv)
                dof_body[o + k] = i

        # ---------------- body velocities ----------------
        V = []  # (w, v) per body
        for b in range(nb):
            w_acc = [None] * 3
            v_acc = [None] * 3
            for j in anc_dofs[b]:
                w_acc = T.vadd(w_acc, T.vscale(Sw[j][0], v[j]))
                v_acc = T.vadd(v_acc, T.vscale(Sw[j][1], v[j]))
            V.append((w_acc, v_acc))

        # ---------------- world spatial inertia (structured) ----------------
        # I_w applied to a motion (w, v) about the world origin:
        #   n = Ic_w w - m c x (c x w) + m c x v;  f = m v - m c x w
        Iw = []
        for b in range(nb):
            c_w = T.vadd(T.matvec3(R[b], [float(x) for x in com[b]]), P[b])
            Ic = [[float(inertia[b][r, c]) or None for c in range(3)] for r in range(3)]
            Ic_w = T.matmul3(T.matmul3(R[b], Ic), T.transpose3(R[b]))
            Iw.append((float(mass[b]), c_w, Ic_w))

        def iw_apply(b, w, vl):
            m, c, Ic_w = Iw[b]
            cxw = T.cross3(c, w)
            n = T.vadd(
                T.matvec3(Ic_w, w),
                T.vscale(T.vsub(T.cross3(c, vl), T.cross3(c, cxw)), m),
            )
            f = T.vsub(T.vscale(vl, m), T.vscale(cxw, m))
            return n, f

        # ---------------- mass matrix ----------------
        M = [[None] * nv for _ in range(nv)]
        for b in range(nb):
            F_cols = {}
            for j in anc_dofs[b]:
                F_cols[j] = iw_apply(b, Sw[j][0], Sw[j][1])
            for jj in anc_dofs[b]:
                for ii in anc_dofs[b]:
                    if ii > jj:
                        continue
                    M[ii][jj] = T.add(M[ii][jj], _dot6(Sw[ii], F_cols[jj]))
        for i in range(nv):
            extra = float(armature[i]) + dt * float(damping[i]) + dt * dt * float(spring[i])
            M[i][i] = T.add(M[i][i], extra)
            for j in range(i):
                M[i][j] = M[j][i]

        # ---------------- bias forces C ----------------
        # sdot_j = ad_{V_b} Sw_j (+ dS/dq for PLANAR translation rows)
        sdot = [None] * nv
        for j in range(nv):
            b = dof_body[j]
            w1, u1 = V[b]
            w2, u2 = Sw[j]
            sw = T.cross3(w1, w2)
            sv = T.vadd(T.cross3(w1, u2), T.cross3(u1, w2))
            i_body = b
            if jt[i_body] == JointType.PLANAR and (j - v_off[i_body]) in (0, 1):
                # d/dt (Rj^T a) = -q2dot (n x (Rj^T a)); world lin = R_b @ that
                n_ax = np.cross(axis[i_body], axis2[i_body])
                k = j - v_off[i_body]
                a_c = axis[i_body] if k == 0 else axis2[i_body]
                Rj = T.exp_so3_const_axis(n_ax, q[q_off[i_body] + 2])
                rta = T.matTvec3(Rj, [float(x) for x in a_c])
                dlin = T.vscale(T.cross3([float(x) or None for x in n_ax], rta), v[v_off[i_body] + 2])
                sv = T.vsub(sv, T.matvec3(R[i_body], dlin))
            sdot[j] = (sw, sv)
        C = [None] * nv
        a_grav_w = [None] * 3
        a_grav_v = [float(g) or None for g in grav]
        for b in range(nb):
            aw = [None] * 3
            av = [T.neg(x) for x in a_grav_v]
            for j in anc_dofs[b]:
                aw = T.vadd(aw, T.vscale(sdot[j][0], v[j]))
                av = T.vadd(av, T.vscale(sdot[j][1], v[j]))
            del a_grav_w
            a_grav_w = [None] * 3
            Fn, Ff = iw_apply(b, aw, av)
            # + V x* (I V)
            nIV, fIV = iw_apply(b, V[b][0], V[b][1])
            w1, u1 = V[b]
            Fn = T.vadd(Fn, T.vadd(T.cross3(w1, nIV), T.cross3(u1, fIV)))
            Ff = T.vadd(Ff, T.cross3(w1, fIV))
            for i in anc_dofs[b]:
                C[i] = T.add(C[i], _dot6(Sw[i], (Fn, Ff)))

        # ---------------- unconstrained velocity ----------------
        rhs = []
        for i in range(nv):
            f_j = T.mul(-float(damping[i]), v[i])
            if float(spring[i]):
                # scalar-joint tangent == its q entry (dof_qidx maps v->q
                # indices past quaternion joints)
                f_j = T.sub(f_j, T.mul(float(spring[i]), T.add(T.sub(q[dof_qidx[i]], float(q_rest[i])), T.mul(dt, v[i]))))
            rhs.append(T.add(tau[i], T.sub(f_j, C[i])))
        # Minv columns + v_star (one factorization, nv substitutions)
        L_M = T.chol_factor(M)
        Minv = [[None] * nv for _ in range(nv)]
        for k in range(nv):
            e = [1.0 if i == k else None for i in range(nv)]
            col = T.chol_solve(L_M, e)
            for i in range(nv):
                Minv[i][k] = col[i]
        # fence: Minv feeds every LCP sweep; without this XLA fusion clones
        # the whole Cholesky chain into each consumer (see _barrier)
        flat = _barrier([Minv[i][k] for i in range(nv) for k in range(nv)], barriers)
        for i in range(nv):
            for k in range(nv):
                Minv[i][k] = flat[i * nv + k]
        v_star = [
            T.add(v[i], T.mul(dt, T.dot(Minv[i], rhs))) for i in range(nv)
        ]
        v_star = _barrier(v_star, barriers)

        if D == 0:
            v_new = v_star
            q_new = _integrate(q, v_new)
            return q_new, v_new

        # ---------------- collision (capsule/sphere vs fixed plane) ----------
        # contact slot lists (order matches the grouped narrowphase plan:
        # all pairs share one fn type here, slots in pair order)
        con_pos = []  # world point, len-3 element list
        con_depth = []
        con_valid = []
        con_n = []  # constant normal (floats)
        con_body = []
        con_mu = []
        con_rest = []
        for pidx, pp in enumerate(plan):
            b = pp["body"]
            Rg, pg = T.tf_compose_t(
                R[b],
                P[b],
                [[float(pp["grot"][r, c]) or None for c in range(3)] for r in range(3)],
                [float(x) or None for x in pp["gpos"]],
            )
            n_c = [float(x) for x in pp["n"]]
            p_pl = [float(x) for x in pp["p_pl"]]
            if pp["gtype"] == GeomType.BOX:
                # box-plane: all 8 corners (narrowphase.box_plane parity):
                # depth = -(c - pb).n, pos = c + 0.5 depth n
                half = [float(x) for x in pp["size"]]
                for sx in (-1.0, 1.0):
                    for sy in (-1.0, 1.0):
                        for sz in (-1.0, 1.0):
                            loc = [half[0] * sx, half[1] * sy, half[2] * sz]
                            cpt = T.vadd(T.matvec3(Rg, loc), pg)
                            depth = T.neg(T.dot(T.vsub(cpt, p_pl), n_c))
                            pos = T.vadd(cpt, T.vscale(n_c, T.mul(0.5, depth)))
                            con_pos.append(pos)
                            con_depth.append(depth)
                            con_valid.append(T.gt0(depth, zero_like))
                            con_n.append(n_c)
                            con_body.append(b)
                            con_mu.append(pp["friction"])
                            con_rest.append(pp["restitution"])
                continue
            if pp["gtype"] == GeomType.CONVEX:
                # convex-plane: all hull verts are candidates, the k=4
                # deepest become slots (collision/convex.convex_plane parity:
                # depth = p_pl.n - w.n, pos = the vertex itself, stable
                # index tie-break)
                off = float(np.dot(pp["p_pl"], pp["n"]))
                depths, poss = [], []
                for vloc in pp["verts"]:
                    w = T.vadd(T.matvec3(Rg, [float(x) or None for x in vloc]), pg)
                    depths.append(T.sub(off, T.dot(w, n_c)))
                    poss.append(w)
                for d_s, pos_s in _topk_tile_slots(depths, poss, 4, zero_like):
                    con_pos.append(pos_s)
                    con_depth.append(d_s)
                    con_valid.append(T.gt0(d_s, zero_like))
                    con_n.append(n_c)
                    con_body.append(b)
                    con_mu.append(pp["friction"])
                    con_rest.append(pp["restitution"])
                continue
            r_g = float(pp["size"][0])
            if pp["gtype"] == GeomType.CAPSULE:
                hl = float(pp["size"][1])
                ax_w = [Rg[0][2], Rg[1][2], Rg[2][2]]
                ends = [T.vsub(pg, T.vscale(ax_w, hl)), T.vadd(pg, T.vscale(ax_w, hl))]
            else:
                ends = [pg]
            for cpt in ends:
                # depth = r - (c - p_pl) . n
                dvec = T.vsub(cpt, p_pl)
                depth = T.sub(r_g, T.dot(dvec, n_c))
                pos = T.vsub(cpt, T.vscale(n_c, T.sub(r_g, T.mul(0.5, depth))))
                con_pos.append(pos)
                con_depth.append(depth)
                con_valid.append(T.gt0(depth, zero_like))
                con_n.append(n_c)
                con_body.append(b)
                con_mu.append(pp["friction"])
                con_rest.append(pp["restitution"])

        # ---------------- constraint rows ----------------
        # layout: [nc normals | nc t1 | nc t2 | nlim lower | nlim upper |
        #          nservo | nfric]  (assembly.build_lcp row-order parity)
        # bounds: box_c[i]=None means lo=0/hi=inf (contacts, limits; friction
        # rows get the moving +-mu*lam_n box via fidx); box_c[i]=c means the
        # constant symmetric box [-c, +c] (servo / joint-Coulomb rows).
        J_rows = [None] * D  # dict dof -> element
        b_vec = [None] * D
        box_c = [None] * D
        valid = [None] * D
        mu_row = [0.0] * D
        fidx = [-1] * D
        for c in range(nc):
            bdy = con_body[c]
            n_c = con_n[c]
            t1_c, t2_c = _tangent_basis_const(n_c)
            lin = {}
            for j in anc_dofs[bdy]:
                lin[j] = T.vadd(Sw[j][1], T.cross3(Sw[j][0], con_pos[c]))
            row_n = {j: T.dot(lin[j], n_c) for j in lin}
            row_t1 = {j: T.dot(lin[j], [float(x) for x in t1_c]) for j in lin}
            row_t2 = {j: T.dot(lin[j], [float(x) for x in t2_c]) for j in lin}
            J_rows[c] = row_n
            J_rows[nc + c] = row_t1
            J_rows[2 * nc + c] = row_t2
            push = T.minimum(
                T.mul(erp / dt, T.maximum(T.sub(con_depth[c], 1e-5), None)), 2.0
            )
            target = push
            if con_rest[c]:
                vn_pre = T.dot([row_n.get(j) for j in range(nv)], v)
                bounce = T.mul(con_rest[c], T.maximum(T.sub(T.neg(vn_pre), 0.01), None))
                target = T.maximum(push, bounce)
            b_vec[c] = T.sub(_sparse_dot(row_n, v_star), target)
            b_vec[nc + c] = _sparse_dot(row_t1, v_star)
            b_vec[2 * nc + c] = _sparse_dot(row_t2, v_star)
            valid[c] = valid[nc + c] = valid[2 * nc + c] = con_valid[c]
            mu_row[nc + c] = con_mu[c]
            mu_row[2 * nc + c] = con_mu[c]
            fidx[nc + c] = c
            fidx[2 * nc + c] = c
        for li, dof in enumerate(lim):
            lo_c, hi_c = float(q_lo[dof]), float(q_hi[dof])
            qd = q[dof_qidx[dof]]
            # lower limit row
            viol_lo = T.sub(lo_c, qd)
            pred_lo = T.sub(lo_c, T.add(qd, T.mul(dt, v[dof])))
            act_lo = jax.lax.bitwise_or(T.gt0(viol_lo, zero_like), T.gt0(pred_lo, zero_like))
            t_lo = T.minimum(T.mul(erp / dt, T.maximum(viol_lo, None)), 2.0)
            J_rows[3 * nc + li] = {dof: 1.0}
            b_vec[3 * nc + li] = T.sub(v_star[dof], t_lo)
            valid[3 * nc + li] = act_lo
            # upper limit row
            viol_hi = T.sub(qd, hi_c)
            pred_hi = T.sub(T.add(qd, T.mul(dt, v[dof])), hi_c)
            act_hi = jax.lax.bitwise_or(T.gt0(viol_hi, zero_like), T.gt0(pred_hi, zero_like))
            t_hi = T.minimum(T.mul(erp / dt, T.maximum(viol_hi, None)), 2.0)
            J_rows[3 * nc + nlim + li] = {dof: -1.0}
            b_vec[3 * nc + nlim + li] = T.sub(T.neg(v_star[dof]), t_hi)
            valid[3 * nc + nlim + li] = act_hi
        base = 3 * nc + 2 * nlim
        for si, dof in enumerate(servo):
            # velocity servo: drive v[dof] -> servo_target within +-F*dt
            # impulse (ServoMotorConstraint / assembly.build_lcp parity)
            J_rows[base + si] = {dof: 1.0}
            b_vec[base + si] = T.sub(v_star[dof], float(servo_tgt[dof]))
            valid[base + si] = True
            box_c[base + si] = float(servo_lim[dof]) * dt
        for fi, dof in enumerate(fric):
            # joint Coulomb friction: drive v[dof] -> 0 within +-mu*dt
            # (JointCoulombFrictionConstraint parity)
            i_row = base + nservo + fi
            J_rows[i_row] = {dof: 1.0}
            b_vec[i_row] = v_star[dof]
            valid[i_row] = True
            box_c[i_row] = float(joint_mu[dof]) * dt

        if lcp == "xla":
            v_new = _xla_lcp_vnew(
                model, J_rows, b_vec, valid, mu_row, fidx, M, v_star, nv, D,
                cfm, iters, polish_passes, zero_like,
                budget_k=K_budget, nc=nc, con_depth=con_depth, box_c=box_c,
            )
        else:
            lam = _tile_lcp(
                J_rows, b_vec, valid, mu_row, fidx, M, Minv, nv, D, cfm, iters,
                polish_passes, zero_like, barriers, box_c,
            )

            # v_new = v_star + Minv J^T lam
            jt_lam = [None] * nv
            for i in range(D):
                for j, el in J_rows[i].items():
                    jt_lam[j] = T.fma(jt_lam[j], el, lam[i])
            v_new = [T.add(v_star[k], T.dot(Minv[k], jt_lam)) for k in range(nv)]
        q_new = _integrate(q, v_new)
        return q_new, v_new

    def _integrate(q, v_new):
        """Geometric position integration (joints.integrate_joint parity):
        scalar joints q' = q + dt v; FREE joints quaternion-exponential
        update with child-frame linear velocity."""
        _scalar_nv = {JointType.WELD: 0, JointType.REVOLUTE: 1, JointType.PRISMATIC: 1, JointType.PLANAR: 3}
        out = list(q)
        for i in range(nb):
            o, vo = q_off[i], v_off[i]
            if jt[i] in (JointType.FREE, JointType.BALL):
                quat = T.quat_normalize_t([q[o + k] for k in range(4)])
                w_dt = [T.mul(dt, v_new[vo + k]) for k in range(3)]
                new_quat = T.quat_normalize_t(T.quat_mul_t(quat, T.quat_exp_t(w_dt)))
                for k in range(4):
                    out[o + k] = new_quat[k]
                if jt[i] == JointType.FREE:
                    Rq = T.quat_to_mat_t(quat)
                    dp = T.vscale(T.matvec3(Rq, [v_new[vo + 3 + k] for k in range(3)]), dt)
                    for k in range(3):
                        out[o + 4 + k] = T.add(q[o + 4 + k], dp[k])
            else:
                for k in range(_scalar_nv[jt[i]]):
                    out[o + k] = T.add(q[o + k], T.mul(dt, v_new[vo + k]))
        return out

    def step_tiles(q_t, v_t, tau_t):
        qn, vn = step(q_t, v_t, tau_t)
        like = q_t[0]
        return (
            tuple(T.materialize(x, like) for x in qn),
            tuple(T.materialize(x, like) for x in vn),
        )

    def step_stacked(q_st, v_st, tau_st):
        qn, vn = step_tiles(
            tuple(q_st[i] for i in range(nq)),
            tuple(v_st[i] for i in range(nv)),
            tuple(tau_st[i] for i in range(nv)),
        )
        return jnp.stack(qn), jnp.stack(vn)

    if output == "tiles":
        return step_tiles
    return step_stacked


def _sparse_dot(row: dict, vec):
    acc = None
    for j, el in row.items():
        acc = T.fma(acc, el, vec[j])
    return acc


def _topk_tile_slots(depths, poss, k, zero_like):
    """Per-env top-k deepest candidates as fixed slots, in tile algebra.

    Parity with collision/convex._topk_contacts (argsort(-score)[:k], stable):
    slots come out depth-descending, ties broken by LOWER candidate index.
    Selection is a running strict-greater max (later equal values never
    replace) followed by a first-match sweep; the winner's masked score is
    then dropped to -1e30 so the next slot picks the next candidate.
    ~7n tile ops per slot."""
    lax = jax.lax
    n = len(depths)
    ms = [T.materialize(d, zero_like) for d in depths]  # masked scores
    out = []
    for _ in range(min(k, n)):
        best = ms[0]
        for j in range(1, n):
            best = lax.max(best, ms[j])
        found = None
        sel_depth = None
        sel_pos = [None, None, None]
        for j in range(n):
            eq = lax.eq(ms[j], best)  # bit-exact: best IS one of the ms values
            sel_j = eq if found is None else lax.bitwise_and(eq, lax.bitwise_not(found))
            found = sel_j if found is None else lax.bitwise_or(found, sel_j)
            sel_depth = T.where(sel_j, depths[j], sel_depth)
            for a in range(3):
                sel_pos[a] = T.where(sel_j, poss[j][a], sel_pos[a])
            ms[j] = lax.select(sel_j, lax.full_like(ms[j], -1e30), ms[j])
        out.append((sel_depth, sel_pos))
    while len(out) < k:  # hulls with fewer verts than k: dead slots
        out.append((None, [None, None, None]))
    return out


def _xla_lcp_vnew(model, J_rows, b_vec, valid, mu_row, fidx, M, v_star, nv, D,
                  cfm, iters, passes, zero_like, budget_k=0, nc=0,
                  con_depth=None, box_c=None):
    """Hybrid LCP backend for big-D models (Atlas-class humanoid): the
    tile-assembled rows materialize into batched dense (B, D, nv) arrays and
    the solve runs through the SAME vmapped lowrank chain as the canonical
    path (ops/lcp_lowrank.boxed_lcp_lowrank: Pallas/Jacobi sweeps + Woodbury
    polish + pivot refinement + IFT custom_vjp — so gradients, robustness
    and the f64 island all carry over). Returns v_new as a tile list.

    The D^2 trace of _tile_lcp is quadratic in row count; at the humanoid's
    D ~ 141 it would dominate compile and program size. Dense (B, D, nv)
    batched matmuls on the MXU are the memory-hierarchy-correct layout at
    that size; the tile layer still owns FK/dynamics/Minv/assembly, which is
    where trace-time constant folding wins."""
    from diffdart_tpu.ops.lcp_lowrank import boxed_lcp_lowrank
    from diffdart_tpu.ops.smalllinalg import cholesky_small, cho_solve_small

    dtype = zero_like.dtype
    S_, L_ = zero_like.shape
    B = S_ * L_

    def envf(x):
        """(lead..., S, L) -> (B, lead...)."""
        flat = x.reshape(x.shape[:-2] + (B,))
        return jnp.moveaxis(flat, -1, 0)

    Jd = jnp.stack([
        jnp.stack([T.materialize(J_rows[i].get(j), zero_like) for j in range(nv)])
        for i in range(D)
    ])  # (D, nv, S, L)
    bd = jnp.stack([T.materialize(x, zero_like) for x in b_vec])  # (D, S, L)
    vd = jnp.stack([
        jnp.broadcast_to(v, zero_like.shape) if hasattr(v, "shape") else
        jnp.full(zero_like.shape, bool(v))
        for v in valid
    ])  # (D, S, L) bool
    Md = jnp.stack([
        jnp.stack([T.materialize(M[a][c], zero_like) for c in range(nv)])
        for a in range(nv)
    ])  # (nv, nv, S, L)
    vsd = jnp.stack([T.materialize(x, zero_like) for x in v_star])  # (nv, S, L)

    J_b = envf(Jd)  # (B, D, nv)
    b_b = envf(bd)  # (B, D)
    v_b = envf(vd)  # (B, D) bool
    M_b = envf(Md)  # (B, nv, nv)
    vs_b = envf(vsd)  # (B, nv)

    inf = jnp.asarray(jnp.inf, dtype)
    # per-row constant bounds: lo=0/hi=inf default; box_c rows are the
    # constant symmetric boxes [-c, +c] (servo / joint-Coulomb rows)
    lo_np = np.zeros(D)
    hi_np = np.full(D, np.inf)
    for i, c in enumerate(box_c or ()):
        if c is not None:
            lo_np[i], hi_np[i] = -c, c
    lo_row = jnp.asarray(lo_np, dtype)  # (D,)
    hi_row = jnp.asarray(hi_np, dtype)
    if budget_k:
        # contact budget: per-env top-K deepest valid slots
        # (collide.select_contacts parity: lax.top_k on the masked depth
        # score — stable, lowest slot index wins ties). Rows are gathered in
        # the [K normals | K t1 | K t2 | limit rows] layout; the limit rows
        # pass through unselected.
        K = budget_k
        nlim2 = D - 3 * nc  # both limit-row blocks
        depth_b = envf(jnp.stack([T.materialize(d, zero_like) for d in con_depth]))
        score = jnp.where(v_b[:, :nc], depth_b, -inf)
        _, idx = jax.lax.top_k(score, K)  # (B, K)
        lim_rows = jnp.broadcast_to(
            jnp.arange(3 * nc, D, dtype=idx.dtype), (B, nlim2)
        )
        rows_idx = jnp.concatenate([idx, idx + nc, idx + 2 * nc, lim_rows], axis=1)
        J_b = jnp.take_along_axis(J_b, rows_idx[:, :, None], axis=1)
        b_b = jnp.take_along_axis(b_b, rows_idx, axis=1)
        v_b = jnp.take_along_axis(v_b, rows_idx, axis=1)
        lo_g = lo_row[rows_idx]  # (B, D_eff)
        hi_g = hi_row[rows_idx]
        # per-slot friction gathers with the slots; fidx becomes the static
        # budget pattern (t-row i couples to normal row i)
        mu_slot = jnp.asarray(np.asarray(mu_row[nc:2 * nc]), dtype)  # (nc,)
        mu_sel = mu_slot[idx]  # (B, K)
        mu_full = jnp.concatenate(
            [jnp.zeros_like(mu_sel), mu_sel, mu_sel,
             jnp.zeros((B, nlim2), dtype)], axis=1)
        fidx_np = np.full(3 * K + nlim2, -1, np.int32)
        fidx_np[K:2 * K] = np.arange(K)
        fidx_np[2 * K:3 * K] = np.arange(K)
        fidx_c = jnp.asarray(fidx_np)
        mu_b = jnp.where(v_b, mu_full, 0.0)
    else:
        mu_c = jnp.asarray(np.asarray(mu_row), dtype)  # (D,)
        fidx_c = jnp.asarray(np.asarray(fidx), jnp.int32)  # (D,)
        mu_b = jnp.where(v_b, mu_c[None, :], 0.0)
        lo_g = jnp.broadcast_to(lo_row[None, :], b_b.shape)
        hi_g = jnp.broadcast_to(hi_row[None, :], b_b.shape)
    lo_b = jnp.where(v_b, lo_g, 0.0)
    hi_b = jnp.where(v_b, hi_g, 0.0)
    cfm_a = jnp.asarray(cfm, dtype)

    pivot_iters = int(model.lcp_pivot_iters)
    use_f64 = model.lcp_dtype == "f64" and dtype != jnp.float64
    if use_f64:
        f64 = jnp.float64
        J_b, M_b, b_b, lo_b, hi_b, mu_b, cfm_a = (
            J_b.astype(f64), M_b.astype(f64), b_b.astype(f64),
            lo_b.astype(f64), hi_b.astype(f64), mu_b.astype(f64),
            cfm_a.astype(f64),
        )

    lam = jax.vmap(
        lambda J_, M_, b_, lo_, hi_, mu_: boxed_lcp_lowrank(
            J_, M_, cfm_a, b_, lo_, hi_, mu_, fidx_c, iters,
            passes, None, pivot_iters,
        )
    )(J_b, M_b, b_b, lo_b, hi_b, mu_b)

    def dv_of(J_, M_, lam_):
        L_M = cholesky_small(M_)
        return cho_solve_small(L_M, J_.T @ lam_)

    dv = jax.vmap(dv_of)(J_b, M_b, lam)
    if use_f64:
        dv = dv.astype(dtype)
    v_new_b = vs_b + dv  # (B, nv)

    vt = jnp.moveaxis(v_new_b, 0, -1).reshape(nv, S_, L_)
    return [vt[i] for i in range(nv)]


def _tile_lcp(J_rows, b_vec, valid, mu_row, fidx, M, Minv, nv, D, cfm, iters, passes, zero_like, barriers=True, box_c=None):
    """Boxed LCP over tile rows: phased-Jacobi warm start + active-set
    Woodbury polish. Row semantics match ops/lcp.py for the supported row
    types (contact normals lo=0/hi=inf, friction rows moving bounds, limit
    rows lo=0/hi=inf, servo/joint-friction rows constant boxes [-c, +c] via
    box_c); invalid rows are pinned at 0.

    Gradients: everything up to the final polish pass is stop_gradient'ed;
    AD through the final pass's KKT solve is the IFT gradient. The gradient
    attachment runs even at passes=0 (lcp_polish=False) so the fused path
    never silently returns zero contact gradients."""
    is_fr = [fidx[i] >= 0 for i in range(D)]
    if box_c is None:
        box_c = [None] * D
    is_box = [box_c[i] is not None for i in range(D)]

    def _andv(x, i):
        # valid[i] is Python True for always-on rows (servo/joint-friction)
        return x if valid[i] is True else jax.lax.bitwise_and(x, valid[i])

    def fence(xs):
        return _barrier(xs, barriers)

    # fence the assembly products: every sweep consumes J rows / rhs, and
    # XLA fusion otherwise duplicates their upstream chains per sweep
    for i in range(D):
        keys = list(J_rows[i].keys())
        vals = fence([J_rows[i][k] for k in keys])
        J_rows[i] = dict(zip(keys, vals))
    b_vec = fence(b_vec)

    # W = Minv J^T : (nv, D) columns, sparse over J rows
    def w_col(i):
        return [_sparse_dot_mat(Minv, k, J_rows[i]) for k in range(nv)]

    W = [w_col(i) for i in range(D)]  # W[i][k] = (Minv J^T)[k, i]

    def a_entry(i, j):
        # A[i][j] = J_i . W_j (+cfm on diag)
        acc = None
        for k, el in J_rows[i].items():
            acc = T.fma(acc, el, W[j][k])
        if i == j:
            acc = T.add(acc, cfm)
        return acc

    diag = [T.maximum(a_entry(i, i), 1e-12) for i in range(D)]
    # rowsum of |A| for the adaptive sweep scaling; A is symmetric, so each
    # off-diagonal entry is computed once and credited to both rows
    rs = [[T.abs_(T.materialize(diag[i], zero_like))] for i in range(D)]
    for i in range(D):
        for j in range(i + 1, D):
            e = a_entry(i, j)
            if e is None:
                continue
            ae = T.abs_(e)
            rs[i].append(ae)
            rs[j].append(ae)

    def _sum(elems):
        acc = elems[0]
        for e in elems[1:]:
            acc = T.add(acc, e)
        return acc

    rowsum = [T.maximum(_sum(r), 1e-12) for r in rs]
    scale = [
        T.div(T.clip(T.div(diag[i], rowsum[i]), 0.3, 0.9), diag[i]) for i in range(D)
    ]

    def matvec(lam):
        # A lam = J (Minv (J^T lam)) + cfm lam, matrix-free
        jt_lam = [None] * nv
        for i in range(D):
            if lam[i] is None:
                continue
            for j, el in J_rows[i].items():
                jt_lam[j] = T.fma(jt_lam[j], el, lam[i])
        u = [T.dot(Minv[k], jt_lam) for k in range(nv)]
        out = []
        for i in range(D):
            acc = T.mul(cfm, lam[i])
            for j, el in J_rows[i].items():
                acc = T.fma(acc, el, u[j])
            out.append(acc)
        return out

    def clip_row(i, cand, lam):
        """Project candidate onto the row's (possibly moving) box; invalid
        rows pin to 0."""
        if is_fr[i]:
            bound = T.mul(mu_row[i], lam[fidx[i]])  # >= 0 since lam_n >= 0
            c = T.clip(cand, T.neg(bound), bound)
        elif is_box[i]:
            c = T.clip(cand, -box_c[i], box_c[i])
        else:
            c = T.maximum(cand, None)  # lo = 0, hi = inf
        if valid[i] is True:
            return c
        return T.where(valid[i], c, None)

    scale = fence(scale)

    # ---- phased Jacobi sweeps (warm start; gradients cut below) ----
    lam = [None] * D
    for _ in range(iters):
        for phase in (False, True):
            r = matvec(lam)
            new = list(lam)
            for i in range(D):
                if is_fr[i] != phase:
                    continue
                cand = T.sub(lam[i], T.mul(scale[i], T.add(r[i], b_vec[i])))
                new[i] = clip_row(i, cand, lam)
            lam = fence(new)
    lam = [_sg(x) for x in lam]

    # ---- active-set polish (Woodbury); final pass carries gradients ----
    _TOL = 1e-8

    def one_pass(lam):
        lax = jax.lax
        lam_m = [T.materialize(x, zero_like) for x in lam]
        free, fr_bound, s_sign, pin_val = [], [], [], []
        for i in range(D):
            sc = lax.max(lax.abs(lam_m[i]), T._c(1.0, lam_m[i]))
            tol_sc = lax.mul(sc, T._c(_TOL, sc))
            if is_fr[i]:
                bound = T.materialize(T.mul(mu_row[i], lam[fidx[i]]), zero_like)
                at_lo = lax.le(lam_m[i], lax.sub(tol_sc, bound))
                at_hi = lax.ge(lam_m[i], lax.sub(bound, tol_sc))
                degen = lax.bitwise_and(at_lo, at_hi)
                free.append(_andv(
                    lax.bitwise_and(lax.bitwise_not(at_lo), lax.bitwise_not(at_hi)),
                    i,
                ))
                # the friction-bound coupling EXCLUDES degenerate rows
                # (zero-width box: lam pins to 0, no B column) — matches
                # ops/lcp.py:_classify fr_bound
                fr_bound.append(_andv(
                    lax.bitwise_and(lax.bitwise_or(at_lo, at_hi), lax.bitwise_not(degen)),
                    i,
                ))
                s_sign.append(lax.select(
                    at_hi, lax.full_like(zero_like, 1.0), lax.full_like(zero_like, -1.0)
                ))
                pin_val.append(None)
            elif is_box[i]:
                # constant box [-c, +c]: at-bound rows pin to +-c (nonzero!),
                # entering the KKT rhs as cfm*c_pin (see S-system note below)
                cb = float(box_c[i])
                at_lo = lax.le(lam_m[i], lax.sub(tol_sc, T._c(cb, tol_sc)))
                at_hi = lax.ge(lam_m[i], lax.sub(lax.full_like(zero_like, cb), tol_sc))
                degen = lax.bitwise_and(at_lo, at_hi)
                free.append(_andv(
                    lax.bitwise_and(lax.bitwise_not(at_lo), lax.bitwise_not(at_hi)),
                    i,
                ))
                fr_bound.append(None)
                sgn = lax.select(
                    at_hi, lax.full_like(zero_like, 1.0), lax.full_like(zero_like, -1.0)
                )
                s_sign.append(None)
                pinned = _andv(
                    lax.bitwise_and(lax.bitwise_or(at_lo, at_hi), lax.bitwise_not(degen)),
                    i,
                )
                pin_val.append(T.mul(T.mul(T.where(pinned, 1.0, None, like=zero_like), sgn), cb))
            else:
                at_lo = lax.le(lam_m[i], tol_sc)
                free.append(_andv(lax.bitwise_not(at_lo), i))
                fr_bound.append(None)
                s_sign.append(None)
                pin_val.append(None)
        Ffloat = [T.where(free[i], 1.0, None, like=zero_like) for i in range(D)]
        fbm = [
            T.mul(T.mul(T.where(fr_bound[i], 1.0, None, like=zero_like), s_sign[i]), mu_row[i])
            if is_fr[i]
            else None
            for i in range(D)
        ]

        # S = cfm M + J^T (I+B) F J  (nv x nv), built from sparse rows:
        # X[i] = F_i J_i + fbm_i F_n J_n; S += J_i^T X[i] summed over i
        S = [[T.mul(cfm, M[a][b_]) for b_ in range(nv)] for a in range(nv)]
        for i in range(D):
            # X_i as sparse dict
            Xi = {j: T.mul(Ffloat[i], el) for j, el in J_rows[i].items()}
            if is_fr[i]:
                nrm = fidx[i]
                for j, el in J_rows[nrm].items():
                    Xi[j] = T.add(Xi.get(j), T.mul(T.mul(fbm[i], Ffloat[nrm]), el))
            for a, ea in J_rows[i].items():
                for b_, xb in Xi.items():
                    S[a][b_] = T.add(S[a][b_], T.mul(ea, xb))
        # rhs: contacts/limits pin at 0 and friction rides the B coupling, so
        # r = -F b; constant-box rows pin at c_pin = +-c != 0, which enters
        # the u-space elimination as an extra cfm*c_pin term:
        #   lam = (I+B) F x + c_pin,  M u = J^T lam,  x = (r - F J u)/cfm
        #   =>  S u = J^T [(I+B) r + cfm c_pin],  S = cfm M + J^T (I+B) F J
        r = [T.mul(Ffloat[i], T.neg(b_vec[i])) for i in range(D)]
        rhs_u = [None] * nv
        # (I+B) r: friction-bound row i gains s_i mu_i r_{n(i)}
        IBr = []
        for i in range(D):
            t = r[i]
            if is_fr[i]:
                t = T.add(t, T.mul(fbm[i], r[fidx[i]]))
            if pin_val[i] is not None:
                t = T.add(t, T.mul(cfm, pin_val[i]))
            IBr.append(t)
        for i in range(D):
            if IBr[i] is None:
                continue
            for j, el in J_rows[i].items():
                rhs_u[j] = T.fma(rhs_u[j], el, IBr[i])
        # S is unsymmetric when friction-bound coupling is active: GE, not
        # Cholesky (matches ops/smalllinalg.solve_nopivot_small)
        u = T.solve_ge(S, rhs_u)
        # x = (r - F J u) / cfm on the free set
        x = []
        for i in range(D):
            ju = _sparse_dot(J_rows[i], u)
            x.append(T.mul(Ffloat[i], T.div(T.sub(r[i], T.mul(Ffloat[i], ju)), cfm)))
        lam_new = []
        for i in range(D):
            t = x[i]
            if is_fr[i]:
                t = T.add(t, T.mul(fbm[i], x[fidx[i]]))
            if pin_val[i] is not None:
                t = T.add(t, pin_val[i])  # at-bound box rows sit at +-c
            lam_new.append(t)
        # project onto moving box
        return [clip_row(i, lam_new[i], lam_new) for i in range(D)]

    def nat_residual(lam_m):
        """Natural-map residual per env tile (ops/lcp.py:_nat_residual)."""
        w = matvec(lam_m)
        res = None
        for i in range(D):
            proj = clip_row(i, T.sub(lam_m[i], T.add(w[i], b_vec[i])), lam_m)
            res = T.maximum(res, T.abs_(T.sub(lam_m[i], proj)))
        return T.materialize(res, zero_like)

    # ---- guarded polish passes (primal only, all stop_gradient'ed),
    # structurally identical to ops/lcp_lowrank._polish_lowrank: iterate
    # from the last pass result, fall back on non-finite, return the best
    # iterate by natural residual
    lax_ = jax.lax
    lam_it = [T.materialize(_sg(x), zero_like) for x in lam]
    best = lam_it
    best_res = nat_residual(best)
    for _ in range(passes):
        cand = [T.materialize(_sg(x), zero_like) for x in one_pass(lam_it)]
        finite = lax_.eq(cand[0], cand[0])
        for x in cand:
            finite = lax_.bitwise_and(finite, lax_.is_finite(x))
        lam_it = fence([lax_.select(finite, c, p) for c, p in zip(cand, lam_it)])
        res = nat_residual(lam_it)
        better = lax_.lt(res, best_res)
        best = fence([lax_.select(better, c, b_) for c, b_ in zip(lam_it, best)])
        best_res = lax_.min(res, best_res)

    # ---- gradient attachment (straight-through IFT): the primal is exactly
    # `best`; the tangent comes from one more one_pass AT best, whose KKT
    # solve linearizes to the implicit-function-theorem gradient (one_pass is
    # idempotent at the solution). Envs where that extra pass misbehaves keep
    # the primal and get zero tangent instead of garbage.
    #
    # Double-where NaN hygiene: a NaN/Inf anywhere in the gradient pass
    # poisons the whole batch through the untaken where-branch (NaN * 0 =
    # NaN in the VJP). So first PROBE the pass under stop_gradient to find
    # the envs where it degrades, then run the differentiable pass on
    # sanitized inputs (lam <- 0 for bad envs: all-pinned classification,
    # benign solve) and discard its values for those envs.
    probe = [T.materialize(x, zero_like) for x in one_pass(best)]
    finite = lax_.eq(probe[0], probe[0])
    for x in probe:
        finite = lax_.bitwise_and(finite, lax_.is_finite(x))
    drift = None
    for g, b_ in zip(probe, best):
        g_clean = lax_.select(lax_.is_finite(g), g, lax_.full_like(g, 1e30))
        drift = T.maximum(drift, lax_.abs(lax_.sub(g_clean, b_)))
    ok = lax_.bitwise_and(
        finite,
        lax_.le(
            T.materialize(drift, zero_like),
            lax_.mul(lax_.add(best_res, T._c(1.0, best_res)), T._c(1e-5, best_res)),
        ),
    )
    safe_in = [lax_.select(ok, b_, lax_.full_like(b_, 0.0)) for b_ in best]
    out_g = [T.materialize(x, zero_like) for x in one_pass(safe_in)]
    out = [
        lax_.select(ok, lax_.add(b_, lax_.sub(g, lax_.stop_gradient(g))), b_)
        for g, b_ in zip(out_g, best)
    ]
    return fence(out)


def _sparse_dot_mat(Mat, k, row: dict):
    acc = None
    for j, el in row.items():
        acc = T.fma(acc, Mat[k][j], el)
    return acc
