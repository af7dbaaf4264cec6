"""Tiled batch-last step (sim/tilestep.py + ops/pallas_step.py): parity with
the canonical vmap step, gradient agreement, and the Pallas wrapper in
interpret mode.

The tile path is a pure re-layout of the same physics, so trajectories must
match the vmap path to float roundoff over many steps, and BPTT gradients
must agree (the LCP gradient is the same IFT algebra — final-polish-pass AD
vs custom_vjp). Tests use a small planar worm (PLANAR root + revolute link,
capsule-plane contacts with friction): big enough to exercise every tiled
code path (FK composition, mass-matrix Cholesky, bias forces, contact rows,
friction coupling, the boxed LCP), small enough that the unrolled trace
compiles quickly on the CPU suite. The full-size half-cheetah tile path is
exercised on real TPU by benchmarks/tile_bench.py and bench.py.

The tuple-of-tiles output format is deliberate: stacking outputs inside the
jitted step produces a concatenate-rooted XLA fusion whose CPU elemental
emitter re-evaluates the whole step chain per output element (13 s/step
observed) — see sim/tilestep.py:_barrier."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models.scenes import jump_worm
from diffdart_tpu.sim import step
from diffdart_tpu.sim.tilestep import TileStepUnsupported, build_tile_step

B = 16
S, L = 2, 8


def _model():
    # lcp_pivot_iters=0: per-step parity must compare IDENTICAL solver
    # algebra, and the tile-traced LCP (_tile_lcp) deliberately omits the
    # pivot refinement (a data-dependent while_loop has no trace-time tile
    # form; the hybrid lcp='xla' mode and the vmap path both have it).
    # Default-config cross-path agreement is gated at trajectory level by
    # tests/test_drift.py instead.
    return jump_worm(dt=2e-3, n_links=2).replace(lcp_pivot_iters=0)


def _init_q(m):
    # root slightly above rest so the capsules make and break contact
    return np.asarray(m.neutral_q()).copy() + np.array([0.06, 0.0, 0.25, -0.5])[: m.nq]


def _batch(m, seed=0, scale=0.05):
    rng = np.random.RandomState(seed)
    q = np.tile(_init_q(m), (B, 1)) + scale * rng.randn(B, m.nq)
    v = 0.3 * rng.randn(B, m.nv)
    tau = 0.5 * rng.randn(B, m.nv)
    return jnp.asarray(q), jnp.asarray(v), jnp.asarray(tau)


def _tiles(x):
    """(B, k) -> tuple of k (S, L) tiles."""
    t = x.T.reshape(x.shape[1], S, L)
    return tuple(t[i] for i in range(x.shape[1]))


def _untiles(xs):
    """tuple of k (S, L) tiles -> (B, k)."""
    return jnp.stack([x.reshape(B) for x in xs], axis=1)


class TestTileStepParity:
    def test_trajectory_matches_vmap_step(self):
        """Per-step parity along a 40-step reference trajectory. The tile
        input is re-synced to the reference state each step: contact
        dynamics are chaotic, so comparing free-running trajectories would
        amplify benign summation-order roundoff into test noise, while this
        form still visits 40 distinct contact configurations."""
        m = _model()
        qb, vb, taub = _batch(m)
        tstep = jax.jit(build_tile_step(m, output="tiles"))
        ref = jax.jit(jax.vmap(lambda q, v, t: step(m, State(q=q, v=v, t=jnp.zeros(())), t)))
        taut = _tiles(taub)
        for it in range(40):
            sr = ref(qb, vb, taub)
            qt, vt = tstep(_tiles(qb), _tiles(vb), taut)
            # tolerance set by the 1/cfm amplification in the Woodbury
            # polish: both paths carry ~eps/cfm noise around the exact LCP
            # solution, so they agree to ~1e-6, not to f64 roundoff
            np.testing.assert_allclose(_untiles(qt), np.asarray(sr.q), atol=1e-7,
                                       err_msg=f"q diverged at step {it}")
            np.testing.assert_allclose(_untiles(vt), np.asarray(sr.v), atol=1e-5,
                                       err_msg=f"v diverged at step {it}")
            qb, vb = sr.q, sr.v

    def test_bptt_gradient_matches_vmap_path(self):
        """Gradient parity on envs whose LCPs CONVERGE along the horizon.
        At stalled LCP solves (the iterative chain can cycle on
        redundant-contact configurations; see the Dantzig oracle tests for
        the fidelity reference) the IFT gradient is ill-posed and both paths
        produce different — equally arbitrary — subgradients, so only
        converged envs are comparable."""
        m = _model()
        qb, vb, taub = _batch(m, seed=3)
        T = 10
        taus = jnp.tile(taub[None], (T, 1, 1)) * 0.3

        # per-env convergence mask along the reference trajectory
        from diffdart_tpu.sim.constrained import prepare_constrained
        from diffdart_tpu.ops.lcp_lowrank import _solve_impl
        from diffdart_tpu.ops.lcp import _nat_residual

        def env_residual(q, v, tau):
            lcp, M, Minv, v_star, dt = prepare_constrained(
                m, State(q=q, v=v, t=jnp.zeros(())), tau)
            lam = _solve_impl(lcp.J, M, jnp.asarray(m.contact_cfm), lcp.b,
                              lcp.lo, lcp.hi, lcp.mu, lcp.fidx,
                              int(m.contact_iters), 2, None,
                              int(m.lcp_pivot_iters))
            return _nat_residual(lam, lcp.A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx)

        res_fn = jax.jit(jax.vmap(env_residual))
        stepv = jax.jit(jax.vmap(lambda q, v, t: step(m, State(q=q, v=v, t=jnp.zeros(())), t)))
        conv = np.ones(B, bool)
        qc, vc = qb, vb
        for t in range(T):
            conv &= np.asarray(res_fn(qc, vc, taus[t])) < 1e-8
            s = stepv(qc, vc, taus[t])
            qc, vc = s.q, s.v
        assert conv.sum() >= B // 3, f"too few converged envs to test: {conv.sum()}/{B}"
        w = jnp.asarray(conv, qb.dtype)

        tstep = build_tile_step(m, output="tiles")

        def loss_tile(taus):
            qt, vt = _tiles(qb), _tiles(vb)

            def body(c, tau):
                qn, vn = tstep(c[0], c[1], _tiles(tau))
                return (qn, vn), None

            (qf, vf), _ = jax.lax.scan(body, (qt, vt), taus)
            return jnp.mean(w * _untiles(qf)[:, 0] ** 2) + jnp.mean(w[:, None] * _untiles(vf) ** 2)

        def loss_ref(taus):
            def roll(q, v, taus_env):
                def body(c, tau):
                    s = step(m, State(q=c[0], v=c[1], t=jnp.zeros(())), tau)
                    return (s.q, s.v), None

                (qf, vf), _ = jax.lax.scan(body, (q, v), taus_env)
                return qf, vf

            qf, vf = jax.vmap(roll, in_axes=(0, 0, 1))(qb, vb, taus)
            return jnp.mean(w * qf[:, 0] ** 2) + jnp.mean(w[:, None] * vf**2)

        l_t, g_t = jax.jit(jax.value_and_grad(loss_tile))(taus)
        l_r, g_r = jax.jit(jax.value_and_grad(loss_ref))(taus)
        np.testing.assert_allclose(float(l_t), float(l_r), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_r), rtol=2e-4, atol=2e-7)

    def test_free_joint_cube_matches_vmap_step(self):
        """FREE-joint (quaternion FK + geometric integration) and 8-corner
        box-plane contacts: tumbling-cube per-step parity with the vmap
        path (BASELINE config #2 on the fused path)."""
        from diffdart_tpu.math.lie import quat_normalize
        from diffdart_tpu.models import cube_drop

        # pivot off for the same reason as _model(): identical solver algebra
        m = cube_drop(dt=2e-3, half=0.1, friction=0.5, restitution=0.0).replace(
            lcp_pivot_iters=0)
        rng = np.random.RandomState(0)
        qs = []
        for _ in range(B):
            quat = quat_normalize(jnp.asarray(rng.randn(4)))
            pos = np.array([0.1 * rng.randn(), 0.1 * rng.randn(), 0.12 + 0.05 * rng.randn()])
            qs.append(np.concatenate([np.asarray(quat), pos]))
        qb = jnp.asarray(np.stack(qs))
        vb = jnp.asarray(0.5 * rng.randn(B, m.nv))
        taub = jnp.asarray(0.1 * rng.randn(B, m.nv))
        tstep = jax.jit(build_tile_step(m, output="tiles"))
        ref = jax.jit(jax.vmap(lambda q, v, t: step(m, State(q=q, v=v, t=jnp.zeros(())), t)))
        for it in range(15):
            sr = ref(qb, vb, taub)
            qt, vt = tstep(_tiles(qb), _tiles(vb), _tiles(taub))
            np.testing.assert_allclose(_untiles(qt), np.asarray(sr.q), atol=1e-8,
                                       err_msg=f"q diverged at step {it}")
            np.testing.assert_allclose(_untiles(vt), np.asarray(sr.v), atol=1e-5,
                                       err_msg=f"v diverged at step {it}")
            qb, vb = sr.q, sr.v

    def test_unsupported_model_raises(self):
        from diffdart_tpu.dynamics.model import GeomType, JointType, ModelBuilder

        b = ModelBuilder(dt=1e-3)
        body = b.add_body(parent=-1, jtype=JointType.UNIVERSAL, axis=(1, 0, 0),
                          axis2=(0, 1, 0), mass=1.0)
        b.add_geom(body, GeomType.SPHERE, size=(0.1, 0, 0))
        with pytest.raises(TileStepUnsupported):
            build_tile_step(b.finalize())  # UNIVERSAL not in the tiled subset

    def test_ball_joint_matches_vmap_step(self):
        """BALL joint (quaternion FK, S=[I3|0], geometric integration) with
        sphere-plane contact: spherical-pendulum per-step parity with the
        vmap path."""
        from diffdart_tpu.dynamics.model import GeomType, JointType, ModelBuilder
        from diffdart_tpu.math.lie import quat_normalize

        b = ModelBuilder(dt=2e-3)
        b.add_geom(-1, GeomType.PLANE, friction=0.6)
        body = b.add_body(
            parent=-1, jtype=JointType.BALL, X_pos=(0, 0, 0.4), mass=1.0,
            com=(0, 0, -0.25), inertia=np.eye(3) * 0.02, damping=0.1,
        )
        b.add_geom(body, GeomType.SPHERE, size=(0.08, 0, 0), pos=(0, 0, -0.35),
                   friction=0.6)
        m = b.finalize().replace(lcp_pivot_iters=0)
        rng = np.random.RandomState(2)
        qs = []
        for _ in range(B):
            # small random tilt: the tip sphere makes and breaks floor contact
            quat = quat_normalize(jnp.asarray(
                np.array([1.0, 0, 0, 0]) + 0.25 * rng.randn(4)))
            qs.append(np.asarray(quat))
        qb = jnp.asarray(np.stack(qs))
        vb = jnp.asarray(1.0 * rng.randn(B, m.nv))
        taub = jnp.asarray(0.2 * rng.randn(B, m.nv))
        tstep = jax.jit(build_tile_step(m, output="tiles"))
        ref = jax.jit(jax.vmap(lambda q, v, t: step(m, State(q=q, v=v, t=jnp.zeros(())), t)))
        for it in range(25):
            sr = ref(qb, vb, taub)
            qt, vt = tstep(_tiles(qb), _tiles(vb), _tiles(taub))
            np.testing.assert_allclose(_untiles(qt), np.asarray(sr.q), atol=1e-8,
                                       err_msg=f"q diverged at step {it}")
            np.testing.assert_allclose(_untiles(vt), np.asarray(sr.v), atol=1e-5,
                                       err_msg=f"v diverged at step {it}")
            qb, vb = sr.q, sr.v


def _servo_cheetah(lcp_pivot_iters=0):
    """Half-cheetah with velocity servos + dry joint friction on the 6 leg
    dofs: the motorized-locomotion configuration (VERDICT r3 #7). Servo
    targets alternate sign and the force limit is small enough that some
    rows saturate at +-F*dt while others stay free — both KKT branches of
    the constant-box row code run."""
    from diffdart_tpu.dynamics.model import enable_joint_friction, enable_servo
    from diffdart_tpu.models.half_cheetah import half_cheetah

    m = half_cheetah(dt=2e-3)
    leg = tuple(range(3, m.nv))
    tgt = np.zeros(m.nv)
    tgt[3:] = [1.5, -1.0, 0.8, -1.2, 1.0, -0.6]
    m = enable_servo(m, leg, force_limit=8.0, target=tgt)
    m = enable_joint_friction(m, leg, friction=0.4)
    return m.replace(lcp_pivot_iters=lcp_pivot_iters)


def _cheetah_batch(m, seed=0):
    from diffdart_tpu.models.half_cheetah import cheetah_init_q

    rng = np.random.RandomState(seed)
    q0 = np.asarray(cheetah_init_q(m))
    q = np.tile(q0, (B, 1)) + 0.04 * rng.randn(B, m.nq)
    q[:, 0] -= 0.25  # drop the root so feet/shins touch the floor
    v = 0.4 * rng.randn(B, m.nv)
    tau = 1.0 * rng.randn(B, m.nv)
    return jnp.asarray(q), jnp.asarray(v), jnp.asarray(tau)


def _servo_worm():
    """Small motorized worm for the fully-traced tile LCP (D ~ 22; the D=54
    motorized cheetah's unrolled-LCP XLA:CPU compile exceeds 14 min on the
    1-vCPU CI box, so the cheetah is exercised through the hybrid mode
    below, whose trace/compile cost is linear in D)."""
    from diffdart_tpu.dynamics.model import enable_joint_friction, enable_servo

    m = jump_worm(dt=2e-3, n_links=2)
    act = tuple(range(3, m.nv))  # the revolute hinges behind the PLANAR root
    tgt = np.zeros(m.nv)
    tgt[3:] = 1.2
    m = enable_servo(m, act, force_limit=2.0, target=tgt)
    m = enable_joint_friction(m, act, friction=0.3)
    return m.replace(lcp_pivot_iters=0)


class TestTileStepServoRows:
    def test_servo_worm_matches_vmap_step(self):
        """Servo + joint-friction constant-box rows in the fully-traced tile
        LCP: per-step parity on the motorized worm (re-synced to the
        reference trajectory, as in TestTileStepParity). The small force
        limit saturates some rows at +-F*dt while others stay free — both
        KKT branches of the constant-box code run."""
        m = _servo_worm()
        qb, vb, taub = _batch(m, seed=5)
        tstep = jax.jit(build_tile_step(m, output="tiles", lcp="tile"))
        ref = jax.jit(jax.vmap(lambda q, v, t: step(m, State(q=q, v=v, t=jnp.zeros(())), t)))
        for it in range(20):
            sr = ref(qb, vb, taub)
            qt, vt = tstep(_tiles(qb), _tiles(vb), _tiles(taub))
            np.testing.assert_allclose(_untiles(qt), np.asarray(sr.q), atol=1e-7,
                                       err_msg=f"q diverged at step {it}")
            np.testing.assert_allclose(_untiles(vt), np.asarray(sr.v), atol=1e-5,
                                       err_msg=f"v diverged at step {it}")
            qb, vb = sr.q, sr.v

    def test_servo_cheetah_hybrid_matches_vmap_step(self):
        """The same motorized cheetah through the hybrid lcp='xla' mode
        (materialized rows + vmapped lowrank solve): covers the generalized
        per-row lo/hi bounds, with and without a contact budget."""
        for budget in (0, 6):
            m = _servo_cheetah(lcp_pivot_iters=1)
            if budget:
                m = m.replace(contact_budget=budget)
            qb, vb, taub = _cheetah_batch(m, seed=1)
            tstep = jax.jit(build_tile_step(m, output="tiles", lcp="xla"))
            ref = jax.jit(jax.vmap(lambda q, v, t: step(m, State(q=q, v=v, t=jnp.zeros(())), t)))
            for it in range(8):
                sr = ref(qb, vb, taub)
                qt, vt = tstep(_tiles(qb), _tiles(vb), _tiles(taub))
                np.testing.assert_allclose(
                    _untiles(qt), np.asarray(sr.q), atol=1e-7,
                    err_msg=f"budget={budget}: q diverged at step {it}")
                np.testing.assert_allclose(
                    _untiles(vt), np.asarray(sr.v), atol=1e-5,
                    err_msg=f"budget={budget}: v diverged at step {it}")
                qb, vb = sr.q, sr.v

    def test_servo_worm_bptt_gradient_matches_vmap(self):
        """BPTT gradient parity through the constant-box rows (tile LCP):
        the at-bound rows' +-c pins are constants, so the IFT tangent must
        agree with the vmap path's custom_vjp."""
        m = _servo_worm()
        qb, vb, taub = _batch(m, seed=4)
        T_h = 5
        taus = jnp.tile(taub[None], (T_h, 1, 1)) * 0.3
        tstep = build_tile_step(m, output="tiles", lcp="tile")

        def loss_tile(taus):
            qt, vt = _tiles(qb), _tiles(vb)

            def body(c, tau):
                qn, vn = tstep(c[0], c[1], _tiles(tau))
                return (qn, vn), None

            (qf, vf), _ = jax.lax.scan(body, (qt, vt), taus)
            return jnp.mean(_untiles(qf) ** 2) + jnp.mean(_untiles(vf) ** 2)

        def loss_ref(taus):
            def roll(q, v, taus_env):
                def body(c, tau):
                    s = step(m, State(q=c[0], v=c[1], t=jnp.zeros(())), tau)
                    return (s.q, s.v), None

                (qf, vf), _ = jax.lax.scan(body, (q, v), taus_env)
                return qf, vf

            qf, vf = jax.vmap(roll, in_axes=(0, 0, 1))(qb, vb, taus)
            return jnp.mean(qf**2) + jnp.mean(vf**2)

        l_t, g_t = jax.jit(jax.value_and_grad(loss_tile))(taus)
        l_r, g_r = jax.jit(jax.value_and_grad(loss_ref))(taus)
        np.testing.assert_allclose(float(l_t), float(l_r), rtol=1e-8)
        np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_r), rtol=2e-4, atol=2e-6)


class TestPallasStepInterpret:
    Bp = 1024  # one (8, 128) block

    def _inputs(self, m, seed):
        from diffdart_tpu.ops.pallas_step import to_tiles

        rng = np.random.RandomState(seed)
        q = jnp.asarray(np.tile(_init_q(m), (self.Bp, 1)) + 0.02 * rng.randn(self.Bp, m.nq))
        v = jnp.asarray(0.2 * rng.randn(self.Bp, m.nv))
        tau = jnp.asarray(0.5 * rng.randn(self.Bp, m.nv))
        return to_tiles(q), to_tiles(v), to_tiles(tau)

    def test_interpret_mode_matches_tilestep(self):
        from diffdart_tpu.ops.pallas_step import build_pallas_step

        m = _model()
        qt, vt, taut = self._inputs(m, 1)
        pstep = build_pallas_step(m, interpret=True)
        # reference: tuple-output tile step (stacked outside jit — stacking
        # inside jit is the concat-fusion trap this layout exists to avoid)
        tstep = jax.jit(build_tile_step(m, output="tiles"))
        qp, vp = jax.jit(pstep)(qt, vt, taut)
        qr, vr = tstep(tuple(qt[i] for i in range(m.nq)),
                       tuple(vt[i] for i in range(m.nv)),
                       tuple(taut[i] for i in range(m.nv)))
        np.testing.assert_allclose(np.asarray(qp), np.stack([np.asarray(x) for x in qr]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(vp), np.stack([np.asarray(x) for x in vr]), atol=1e-7)

    def test_interpret_mode_gradients(self):
        from diffdart_tpu.ops.pallas_step import build_pallas_step

        m = _model()
        qt, vt, taut = self._inputs(m, 2)
        pstep = build_pallas_step(m, interpret=True)
        tstep = build_tile_step(m, output="tiles")

        def lp(tau):
            qn, vn = pstep(qt, vt, tau)
            return jnp.mean(qn**2) + jnp.mean(vn**2)

        def lt(tau):
            qn, vn = tstep(tuple(qt[i] for i in range(m.nq)),
                           tuple(vt[i] for i in range(m.nv)),
                           tuple(tau[i] for i in range(m.nv)))
            return (sum(jnp.sum(x**2) for x in qn) / (m.nq * qn[0].size)
                    + sum(jnp.sum(x**2) for x in vn) / (m.nv * vn[0].size))

        gp = jax.jit(jax.grad(lp))(taut)
        gt = jax.jit(jax.grad(lt))(taut)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gt), rtol=1e-6, atol=1e-10)
