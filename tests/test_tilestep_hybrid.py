"""Hybrid tile step (fused tile dynamics + batched XLA lowrank LCP) and
convex-plane tile contacts (r2 VERDICT missing #5 / next-round #5).

The tile layer's fully-unrolled trace-time LCP is O(D^2) in row count —
right for locomotion-scale D<~60, hopeless at the Atlas-class humanoid's
D~141. `build_tile_step(..., lcp='xla')` keeps the fused tile FK/dynamics/
assembly but materializes the rows into batched dense (B, D, nv) arrays and
solves through the SAME vmapped lowrank chain as the canonical path
(`ops/lcp_lowrank.boxed_lcp_lowrank` — Jacobi sweeps + Woodbury polish +
pivot refinement + IFT custom_vjp). It is therefore a pure re-layout of the
same physics: trajectories and BPTT gradients must match the vmap path.

Capability parity anchors: World::step / BoxedLcpConstraintSolver (SURVEY.md
§2.1) now reachable from the fused path for the flagship humanoid."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdart_tpu.dynamics.model import GeomType, JointType, ModelBuilder, State
from diffdart_tpu.models.scenes import jump_worm
from diffdart_tpu.sim import step
from diffdart_tpu.sim.tilestep import build_tile_step

B = 16
S, L = 2, 8


def _tiles(x):
    t = x.T.reshape(x.shape[1], S, L)
    return tuple(t[i] for i in range(x.shape[1]))


def _untiles(xs):
    return jnp.stack([x.reshape(B) for x in xs], axis=1)


def _worm_batch(m, seed=0):
    rng = np.random.RandomState(seed)
    q0 = np.asarray(m.neutral_q()).copy() + np.array([0.06, 0.0, 0.25, -0.5])[: m.nq]
    q = np.tile(q0, (B, 1)) + 0.05 * rng.randn(B, m.nq)
    v = 0.3 * rng.randn(B, m.nv)
    tau = 0.5 * rng.randn(B, m.nv)
    return jnp.asarray(q), jnp.asarray(v), jnp.asarray(tau)


class TestHybridXlaLcp:
    def test_forced_xla_lcp_matches_vmap_step(self):
        """Same worm config as TestTileStepParity, but with the LCP forced
        through the hybrid materialize-and-solve backend: per-step parity
        with the canonical vmap step along a 25-step re-synced trajectory."""
        m = jump_worm(dt=2e-3, n_links=2)
        qb, vb, taub = _worm_batch(m)
        tstep = jax.jit(build_tile_step(m, output="tiles", lcp="xla"))
        ref = jax.jit(jax.vmap(lambda q, v, t: step(m, State(q=q, v=v, t=jnp.zeros(())), t)))
        taut = _tiles(taub)
        for it in range(25):
            sr = ref(qb, vb, taub)
            qt, vt = tstep(_tiles(qb), _tiles(vb), taut)
            np.testing.assert_allclose(_untiles(qt), np.asarray(sr.q), atol=1e-7,
                                       err_msg=f"q diverged at step {it}")
            np.testing.assert_allclose(_untiles(vt), np.asarray(sr.v), atol=1e-5,
                                       err_msg=f"v diverged at step {it}")
            qb, vb = sr.q, sr.v

    def test_forced_xla_lcp_bptt_gradient(self):
        """BPTT through the hybrid path: the custom_vjp IFT gradient of the
        batched solve must match the vmap path's gradient over a scan."""
        m = jump_worm(dt=2e-3, n_links=2)
        qb, vb, taub = _worm_batch(m, seed=3)
        T = 6
        taus = jnp.tile(taub[None], (T, 1, 1)) * 0.3
        tstep = build_tile_step(m, output="tiles", lcp="xla")

        def loss_tile(taus):
            def body(c, tau):
                qn, vn = tstep(c[0], c[1], _tiles(tau))
                return (qn, vn), None

            (qf, vf), _ = jax.lax.scan(body, (_tiles(qb), _tiles(vb)), taus)
            return jnp.mean(_untiles(qf)[:, 0] ** 2) + jnp.mean(_untiles(vf) ** 2)

        def loss_ref(taus):
            def roll(q, v, taus_env):
                def body(c, tau):
                    s = step(m, State(q=c[0], v=c[1], t=jnp.zeros(())), tau)
                    return (s.q, s.v), None

                (qf, vf), _ = jax.lax.scan(body, (q, v), taus_env)
                return qf, vf

            qf, vf = jax.vmap(roll, in_axes=(0, 0, 1))(qb, vb, taus)
            return jnp.mean(qf[:, 0] ** 2) + jnp.mean(vf**2)

        l_t, g_t = jax.jit(jax.value_and_grad(loss_tile))(taus)
        l_r, g_r = jax.jit(jax.value_and_grad(loss_ref))(taus)
        np.testing.assert_allclose(float(l_t), float(l_r), rtol=1e-8)
        np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_r), rtol=5e-4, atol=5e-7)


class TestHybridContactBudget:
    def test_contact_budget_matches_vmap_step(self):
        """Model.contact_budget in the hybrid mode: the per-env top-K row
        gather (lax.top_k on the masked depth score) must reproduce
        collide.select_contacts semantics — per-step parity with the vmap
        step, which routes the same budget through select_contacts. The worm
        has 4 contact slots; budget 3 forces real selection whenever more
        than 3 slots touch."""
        m = jump_worm(dt=2e-3, n_links=2).replace(contact_budget=3)
        qb, vb, taub = _worm_batch(m, seed=7)
        # budget forces the hybrid: lcp='auto' resolves to 'xla'
        tstep = jax.jit(build_tile_step(m, output="tiles"))
        ref = jax.jit(jax.vmap(lambda q, v, t: step(m, State(q=q, v=v, t=jnp.zeros(())), t)))
        taut = _tiles(taub)
        for it in range(25):
            sr = ref(qb, vb, taub)
            qt, vt = tstep(_tiles(qb), _tiles(vb), taut)
            np.testing.assert_allclose(_untiles(qt), np.asarray(sr.q), atol=1e-7,
                                       err_msg=f"q diverged at step {it}")
            np.testing.assert_allclose(_untiles(vt), np.asarray(sr.v), atol=1e-5,
                                       err_msg=f"v diverged at step {it}")
            qb, vb = sr.q, sr.v

    def test_contact_budget_bptt_gradient(self):
        """BPTT through the budgeted hybrid: gradients flow through the
        take_along_axis gather (scatter-add in the VJP) and must match the
        vmap path's gradient through select_contacts."""
        m = jump_worm(dt=2e-3, n_links=2).replace(contact_budget=3)
        qb, vb, taub = _worm_batch(m, seed=11)
        T = 5
        taus = jnp.tile(taub[None], (T, 1, 1)) * 0.3
        tstep = build_tile_step(m, output="tiles")

        def loss_tile(taus):
            def body(c, tau):
                qn, vn = tstep(c[0], c[1], _tiles(tau))
                return (qn, vn), None

            (qf, vf), _ = jax.lax.scan(body, (_tiles(qb), _tiles(vb)), taus)
            return jnp.mean(_untiles(qf)[:, 0] ** 2) + jnp.mean(_untiles(vf) ** 2)

        def loss_ref(taus):
            def roll(q, v, taus_env):
                def body(c, tau):
                    s = step(m, State(q=c[0], v=c[1], t=jnp.zeros(())), tau)
                    return (s.q, s.v), None

                (qf, vf), _ = jax.lax.scan(body, (q, v), taus_env)
                return qf, vf

            qf, vf = jax.vmap(roll, in_axes=(0, 0, 1))(qb, vb, taus)
            return jnp.mean(qf[:, 0] ** 2) + jnp.mean(vf**2)

        l_t, g_t = jax.jit(jax.value_and_grad(loss_tile))(taus)
        l_r, g_r = jax.jit(jax.value_and_grad(loss_ref))(taus)
        np.testing.assert_allclose(float(l_t), float(l_r), rtol=1e-8)
        np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_r), rtol=5e-4, atol=5e-7)


class TestConvexTileContacts:
    def _octa_model(self):
        """Free body with an octahedral convex hull on the plane — exercises
        the tile path's convex-plane branch (_topk_tile_slots k=4 deepest
        vertices) against collision/convex.convex_plane on the vmap path."""
        b = ModelBuilder(dt=2e-3)
        body = b.add_body(parent=-1, jtype=JointType.FREE, mass=1.0,
                          inertia=np.eye(3) * 0.004)
        r = 0.1
        verts = np.array([
            [r, 0, 0], [-r, 0, 0], [0, r, 0], [0, -r, 0],
            [0, 0, r], [0, 0, -r],
        ])
        b.add_geom(body, GeomType.CONVEX, verts=verts, friction=0.6)
        b.add_geom(-1, GeomType.PLANE, friction=0.6)
        # pivot off: tile-mode LCP omits the pivot refinement, so per-step
        # parity compares identical solver algebra (see tests/test_tilestep.py)
        return b.finalize().replace(lcp_pivot_iters=0)

    def test_convex_plane_matches_vmap_step(self):
        from diffdart_tpu.math.lie import quat_normalize

        m = self._octa_model()
        rng = np.random.RandomState(1)
        qs = []
        for _ in range(B):
            quat = quat_normalize(jnp.asarray(rng.randn(4)))
            pos = np.array([0.05 * rng.randn(), 0.05 * rng.randn(),
                            0.1 + 0.04 * rng.randn()])
            qs.append(np.concatenate([np.asarray(quat), pos]))
        qb = jnp.asarray(np.stack(qs))
        vb = jnp.asarray(0.5 * rng.randn(B, m.nv))
        taub = jnp.asarray(0.1 * rng.randn(B, m.nv))
        tstep = jax.jit(build_tile_step(m, output="tiles"))
        ref = jax.jit(jax.vmap(lambda q, v, t: step(m, State(q=q, v=v, t=jnp.zeros(())), t)))
        for it in range(20):
            sr = ref(qb, vb, taub)
            qt, vt = tstep(_tiles(qb), _tiles(vb), _tiles(taub))
            np.testing.assert_allclose(_untiles(qt), np.asarray(sr.q), atol=1e-7,
                                       err_msg=f"q diverged at step {it}")
            np.testing.assert_allclose(_untiles(vt), np.asarray(sr.v), atol=1e-5,
                                       err_msg=f"v diverged at step {it}")
            qb, vb = sr.q, sr.v


class TestHumanoidHybrid:
    @pytest.mark.skipif(
        not os.environ.get("DIFFDART_SLOW_TESTS"),
        reason="the humanoid tile trace compiles for >25 min on the 1-vCPU "
        "CI box; opt in with DIFFDART_SLOW_TESTS=1",
    )
    def test_humanoid_tile_step_matches_vmap(self):
        """The flagship Atlas-class humanoid (D~141 > 64 → lcp='auto' picks
        the hybrid) on the fused tile path: 3-step re-synced parity with the
        vmap path from a contact-making crouch."""
        from diffdart_tpu.models.humanoid import humanoid, humanoid_init_q

        m = humanoid(dt=2e-3)
        rng = np.random.RandomState(0)
        q0 = np.asarray(humanoid_init_q(m))
        qb = jnp.asarray(np.tile(q0, (B, 1)) + 0.01 * rng.randn(B, m.nq))
        vb = jnp.asarray(0.1 * rng.randn(B, m.nv))
        taub = jnp.asarray(0.5 * rng.randn(B, m.nv))
        tstep = jax.jit(build_tile_step(m, output="tiles"))
        ref = jax.jit(jax.vmap(lambda q, v, t: step(m, State(q=q, v=v, t=jnp.zeros(())), t)))
        for it in range(3):
            sr = ref(qb, vb, taub)
            qt, vt = tstep(_tiles(qb), _tiles(vb), _tiles(taub))
            np.testing.assert_allclose(_untiles(qt), np.asarray(sr.q), atol=1e-6,
                                       err_msg=f"q diverged at step {it}")
            np.testing.assert_allclose(_untiles(vt), np.asarray(sr.v), atol=1e-4,
                                       err_msg=f"v diverged at step {it}")
            qb, vb = sr.q, sr.v
