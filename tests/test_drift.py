"""Long free-running cross-path / cross-solver drift harness (r2 VERDICT
weak #6 / next-round #8).

Hundreds of FREE-RUNNING steps (no per-step re-sync) on articulated contact
models, comparing:
  * the production vmap path vs the native Dantzig pivot oracle,
  * the fused tile path vs the vmap path,
  * our contact semantics vs MuJoCo under matched parameters (coarse,
    physics-outcome-level — the contact models differ by construction).

These are trajectory-level gates: they catch slow contact-semantics
divergence that per-step parity tests (tests/test_tilestep.py re-syncs each
step) structurally cannot."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdart_tpu.dynamics.model import State, make_state
from diffdart_tpu.models import cube_drop
from diffdart_tpu.models.scenes import jump_worm
from diffdart_tpu.sim import rollout, step


def _free_run_vmap(m, q0, v0, T):
    s = make_state(m, q=jnp.asarray(q0, m.mass.dtype), v=jnp.asarray(v0, m.mass.dtype))
    _, traj = jax.jit(rollout)(m, s, jnp.zeros((T, m.nv), m.mass.dtype))
    return np.asarray(traj.q)


class TestVmapVsDantzigDrift:
    def test_worm_settle_300_steps(self):
        """Articulated body (planar worm, capsule-plane contacts with
        friction) dropped and left to settle for 300 free-running steps:
        the production chain must track the Dantzig-oracle trajectory."""
        native_lcp = pytest.importorskip("diffdart_tpu.ops.native_lcp")
        if not native_lcp.available():
            pytest.skip("native lib not buildable")
        from tests.test_oracle_trajectory import _oracle_step

        m = jump_worm(dt=2e-3, n_links=2)
        q0 = np.asarray(m.neutral_q()).copy()
        q0[0] += 0.15  # drop from above rest
        v0 = np.zeros(m.nv)
        T = 300
        ours = _free_run_vmap(m, q0, v0, T)
        s = make_state(m, q=jnp.asarray(q0, m.mass.dtype), v=jnp.asarray(v0, m.mass.dtype))
        oracle = []
        for _ in range(T):
            s = _oracle_step(m, s)
            oracle.append(np.asarray(s.q))
        oracle = np.stack(oracle)
        err = np.abs(ours - oracle).max()
        assert err < 5e-3, f"free-running drift vs Dantzig oracle: max|dq| = {err}"
        # identical resting configuration at the end
        assert np.abs(ours[-1] - oracle[-1]).max() < 1e-3


class TestFusedVsVmapDrift:
    def test_worm_free_running_300_steps(self):
        """Fused tile path vs vmap path with NO re-sync for 300 steps on the
        contact-rich worm. Both integrate the same physics in f64 here, so
        sustained divergence = contact-semantics drift, not roundoff."""
        from diffdart_tpu.sim.tilestep import build_tile_step

        m = jump_worm(dt=2e-3, n_links=2)
        q0 = np.asarray(m.neutral_q()).copy()
        q0[0] += 0.10
        v0 = np.zeros(m.nv)
        T = 300
        ref = _free_run_vmap(m, q0, v0, T)

        tstep = jax.jit(build_tile_step(m, output="tiles"))
        qt = tuple(jnp.full((1, 1), float(x), m.mass.dtype) for x in q0)
        vt = tuple(jnp.full((1, 1), float(x), m.mass.dtype) for x in v0)
        taut = tuple(jnp.zeros((1, 1), m.mass.dtype) for _ in range(m.nv))
        tile_traj = []
        for _ in range(T):
            qt, vt = tstep(qt, vt, taut)
            tile_traj.append(np.asarray([float(x[0, 0]) for x in qt]))
        tile_traj = np.stack(tile_traj)
        err = np.abs(tile_traj - ref).max()
        assert err < 5e-3, f"fused-vs-vmap free-running drift: max|dq| = {err}"
        assert np.abs(tile_traj[-1] - ref[-1]).max() < 1e-3

    def test_worm_free_running_300_steps_f32(self):
        """The f32 twin of the gate above — the PRODUCTION TPU configuration
        (f32 tiles, no f64 island, tile path has no pivot refinement). Gates
        are looser than f64 (policy-iteration impulses + f32 roundoff
        compound over 300 steps) but the worm must settle into the same
        resting configuration: sustained divergence or a different rest pose
        = contact-semantics drift, not roundoff (VERDICT r3 weak #5)."""
        from diffdart_tpu.sim.tilestep import build_tile_step

        m = jump_worm(dt=2e-3, n_links=2).astype(jnp.float32)
        q0 = np.asarray(m.neutral_q()).copy()
        q0[0] += 0.10
        v0 = np.zeros(m.nv)
        T = 300
        ref = _free_run_vmap(m, q0, v0, T)
        assert ref.dtype == np.float32

        tstep = jax.jit(build_tile_step(m, output="tiles"))
        qt = tuple(jnp.full((1, 1), float(x), jnp.float32) for x in q0)
        vt = tuple(jnp.full((1, 1), float(x), jnp.float32) for x in v0)
        taut = tuple(jnp.zeros((1, 1), jnp.float32) for _ in range(m.nv))
        tile_traj = []
        for _ in range(T):
            qt, vt = tstep(qt, vt, taut)
            tile_traj.append(np.asarray([float(x[0, 0]) for x in qt]))
        tile_traj = np.stack(tile_traj)
        err = np.abs(tile_traj - ref).max()
        assert err < 2e-2, f"f32 fused-vs-vmap free-running drift: max|dq| = {err}"
        assert np.abs(tile_traj[-1] - ref[-1]).max() < 5e-3


class TestMuJoCoSanity:
    def test_sliding_cube_stopping_distance(self):
        """External sanity row: a cube sliding to rest under Coulomb
        friction, same mass/size/mu/gravity in MuJoCo. The contact models
        differ (boxed LCP impulses vs MuJoCo's soft convex solver), so the
        gate is the physical outcome — stopping distance near the analytic
        v^2/(2 mu g) with both engines agreeing coarsely — not state-level
        agreement."""
        mujoco = pytest.importorskip("mujoco")
        mu, v0, half = 0.4, 1.0, 0.1
        m = cube_drop(dt=2e-3, half=half, friction=mu)
        q0 = np.array(m.neutral_q())
        q0[6] = half  # resting on the plane
        vv = np.zeros(m.nv)
        vv[3] = v0
        T = 500
        ours = _free_run_vmap(m, q0, vv, T)
        ours_stop = float(ours[-1, 4])  # x translation
        assert abs(ours[-1, 6] - half) < 5e-3  # stays on the ground

        MJCF = f"""
        <mujoco><option gravity="0 0 -9.81" timestep="2e-3"/>
          <worldbody>
            <geom type="plane" size="5 5 0.1" friction="{mu} 0.0 0.0"/>
            <body name="cube" pos="0 0 {half}">
              <freejoint/>
              <geom type="box" size="{half} {half} {half}" mass="1.0"
                    friction="{mu} 0.0 0.0"/>
            </body>
          </worldbody>
        </mujoco>"""
        mj = mujoco.MjModel.from_xml_string(MJCF)
        dj = mujoco.MjData(mj)
        dj.qvel[0] = v0
        for _ in range(T):
            mujoco.mj_step(mj, dj)
        mj_stop = float(dj.qpos[0])

        analytic = v0**2 / (2 * mu * 9.81)  # 0.1274 m
        assert abs(ours_stop - analytic) < 0.25 * analytic, (ours_stop, analytic)
        assert abs(ours_stop - mj_stop) < 0.3 * analytic, (ours_stop, mj_stop)
