"""External-oracle contact-TRAJECTORY fidelity (SURVEY.md §4 rebuild plan #2;
BASELINE 'match DART CPU trajectories to tolerance').

The native C++ Dantzig pivot solver (native/lcp_dantzig.cpp — the
odelcpsolver/dSolveLCP role) drives the FULL step pipeline per step on the
host; the resulting f64 trajectory is the oracle. The production path
(phased-Jacobi sweeps + active-set polish inside jit) must track it over
hundreds of contact steps — sliding, settling, stacking — not just on
single-solve problems."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdart_tpu.dynamics import dynamics as D
from diffdart_tpu.dynamics.model import make_state
from diffdart_tpu.models import cube_drop
from diffdart_tpu.ops import native_lcp
from diffdart_tpu.sim import rollout
from diffdart_tpu.sim.constrained import prepare_constrained

pytestmark = pytest.mark.skipif(not native_lcp.available(), reason="native lib not buildable")


def _oracle_step(model, state, tau=None):
    """One timestep with the LCP solved by the native Dantzig oracle."""
    lcp, M, Minv, v_star, dt = prepare_constrained(model, state, tau)
    A = np.asarray(lcp.A, np.float64)
    b = np.asarray(lcp.b, np.float64)
    lo = np.asarray(lcp.lo, np.float64)
    hi = np.asarray(lcp.hi, np.float64)
    mu = np.asarray(lcp.mu, np.float64)
    fidx = np.asarray(lcp.fidx, np.int32)
    lam, _w, status = native_lcp.boxed_lcp_dantzig(A, b, lo, hi, mu, fidx)
    lam = jnp.asarray(lam, state.q.dtype)
    v_new = v_star + Minv @ (lcp.J.T @ lam)
    q_new = D.integrate_positions(model, state.q, v_new, dt)
    return state.replace(q=q_new, v=v_new, t=state.t + dt)


def _oracle_rollout(model, state, T):
    traj = []
    for _ in range(T):
        state = _oracle_step(model, state)
        traj.append(np.asarray(state.q))
    return np.stack(traj)


def _production_rollout(model, state, T):
    final, traj = jax.jit(rollout)(model, state, jnp.zeros((T, model.nv)))
    return np.asarray(traj.q)


class TestOracleTrajectories:
    def test_cube_drop_and_settle(self):
        """400 steps of drop + impact + settle: production trajectory tracks
        the Dantzig-oracle trajectory."""
        m = cube_drop(dt=2e-3, friction=0.8)
        q0 = np.array(m.neutral_q())
        q0[6] = 0.25
        s = make_state(m, q=jnp.asarray(q0, m.mass.dtype))
        T = 400
        ours = _production_rollout(m, s, T)
        oracle = _oracle_rollout(m, s, T)
        # position trajectory agreement (m-scale states, mm tolerance)
        err = np.abs(ours - oracle).max()
        assert err < 2e-3, f"trajectory diverged from Dantzig oracle: max|dq|={err}"
        # final rest heights agree tightly
        assert abs(ours[-1, 6] - oracle[-1, 6]) < 2e-4

    def test_sliding_cube_with_friction(self):
        """Cube sliding to rest under Coulomb friction — the friction-cone
        coupling (fidx rows) is where solvers usually disagree."""
        m = cube_drop(dt=2e-3, friction=0.4)
        q0 = np.array(m.neutral_q())
        q0[6] = 0.1  # resting height
        s = make_state(
            m,
            q=jnp.asarray(q0, m.mass.dtype),
            v=jnp.zeros(m.nv, m.mass.dtype).at[3].set(2.0),  # 2 m/s slide
        )
        T = 500
        ours = _production_rollout(m, s, T)
        oracle = _oracle_rollout(m, s, T)
        # both must stop (friction dissipates) at the same place
        assert abs(ours[-1, 4] - oracle[-1, 4]) < 5e-3, (
            f"slide distance mismatch: {ours[-1, 4]} vs {oracle[-1, 4]}"
        )
        err = np.abs(ours - oracle).max()
        assert err < 1e-2, f"sliding trajectory diverged: {err}"

    def test_two_cube_stack(self):
        """Two stacked cubes (coupled contact groups) settle identically."""
        m = cube_drop(dt=2e-3, n_cubes=2, friction=0.9)
        q0 = np.array(m.neutral_q())
        q0[0], q0[6] = 1.0, 0.1
        q0[7], q0[13] = 1.0, 0.315  # slightly above the first cube
        s = make_state(m, q=jnp.asarray(q0, m.mass.dtype))
        T = 300
        ours = _production_rollout(m, s, T)
        oracle = _oracle_rollout(m, s, T)
        err = np.abs(ours[-1] - oracle[-1]).max()
        assert err < 2e-3, f"stack endpoints differ: {err}"
        assert abs(ours[-1, 13] - 0.3) < 5e-3  # top cube rests at 3*half

    def test_capsule_lying_flat(self):
        """Both caps on the ground for the whole trajectory — the canonical
        rank-deficient contact set (r2 VERDICT missing #3). Drop from a
        slight tilt, impact, rock, settle flat: the production chain (with
        the ops/lcp_pivot.py refinement) must track the Dantzig oracle."""
        from diffdart_tpu.math.lie import quat_exp
        from diffdart_tpu.models import capsule_lying

        m = capsule_lying(dt=2e-3, friction=0.6)
        q0 = np.array(m.neutral_q())
        q0[:4] = np.asarray(quat_exp(jnp.asarray([0.0, 0.08, 0.0])))  # slight pitch
        q0[6] = 0.09
        s = make_state(
            m,
            q=jnp.asarray(q0, m.mass.dtype),
            v=jnp.zeros(m.nv, m.mass.dtype).at[3].set(0.5),
        )
        T = 350
        ours = _production_rollout(m, s, T)
        oracle = _oracle_rollout(m, s, T)
        err = np.abs(ours - oracle).max()
        assert err < 2e-3, f"capsule-flat trajectory diverged from Dantzig: {err}"
        # settles resting on the plane at z = radius
        assert abs(ours[-1, 6] - 0.05) < 2e-3
