"""Stored golden-trajectory regression harness (SURVEY.md §4 rebuild plan #2b:
the 'matching DART CPU trajectories to tolerance' capability as stored
goldens). Goldens were generated in f64 on CPU at a known-good commit; any
future semantic drift in dynamics/contact (not just crashes) fails here."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from diffdart_tpu.dynamics.model import make_state
from diffdart_tpu.math.lie import quat_normalize
from diffdart_tpu.models import cartpole, cube_drop, double_pendulum
from diffdart_tpu.sim import rollout
from diffdart_tpu.sim.recording import compare_to_golden

_G = os.path.join(os.path.dirname(__file__), "goldens")


class TestGoldens:
    def test_cartpole(self):
        m = cartpole(dt=5e-3)
        s = make_state(m, q=jnp.array([0.1, 0.4]), v=jnp.array([-0.2, 0.3]))
        taus = 0.5 * jnp.sin(jnp.arange(200.0))[:, None] * jnp.array([[1.0, 0.0]])
        _, traj = jax.jit(rollout)(m, s, taus)
        r = compare_to_golden(traj, os.path.join(_G, "cartpole_f64.npz"), q_tol=1e-9, v_tol=1e-9)
        assert r["q_ok"] and r["v_ok"], r

    def test_cube_drop(self):
        m = cube_drop(dt=2e-3, half=0.1, friction=0.5, restitution=0.3)
        s = make_state(m, q=m.neutral_q().at[6].set(0.3).at[1].set(0.1).at[0].set(0.99499))
        q = s.q.at[:4].set(quat_normalize(s.q[:4]))
        s = s.replace(q=q, v=jnp.zeros(6).at[3].set(1.0))
        _, traj = jax.jit(rollout)(m, s, jnp.zeros((400, 6)))
        # contact trajectories are chaotic at bounce events: gate on a loose
        # tolerance that still catches semantic changes
        r = compare_to_golden(traj, os.path.join(_G, "cube_drop_f64.npz"), q_tol=1e-6, v_tol=1e-5)
        assert r["q_ok"] and r["v_ok"], r

    def test_double_pendulum(self):
        m = double_pendulum(dt=2e-3)
        s = make_state(m, q=jnp.array([1.2, -0.5]))
        _, traj = jax.jit(rollout)(m, s, jnp.zeros((500, 2)))
        r = compare_to_golden(traj, os.path.join(_G, "double_pendulum_f64.npz"), q_tol=1e-9, v_tol=1e-9)
        assert r["q_ok"] and r["v_ok"], r
