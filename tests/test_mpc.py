"""Realtime MPC (trajectory/mpc.py — dart/realtime MPC/Ticker/Buffer parity):
closed-loop recovery under disturbance, warm-start shift correctness, control
buffer & ticker semantics."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffdart_tpu.models import cartpole
from diffdart_tpu.trajectory.ilqr import make_dynamics
from diffdart_tpu.trajectory.mpc import MPC, ObservationLog, RealTimeControlBuffer, Ticker


def _cartpole_mpc(horizon=40, dt=0.02, iters=6):
    m = cartpole(dt=dt)

    def cmap(u):
        return jnp.array([u[0], 0.0])

    f = make_dynamics(m, control_map=cmap)

    def rc(x, u, t):
        return 1e-3 * u[0] ** 2 + x[1] ** 2 + 0.1 * x[0] ** 2 + 0.01 * (x[2] ** 2 + x[3] ** 2)

    def tc(x):
        return 100.0 * jnp.sum(x**2)

    return f, MPC(f, rc, tc, horizon=horizon, nu=1, dt=dt, iters_per_solve=iters)


class TestMPCClosedLoop:
    def test_recovers_cartpole_from_tilt(self):
        f, mpc = _cartpole_mpc()
        x0 = jnp.array([0.0, 0.6, 0.0, 0.0])
        traj = mpc.run(f, x0, duration=2.0, replan_every=3)
        assert abs(traj[-1][1]) < 0.05, f"pole angle not recovered: {traj[-1][1]}"
        assert abs(traj[-1][3]) < 0.5  # pole angular velocity damped

    def test_recovers_after_midway_disturbance(self):
        """Kick the plant halfway through — the receding-horizon replans must
        absorb a state the previous plan never saw."""
        f, mpc = _cartpole_mpc(iters=12)
        x = jnp.array([0.0, 0.3, 0.0, 0.0])
        t = 0.0
        n = int(3.0 / mpc.dt)
        kick_at = n // 3
        for k in range(n):
            if k % 2 == 0:
                mpc.solve(x, t)
            u = mpc.get_control(t)
            x = f(x, jnp.asarray(u))
            if k == kick_at:
                x = x.at[3].add(0.8)  # impulsive pole velocity disturbance
            t += mpc.dt
        assert abs(float(x[1])) < 0.08, f"not recovered after kick: {float(x[1])}"
        assert abs(float(x[3])) < 0.5


class TestWarmStart:
    def test_shift_matches_elapsed_steps(self):
        """After advancing k control periods, the warm start must be the old
        plan shifted by k (tail padded with the last control)."""
        f, mpc = _cartpole_mpc(horizon=10, iters=2)
        x0 = jnp.array([0.0, 0.3, 0.0, 0.0])
        res0 = mpc.solve(x0, 0.0)
        old = np.asarray(res0.us)

        captured = {}
        orig = mpc._solve

        def spy(x, warm):
            captured["warm"] = np.asarray(warm)
            return orig(x, warm)

        mpc._solve = spy
        mpc.solve(x0, 3 * mpc.dt)  # 3 periods later
        warm = captured["warm"]
        np.testing.assert_allclose(warm[:7], old[3:], rtol=1e-7)
        np.testing.assert_allclose(warm[7:], np.tile(old[-1:], (3, 1)), rtol=1e-7)


class TestRealtimePieces:
    def test_control_buffer_indexing(self):
        buf = RealTimeControlBuffer(nu=2, dt=0.1, horizon=5)
        us = np.arange(10).reshape(5, 2).astype(float)
        buf.splice(1.0, us)
        np.testing.assert_array_equal(buf.get(1.0), us[0])
        np.testing.assert_array_equal(buf.get(1.25), us[2])
        np.testing.assert_array_equal(buf.get(0.0), us[0])  # clamped low
        np.testing.assert_array_equal(buf.get(99.0), us[4])  # clamped high

    def test_observation_log(self):
        log = ObservationLog.create()
        log.observe(0.1, np.array([1.0, 2.0]))
        log.observe(0.2, np.array([3.0, 4.0]))
        assert log.ts == [0.1, 0.2]
        np.testing.assert_array_equal(log.xs[1], [3.0, 4.0])

    def test_ticker_fires_listeners(self):
        ticker = Ticker(period_s=0.005)
        hits = []
        ticker.registerTickListener(lambda now: hits.append(now))
        t0 = time.perf_counter()
        ticker.start(max_ticks=5)
        assert len(hits) == 5
        assert time.perf_counter() - t0 < 1.0
