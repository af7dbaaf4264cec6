"""Receding-horizon MPC with warm starts + wall-clock ticker.

Capability parity with dart/realtime/ (MPC/MPCLocal, Ticker,
RealTimeControlBuffer, ObservationLog — SURVEY.md §2.3): the re-optimization
is a single jitted iLQR solve on device; the host side only shifts the warm
start, reads observations, and serves controls between solves. The reference's
separate planning thread becomes JAX async dispatch — the solve for window
k+1 runs on device while the host serves controls for window k.
"""
from __future__ import annotations

import time
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from diffdart_tpu.trajectory.ilqr import ilqr


class ObservationLog(NamedTuple):
    """Rolling log of (t, x) observations (reference ObservationLog parity)."""

    ts: list
    xs: list

    @staticmethod
    def create():
        return ObservationLog(ts=[], xs=[])

    def observe(self, t, x):
        self.ts.append(float(t))
        self.xs.append(np.asarray(x))


class RealTimeControlBuffer:
    """Control tape indexed by wall/sim time; serves u(t) between solves and
    splices in newly optimized tails (reference RealTimeControlBuffer parity)."""

    def __init__(self, nu: int, dt: float, horizon: int):
        self.dt = dt
        self.nu = nu
        self.t0 = 0.0
        self.us = np.zeros((horizon, nu))

    def get(self, t: float):
        i = int(np.clip((t - self.t0) / self.dt, 0, len(self.us) - 1))
        return self.us[i]

    def splice(self, t_start: float, us_new):
        self.t0 = t_start
        self.us = np.asarray(us_new)


class MPC:
    """Receding-horizon controller over the differentiable step.

    f, running_cost, terminal_cost follow trajectory.ilqr conventions. For
    models with quaternion dofs (free-floating bases, BALL joints) pass
    `charts=tangent_ops(model)` — the inner iLQR then linearizes and feeds
    back in the tangent space, which is the sound on-manifold formulation
    (trajectory/ilqr.py header). Scalar-joint models need nothing (Euclidean
    charts are exact).

    Call `solve(x, t)` each control period (or use `run` with a Ticker)."""

    def __init__(
        self,
        f: Callable,
        running_cost: Callable,
        terminal_cost: Callable,
        horizon: int,
        nu: int,
        dt: float,
        iters_per_solve: int = 8,
        charts=None,
    ):
        self.horizon = horizon
        self.nu = nu
        self.dt = dt
        self.buffer = RealTimeControlBuffer(nu, dt, horizon)
        self.log = ObservationLog.create()
        self._us_warm = jnp.zeros((horizon, nu))

        def _solve(x0, us_init):
            return ilqr(f, running_cost, terminal_cost, x0, us_init,
                        iters=iters_per_solve, charts=charts)

        self._solve = jax.jit(_solve)

    def solve(self, x, t: float):
        """One re-optimization from state x at time t; warm-started from the
        previous solution shifted by the elapsed steps."""
        self.log.observe(t, x)
        shift = max(int(round((t - self.buffer.t0) / self.dt)), 0)
        warm = jnp.concatenate(
            [self._us_warm[shift:], jnp.tile(self._us_warm[-1:], (min(shift, self.horizon), 1))]
        )[: self.horizon]
        res = self._solve(jnp.asarray(x), warm)
        self._us_warm = res.us
        self.buffer.splice(t, np.asarray(res.us))
        return res

    def get_control(self, t: float):
        return self.buffer.get(t)

    def run(self, env_step: Callable, x0, duration: float, replan_every: int = 5):
        """Closed-loop rollout: env_step(x, u) -> x advances the 'real' plant;
        replanning happens every `replan_every` control periods (the Ticker)."""
        x = jnp.asarray(x0)
        t = 0.0
        traj = [np.asarray(x)]
        n = int(duration / self.dt)
        for k in range(n):
            if k % replan_every == 0:
                self.solve(x, t)
            u = self.get_control(t)
            x = env_step(x, jnp.asarray(u))
            t += self.dt
            traj.append(np.asarray(x))
        return np.stack(traj)


class Ticker:
    """Wall-clock ticker (reference realtime::Ticker parity): calls
    registered listeners at a fixed period until stopped."""

    def __init__(self, period_s: float):
        self.period = period_s
        self._listeners = []
        self._running = False

    def registerTickListener(self, fn):
        self._listeners.append(fn)

    def start(self, max_ticks: int | None = None):
        self._running = True
        ticks = 0
        next_t = time.perf_counter()
        while self._running and (max_ticks is None or ticks < max_ticks):
            now = time.perf_counter()
            if now >= next_t:
                for fn in self._listeners:
                    fn(now)
                ticks += 1
                next_t += self.period
            else:
                time.sleep(min(next_t - now, 0.001))

    def stop(self):
        self._running = False
