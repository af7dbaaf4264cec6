#!/usr/bin/env python
"""BASELINE #4 — 4096 vmapped half-cheetah envs: trajectory-gradient descent
on an open-loop gait, fully on-device (vmap + scan + remat)."""
import sys

sys.path.insert(0, ".")
import time

import jax
import jax.numpy as jnp

from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models.half_cheetah import half_cheetah, cheetah_init_q
from diffdart_tpu.sim.step import step


def main():
    B, T = 4096, 100
    m = half_cheetah(dt=2e-3)
    dtype = m.mass.dtype
    q0 = cheetah_init_q(m)
    batch = State(q=jnp.tile(q0, (B, 1)), v=jnp.zeros((B, m.nv), dtype), t=jnp.zeros(B, dtype))
    key = jax.random.PRNGKey(0)

    # per-env phase-shifted sinusoid gait parameters: (amp, freq, phase) per leg dof
    def gait_controls(params, t_idx):
        amp, phase = params  # (6,), (6,)
        t = t_idx * 2e-3
        u = amp * jnp.sin(2 * jnp.pi * 2.0 * t + phase)
        return jnp.concatenate([jnp.zeros(3, dtype), u])

    def rollout_reward(params, s):
        def body(carry, t_idx):
            st = carry
            tau = gait_controls(params, t_idx)
            st = step(m, st, tau)
            return st, None

        body = jax.checkpoint(body)
        final, _ = jax.lax.scan(body, s, jnp.arange(T))
        return final.q[1]  # forward progress (planar root x)

    def loss(params):
        rewards = jax.vmap(lambda s: rollout_reward(params, s))(batch)
        return -jnp.mean(rewards)

    vg = jax.jit(jax.value_and_grad(loss))
    params = (0.5 * jnp.ones(6, dtype), jnp.linspace(0, 3.14, 6).astype(dtype))
    t0 = time.time()
    for i in range(20):
        l, g = vg(params)
        params = jax.tree.map(lambda p, gr: p - 0.2 * gr, params, g)
        if i % 5 == 0:
            print(f"iter {i:2d}  mean forward progress {-float(l):.3f} m")
    dtime = time.time() - t0
    print(f"total env-steps: {20*B*T:,} in {dtime:.1f}s -> {20*B*T/dtime:,.0f} env-steps/s (incl. compile)")


if __name__ == "__main__":
    main()
