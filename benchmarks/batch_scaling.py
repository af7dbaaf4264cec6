#!/usr/bin/env python
"""Throughput vs batch size for fwd and fwd+grad half-cheetah rollouts.

Separates latency-bound from bandwidth-bound regimes: if env-steps/s keeps
rising with B, per-op fixed overheads dominate and bigger batches are free
throughput; if flat, the pipeline is HBM-bandwidth-bound per env.
"""
import time

import jax
import jax.numpy as jnp

from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models.half_cheetah import half_cheetah, cheetah_init_q
from diffdart_tpu.sim import rollout_checkpointed, rollout

T = 50


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    m = half_cheetah(dt=2e-3)
    dtype = m.mass.dtype
    q0 = cheetah_init_q(m)
    for B in (2048, 4096, 8192, 16384, 32768):
        batch = State(q=jnp.tile(q0, (B, 1)), v=jnp.zeros((B, m.nv), dtype), t=jnp.zeros(B, dtype))
        taus = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (T, B, m.nv), dtype)

        froll = jax.jit(jax.vmap(lambda s, t: rollout(m, s, t)[0], in_axes=(0, 1)))

        def loss(taus):
            final = jax.vmap(lambda s, t: rollout_checkpointed(m, s, t), in_axes=(0, 1))(batch, taus)
            return jnp.mean(final.q[:, 1] ** 2)

        g = jax.jit(jax.grad(loss))
        tf = timeit(froll, batch, taus)
        tg = timeit(g, taus)
        print(f"B={B:6d}  fwd {B*T/tf:>12,.0f} steps/s   fwd+grad {B*T/tg:>12,.0f} steps/s")


if __name__ == "__main__":
    main()
