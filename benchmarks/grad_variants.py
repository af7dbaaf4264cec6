#!/usr/bin/env python
"""Compare BPTT gradient strategies for the batched half-cheetah rollout.

Times fwd and fwd+grad for:
  * remat1   — per-step jax.checkpoint, save lcp_lam only (round-1 default)
  * segK     — segment remat (remat across segments of K steps)
  * full     — no remat: XLA stores all step residuals

Run on the target backend (TPU under the driver tunnel).
"""
import time

import jax
import jax.numpy as jnp

from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models.half_cheetah import half_cheetah, cheetah_init_q
from diffdart_tpu.sim import rollout_checkpointed, rollout_final, rollout_segmented

B = 4096
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
    batch = State(q=jnp.tile(q0, (B, 1)), v=jnp.zeros((B, m.nv), dtype), t=jnp.zeros(B, dtype))
    key = jax.random.PRNGKey(0)
    taus = 0.1 * jax.random.normal(key, (T, B, m.nv), dtype)

    def make_loss(roller):
        def loss(taus):
            final = jax.vmap(lambda s, t: roller(m, s, t), in_axes=(0, 1))(batch, taus)
            return jnp.mean(final.q[:, 1] ** 2) + 1e-4 * jnp.mean(taus**2)

        return jax.jit(jax.grad(loss))

    variants = {
        "remat1": rollout_checkpointed,
        "seg5": lambda mm, s, t: rollout_segmented(mm, s, t, segment=5),
        "seg10": lambda mm, s, t: rollout_segmented(mm, s, t, segment=10),
        "full": rollout_final,
    }
    print(f"backend={jax.default_backend()} B={B} T={T} nv={m.nv}")
    for name, roller in variants.items():
        g = make_loss(roller)
        try:
            t = timeit(g, taus)
            print(f"{name:8s} fwd+grad {t*1e3:8.2f} ms  -> {B*T/t:,.0f} env-steps/s")
        except Exception as e:  # noqa: BLE001
            print(f"{name:8s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
