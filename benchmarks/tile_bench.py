#!/usr/bin/env python
"""Tile-path benchmark: batch-last tiled step (XLA and Pallas) vs the vmap
path, batched half-cheetah fwd and fwd+grad. Run on the TPU backend."""
import os
import time

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache", "device")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models.half_cheetah import half_cheetah, cheetah_init_q
from diffdart_tpu.sim import rollout_final, rollout_checkpointed
from diffdart_tpu.sim.tilestep import build_tile_step
from diffdart_tpu.ops.pallas_step import to_tiles

B = 4096
T = 50


def timeit(f, *args, n=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    m = half_cheetah(dt=2e-3)
    dtype = m.mass.dtype
    q0 = cheetah_init_q(m)
    qs = jnp.tile(q0, (B, 1))
    vs = jnp.zeros((B, m.nv), dtype)
    batch = State(q=qs, v=vs, t=jnp.zeros(B, dtype))
    key = jax.random.PRNGKey(0)
    taus = 0.1 * jax.random.normal(key, (T, B, m.nv), dtype)

    qt = to_tiles(qs)
    vt = to_tiles(vs)
    taus_t = jax.vmap(to_tiles)(taus)

    print(f"backend={jax.default_backend()} B={B} T={T} nv={m.nv}", flush=True)
    results = {}

    # ---- vmap baseline ----
    roll = jax.jit(jax.vmap(lambda s, t: rollout_final(m, s, t), in_axes=(0, 1)))
    t = timeit(lambda x: roll(batch, x).q, taus)
    results["vmap_fwd"] = B * T / t
    print(f"vmap     fwd      {t*1e3:8.2f} ms  -> {B*T/t:,.0f} env-steps/s", flush=True)

    def loss_vmap(taus):
        final = jax.vmap(lambda s, t: rollout_checkpointed(m, s, t), in_axes=(0, 1))(batch, taus)
        return jnp.mean(final.q[:, 1] ** 2) + 1e-4 * jnp.mean(taus**2)

    g_vmap = jax.jit(jax.grad(loss_vmap))
    t = timeit(g_vmap, taus)
    results["vmap_grad"] = B * T / t
    print(f"vmap     fwd+grad {t*1e3:8.2f} ms  -> {B*T/t:,.0f} env-steps/s", flush=True)

    # ---- Pallas tile step (shared builders => shared compile cache) ----
    try:
        from diffdart_tpu.ops.pallas_step import make_bench_fns

        roll_p, grad_p = make_bench_fns(m)
        roll_p_j = jax.jit(roll_p)
        t = timeit(roll_p_j, qt, vt, taus_t)
        results["pallas_fwd"] = B * T / t
        print(f"pallas   fwd      {t*1e3:8.2f} ms  -> {B*T/t:,.0f} env-steps/s", flush=True)

        g_p = jax.jit(grad_p)
        t = timeit(g_p, qt, vt, taus_t)
        results["pallas_grad"] = B * T / t
        print(f"pallas   fwd+grad {t*1e3:8.2f} ms  -> {B*T/t:,.0f} env-steps/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"pallas   FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    if os.environ.get("TILE_BENCH_XLA") == "1":
        # ---- XLA tile step (tuple-of-tiles carries: no concat-rooted fusions) ----
        tstep = build_tile_step(m, output="tiles")
        q_tt = tuple(qt[i] for i in range(m.nq))
        v_tt = tuple(vt[i] for i in range(m.nv))

        def roll_tile(q_tt, v_tt, taus_t):
            def body(c, tau):
                qn, vn = tstep(c[0], c[1], tuple(tau[i] for i in range(m.nv)))
                return (qn, vn), None
            (qf, vf), _ = jax.lax.scan(body, (q_tt, v_tt), taus_t)
            return qf, vf

        roll_tile_j = jax.jit(roll_tile)
        t = timeit(roll_tile_j, q_tt, v_tt, taus_t)
        results["tile_fwd"] = B * T / t
        print(f"tileXLA  fwd      {t*1e3:8.2f} ms  -> {B*T/t:,.0f} env-steps/s", flush=True)

        def loss_tile(taus_t):
            def body(c, tau):
                qn, vn = jax.checkpoint(tstep)(c[0], c[1], tuple(tau[i] for i in range(m.nv)))
                return (qn, vn), None
            (qf, vf), _ = jax.lax.scan(body, (q_tt, v_tt), taus_t)
            return jnp.mean(qf[1] ** 2) + 1e-4 * jnp.mean(taus_t**2)

        g_tile = jax.jit(jax.grad(loss_tile))
        t = timeit(g_tile, taus_t)
        results["tile_grad"] = B * T / t
        print(f"tileXLA  fwd+grad {t*1e3:8.2f} ms  -> {B*T/t:,.0f} env-steps/s", flush=True)

    print({k: f"{v:,.0f}" for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
