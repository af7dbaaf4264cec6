#!/usr/bin/env python
"""Sweep the Atlas-with-gradients configuration space on the live backend.

Goal: close BASELINE.json config 5 as written — "full contact solve +
per-step Jacobians >= 50k steps/sec" — in its honest fwd+grad reading
(10-step BPTT, grad wrt control tape). r4 driver-captured best: 46.4k at
B=1024, contact_budget=16, rollout_checkpointed. Levers swept here:
  * batch size (amortizes per-step fixed costs)
  * contact_budget (LCP rows: 3*budget + limit rows)
  * remat (rollout_checkpointed) vs plain rollout (T=10 fits in HBM easily)
  * the r4 hybrid fused tile path (tile FK/dynamics + batched lowrank LCP)

Usage: python scripts/atlas_sweep.py [quick|full|hybrid]
Prints one JSON line per config as it completes (streaming, kill-safe).
"""
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def main(mode: str) -> None:
    import jax

    cache = os.path.join(_HERE, ".jax_cache", "device")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp

    from diffdart_tpu.dynamics.model import State
    from diffdart_tpu.models.humanoid import humanoid, humanoid_init_q
    from diffdart_tpu.sim import rollout, rollout_checkpointed

    backend = jax.default_backend()

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    emit(backend=backend, mode=mode)

    def measure_vmap(B, budget, remat, Th=10, iters=3):
        mh = humanoid(dt=2e-3).replace(contact_budget=budget)
        dtype = mh.mass.dtype
        bg = State(
            q=jnp.tile(humanoid_init_q(mh), (B, 1)),
            v=jnp.zeros((B, mh.nv), dtype),
            t=jnp.zeros(B, dtype),
        )
        tausH = jnp.zeros((Th, B, mh.nv), dtype)

        def lossh(taus):
            if remat:
                final = jax.vmap(lambda s, t: rollout_checkpointed(mh, s, t), in_axes=(0, 1))(bg, taus)
            else:
                final = jax.vmap(lambda s, t: rollout(mh, s, t)[0], in_axes=(0, 1))(bg, taus)
            return jnp.mean(final.q[:, 2] ** 2) + 1e-4 * jnp.mean(taus**2)

        gradh = jax.jit(jax.grad(lossh))
        t0 = time.perf_counter()
        g0 = gradh(tausH)
        g0.block_until_ready()
        compile_s = time.perf_counter() - t0
        # sanity: a grad that comes back non-finite or exactly zero means the
        # execution silently failed (r5 sweep saw a 445M steps/s phantom at
        # B=4096) — mark it rather than report a nonsense rate
        import numpy as _np

        gs = _np.asarray(jnp.abs(g0).max())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = gradh(tausH)
        out.block_until_ready()
        dt_it = (time.perf_counter() - t0) / iters
        return B * Th / dt_it, compile_s, float(gs)

    if mode in ("quick", "full", "close50k"):
        # (B, budget, remat, Th)
        if mode == "close50k":
            # r5 sweep state: best honest 49,741 at (2048, 12, False, Th=10).
            # Levers left: longer BPTT horizon (amortizes per-call dispatch
            # over the tunnel; steps/sec = B*Th/t), bigger batch at budget 12.
            configs = [
                (2048, 12, False, 20),
                (2048, 12, False, 50),
                (4096, 12, False, 20),
                (4096, 16, False, 10),   # re-measure the r5 phantom, guarded
                (3072, 12, False, 20),
            ]
        else:
            configs = [
                (1024, 16, True, 10),   # r4 reference point
                (2048, 16, True, 10),
                (1024, 16, False, 10),
                (2048, 16, False, 10),
                (2048, 12, False, 10),
                (4096, 16, False, 10),
            ]
            if mode == "full":
                configs += [
                    (4096, 12, False, 10),
                    (2048, 20, False, 10),
                    (8192, 16, False, 10),
                    (1024, 12, True, 10),
                ]
        for B, budget, remat, Th in configs:
            try:
                sps, comp, gmax = measure_vmap(B, budget, remat, Th=Th)
                emit(path="vmap", B=B, budget=budget, remat=remat, Th=Th,
                     steps_per_sec=round(sps), vs_50k=round(sps / 50_000.0, 4),
                     compile_s=round(comp, 1), grad_absmax=gmax)
            except Exception as e:  # noqa: BLE001
                emit(path="vmap", B=B, budget=budget, remat=remat, Th=Th,
                     error=f"{type(e).__name__}: {e}"[:300])

    if mode in ("hybrid", "full"):
        from diffdart_tpu.sim.tilestep import build_tile_step

        Th = 10
        for B, budget in ((1024, 16), (2048, 16)):
            try:
                mh = humanoid(dt=2e-3).replace(contact_budget=budget)
                dtype = mh.mass.dtype
                Sh, Lh = 8, B // 8
                t0 = time.perf_counter()
                tstep = build_tile_step(mh, output="tiles", lcp="xla")
                trace_s = time.perf_counter() - t0
                qh = jnp.tile(humanoid_init_q(mh), (B, 1))
                vh = jnp.zeros((B, mh.nv), dtype)

                def toT(x):
                    t = x.T.reshape(x.shape[1], Sh, Lh)
                    return tuple(t[i] for i in range(x.shape[1]))

                qt0, vt0 = toT(qh), toT(vh)
                tauh = jnp.zeros((Th, B, mh.nv), dtype)

                def loss_hy(taus):
                    def body(c, tau):
                        qn, vn = tstep(c[0], c[1], toT(tau))
                        return (qn, vn), None

                    (qf, vf), _ = jax.lax.scan(body, (qt0, vt0), taus)
                    return sum(jnp.mean(x**2) for x in vf) + jnp.mean(qf[2] ** 2)

                ghy = jax.jit(jax.grad(loss_hy))
                t0 = time.perf_counter()
                ghy(tauh).block_until_ready()
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                for _ in range(3):
                    out = ghy(tauh)
                jax.block_until_ready(out)
                dt_it = (time.perf_counter() - t0) / 3
                emit(path="hybrid", B=B, budget=budget,
                     steps_per_sec=round(B * Th / dt_it),
                     vs_50k=round(B * Th / dt_it / 50_000.0, 4),
                     trace_s=round(trace_s, 1), compile_s=round(compile_s, 1))
            except Exception as e:  # noqa: BLE001
                emit(path="hybrid", B=B, budget=budget,
                     error=f"{type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "quick")
