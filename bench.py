#!/usr/bin/env python
"""Benchmark harness: batched half-cheetah env-steps/sec (fwd and fwd+grad).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (BASELINE.json): env-steps/sec/chip fwd+grad on batched
half-cheetah; baseline target = 1,000,000 on a v5e-8 (we report per-chip).
Runs on whatever jax.default_backend() is (TPU under the driver).

WATCHDOG ARCHITECTURE (round-4 hardening; BENCH_r03 recorded 0 because the
TPU tunnel refused init, and this session's relay HANGS backend init
indefinitely — a module-level ``import jax`` + devices() would wedge the
driver forever):
- The parent process is jax-free. It first PROBES backend init in a short
  subprocess (bounded, retried once), then runs the measurement in a
  subprocess with a hard timeout (2 attempts; the second benefits from the
  compile cache the first populated).
- The measurement child appends each completed section to a partial-results
  file, so a timeout mid-run still yields the sections that finished.
- On total failure the parent emits an honest bounded-time error JSON line
  instead of hanging or dying silently.

The primary measured path is the fused Pallas tile step (ops/pallas_step.py):
the whole constrained timestep — FK, dynamics, collision, boxed LCP — runs as
one kernel per step with envs on the VPU lanes, and the backward kernel
remats in VMEM. Falls back to the vmap path if the fused path fails to
build/compile on this backend.
"""
import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_PARTIAL = os.path.join(_HERE, ".bench_partial.json")
_METRIC = "halfcheetah env-steps/sec/chip (fwd+grad, B=4096)"

_PROBE_TIMEOUT_S = 300
_MEASURE_TIMEOUTS_S = (2700, 1200)


# --------------------------------------------------------------------------
# parent (watchdog) side: jax-free
# --------------------------------------------------------------------------


def _emit(obj) -> None:
    print(json.dumps(obj), flush=True)


def _error_line(detail: str, partial=None):
    line = {
        "metric": _METRIC,
        "value": 0,
        "unit": "env-steps/sec",
        "vs_baseline": 0.0,
        "error": detail[:2000],
    }
    if partial:
        line["extra"] = partial
    return line


def _load_partial():
    try:
        with open(_PARTIAL) as f:
            return json.load(f)
    except Exception:
        return None


def _run_child(flag: str, timeout_s: int):
    """Run this file with `flag` in a child; return (rc, stdout, stderr).

    rc=-1 encodes a timeout. The child inherits the ambient environment —
    it MUST see the real TPU plumbing; the hardening is the timeout, not a
    scrub."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
        return proc.returncode, proc.stdout, proc.stderr
    except subprocess.TimeoutExpired as e:
        return -1, (e.stdout or ""), (e.stderr or "")


def _last_json_line(stdout: str):
    for line in reversed(stdout.strip().splitlines()):
        try:
            d = json.loads(line)
            if isinstance(d, dict) and "metric" in d:
                return d
        except Exception:
            continue
    return None


def main() -> None:
    t0 = time.time()
    errs = []

    # 1) probe: can the backend initialise at all, in bounded time?
    probed = None
    for attempt in range(2):
        rc, out, err = _run_child("--probe", _PROBE_TIMEOUT_S)
        if rc == 0 and "probe-ok" in out:
            probed = out.strip().splitlines()[-1]
            break
        errs.append(
            f"probe attempt {attempt + 1}: "
            + ("timeout" if rc == -1 else f"rc={rc}")
            + f" [{err.strip()[-300:]}]"
        )
    if probed is None:
        _emit(
            _error_line(
                "backend init probe failed/hung twice "
                f"(timeout {_PROBE_TIMEOUT_S}s each; axon relay down?): "
                + " | ".join(errs),
                partial=_load_partial(),
            )
        )
        return

    # 2) measure, with retry; partial results survive a mid-run timeout
    try:
        os.remove(_PARTIAL)
    except OSError:
        pass
    for attempt, tmo in enumerate(_MEASURE_TIMEOUTS_S):
        rc, out, err = _run_child("--measure", tmo)
        line = _last_json_line(out)
        if rc == 0 and line is not None:
            line.setdefault("extra", {})["wall_s"] = round(time.time() - t0, 1)
            _emit(line)
            return
        errs.append(
            f"measure attempt {attempt + 1}: "
            + ("timeout" if rc == -1 else f"rc={rc}")
            + f" [{err.strip()[-500:]}]"
        )

    # 3) bounded-time failure: report what DID finish
    partial = _load_partial()
    if partial and partial.get("value"):
        line = {
            "metric": _METRIC,
            "value": partial["value"],
            "unit": "env-steps/sec",
            "vs_baseline": round(partial["value"] / 1_000_000.0, 4),
            "extra": partial.get("extra", {}),
            "note": "partial: later sections timed out — " + " | ".join(errs)[:800],
        }
        _emit(line)
    else:
        _emit(_error_line(" | ".join(errs), partial=partial))


# --------------------------------------------------------------------------
# child side
# --------------------------------------------------------------------------


def _probe() -> None:
    import jax

    print("backend:", jax.default_backend(), "devices:", len(jax.devices()), flush=True)
    import jax.numpy as jnp

    assert float(jnp.ones(8).sum()) == 8.0
    print("probe-ok", flush=True)


class _Partial:
    """Append-as-you-go result file so a watchdog timeout keeps finished
    sections."""

    def __init__(self):
        self.value = None
        self.extra = {}

    def save(self):
        try:
            with open(_PARTIAL, "w") as f:
                json.dump({"value": self.value, "extra": self.extra}, f)
        except OSError:
            pass


def _timeit(fn, out_extract, iters=5):
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    out_extract(out).block_until_ready()
    return (time.perf_counter() - t0) / iters


def measure() -> None:
    import jax

    # persistent compile cache: the fused-kernel and constrained-rollout grad
    # programs are expensive to compile on the remote-compile tunnel
    cache = os.path.join(_HERE, ".jax_cache", "device")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp

    from diffdart_tpu.dynamics.model import State
    from diffdart_tpu.models.half_cheetah import half_cheetah, cheetah_init_q
    from diffdart_tpu.sim import rollout, rollout_checkpointed

    part = _Partial()

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

    extra = part.extra
    extra.update({"backend": jax.default_backend(), "batch": B, "horizon": T, "nv": m.nv})

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
    part.save()

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

    extra["fwd_env_steps_per_sec"] = round(sps_fwd)
    part.value = round(sps_grad)
    part.save()

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
    part.save()

    # the BASELINE metric AS WRITTEN: full contact solve + gradients.
    # (a) fwd+grad: BPTT through a 10-step contact rollout, grad wrt the
    #     control tape; (b) per-step Jacobians: timestep_jacobians (the
    #     reference's BackpropSnapshot.getPosPos/PosVel/VelVel/... set)
    #     computed every step.
    try:
        Th = 10
        # measured-best honest config for the gradient workload (see
        # PARITY.md): batch amortizes per-step overheads, contact_budget=16
        # keeps the LCP at the 16 deepest of the humanoid's 33 static slots
        # (both feet = 16 box corners; semantics gated by tests/test_stack.py)
        from diffdart_tpu.models.humanoid import humanoid, humanoid_init_q

        mh = humanoid(dt=2e-3)
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
    part.save()

    # r4: the fused HYBRID humanoid (tile FK/dynamics/assembly + batched
    # lowrank LCP, contact_budget=16 gathered per env) — the candidate to
    # close the last 8% of the 50k Atlas fwd+grad target. Trace is ~97s
    # since the lax-bind rewrite of ops/tile.py; the compile is cached.
    try:
        from diffdart_tpu.models.humanoid import humanoid, humanoid_init_q
        from diffdart_tpu.sim.tilestep import build_tile_step

        mh = humanoid(dt=2e-3)
        mg = mh.replace(contact_budget=16)
        Bh2, Th2 = 1024, 10
        Sh, Lh = 8, Bh2 // 8
        tstep = build_tile_step(mg, output="tiles", lcp="xla")
        qh = jnp.tile(humanoid_init_q(mg), (Bh2, 1))
        vh = jnp.zeros((Bh2, mg.nv), dtype)

        def toT(x):
            t = x.T.reshape(x.shape[1], Sh, Lh)
            return tuple(t[i] for i in range(x.shape[1]))

        qt0, vt0 = toT(qh), toT(vh)
        tauh = jnp.zeros((Th2, Bh2, mg.nv), dtype)

        def loss_hy(taus):
            def body(c, tau):
                qn, vn = tstep(c[0], c[1], toT(tau))
                return (qn, vn), None

            (qf, vf), _ = jax.lax.scan(body, (qt0, vt0), taus)
            return sum(jnp.mean(x**2) for x in vf) + jnp.mean(qf[2] ** 2)

        ghy = jax.jit(jax.grad(loss_hy))
        ghy(tauh).block_until_ready()
        t_hy = _timeit(lambda: ghy(tauh), lambda o: o, iters=3)
        extra["atlas_hybrid_fwdgrad_steps_per_sec"] = round(Bh2 * Th2 / t_hy)
        extra["atlas_hybrid_fwdgrad_vs_50k_target"] = round(
            Bh2 * Th2 / t_hy / 50_000.0, 4
        )
    except Exception as e:  # noqa: BLE001
        extra["atlas_hybrid_error"] = f"{type(e).__name__}: {e}"[:300]
    part.save()

    try:
        from diffdart_tpu.models.humanoid import humanoid, humanoid_init_q
        from diffdart_tpu.neural.jacobians import timestep_jacobians

        mh = humanoid(dt=2e-3)
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
    part.save()

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
    part.save()

    result = {
        "metric": _METRIC,
        "value": round(sps_grad),
        "unit": "env-steps/sec",
        "vs_baseline": round(sps_grad / 1_000_000.0, 4),
        "extra": extra,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        _probe()
    elif len(sys.argv) > 1 and sys.argv[1] == "--measure":
        try:
            measure()
        except BaseException as e:  # noqa: BLE001
            # still emit a JSON line so a clean-exit child is always parseable
            print(
                json.dumps(
                    {
                        "metric": _METRIC,
                        "value": 0,
                        "unit": "env-steps/sec",
                        "vs_baseline": 0.0,
                        "error": f"{type(e).__name__}: {e}"[:2000],
                    }
                ),
                flush=True,
            )
            sys.exit(1)
    else:
        main()
