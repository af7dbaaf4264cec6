#!/usr/bin/env python
"""Benchmark harness: batched half-cheetah env-steps/sec (fwd and fwd+grad).

Prints result JSON lines of the form
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}
The LAST such line is the authoritative result.

Primary metric (BASELINE.json): env-steps/sec/chip fwd+grad on batched
half-cheetah; baseline target = 1,000,000 on a v5e-8 (we report per-chip).

STREAMING WATCHDOG ARCHITECTURE (round-5 hardening).
History of driver-visible failures this harness must survive:
  r01: TPU backend FailedPrecondition mid-run            -> rc=1, traceback
  r03: axon relay down, backend init raises               -> value 0 line
  r04: driver wall-clock timeout killed the process tree  -> rc=124, EMPTY
       tail, because the round-4 parent captured the child's stdout and
       only printed at the very end. The measurement itself had completed
       5 sections (21.1M cheetah fused fwd+grad) — all lost.
Design that fixes all three:
- The parent process is jax-free and NEVER buffers: the measurement child's
  stdout is relayed line-by-line to our stdout the moment each line is
  produced, so whatever the driver's timeout is, every completed section's
  result line is already in the captured tail when the SIGKILL lands.
- The child emits a FULL result line after EVERY completed section, with
  monotonically growing "extra". Sections are ordered by importance:
  (1) primary cheetah fwd+grad, (2) Atlas fwd+grad [the 50k target],
  (3) Atlas fwd, (4) per-step Jacobians, (5) hybrid fused humanoid,
  (6) param-grads. A kill after section k keeps sections 1..k.
- Backend probe is bounded (240 s, one retry). If the TPU relay is down
  (hangs init — observed r03 and at round-5 build time), we fall back to a
  SCRUBBED pure-CPU measurement of a reduced config, honestly labeled
  extra.backend="cpu" — a real number beats a zero.
- Each completed section also appends to .bench_partial.json as a belt-and-
  braces record.

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
import threading
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_PARTIAL = os.path.join(_HERE, ".bench_partial.json")
_METRIC = "halfcheetah env-steps/sec/chip (fwd+grad, B=4096)"

_PROBE_TIMEOUT_S = 240
_MEASURE_TIMEOUT_S = 3300  # generous; streaming makes driver timeouts safe


# --------------------------------------------------------------------------
# parent (watchdog) side: jax-free, unbuffered relay
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


def _scrubbed_cpu_env() -> dict:
    """Pure-CPU env immune to the axon relay (same scrub as __graft_entry__)."""
    env = dict(os.environ)
    parts = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    ]
    if parts:
        env["PYTHONPATH"] = os.pathsep.join(parts)
    else:
        env.pop("PYTHONPATH", None)
    for k in (
        "JAX_PLATFORMS",
        "JAX_PLATFORM_NAME",
        "JAX_COMPILATION_CACHE_DIR",
        "PALLAS_AXON_POOL_IPS",
        "PALLAS_AXON_REMOTE_COMPILE",
        "PALLAS_AXON_TPU_GEN",
        "AXON_LOOPBACK_RELAY",
    ):
        env.pop(k, None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _run_streaming(args, timeout_s, env=None):
    """Run a child, relaying its stdout lines to ours IMMEDIATELY.

    Returns (rc, saw_result_line). rc=-1 encodes a timeout (child killed).
    stderr is relayed too (the driver's tail captures both) but rate-capped.
    """
    proc = subprocess.Popen(
        [sys.executable, "-u"] + args,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        env=env,
    )
    saw_result = [False]

    def _pump(stream, is_out):
        try:
            for line in iter(stream.readline, ""):
                line = line.rstrip("\n")
                if is_out:
                    print(line, flush=True)
                    if '"metric"' in line:
                        saw_result[0] = True
                else:
                    # keep stderr visible but bounded per line
                    sys.stderr.write(line[:500] + "\n")
                    sys.stderr.flush()
        except Exception:
            pass

    t_out = threading.Thread(target=_pump, args=(proc.stdout, True), daemon=True)
    t_err = threading.Thread(target=_pump, args=(proc.stderr, False), daemon=True)
    t_out.start()
    t_err.start()
    try:
        rc = proc.wait(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        proc.kill()
        try:
            proc.wait(timeout=10)
        except Exception:
            pass
        rc = -1
    t_out.join(timeout=5)
    t_err.join(timeout=5)
    return rc, saw_result[0]


def _probe_backend():
    """Bounded probe of the ambient (TPU) backend. True if usable."""
    me = os.path.abspath(__file__)
    for attempt in range(2):
        print(f"# probing TPU backend (attempt {attempt + 1}/2, "
              f"{_PROBE_TIMEOUT_S}s cap)", flush=True)
        try:
            proc = subprocess.run(
                [sys.executable, "-u", me, "--probe"],
                capture_output=True,
                text=True,
                timeout=_PROBE_TIMEOUT_S,
            )
            if proc.returncode == 0 and "probe-ok" in proc.stdout:
                print("# probe ok:", proc.stdout.strip().splitlines()[0], flush=True)
                return True
            print(f"# probe failed rc={proc.returncode}", flush=True)
        except subprocess.TimeoutExpired:
            print("# probe timed out (axon relay hung at import)", flush=True)
    return False


def main() -> None:
    t0 = time.time()
    me = os.path.abspath(__file__)
    # Never-silent guarantee: the r4 driver run was killed (rc=124) with an
    # EMPTY tail. Emit a parseable line BEFORE the (up to 2x240 s, silent)
    # backend probe so a driver timeout at ANY point still captures a line;
    # every later line supersedes it.
    _emit(_error_line("bench started; probing backend"))
    try:
        os.remove(_PARTIAL)
    except OSError:
        pass

    if _probe_backend():
        rc, saw = _run_streaming([me, "--measure"], _MEASURE_TIMEOUT_S)
        if saw:
            return  # result lines already on stdout; last one wins
        # child died before its first section: one retry (compiles cached)
        rc, saw = _run_streaming([me, "--measure"], _MEASURE_TIMEOUT_S // 2)
        if saw:
            return
        _emit(
            _error_line(
                f"measure child produced no result line twice (last rc={rc})",
                partial=_load_partial(),
            )
        )
        return

    # TPU relay down/hanging: honest CPU fallback, clearly labeled.
    env = _scrubbed_cpu_env()
    rc, saw = _run_streaming([me, "--measure", "--cpu-fallback"], 1500, env=env)
    if not saw:
        _emit(
            _error_line(
                "TPU backend init hung/failed twice "
                f"({_PROBE_TIMEOUT_S}s probes; axon relay down) and the CPU "
                f"fallback also failed (rc={rc})",
                partial=_load_partial(),
            )
        )


# --------------------------------------------------------------------------
# child side
# --------------------------------------------------------------------------


def _probe() -> None:
    import jax

    print("backend:", jax.default_backend(), "devices:", len(jax.devices()), flush=True)
    import jax.numpy as jnp

    assert float(jnp.ones(8).sum()) == 8.0
    print("probe-ok", flush=True)


class _Result:
    """Monotone result accumulator: emits a full line after every section."""

    def __init__(self):
        self.value = None
        self.extra = {}

    def line(self):
        v = self.value or 0
        return {
            "metric": _METRIC,
            "value": v,
            "unit": "env-steps/sec",
            "vs_baseline": round(v / 1_000_000.0, 4),
            "extra": self.extra,
        }

    def checkpoint(self):
        print(json.dumps(self.line()), flush=True)
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


def measure(cpu_fallback: bool = False) -> None:
    import jax

    # persistent compile cache: the fused-kernel and constrained-rollout grad
    # programs are expensive to compile on the remote-compile tunnel
    cache = os.path.join(_HERE, ".jax_cache", "cpu-fb" if cpu_fallback else "device")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp

    from diffdart_tpu.dynamics.model import State
    from diffdart_tpu.models.half_cheetah import half_cheetah, cheetah_init_q
    from diffdart_tpu.sim import rollout, rollout_checkpointed

    res = _Result()

    B = 1024 if cpu_fallback else 4096
    T = 20 if cpu_fallback else 50
    m = half_cheetah(dt=2e-3)
    q0 = cheetah_init_q(m)
    dtype = m.mass.dtype
    qs = jnp.tile(q0, (B, 1))
    vs = jnp.zeros((B, m.nv), dtype)
    batch = State(q=qs, v=vs, t=jnp.zeros(B, dtype))
    key = jax.random.PRNGKey(0)
    taus = 0.1 * jax.random.normal(key, (T, B, m.nv), dtype)

    extra = res.extra
    extra.update({"backend": jax.default_backend(), "batch": B, "horizon": T, "nv": m.nv})
    if cpu_fallback:
        extra["note"] = "TPU relay down at bench time; CPU fallback (reduced config)"

    # ------------- section 1 (primary): fused Pallas tile path -------------
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

    if sps_grad is None:  # fallback / reference: vmap path
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
    res.value = round(sps_grad)
    res.checkpoint()  # <- primary metric is now on stdout, whatever happens later

    # -------- section 2: Atlas fwd+grad — the BASELINE metric as written ----
    # (full contact solve + gradients: BPTT through a contact rollout, grad
    # wrt the control tape). Measured-best honest config (r5 TPU sweep,
    # scripts/atlas_sweep.py close50k: 50,424 steps/s = 1.0085x target):
    # B=2048 amortizes per-step overheads, Th=20 BPTT amortizes per-call
    # dispatch over the tunnel, contact_budget=12 keeps the LCP at the 12
    # deepest of the humanoid's 33 static slots (enough for both feet flat;
    # budget semantics gated by tests/test_stack.py). Larger configs
    # (B>=3072 at Th=20, Th=50) overflow the remote-compile helper.
    try:
        from diffdart_tpu.models.humanoid import humanoid, humanoid_init_q

        Th = 10 if cpu_fallback else 20
        mh = humanoid(dt=2e-3)
        mg = mh.replace(contact_budget=12)
        Bg = 256 if cpu_fallback else 2048
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
        extra["atlas_fwdgrad_config"] = f"B={Bg}, contact_budget=12, T={Th} BPTT"
    except Exception as e:  # noqa: BLE001
        extra["atlas_fwdgrad_error"] = f"{type(e).__name__}: {e}"[:300]
    res.checkpoint()

    # ---------------- section 3: Atlas forward step rate -------------------
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
    res.checkpoint()

    # --------- section 4: per-step 6-Jacobian BackpropSnapshot set ----------
    # (skipped on the CPU fallback: the humanoid jacrev program takes >20 min
    # to compile on a 1-vCPU host — observed r5 — and the number is not
    # meaningful off-TPU anyway)
    try:
        if cpu_fallback:
            raise RuntimeError("skipped on cpu fallback")
        from diffdart_tpu.models.humanoid import humanoid, humanoid_init_q
        from diffdart_tpu.neural.jacobians import timestep_jacobians

        mh = humanoid(dt=2e-3)
        Bj = 64 if cpu_fallback else 256
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
    res.checkpoint()

    # --------- section 5: fused HYBRID humanoid (tile FK + lowrank LCP) -----
    # the candidate to close the 50k Atlas fwd+grad target; ~97 s trace since
    # the lax-bind rewrite of ops/tile.py, big compile (cached after first).
    if not cpu_fallback:
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
        res.checkpoint()

    # --------- section 6: parameter-gradient (WithRespectTo) throughput -----
    # grad of a rollout loss wrt MODEL parameters (mass) — vmap path by
    # design (rollout_fast's dispatch: the fused path bakes params constant)
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
    res.checkpoint()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        _probe()
    elif len(sys.argv) > 1 and sys.argv[1] == "--measure":
        try:
            measure(cpu_fallback="--cpu-fallback" in sys.argv)
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
