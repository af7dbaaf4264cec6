"""Multi-device data-parallel path (parallel/comm.py) on the 8-virtual-CPU mesh.

SURVEY.md §2.4: env-parallelism is the one axis this framework adds over the
reference (which is single-process Eigen + std::thread). These tests pin down
the two contracts the driver's dryrun exercises:
  1. sharded execution is numerically identical to unsharded vmap,
  2. the replicated-param gradient equals the mean of per-shard gradients
     (i.e. the XLA-inserted psum is a true mean over the env axis).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models.half_cheetah import half_cheetah, cheetah_init_q
from diffdart_tpu.parallel.comm import data_parallel_grad, make_mesh, shard_batch
from diffdart_tpu.sim import rollout


N_DEV = 8


@pytest.fixture(autouse=True, scope="module")
def _no_compile_cache():
    """Sharded-program tests run CACHE-LESS: XLA:CPU segfaults when
    deserializing large 8-device sharded executables from the persistent
    compilation cache (r3: hard crash in
    compilation_cache.get_executable_and_time loading the dryrun train
    step on a warm cache). Compiling fresh is slower but always safe; the
    cache is restored for the other files this worker runs."""
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", prev)


@pytest.fixture(scope="module")
def cheetah_batch():
    B, T = 2 * N_DEV, 3
    m = half_cheetah(dt=2e-3)
    q0 = cheetah_init_q(m)
    dtype = m.mass.dtype
    key = jax.random.PRNGKey(3)
    kq, kv = jax.random.split(key)
    batch = State(
        q=jnp.tile(q0, (B, 1)) + 0.01 * jax.random.normal(kq, (B, m.nq), dtype),
        v=0.05 * jax.random.normal(kv, (B, m.nv), dtype),
        t=jnp.zeros(B, dtype),
    )
    taus = 0.1 * jax.random.normal(jax.random.PRNGKey(7), (T, m.nv), dtype)
    return m, batch, taus


def _per_env_loss(m):
    def fn(taus, state_batch):
        def one_env(s):
            final, _ = rollout(m, s, taus)
            return final.q[1] ** 2 + 0.1 * jnp.sum(final.v**2)

        return jax.vmap(one_env)(state_batch)

    return fn


def test_mesh_has_8_devices():
    assert len(jax.devices()) >= N_DEV, "conftest must provide 8 virtual CPU devices"
    mesh = make_mesh(N_DEV)
    assert mesh.devices.shape == (N_DEV,)


def test_make_mesh_raises_on_too_few_devices():
    with pytest.raises(ValueError, match="requested"):
        make_mesh(len(jax.devices()) + 1)


def test_sharded_loss_matches_vmap(cheetah_batch):
    m, batch, taus = cheetah_batch
    loss_fn = _per_env_loss(m)

    # unsharded reference: plain vmap on one device
    ref = jax.jit(loss_fn)(taus, batch)

    mesh = make_mesh(N_DEV)
    sharded = shard_batch(mesh, batch)
    got = jax.jit(loss_fn)(taus, sharded)

    # same program, same arithmetic -> bitwise identical per-env losses
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_data_parallel_grad_matches_unsharded(cheetah_batch):
    m, batch, taus = cheetah_batch
    loss_fn = _per_env_loss(m)

    def total(taus, batch):
        return jnp.mean(loss_fn(taus, batch))

    ref_loss, ref_grad = jax.jit(jax.value_and_grad(total))(taus, batch)

    mesh = make_mesh(N_DEV)
    sharded = shard_batch(mesh, batch)
    step_fn = data_parallel_grad(loss_fn, mesh)
    loss, grad = step_fn(taus, sharded)

    assert jnp.isfinite(loss)
    np.testing.assert_allclose(np.asarray(loss), np.asarray(ref_loss), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(ref_grad), rtol=1e-9, atol=1e-12)


def test_replicated_grad_is_mean_of_per_device_grads(cheetah_batch):
    """grad wrt replicated params == mean over shards of per-shard grads."""
    m, batch, taus = cheetah_batch
    loss_fn = _per_env_loss(m)
    B = batch.q.shape[0]
    per_dev = B // N_DEV

    mesh = make_mesh(N_DEV)
    sharded = shard_batch(mesh, batch)
    _, grad = data_parallel_grad(loss_fn, mesh)(taus, sharded)

    # manual per-device gradients of the *same mean-loss* objective:
    # mean over full batch = mean over devices of per-device means
    def shard_loss(taus, shard_states):
        return jnp.mean(loss_fn(taus, shard_states))

    g_shards = []
    for d in range(N_DEV):
        sl = jax.tree.map(lambda x: x[d * per_dev : (d + 1) * per_dev], batch)
        g_shards.append(jax.grad(shard_loss)(taus, sl))
    manual = jnp.mean(jnp.stack(g_shards), axis=0)

    # reduction order differs between the sharded psum and the host-side mean
    np.testing.assert_allclose(np.asarray(grad), np.asarray(manual), rtol=1e-7, atol=1e-10)


def test_dryrun_multichip_inprocess_and_device_fenced(monkeypatch):
    """The driver entry point must succeed from an already-initialised
    process, AND its in-process fast path must wrap _dryrun_impl in
    jax.default_device(cpu) so default-device array creation can never land
    on a non-CPU backend (the exact round-2 failure). One execution checks
    both — the dryrun compiles the full sharded train step, so running it
    twice doubled this file's wall time for no extra coverage."""
    mod = _load_graft_entry()
    seen = {}
    real_impl = mod._dryrun_impl

    def spy(n, devices):
        import jax as _jax

        seen["default_device"] = _jax.config.jax_default_device
        seen["devices"] = list(devices)
        return real_impl(n, devices)

    monkeypatch.setattr(mod, "_dryrun_impl", spy)
    mod.dryrun_multichip(N_DEV)  # raises on failure
    assert seen["default_device"] is not None
    assert seen["default_device"].platform == "cpu"
    assert all(d.platform == "cpu" for d in seen["devices"])


def _load_graft_entry():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "_graft_entry_test2",
        pathlib.Path(__file__).resolve().parent.parent / "__graft_entry__.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dryrun_subprocesses_unless_default_backend_is_cpu(monkeypatch):
    """Regression for MULTICHIP_r01/r02/r03: when the process default backend
    is NOT cpu — even if >= n CPU devices are visible — dryrun_multichip must
    take the scrubbed-subprocess path, never touch the default backend, and
    hand the child a clean env: cpu platform pinned, no inherited compilation
    cache, forced host device count, the axon sitecustomize stripped from
    PYTHONPATH, and every relay knob unset (r3: those knobs made even
    JAX_PLATFORMS=cpu children hang at import)."""
    mod = _load_graft_entry()
    calls = {}

    class _Proc:
        returncode = 0
        stdout = "ok"
        stderr = ""

    class _SubprocessStub:
        TimeoutExpired = Exception

        @staticmethod
        def run(argv, env=None, **kw):
            calls["argv"] = argv
            calls["env"] = env
            calls["timeout"] = kw.get("timeout")
            return _Proc()

    monkeypatch.setattr(mod, "subprocess", _SubprocessStub)
    # simulate the round-2 driver condition: broken/non-cpu default backend
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # simulate the round-3 hostile environment
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/poisoned_cache")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("PYTHONPATH", "/root/.axon_site:/some/benign/path")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("PALLAS_AXON_REMOTE_COMPILE", "1")
    monkeypatch.setenv("AXON_LOOPBACK_RELAY", "1")

    mod.dryrun_multichip(N_DEV)

    assert "argv" in calls, "subprocess path was not taken"
    assert calls["argv"][1:] == ["--child", str(N_DEV)] or calls["argv"][2:] == [
        "--child",
        str(N_DEV),
    ]
    env = calls["env"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "JAX_COMPILATION_CACHE_DIR" not in env
    assert f"--xla_force_host_platform_device_count={N_DEV}" in env["XLA_FLAGS"]
    assert ".axon_site" not in env.get("PYTHONPATH", "")
    assert "/some/benign/path" in env.get("PYTHONPATH", "")
    for k in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE", "AXON_LOOPBACK_RELAY"):
        assert k not in env, k
    assert calls["timeout"] is not None and calls["timeout"] <= 1800


def test_graft_entry_module_import_is_jax_free(tmp_path):
    """Regression for MULTICHIP_r03 (rc=124): the driver's process hung at
    __graft_entry__.py's module-level ``import jax`` because the host
    sitecustomize dials a dead TPU relay during backend registration.
    Loading the module must therefore never import jax. Proven by executing
    the module in a fresh interpreter where ``import jax`` raises."""
    import os
    import subprocess as sp
    import sys as _sys

    poison = tmp_path / "jax.py"
    poison.write_text("raise RuntimeError('module-level import jax is forbidden')\n")
    entry_path = str(
        __import__("pathlib").Path(__file__).resolve().parent.parent / "__graft_entry__.py"
    )
    code = (
        "import importlib.util\n"
        f"spec = importlib.util.spec_from_file_location('ge', {entry_path!r})\n"
        "m = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(m)\n"
        "assert callable(m.entry) and callable(m.dryrun_multichip)\n"
        "print('jax-free-ok')\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = str(tmp_path)
    proc = sp.run(
        [_sys.executable, "-c", code], env=env, capture_output=True, text=True, timeout=60
    )
    assert proc.returncode == 0, proc.stderr
    assert "jax-free-ok" in proc.stdout


