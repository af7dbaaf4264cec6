"""Multi-process runtime layer (parallel/distributed.py; SURVEY.md §2.4
"multi-process"). No second host exists in CI, so the gates are:

  * the REAL jax.distributed initialize/shutdown API driven end-to-end as a
    1-process cluster (coordinator, handshake, global device list) in a
    subprocess, with the training step running on the resulting global mesh
    and matching the plain single-process result;
  * the host-data path (make_global_batch / local_env_slice) in the
    degenerate single-process mode in-process.

Real multi-host launch is the same program with the standard env vars set
per host (module docstring)."""
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from diffdart_tpu.parallel import (
    data_parallel_grad,
    global_mesh,
    local_env_slice,
    make_global_batch,
    make_mesh,
    shard_batch,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestSingleProcessDegenerate:
    def test_local_env_slice(self):
        assert local_env_slice(16) == slice(0, 16)

    def test_make_global_batch_matches_shard_batch(self):
        mesh = make_mesh(8, devices=jax.devices("cpu"))
        local = {"q": np.arange(32.0).reshape(16, 2)}
        g = make_global_batch(mesh, local)
        s = shard_batch(mesh, {"q": jnp.asarray(local["q"])})
        assert g["q"].shape == (16, 2)
        np.testing.assert_array_equal(np.asarray(g["q"]), np.asarray(s["q"]))
        # sharded over the env axis of the mesh
        assert len(g["q"].sharding.device_set) == 8


_CLUSTER_CHILD = r"""
import os, sys
sys.path.insert(0, os.environ["DD_REPO"])
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from diffdart_tpu.parallel import (
    data_parallel_grad, global_mesh, init_distributed, make_global_batch,
    shutdown_distributed,
)
from diffdart_tpu.parallel.distributed import process_count
from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models import cube_drop
from diffdart_tpu.sim import rollout

ok = init_distributed(
    coordinator_address=os.environ["DD_COORD"], num_processes=1, process_id=0
)
assert ok, "initialize did not run"
assert process_count() == 1
devs = jax.devices()
assert len(devs) >= 8, devs
mesh = global_mesh(devices=devs[:8])

m = cube_drop(dt=2e-3)
B, T = 16, 3
q0 = np.tile(np.asarray(m.neutral_q()), (B, 1))
q0[:, 6] = 0.12
local = State(q=jnp.asarray(q0), v=jnp.zeros((B, m.nv)), t=jnp.zeros(B))
batch = make_global_batch(mesh, local)

def per_env_loss(taus, sb):
    def one(s):
        final, _ = rollout(m, s, taus)
        return final.q[6] ** 2
    return jax.vmap(one)(sb)

step_fn = data_parallel_grad(per_env_loss, mesh)
taus = jnp.zeros((T, m.nv))
loss, grad = step_fn(taus, batch)
assert jnp.isfinite(loss) and jnp.all(jnp.isfinite(grad))

# reference: same computation without any mesh/cluster
ref = jnp.mean(per_env_loss(taus, jax.device_get(local)))
np.testing.assert_allclose(float(loss), float(ref), rtol=1e-12)
shutdown_distributed()
print("CLUSTER-OK", float(loss))
"""


_CLUSTER2_CHILD = r"""
import os, sys
sys.path.insert(0, os.environ["DD_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from diffdart_tpu.parallel import (
    data_parallel_grad, global_mesh, init_distributed, local_env_slice,
    make_global_batch, shutdown_distributed,
)
from diffdart_tpu.parallel.distributed import process_count, process_index
from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models import cube_drop
from diffdart_tpu.sim import rollout

pid = int(os.environ["DD_PID"])
ok = init_distributed(
    coordinator_address=os.environ["DD_COORD"], num_processes=2, process_id=pid
)
assert ok, "initialize did not run"
assert process_count() == 2, process_count()
assert process_index() == pid
devs = jax.devices()
assert len(devs) == 8, devs          # 2 processes x 4 forced host devices
assert len(jax.local_devices()) == 4
mesh = global_mesh(devices=devs)

m = cube_drop(dt=2e-3)
B, T = 16, 2
rng = np.random.RandomState(7)       # SAME seed in both processes
q0 = np.tile(np.asarray(m.neutral_q()), (B, 1))
q0[:, 6] = 0.12 + 0.02 * rng.randn(B)
v0 = 0.1 * rng.randn(B, m.nv)
sl = local_env_slice(B)              # this process's half of the env axis
local = State(q=jnp.asarray(q0[sl]), v=jnp.asarray(v0[sl]),
              t=jnp.zeros(B // 2))
batch = make_global_batch(mesh, local)
assert batch.q.shape == (B, m.nq)    # global shape, half fed per process

def per_env_loss(taus, sb):
    def one(s):
        final, _ = rollout(m, s, taus)
        return final.q[6] ** 2
    return jax.vmap(one)(sb)

step_fn = data_parallel_grad(per_env_loss, mesh)
taus = jnp.zeros((T, m.nv))
loss, grad = step_fn(taus, batch)
assert jnp.isfinite(loss) and jnp.all(jnp.isfinite(grad))

# reference: the full-batch computation, meshless and process-local
full = State(q=jnp.asarray(q0), v=jnp.asarray(v0), t=jnp.zeros(B))
ref = jnp.mean(per_env_loss(taus, full))
np.testing.assert_allclose(float(loss), float(ref), rtol=1e-12)
shutdown_distributed()
print("CLUSTER2-OK", pid, float(loss))
"""


class TestTwoProcessCluster:
    def test_two_process_handshake_and_collective(self):
        """A REAL 2-process jax.distributed cluster on localhost (VERDICT r3
        next #6): coordinator + worker subprocesses with 4 forced CPU
        devices each form an 8-device global mesh; each process feeds its
        half of the env batch through make_global_batch; the env-sharded
        value+grad (psum across the process boundary) must equal the
        meshless full-batch computation."""
        from __graft_entry__ import _scrubbed_cpu_env

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs = []
        for pid in range(2):
            env = _scrubbed_cpu_env(4)
            env["DD_REPO"] = REPO
            env["DD_COORD"] = f"localhost:{port}"
            env["DD_PID"] = str(pid)
            procs.append(subprocess.Popen(
                [sys.executable, "-c", _CLUSTER2_CHILD],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            ))
        outs = []
        try:
            for p in procs:
                out, err = p.communicate(timeout=840)
                outs.append((p.returncode, out, err))
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        for pid, (rc, out, err) in enumerate(outs):
            assert rc == 0, (
                f"process {pid} failed (rc={rc}):\nstdout:{out[-2000:]}\n"
                f"stderr:{err[-2000:]}"
            )
            assert f"CLUSTER2-OK {pid}" in out
        # both processes agree on the global loss
        l0 = float(outs[0][1].split("CLUSTER2-OK 0")[1].split()[0])
        l1 = float(outs[1][1].split("CLUSTER2-OK 1")[1].split()[0])
        assert abs(l0 - l1) <= 1e-12 * max(1.0, abs(l0))


class TestOneProcessCluster:
    def test_real_distributed_initialize_and_train_step(self):
        """End-to-end through jax.distributed: coordinator handshake, global
        mesh, host-fed global batch, env-sharded value+grad — numerically
        identical to the meshless computation."""
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        env = dict(os.environ)
        env["DD_REPO"] = REPO
        env["DD_COORD"] = f"localhost:{port}"
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [sys.executable, "-c", _CLUSTER_CHILD],
            env=env, capture_output=True, text=True, timeout=600,
        )
        assert proc.returncode == 0, (
            f"cluster child failed:\nstdout:{proc.stdout[-2000:]}\n"
            f"stderr:{proc.stderr[-2000:]}"
        )
        assert "CLUSTER-OK" in proc.stdout
