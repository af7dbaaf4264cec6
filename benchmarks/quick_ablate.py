#!/usr/bin/env python
"""Minimal TPU ablation: times single-step programs (no scan) to localize cost.
Small B and no rollouts => fast compiles."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from diffdart_tpu.collision import collide_world
from diffdart_tpu.constraints.assembly import assemble_constraints
from diffdart_tpu.dynamics import dynamics as D
from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models.half_cheetah import half_cheetah, cheetah_init_q
from diffdart_tpu.ops.lcp import _jacobi, _polish
from diffdart_tpu.sim.constrained import step_constrained
from diffdart_tpu.sim.step import step_unconstrained

B = 4096


def timeit(fn, *args, iters=20, label=""):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    run = (time.perf_counter() - t0) / iters
    print(f"{label:34s} {run*1e6:9.1f} us  (compile {compile_s:5.1f}s)  {B/run:,.0f} env-steps/s")
    return run


def main():
    m = half_cheetah(dt=2e-3)
    dtype = m.mass.dtype
    q0 = cheetah_init_q(m)
    batch = State(q=jnp.tile(q0, (B, 1)), v=0.01 * jnp.ones((B, m.nv), dtype), t=jnp.zeros(B, dtype))
    tau = jnp.zeros((B, m.nv), dtype)

    vm = lambda f: jax.jit(jax.vmap(f))

    timeit(vm(lambda s, t: step_unconstrained(m, s, t)), batch, tau, label="unconstrained step")

    def kin_only(s, t):
        cache = D.kinematics_cache(m, s.q, s.v)
        return cache["Sw"]

    timeit(vm(kin_only), batch, tau, label="kinematics cache")

    def kin_col(s, t):
        cache = D.kinematics_cache(m, s.q, s.v)
        c = collide_world(m, cache["R"], cache["p"])
        return c.depth

    timeit(vm(kin_col), batch, tau, label="kin + collide")

    def dyn_mats(s, t):
        cache = D.kinematics_cache(m, s.q, s.v)
        M = D.mass_matrix(m, s.q, cache)
        C = D.bias_forces(m, s.q, s.v, cache)
        L = jnp.linalg.cholesky(M)
        Minv = jax.scipy.linalg.cho_solve((L, True), jnp.eye(m.nv, dtype=dtype))
        return Minv @ C

    timeit(vm(dyn_mats), batch, tau, label="kin + M,C,Minv")

    def assembled(s, t):
        q, v = s.q, s.v
        cache = D.kinematics_cache(m, q, v)
        M = D.mass_matrix(m, q, cache)
        C = D.bias_forces(m, q, v, cache)
        L = jnp.linalg.cholesky(M)
        Minv = jax.scipy.linalg.cho_solve((L, True), jnp.eye(m.nv, dtype=dtype))
        v_star = v + m.dt.astype(dtype) * (Minv @ (t + D.joint_forces(m, q, v) - C))
        contacts = collide_world(m, cache["R"], cache["p"])
        qt = D.q_tangent(m, q)
        lcp = assemble_constraints(m, contacts, cache["Sw"], cache["mask"], Minv, v_star, v, qt, m.dt.astype(dtype))
        return lcp.A

    timeit(vm(assembled), batch, tau, label="... + assembly (A)")

    def with_sweeps(s, t):
        q, v = s.q, s.v
        cache = D.kinematics_cache(m, q, v)
        M = D.mass_matrix(m, q, cache)
        C = D.bias_forces(m, q, v, cache)
        L = jnp.linalg.cholesky(M)
        Minv = jax.scipy.linalg.cho_solve((L, True), jnp.eye(m.nv, dtype=dtype))
        v_star = v + m.dt.astype(dtype) * (Minv @ (t + D.joint_forces(m, q, v) - C))
        contacts = collide_world(m, cache["R"], cache["p"])
        qt = D.q_tangent(m, q)
        lcp = assemble_constraints(m, contacts, cache["Sw"], cache["mask"], Minv, v_star, v, qt, m.dt.astype(dtype))
        lam = _jacobi(lcp.A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx, m.contact_iters)
        return lam

    timeit(vm(with_sweeps), batch, tau, label="... + jacobi sweeps")

    def with_polish(s, t):
        q, v = s.q, s.v
        cache = D.kinematics_cache(m, q, v)
        M = D.mass_matrix(m, q, cache)
        C = D.bias_forces(m, q, v, cache)
        L = jnp.linalg.cholesky(M)
        Minv = jax.scipy.linalg.cho_solve((L, True), jnp.eye(m.nv, dtype=dtype))
        v_star = v + m.dt.astype(dtype) * (Minv @ (t + D.joint_forces(m, q, v) - C))
        contacts = collide_world(m, cache["R"], cache["p"])
        qt = D.q_tangent(m, q)
        lcp = assemble_constraints(m, contacts, cache["Sw"], cache["mask"], Minv, v_star, v, qt, m.dt.astype(dtype))
        lam = _jacobi(lcp.A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx, m.contact_iters)
        lam = _polish(lam, lcp.A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx)
        return lam

    timeit(vm(with_polish), batch, tau, label="... + polish (4 passes)")

    timeit(vm(lambda s, t: step_constrained(m, s, t)), batch, tau, label="full step")

    # gradient of a single step
    def one_step_loss(s, t):
        s2 = step_constrained(m, s, t)
        return jnp.sum(s2.q**2) + jnp.sum(s2.v**2)

    g = jax.jit(jax.vmap(jax.grad(one_step_loss, argnums=1)))
    timeit(g, batch, tau, label="grad of full step")


if __name__ == "__main__":
    main()
