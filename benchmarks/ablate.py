#!/usr/bin/env python
"""Ablation timing of the half-cheetah step pipeline on the current backend.

Times each stage separately (B=4096): unconstrained dynamics, +collision,
+assembly, +LCP(iters), full step, fwd+grad — to locate the bottleneck.
"""
import time

import jax
import jax.numpy as jnp

from diffdart_tpu.collision import collide_world
from diffdart_tpu.constraints.assembly import assemble_constraints
from diffdart_tpu.dynamics import dynamics as D
from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models.half_cheetah import half_cheetah, cheetah_init_q
from diffdart_tpu.ops.lcp import boxed_lcp, _pgs, _polish
from diffdart_tpu.sim.step import step_unconstrained
from diffdart_tpu.sim.constrained import step_constrained

B = 4096
T = 10


def timeit(fn, *args, iters=10):
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
    tau = jnp.zeros((B, m.nv), dtype)

    def scanN(stepfn):
        def run(s, tau):
            def body(ss, _):
                return stepfn(ss, tau), None

            out, _ = jax.lax.scan(body, s, None, length=T)
            return out

        return jax.jit(jax.vmap(run))

    # 1. unconstrained
    f1 = scanN(lambda s, t: step_unconstrained(m, s, t))
    t1 = timeit(f1, batch, tau)
    print(f"unconstrained step:        {t1/T*1e6:9.1f} us/step  ({B*T/t1:,.0f} steps/s)")

    # 2. kinematics + collision only
    def col_only(s, t):
        cache = D.kinematics_cache(m, s.q, s.v)
        c = collide_world(m, cache["R"], cache["p"])
        return s.replace(v=s.v + 0.0 * jnp.sum(c.depth) )

    f2 = scanN(col_only)
    t2 = timeit(f2, batch, tau)
    print(f"kin+collide only:          {t2/T*1e6:9.1f} us/step")

    # 3. full pipeline without LCP solve (lambda = 0)
    def no_lcp(s, t):
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
        v_new = v_star + 0.0 * (lcp.J.T @ lcp.b)
        return State(q=D.integrate_positions(m, q, v_new, m.dt.astype(dtype)), v=v_new, t=s.t)

    f3 = scanN(no_lcp)
    t3 = timeit(f3, batch, tau)
    print(f"full minus LCP solve:      {t3/T*1e6:9.1f} us/step")

    # 4. full with PGS only (no polish)
    def pgs_only(s, t):
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
        lam = _pgs(lcp.A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx, m.contact_iters)
        v_new = v_star + Minv @ (lcp.J.T @ lam)
        return State(q=D.integrate_positions(m, q, v_new, m.dt.astype(dtype)), v=v_new, t=s.t)

    f4 = scanN(pgs_only)
    t4 = timeit(f4, batch, tau)
    print(f"full with PGS (no polish): {t4/T*1e6:9.1f} us/step")

    # 5. full step (PGS + polish)
    f5 = scanN(lambda s, t: step_constrained(m, s, t))
    t5 = timeit(f5, batch, tau)
    print(f"full step:                 {t5/T*1e6:9.1f} us/step  ({B*T/t5:,.0f} steps/s)")


if __name__ == "__main__":
    main()
