#!/usr/bin/env python
"""Stage ablation of the current half-cheetah step pipeline (fwd AND grad).

Locates where forward and backward time goes at B=4096:
stages of the forward step, then grad-of-rollout for progressively larger
slices of the pipeline. Run on the target backend.
"""
import time

import jax
import jax.numpy as jnp

from diffdart_tpu.collision import collide_world
from diffdart_tpu.collision.collide import select_contacts
from diffdart_tpu.constraints.assembly import assemble_constraints
from diffdart_tpu.dynamics import dynamics as D
from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models.half_cheetah import half_cheetah, cheetah_init_q
from diffdart_tpu.sim.constrained import prepare_constrained, step_constrained
from diffdart_tpu.sim.step import step_unconstrained
from diffdart_tpu.ops.lcp import _jacobi
from diffdart_tpu.ops.lcp_lowrank import boxed_lcp_lowrank

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
    dt = m.dt.astype(dtype)

    def scanN(stepfn):
        def run(s, tau):
            def body(ss, _):
                return stepfn(ss, tau), None

            out, _ = jax.lax.scan(body, s, None, length=T)
            return out

        return jax.jit(jax.vmap(run))

    def report(name, t):
        print(f"{name:28s} {t/T*1e6:9.1f} us/step  ({B*T/t:,.0f} steps/s)")

    # ---------------- forward stages ----------------
    report("fwd: unconstrained", timeit(scanN(lambda s, t: step_unconstrained(m, s, t)), batch, tau))

    def kin_col(s, t):
        cache = D.kinematics_cache(m, s.q, s.v)
        c = collide_world(m, cache["R"], cache["p"])
        return s.replace(v=s.v + 0.0 * jnp.sum(c.depth))

    report("fwd: kin+collide", timeit(scanN(kin_col), batch, tau))

    def prep_only(s, t):
        lcp, M, Minv, v_star, _ = prepare_constrained(m, s, t)
        v_new = v_star + 0.0 * (lcp.J.T @ lcp.b)
        return State(q=D.integrate_positions(m, s.q, v_new, dt), v=v_new, t=s.t)

    report("fwd: prep (no LCP solve)", timeit(scanN(prep_only), batch, tau))

    def sweeps_only(s, t):
        lcp, M, Minv, v_star, _ = prepare_constrained(m, s, t)
        lam = _jacobi(lcp.A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx, m.contact_iters)
        v_new = v_star + Minv @ (lcp.J.T @ lam)
        return State(q=D.integrate_positions(m, s.q, v_new, dt), v=v_new, t=s.t)

    report("fwd: prep+sweeps (no pol)", timeit(scanN(sweeps_only), batch, tau))
    report("fwd: FULL step", timeit(scanN(lambda s, t: step_constrained(m, s, t)), batch, tau))

    # ---------------- gradient stages ----------------
    key = jax.random.PRNGKey(0)
    taus = 0.1 * jax.random.normal(key, (T, B, m.nv), dtype)

    def grad_of(stepfn):
        def roll(s, taus_env):
            def body(ss, tt):
                return stepfn(ss, tt), None

            out, _ = jax.lax.scan(body, s, taus_env)
            return out

        def loss(taus):
            final = jax.vmap(roll, in_axes=(0, 1))(batch, taus)
            return jnp.mean(final.q[:, 1] ** 2)

        return jax.jit(jax.grad(loss))

    import functools

    def ckpt(stepfn):
        return jax.checkpoint(
            stepfn, policy=jax.checkpoint_policies.save_only_these_names("lcp_lam")
        )

    report("grad: unconstrained", timeit(grad_of(ckpt(lambda s, t: step_unconstrained(m, s, t))), taus))
    report("grad: prep (no solve)", timeit(grad_of(ckpt(prep_only)), taus))
    report("grad: FULL (remat1)", timeit(grad_of(ckpt(lambda s, t: step_constrained(m, s, t))), taus))
    report("grad: FULL (no remat)", timeit(grad_of(lambda s, t: step_constrained(m, s, t)), taus))


if __name__ == "__main__":
    main()
