"""Single-kernel fused timestep: the tiled step (sim/tilestep.py) as the body
of one Pallas TPU kernel, with a matching backward kernel.

Forward: one `pallas_call` per step — every intermediate of FK, dynamics,
collision, assembly and the LCP lives in VMEM/vector registers for a block of
8x128-lane envs; HBM sees only (q, v, tau) in and (q', v') out.

Backward: per-step rematerialization IN VMEM — the backward kernel's body is
jax.vjp of the tile step around the saved (q, v, tau), so BPTT stores only
the per-step inputs (the scan carry) and the backward pass never touches HBM
for residuals. This is the memory-hierarchy-correct version of the remat
policy in sim/step.py:rollout_checkpointed.

Layout: stacked tiles (nq|nv, 8, L) with envs on the (sublane, lane) axes;
grid over lane blocks of 128 (1024 envs per program).

Capability parity anchor: World::step + BackpropSnapshot::backprop
(SURVEY.md §2.1/§2.2) — one fused device program instead of a recorded graph.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffdart_tpu.dynamics.model import Model, State
from diffdart_tpu.sim.tilestep import build_tile_step

SUB = 8
LANE = 128
BLOCK_ENVS = SUB * LANE


def build_pallas_step(model: Model, interpret: bool = False):
    """Returns step(q, v, tau) on stacked tiles (nq, 8, L), (nv, 8, L),
    (nv, 8, L) -> (q', v') with a custom VJP backed by the backward kernel.
    L must be a multiple of 128. Raises TileStepUnsupported for models
    outside the tiled subset."""
    # tuple-of-tiles body, no XLA-fusion barriers: Mosaic compiles the
    # straight-line kernel directly and rows are written per-dof into the
    # output refs (no concatenate anywhere)
    tile_step = build_tile_step(model, output="tiles", barriers=False)
    nq, nv = model.nq, model.nv

    def _read(ref, n):
        return tuple(ref[i] for i in range(n))

    def _write(ref, vals):
        for i, x in enumerate(vals):
            ref[i] = x

    def _fwd_kernel(q_ref, v_ref, tau_ref, qo_ref, vo_ref):
        qn, vn = tile_step(_read(q_ref, nq), _read(v_ref, nv), _read(tau_ref, nv))
        _write(qo_ref, qn)
        _write(vo_ref, vn)

    def _bwd_kernel(q_ref, v_ref, tau_ref, gq_ref, gv_ref, dq_ref, dv_ref, dtau_ref):
        _, vjp = jax.vjp(tile_step, _read(q_ref, nq), _read(v_ref, nv), _read(tau_ref, nv))
        dq, dv, dtau = vjp((_read(gq_ref, nq), _read(gv_ref, nv)))
        _write(dq_ref, dq)
        _write(dv_ref, dv)
        _write(dtau_ref, dtau)

    def _spec(lead):
        return pl.BlockSpec((lead, SUB, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    def _call_fwd(q, v, tau):
        L = q.shape[-1]
        grid = (L // LANE,)
        return pl.pallas_call(
            _fwd_kernel,
            grid=grid,
            in_specs=[_spec(nq), _spec(nv), _spec(nv)],
            out_specs=(_spec(nq), _spec(nv)),
            out_shape=(
                jax.ShapeDtypeStruct((nq, SUB, L), q.dtype),
                jax.ShapeDtypeStruct((nv, SUB, L), q.dtype),
            ),
            interpret=interpret,
        )(q, v, tau)

    def _call_bwd(q, v, tau, gq, gv):
        L = q.shape[-1]
        grid = (L // LANE,)
        return pl.pallas_call(
            _bwd_kernel,
            grid=grid,
            in_specs=[_spec(nq), _spec(nv), _spec(nv), _spec(nq), _spec(nv)],
            out_specs=(_spec(nq), _spec(nv), _spec(nv)),
            out_shape=(
                jax.ShapeDtypeStruct((nq, SUB, L), q.dtype),
                jax.ShapeDtypeStruct((nv, SUB, L), q.dtype),
                jax.ShapeDtypeStruct((nv, SUB, L), q.dtype),
            ),
            interpret=interpret,
        )(q, v, tau, gq, gv)

    @jax.custom_vjp
    def step(q, v, tau):
        return _call_fwd(q, v, tau)

    def step_fwd(q, v, tau):
        out = _call_fwd(q, v, tau)
        return out, (q, v, tau)

    def step_bwd(res, g):
        q, v, tau = res
        gq, gv = g
        return _call_bwd(q, v, tau, gq, gv)

    step.defvjp(step_fwd, step_bwd)
    return step


def to_tiles(x):
    """(B, k) -> (k, 8, B/8). B must be a multiple of 1024 (8 sublanes x
    128-lane grid blocks)."""
    B, k = x.shape
    if B % BLOCK_ENVS:
        raise ValueError(f"batch {B} must be a multiple of {BLOCK_ENVS}")
    return x.T.reshape(k, SUB, B // SUB)


def from_tiles(x):
    """(k, 8, B/8) -> (B, k)."""
    k, s, l = x.shape
    return x.reshape(k, s * l).T


def make_bench_fns(model: Model):
    """(roll, grad) closures over stacked-tile inputs for the half-cheetah
    benchmark: roll(qt, vt, taus_t) -> (qf, vf); grad(qt, vt, taus_t) ->
    dtaus for the standard BPTT loss. Defined HERE so bench.py and
    benchmarks/tile_bench.py trace byte-identical XLA programs and share
    persistent compile-cache entries (TPU compiles of the fused kernel cost
    tens of minutes on the remote-compile tunnel)."""
    pstep = build_pallas_step(model)

    def roll(qt, vt, taus_t):
        def body(c, tau):
            qn, vn = pstep(c[0], c[1], tau)
            return (qn, vn), None

        (qf, vf), _ = jax.lax.scan(body, (qt, vt), taus_t)
        return qf, vf

    def loss(qt, vt, taus_t):
        qf, vf = roll(qt, vt, taus_t)
        return jnp.mean(qf[1] ** 2) + 1e-4 * jnp.mean(taus_t**2)

    grad = jax.grad(loss, argnums=2)
    return roll, grad


def rollout_tiled(model: Model, state: State, taus, interpret: bool = False) -> State:
    """BPTT rollout on the fused tile path. state: batched State with
    (B, nq)/(B, nv) fields; taus: (T, B, nv). Returns the final batched
    State. Gradients flow wrt state and taus (model params are baked).

    Small-D models run the single-Pallas-kernel step (whole step in VMEM);
    hybrid xla-LCP models (big D, e.g. the Atlas-class humanoid — see
    build_tile_step's lcp='xla') scan the jitted XLA tile step with
    per-step rematerialization instead."""
    from diffdart_tpu.sim.tilestep import TileStepUnsupported, build_tile_step

    try:
        step = build_pallas_step(model, interpret=interpret)
    except TileStepUnsupported:
        step = None
    q = to_tiles(state.q)
    v = to_tiles(state.v)
    taus_t = jax.vmap(to_tiles)(taus)

    if step is not None:
        def body(carry, tau):
            qc, vc = carry
            qn, vn = step(qc, vc, tau)
            return (qn, vn), None

        (qf, vf), _ = jax.lax.scan(body, (q, v), taus_t)
    else:
        tstep = build_tile_step(model, output="tiles")
        nq, nv = model.nq, model.nv

        def body_h(carry, tau):
            qc, vc = carry
            qn, vn = tstep(qc, vc, tuple(tau[i] for i in range(nv)))
            return (qn, vn), None

        qt = tuple(q[i] for i in range(nq))
        vt = tuple(v[i] for i in range(nv))
        (qf_t, vf_t), _ = jax.lax.scan(jax.checkpoint(body_h), (qt, vt), taus_t)
        qf = jnp.stack(qf_t)
        vf = jnp.stack(vf_t)
    t = state.t + taus.shape[0] * model.dt.astype(state.q.dtype) if state.t is not None else None
    return State(q=from_tiles(qf), v=from_tiles(vf), t=t)
