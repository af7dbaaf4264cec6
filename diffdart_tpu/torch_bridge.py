"""PyTorch autograd bridge: the reference's python/diffdart/dart_torch.py
capability (dart_layer / timestep as torch.autograd.Function — SURVEY.md §2.3,
§3.4), re-based on the JAX step.

Where the reference crossed Python->pybind11->C++ per step with Eigen<->numpy
<->torch copies, this bridge exists only for torch-ecosystem interop/parity
demos: forward calls the jitted step, backward applies the step's VJP (which
includes the IFT contact gradients). Native JAX training loops should use
diffdart_tpu.sim directly — no bridge, no host copies.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from diffdart_tpu.dynamics.model import Model, State
from diffdart_tpu.sim import step as _step


def _make_fns(model: Model):
    def f(q, v, tau):
        s = _step(model, State(q=q, v=v, t=jnp.zeros((), q.dtype)), tau)
        return s.q, s.v

    return jax.jit(f), jax.jit(lambda q, v, tau, gq, gv: jax.vjp(f, q, v, tau)[1]((gq, gv)))


_CACHE: dict = {}


def _fns_for(model: Model):
    key = id(model)
    if key not in _CACHE:
        _CACHE[key] = _make_fns(model)
    return _CACHE[key]


def timestep(model: Model, q, v, tau):
    """One differentiable physics step on torch tensors:
        q_next, v_next = timestep(model, q, v, tau)
    (the reference's `timestep`/`dart_layer` autograd.Function)."""
    import torch

    fwd, bwd = _fns_for(model)

    class _Timestep(torch.autograd.Function):
        @staticmethod
        def forward(ctx, q_t, v_t, tau_t):
            ctx.save_for_backward(q_t, v_t, tau_t)
            qn, vn = fwd(
                jnp.asarray(q_t.detach().cpu().numpy()),
                jnp.asarray(v_t.detach().cpu().numpy()),
                jnp.asarray(tau_t.detach().cpu().numpy()),
            )
            dev, dt = q_t.device, q_t.dtype
            return (
                torch.from_numpy(np.asarray(qn)).to(device=dev, dtype=dt),
                torch.from_numpy(np.asarray(vn)).to(device=dev, dtype=dt),
            )

        @staticmethod
        def backward(ctx, gq, gv):
            q_t, v_t, tau_t = ctx.saved_tensors
            dq, dv, dtau = bwd(
                jnp.asarray(q_t.detach().cpu().numpy()),
                jnp.asarray(v_t.detach().cpu().numpy()),
                jnp.asarray(tau_t.detach().cpu().numpy()),
                jnp.asarray(gq.detach().cpu().numpy()),
                jnp.asarray(gv.detach().cpu().numpy()),
            )
            dev, dt = q_t.device, q_t.dtype
            to_t = lambda x: torch.from_numpy(np.asarray(x)).to(device=dev, dtype=dt)
            return to_t(dq), to_t(dv), to_t(dtau)

    return _Timestep.apply(q, v, tau)
