"""Auto-selecting fast rollout: the fused tile/Pallas path when the model is
in the tiled subset, the general vmap path otherwise.

This is the ergonomic front door to the headline execution path
(sim/tilestep.py + ops/pallas_step.py, ~20M env-steps/s fwd+grad on one TPU
chip for the half-cheetah config vs ~0.26M on the vmap path). Batch layout
is the ordinary batch-first (B, nq)/(B, nv) State; the tile re-layout is
handled internally.

Capability parity anchor: World::step batched (SURVEY.md §2.1) — the
reference has no batched execution at all; this module is where the TPU
redesign pays off.
"""
from __future__ import annotations

import warnings

import jax

from diffdart_tpu.dynamics.model import Model, State
from diffdart_tpu.sim.step import rollout_checkpointed
from diffdart_tpu.sim.tilestep import TileStepUnsupported


def supports_fused(model: Model) -> bool:
    """True if `model` is in the fused tile subset (joint types, contact
    pair types, row types — see sim/tilestep.py)."""
    from diffdart_tpu.sim.tilestep import build_tile_step

    try:
        build_tile_step(model, output="tiles")
        return True
    except TileStepUnsupported:
        return False


def _fallback_reason(model: Model, B: int) -> str | None:
    """Why the fused path can't be used, or None if it can.

    The three dispatch rules (ALL must hold for the fused path):
      * B % 1024 == 0 — envs are laid out as (8, 128) VPU tiles;
      * model params are concrete — the tile step BAKES mass/inertia/
        friction as trace-time constants (sim/tilestep.py), so gradients
        wrt model parameters would silently vanish there; traced params
        dispatch to the vmap path, where WithRespectTo-style parameter
        gradients are exact (tests/test_neural.py);
      * the model is inside the tiled subset (supports_fused).
    """
    if any(
        isinstance(leaf, jax.core.Tracer) for leaf in jax.tree_util.tree_leaves(model)
    ):
        return (
            "model parameters are traced (grad/jvp wrt mass/inertia/...); the "
            "fused path bakes them as constants, so using it would silently "
            "zero those gradients"
        )
    if B % 1024 != 0:
        return f"batch size {B} is not a multiple of 1024 (the (8,128)-lane tile)"
    if not supports_fused(model):
        return "model is outside the fused tile subset (see sim/tilestep.py header)"
    return None


def rollout_fast(
    model: Model,
    state: State,
    taus,
    interpret: bool = False,
    warn_on_fallback: bool = True,
) -> State:
    """BPTT-ready batched rollout on the fastest available path.

    state: batched State with (B, nq)/(B, nv) fields; taus: (T, B, nv).
    Returns the final State. Gradients flow wrt state and taus on both paths;
    gradients wrt MODEL PARAMETERS (mass/inertia/friction/...) flow only on
    the vmap path — traced model leaves therefore force the vmap dispatch.

    Dispatch: the fused tile/Pallas path requires B to be a multiple of 1024
    ((8, 128) VPU tiles), concrete model params, and the model to be in the
    tiled subset; ANY other case falls back to the vmapped per-step-remat
    path, which is ~100x slower at large batch — a UserWarning names the
    reason (silence with warn_on_fallback=False).
    """
    B = state.q.shape[0]
    reason = _fallback_reason(model, B)
    if reason is None:
        from diffdart_tpu.ops.pallas_step import rollout_tiled

        return rollout_tiled(model, state, taus, interpret=interpret)
    if warn_on_fallback:
        warnings.warn(
            f"rollout_fast: falling back to the ~100x-slower vmap path: {reason}",
            UserWarning,
            stacklevel=2,
        )
    final = jax.vmap(lambda s, t: rollout_checkpointed(model, s, t), in_axes=(0, 1))(state, taus)
    return final
