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


def rollout_fast(model: Model, state: State, taus, interpret: bool = False) -> State:
    """BPTT-ready batched rollout on the fastest available path.

    state: batched State with (B, nq)/(B, nv) fields; taus: (T, B, nv).
    B must be a multiple of 1024 for the fused path (8 sublanes x 128-lane
    blocks); other batch sizes, or models outside the tiled subset, fall
    back to the vmapped per-step-remat path. Returns the final State.
    Gradients flow wrt state and taus on both paths.
    """
    B = state.q.shape[0]
    if B % 1024 == 0 and supports_fused(model):
        from diffdart_tpu.ops.pallas_step import rollout_tiled

        return rollout_tiled(model, state, taus, interpret=interpret)
    final = jax.vmap(lambda s, t: rollout_checkpointed(model, s, t), in_axes=(0, 1))(state, taus)
    return final
