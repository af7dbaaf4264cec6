from diffdart_tpu.sim.constrained import solver_diagnostics  # noqa: F401
from diffdart_tpu.sim.fast import rollout_fast, supports_fused  # noqa: F401
from diffdart_tpu.sim.step import (  # noqa: F401
    rollout,
    rollout_checkpointed,
    rollout_final,
    rollout_segmented,
    step,
    step_unconstrained,
)
