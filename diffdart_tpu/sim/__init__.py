from diffdart_tpu.sim.step import step, step_unconstrained, rollout, rollout_checkpointed  # noqa: F401
