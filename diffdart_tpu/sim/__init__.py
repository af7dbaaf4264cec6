from diffdart_tpu.sim.step import step, step_unconstrained, rollout  # noqa: F401
