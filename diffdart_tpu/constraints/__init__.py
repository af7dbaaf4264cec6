from diffdart_tpu.constraints.assembly import assemble_constraints  # noqa: F401
