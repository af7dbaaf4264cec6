from diffdart_tpu.ops.lcp import boxed_lcp  # noqa: F401
