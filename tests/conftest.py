"""Test configuration: CPU backend, f64, 8 virtual devices for sharding tests.

Mirrors the reference's test strategy (SURVEY.md §4): analytical quantities are
validated against finite-difference twins in double precision; sharded code is
validated on a virtual 8-device CPU mesh (no multi-chip TPU available in CI).

NOTE: this machine's sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel),
so the platform must be overridden programmatically, not via the env var.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compile cache: the FD-twin tests compile many sizable programs;
# caching makes repeated suite runs several times faster
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
