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
# caching makes repeated suite runs several times faster.
# The dir is keyed by a CPU-feature fingerprint: XLA:CPU AOT results are
# machine-specific, and loading a cache written on a different host SIGILLs
# (observed round 1: cache from an AVX512+AMX machine loaded on a plain-AVX2
# host crashed the single-process suite).
import hashlib  # noqa: E402


def _machine_fingerprint() -> str:
    """Keyed by cpuinfo flags AND boot id: this VM can migrate between
    physical hosts across boots with identical /proc/cpuinfo but different
    LLVM-detected features — a flags-only key loaded stale AOT code that
    executed to WRONG RESULTS (not SIGILL; observed round 2: garbage 9e77
    trajectory values + cpu_aot_loader machine-feature mismatch errors). The
    CPU cache is therefore per-boot; the TPU device cache (target-coded) is
    machine-independent and persists."""
    key = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    key = line
                    break
    except OSError:
        import platform

        key = platform.processor()
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            key += f.read()
    except OSError:
        pass
    return hashlib.md5(key.encode()).hexdigest()[:10]


_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache",
    f"cpu-{_machine_fingerprint()}",
)
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
