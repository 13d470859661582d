"""Test harness configuration.

Tests run on the CPU backend with float64 enabled: the numerical-fidelity
target (BASELINE.md: <=1e-5 relative vs double semantics) is validated on CPU
x64, while the TPU path runs float32 (TPU has no native f64; the axon platform
rejects c128 outright). An 8-device virtual CPU mesh is forced so the sharding
tests exercise real collectives without a TPU pod (SURVEY.md section 4).

Env/config must be set before any backend is instantiated, hence the
module-level placement.
"""

import os

# Must precede the first CPU client creation.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound on this 1-core
# host (~38 min cold). Warm cache re-runs skip XLA recompiles entirely.
# Shared with the TPU bench cache dir — cache keys include the platform.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
