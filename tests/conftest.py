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

import pytest

# Must precede the first CPU client creation.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "parallel_codegen_split_count" not in flags:
    # Defensive: XLA:CPU segfaults intermittently on this 1-core deployment
    # host (rc=139 inside backend_compile_and_load / executable.serialize —
    # CLAUDE.md). Parallel codegen buys nothing on one core; serializing it
    # removes the most race-prone compile path.
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound on this 1-core
# host (~38 min cold); warm cache re-runs skip XLA recompiles entirely.
# OPT-IN since round 3: the CPU AOT executable (de)serialization SEGFAULTS
# intermittently on some hosts (rc=139 mid-suite, faulthandler frames in
# put_executable_and_time / backend_compile_and_load, cpu_aot_loader
# machine-feature-mismatch errors when the cache crossed hosts — see
# CLAUDE.md). Export MICROTIPI_COMPILE_CACHE=1 to re-enable after checking
# one full suite run survives on the current host.
if os.environ.get("MICROTIPI_COMPILE_CACHE") == "1":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Two-tier suite (VERDICT r2 item 5). This is a 1-core host, so xdist
# cannot parallelize; the dominant wall-clock cost is the subprocess-heavy
# end-to-end modules (every CLI/example/serve subprocess pays a fresh
# ~20-60 s Python+jax import that the in-process compile cache cannot
# amortize). `--smoke` deselects exactly those modules — every numerical
# test (models, ops, optim, parallel mesh, golden/oracle/fuzz) still runs —
# for the fast review-pass tier; the full suite remains the wrap/CI gate.
_FULL_TIER_MODULES = {
    "test_cli.py",        # 1,500 lines of argparse subcommands via subprocess
    "test_examples.py",   # runs examples/ gallery as subprocesses
    "test_serve.py",      # HTTP serving loop + worker subprocesses
    "test_multiprocess.py",  # 2-process jax.distributed mesh bring-up
    "test_docs.py",       # regenerates docs via subprocess, diff-checks
    "test_plate.py",      # HCS plate walks through the CLI subprocess path
}


def pytest_addoption(parser):
    parser.addoption(
        "--smoke", action="store_true", default=False,
        help="fast tier: skip subprocess-heavy e2e modules (CLI/examples/"
             "serve/multiprocess/docs/plate); all numerical tests still run",
    )


def pytest_collection_modifyitems(config, items):
    if not config.getoption("--smoke"):
        return
    keep, drop = [], []
    for item in items:
        (drop if item.fspath.basename in _FULL_TIER_MODULES else keep).append(item)
    if drop:
        config.hook.pytest_deselected(items=drop)
        items[:] = keep
