"""Examples smoke test: every script in examples/ must run end to end.

Each example honors ``MICROTIPI_EXAMPLE_TINY=1`` (tiny shapes/iteration
budgets, quality assertions skipped) so the whole gallery executes in
seconds on the CPU backend. This guards the documented user-facing entry
points against API drift — an example that imports a renamed symbol or
passes a removed kwarg fails here, not on a user's machine. The reference
ships no examples at all (SURVEY.md section 0: no README/tests/benchmarks
in jplumail/microTiPi); this gallery is part of the rebuild's user surface.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(
    f for f in os.listdir(os.path.join(REPO, "examples")) if f.endswith(".py")
)


def test_gallery_is_covered():
    """New example scripts must be picked up automatically."""
    assert len(EXAMPLES) >= 8


@pytest.mark.parametrize("script", EXAMPLES)
def test_example_runs(script):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env["MICROTIPI_EXAMPLE_TINY"] = "1"
    # sharded_timelapse needs >=2 devices; harmless for the others.
    xla = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in xla:
        env["XLA_FLAGS"] = (xla + " --xla_force_host_platform_device_count=8").strip()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
