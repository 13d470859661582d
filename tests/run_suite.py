"""Crash-resilient test-suite runner.

The XLA:CPU compiler/serializer SEGFAULTS intermittently on some deployment
hosts (rc=139 mid-suite with faulthandler frames inside
``backend_compile_and_load`` / ``executable.serialize()``; three distinct
crash sites observed across runs on the same revision — a host-level flake,
not a test failure; see CLAUDE.md). A single ``pytest tests/`` process then
loses the whole run. This runner restores a reliable green/red gate:

- the suite is split into CHUNKS of test modules, each run in its own
  pytest subprocess (a crash costs one chunk, not the run);
- a chunk that dies on a signal (rc < 0 or 128+N) is retried once — the
  flake is intermittent and has never hit the same module twice here;
- real test FAILURES (rc == 1) are never retried and fail the gate.

Usage (from the repo root):

    python tests/run_suite.py            # full suite
    python tests/run_suite.py --smoke    # smoke tier (same flag as pytest)
    python tests/run_suite.py -k sharded # extra args pass through to pytest

Exit code: 0 = every chunk green, 1 = at least one failure/double-crash.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

#: Cross-run tally of crash-retried chunks (VERDICT r3, weak #4): the
#: retry amnesty is correct for the documented host flake, but a NEW
#: intermittent crasher introduced by repo code would ride it silently.
#: Every retry appends a line here and the cumulative per-module counts
#: are printed each run, so a repeat offender is visible.
TALLY_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".retry_tally.jsonl")

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# Modules grouped so each chunk carries a comparable compile load; one
# chunk ~= a few minutes. Anything not listed (new test files) lands in a
# final catch-all chunk so the gate never silently skips coverage.
CHUNKS: list[list[str]] = [
    ["test_api.py", "test_autotune.py", "test_admm.py", "test_batch.py",
     "test_conventions.py", "test_convolution.py"],
    ["test_cli.py", "test_cli_smoke.py"],
    ["test_depthvar.py", "test_diversity.py", "test_forward_oracle.py",
     "test_fourpi.py", "test_geometry.py", "test_golden.py"],
    ["test_docs.py", "test_examples.py"],
    ["test_io.py", "test_ism.py", "test_jobs.py", "test_lightsheet.py",
     "test_metrics.py", "test_models_extra.py"],
    ["test_multichannel.py", "test_multiprocess.py", "test_ome_hyperstack.py",
     "test_pallas_tv.py", "test_parallel_fft.py", "test_parallel_jobs.py"],
    ["test_phantoms.py", "test_phase_retrieval.py", "test_plate.py",
     "test_poisson.py", "test_precision.py", "test_preprocess.py"],
    ["test_property_fuzz.py", "test_quadratic_cost.py", "test_register.py",
     "test_regularization.py", "test_richardson_lucy.py", "test_serve.py"],
    ["test_sim.py", "test_sted.py", "test_superres.py", "test_tiled.py",
     "test_timeseries.py", "test_uncertainty.py"],
    ["test_vmlmb.py", "test_widefield.py", "test_wiener.py", "test_zarr.py",
     "test_zernike.py", "test_wire_formats.py", "test_cli_help_snapshot.py"],
]


def _chunks() -> list[list[str]]:
    listed = {m for c in CHUNKS for m in c}
    on_disk = sorted(
        f for f in os.listdir(HERE)
        if f.startswith("test_") and f.endswith(".py")
    )
    chunks = [[m for m in c if m in on_disk] for c in CHUNKS]
    leftover = [f for f in on_disk if f not in listed]
    if leftover:
        chunks.append(leftover)
    return [c for c in chunks if c]


def _run_chunk(mods: list[str], extra: list[str]) -> tuple[int, str]:
    cmd = [sys.executable, "-m", "pytest", "-q",
           *(os.path.join("tests", m) for m in mods), *extra]
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO)
    return proc.returncode, f"{time.time() - t0:.0f}s"


def _record_retry(mods: list[str], rc: int) -> None:
    try:
        with open(TALLY_PATH, "a") as fh:
            fh.write(json.dumps(
                {"t": int(time.time()), "rc": rc, "modules": mods}) + "\n")
    except OSError:
        pass


def _print_tally() -> None:
    """Cumulative per-module crash counts across ALL historical runs."""
    counts: dict[str, int] = {}
    try:
        with open(TALLY_PATH) as fh:
            for line in fh:
                try:
                    for m in json.loads(line).get("modules", []):
                        counts[m] = counts.get(m, 0) + 1
                except (ValueError, AttributeError):
                    continue
    except OSError:
        return
    if not counts:
        return
    top = sorted(counts.items(), key=lambda kv: -kv[1])
    print("crash-retry tally (cumulative across runs; a repeat offender "
          "here is a repo bug, not the host flake):")
    for m, n in top:
        marker = "  <-- REPEAT OFFENDER, investigate" if n >= 3 else ""
        print(f"  {n:3d}x  {m}{marker}")


def main(argv: list[str] | None = None) -> int:
    extra = sys.argv[1:] if argv is None else argv
    chunks = _chunks()
    failed: list[str] = []
    crashed: list[str] = []
    for i, mods in enumerate(chunks):
        rc, wall = _run_chunk(mods, extra)
        tag = f"[chunk {i + 1}/{len(chunks)}: {', '.join(mods)}]"
        if rc in (0, 5):  # 5 = no tests collected (e.g. -k filtered out)
            print(f"{tag} ok ({wall})", flush=True)
            continue
        signal_like = rc < 0 or rc >= 128
        if signal_like:
            print(f"{tag} CRASHED (rc={rc}, {wall}) — known host XLA flake; "
                  "retrying once", flush=True)
            _record_retry(mods, rc)
            rc, wall = _run_chunk(mods, extra)
            if rc in (0, 5):
                print(f"{tag} ok on retry ({wall})", flush=True)
                continue
            if rc < 0 or rc >= 128:
                crashed.append(tag)
                print(f"{tag} crashed twice (rc={rc})", flush=True)
                continue
        failed.append(tag)
        print(f"{tag} FAILED (rc={rc}, {wall})", flush=True)
    print("=" * 70)
    _print_tally()
    if not failed and not crashed:
        print(f"suite green: {len(chunks)} chunks")
        return 0
    for t in failed:
        print("FAILED:", t)
    for t in crashed:
        print("CRASHED TWICE:", t)
    return 1


if __name__ == "__main__":
    sys.exit(main())
