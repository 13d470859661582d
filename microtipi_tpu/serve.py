"""Directory-watching batch service: continuous deconvolution of arriving stacks.

Production serving mode (nothing like it exists in the reference — its
ecosystem ran interactively inside Icy): watch an input directory for new
TIFF stacks, deconvolve each with a fixed PSF/config, write results to an
output directory, and keep going. Host IO (native parallel TIFF decode via
the prefetcher) overlaps device compute; the solver is compiled once per
volume geometry and reused across files.

Failure semantics: files are claimed only once their size is stable across
scans; a file that errors is retried (it may have been a partial write whose
size happened to look stable) and only given up on after ``max_retries``
attempts *at the same size* — a file that grows after a failure is treated as
new. Outputs are written atomically (tmp + rename) so downstream watchers
never see partial volumes. A vanishing input between scan and claim is
skipped, never fatal.

Pipelining: host decode of the next ready stack overlaps device compute of
the current one (a small thread pool feeds decoded volumes ahead of the
solver). Observability: ``metrics_path`` atomically maintains a JSON
snapshot (counts, wall/compute seconds, throughput) after every scan.
"""

from __future__ import annotations

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

__all__ = ["watch"]


def _stable_files(indir: Path, seen: dict, exts=(".tif", ".tiff")) -> list[Path]:
    """Files whose size is unchanged since the previous scan."""
    ready = []
    for p in sorted(indir.iterdir()):
        if p.suffix.lower() not in exts:
            continue
        try:
            if not p.is_file():
                continue
            size = p.stat().st_size
        except OSError:
            continue  # vanished or unreadable between iterdir and stat
        prev = seen.get(p.name)
        seen[p.name] = size
        if prev == size and size > 0:
            ready.append(p)
    return ready


def watch(
    indir: str | os.PathLike,
    outdir: str | os.PathLike,
    psf_path: str | os.PathLike,
    config=None,
    method: str = "vmlmb",
    rl_iterations: int = 50,
    poll_seconds: float = 2.0,
    max_files: int | None = None,
    max_retries: int = 3,
    log=print,
    metrics_path: str | os.PathLike | None = None,
    prefetch: int = 2,
):
    """Run the service loop. ``max_files`` bounds the run (None = forever).

    Returns the list of processed output paths (useful under ``max_files``).
    ``metrics_path`` maintains an atomic JSON metrics snapshot; ``prefetch``
    sizes the decode thread pool that overlaps host IO with device compute.
    """
    import jax
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
    from microtipi_tpu.jobs.richardson_lucy import richardson_lucy
    from microtipi_tpu.utils.arrays import pad_fft_kernel

    indir, outdir = Path(indir), Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    psf = jnp.asarray(read_stack(psf_path))
    config = config or DeconvolutionConfig()

    solvers: dict[tuple, object] = {}

    def solver_for(shape):
        # Kernel embedding happens INSIDE the jit: eager dispatch is
        # pathological on remote TPU runtimes (CLAUDE.md platform rules).
        if shape not in solvers:
            if method == "rl":

                @jax.jit
                def run(d, psf=psf):
                    kern = pad_fft_kernel(psf, d.shape)
                    return richardson_lucy(
                        d, kern, iterations=rl_iterations, mu=config.mu, epsilon=config.epsilon
                    )

            else:

                @jax.jit
                def run(d, psf=psf):
                    kern = pad_fft_kernel(psf, d.shape)
                    return deconvolve(d, kern, config=config).x

            solvers[shape] = run
        return solvers[shape]

    seen: dict[str, int] = {}
    done: set[tuple[str, int]] = set()  # (name, size): re-process if it grows
    attempts: dict[tuple[str, int], int] = {}
    processed: list[Path] = []
    stats = {
        "started_at": time.time(), "processed": 0, "failed_attempts": 0,
        "compute_seconds": 0.0, "voxels": 0, "scans": 0,
    }

    def write_metrics():
        if metrics_path is None:
            return
        snap = dict(stats)
        wall = max(time.time() - snap.pop("started_at"), 1e-9)
        snap["uptime_seconds"] = round(wall, 3)
        snap["mvox_per_second"] = round(snap["voxels"] / wall / 1e6, 6)
        tmp = str(metrics_path) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, str(metrics_path))

    pool = ThreadPoolExecutor(max_workers=max(1, prefetch))
    try:
        while max_files is None or len(processed) < max_files:
            ready = [
                p for p in _stable_files(indir, seen)
                if (p.name, seen[p.name]) not in done
                and attempts.get((p.name, seen[p.name]), 0) < max_retries
            ]
            stats["scans"] += 1
            if not ready:
                write_metrics()
                time.sleep(poll_seconds)
                continue
            # Decode ahead: file i+1 parses on host threads while the device
            # solves file i.
            futs = [(p, seen[p.name], pool.submit(read_stack, p)) for p in ready]
            for p, size, fut in futs:
                key = (p.name, size)
                try:
                    t0 = time.time()
                    data = jnp.asarray(fut.result())
                    x = np.asarray(solver_for(data.shape)(data))
                    out = outdir / p.name
                    tmp = out.with_suffix(out.suffix + ".tmp")
                    write_stack(tmp, x)
                    os.replace(tmp, out)
                    done.add(key)
                    processed.append(out)
                    dt = time.time() - t0
                    stats["processed"] += 1
                    stats["compute_seconds"] += dt
                    stats["voxels"] += int(np.prod(data.shape))
                    log(f"[watch] {p.name}: {data.shape} done in {dt:.2f}s -> {out}")
                except Exception as e:  # keep serving; retry (bounded) next scan
                    attempts[key] = attempts.get(key, 0) + 1
                    stats["failed_attempts"] += 1
                    log(
                        f"[watch] {p.name}: FAILED attempt {attempts[key]}/{max_retries} "
                        f"({type(e).__name__}: {e})"
                    )
                if max_files is not None and len(processed) >= max_files:
                    break
            write_metrics()
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
    return processed
