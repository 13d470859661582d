"""Tracing/profiling affordances (SURVEY.md section 5-a: the reference has
only stdout debug prints; here the XLA profiler is first-class)."""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "annotate", "timed"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto:

    >>> with trace("/tmp/jax-trace"):
    ...     run_blind_deconv()
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named-scope annotation so kernels group under ``name`` in traces."""
    return jax.named_scope(name)


@contextlib.contextmanager
def timed(label: str, sink=print):
    """Wall-clock a block, forcing completion via block_until_ready on exit
    is the caller's job (on some remote runtimes only a D2H fetch syncs)."""
    t0 = time.perf_counter()
    yield
    sink(f"{label}: {time.perf_counter() - t0:.3f}s")
