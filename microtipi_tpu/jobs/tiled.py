"""Tiled deconvolution: volumes larger than one chip's appetite.

Production reality the reference never faced (its Icy host capped stacks at
JVM-heap scale): lightsheet/expansion volumes reach 2048^2 x 512 and beyond
— far past single-chip HBM once the solver state (iterate, gradient, m=5
L-BFGS pairs) multiplies the footprint. The standard spectral-domain answer
is **overlap-discard tiling**: solve overlapping tiles independently and
keep only each tile's core region. The halo absorbs both the circular-FFT
wraparound and the regularizer's boundary effect; the approximation error
decays with halo width relative to the PSF support (exact for compactly
supported PSFs once the halo covers them).

TPU-first shape: every tile has the SAME static shape (edge tiles are
flush-shifted, not shrunk), so all tiles solve as ONE vmapped batched
program — a single compiled executable, batched FFTs keeping the MXU/FFT
pipeline saturated — optionally chunked (``max_batch``) so the working set
stays inside HBM while the full volume streams through.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from microtipi_tpu.jobs.deconv import DeconvolutionConfig
from microtipi_tpu.utils.arrays import crop_to_shape, pad_fft_kernel, roll, unroll

__all__ = ["tile_plan", "tiled_deconvolve"]


def tile_plan(shape: tuple[int, ...], tile: tuple[int, ...], overlap: tuple[int, ...]):
    """Per-axis tile start positions and core (kept) intervals.

    Tiles are placed at stride ``tile - 2*overlap`` with the last tile
    flush against the edge (same static shape everywhere); each tile's core
    is its center minus the halo, extended to the volume edge on boundary
    tiles. Cores cover the volume; where flush-shifting makes neighboring
    cores overlap, the later tile wins (both are interior there).

    Returns ``[(starts, cores)] per axis`` with ``cores`` as (lo, hi) in
    volume coordinates.
    """
    plan = []
    for n, t, o in zip(shape, tile, overlap):
        if t > n:
            raise ValueError(f"tile {t} exceeds volume extent {n}")
        if t <= 2 * o and t != n:
            raise ValueError(f"tile {t} must exceed twice the overlap {o}")
        stride = t - 2 * o
        starts = list(range(0, max(n - t, 0) + 1, stride))
        if starts[-1] + t < n:
            starts.append(n - t)
        cores = []
        for i, s in enumerate(starts):
            lo = 0 if i == 0 else s + o
            hi = n if i == len(starts) - 1 else s + t - o
            cores.append((lo, hi))
        plan.append((starts, cores))
    return plan


def tiled_deconvolve(
    data,
    psf,
    weights=None,
    tile: tuple[int, int, int] | None = None,
    overlap: tuple[int, int, int] | int = 16,
    config: DeconvolutionConfig = DeconvolutionConfig(),
    method: str = "vmlmb",
    rl_iterations: int = 50,
    max_batch: int = 8,
) -> np.ndarray:
    """Deconvolve a volume tile by tile; returns the blended NumPy volume.

    ``data`` may be a NumPy array (it never needs to reach the device whole
    — tiles stream through in batches of ``max_batch``). ``psf`` is
    corner-origin; it is embedded at the tile shape, so its support should
    fit one tile and ``overlap`` should be at least its half-width per axis.
    ``method``: "vmlmb" (TV + positivity, ``config``) or "rl"
    (Richardson-Lucy, ``rl_iterations``; ``config.mu``/``epsilon`` feed its
    TV variant).

    ``config.var_shape`` is ignored (padding is what the halo is for).
    """
    data = np.asarray(data)
    if tile is None:
        tile = tuple(min(n, 256) for n in data.shape)
    tile = tuple(min(t, n) for t, n in zip(tile, data.shape))
    if isinstance(overlap, int):
        overlap = (overlap,) * data.ndim
    overlap = tuple(0 if t == n else o for o, t, n in zip(overlap, tile, data.shape))
    plan = tile_plan(data.shape, tile, overlap)

    boxes = []  # (tile start per axis, core per axis)
    def _walk(axis, start_acc, core_acc):
        if axis == data.ndim:
            boxes.append((tuple(start_acc), tuple(core_acc)))
            return
        for s, c in zip(*plan[axis]):
            _walk(axis + 1, start_acc + [s], core_acc + [c])
    _walk(0, [], [])

    kern = jnp.asarray(psf, data.dtype)
    if any(p > t for p, t in zip(kern.shape, tile)):
        # PSF stored at the (larger) volume grid: keep its centered core at
        # the tile size — lossless when the support fits the tile, which is
        # the tiling validity condition anyway.
        kern = unroll(crop_to_shape(roll(kern), tuple(min(p, t) for p, t in zip(kern.shape, tile))))
    kern = pad_fft_kernel(kern, tile)

    if method == "rl":
        from microtipi_tpu.jobs.richardson_lucy import richardson_lucy

        def solve_one(d, w):
            return richardson_lucy(d, kern, iterations=rl_iterations,
                                   mu=config.mu, epsilon=config.epsilon)

    elif method == "vmlmb":
        from microtipi_tpu.jobs.deconv import deconvolve

        import dataclasses

        # fused_tv off: the Pallas TV kernel does not vmap on TPU (see
        # jobs.batch._unfused); tiles solve as one vmapped program.
        cfg = dataclasses.replace(config, var_shape=None, fused_tv=False)

        def solve_one(d, w):
            return deconvolve(d, kern, weights=w, config=cfg).x

    else:
        raise ValueError(f"unknown method {method!r}")

    w_axis = 0 if weights is not None else None
    solve_batch = jax.jit(jax.vmap(solve_one, in_axes=(0, w_axis)))

    out = np.empty(data.shape, data.dtype)
    for i in range(0, len(boxes), max_batch):
        chunk = boxes[i : i + max_batch]
        sl = [tuple(slice(s, s + t) for s, t in zip(starts, tile)) for starts, _ in chunk]
        batch = np.stack([data[s] for s in sl])
        wbatch = (
            jnp.asarray(np.stack([np.asarray(weights)[s] for s in sl]))
            if weights is not None else None
        )
        # Lane padding keeps ONE compiled executable for the ragged tail.
        pad = 0
        if len(chunk) < max_batch and len(boxes) > max_batch:
            pad = max_batch - len(chunk)
            batch = np.concatenate([batch, np.repeat(batch[-1:], pad, axis=0)])
            if wbatch is not None:
                wbatch = jnp.concatenate([wbatch, jnp.repeat(wbatch[-1:], pad, axis=0)])
        xs = np.asarray(solve_batch(jnp.asarray(batch), wbatch))
        for (starts, cores), x in zip(chunk, xs):
            dst = tuple(slice(lo, hi) for lo, hi in cores)
            src = tuple(slice(lo - s, hi - s) for (lo, hi), s in zip(cores, starts))
            out[dst] = x[src]
    return out
