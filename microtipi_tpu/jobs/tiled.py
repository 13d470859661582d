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

__all__ = ["field_depthvar_psf", "field_psf", "tile_plan", "tiled_deconvolve"]


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


def field_psf(model, anchors, power: float = 2.0):
    """Laterally field-varying PSF from scattered calibrations: a
    ``psf_fn(center)`` for :func:`tiled_deconvolve`.

    ``anchors``: ``[((y, x), params), ...]`` — PSF parameters calibrated at
    known field positions (voxels), e.g. per-region ``fit_psf_beads`` runs
    on beads from different parts of the slide. Parameters are interpolated
    at each tile center by inverse-distance weighting (power ``power``;
    exact at the anchors, smooth between, sane extrapolation at the field
    edge — the right default for scattered calibration points where a
    regular grid cannot be assumed), then synthesized via
    ``model.compute_psf``. ``model`` must carry the TILE shape.

    The lateral complement of the depth-varying solver (``jobs.depthvar``:
    z-interpolated anchors *inside* the forward model): laterally the PSF
    varies on the field-curvature scale — far wider than one tile — so the
    piecewise-constant per-tile approximation of overlap-discard tiling is
    the right tool, with no per-voxel blending cost.
    """
    anchors = list(anchors)
    if not anchors:
        raise ValueError("field_psf needs at least one (position, params) anchor")
    # One jitted synthesis shared by every tile (same pytree shapes): the
    # axon TPU runtime cannot eager-dispatch the complex pupil math, and
    # even where it can, per-op dispatch per tile would dominate.
    compute = jax.jit(model.compute_psf)

    def psf_fn(center):
        return compute(_idw_params(anchors, center, power, model.dtype))

    return psf_fn


def _idw_params(anchors, center, power, dtype):
    """Inverse-distance-weighted parameter mix at a field position — the
    host-side interpolation shared by :func:`field_psf` and
    :func:`field_depthvar_psf` (tiny vectors: no per-tile device ops)."""
    positions = np.asarray([p for p, _ in anchors], np.float64).reshape(len(anchors), 2)
    cy, cx = float(center[-2]), float(center[-1])
    d2 = np.sum((positions - np.asarray([cy, cx])) ** 2, axis=1)
    i_near = int(np.argmin(d2))
    if d2[i_near] < 1e-12:
        w = np.zeros(len(anchors)); w[i_near] = 1.0
    else:
        w = 1.0 / d2 ** (power / 2.0)
        w = w / w.sum()
    p0 = anchors[0][1]
    return p0._replace(**{
        name: jnp.asarray(sum(
            wi * np.asarray(getattr(p, name), np.float64)
            for wi, (_, p) in zip(w, anchors)), dtype)
        for name in p0._fields
    })


def field_depthvar_psf(model, anchors, zs, power: float = 2.0):
    """FULLY space-variant PSF field: lateral field variation x axial depth
    variation — a ``psf_fn(center)`` for
    ``tiled_deconvolve(..., depthvar_anchors=zs)``.

    Composes the two space-variance mechanisms at their natural scales:
    laterally the PSF drifts on the field-curvature scale (wider than a
    tile), so parameters are IDW-interpolated per tile like
    :func:`field_psf`; axially it drifts continuously with imaging depth
    (``models/gibson_lanni.py`` DEPTH family), so each tile gets a
    ``(K, tz, ty, tx)`` anchor stack synthesized at the tile's ABSOLUTE
    depths — z-tiled solves see the correct deep-stack aberration, not a
    restarted-at-zero one.

    ``model``: Gibson-Lanni config at the TILE shape. ``anchors``:
    ``[((y, x), params), ...]`` calibrations (each params carries the DEPTH
    family — e.g. ``fitpsf --depth-ladder`` per field position, or one
    ladder calibration replicated by :func:`field_psf`'s single-anchor
    degenerate case). ``zs``: the K anchor z indices in TILE coordinates —
    pass the SAME array as ``tiled_deconvolve``'s ``depthvar_anchors``.
    The anchor depth for a tile starting at volume plane ``Z0`` is
    ``params.depth[1] + (Z0 + zs[j]) * model.dz``.
    """
    anchors = list(anchors)
    if not anchors:
        raise ValueError("field_depthvar_psf needs at least one "
                         "(position, params) anchor")
    if not hasattr(anchors[0][1], "depth"):
        raise ValueError("field_depthvar_psf needs params with a DEPTH "
                         "family (models/gibson_lanni.py)")
    zs = np.asarray(zs, np.float64)
    nz_tile = model.shape[0]

    compute_stack = jax.jit(lambda p, depths: jax.vmap(
        lambda d: model.compute_psf(p._replace(depth=p.depth.at[1].set(d))))(depths))

    def psf_fn(center):
        mixed = _idw_params(anchors, center, power, model.dtype)
        z0 = float(center[0]) - nz_tile / 2.0  # tile z start, volume coords
        d1 = float(np.asarray(mixed.depth)[1])
        depths = jnp.asarray(d1 + (z0 + zs) * model.dz, model.dtype)
        return compute_stack(mixed, depths)

    return psf_fn


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
    depthvar_anchors=None,
) -> np.ndarray:
    """Deconvolve a volume tile by tile; returns the blended NumPy volume.

    ``data`` may be a NumPy array (it never needs to reach the device whole
    — tiles stream through in batches of ``max_batch``). ``psf`` is
    corner-origin; it is embedded at the tile shape, so its support should
    fit one tile and ``overlap`` should be at least its half-width per axis.
    ``method``: "vmlmb" (TV + positivity, ``config``), "admm" (the same
    objective through the round-4 circulant engine, fixed
    ``config.max_iter`` per tile) or "rl" (Richardson-Lucy,
    ``rl_iterations``; ``config.mu``/``epsilon`` feed its TV variant).

    ``psf`` may instead be a CALLABLE ``psf_fn(center) -> corner-origin
    PSF`` receiving each tile's center in volume voxel coordinates — the
    field-varying path (build one with :func:`field_psf` from scattered
    calibrations). Tiles then solve with their local PSF in the same
    batched program (kernels ride a batch axis); the field variation is
    approximated piecewise-constant per tile, accurate when the PSF drifts
    on scales wider than a tile (lateral field curvature does).

    ``depthvar_anchors``: K anchor z indices in TILE coordinates — each tile
    solves with the DEPTH-VARYING operator (``jobs.depthvar``) instead of a
    single kernel; ``psf`` must then carry a leading K axis (a static
    ``(K, ...)`` stack, or a callable returning one — build a fully
    space-variant field with :func:`field_depthvar_psf`). vmlmb only.

    ``config.var_shape`` is ignored (padding is what the halo is for).
    """
    data = np.asarray(data)
    if depthvar_anchors is not None:
        depthvar_anchors = np.asarray(depthvar_anchors, np.float64)
        if method != "vmlmb":
            raise ValueError("depthvar_anchors rides the vmlmb path; "
                             f"method {method!r} does not take it")
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

    def prep_kernel(k):
        k = jnp.asarray(k, data.dtype)
        if any(p > t for p, t in zip(k.shape, tile)):
            # PSF stored at the (larger) volume grid: keep its centered core
            # at the tile size — lossless when the support fits the tile,
            # which is the tiling validity condition anyway.
            k = unroll(crop_to_shape(roll(k), tuple(min(p, t) for p, t in zip(k.shape, tile))))
        return pad_fft_kernel(k, tile)

    varying = callable(psf)
    if depthvar_anchors is not None:
        prep_one = prep_kernel
        prep_kernel = jax.vmap(prep_one)  # (K, ...) anchor stacks
    if varying:
        prep_jit = jax.jit(prep_kernel)  # per-tile: avoid eager dispatch
    else:
        if depthvar_anchors is not None and np.ndim(psf) != 4:
            raise ValueError("depthvar_anchors needs a (K, ...) anchor "
                             f"stack, got ndim={np.ndim(psf)}")
        kern = prep_kernel(psf)

    if depthvar_anchors is not None:
        import dataclasses

        from microtipi_tpu.jobs.depthvar import deconvolve_depthvar

        cfg = dataclasses.replace(config, var_shape=None)

        def solve_one(d, w, k):
            return deconvolve_depthvar(d, k, depthvar_anchors,
                                       weights=w, config=cfg).x

    elif method == "rl":
        from microtipi_tpu.jobs.richardson_lucy import richardson_lucy

        def solve_one(d, w, k):
            return richardson_lucy(d, k, iterations=rl_iterations,
                                   mu=config.mu, epsilon=config.epsilon)

    elif method == "admm":
        # The round-4 engine per tile (each tile is a plain circulant
        # solve, so the engine composes unchanged; fixed config.max_iter
        # per tile — BASELINE.md engine head-to-head).
        import dataclasses

        from microtipi_tpu.jobs.admm import admm_deconvolve

        cfg = dataclasses.replace(config, var_shape=None)

        def solve_one(d, w, k):
            return admm_deconvolve(d, k, weights=w, config=cfg,
                                   track_objective=False).x

    elif method == "vmlmb":
        from microtipi_tpu.jobs.deconv import deconvolve

        import dataclasses

        # Tiles solve as one vmapped program; the fused Pallas TV routes to
        # its flattened (B*Nz,)-grid batched kernel under vmap (1.3x over the
        # jnp TV at 256^2 tile planes — BASELINE.md), so the standard
        # fused_tv auto rule applies unmodified.
        cfg = dataclasses.replace(config, var_shape=None)

        def solve_one(d, w, k):
            return deconvolve(d, k, weights=w, config=cfg).x

    else:
        raise ValueError(f"unknown method {method!r}")

    w_axis = 0 if weights is not None else None
    k_axis = 0 if varying else None
    solve_batch = jax.jit(jax.vmap(solve_one, in_axes=(0, w_axis, k_axis)))

    if weights is not None:
        # One host copy up front: slicing a device weights array per chunk
        # would re-fetch the full volume device->host on every batch.
        weights = np.asarray(weights)
    out = np.empty(data.shape, data.dtype)
    for i in range(0, len(boxes), max_batch):
        chunk = boxes[i : i + max_batch]
        sl = [tuple(slice(s, s + t) for s, t in zip(starts, tile)) for starts, _ in chunk]
        batch = np.stack([data[s] for s in sl])
        wbatch = (
            jnp.asarray(np.stack([weights[s] for s in sl]))
            if weights is not None else None
        )
        kbatch = None
        if varying:
            kbatch = jnp.stack([
                prep_jit(psf(tuple(s + t / 2.0 for s, t in zip(starts, tile))))
                for starts, _ in chunk
            ])
        # Lane padding keeps ONE compiled executable for the ragged tail.
        pad = 0
        if len(chunk) < max_batch and len(boxes) > max_batch:
            pad = max_batch - len(chunk)
            batch = np.concatenate([batch, np.repeat(batch[-1:], pad, axis=0)])
            if wbatch is not None:
                wbatch = jnp.concatenate([wbatch, jnp.repeat(wbatch[-1:], pad, axis=0)])
            if kbatch is not None:
                kbatch = jnp.concatenate([kbatch, jnp.repeat(kbatch[-1:], pad, axis=0)])
        xs = np.asarray(solve_batch(jnp.asarray(batch), wbatch,
                                    kbatch if varying else kern))
        for (starts, cores), x in zip(chunk, xs):
            dst = tuple(slice(lo, hi) for lo, hi in cores)
            src = tuple(slice(lo - s, hi - s) for (lo, hi), s in zip(cores, starts))
            out[dst] = x[src]
    return out
