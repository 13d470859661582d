"""Acquisition preprocessing: flat-field, hot pixels, background.

Beyond-parity input hygiene (the reference starts at an already-clean
array; its Icy host did these corrections upstream): the three standard
camera/illumination corrections every real acquisition needs before the
convolution model ``d = H x + noise`` holds.

All three are pure jnp (jit/vmap-friendly, TPU-shaped: reduce_window
morphology and separable filters, no data-dependent control flow).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "flat_field_correct",
    "remove_hot_pixels",
    "rolling_ball_background",
    "subtract_background",
]


def flat_field_correct(data, bright, dark=None, eps_rel: float = 1e-3):
    """Illumination/gain correction: ``(d - dark) / (bright - dark)``.

    ``bright``: a flat-field reference (uniform fluorescent slide / dye
    bath), same lateral grid as the data — a 2D (Ny, Nx) reference
    broadcasts over z. ``dark``: camera offset frame (optional). The result
    is rescaled by the mean gain so intensities keep their physical
    magnitude (weights/gain settings stay meaningful). Division is guarded
    at ``eps_rel * mean(gain)`` — dead flat-field pixels clamp instead of
    exploding.
    """
    data = jnp.asarray(data)
    bright = jnp.asarray(bright, data.dtype)
    if dark is not None:
        dark = jnp.asarray(dark, data.dtype)
        data = data - dark
        bright = bright - dark
    if bright.ndim == data.ndim - 1:
        bright = bright[None]
    mean_gain = jnp.mean(bright)
    floor = eps_rel * mean_gain
    return data * (mean_gain / jnp.maximum(bright, floor))


def remove_hot_pixels(data, threshold: float = 5.0):
    """Replace impulsive outliers with the local 3x3 in-plane median.

    A voxel is hot when it deviates from its plane-local 3x3 median by more
    than ``threshold`` robust sigmas (MAD * 1.4826 of the deviation map,
    computed globally). In-plane deliberately: a real point source is
    axially extended (the PSF spans many z planes) while a hot pixel or
    cosmic-ray hit lives on one detector pixel, and the 3D PSF's lateral
    footprint at any plane covers several pixels — so the 3x3 median keeps
    diffraction-limited structure and rejects single-pixel impulses.
    Edges are handled by clamped (edge-replicated) windows.
    """
    data = jnp.asarray(data)
    vol = data if data.ndim == 3 else data[None]

    # 3x3 in-plane median via a stack of 9 shifted copies (edge-replicated).
    pads = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    padded = jnp.pad(vol, ((0, 0), (1, 1), (1, 1)), mode="edge")
    ny, nx = vol.shape[1], vol.shape[2]
    stack = jnp.stack([
        lax.dynamic_slice(padded, (0, 1 + dy, 1 + dx), vol.shape)
        for dy, dx in pads
    ])
    med = jnp.median(stack, axis=0)
    dev = vol - med
    mad = jnp.median(jnp.abs(dev - jnp.median(dev)))
    sigma = 1.4826 * mad + jnp.asarray(np.finfo(np.float32).tiny, vol.dtype)
    out = jnp.where(jnp.abs(dev) > threshold * sigma, med, vol)
    return out if data.ndim == 3 else out[0]


def rolling_ball_background(data, radius: int = 25):
    """Smooth background estimate: grayscale opening with a flat
    ``(2r+1)``-square in-plane structuring element, lightly smoothed.

    The classical rolling-ball idea (Sternberg 1983) as min-then-max
    (erosion, dilation) ``lax.reduce_window`` passes — the opening lies
    fully under the image and under any feature narrower than the window,
    so subtracting it keeps structure and removes slow illumination/
    autofluorescence gradients. In-plane (per z): axial background
    structure is genuine signal more often than not. The final box smooth
    (radius/2 window mean) rounds off the opening's plateau corners.
    """
    data = jnp.asarray(data)
    vol = data if data.ndim == 3 else data[None]
    w = 2 * int(radius) + 1
    dims = (1, w, w)
    strides = (1, 1, 1)

    def window(op, init, x):
        return lax.reduce_window(x, init, op, dims, strides, "SAME")

    big = jnp.asarray(jnp.finfo(vol.dtype).max, vol.dtype)
    eroded = window(lax.min, big, vol)
    opened = window(lax.max, -big, eroded)
    s = max(1, int(radius) // 2)
    sw = 2 * s + 1
    ones = jnp.ones((), vol.dtype)
    smooth = lax.reduce_window(opened, 0.0 * ones, lax.add,
                               (1, sw, sw), strides, "SAME")
    counts = lax.reduce_window(jnp.ones_like(opened), 0.0 * ones, lax.add,
                               (1, sw, sw), strides, "SAME")
    bg = smooth / counts
    # the opening is a lower envelope; smoothing must not push it above data
    bg = jnp.minimum(bg, vol)
    return bg if data.ndim == 3 else bg[0]


def subtract_background(data, radius: int = 25):
    """``data - rolling_ball_background(data, radius)`` (non-negative)."""
    data = jnp.asarray(data)
    return jnp.maximum(data - rolling_ball_background(data, radius), 0.0)
