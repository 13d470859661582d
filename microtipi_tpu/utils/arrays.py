"""Array layout helpers: pad / roll / crop.

Equivalents of the TiPi ``ArrayUtils`` calls the reference depends on:
``ArrayUtils.roll`` moving a PSF between corner-origin (FFT) and centered
layouts (``microUtils/BlindDeconvJob.java:100``) and ``ArrayUtils.pad``
growing a weight map to the PSF shape (``microscopy/PSF_Estimation.java:323``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["roll", "unroll", "pad_to_shape", "crop_to_shape", "pad_fft_kernel"]


def roll(x: jax.Array) -> jax.Array:
    """Corner-origin (FFT layout) -> centered layout.

    TiPi ``ArrayUtils.roll`` semantics: circular shift by ``floor(N/2)`` along
    every axis, i.e. ``fftshift``. Self-inverse only for even sizes; use
    :func:`unroll` to go back in general.
    """
    return jnp.fft.fftshift(x)


def unroll(x: jax.Array) -> jax.Array:
    """Centered layout -> corner-origin (FFT layout); inverse of :func:`roll`."""
    return jnp.fft.ifftshift(x)


def _offsets(small: tuple[int, ...], big: tuple[int, ...]) -> tuple[int, ...]:
    if len(small) != len(big) or any(s > b for s, b in zip(small, big)):
        raise ValueError(f"cannot fit shape {small} inside {big}")
    # Centered placement, matching TiPi ArrayUtils.pad's default centering.
    return tuple((b - s) // 2 for s, b in zip(small, big))


def pad_to_shape(x: jax.Array, shape: tuple[int, ...], value: float = 0.0) -> jax.Array:
    """Center-pad ``x`` to ``shape`` with ``value`` (TiPi ``ArrayUtils.pad``)."""
    offs = _offsets(x.shape, shape)
    pads = [(o, b - s - o) for o, s, b in zip(offs, x.shape, shape)]
    return jnp.pad(x, pads, constant_values=value)


def crop_to_shape(x: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """Extract the centered region of ``shape`` from ``x`` (inverse of pad)."""
    offs = _offsets(shape, x.shape)
    slices = tuple(slice(o, o + s) for o, s in zip(offs, shape))
    return x[slices]


def pad_fft_kernel(kernel: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """Grow a corner-origin kernel to ``shape`` while keeping it corner-origin.

    Centers the kernel, zero-pads, then shifts back — the standard way to
    embed a PSF in a larger (padded) object grid without moving its origin.
    """
    if kernel.shape == tuple(shape):
        return kernel
    return unroll(pad_to_shape(roll(kernel), shape))
