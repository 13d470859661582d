"""Acquisition geometry: stage-scan light-sheet deskewing.

Beyond-parity (the reference handles epifluorescence only): stage-scanned
light-sheet instruments (lattice light-sheet, diSPIM, OPM) acquire planes
while the sample translates along the coverslip, so the raw stack is SHEARED
— plane k is displaced laterally by ``k * dz * cos(theta) / dxy`` pixels,
with ``theta`` the angle between the detection axis and the scan direction.
Deskewing shears it back onto an orthogonal grid; the deskewed axial
spacing is ``dz * sin(theta)``. This is the standard first step of every
light-sheet pipeline, upstream of the deconvolution/fusion machinery here
(``models/lightsheet.py``, ``jobs/richardson_lucy.py``).

TPU-first shape: the shear is one batched Fourier x-shift with a phase ramp
linear in z — exact subvoxel translation, a single rfft/irfft pair over the
padded volume, no gather/scatter resampling.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["deskew", "deskew_geometry"]


def deskew_geometry(shape, angle_deg: float, dz: float, dxy: float):
    """(x shift per plane [px], padded Nx, deskewed dz) for :func:`deskew`."""
    theta = math.radians(angle_deg)
    shift = dz * math.cos(theta) / dxy
    nz, _, nx = shape
    nx_out = nx + int(math.ceil(abs(shift) * (nz - 1)))
    return shift, nx_out, dz * math.sin(theta)


def deskew(vol, angle_deg: float, dz: float, dxy: float, invert: bool = False):
    """Deskew a stage-scanned stack; returns ``(deskewed, dz_new)``.

    ``angle_deg``: detection-axis-to-scan angle (e.g. 31.8 for a classic
    lattice light-sheet, 45 for diSPIM). ``dz`` is the STAGE step between
    frames (the raw stack's plane spacing); the returned ``dz_new = dz *
    sin(angle)`` is the deskewed grid's true axial spacing — write it into
    the output metadata. ``invert`` flips the shear direction (scan moving
    the other way). The x axis grows by the total shear; new space is
    zero-filled (the Fourier shift's circular wrap lands in the padding, so
    content never wraps onto itself). Jittable with static shape/angle.
    """
    vol = jnp.asarray(vol)
    if vol.ndim != 3:
        raise ValueError("deskew expects a (Nz, Ny, Nx) stack")
    nz, ny, nx = vol.shape
    shift, nx_out, dz_new = deskew_geometry(vol.shape, angle_deg, dz, dxy)
    if invert:
        shift = -shift
    pad = nx_out - nx
    # negative shifts move content toward -x: put the padding there instead
    before = pad if shift < 0 else 0
    v = jnp.pad(vol, ((0, 0), (0, 0), (before, pad - before)))
    # per-plane x shift, linear in z: one batched FFT with a z-dependent ramp
    fx = jnp.asarray(np.fft.rfftfreq(nx_out), v.dtype)
    z_idx = jnp.arange(nz, dtype=v.dtype)
    cdtype = jnp.complex128 if v.dtype == jnp.float64 else jnp.complex64
    ramp = jnp.exp(
        (-2j * jnp.pi)
        * (shift * z_idx[:, None] * fx[None, :]).astype(cdtype)
    )
    spec = jnp.fft.rfft(v, axis=-1) * ramp[:, None, :]
    return jnp.fft.irfft(spec, n=nx_out, axis=-1), dz_new
