"""Image-scanning microscopy (ISM / Airyscan) PSF model.

Beyond-parity model family: a confocal microscope whose single pinhole is
replaced by a small DETECTOR ARRAY (Zeiss Airyscan, re-scan confocal,
SPAD-array ISM). Each element k at projected object-space offset ``d_k``
sees its own effective PSF

    h_k(r) = h_exc(r) * (h_det (*)_xy element)(r - d_k)

(Sheppard 1988; Mueller & Enderlein 2010, PRL 104; Sheppard-Mehta-Heintzmann
2013): the excitation spot times the detection PSF displaced to the
element, each element integrating over its own small aperture. An image of
a point source on element k therefore peaks near ``d_k/2`` — shifting each
element image back by ``s*d_k`` (pixel reassignment, ``s = 0.5`` for
matched excitation/detection widths) and summing yields the ISM image with
~sqrt(2) lateral resolution gain at the FULL light budget of an open
pinhole, the best of both confocal worlds.

Composition over the existing machinery (nothing else changes):

- the shared-pupil synthesis comes from ``ConfocalConfig`` — aberrations,
  defocus, Zernike modulus/phase act on both arms exactly as there
  (reference pupil semantics ``epifluorescence/WideFieldModel.java:60-78``);
- ``compute_psfs`` returns the (K,)-batched element PSFs through ONE
  batched FFT chain — the data term for a joint multi-element MLE
  (``jobs/richardson_lucy.multiview_richardson_lucy``, ``jobs/ism``);
- ``compute_psf`` (the PsfModel protocol) is the REASSIGNED-sum PSF, so
  ``fit_psf``/``blind_deconvolve``/every sharded path work unchanged on
  reassembled ISM images.

Offsets are projected to object space in meters (divide the physical
detector pitch by the total magnification; for Airyscan-style specs,
1 Airy unit = ``1.22 * wavelength / NA``).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from microtipi_tpu.models.confocal import ConfocalConfig, _scaled_params
from microtipi_tpu.utils.grids import fft_index

__all__ = ["ISMConfig", "hex_offsets"]


def hex_offsets(rings: int, pitch: float) -> np.ndarray:
    """Hexagonally packed detector-element offsets ``(K, 2)`` in meters
    ``(dy, dx)``: a center element plus ``rings`` full hex rings —
    ``K = 1 + 3*rings*(rings+1)`` (7 for 1 ring, 19 for 2, 37 for 3; the
    Airyscan's 32 is a 37-element hex with the corners unused). Row order
    is center-out, so truncating the array keeps the innermost elements.
    """
    a1 = np.array([0.0, 1.0])  # (dy, dx) basis
    a2 = np.array([np.sqrt(3.0) / 2.0, 0.5])
    out = [(0.0, 0.0)]
    for i in range(-rings, rings + 1):
        for j in range(-rings, rings + 1):
            if i == 0 and j == 0:
                continue
            # axial-coordinate hex distance
            if max(abs(i), abs(j), abs(i + j)) > rings:
                continue
            v = (i * a1 + j * a2) * pitch
            out.append((float(v[0]), float(v[1])))
    out = np.asarray(out, np.float64)
    # center-out ordering (stable: radius then angle)
    r = np.hypot(out[:, 0], out[:, 1])
    ang = np.arctan2(out[:, 0], out[:, 1])
    return out[np.lexsort((ang, np.round(r / max(pitch, 1e-300), 6)))]


@dataclasses.dataclass(frozen=True)
class ISMConfig(ConfocalConfig):
    """ISM / Airyscan microscope PSF.

    Inherits the confocal excitation/detection pupils (``wavelength`` =
    emission, ``wavelength_exc``, shared parameter families). The
    ``pinhole`` field of the base class is reinterpreted as the ELEMENT
    aperture radius (object-projected, meters; 0 = point elements).
    Adds:

    ``element_pitch``
        center-to-center element spacing projected to object space [m].
    ``rings``
        hex rings around the central element (K = 1 + 3r(r+1) elements).
    ``reassign_factor``
        pixel-reassignment scale s: element k's image shifts by
        ``-s * d_k``. 0.5 is exact for matched excitation/detection
        widths; with a Stokes shift the optimum is
        ``s* = sigma_det^2 / (sigma_exc^2 + sigma_det^2)`` — slightly
        below 0.5 when the emission PSF is the wider one.
    """

    element_pitch: float = 0.0
    rings: int = 2
    reassign_factor: float = 0.5

    def __post_init__(self):
        super().__post_init__()
        if self.element_pitch <= 0.0:
            raise ValueError(
                "ISMConfig needs element_pitch > 0 (object-projected "
                "element spacing in meters)")

    def offsets(self) -> np.ndarray:
        """(K, 2) object-space element offsets (dy, dx), center-out."""
        return hex_offsets(self.rings, self.element_pitch)

    @property
    def n_elements(self) -> int:
        return 1 + 3 * self.rings * (self.rings + 1)

    def _shift_ramps(self, scale: float) -> np.ndarray:
        """(K, Ny, Nx//2+1) rfft2 phase ramps translating by ``scale*d_k``
        (host NumPy static geometry). Multiplying an rfft2 spectrum by ramp
        k shifts the image by ``+scale*d_k`` (f(r - a) convention)."""
        _, ny, nx = self.shape
        d = self.offsets()
        fy = np.fft.fftfreq(ny)[None, :, None]
        fx = np.fft.rfftfreq(nx)[None, None, :]
        py = d[:, 0, None, None] / self.dxy
        px = d[:, 1, None, None] / self.dxy
        return np.exp(-2j * np.pi * scale * (fy * py + fx * px))

    def compute_psfs(self, params) -> jax.Array:
        """The K element PSFs ``(K,) + shape``, corner-origin, jointly
        normalized so their SUM has unit integral (the open-pinhole light
        budget is split across elements — keeping the joint normalization
        makes the K-element data term flux-consistent with one acquisition).
        """
        nz, ny, nx = self.shape
        h_det = super(ConfocalConfig, self).compute_psf(params)
        ratio = self.wavelength / self._lambda_exc
        h_exc = self._exc_config().compute_psf(_scaled_params(params, ratio))
        spec = jnp.fft.rfft2(h_det)[None]  # (1, Nz, Ny, Nxr)
        ramps = jnp.asarray(self._shift_ramps(1.0), self.cdtype)[:, None]
        otf_p = self._pinhole_otf()
        if otf_p is not None:  # element aperture integration
            ramps = ramps * jnp.asarray(otf_p, self.cdtype)[None, None]
        h_det_k = jnp.fft.irfft2(spec * ramps, s=(ny, nx)).astype(self.dtype)
        h = h_exc[None] * h_det_k
        return h / jnp.sum(h)

    def compute_psf(self, params) -> jax.Array:
        """The REASSIGNED-sum ISM PSF (PsfModel protocol): element PSFs
        shifted back by ``-reassign_factor * d_k`` and summed, unit sum.
        This is the effective PSF of an ISM image assembled by
        :func:`~microtipi_tpu.jobs.ism.ism_reassign` with the same factor —
        pinned by tests — so PSF fits and blind loops run on reassembled
        data unchanged.

        Note the subvoxel Fourier shifts ring slightly NEGATIVE (fraction
        of a percent of the peak) — deliberately not clamped, because the
        reassembled DATA rings identically and the exact data/PSF
        consistency is what fits and Gaussian deconvolution need. For RL
        (positivity-assuming) on reassembled images clamp both sides, or
        better, run the raw-element joint MLE
        (:func:`~microtipi_tpu.jobs.ism.ism_richardson_lucy`)."""
        nz, ny, nx = self.shape
        hk = self.compute_psfs(params)
        back = jnp.asarray(self._shift_ramps(-self.reassign_factor),
                           self.cdtype)[:, None]
        h = jnp.fft.irfft2(jnp.fft.rfft2(hk) * back, s=(ny, nx))
        h = jnp.sum(h, axis=0).astype(self.dtype)
        return h / jnp.sum(h)
