"""Light-sheet (SPIM) PSF model: widefield detection x Gaussian excitation sheet.

Beyond-parity model family: the reference models only epifluorescence
(``epifluorescence/WideFieldModel.java``), but its ecosystem serves
selective-plane-illumination (SPIM / light-sheet) data with the same
blind-deconvolution machinery — and this framework already ships the
multi-view joint-MLE fusion such data is acquired for
(``jobs/richardson_lucy.py``). This model completes that story: the overall
PSF is the detection-arm widefield PSF (the full pupil synthesis of
``WideFieldModel.java:60-78,202-203`` — aberrations, defocus, Zernike
modulus/phase all inherited) multiplied by the excitation sheet's axial
intensity profile.

Physics (standard Gaussian-sheet approximation, e.g. Huisken 2004 /
Power & Huisken 2017): a cylindrically-focused Gaussian beam propagating
along x, confined along z, has intensity

    L(z, x) = (w0 / w(x)) * exp(-2 (z - z0)^2 / w(x)^2),
    w(x)    = w0 * sqrt(1 + (x / xR)^2),   xR = pi * w0^2 * ni / lambda_exc

with waist ``w0`` (1/e^2 intensity radius) and sheet offset ``z0`` (the
sheet-to-detection-focal-plane misalignment). ``divergence=False`` drops the
x dependence (thin-FOV approximation, L = L(z) only).

``(z0, w0)`` form the fittable SHEET parameter family: fitting them against a
bead stack is exactly the sheet-alignment calibration light-sheet instruments
need (``fit_psf(..., SHEET)``; the family's ~1e-6 m scale needs the same
gradient preconditioning as the Gibson-Lanni DEPTH family —
``jobs/psf_fit.py``). Note the z0 <-> object-z-shift gauge: like Zernike Z4
on the phase family (BASELINE.md quality notes), a sheet offset is partially
degenerate with translating the object in z, so fit z0 from beads, not
blindly.

The composite PSF is normalized to unit sum inside the differentiated graph
(the sheet factor carries an arbitrary scale; there is no reference
convention to match here — same stance as ``models/confocal.py``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from microtipi_tpu.models.widefield import WideFieldConfig, WideFieldParams
from microtipi_tpu.utils.grids import fft_index, wrapped_z

__all__ = ["LightSheetConfig", "LightSheetParams"]


class LightSheetParams(NamedTuple):
    """Widefield parameter families plus the excitation-sheet family.

    ``sheet = (z0, w0)``: sheet offset from the detection focal plane and
    sheet waist (1/e^2 intensity radius), both in meters.
    """

    defocus: jax.Array
    phase: jax.Array
    modulus: jax.Array
    sheet: jax.Array


@dataclasses.dataclass(frozen=True)
class LightSheetConfig(WideFieldConfig):
    """Light-sheet microscope PSF.

    Inherits the widefield detection geometry (``wavelength`` is the
    *emission* wavelength, as in the reference ctor,
    ``WideFieldModel.java:154-188``). Adds:

    ``sheet_na``
        excitation (illumination) NA of the sheet-forming optics; sets the
        default waist ``w0 = lambda_exc / (pi * sheet_na)``.
    ``wavelength_exc``
        excitation wavelength in m (defaults to the emission wavelength).
    ``divergence``
        model the Gaussian-beam waist growth along the propagation axis x
        (default True); False = ideal uniform sheet across the FOV.
    """

    sheet_na: float = 0.1
    wavelength_exc: float = 0.0  # 0 -> same as emission
    divergence: bool = True

    @property
    def _lambda_exc(self) -> float:
        return self.wavelength_exc or self.wavelength

    @property
    def waist(self) -> float:
        """Default sheet waist w0 = lambda_exc/(pi*NA_sheet) [m]."""
        return self._lambda_exc / (np.pi * self.sheet_na)

    # ---- params ---------------------------------------------------------

    def init_params(self) -> LightSheetParams:
        base = super().init_params()
        sheet = jnp.array([0.0, self.waist], self.dtype)
        return LightSheetParams(*base, sheet)

    # ---- synthesis ------------------------------------------------------

    def sheet_profile(self, sheet: jax.Array) -> jax.Array:
        """Excitation intensity on the PSF grid, corner-origin, broadcastable
        to (Nz, Ny, Nx): shape (Nz, 1, Nx) with divergence, (Nz, 1, 1)
        without."""
        nz, _, nx = self.shape
        z0 = sheet[0]
        w0 = sheet[1]
        zc = jnp.asarray(wrapped_z(nz) * self.dz, self.dtype)  # centered z [m]
        dz2 = (zc - z0) ** 2
        if not self.divergence:
            return jnp.exp(-2.0 * dz2 / (w0 * w0))[:, None, None]
        xc = jnp.asarray(fft_index(nx) * self.dxy, self.dtype)  # centered x [m]
        x_r = (np.pi * self.ni / self._lambda_exc) * w0 * w0  # Rayleigh range
        w2 = w0 * w0 * (1.0 + (xc / x_r) ** 2)  # w(x)^2, (Nx,)
        # intensity of a 2D (cylindrical) Gaussian sheet: amplitude ~ sqrt(w0/w)
        prof = jnp.sqrt(w0 * w0 / w2)[None, :] * jnp.exp(-2.0 * dz2[:, None] / w2[None, :])
        return prof[:, None, :]

    def compute_psf(self, params: LightSheetParams) -> jax.Array:
        """``h = h_det * L(z, x)``, unit sum, corner-origin (Nz, Ny, Nx)."""
        det = WideFieldParams(params.defocus, params.phase, params.modulus)
        h_det = super().compute_psf(det)
        h = h_det * self.sheet_profile(params.sheet)
        return h / jnp.sum(h)
