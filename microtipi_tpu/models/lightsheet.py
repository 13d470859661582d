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

__all__ = ["LightSheetConfig", "LightSheetParams", "StructuredSheetConfig"]


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


@dataclasses.dataclass(frozen=True)
class StructuredSheetConfig(LightSheetConfig):
    """Bessel / optical-lattice light-sheet excitation (dithered).

    Beyond the Gaussian sheet: lattice light-sheet and Bessel-sheet
    instruments (Betzig 2014, Science 346; Planchon 2011) form the sheet
    from an annulus or a discrete lattice of beams on the ILLUMINATION
    pupil, dithered along y to a time-averaged sheet. The physics
    implemented: the beam's transverse spectrum lives on the (ky, kz)
    mask ``A``; under y-dithering, components at different ky add
    incoherently while equal-ky components interfere, so the z profile is

        S(z) = sum_ky | sum_kz A(ky, kz) exp(i kz z) |^2

    — one static pupil mask, one small contraction, fully differentiable.
    This reproduces the defining features: a propagation-invariant main
    lobe of thickness ~lambda_exc/(2 NA_max), side-lobe tails whose decay
    is set by the ANNULUS WIDTH (thin annulus = more Bessel-like = longer
    tails — the confinement/uniformity trade every lattice user tunes),
    and lattice periods from the beam geometry. Propagation-invariance is
    the point of these sheets, so the Gaussian model's ``divergence``
    flag is ignored here.

    ``sheet_mode``
        "bessel": uniform annulus ``[sheet_na_min, sheet_na_max]``.
        "lattice": Gaussian spots on the ``sheet_na_max`` ring at ky-axis
        fractions ``lattice_ky`` (each u generates the 4 symmetric spots
        (+-u*k, +-sqrt(1-u^2)*k); u = 0 the 2 axial ones) with 1/e^2
        radius ``lattice_sigma`` in NA units (default: the annulus
        half-width) — a dithered square/hex lattice is a choice of
        ``lattice_ky``.

    The fittable SHEET family is reinterpreted as ``(z0, scale)``: sheet
    offset [m] and a dimensionless k-space magnification (init 1.0) that
    calibrates period/thickness against beads — alignment and
    magnification errors land exactly there. Gauges, both measured
    (tests): the profile is EVEN in ``scale`` (it only enters through
    cos), so read ``|scale|``; and a bead calibration recovers z0 only
    modulo the integer-dz part absorbed by the bead centering (the same
    axial gauge as the Gaussian sheet's z0 / Zernike Z4 — fit z0 from
    beads, not blindly).
    """

    sheet_na_min: float = 0.4
    sheet_na_max: float = 0.55
    sheet_mode: str = "bessel"
    lattice_ky: tuple = (0.0,)
    lattice_sigma: float = 0.0
    sheet_samples: int = 96

    def __post_init__(self):
        super().__post_init__()
        if self.sheet_mode not in ("bessel", "lattice"):
            raise ValueError(f"unknown sheet_mode {self.sheet_mode!r}")
        if not 0.0 < self.sheet_na_min < self.sheet_na_max:
            raise ValueError("need 0 < sheet_na_min < sheet_na_max")

    def init_params(self) -> LightSheetParams:
        base = WideFieldConfig.init_params(self)
        sheet = jnp.array([0.0, 1.0], self.dtype)  # (z0 [m], k-scale)
        return LightSheetParams(*base, sheet)

    def _illumination_mask(self):
        """Static (ky, kz) pupil mask and the kz sample vector [1/m],
        host NumPy (never cache device arrays on configs)."""
        cached = getattr(self, "_illum_cache", None)
        if cached is not None:
            return cached
        m = int(self.sheet_samples)
        k_max = 2.0 * np.pi * self.sheet_na_max / self._lambda_exc
        k_min = 2.0 * np.pi * self.sheet_na_min / self._lambda_exc
        lim = 1.1 * k_max
        ky = np.linspace(-lim, lim, m)
        kz = np.linspace(-lim, lim, m)
        kyy, kzz = np.meshgrid(ky, kz, indexing="ij")
        r = np.hypot(kyy, kzz)
        if self.sheet_mode == "bessel":
            mask = ((r >= k_min) & (r <= k_max)).astype(np.float64)
        else:
            sig = self.lattice_sigma or (self.sheet_na_max - self.sheet_na_min) / 2
            sig_k = 2.0 * np.pi * sig / self._lambda_exc
            mask = np.zeros((m, m))
            if not self.lattice_ky:
                raise ValueError(
                    "lattice mode needs at least one lattice_ky beam position")
            for u in self.lattice_ky:
                u = float(u)
                if not -1.0 <= u <= 1.0:
                    raise ValueError(f"lattice_ky fraction {u} outside [-1, 1]")
                cy = u * k_max
                cz = np.sqrt(max(1.0 - u * u, 0.0)) * k_max
                # set-dedup BOTH sign loops: u=0 collapses the ky pair,
                # u=+-1 collapses the kz pair (plain tuples double-counted
                # the on-axis spots — caught in review)
                for sy in ({1.0} if cy == 0.0 else {1.0, -1.0}):
                    for sz in ({1.0} if cz == 0.0 else {1.0, -1.0}):
                        mask += np.exp(-(((kyy - sy * cy) ** 2
                                          + (kzz - sz * cz) ** 2)
                                         / (2.0 * sig_k ** 2)))
        if not np.any(mask > 0):
            raise ValueError("illumination mask is empty (check the annulus "
                             "NAs / lattice positions)")
        cached = (mask, kz)
        object.__setattr__(self, "_illum_cache", cached)
        return cached

    def sheet_profile(self, sheet: jax.Array) -> jax.Array:
        """Dithered structured-sheet intensity S(z), shape (Nz, 1, 1),
        normalized to unit peak (the PSF is renormalized downstream
        anyway; unit peak keeps the detection/excitation product scale
        readable)."""
        nz = self.shape[0]
        mask, kz = self._illumination_mask()
        a = jnp.asarray(mask, self.dtype)
        kzv = jnp.asarray(kz, self.dtype)
        zc = jnp.asarray(wrapped_z(nz) * self.dz, self.dtype)
        z0, scale = sheet[0], sheet[1]
        phase = (scale * kzv)[:, None] * (zc - z0)[None, :]  # (M, Nz)
        e_re = a @ jnp.cos(phase)  # (Mky, Nz)
        e_im = a @ jnp.sin(phase)
        s = jnp.sum(e_re * e_re + e_im * e_im, axis=0)
        s = s / jnp.max(s)
        return s[:, None, None]
