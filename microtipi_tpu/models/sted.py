"""STED (stimulated-emission-depletion) PSF model.

Beyond-parity model family: the reference models widefield only
(``epifluorescence/WideFieldModel.java``), but the same blind-deconvolution
machinery serves super-resolution STED data — and deconvolution is standard
practice on STED images (the effective PSF is still a smooth few-tens-of-nm
kernel). Composition (standard pulsed-STED approximation, e.g. Harke et al.
2008, Opt. Express 16:4154):

    h_sted(r) = h_conf(r) * eta(r),      eta = exp(-ln2 * zeta * d(r)),

where ``h_conf`` is the confocal PSF (excitation x pinhole-integrated
detection, ``models/confocal.py``), ``d(r)`` is the depletion-beam intensity
normalized to unit peak, and ``zeta = I_peak/I_sat`` is the saturation
factor — the instrument's resolution knob (lateral FWHM shrinks roughly as
``1/sqrt(1 + zeta)``). The depletion focus is synthesized from the SAME
aberrated pupil as the other arms (coefficients wavelength-scaled, like the
excitation arm) with the depletion phase mask added:

- ``depletion="donut"``: 2pi vortex phase ``exp(i*theta)`` — the lateral
  (xy) STED donut with a true zero on the optical axis;
- ``depletion="bottle"``: pi-disk phase plate over the inner pupil (radius
  ``1/sqrt(2)`` of the aperture, the equal-area choice that nulls the
  focus) — the axial ("z-STED" / bottle-beam) variant.

``zeta`` is the fittable STED parameter family (one coefficient,
nonnegative): fitting it against a bead stack calibrates the instrument's
effective resolution the same way the SHEET family calibrates sheet
geometry — and because the donut is built from the shared pupil, phase
aberrations distort depletion and detection consistently, which is exactly
the coupling blind STED fitting needs.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from microtipi_tpu.models.confocal import ConfocalConfig, _scaled_params
from microtipi_tpu.models.widefield import WideFieldConfig, WideFieldParams
from microtipi_tpu.utils.grids import fft_index

__all__ = ["STEDConfig", "STEDParams"]


class STEDParams(NamedTuple):
    """Widefield parameter families plus the STED saturation family.

    ``sted = (zeta,)``: the saturation factor ``I_peak/I_sat`` (>= 0;
    0 = depletion off = plain confocal).
    """

    defocus: jax.Array
    phase: jax.Array
    modulus: jax.Array
    sted: jax.Array


@dataclasses.dataclass(frozen=True)
class STEDConfig(ConfocalConfig):
    """STED microscope PSF (confocal detection x depletion suppression).

    Inherits the confocal geometry (``wavelength`` = emission,
    ``wavelength_exc``, ``pinhole``). Adds:

    ``wavelength_dep``
        depletion wavelength in m (red-shifted on real instruments, e.g.
        775 nm for 640-excited dyes; 0 = same as emission).
    ``depletion``
        "donut" (lateral vortex) or "bottle" (axial pi-disk).
    ``saturation``
        initial/parity value of zeta for ``init_params``.
    """

    wavelength_dep: float = 0.0  # 0 -> same as emission
    depletion: str = "donut"
    saturation: float = 0.0

    def __post_init__(self):
        super().__post_init__()
        if self.depletion not in ("donut", "bottle"):
            raise ValueError(f"unknown depletion {self.depletion!r}")

    @property
    def _lambda_dep(self) -> float:
        return self.wavelength_dep or self.wavelength

    def _dep_config(self) -> WideFieldConfig:
        cached = getattr(self, "_dep_cache", None)
        if cached is None:
            cached = WideFieldConfig(
                shape=self.shape, na=self.na, wavelength=self._lambda_dep,
                ni=self.ni, dxy=self.dxy, dz=self.dz, n_phase=self.n_phase,
                n_modulus=self.n_modulus, radial=self.radial, dtype=self.dtype,
            )
            object.__setattr__(self, "_dep_cache", cached)
        return cached

    def _dep_mask_phase(self) -> np.ndarray:
        """The static depletion phase mask on the pupil grid (host NumPy)."""
        cached = getattr(self, "_dep_mask_cache", None)
        if cached is None:
            _, ny, nx = self.shape
            ky = fft_index(ny)[:, None]
            kx = fft_index(nx)[None, :]
            if self.depletion == "donut":
                cached = np.arctan2(ky, kx)  # 2pi vortex (singular at DC)
            else:  # bottle: pi phase over the inner (equal-area) disk
                dep = self._dep_config()
                r_px = dep.radius * dep.dxy * nx  # aperture radius in pixels
                inner = (ky**2 + kx**2) <= (r_px / np.sqrt(2.0)) ** 2
                cached = np.pi * inner.astype(np.float64)
            object.__setattr__(self, "_dep_mask_cache", cached)
        return cached

    def depletion_intensity(self, params: STEDParams) -> jax.Array:
        """Depletion-beam intensity, unit peak, corner-origin (Nz, Ny, Nx).

        Built from the shared aberrated pupil at the depletion wavelength
        (coefficients wavelength-scaled like the excitation arm) plus the
        static donut/bottle phase mask — aberrations distort the depletion
        zero exactly as they do on a real instrument.
        """
        dep = self._dep_config()
        ratio = self.wavelength / self._lambda_dep
        wf = _scaled_params(
            WideFieldParams(params.defocus, params.phase, params.modulus), ratio
        )
        rho, phi, psi, _ = dep.compute_pupil(wf)
        mask_phase = jnp.asarray(self._dep_mask_phase(), self.dtype)
        if self.depletion == "donut":
            # The vortex phase is singular at the pupil center; keeping that
            # pixel breaks the on-axis null (measured: d(0)=7e-3 of peak with
            # it, ~0 without). Real vortex plates have a dead center too.
            rho = rho.at[0, 0].set(0.0)
        h = dep.compute_psf_from_pupil(phi + mask_phase, rho=rho,
                                       defocus=wf.defocus)
        return h / jnp.max(h)

    def init_params(self) -> STEDParams:
        base = WideFieldConfig.init_params(self)
        return STEDParams(*base, jnp.asarray([self.saturation], self.dtype))

    def compute_psf(self, params: STEDParams) -> jax.Array:
        """``h = h_conf * exp(-ln2 * zeta * d)``, unit sum, corner-origin."""
        wf = WideFieldParams(params.defocus, params.phase, params.modulus)
        h_conf = ConfocalConfig.compute_psf(self, wf)
        d = self.depletion_intensity(params)
        zeta = jnp.maximum(params.sted[0], 0.0)  # physical: no "anti-depletion"
        ln2 = jnp.asarray(np.log(2.0), self.dtype)  # f64 scalar would promote
        h = h_conf * jnp.exp(-ln2 * zeta * d)
        return h / jnp.sum(h)
