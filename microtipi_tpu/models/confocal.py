"""Confocal and two-photon PSF models (scalar, shared-pupil formalism).

Beyond-parity model families: the reference models only the widefield case
(``epifluorescence/WideFieldModel.java``), but its ecosystem (Icy/DEMICS
deconvolution plugins) serves confocal and multiphoton data with the same
blind-deconvolution machinery. Both models here are thin compositions of the
widefield pupil synthesis, so every downstream component — the
object-as-kernel PSF fit (``jobs/psf_fit.py``), the blind loop, the sharded
mesh paths — works on them unchanged via autodiff (the PsfModel protocol,
``models/microscope.py``).

Physics (standard scalar approximations, e.g. Pawley ch. 22):

- **Confocal**: ``h = h_exc * (h_det (*)_xy pinhole)`` — the excitation
  intensity PSF multiplied by the detection PSF integrated laterally over the
  pinhole (a disk of radius ``pinhole`` in object space; 0 = ideal point
  pinhole, giving ``h_exc * h_det``).
- **Two-photon**: ``h = h_exc^2`` — squared excitation intensity,
  non-descanned (whole-area) detection.

One parameter set drives both pupils: the same physical wavefront error
``W`` and geometry produce phase ``2*pi*W/lambda`` in each pupil, so the
emission-referred coefficients (alpha, ni/lambda) are scaled by
``lambda_em / lambda_exc`` for the excitation pupil — coefficients stay
interpretable in the emission convention the reference uses, and gradients
flow through both arms.

The composite PSF is normalized to unit sum inside the differentiated graph
(products of two PSFnorm'd factors would otherwise carry an arbitrary
``1/(NxNyNz)^2`` scale; there is no reference convention to match here).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from microtipi_tpu.models.widefield import WideFieldConfig, WideFieldParams
from microtipi_tpu.utils.grids import fft_index

__all__ = ["ConfocalConfig", "TwoPhotonConfig"]


def _scaled_params(params: WideFieldParams, ratio: float) -> WideFieldParams:
    """Emission-referred parameters re-expressed for a pupil at another
    wavelength: ``ni/lambda`` and the phase coefficients (radians) scale by
    ``lambda_em / lambda_other``; the modulus (transmission) does not."""
    defocus = params.defocus * jnp.asarray(
        [ratio, 1.0, 1.0], params.defocus.dtype
    )
    return WideFieldParams(defocus, params.phase * ratio, params.modulus)


@dataclasses.dataclass(frozen=True)
class ConfocalConfig(WideFieldConfig):
    """Confocal laser-scanning microscope PSF.

    Inherits the widefield geometry/pupil machinery (``wavelength`` is the
    *emission* wavelength, as in the reference ctor,
    ``WideFieldModel.java:154-188``). Adds:

    ``wavelength_exc``
        excitation wavelength in m (defaults to the emission wavelength).
    ``pinhole``
        pinhole radius projected to object space, in m. 0 = ideal
        (point-pinhole) confocal.
    """

    wavelength_exc: float = 0.0  # 0 -> same as emission
    pinhole: float = 0.0  # object-space pinhole radius [m]; 0 = ideal

    @property
    def _lambda_exc(self) -> float:
        return self.wavelength_exc or self.wavelength

    def _exc_config(self) -> WideFieldConfig:
        """The excitation-side widefield synthesis (larger pupil: NA/lambda_exc
        differs), cached like the base class statics."""
        cached = getattr(self, "_exc_cache", None)
        if cached is None:
            cached = WideFieldConfig(
                shape=self.shape, na=self.na, wavelength=self._lambda_exc,
                ni=self.ni, dxy=self.dxy, dz=self.dz, n_phase=self.n_phase,
                n_modulus=self.n_modulus, radial=self.radial, dtype=self.dtype,
            )
            object.__setattr__(self, "_exc_cache", cached)
        return cached

    def _pinhole_otf(self) -> np.ndarray | None:
        """rfft2 of the normalized pinhole disk (corner-origin), host NumPy
        (static geometry — never cache device arrays on configs)."""
        if self.pinhole <= 0.0:
            return None
        cached = getattr(self, "_pinhole_cache", None)
        if cached is None:
            _, ny, nx = self.shape
            x = fft_index(nx) * self.dxy
            y = fft_index(ny) * self.dxy
            disk = (x[None, :] ** 2 + y[:, None] ** 2) <= self.pinhole**2
            disk = disk.astype(np.float64)
            disk /= disk.sum()
            cached = np.fft.rfft2(disk)
            object.__setattr__(self, "_pinhole_cache", cached)
        return cached

    def compute_psf(self, params: WideFieldParams) -> jax.Array:
        """``h = h_exc * (h_det (*)_xy pinhole)``, unit sum, corner-origin."""
        h_det = super().compute_psf(params)
        ratio = self.wavelength / self._lambda_exc
        h_exc = self._exc_config().compute_psf(_scaled_params(params, ratio))
        otf_p = self._pinhole_otf()
        if otf_p is not None:
            _, ny, nx = self.shape
            spec = jnp.fft.rfft2(h_det) * jnp.asarray(otf_p, self.cdtype)
            h_det = jnp.fft.irfft2(spec, s=(ny, nx)).astype(self.dtype)
        h = h_exc * h_det
        return h / jnp.sum(h)


@dataclasses.dataclass(frozen=True)
class TwoPhotonConfig(WideFieldConfig):
    """Two-photon excitation PSF: ``h = h_exc^2``, unit sum.

    ``wavelength`` is the excitation wavelength (the only one that shapes a
    2p PSF under non-descanned detection); parameters are in the excitation
    pupil's own convention, so no cross-wavelength scaling is needed.
    """

    def compute_psf(self, params: WideFieldParams) -> jax.Array:
        h = super().compute_psf(params)
        h = h * h
        return h / jnp.sum(h)
