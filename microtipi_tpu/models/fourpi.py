"""4Pi interferometric PSF model (two opposed objectives, coherent arms).

Beyond-parity model family: a 4Pi microscope (Hell & Stelzer 1992; the
Leica 4Pi / I5M class) illuminates and/or detects the focus COHERENTLY
through two opposed objectives. The counter-propagating fields interfere,
producing axial fringes of period ~lambda/(2 ni) under the single-lens
envelope — a 4-7x axial resolution gain paid for with strong axial
sidelobes that make raw 4Pi images unusable WITHOUT deconvolution: this is
the instrument class for which the deconvolution step is not optional,
which is why the family belongs in this framework.

Model (scalar, shared aberrated pupil — parity semantics of the pupil
synthesis per ``epifluorescence/WideFieldModel.java:60-78``): the upper
objective contributes the usual defocused field ``E+(z) = FFT2(A(+z))``;
the lower objective focuses from the other side, so its field at the same
object plane carries the OPPOSITE defocus, ``E-(z) = FFT2(A(-z))`` — i.e.
the same pupil with ``psi -> -psi``. The interferometric intensity is

    I(z) = | E+(z) + exp(i phi_c) E-(z) |^2

with ``phi_c`` the cavity (arm path-difference) phase — the critical
alignment knob of a real 4Pi instrument and therefore a FITTABLE family
(``CAVITY``): ``phi_c = 0`` puts the bright fringe at focus, ``pi`` makes
focus a dark fringe. Both arms share the pupil aberrations (the standard
modeling assumption; arm-asymmetric aberrations are absorbed into phi_c
to first order).

Cavity-phase gauge (measured, tests): ``I(-z; phi) = I(z; -phi)`` (since
``E-(z) = E+(-z)``), and an axial shift by ``delta`` maps ``phi_c ->
phi_c - 4 pi ni delta / lambda`` to first order — so a bead calibration
recovers phi_c only within the fringe the bead centering's integer-z
snap leaves it in (a +-0.7 rad truth centered across a 40 nm plane came
back as -0.61). This is the familiar axial gauge (Z4 / sheet z0): keep
``|phi_c| * lambda/(4 pi ni)`` under half a z-step for absolute reads,
or report phi_c modulo the fringe — either way the PSF handed to
deconvolution is correct, a z-shifted reconstruction being the same
reconstruction.

Types (standard taxonomy):

- **"A"** — coherent EXCITATION interference, confocal single-lens
  detection (pinhole inherited from ``ConfocalConfig``):
  ``h = I_exc * (h_det (*) pinhole)``.
- **"C"** — interference on BOTH arms:
  ``h = I_exc * (I_det (*) pinhole)`` — the sharpest variant (I5M/4Pi-C).
  The same ``phi_c`` is applied to both cavities (one-knob approximation;
  independent arm phases differ by a fixed instrument constant absorbed
  into the pupil phase).

The composite is unit-sum normalized in-graph (same stance as the other
composed families — there is no reference normalization to preserve).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from microtipi_tpu.models.confocal import ConfocalConfig, _scaled_params
from microtipi_tpu.models.widefield import WideFieldConfig, WideFieldParams

__all__ = ["FourPiConfig", "FourPiParams"]


class FourPiParams(NamedTuple):
    """Widefield families plus the 4Pi cavity family.

    ``cavity = (phi_c,)``: the interferometric arm phase difference in
    radians (0 = constructive at focus).
    """

    defocus: jax.Array
    phase: jax.Array
    modulus: jax.Array
    cavity: jax.Array


@dataclasses.dataclass(frozen=True)
class FourPiConfig(ConfocalConfig):
    """4Pi microscope PSF. ``fourpi_type``: "A" (excitation interference x
    confocal detection) or "C" (interference on both arms).
    ``cavity_phase``: initial phi_c [rad]."""

    fourpi_type: str = "A"
    cavity_phase: float = 0.0

    def __post_init__(self):
        super().__post_init__()
        if self.fourpi_type not in ("A", "C"):
            raise ValueError(f"fourpi_type must be 'A' or 'C', got {self.fourpi_type!r}")

    def init_params(self) -> FourPiParams:
        base = WideFieldConfig.init_params(self)
        return FourPiParams(*base, jnp.asarray([self.cavity_phase], self.dtype))

    def _interference_intensity(self, config, params: WideFieldParams,
                                phi_c: jax.Array) -> jax.Array:
        """``|E+ + e^{i phi_c} E-|^2 / (Nx Ny Nz)`` for the given arm's
        widefield config (emission- or excitation-side geometry)."""
        nz, ny, nx = config.shape
        rho, phi, psi, _ = config.compute_pupil(params)
        e_plus = jnp.fft.fft2(config._field_from_pupil(rho, phi, psi))
        e_minus = jnp.fft.fft2(config._field_from_pupil(rho, phi, -psi))
        e = e_plus + jnp.exp(1j * phi_c.astype(config.cdtype)) * e_minus
        norm = jnp.asarray(1.0 / (nx * ny * nz), config.dtype)
        return ((jnp.real(e) ** 2 + jnp.imag(e) ** 2) * norm).astype(config.dtype)

    def compute_psf(self, params: FourPiParams) -> jax.Array:
        """4Pi PSF, unit sum, corner-origin (Nz, Ny, Nx)."""
        nz, ny, nx = self.shape
        det = WideFieldParams(params.defocus, params.phase, params.modulus)
        phi_c = params.cavity[0]
        ratio = self.wavelength / self._lambda_exc
        exc_cfg = self._exc_config()
        i_exc = self._interference_intensity(
            exc_cfg, _scaled_params(det, ratio), phi_c)
        if self.fourpi_type == "C":
            h_det = self._interference_intensity(self, det, phi_c)
        else:
            h_det = WideFieldConfig.compute_psf(self, det)
        otf_p = self._pinhole_otf()
        if otf_p is not None:
            spec = jnp.fft.rfft2(h_det) * jnp.asarray(otf_p, self.cdtype)
            h_det = jnp.fft.irfft2(spec, s=(ny, nx)).astype(self.dtype)
        h = i_exc * h_det
        return h / jnp.sum(h)
