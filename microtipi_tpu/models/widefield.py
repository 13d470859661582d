"""Wide-field fluorescence microscope PSF model (scalar, monochromatic).

TPU-native rebuild of the reference's ``epifluorescence/WideFieldModel.java``:
the pupil function ``A(z) = rho * exp(i (phi + 2*pi*z*dz * psi))`` is built for
all z planes at once and pushed through one batched 2D FFT; the PSF is
``|FFT2(A(z))|^2 / (Nx*Ny*Nz)`` (``WideFieldModel.java:60-78,202-203,241-255``).

What collapses relative to the reference:

- the four precision/parallel code paths (single/double x thread-pool/serial,
  ``WideFieldModel.java:209-393``) become one pure function with a dtype
  argument — the z fan-out is a batched FFT instead of an ExecutorService;
- the ~940 lines of hand-written adjoints (``apply_J_modulus/phase/defocus``,
  ``:429-1369``) are replaced by ``jax.grad`` through this forward synthesis
  (the analytic forms survive only as oracles in the test-suite);
- the ``PState`` recompute-guard and ``freeMem`` (``:1969-1974``) vanish —
  purity plus jit make caching the compiler's job.

The stored-conjugate trick (``:254``: ``cpxPsf`` holds conj(FFT(A)) for reuse
in the adjoints) is likewise unnecessary: XLA keeps FFT(A) as an autodiff
residual automatically.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from microtipi_tpu.ops.pupil import (
    defocus_psi,
    geometric_mask,
    synthesize_modulus,
    synthesize_phase,
)
from microtipi_tpu.ops.zernike import orthonormalize, zernike_basis
from microtipi_tpu.utils.grids import wrapped_z

__all__ = ["WideFieldParams", "WideFieldConfig"]


class WideFieldParams(NamedTuple):
    """Optimizable PSF parameters, one field per family.

    ``defocus = (ni/lambda, delta_x, delta_y)`` (``WideFieldModel.java:1516-1531``),
    ``phase`` are the Zernike phase coefficients alpha, ``modulus`` the Zernike
    modulus coefficients beta. This pytree replaces the reference's
    identity-dispatched ``parameterSpace[]/parameterCoefs[]`` arrays
    (``MicroscopeModel.java:53-54``).
    """

    defocus: jax.Array
    phase: jax.Array
    modulus: jax.Array


@dataclasses.dataclass(frozen=True)
class WideFieldConfig:
    """Static geometry/physics of the widefield PSF model.

    Mirrors the reference constructor
    ``WideFieldModel(psfShape, nPhase, nModulus, NA, lambda, ni, dxy, dz,
    radial, single)`` (``WideFieldModel.java:154-188``): ``shape`` is
    ``(Nz, Ny, Nx)`` with ``Nx == Ny`` enforced, ``radius = NA/lambda``, the
    Zernike mode count is ``max(n_phase + offset, n_modulus)`` with offset
    1 (radial) / 3 (full) (``:1899-1955``), and the basis is L2-normalized
    then Gram-Schmidt orthonormalized (``:194-197``).
    """

    shape: tuple[int, int, int]  # (Nz, Ny, Nx)
    na: float
    wavelength: float  # emission wavelength in m
    ni: float  # refractive index of the immersion medium
    dxy: float  # lateral pixel size in m
    dz: float  # axial step in m
    n_phase: int = 0
    n_modulus: int = 1
    radial: bool = False
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        nz, ny, nx = self.shape
        if nx != ny:
            raise ValueError("Nx should equal Ny")  # WideFieldModel.java:158-160
        if self.n_modulus < 1:
            object.__setattr__(self, "n_modulus", 1)  # WideFieldModel.java:177-179

    # ---- derived static quantities -------------------------------------

    @property
    def radius(self) -> float:
        """Pupil radius NA/lambda in 1/m (``WideFieldModel.java:165``)."""
        return self.na / self.wavelength

    @property
    def phase_offset(self) -> int:
        return 1 if self.radial else 3

    @property
    def n_zern(self) -> int:
        """``max(nPhase + offset, nModulus)``, min 4 like the reference default
        Nzern (``WideFieldModel.java:163,1902-1906``) is not forced — only the
        modes actually addressed are built, plus the phase offset."""
        n = self.n_modulus
        if self.n_phase > 0:
            n = max(self.n_phase + self.phase_offset, self.n_modulus)
        return n

    @property
    def cdtype(self) -> jnp.dtype:
        return jnp.complex128 if self.dtype == jnp.float64 else jnp.complex64

    def _static(self):
        """Cached (zernike stack, geometric mask, wrapped z).

        Kept as NumPy float64 on the host — caching device/traced arrays on
        the instance would leak tracers across jit boundaries; NumPy constants
        embed safely into any trace. Cast to ``self.dtype`` at use sites.
        """
        cached = getattr(self, "_static_cache", None)
        if cached is not None:
            return cached
        nz, ny, nx = self.shape
        radius_px = self.radius * self.dxy * nx  # WideFieldModel.java:195
        z = zernike_basis(self.n_zern, ny, nx, radius_px, normalize=True, radial=self.radial)
        z = orthonormalize(z)
        mask = geometric_mask(ny, nx, self.radius, self.dxy)
        zw = wrapped_z(nz)
        np_dtype = np.float64 if self.dtype == jnp.float64 else np.float32
        out = (z.astype(np_dtype), mask.astype(np_dtype), zw.astype(np_dtype))
        object.__setattr__(self, "_static_cache", out)
        return out

    # ---- params ---------------------------------------------------------

    def init_params(self) -> WideFieldParams:
        """Canonical initial parameters: in-focus unaberrated pupil.

        defocus = (ni/lambda, 0, 0) (``WideFieldModel.java:1562-1564``),
        phase = 0 (``:1908``), modulus = [1, 0, ..., 0] (``:1957-1958``).
        """
        defocus = jnp.array([self.ni / self.wavelength, 0.0, 0.0], self.dtype)
        phase = jnp.zeros((self.n_phase,), self.dtype)
        modulus = jnp.zeros((self.n_modulus,), self.dtype).at[0].set(1.0)
        return WideFieldParams(defocus, phase, modulus)

    # ---- forward synthesis ----------------------------------------------

    def compute_pupil(self, params: WideFieldParams):
        """(rho, phi, psi, mask) on the wrapped pupil grid."""
        zern, geom, _ = self._static()
        nz, ny, nx = self.shape
        psi, mask = defocus_psi(params.defocus, ny, nx, self.dxy, geom)
        rho = synthesize_modulus(params.modulus, zern, mask)
        phi = synthesize_phase(params.phase, zern, mask, self.radial)
        return rho, phi, psi, mask

    def compute_pupil_field(self, params: WideFieldParams) -> jax.Array:
        """Complex pupil field A(z), shape (Nz, Ny, Nx).

        ``A(z) = rho * exp(i (phi + 2*pi*z_wrapped*dz * psi))`` with the
        negative-frequency z fold (``WideFieldModel.java:232-246``).
        """
        rho, phi, psi, _ = self.compute_pupil(params)
        return self._field_from_pupil(rho, phi, psi)

    def _field_from_pupil(self, rho, phi, psi) -> jax.Array:
        _, _, zw = self._static()
        defoc_scale = (2.0 * np.pi * self.dz) * jnp.asarray(zw, self.dtype)
        phase = phi[None] + defoc_scale[:, None, None] * psi[None]
        return (rho[None] * jnp.exp(1j * phase.astype(self.cdtype))).astype(self.cdtype)

    def compute_psf_from_pupil(
        self, phi: jax.Array, rho: jax.Array | None = None, defocus=None
    ) -> jax.Array:
        """PSF from EXPLICIT pupil-plane maps, bypassing the Zernike
        parameterization (nonparametric phase retrieval,
        ``jobs/phase_retrieval.py``; beyond parity — the reference's pupil
        is always the low-order expansion, ``WideFieldModel.java:1588-1665``).

        ``phi``/``rho`` are (Ny, Nx) maps; both are masked by the full pupil
        support (geometric & non-evanescent) internally, so values outside
        the support are inert and carry zero gradient. ``rho`` None = the
        nominal flat modulus (the parametric init [1, 0, ...]); ``defocus``
        None = the nominal ``(ni/lambda, 0, 0)``.
        """
        zern, geom, _ = self._static()
        nz, ny, nx = self.shape
        d = (jnp.asarray(defocus, self.dtype) if defocus is not None
             else self.init_params().defocus)
        psi, mask = defocus_psi(d, ny, nx, self.dxy, geom)
        if rho is None:
            rho = synthesize_modulus(self.init_params().modulus, zern, mask)
        else:
            rho = jnp.asarray(rho, self.dtype) * mask
        phi = jnp.asarray(phi, self.dtype) * mask
        a_hat = jnp.fft.fft2(self._field_from_pupil(rho, phi, psi))
        norm = jnp.asarray(1.0 / (nx * ny * nz), self.dtype)
        return ((jnp.real(a_hat) ** 2 + jnp.imag(a_hat) ** 2) * norm).astype(self.dtype)

    def compute_psf_and_field(self, params: WideFieldParams):
        """(psf, FFT2(A)) — the latter is the reference's ``cpxPsf`` modulo the
        stored conjugation (``WideFieldModel.java:251-255``)."""
        nz, ny, nx = self.shape
        a = self.compute_pupil_field(params)
        a_hat = jnp.fft.fft2(a)  # unnormalized forward, JTransforms convention
        norm = jnp.asarray(1.0 / (nx * ny * nz), self.dtype)
        psf = (jnp.real(a_hat) ** 2 + jnp.imag(a_hat) ** 2) * norm
        return psf.astype(self.dtype), a_hat

    def compute_psf(self, params: WideFieldParams) -> jax.Array:
        """3D PSF, corner-origin (FFT layout), shape (Nz, Ny, Nx).

        ``h(z) = |FFT2(A(z))|^2 / (Nx*Ny*Nz)`` (``WideFieldModel.java:202-203,
        213,251-255``). Use ``microtipi_tpu.utils.arrays.roll`` for the
        centered layout (the reference rolls before handing the PSF to the
        deconvolver, ``BlindDeconvJob.java:100``).
        """
        return self.compute_psf_and_field(params)[0]

    def compute_mtf(self, params: WideFieldParams) -> jax.Array:
        """3D FFT of the PSF. The reference's ``getMtf`` is broken (loop never
        increments, ``WideFieldModel.java:1814,1822``); this is what it was
        meant to compute."""
        from microtipi_tpu.ops.convolution import auto_exact_fft

        if auto_exact_fft():
            from microtipi_tpu.ops import exactfft

            return exactfft.fftn(self.compute_psf(params).astype(self.cdtype))
        return jnp.fft.fftn(self.compute_psf(params).astype(self.cdtype))
