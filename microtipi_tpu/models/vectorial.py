"""Vectorial (Richards-Wolf) high-NA widefield PSF model.

Beyond-parity family: the reference's scalar pupil model
(``epifluorescence/WideFieldModel.java:60-78``) ignores polarization, which
is a real error at the NA ~ 1.4 oil objectives its own defaults describe.
This model computes the full vectorial emission PSF of randomly oriented
fluorophore dipoles through the standard Debye/Richards-Wolf formalism
(Richards & Wolf 1959; Axelrod 2012; Backer & Moerner 2014, J Phys Chem B):

    h(z) = sum_{p in {x,y}} sum_{d in {x,y,z}} | FFT2( g_pd(k) a(k) A(k,z) ) |^2

where ``A(k, z) = rho * exp(i (phi + 2*pi*z*dz*psi))`` is the same aberrated
scalar pupil as the widefield model (all three parameter families act
unchanged), ``a = 1/sqrt(cos theta)`` is the aplanatic collection
apodization, and the six Green's-tensor pupil factors for a dipole ``d``
imaged onto polarization ``p`` are

    g_xx = cos(t) cos^2(f) + sin^2(f)      g_yx = (cos(t) - 1) sin(f) cos(f)
    g_xy = g_yx                            g_yy = cos(t) sin^2(f) + cos^2(f)
    g_xz = sin(t) cos(f)                   g_yz = sin(t) sin(f)

with ``sin(t) = |k| * lambda / ni`` (so ``cos(t) = psi / (ni/lambda)`` — the
defocus function *is* the axial frequency) and ``f`` the pupil azimuth.

In the paraxial limit cos(t) -> 1 the cross terms vanish, g_xx = g_yy = 1,
and h reduces exactly to the scalar widefield PSF — tested. Six batched FFTs
per plane instead of one; everything stays differentiable, so PSF fitting
and blind deconvolution work through the PsfModel protocol unchanged.

The PSF is normalized to unit sum in-graph (the six-component sum has no
reference normalization convention to preserve).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from microtipi_tpu.models.widefield import WideFieldConfig, WideFieldParams
from microtipi_tpu.utils.grids import fft_index

__all__ = ["VectorialConfig"]


@dataclasses.dataclass(frozen=True)
class VectorialConfig(WideFieldConfig):
    """Widefield geometry + vectorial image formation. Same parameter
    families (defocus / phase / modulus) as the scalar model."""

    def _vector_factors(self) -> np.ndarray:
        """(6, Ny, Nx) Green's-tensor pupil factors times the aplanatic
        apodization, host NumPy (static geometry; angles come from the
        *nominal* ni/lambda — the fitted defocus family perturbs psi in the
        exponent, not the collection geometry)."""
        cached = getattr(self, "_vector_cache", None)
        if cached is not None:
            return cached
        _, ny, nx = self.shape
        kx = fft_index(nx) / (nx * self.dxy)
        ky = fft_index(ny) / (ny * self.dxy)
        kxx, kyy = kx[None, :], ky[:, None]
        kr = np.sqrt(kxx**2 + kyy**2)
        lam_ni = self.ni / self.wavelength
        sin_t = np.minimum(kr / lam_ni, 1.0)
        cos_t = np.sqrt(np.maximum(1.0 - sin_t**2, 0.0))
        # azimuth; the on-axis pixel is angle-degenerate but sin/cos stay finite
        cos_f = np.where(kr > 0, kxx / np.maximum(kr, 1e-300), 1.0)
        sin_f = np.where(kr > 0, kyy / np.maximum(kr, 1e-300), 0.0)
        g = np.stack([
            cos_t * cos_f**2 + sin_f**2,        # g_xx
            (cos_t - 1.0) * sin_f * cos_f,      # g_xy = g_yx
            sin_t * cos_f,                      # g_xz
            (cos_t - 1.0) * sin_f * cos_f,      # g_yx
            cos_t * sin_f**2 + cos_f**2,        # g_yy
            sin_t * sin_f,                      # g_yz
        ])
        # aplanatic (Abbe sine) collection apodization 1/sqrt(cos t); the
        # evanescent rim (cos t = 0) sits outside the NA support anyway —
        # clamp so the static factor is finite everywhere.
        apod = 1.0 / np.sqrt(np.maximum(cos_t, 1e-3))
        cached = (g * apod[None]).astype(np.float64)
        object.__setattr__(self, "_vector_cache", cached)
        return cached

    def compute_psf(self, params: WideFieldParams) -> jax.Array:
        """Unit-sum vectorial PSF, corner-origin (Nz, Ny, Nx)."""
        a = self.compute_pupil_field(params)  # (Nz, Ny, Nx) complex
        g = jnp.asarray(self._vector_factors(), self.dtype)  # (6, Ny, Nx)
        fields = jnp.fft.fft2(g[:, None] * a[None])  # (6, Nz, Ny, Nx)
        h = jnp.sum(jnp.real(fields) ** 2 + jnp.imag(fields) ** 2, axis=0)
        h = h.astype(self.dtype)
        return h / jnp.sum(h)
