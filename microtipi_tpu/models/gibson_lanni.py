"""Gibson-Lanni-style depth-aberrated widefield PSF model.

BASELINE.json config 2 calls for "Gibson-Lanni-style" PSFs: the classic
stratified-medium model (Gibson & Lanni 1991) where imaging at depth ``d``
inside a sample of refractive index ``ns`` under immersion index ``ni`` adds a
depth-proportional spherical aberration to the pupil phase. In the scalar
pupil formalism this is one extra optical-path term:

    OPD(k; z) = z * psi_i(k) + d * (psi_s(k) - psi_i(k)),
    psi_m(k)  = sqrt((n_m / lambda)^2 - |k|^2)

so ``A(z) = rho * exp(i (phi + 2*pi*OPD))`` — at ``d = 0`` it reduces exactly
to the widefield model (``models/widefield.py``). The reference models only
the matched case; this extends the family the way its ecosystem (DEMICS /
Icy plugins) uses GL-style PSFs, while staying fully differentiable: the
sample index and depth are a fourth fittable parameter family (DEPTH).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from microtipi_tpu.models.microscope import DEPTH
from microtipi_tpu.models.widefield import WideFieldConfig
from microtipi_tpu.utils.grids import fft_index

__all__ = ["GibsonLanniParams", "GibsonLanniConfig", "DEPTH"]


class GibsonLanniParams(NamedTuple):
    defocus: jax.Array  # (ni/lambda, delta_x, delta_y)
    phase: jax.Array
    modulus: jax.Array
    depth: jax.Array  # (ns/lambda, d) — sample index over wavelength, depth in m


@dataclasses.dataclass(frozen=True)
class GibsonLanniConfig(WideFieldConfig):
    """Widefield config + sample medium (ns) and nominal imaging depth."""

    ns: float = 1.38  # sample refractive index (typical fixed tissue)
    depth: float = 0.0  # imaging depth in m; 0 reduces to WideFieldConfig

    def init_params(self) -> GibsonLanniParams:
        base = super().init_params()
        depth = jnp.array([self.ns / self.wavelength, self.depth], self.dtype)
        return GibsonLanniParams(base.defocus, base.phase, base.modulus, depth)

    def _psi_sample(self, lambda_ns: jax.Array) -> jax.Array:
        """Defocus function in the sample medium (no pupil-shift term —
        the tilt lives in the immersion psi already)."""
        nz, ny, nx = self.shape
        kx = jnp.asarray(fft_index(nx) / (nx * self.dxy), self.dtype)
        ky = jnp.asarray(fft_index(ny) / (ny * self.dxy), self.dtype)
        q = lambda_ns * lambda_ns - kx[None, :] ** 2 - ky[:, None] ** 2
        valid = jax.lax.stop_gradient(q > 0)
        tiny = jnp.asarray(np.finfo(np.float32).tiny, self.dtype)
        return jnp.sqrt(jnp.maximum(q, tiny)) * valid.astype(self.dtype)

    def compute_pupil_field(self, params: GibsonLanniParams) -> jax.Array:
        rho, phi, psi_i, mask = self.compute_pupil(params)
        _, _, zw = self._static()
        lambda_ns, d = params.depth[0], params.depth[1]
        psi_s = self._psi_sample(lambda_ns) * mask
        defoc = (2.0 * np.pi * self.dz) * jnp.asarray(zw, self.dtype)  # (Nz,)
        opd = defoc[:, None, None] * psi_i[None] + (2.0 * np.pi) * d * (psi_s - psi_i)[None]
        phase = phi[None] + opd
        return (rho[None] * jnp.exp(1j * phase.astype(self.cdtype))).astype(self.cdtype)
