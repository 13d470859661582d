"""Pupil-plane quantities: support mask, defocus function, modulus/phase synthesis.

Reference semantics being reproduced (all in ``epifluorescence/WideFieldModel.java``):

- geometric pupil support: ``kx^2 + ky^2 < (NA/lambda)^2`` on the wrapped
  frequency grid (``computeMaskPupil``, ``:1374-1406``);
- defocus function ``psi = sqrt((ni/lambda)^2 - (kx-dx)^2 - (ky-dy)^2)`` with
  the evanescent cutoff removing pixels where the radicand is negative
  (``computeDefocus``, ``:1452-1499``);
- pupil modulus ``rho = sum_k beta_k Z_k / ||beta||`` — the coefficient vector
  is L2-normalized *inside* the model (``setModulus``, ``:1588-1610``), so the
  normalization is part of the differentiated graph and gradients w.r.t. beta
  include the projection term;
- pupil phase ``phi = sum_k alpha_k Z_(k+off)`` with offset 1 (radial basis)
  or 3 (full basis) — the phase never uses piston/tip/tilt
  (``setPhase``, ``:1625-1649``).

Everything here is traced JAX code: the defocus parameters are optimization
variables. The evanescent mask is wrapped in ``stop_gradient`` — the reference
treats the support as constant w.r.t. the defocus parameters in its analytic
Jacobian (``apply_J_defocus``, ``:1029-1369``), and differentiating through a
support boundary is meaningless anyway.

Design note (deliberate divergence): the reference applies whichever mask is
current when ``setModulus``/``setPhase`` happen to be called, so rho/phi can
be stale w.r.t. a later defocus change (mutable-state artifact). Here rho/phi
are always masked by the up-to-date full mask (geometric & non-evanescent) —
the purely functional semantics, identical to the reference whenever
``ni/lambda >= NA/lambda`` and the pupil shift is small (the physical regime).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from microtipi_tpu.utils.grids import fft_index

__all__ = [
    "geometric_mask",
    "defocus_psi",
    "synthesize_modulus",
    "synthesize_phase",
]


def geometric_mask(ny: int, nx: int, radius: float, dxy: float) -> np.ndarray:
    """Static pupil support: frequencies strictly inside NA/lambda.

    ``radius`` is NA/lambda in 1/m; grid spacing is ``1/(N*dxy)``
    (``WideFieldModel.java:1378-1391``). Returns a float64 0/1 array (float
    rather than bool so it can be multiplied straight into traced math).
    """
    kx = fft_index(nx) / (nx * dxy)
    ky = fft_index(ny) / (ny * dxy)
    r2 = kx[None, :] ** 2 + ky[:, None] ** 2
    return (r2 < radius * radius).astype(np.float64)


def defocus_psi(
    defocus: jax.Array,
    ny: int,
    nx: int,
    dxy: float,
    geom_mask: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Defocus function and full pupil mask from defocus parameters.

    ``defocus = (ni/lambda, delta_x, delta_y)`` — always length 3 internally;
    sub-family selection (1- or 2-parameter fits) is handled by the caller
    freezing components. Returns ``(psi, mask)`` where ``psi`` is zero at
    evanescent pixels and ``mask = geom_mask & (radicand > 0)``
    (``WideFieldModel.java:1452-1499``).

    The mask carries no gradient (stop_gradient); ``psi``'s gradient w.r.t.
    the parameters matches the reference's analytic ``z/psi`` chain factors
    where the radicand is positive.
    """
    dtype = defocus.dtype
    lambda_ni, delta_x, delta_y = defocus[0], defocus[1], defocus[2]
    kx = jnp.asarray(fft_index(nx) / (nx * dxy), dtype)
    ky = jnp.asarray(fft_index(ny) / (ny * dxy), dtype)
    rx2 = (kx[None, :] - delta_x) ** 2
    ry2 = (ky[:, None] - delta_y) ** 2
    q = lambda_ni * lambda_ni - rx2 - ry2
    valid = jax.lax.stop_gradient(q > 0)
    mask = jnp.asarray(geom_mask, dtype) * valid.astype(dtype)
    # Safe sqrt: clamp the radicand away from 0 before sqrt so the gradient is
    # finite, then zero out the evanescent region.
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    psi = jnp.sqrt(jnp.maximum(q, tiny)) * valid.astype(dtype)
    return psi, mask


def synthesize_modulus(beta: jax.Array, zernike: jax.Array, mask: jax.Array) -> jax.Array:
    """Pupil modulus ``rho = (sum_k beta_k Z_k) / ||beta||`` on the support.

    The L2 normalization of ``beta`` is inside the graph
    (``WideFieldModel.java:1595-1608``); ``jax.grad`` through it yields the
    exact projection gradient (the reference's hand-written Jacobian at
    ``:487-491`` keeps only the diagonal term of that projection — the exact
    gradient is used here deliberately; they coincide at the canonical init
    beta = [1, 0, ..., 0]).
    """
    k = beta.shape[0]
    beta_n = beta / jnp.linalg.norm(beta)
    rho = jnp.tensordot(beta_n, zernike[:k], axes=1)
    return rho * mask


def synthesize_phase(
    alpha: jax.Array, zernike: jax.Array, mask: jax.Array, radial: bool
) -> jax.Array:
    """Pupil phase ``phi = sum_k alpha_k Z_(k+off)`` on the support.

    Offset 1 for the radial basis (skip piston), 3 for the full basis (skip
    piston/tip/tilt) — ``WideFieldModel.java:1640-1644``. ``alpha`` may have
    zero length (no phase aberration), in which case phi = 0.
    """
    offset = 1 if radial else 3
    k = alpha.shape[0]
    if k == 0:
        return jnp.zeros(mask.shape, dtype=alpha.dtype)
    phi = jnp.tensordot(alpha, zernike[offset : offset + k], axes=1)
    return phi * mask
