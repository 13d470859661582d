"""Mesh-sharded deconvolution and blind-deconvolution steps.

The BASELINE.json config-5 path: batched time-lapse / multi-channel stacks
whose volumes exceed one chip's appetite, laid out on a (batch, z) mesh
(``parallel.mesh``). Division of labor:

- the FFT convolution is the only op XLA cannot shard well on its own — it
  goes through the explicit transpose-based distributed FFT
  (``parallel.fft``, two all-to-alls per convolution over ICI);
- everything else (residual, weights, hyperbolic TV with its z-halo
  exchanges, all VMLMB vector algebra) is written on *global* sharded arrays
  and left to the GSPMD partitioner — it inserts the cheap collectives
  (halo ``collective-permute`` for the TV's z-differences, tree ``psum`` for
  the dot products) where needed;
- the VMLMB state (L-BFGS memory pytrees) inherits the object's sharding, so
  solver memory also scales with the mesh.

The same PSF is shared across the batch (time-lapse frames see one optical
system), matching the reference's single-pupil model.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from microtipi_tpu.jobs.deconv import DeconvolutionConfig, DeconvolutionResult
from microtipi_tpu.ops.regularization import hyperbolic_tv
from microtipi_tpu.optim.vmlmb import minimize_vmlmb
from microtipi_tpu.parallel.fft import (
    sharded_convolve,
    sharded_irfftn,
    sharded_rfftn,
    sharded_spectrum,
)
from microtipi_tpu.parallel.mesh import volume_sharding

__all__ = ["make_sharded_objective", "sharded_deconvolve"]


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _sharded_quadratic_cost(x, kernel_sq, b, c, vol_shape, mesh):
    """Distributed analogue of ops.convolution._quadratic_cost: cost and
    gradient of the uniform-weight data term from ONE distributed FFT pair.
    Only ``x`` carries a gradient (kernel/b/c are per-round constants)."""
    y = sharded_rfftn(x, mesh)
    ax = sharded_irfftn(y * kernel_sq, vol_shape, mesh)
    return (0.5 * jnp.vdot(x, ax) - jnp.vdot(x, b) + c).real.astype(x.dtype)


def _sq_fwd(x, kernel_sq, b, c, vol_shape, mesh):
    y = sharded_rfftn(x, mesh)
    ax = sharded_irfftn(y * kernel_sq, vol_shape, mesh)
    f = (0.5 * jnp.vdot(x, ax) - jnp.vdot(x, b) + c).real.astype(x.dtype)
    return f, ax - b


def _sq_bwd(vol_shape, mesh, res, g):
    return (g * res, None, None, None)


_sharded_quadratic_cost.defvjp(_sq_fwd, _sq_bwd)


def make_sharded_objective(
    psf: jax.Array,
    data: jax.Array,
    weights: jax.Array | None,
    config: DeconvolutionConfig,
    mesh: Mesh,
):
    """Fused sharded cost+gradient for the object step.

    ``data`` is (Nz, Ny, Nx) or batched (B, Nz, Ny, Nx), z-sharded; ``psf``
    is one unbatched volume at the data shape (padded-variable mode is a
    single-device feature; keep var_shape == data shape here). Uniform
    weights take the circulant-quadratic fast path (one distributed FFT pair
    per evaluation for cost AND gradient), like the single-device step.
    """
    vol_shape = data.shape[-3:]
    if psf.shape != vol_shape:
        raise ValueError("sharded mode requires psf shape == volume shape")
    k_hat = sharded_spectrum(psf, mesh)
    batched = data.ndim == 4
    tv_axes = (-3, -2, -1)

    if weights is None:
        kernel_sq = jnp.real(k_hat) ** 2 + jnp.imag(k_hat) ** 2
        b = sharded_irfftn(jnp.conj(k_hat) * sharded_rfftn(data, mesh), vol_shape, mesh)
        c = 0.5 * jnp.sum(data * data)

        def data_term(x):
            return _sharded_quadratic_cost(x, kernel_sq, b, c, vol_shape, mesh)

    else:

        def data_term(x):
            r = sharded_convolve(x, k_hat, vol_shape, mesh) - data
            return 0.5 * jnp.sum(weights * r * r)

    def objective(x):
        f = data_term(x)
        if config.mu > 0:
            f = f + config.mu * hyperbolic_tv(
                x, config.epsilon, config.scales, axes=tv_axes if batched else None
            )
        return f

    return jax.value_and_grad(objective)


def sharded_deconvolve(
    data: jax.Array,
    psf: jax.Array,
    mesh: Mesh,
    weights: jax.Array | None = None,
    x0: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
) -> DeconvolutionResult:
    """Object update on the mesh; drop-in sharded analogue of
    ``jobs.deconv.deconvolve`` (no padded-variable mode)."""
    sharding = volume_sharding(mesh, batched=data.ndim == 4)
    data = jax.lax.with_sharding_constraint(data, sharding)
    if x0 is None:
        x0 = jnp.maximum(data, 0.0) if config.positivity else data
    x0 = jax.lax.with_sharding_constraint(x0, sharding)
    fun = make_sharded_objective(psf, data, weights, config, mesh)
    res = minimize_vmlmb(
        fun,
        x0,
        lower=0.0 if config.positivity else None,
        mem=config.mem,
        maxiter=config.max_iter,
        maxeval=config.max_eval,
        gatol=config.gatol,
        grtol=config.grtol,
    )
    return DeconvolutionResult(
        res.x, res.f, res.iterations, res.evaluations, res.status, res.f_history, res.pg_history
    )
