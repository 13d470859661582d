"""Joint time-series deconvolution with a temporal prior (4D solve).

Beyond parity: the reference deconvolves one volume at a time
(``BlindDeconvJob.java:97-138`` holds a single object array); a time-lapse
is T independent solves. But live-cell frames are strongly correlated —
most of the specimen moves slowly between exposures — and a JOINT solve
over the (T, Nz, Ny, Nx) block with an edge-preserving prior along t lets
every frame borrow photons from its neighbors without smearing motion
events (hyperbolic/temporal TV prefers piecewise-constant-in-time
intensity, so step changes — appearance, division, fusion — survive while
uncorrelated noise is averaged down).

    f(x) = sum_t [ 0.5 ||H x_t - d_t||^2_w  +  mu * TV_eps(x_t) ]
           + mu_t * TV_eps_t(x; along t only),      x >= 0

One VMLMB run over the whole 4D array; the data term runs through batched
3D FFTs (leading t axis), so the chip sees the same large batched
transforms as ``jobs.batch`` while the prior couples the lanes. All
``DeconvolutionConfig`` knobs apply per frame (``data_term="poisson"``,
``sparsity``/``hessian``, padded ``var_shape`` is not supported — pad the
input instead).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from microtipi_tpu.jobs.deconv import (
    DeconvolutionConfig,
    DeconvolutionResult,
    has_regularizer,
    regularization_cost,
    resolve_mem_dtype,
)
from microtipi_tpu.ops.convolution import fft_pair, generalized_kl
from microtipi_tpu.ops.regularization import hyperbolic_tv
from microtipi_tpu.optim.vmlmb import minimize_vmlmb
from microtipi_tpu.utils.arrays import pad_fft_kernel

__all__ = ["deconvolve_timeseries", "make_timeseries_objective"]


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _batched_quadratic_cost(x, kernel_sq, g2, b, c, vol, exact=False):
    """Sum over frames of the circulant quadratic data term — the batched
    analogue of ``ops.convolution.QuadraticConvCost`` (one batched FFT pair
    yields cost AND gradient; same harmless-cancellation caveat as the
    object step, see ``jobs.deconv.make_objective``). ``g2`` is a
    (T, 1, 1, 1) per-frame quadratic weight (squared bleaching gains; ones
    when uncorrected) applied OUTSIDE the spectrum product so the kernel
    spectrum is never materialized per frame."""
    _rfftn, _irfftn = fft_pair(exact)
    ax = _irfftn(kernel_sq[None] * _rfftn(x, axes=(1, 2, 3)),
                 s=vol, axes=(1, 2, 3))
    return (0.5 * jnp.vdot(x, g2 * ax) - jnp.vdot(x, b) + c).real.astype(x.dtype)


def _batched_quadratic_fwd(x, kernel_sq, g2, b, c, vol, exact=False):
    _rfftn, _irfftn = fft_pair(exact)
    ax = _irfftn(kernel_sq[None] * _rfftn(x, axes=(1, 2, 3)),
                 s=vol, axes=(1, 2, 3))
    f = (0.5 * jnp.vdot(x, g2 * ax) - jnp.vdot(x, b) + c).real.astype(x.dtype)
    return f, (g2 * ax - b)


def _batched_quadratic_bwd(vol, exact, res, g):
    return (g * res, None, None, None, None)


_batched_quadratic_cost.defvjp(_batched_quadratic_fwd, _batched_quadratic_bwd)


def deconvolve_timeseries(
    data: jax.Array,
    psf: jax.Array,
    weights: jax.Array | None = None,
    x0: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
    *,
    mu_t: float = 0.0,
    epsilon_t: float | None = None,
    bleach: jax.Array | None = None,
) -> DeconvolutionResult:
    """Jointly deconvolve a (T,) + volume stack sharing one PSF.

    ``mu_t`` weighs the temporal hyperbolic TV (0 = decoupled frames — then
    prefer :func:`jobs.batch.batched_deconvolve`, identical math);
    ``epsilon_t`` is the temporal edge threshold in intensity units
    (None = the spatial ``config.epsilon``): intensity changes well above
    it are treated as real motion/events and not smoothed away. Measured
    guidance lives in docs/TUNING.md. ``weights`` may be (T,)+vol or
    per-volume (broadcast over t). Returns per-solve scalars (one joint
    cost) with ``x`` of shape (T,)+vol.

    ``bleach``: per-frame photobleaching gains ``g`` of shape (T,)
    (:func:`~microtipi_tpu.ops.preprocess.estimate_bleach`). The forward
    model becomes ``g_t * (H x_t)`` — the gain lives in the MODEL so the
    recovered frames share one intensity scale while the data keeps its
    measured statistics (dividing the data instead would rescale its noise
    under Gaussian weights and break Poisson counting outright). Without
    it, monotone fading reads as real change to the temporal prior: the
    prior then smears the decay across frames instead of averaging noise.
    """
    fun = make_timeseries_objective(
        psf, data, weights, config, mu_t=mu_t, epsilon_t=epsilon_t,
        bleach=bleach)

    if x0 is None:
        x0 = jnp.asarray(data)
    if config.positivity:
        x0 = jnp.maximum(x0, 0.0)

    res = minimize_vmlmb(
        fun, x0,
        lower=0.0 if config.positivity else None,
        mem=config.mem, maxiter=config.max_iter, maxeval=config.max_eval,
        gatol=config.gatol, grtol=config.grtol,
        mem_dtype=resolve_mem_dtype(config, x0),
    )
    return DeconvolutionResult(
        res.x, res.f, res.iterations, res.evaluations, res.status,
        res.f_history, res.pg_history,
    )


def make_timeseries_objective(
    psf: jax.Array,
    data: jax.Array,
    weights: jax.Array | None,
    config: DeconvolutionConfig,
    *,
    mu_t: float = 0.0,
    epsilon_t: float | None = None,
    bleach: jax.Array | None = None,
    accurate: bool = False,
):
    """Fused value-and-gradient of the joint 4D objective (see
    :func:`deconvolve_timeseries`). The single objective definition shared
    by the VMLMB solver and the ADMM engine
    (:func:`jobs.admm.admm_deconvolve_timeseries`), mirroring
    ``jobs.deconv.make_objective`` — including its ``accurate`` switch
    (residual-form uniform data term for cancellation-free f32 VALUES;
    the ADMM tracker passes True)."""
    data = jnp.asarray(data)
    if data.ndim != 4:
        raise ValueError(f"expected a (T, Nz, Ny, Nx) stack, got {data.shape}")
    if config.var_shape is not None:
        raise ValueError("var_shape is not supported for the joint 4D solve; "
                         "pad the input data instead")
    from microtipi_tpu.jobs.deconv import resolve_exact_fft
    exact = resolve_exact_fft(config)
    _rfftn, _irfftn = fft_pair(exact)

    vol = data.shape[1:]
    kernel = pad_fft_kernel(psf, vol)
    k_hat = _rfftn(kernel)
    axes = (1, 2, 3)
    if weights is not None:
        weights = jnp.asarray(weights)
        if weights.shape == vol:
            weights = weights[None]
    g4 = None
    if bleach is not None:
        bleach = jnp.asarray(bleach, data.dtype)
        if bleach.shape != (data.shape[0],):
            raise ValueError(
                f"bleach must be per-frame gains of shape ({data.shape[0]},), "
                f"got {bleach.shape}")
        g4 = bleach.reshape(-1, 1, 1, 1)

    def model(x):
        hx = _irfftn(k_hat[None] * _rfftn(x, axes=axes),
                     s=vol, axes=axes)
        return hx if g4 is None else g4 * hx

    bg = jnp.asarray(config.background, data.dtype)
    if config.data_term == "poisson":
        if weights is not None:
            raise ValueError("data_term='poisson' does not compose with weights")

        def data_term(x):
            return generalized_kl(model(x) + bg, jnp.maximum(data, 0.0))
    elif config.data_term != "gaussian":
        raise ValueError(f"unknown data_term {config.data_term!r}")
    elif weights is None and accurate:
        # Residual form: same 2 batched FFTs for a VALUE, no eps*c
        # cancellation (the ADMM engines' f_history tracker).
        def data_term(x):
            r = model(x) - data
            return 0.5 * jnp.sum(r * r)
    elif weights is None:
        # Uniform weights: the 2-FFT quadratic fast path, batched over t.
        # With bleach, f = sum_t 0.5||g_t H x_t - d_t||^2 expands to
        # 0.5<x, g^2 K^2 x> - <x, g H^T d> + c — per-frame scalings only.
        kernel_sq = jnp.real(k_hat) ** 2 + jnp.imag(k_hat) ** 2
        g2 = jnp.ones((data.shape[0], 1, 1, 1), data.dtype) if g4 is None \
            else g4 * g4
        b = _irfftn(jnp.conj(k_hat)[None] * _rfftn(data, axes=axes),
                    s=vol, axes=axes)
        if g4 is not None:
            b = g4 * b
        c = 0.5 * jnp.sum(data * data)

        def data_term(x):
            return _batched_quadratic_cost(x, kernel_sq, g2, b, c, vol, exact)
    else:
        # Zero weight EXCLUDES the voxel whatever its value (0*NaN = NaN
        # would defeat the validity mask — WeightedConvolutionCost.build
        # invariant, shared by every weighted path).
        data = jnp.where(weights > 0, data, 0.0)

        def data_term(x):
            r = model(x) - data
            return 0.5 * jnp.sum(weights * r * r)

    eps_t = config.epsilon if epsilon_t is None else epsilon_t

    def objective(x):
        f = data_term(x)
        if has_regularizer(config):
            f = f + regularization_cost(x, config, axes=(-3, -2, -1))
        if mu_t > 0:
            f = f + mu_t * hyperbolic_tv(x, eps_t, axes=(0,))
        return f

    return jax.value_and_grad(objective)
