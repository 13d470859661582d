"""Automatic regularization selection for the object step.

The reference leaves the regularization weight entirely to the caller: TiPi's
``DeconvolutionJob`` takes mu as a constructor input and microTiPi never sets
or adapts it (``BlindDeconvJob.java:80-88`` just forwards the configured
deconvolver). In production that is the single knob every run hand-tunes.
Beyond parity, this module picks mu by the Morozov discrepancy principle:
choose mu such that the residual of the regularized solution matches its
statistical expectation,

    Gaussian:  sum_i w_i (H x_mu - d)_i^2  =  tau * N_eff,
               (w = 1/sigma^2; unweighted form  sum r^2 = tau * N * sigma^2)
    Poisson:   2 * KL(d, H x_mu + b)       =  tau * N,
               (the deviance is asymptotically chi-squared with N dof)

The discrepancy D(mu) is monotone nondecreasing in mu (more regularization
=> larger residual), so K geometric-bisection steps on a bracket [lo, hi]
pin mu to a factor (hi/lo)^(2^-K). The whole search is ONE jitted program —
a ``lax.fori_loop`` whose body runs a warm-started VMLMB solve
(``jobs/deconv.py`` machinery with mu as a *traced* scalar, so the K probes
share a single compilation) — followed by a full-length solve at the
selected mu.

When the noise level is unknown, :func:`estimate_noise_sigma` recovers the
Gaussian sigma from the data itself (Immerkaer 1996 3x3 Laplacian, made
robust with the median absolute deviation so real structure does not bias
it), per z-plane on volumes.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from microtipi_tpu.jobs.deconv import (
    DeconvolutionConfig,
    DeconvolutionResult,
    make_regularizer,
    resolve_mem_dtype,
)
from microtipi_tpu.ops.convolution import (
    PoissonConvCost,
    QuadraticConvCost,
    WeightedConvolutionCost,
)
from microtipi_tpu.optim.vmlmb import minimize_vmlmb
from microtipi_tpu.utils.arrays import pad_fft_kernel, pad_to_shape

__all__ = ["AutoMuResult", "deconvolve_auto_mu", "estimate_noise_sigma"]


def estimate_noise_sigma(data: jax.Array) -> jax.Array:
    """Estimate the Gaussian noise sigma of an image or stack from the data.

    Immerkaer's 3x3 Laplacian-difference operator L = [[1,-2,1],[-2,4,-2],
    [1,-2,1]] annihilates locally planar structure while passing noise with
    gain ||L||_2 = 6; the classic estimator averages |L*d|. Real images have
    edges, so the robust form is used instead:

        sigma = median(|L * d|) / (0.6745 * 6)

    (0.6745 = the standard normal's third quartile, the usual MAD factor).
    Volumes are treated as stacks of 2D planes — the z-spacing of
    microscopy stacks is typically coarse enough that a 3D Laplacian would
    see structure, not noise. Evaluated on the valid interior only.
    """
    from microtipi_tpu.weights.updaters import laplacian_residuals

    r, _ = laplacian_residuals(data)
    return jnp.median(jnp.abs(r)) / 0.6745


class AutoMuResult(NamedTuple):
    """Outcome of :func:`deconvolve_auto_mu`."""

    mu: jax.Array  #: selected regularization weight
    sigma: jax.Array  #: noise sigma used for the target (nan if weighted/poisson)
    target: jax.Array  #: the discrepancy target tau * N_eff(*sigma^2)
    discrepancy: jax.Array  #: D(mu) of the returned solution (compare to target)
    mu_history: jax.Array  #: (steps,) probed mus
    discrepancy_history: jax.Array  #: (steps,) their discrepancies
    result: DeconvolutionResult  #: full-length solve at the selected mu


def _build_data_cost(psf, data, weights, config: DeconvolutionConfig):
    """The pure data-fidelity term (no TV), same dispatch as
    ``deconv.make_objective``."""
    var_shape = tuple(config.var_shape) if config.var_shape is not None else data.shape
    kernel = pad_fft_kernel(psf, var_shape)
    if config.data_term == "poisson":
        if weights is not None:
            raise ValueError("data_term='poisson' does not compose with weights")
        return PoissonConvCost.build(kernel, data, config.background, var_shape), var_shape
    if config.data_term != "gaussian":
        raise ValueError(f"unknown data_term {config.data_term!r}")
    if weights is None and var_shape == data.shape:
        return QuadraticConvCost.build(kernel, data), var_shape
    return WeightedConvolutionCost.build(kernel, data, weights, var_shape), var_shape


def deconvolve_auto_mu(
    data: jax.Array,
    psf: jax.Array,
    weights: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
    *,
    sigma: float | jax.Array | None = None,
    tau: float = 1.0,
    bracket: tuple[float, float] = (1e-7, 1e3),
    steps: int = 12,
    search_max_iter: int | None = None,
    init: str = "data",
) -> AutoMuResult:
    """Deconvolve with mu selected by the discrepancy principle.

    Parameters beyond :func:`jobs.deconv.deconvolve`:
      sigma: Gaussian noise sigma of the data. None = estimate with
        :func:`estimate_noise_sigma`. Ignored when ``weights`` are given
        (they already whiten: the target is the count of positive weights)
        and for ``data_term='poisson'`` (the KL deviance is self-scaled).
      tau: safety factor on the discrepancy target (Morozov's tau >= 1;
        1.0 = exact chi-squared expectation, slightly larger values
        regularize more and guard against sigma underestimates).
      bracket: geometric search interval for mu. The selected mu is clipped
        to it — widen the bracket if ``mu`` comes back at an endpoint.
      steps: bisection iterations (static; mu resolves to a factor
        (hi/lo)**(2**-steps) of the bracket).
      search_max_iter: VMLMB iterations per probe solve (default: the
        config's ``max_iter``). Probes warm-start from the previous
        solution, which usually keeps mildly truncated probes accurate —
        but an unconverged probe's discrepancy is biased low, and the
        bisection amplifies the error (measured: 20-iter probes on a
        weighted 30-iter problem picked mu a factor 50 small). When in
        doubt leave this at the default.

    ``config.mu`` is ignored. Fully jittable (one program: K probe solves +
    one full solve).
    """
    if steps < 1:
        raise ValueError("steps must be >= 1")
    lo0, hi0 = (float(bracket[0]), float(bracket[1]))
    if not (0.0 < lo0 < hi0):
        raise ValueError(f"bracket must satisfy 0 < lo < hi, got {bracket}")

    cost, var_shape = _build_data_cost(psf, data, weights, config)
    dtype = jnp.asarray(data).dtype

    # Discrepancy D(x) = 2 * data cost, and its statistical target.
    if config.data_term == "poisson":
        sigma_out = jnp.asarray(float("nan"), dtype)
        target = jnp.asarray(tau * data.size, dtype)
    elif weights is not None:
        sigma_out = jnp.asarray(float("nan"), dtype)
        target = tau * jnp.sum(weights > 0).astype(dtype)
    else:
        sig = estimate_noise_sigma(data) if sigma is None else jnp.asarray(sigma, dtype)
        sigma_out = sig.astype(dtype)
        target = tau * data.size * sig.astype(dtype) ** 2

    # mu scales the TV term ONLY; the sparse-deconvolution priors
    # (config.sparsity/hessian) enter every probe at their fixed weights so
    # the selected mu is consistent with the final deconvolve() objective.
    reg1 = make_regularizer(
        dataclasses.replace(config, mu=1.0, sparsity=0.0, hessian=0.0), var_shape
    )
    reg_fixed = make_regularizer(dataclasses.replace(config, mu=0.0), var_shape)
    mem_dtype = resolve_mem_dtype(config, jnp.zeros((), dtype))

    def solve(mu, x0, maxiter):
        fun = jax.value_and_grad(
            lambda x: cost.cost(x) + mu * reg1(x) + reg_fixed(x)
        )
        return minimize_vmlmb(
            fun,
            x0,
            lower=0.0 if config.positivity else None,
            mem=config.mem,
            maxiter=maxiter,
            maxeval=None if config.max_eval is None else config.max_eval,
            gatol=config.gatol,
            grtol=config.grtol,
            mem_dtype=mem_dtype,
        )

    if init == "wiener":
        from microtipi_tpu.jobs.wiener import wiener

        x0 = pad_to_shape(wiener(data, psf), var_shape)
    elif init == "data":
        x0 = pad_to_shape(jnp.asarray(data), var_shape)
    else:
        raise ValueError(f"unknown init {init!r}")
    if config.positivity:
        x0 = jnp.maximum(x0, 0.0)

    probe_iter = int(config.max_iter if search_max_iter is None else search_max_iter)

    def body(i, carry):
        lo, hi, x, mus, ds = carry
        mu = jnp.sqrt(lo * hi)
        res = solve(mu, x, probe_iter)
        d = 2.0 * cost.cost(res.x)
        # D too large -> over-regularized -> shrink from above; else from below.
        hi = jnp.where(d > target, mu, hi)
        lo = jnp.where(d > target, lo, mu)
        return lo, hi, res.x, mus.at[i].set(mu), ds.at[i].set(d)

    lo = jnp.asarray(lo0, dtype)
    hi = jnp.asarray(hi0, dtype)
    hist = jnp.zeros((steps,), dtype)
    lo, hi, x, mus, ds = jax.lax.fori_loop(0, steps, body, (lo, hi, x0, hist, hist))

    mu_star = jnp.sqrt(lo * hi)
    res = solve(mu_star, x, int(config.max_iter))
    final = DeconvolutionResult(
        res.x, res.f, res.iterations, res.evaluations, res.status,
        res.f_history, res.pg_history,
    )
    return AutoMuResult(
        mu_star, sigma_out, target, 2.0 * cost.cost(res.x), mus, ds, final
    )
