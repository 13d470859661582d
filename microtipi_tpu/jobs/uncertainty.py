"""Pixelwise uncertainty of the restored object (Laplace + Hutchinson).

Beyond parity: the reference exposes point estimates only — its closest
affordance is the per-iteration cost/evaluation trace
(``PSF_Estimation.java:364-381``); nothing in the TiPi surface the
reference drives (``microUtils/BlindDeconvJob.java:97-138``) produces
error bars on the deconvolved object. Production users need them: a
restored voxel intensity without a confidence scale cannot separate a dim
structure from a deconvolution artifact.

Method. At the solver's MAP point x* of

    f(x) = data_term(x) + mu*TV_eps(x) + extra priors     (jobs/deconv.py)

the Laplace approximation models the posterior as N(x*, H^{-1}) with
H = grad^2 f(x*). The pixelwise posterior variance is diag(H^{-1}),
estimated without ever materializing H:

- Hessian-vector products come from one ``jax.linearize`` of ``grad f``
  at x* (forward-over-reverse). The objective is rebuilt here from the
  plain-jnp cost forms (``WeightedConvolutionCost`` / ``PoissonConvCost``
  + ``regularization_cost``) because the solver's fused fast paths carry
  ``jax.custom_vjp`` rules, which the forward-mode transform rejects.
- diag(H^{-1}) is the Hutchinson diagonal estimator (Bekas, Kokiopoulou &
  Saad 2007): ``E[z * H^{-1} z] = diag(H^{-1})`` for Rademacher z. Each
  probe's solve ``H u = z`` runs conjugate gradients, vmapped over probes
  so the HVP's FFT pair batches into rank-4 transforms on the chip.
- The positivity bound's ACTIVE SET (voxels pinned at the lower bound,
  where the posterior is one-sided, not Gaussian) gets the standard
  active-set treatment: H is restricted to the free set,
  ``B = M H M + (I - M)``, probes are masked to the free set, and sigma
  is reported as exactly 0 on pinned voxels.

Units: with ``weights = 1/sigma_noise^2`` (or the Poisson data term) the
data term is the true negative log-likelihood and ``sigma`` is in data
units. With the unweighted Gaussian term the implicit noise scale is
1 ADU — multiply ``sigma`` by the measured noise sigma
(``jobs.autotune.estimate_noise_sigma``) to get data units.

Caveats (documented, not hidden): the Laplace covariance is a local
quadratic model — it quantifies how sharply the objective pins each voxel
(data + prior), not basin-to-basin ambiguity (for the blind problem's
basin structure see BASELINE.md's identifiability ledger); and the
Hutchinson estimate carries O(1/sqrt(n_probes)) per-voxel noise with a
prefactor set by H^{-1}'s off-diagonal mass, so single-voxel reads are
+-20-40% at the default 8 probes while statistics over regions are much
tighter. ``residual`` reports the mean relative CG residual — if it is
not << 1, raise ``cg_maxiter``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from microtipi_tpu.jobs.deconv import DeconvolutionConfig, regularization_cost
from microtipi_tpu.ops.convolution import PoissonConvCost, WeightedConvolutionCost
from microtipi_tpu.utils.arrays import pad_fft_kernel

__all__ = ["ObjectUncertainty", "laplace_objective", "object_uncertainty"]


class ObjectUncertainty(NamedTuple):
    """Pixelwise Laplace uncertainty of a deconvolved object.

    sigma: posterior standard deviation per voxel (0 on the active set).
    var: the Hutchinson estimate of diag(H^{-1}) on the free set (clipped
        at 0 — the estimator's per-voxel noise can dip below 0 where the
        true variance is tiny).
    free: 1.0 where the voxel is free, 0.0 where the positivity bound
        pins it.
    residual: mean over probes of ||B u - z|| / ||z|| after CG — the
        solve-quality diagnostic (should be <= cg_tol up to CG's own
        stopping slack; raise cg_maxiter if it is not small).
    """

    sigma: jax.Array
    var: jax.Array
    free: jax.Array
    residual: jax.Array


def laplace_objective(
    psf: jax.Array,
    data: jax.Array,
    weights: jax.Array | None,
    config: DeconvolutionConfig,
):
    """The object-step objective in forward-differentiable (plain-jnp) form.

    Same value as ``jobs.deconv.make_objective``'s objective (the solver's
    fused ``QuadraticConvCost``/``UniformConvCost``/Pallas-TV fast paths
    are numerically equivalent reformulations), but built exclusively from
    forms without ``jax.custom_vjp`` so ``jax.linearize(jax.grad(f))`` —
    forward-over-reverse — is legal.
    """
    from microtipi_tpu.jobs.deconv import resolve_exact_fft

    exact = resolve_exact_fft(config)
    var_shape = tuple(config.var_shape) if config.var_shape is not None else data.shape
    kernel = pad_fft_kernel(psf, var_shape)
    if config.data_term == "poisson":
        if weights is not None:
            raise ValueError(
                "data_term='poisson' models the noise itself; per-voxel "
                "Gaussian weights do not compose with it"
            )
        cost = PoissonConvCost.build(kernel, data, config.background,
                                     var_shape, exact=exact)
    elif config.data_term == "gaussian":
        cost = WeightedConvolutionCost.build(kernel, data, weights, var_shape,
                                             exact=exact)
    else:
        raise ValueError(f"unknown data_term {config.data_term!r}")

    def objective(x):
        return cost.cost(x) + regularization_cost(x, config)

    return objective


def object_uncertainty(
    data: jax.Array,
    psf: jax.Array,
    x_hat: jax.Array,
    weights: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
    *,
    n_probes: int = 8,
    key: jax.Array | None = None,
    cg_tol: float = 1e-5,
    cg_maxiter: int = 100,
    active_tol: float = 0.0,
    precondition: bool = True,
) -> ObjectUncertainty:
    """Laplace posterior standard deviation of a deconvolved object.

    ``x_hat`` is the converged solution of ``jobs.deconv.deconvolve`` for
    the SAME (data, psf, weights, config) — the Hessian is evaluated
    there, so an unconverged point degrades the approximation. Fully
    jittable (``n_probes``/``cg_*`` are Python-level constants); cost is
    roughly ``n_probes * cg_iters`` HVP evaluations, each ~one data-term
    FFT pair + one TV second-difference sweep, batched over probes.

    ``active_tol``: with ``config.positivity``, voxels with
    ``x_hat <= active_tol`` count as pinned by the bound (VMLMB projects
    exactly onto 0.0, so the default 0.0 is exact; raise it to also pin
    voxels the solver left epsilon above the bound).

    ``precondition``: circulant preconditioner for the CG solves. The
    Hessian is near-circulant — data curvature ``mean(w)|H^|^2`` (Poisson:
    the mean of its pointwise curvature ``d/m^2``) plus the TV curvature
    bound ``mu/eps * sum|D^|^2`` diagonalize in the rfftn basis — so
    ``M^-1 = F^-1 diag(...)^-1 F`` captures most of the spectrum and CG
    converges in a few iterations instead of O(100) (measured envelope in
    BASELINE.md). Costs one extra FFT pair per CG iteration; exact result
    is unchanged (preconditioning only reshapes the Krylov space).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    objective = laplace_objective(psf, data, weights, config)
    _, hvp = jax.linearize(jax.grad(objective), x_hat)

    if config.positivity:
        free = (x_hat > active_tol).astype(x_hat.dtype)
    else:
        free = jnp.ones_like(x_hat)

    def matvec(v):
        return free * hvp(free * v) + (1.0 - free) * v

    minv = None
    if precondition:
        from microtipi_tpu.jobs.deconv import resolve_exact_fft
        from microtipi_tpu.ops.convolution import fft_pair

        _rfftn, _irfftn = fft_pair(resolve_exact_fft(config))
        var_shape = (tuple(config.var_shape)
                     if config.var_shape is not None else data.shape)
        h_hat = _rfftn(pad_fft_kernel(psf, var_shape))
        h2 = jnp.real(h_hat * jnp.conj(h_hat))
        if config.data_term == "poisson":
            from microtipi_tpu.utils.arrays import crop_to_shape

            m = _irfftn(h_hat * _rfftn(x_hat), s=var_shape)
            if m.shape != data.shape:
                m = crop_to_shape(m, data.shape)
            m = jnp.maximum(m + config.background, jnp.finfo(x_hat.dtype).eps)
            w_mean = jnp.mean(data / (m * m))
        elif weights is None:
            w_mean = jnp.asarray(1.0, x_hat.dtype)
        else:
            w_mean = jnp.mean(weights)
        sz = ((1.0, 1.0, 1.0) if config.scales is None
              else tuple(float(s) for s in config.scales))
        fz = jnp.fft.fftfreq(var_shape[0]).astype(h2.dtype)
        fy = jnp.fft.fftfreq(var_shape[1]).astype(h2.dtype)
        fx = jnp.fft.rfftfreq(var_shape[2]).astype(h2.dtype)
        s2 = ((4.0 / sz[0] ** 2) * jnp.sin(jnp.pi * fz)[:, None, None] ** 2
              + (4.0 / sz[1] ** 2) * jnp.sin(jnp.pi * fy)[None, :, None] ** 2
              + (4.0 / sz[2] ** 2) * jnp.sin(jnp.pi * fx)[None, None, :] ** 2)
        den = w_mean * h2 + (config.mu / max(config.epsilon, 1e-30)) * s2
        den = den + jnp.finfo(x_hat.dtype).eps * jnp.max(den)

        def minv(v):
            p = _irfftn(_rfftn(free * v) / den,
                        s=var_shape).astype(v.dtype)
            return free * p + (1.0 - free) * v

    probes = jax.random.rademacher(key, (n_probes,) + x_hat.shape, x_hat.dtype)

    def solve_one(z):
        zf = free * z
        u, _ = jax.scipy.sparse.linalg.cg(matvec, zf, tol=cg_tol,
                                          maxiter=cg_maxiter, M=minv)
        r = matvec(u) - zf
        rel = jnp.sqrt(jnp.vdot(r, r).real) / jnp.maximum(
            jnp.sqrt(jnp.vdot(zf, zf).real), jnp.finfo(x_hat.dtype).tiny
        )
        return zf * u, rel

    diag_terms, residuals = jax.vmap(solve_one)(probes)
    var = jnp.maximum(free * jnp.mean(diag_terms, axis=0), 0.0)
    return ObjectUncertainty(jnp.sqrt(var), var, free, jnp.mean(residuals))
