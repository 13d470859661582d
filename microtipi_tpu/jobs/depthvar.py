"""Depth-variant deconvolution: object update under a z-varying PSF.

Beyond-parity companion to ``jobs/deconv.py``: same solver (VMLMB +
hyperbolic TV + positivity, reference semantics per ``PSF_Estimation.java``
defaults), but the data term is the depth-varying blur of
``ops/depthconv.py`` — K anchor PSFs blended along z — instead of one
shift-invariant kernel. The natural pairing is the Gibson-Lanni model
(``models/gibson_lanni.py``), whose DEPTH family makes "the PSF at depth d"
a one-line parameter edit; :func:`depth_anchor_psfs` synthesizes the anchor
stack with one vmapped call (a single batched FFT program on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from microtipi_tpu.jobs.deconv import (
    DeconvolutionConfig,
    DeconvolutionResult,
    make_regularizer,
)
from microtipi_tpu.ops.depthconv import DepthVaryingConvCost
from microtipi_tpu.optim.vmlmb import minimize_vmlmb
from microtipi_tpu.utils.arrays import pad_fft_kernel, pad_to_shape

__all__ = [
    "depth_anchor_psfs",
    "depth_anchor_psfs_from_maps",
    "deconvolve_depthvar",
]


def depth_anchor_psfs(model, params, anchors, depth0: float | None = None) -> jax.Array:
    """Synthesize the K anchor PSFs for a depth-varying solve, shape
    ``(K, Nz, Ny, Nx)``.

    ``model`` is a :class:`~microtipi_tpu.models.gibson_lanni.GibsonLanniConfig`
    (or any model whose params carry a ``depth = (ns/lambda, d)`` family);
    ``anchors`` are z indices of the data grid; the PSF for anchor ``a`` is
    synthesized at physical depth ``depth0 + a * dz`` (``depth0`` defaults to
    ``model.depth``, the nominal depth of plane z=0). One ``vmap`` over the
    depth coordinate — on TPU the K syntheses run as a single batched FFT
    program, not K dispatches.
    """
    if depth0 is None:
        depth0 = getattr(model, "depth", 0.0)
    anchors = np.asarray(anchors, np.float64)
    depths = jnp.asarray(depth0 + anchors * model.dz, model.dtype)

    def one(d):
        p = params._replace(depth=params.depth.at[1].set(d))
        return model.compute_psf(p)

    return jax.vmap(one)(depths)


def depth_anchor_psfs_from_maps(
    model, phis, rhos=None, defocus=None
) -> jax.Array:
    """Anchor PSFs from K *retrieved* (nonparametric) pupil maps, shape
    ``(K, Nz, Ny, Nx)``.

    The measured-calibration route to depth-varying deconvolution: retrieve a
    pixelwise pupil map from a bead at each of K depths
    (:func:`~microtipi_tpu.jobs.phase_retrieval.retrieve_pupil`, resampled to
    the SAMPLE grid with
    :func:`~microtipi_tpu.jobs.phase_retrieval.resample_pupil_map` if the
    bead crop geometry differs), then synthesize the anchor stack here —
    depth variation that the parametric route
    (:func:`depth_anchor_psfs` + Gibson-Lanni's linear-in-depth model,
    ``models/gibson_lanni.py``) cannot represent (dust, SLM ripple,
    sample-induced higher-order aberration) rides in with the maps. One
    ``vmap`` over ``model.compute_psf_from_pupil`` — a single batched FFT
    program on TPU, like the parametric anchors.

    ``model``: a ``WideFieldConfig`` (scalar pupil synthesis) at the SAMPLE
    geometry. ``phis``: (K, Ny, Nx) phase maps on that grid. ``rhos``:
    optional (K, Ny, Nx) modulus maps (None = nominal flat modulus).
    ``defocus``: None (nominal), one (3,) vector, or (K, 3) per-anchor
    defocus — each retrieval is anchored at its own fitted defocus, which
    the npz from ``fitpsf --retrieve-map`` records.
    """
    phis = jnp.asarray(phis, model.dtype)
    if phis.ndim != 3:
        raise ValueError(f"phis must be (K, Ny, Nx), got {phis.shape}")
    k = phis.shape[0]
    if defocus is None:
        defocus = model.init_params().defocus
    defocus = jnp.asarray(defocus, model.dtype)
    if defocus.ndim == 1:
        defocus = jnp.broadcast_to(defocus, (k,) + defocus.shape)
    if rhos is None:
        return jax.vmap(
            lambda p, d: model.compute_psf_from_pupil(p, defocus=d)
        )(phis, defocus)
    rhos = jnp.asarray(rhos, model.dtype)
    return jax.vmap(
        lambda p, r, d: model.compute_psf_from_pupil(p, rho=r, defocus=d)
    )(phis, rhos, defocus)


def deconvolve_depthvar(
    data: jax.Array,
    psfs: jax.Array,
    anchors=None,
    weights: jax.Array | None = None,
    x0: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
) -> DeconvolutionResult:
    """Solve the object sub-problem under the depth-varying blur.

    ``psfs`` is the (K, Nz, Ny, Nx) corner-origin anchor stack (e.g. from
    :func:`depth_anchor_psfs`); ``anchors`` the matching z indices of the
    data grid (default: K evenly spaced). Supports the padded-variable mode
    (``config.var_shape``) like the shift-invariant solver.
    """
    var_shape = tuple(config.var_shape) if config.var_shape is not None else data.shape
    if psfs.shape[1:] != var_shape:
        psfs = jax.vmap(lambda h: pad_fft_kernel(h, var_shape))(psfs)
    cost = DepthVaryingConvCost.build(psfs, data, weights, var_shape, anchors)
    reg = make_regularizer(config, var_shape)

    if config.data_term == "poisson":
        if weights is not None:
            raise ValueError("data_term='poisson' does not compose with weights")
        from microtipi_tpu.ops.convolution import generalized_kl

        def objective(x):
            return generalized_kl(cost.model(x) + config.background, data) + reg(x)

    elif config.data_term != "gaussian":
        raise ValueError(f"unknown data_term {config.data_term!r}")
    else:

        def objective(x):
            return cost.cost(x) + reg(x)

    if x0 is None:
        x0 = pad_to_shape(data, var_shape)
        if config.positivity:
            x0 = jnp.maximum(x0, 0.0)
    from microtipi_tpu.jobs.deconv import resolve_mem_dtype

    res = minimize_vmlmb(
        jax.value_and_grad(objective),
        x0,
        lower=0.0 if config.positivity else None,
        mem=config.mem,
        maxiter=config.max_iter,
        maxeval=config.max_eval,
        gatol=config.gatol,
        grtol=config.grtol,
        mem_dtype=resolve_mem_dtype(config, x0),
    )
    return DeconvolutionResult(
        res.x, res.f, res.iterations, res.evaluations, res.status,
        res.f_history, res.pg_history,
    )
