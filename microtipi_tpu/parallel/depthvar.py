"""Mesh-sharded depth-varying deconvolution.

Distributed analogue of ``jobs/depthvar.py``: the depth-variant operator
``H x = sum_k h_k (*) (w_k ⊙ x)`` runs on the (batch, z) mesh with one
distributed-FFT convolution per anchor (2K all-to-alls per model
evaluation; K is small and static). The per-plane blend weights ``w_k``
multiply the z-sharded object locally — GSPMD broadcasts the (Nz,) weight
rows with no communication — and the anchor spectra live in the y-sharded
distributed layout (``parallel.fft``), replicated over batch.

Padded-variable mode follows the mesh convention of
``parallel.deconv.make_sharded_objective``: the object lives on the padded
grid and the pad region carries zero weight (numerically the crop-operator
data term), which is also how mesh-odd Nz/Ny stacks become divisible.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from microtipi_tpu.jobs.deconv import (
    DeconvolutionConfig,
    DeconvolutionResult,
    has_regularizer,
    regularization_cost,
    resolve_mem_dtype,
)
from microtipi_tpu.ops.depthconv import depth_weights
from microtipi_tpu.optim.vmlmb import minimize_vmlmb
from microtipi_tpu.parallel.deconv import pad_trailing
from microtipi_tpu.parallel.fft import sharded_convolve, sharded_spectrum
from microtipi_tpu.parallel.mesh import constrain_volume
from microtipi_tpu.utils.arrays import pad_fft_kernel

__all__ = ["sharded_deconvolve_depthvar"]


def sharded_deconvolve_depthvar(
    data: jax.Array,
    psfs: jax.Array,
    mesh: Mesh,
    anchors=None,
    weights: jax.Array | None = None,
    x0: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
) -> DeconvolutionResult:
    """Depth-varying object update on the mesh.

    ``data`` is (Nz, Ny, Nx) or batched (B, Nz, Ny, Nx), z-sharded; ``psfs``
    the (K,)+volume corner-origin anchor stack shared across the batch;
    ``anchors`` the matching z indices of the data grid (default K evenly
    spaced). Drop-in sharded analogue of ``jobs.depthvar.deconvolve_depthvar``.
    """
    vol_shape = data.shape[-3:]
    var_shape = tuple(config.var_shape) if config.var_shape is not None else vol_shape
    k = psfs.shape[0]
    if anchors is None:
        anchors = np.linspace(0.0, vol_shape[0] - 1.0, k)
    anchors = np.asarray(anchors, np.float64)
    if anchors.shape != (k,):
        raise ValueError(f"need one anchor per kernel, got {anchors.shape} for K={k}")

    if psfs.shape[1:] != var_shape:
        psfs = jnp.stack([pad_fft_kernel(psfs[i], var_shape) for i in range(k)])
    k_hats = [sharded_spectrum(psfs[i], mesh) for i in range(k)]
    off_z = (var_shape[0] - vol_shape[0]) // 2
    zw = jnp.asarray(depth_weights(var_shape[0], anchors + off_z), data.dtype)

    data = constrain_volume(data, mesh)
    padded = var_shape != vol_shape
    batched = data.ndim == 4
    if padded:
        d = constrain_volume(pad_trailing(data, var_shape), mesh)
        w = jnp.ones(vol_shape, data.dtype) if weights is None else weights
        w = constrain_volume(pad_trailing(w, var_shape), mesh, batched=False)
    else:
        d, w = data, weights

    def model(x):
        hx = sharded_convolve(zw[0][:, None, None] * x, k_hats[0], var_shape, mesh)
        for i in range(1, k):
            hx = hx + sharded_convolve(zw[i][:, None, None] * x, k_hats[i], var_shape, mesh)
        return hx

    def objective(x):
        r = model(x) - d
        f = 0.5 * jnp.sum(r * r) if w is None else 0.5 * jnp.sum(w * r * r)
        if has_regularizer(config):
            f = f + regularization_cost(
                x, config, axes=(-3, -2, -1) if batched else None
            )
        return f

    if x0 is None:
        x0 = pad_trailing(data, var_shape)
        if config.positivity:
            x0 = jnp.maximum(x0, 0.0)
    x0 = constrain_volume(x0, mesh)
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
