"""Mesh-sharded Richardson-Lucy (and RL-TV) deconvolution.

Sharded analogue of ``jobs.richardson_lucy`` — the ecosystem's baseline
deconvolver at mesh scale (beyond-HBM volumes / batched time-lapse, BASELINE
config 5 shapes). Two distributed FFT pairs per iteration over the (batch, z)
mesh (``parallel.fft``); the TV divergence term is written on global sharded
arrays and GSPMD inserts the z-halo exchanges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from microtipi_tpu.ops.regularization import hyperbolic_tv_and_gradient
from microtipi_tpu.parallel.fft import sharded_irfftn, sharded_rfftn, sharded_spectrum
from microtipi_tpu.parallel.mesh import constrain_volume

__all__ = ["sharded_richardson_lucy", "sharded_multiview_richardson_lucy"]


def sharded_richardson_lucy(
    data: jax.Array,
    psf: jax.Array,
    mesh: Mesh,
    iterations: int = 50,
    background: float = 0.0,
    mu: float = 0.0,
    epsilon: float = 1e-2,
    x0: jax.Array | None = None,
) -> jax.Array:
    """RL (optionally RL-TV) estimate on the mesh; ``psf`` corner-origin at
    the volume grid, ``data`` (Nz, Ny, Nx) or batched (B, Nz, Ny, Nx),
    z-sharded. Semantics match ``jobs.richardson_lucy.richardson_lucy``."""
    vol_shape = data.shape[-3:]
    if psf.shape != vol_shape:
        raise ValueError("richardson_lucy requires psf shape == volume shape")
    batched = data.ndim == 4
    data = constrain_volume(data, mesh)
    k_hat = sharded_spectrum(psf, mesh)
    k_hat_conj = jnp.conj(k_hat)
    flux = jnp.sum(psf)
    d = jnp.maximum(data, 0.0)
    x = jnp.maximum(data, 1e-12) if x0 is None else constrain_volume(jnp.maximum(x0, 1e-12), mesh)
    bg = jnp.asarray(background, data.dtype)
    tiny = jnp.asarray(jnp.finfo(data.dtype).tiny, data.dtype)
    eps = jnp.maximum(1e-6 * (jnp.mean(d) + bg), tiny)  # see jobs.richardson_lucy
    tv_axes = (-3, -2, -1) if batched else None

    def body(_, x):
        model = sharded_irfftn(sharded_rfftn(x, mesh) * k_hat, vol_shape, mesh) + bg
        ratio = jnp.where(model > eps, d / jnp.maximum(model, eps), 0.0)
        back = sharded_irfftn(k_hat_conj * sharded_rfftn(ratio, mesh), vol_shape, mesh)
        denom = flux
        if mu > 0:
            _, tv_grad = hyperbolic_tv_and_gradient(x, epsilon, axes=tv_axes)
            denom = jnp.maximum(flux + mu * tv_grad, 0.1 * flux)
        return jnp.maximum(x * back / denom, 0.0)

    return lax.fori_loop(0, iterations, body, x)


def sharded_multiview_richardson_lucy(
    views: jax.Array,
    psfs: jax.Array,
    mesh: Mesh,
    iterations: int = 50,
    background: float = 0.0,
    x0: jax.Array | None = None,
) -> jax.Array:
    """Joint-MLE multi-view RL fusion on the mesh; semantics match
    ``jobs.richardson_lucy.multiview_richardson_lucy``.

    ``views``/``psfs`` are (K,)+volume stacks; the view axis rides the
    mesh's *batch* axis (views are data-parallel observations of one
    object) and each volume is z-sharded. The per-step sum over views
    becomes a batch-axis all-reduce that GSPMD inserts; the estimate ``x``
    stays a single z-sharded volume replicated across the batch axis.
    """
    if views.shape != psfs.shape or views.ndim != 4:
        raise ValueError("views and psfs must share a (K,)+volume shape")
    vol = views.shape[1:]
    views = constrain_volume(views, mesh)
    k_hat = sharded_rfftn(psfs, mesh)
    k_hat_conj = jnp.conj(k_hat)
    flux = jnp.sum(psfs)
    d = jnp.maximum(views, 0.0)
    # Floored mean-of-views start, matching jobs.richardson_lucy.
    x = jnp.maximum(jnp.mean(d, axis=0), 1e-3 * jnp.mean(d) + 1e-12) \
        if x0 is None else jnp.maximum(x0, 1e-12)
    x = constrain_volume(x, mesh, batched=False)
    bg = jnp.asarray(background, views.dtype)
    tiny = jnp.asarray(jnp.finfo(views.dtype).tiny, views.dtype)
    eps = jnp.maximum(1e-6 * (jnp.mean(d) + bg), tiny)  # see jobs.richardson_lucy

    def body(_, x):
        xb = jnp.broadcast_to(x[None], views.shape)
        model = sharded_irfftn(sharded_rfftn(xb, mesh) * k_hat, vol, mesh) + bg
        ratio = jnp.where(model > eps, d / jnp.maximum(model, eps), 0.0)
        back = jnp.sum(
            sharded_irfftn(k_hat_conj * sharded_rfftn(ratio, mesh), vol, mesh), axis=0
        )
        return jnp.maximum(x * back / flux, 0.0)

    return lax.fori_loop(0, iterations, body, x)
