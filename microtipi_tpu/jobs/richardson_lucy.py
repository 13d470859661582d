"""Richardson-Lucy deconvolution (multiplicative Poisson MLE updates).

Beyond-parity capability: the reference stack's ecosystem treats RL as the
baseline deconvolver (DeconvolutionLab2 / Icy), so a switchable RL solver
belongs in a complete framework even though microTiPi itself is VMLMB-based.

    x_{k+1} = x_k / (H^T 1) * H^T( d / (H x_k + bg) )

with H the circulant PSF convolution — so ``H^T 1 = sum(psf)`` is a scalar —
and ``bg`` a constant background. Positivity is intrinsic (multiplicative
updates from a nonnegative start). Entirely on-device: 2 FFT pairs per
iteration inside one ``lax.fori_loop``.

Optional TV regularization (RL-TV, Dey et al. 2006): the denominator gains
``-mu * div(grad x / |grad x|_eps)``, implemented with the hyperbolic-TV
gradient (which equals that divergence term with the same sign convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
from microtipi_tpu.ops.regularization import hyperbolic_tv_and_gradient

__all__ = ["richardson_lucy"]


def richardson_lucy(
    data: jax.Array,
    psf: jax.Array,
    iterations: int = 50,
    background: float = 0.0,
    mu: float = 0.0,
    epsilon: float = 1e-2,
    x0: jax.Array | None = None,
) -> jax.Array:
    """RL (optionally RL-TV) estimate; ``psf`` corner-origin at data shape."""
    if psf.shape != data.shape:
        raise ValueError("richardson_lucy requires psf shape == data shape")
    k_hat = convolve_spectrum(psf)
    k_hat_conj = jnp.conj(k_hat)
    flux = jnp.sum(psf)
    d = jnp.maximum(data, 0.0)
    x = jnp.maximum(data, 1e-12) if x0 is None else jnp.maximum(x0, 1e-12)
    bg = jnp.asarray(background, data.dtype)
    tiny = jnp.asarray(jnp.finfo(data.dtype).tiny, data.dtype)

    def body(_, x):
        model = convolve(x, k_hat, data.shape) + bg
        ratio = d / jnp.maximum(model, tiny)
        back = jnp.fft.irfftn(k_hat_conj * jnp.fft.rfftn(ratio), s=data.shape)
        denom = flux
        if mu > 0:
            _, tv_grad = hyperbolic_tv_and_gradient(x, epsilon)
            denom = jnp.maximum(flux + mu * tv_grad, 0.1 * flux)
        return jnp.maximum(x * back / denom, 0.0)

    return lax.fori_loop(0, iterations, body, x)
