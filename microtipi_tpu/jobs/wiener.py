"""Wiener (regularized inverse) filtering: direct Fourier-domain deconvolution.

One-shot closed-form solve of the Tikhonov problem

    min_x 0.5*||K(*)x - d||^2 + 0.5*lam*||x||^2
    =>  x = irfftn( conj(K_hat) * d_hat / (|K_hat|^2 + lam) )

Two roles:

- a standalone fast deconvolver (the TiPi ecosystem's linear inverse-filter
  capability; no positivity/TV but costs exactly 2 FFTs);
- a warm start for the VMLMB object step — starting the iterative solve from
  ``max(wiener, 0)`` instead of the raw data typically saves a third to half
  of the iterations to a given cost (``DeconvolutionConfig`` users pass it as
  ``x0``; ``deconvolve(..., init="wiener")`` wires it automatically).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["wiener"]


def wiener(data: jax.Array, psf: jax.Array, reg: float = 1e-3) -> jax.Array:
    """Regularized-inverse estimate at the data grid.

    ``reg`` is relative: the absolute Tikhonov weight is
    ``reg * max|K_hat|^2`` so the knob is scale-free across kernels.
    The PSF is corner-origin at the data shape.
    """
    if psf.shape != data.shape:
        raise ValueError("wiener requires psf shape == data shape (pad_fft_kernel first)")
    from microtipi_tpu.ops.convolution import auto_exact_fft, fft_pair

    _rfftn, _irfftn = fft_pair(auto_exact_fft())
    k_hat = _rfftn(psf)
    k2 = jnp.real(k_hat) ** 2 + jnp.imag(k_hat) ** 2
    lam = reg * jnp.max(k2)
    x_hat = jnp.conj(k_hat) * _rfftn(data) / (k2 + lam)
    return _irfftn(x_hat, s=data.shape)
