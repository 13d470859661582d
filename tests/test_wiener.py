"""Wiener direct solver + warm-start behavior."""

import jax.numpy as jnp
import numpy as np

from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
from microtipi_tpu.jobs.wiener import wiener
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum


def _scene(noise=0.01):
    shape = (8, 32, 32)
    rng = np.random.default_rng(0)
    obj = np.zeros(shape)
    obj[2:6, 8:24, 8:24] = 80.0
    obj = jnp.asarray(obj)
    yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    yy, xx = np.minimum(yy, 32 - yy), np.minimum(xx, 32 - xx)
    zz = np.minimum(np.arange(8), 8 - np.arange(8))
    psf = np.exp(-(zz[:, None, None] ** 2) / 4 - (yy + xx)[None] ** 2 / 8)
    psf = jnp.asarray(psf / psf.sum())
    data = convolve(obj, convolve_spectrum(psf), shape)
    data = data + noise * jnp.asarray(rng.standard_normal(shape))
    return obj, psf, data


def test_wiener_recovers_low_noise():
    obj, psf, data = _scene(noise=1e-4)
    x = wiener(data, psf, reg=1e-6)
    assert float(jnp.linalg.norm(x - obj)) < 0.3 * float(jnp.linalg.norm(data - obj))


def test_wiener_reg_tradeoff():
    """More regularization -> smoother (smaller norm) estimate."""
    obj, psf, data = _scene(noise=0.05)
    x_lo = wiener(data, psf, reg=1e-6)
    x_hi = wiener(data, psf, reg=1e-1)
    assert float(jnp.linalg.norm(x_hi)) < float(jnp.linalg.norm(x_lo))


def test_wiener_warm_start_reaches_lower_cost():
    """Same iteration budget, wiener init reaches a lower (or equal) cost."""
    obj, psf, data = _scene(noise=0.01)
    cfg = DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=10, grtol=0.0)
    from_data = deconvolve(data, psf, config=cfg, init="data")
    from_wiener = deconvolve(data, psf, config=cfg, init="wiener")
    assert float(from_wiener.f) <= float(from_data.f) * 1.001
