"""Richardson-Lucy deconvolution behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from microtipi_tpu.jobs.richardson_lucy import richardson_lucy
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum


def _scene():
    shape = (8, 32, 32)
    rng = np.random.default_rng(0)
    obj = np.zeros(shape)
    obj[2:6, 8:24, 8:24] = 80.0
    obj[4, 26, 26] = 300.0
    obj = jnp.asarray(obj)
    zz = np.minimum(np.arange(8), 8 - np.arange(8))
    yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    yy, xx = np.minimum(yy, 32 - yy), np.minimum(xx, 32 - xx)
    psf = np.exp(-(zz[:, None, None] ** 2) / 4 - (yy + xx)[None] ** 2 / 6)
    psf = jnp.asarray(psf / psf.sum())
    data = convolve(obj, convolve_spectrum(psf), shape)
    noisy = jnp.asarray(rng.poisson(np.maximum(np.asarray(data), 0)).astype(np.float64))
    return obj, psf, data, noisy


def test_rl_converges_noiseless():
    obj, psf, data, noisy = _scene()
    x = richardson_lucy(data, psf, iterations=200)
    assert float(jnp.linalg.norm(x - obj)) < 0.55 * float(jnp.linalg.norm(data - obj))
    assert float(x.min()) >= 0.0


def test_rl_semiconvergence_under_noise():
    """RL is semi-convergent: early iterations improve the noisy estimate;
    very long runs amplify noise (stopping early is the classic regularizer)."""
    obj, psf, data, noisy = _scene()
    early = richardson_lucy(noisy, psf, iterations=20)
    late = richardson_lucy(noisy, psf, iterations=500)
    e0 = float(jnp.linalg.norm(noisy - obj))
    assert float(jnp.linalg.norm(early - obj)) < 0.9 * e0
    assert float(jnp.linalg.norm(late - obj)) > float(jnp.linalg.norm(early - obj))


def test_rl_preserves_flux():
    """Unit-flux PSF: RL conserves total intensity of the estimate."""
    obj, psf, data, noisy = _scene()
    x = richardson_lucy(data, psf, iterations=40)
    np.testing.assert_allclose(float(x.sum()), float(data.sum()), rtol=1e-6)


def test_rl_tv_damps_noise():
    obj, psf, data, noisy = _scene()
    plain = richardson_lucy(noisy, psf, iterations=200)
    damped = richardson_lucy(noisy, psf, iterations=200, mu=0.2, epsilon=1.0)
    # TV-regularized estimate is smoother (smaller gradient energy).
    def grad_energy(v):
        return float(sum(jnp.sum(jnp.diff(v, axis=a) ** 2) for a in range(3)))
    assert grad_energy(damped) < grad_energy(plain)


def test_rl_jittable():
    obj, psf, data, noisy = _scene()
    fn = jax.jit(lambda d, p: richardson_lucy(d, p, iterations=10))
    out = fn(data, psf)
    assert np.isfinite(np.asarray(out)).all()
