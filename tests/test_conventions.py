"""Robustness of layout/shape conventions: odd sizes, z-fold, guards."""

import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
from microtipi_tpu.models.widefield import WideFieldConfig
from microtipi_tpu.ops.convolution import WeightedConvolutionCost, convolve, convolve_spectrum
from microtipi_tpu.utils.arrays import crop_to_shape, pad_fft_kernel, pad_to_shape, roll, unroll

KW = dict(na=1.2, wavelength=500e-9, ni=1.33, dxy=100e-9, dz=250e-9)


def test_odd_nz_defocus_fold():
    """Odd Nz: wrapped z must be [0, 1, ..., (Nz-1)//2, -(Nz//2), ..., -1]
    with the reference's i > Nz/2 convention and the unaberrated PSF stays
    symmetric plane-for-plane."""
    cfg = WideFieldConfig(shape=(7, 32, 32), n_phase=0, dtype=jnp.float64, **KW)
    psf = np.asarray(cfg.compute_psf(cfg.init_params()))
    for iz in range(1, 4):
        np.testing.assert_allclose(psf[iz], psf[7 - iz], rtol=1e-8, atol=1e-18)


def test_odd_xy_sizes_in_convolution():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((5, 9, 7)))
    k = jnp.asarray(np.random.default_rng(1).standard_normal((5, 9, 7)))
    out = convolve(x, convolve_spectrum(k), x.shape)
    # adjoint identity sanity at odd sizes (irfftn s= must round-trip)
    back = convolve(out, convolve_spectrum(jnp.flip(jnp.roll(k, (-0, -0, -0)))), x.shape)
    assert out.shape == x.shape and np.isfinite(np.asarray(back)).all()


def test_roll_unroll_odd_sizes():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((5, 7, 9)))
    np.testing.assert_array_equal(np.asarray(unroll(roll(x))), np.asarray(x))


def test_pad_crop_roundtrip_odd():
    x = jnp.asarray(np.random.default_rng(3).standard_normal((3, 5, 7)))
    big = pad_to_shape(x, (6, 8, 11))
    np.testing.assert_array_equal(np.asarray(crop_to_shape(big, (3, 5, 7))), np.asarray(x))


def test_pad_fft_kernel_preserves_corner_origin():
    k = jnp.zeros((4, 8, 8)).at[0, 0, 0].set(1.0)
    big = pad_fft_kernel(k, (8, 16, 16))
    assert float(big[0, 0, 0]) == 1.0
    assert float(jnp.sum(big)) == 1.0


def test_nx_ny_guard():
    with pytest.raises(ValueError, match="Nx should equal Ny"):
        WideFieldConfig(shape=(4, 16, 32), **KW)


def test_kernel_shape_guard():
    with pytest.raises(ValueError, match="kernel shape"):
        WeightedConvolutionCost.build(jnp.zeros((2, 4, 4)), jnp.zeros((2, 8, 8)))


def test_weights_shape_guard():
    with pytest.raises(ValueError, match="weights"):
        WeightedConvolutionCost.build(
            jnp.zeros((2, 4, 4)), jnp.zeros((2, 4, 4)), jnp.zeros((2, 8, 8))
        )


def test_deconvolve_nonsquare_xy():
    """Deconvolution itself has no Nx==Ny restriction (only the pupil model)."""
    shape = (4, 16, 24)
    rng = np.random.default_rng(4)
    obj = jnp.asarray(np.abs(rng.standard_normal(shape)))
    k = jnp.zeros(shape).at[0, 0, 0].set(0.5).at[0, 0, 1].set(0.5)
    data = convolve(obj, convolve_spectrum(k), shape)
    res = deconvolve(data, k, config=DeconvolutionConfig(mu=0.001, epsilon=1.0, max_iter=10))
    assert res.x.shape == shape and np.isfinite(np.asarray(res.x)).all()
