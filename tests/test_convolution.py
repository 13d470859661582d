"""Weighted convolution cost: forward/adjoint/commutativity invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from microtipi_tpu.ops.convolution import WeightedConvolutionCost, convolve, convolve_spectrum
from microtipi_tpu.utils.arrays import pad_fft_kernel, roll, unroll


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape))


def test_convolution_matches_direct_circular():
    x = _rand((6, 8, 8), 0)
    k = _rand((6, 8, 8), 1)
    got = np.asarray(convolve(x, convolve_spectrum(k), x.shape))
    # direct circular convolution
    ref = np.zeros(x.shape)
    xn = np.asarray(x)
    kn = np.asarray(k)
    for s0 in range(6):
        for s1 in range(8):
            for s2 in range(8):
                ref += xn[s0, s1, s2] * np.roll(kn, (s0, s1, s2), axis=(0, 1, 2))
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_convolution_commutes():
    """Kernel/variable roles swap freely — the property the PSF step exploits
    (object-as-kernel, PSF_Estimation.java:147-157)."""
    a = _rand((4, 8, 8), 2)
    b = _rand((4, 8, 8), 3)
    ab = convolve(a, convolve_spectrum(b), a.shape)
    ba = convolve(b, convolve_spectrum(a), a.shape)
    np.testing.assert_allclose(np.asarray(ab), np.asarray(ba), atol=1e-12)


def test_adjoint_dot_product():
    """<H v, q> == <v, H^T q> where H^T is what autodiff derives."""
    k = _rand((4, 8, 8), 4)
    cost = WeightedConvolutionCost(convolve_spectrum(k), jnp.zeros((4, 8, 8)), None, (4, 8, 8))
    v = _rand((4, 8, 8), 5)
    q = _rand((4, 8, 8), 6)
    hv = cost.model(v)
    _, vjp = jax.vjp(cost.model, jnp.zeros_like(v))
    htq = vjp(q)[0]
    np.testing.assert_allclose(float(jnp.vdot(hv, q)), float(jnp.vdot(v, htq)), rtol=1e-12)


def test_cost_and_gradient_vs_finite_differences():
    k = _rand((4, 8, 8), 7)
    d = _rand((4, 8, 8), 8)
    w = jnp.abs(_rand((4, 8, 8), 9))
    cost = WeightedConvolutionCost.build(k, d, w)
    x = _rand((4, 8, 8), 10)
    f, g = cost.cost_and_gradient(x)
    rng = np.random.default_rng(11)
    v = jnp.asarray(rng.standard_normal(x.shape))
    eps = 1e-6
    fd = (cost.cost(x + eps * v) - cost.cost(x - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, v)), float(fd), rtol=1e-6)


def test_cost_zero_at_exact_model():
    k = jnp.abs(_rand((4, 8, 8), 12))
    x = jnp.abs(_rand((4, 8, 8), 13))
    d = convolve(x, convolve_spectrum(k), x.shape)
    cost = WeightedConvolutionCost.build(k, d)
    assert float(cost.cost(x)) < 1e-18


def test_padded_variable_crop_window():
    """Variable on a padded grid: model is cropped to the centered window."""
    k_small = jnp.zeros((4, 8, 8)).at[0, 0, 0].set(1.0)  # identity kernel
    k = pad_fft_kernel(k_small, (6, 12, 12))
    x = _rand((6, 12, 12), 14)
    d = jnp.zeros((4, 8, 8))
    cost = WeightedConvolutionCost.build(k, d, var_shape=(6, 12, 12))
    m = cost.model(x)
    assert m.shape == (4, 8, 8)
    np.testing.assert_allclose(np.asarray(m), np.asarray(x[1:5, 2:10, 2:10]), atol=1e-12)


def test_roll_unroll_roundtrip():
    x = _rand((5, 6, 7), 15)
    np.testing.assert_array_equal(np.asarray(unroll(roll(x))), np.asarray(x))
    # roll == fftshift: the corner sample moves to the center.
    y = jnp.zeros((4, 4)).at[0, 0].set(1.0)
    assert float(roll(y)[2, 2]) == 1.0


def test_zero_weight_excludes_nonfinite_voxels():
    """A NaN/Inf voxel with zero weight must not poison the cost (IEEE
    0*NaN=NaN would defeat the validity mask) — in the shift-invariant AND
    the depth-varying cost builders."""
    from microtipi_tpu.ops.depthconv import DepthVaryingConvCost
    from microtipi_tpu.weights.updaters import validity_mask

    shape = (4, 8, 8)
    rng = np.random.default_rng(20)
    h = jnp.asarray(rng.random(shape))
    h = h / jnp.sum(h)
    d = np.asarray(rng.random(shape))
    d[1, 2, 3] = np.nan
    d[2, 3, 4] = np.inf
    d = jnp.asarray(d)
    w = validity_mask(d)
    assert int((w == 0).sum()) == 2
    x = jnp.asarray(rng.random(shape))

    cost = WeightedConvolutionCost.build(h, d, w)
    f, g = jax.value_and_grad(cost.cost)(x)
    assert np.isfinite(float(f)) and bool(jnp.isfinite(g).all())

    cost_dv = DepthVaryingConvCost.build(jnp.stack([h, h]), d, w)
    f2, g2 = jax.value_and_grad(cost_dv.cost)(x)
    assert np.isfinite(float(f2)) and bool(jnp.isfinite(g2).all())
    # excluded voxels contribute nothing: same cost as data with 0 there
    d0 = jnp.where(w > 0, d, 0.0)
    f_ref = WeightedConvolutionCost.build(h, d0, w).cost(x)
    np.testing.assert_allclose(float(f), float(f_ref), rtol=1e-12)
