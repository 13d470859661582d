"""Hyperbolic TV invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from microtipi_tpu.ops.regularization import hyperbolic_tv, hyperbolic_tv_and_gradient


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape))


def test_zero_on_constant():
    x = jnp.full((6, 7, 8), 3.25)
    assert float(hyperbolic_tv(x, 0.1)) == 0.0


def test_positive_otherwise():
    assert float(hyperbolic_tv(_rand((6, 7, 8), 0), 0.01)) > 0.0


def test_tv_limit_small_epsilon():
    """As eps -> 0 the cost tends to isotropic TV of the forward differences."""
    x = _rand((8, 8), 1)
    d0 = jnp.pad(jnp.diff(x, axis=0), ((0, 1), (0, 0)))
    d1 = jnp.pad(jnp.diff(x, axis=1), ((0, 0), (0, 1)))
    tv = float(jnp.sum(jnp.sqrt(d0**2 + d1**2)))
    got = float(hyperbolic_tv(x, 1e-9))
    np.testing.assert_allclose(got, tv, rtol=1e-6)


def test_quadratic_limit_large_epsilon():
    """For eps >> |grad|, sqrt(g2+e^2)-e ~ g2/(2e) (Tikhonov on gradient)."""
    x = 1e-3 * _rand((8, 8), 2)
    eps = 10.0
    d0 = jnp.pad(jnp.diff(x, axis=0), ((0, 1), (0, 0)))
    d1 = jnp.pad(jnp.diff(x, axis=1), ((0, 0), (0, 1)))
    g2 = float(jnp.sum(d0**2 + d1**2))
    np.testing.assert_allclose(float(hyperbolic_tv(x, eps)), g2 / (2 * eps), rtol=1e-6)


def test_gradient_vs_finite_differences():
    x = _rand((6, 6, 6), 3)
    f, g = hyperbolic_tv_and_gradient(x, 0.05, scales=(2.0, 1.0, 1.0))
    v = _rand(x.shape, 4)
    eps = 1e-6
    fd = (
        hyperbolic_tv(x + eps * v, 0.05, scales=(2.0, 1.0, 1.0))
        - hyperbolic_tv(x - eps * v, 0.05, scales=(2.0, 1.0, 1.0))
    ) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, v)), float(fd), rtol=1e-6)


def test_scales_change_anisotropy():
    x = _rand((6, 6), 5)
    a = float(hyperbolic_tv(x, 0.1))
    b = float(hyperbolic_tv(x, 0.1, scales=(2.0, 1.0)))
    assert b < a  # larger voxel size along axis 0 -> smaller gradient there


def test_hessian_prior_ramp_invariance():
    """hyperbolic_hessian is zero on affine ramps away from the replicate
    boundary — the anti-staircasing property TV lacks (TV of the same ramp
    is large). Beyond parity (sparse-deconvolution prior pair)."""
    from microtipi_tpu.ops.regularization import hyperbolic_hessian

    zz, yy, xx = np.meshgrid(*[np.arange(16)] * 3, indexing="ij")
    ramp = jnp.asarray(1.0 * zz + 2.0 * yy - 0.5 * xx + 3.0)
    h = float(hyperbolic_hessian(ramp, 1e-3))
    tv = float(hyperbolic_tv(ramp, 1e-3))
    assert h < 0.15 * tv  # only the boundary ring contributes (measured 870 vs 9000)

    # interior-only check: a ramp plus an interior bump must raise it
    bump = ramp.at[8, 8, 8].add(5.0)
    assert float(hyperbolic_hessian(bump, 1e-3)) > h + 10.0

    # constant volumes cost exactly zero
    assert float(hyperbolic_hessian(jnp.full((8, 8, 8), 2.5), 0.1)) == 0.0


def test_hessian_prior_gradient_and_scales():
    from microtipi_tpu.ops.regularization import hyperbolic_hessian

    x = _rand((6, 7, 8), 5)
    g = jax.grad(lambda v: hyperbolic_hessian(v, 0.1))(x)
    # directional finite difference
    v = _rand((6, 7, 8), 6)
    t = 1e-6
    fd = (float(hyperbolic_hessian(x + t * v, 0.1))
          - float(hyperbolic_hessian(x - t * v, 0.1))) / (2 * t)
    np.testing.assert_allclose(float(jnp.vdot(g, v)), fd, rtol=1e-5)
    # anisotropic scaling changes the cost
    a = float(hyperbolic_hessian(x, 0.1, scales=(1.0, 1.0, 1.0)))
    b = float(hyperbolic_hessian(x, 0.1, scales=(2.0, 1.0, 1.0)))
    assert a != b


def test_smoothed_l1_properties():
    from microtipi_tpu.ops.regularization import smoothed_l1

    assert float(smoothed_l1(jnp.zeros((4, 4)), 0.1)) == 0.0
    x = _rand((5, 5), 7)
    # L1 limit for small eps
    np.testing.assert_allclose(
        float(smoothed_l1(x, 1e-9)), float(jnp.sum(jnp.abs(x))), rtol=1e-6)
    # quadratic limit for large eps
    np.testing.assert_allclose(
        float(smoothed_l1(x, 1e3)), float(jnp.sum(x * x)) / (2e3), rtol=1e-5)
