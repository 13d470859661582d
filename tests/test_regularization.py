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
