"""Uniform-weight quadratic fast path vs the generic weighted cost."""

import jax
import jax.numpy as jnp
import numpy as np

from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
from microtipi_tpu.ops.convolution import QuadraticConvCost, WeightedConvolutionCost


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape))


def test_cost_and_gradient_match_generic():
    k = _rand((6, 16, 16), 0)
    d = _rand((6, 16, 16), 1)
    x = _rand((6, 16, 16), 2)
    generic = WeightedConvolutionCost.build(k, d)
    fast = QuadraticConvCost.build(k, d)
    f1, g1 = generic.cost_and_gradient(x)
    f2, g2 = fast.cost_and_gradient(x)
    np.testing.assert_allclose(float(f2), float(f1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-10)


def test_custom_vjp_matches_value_and_grad():
    k = _rand((4, 16, 16), 3)
    d = _rand((4, 16, 16), 4)
    x = _rand((4, 16, 16), 5)
    fast = QuadraticConvCost.build(k, d)
    f, g = jax.value_and_grad(fast.cost)(x)
    f2, g2 = fast.cost_and_gradient(x)
    np.testing.assert_allclose(float(f), float(f2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), atol=1e-12)


def test_deconvolve_same_trajectory_with_and_without_fast_path():
    """Forcing the generic path via a ones-weights array must reproduce the
    fast path's trajectory (identical math)."""
    k = jnp.abs(_rand((6, 16, 16), 6))
    d = jnp.abs(_rand((6, 16, 16), 7)) + 1.0
    cfg = DeconvolutionConfig(mu=0.01, epsilon=1.0, max_iter=12, grtol=0.0)
    fast = deconvolve(d, k, config=cfg)  # weights=None -> quadratic path
    slow = deconvolve(d, k, weights=jnp.ones_like(d), config=cfg)
    np.testing.assert_allclose(float(fast.f), float(slow.f), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(fast.x), np.asarray(slow.x), atol=1e-7)


def test_uniform_cost_matches_weighted_and_beats_quadratic_in_f32():
    """UniformConvCost (3-FFT accurate path): cost+grad match the generic
    weighted path exactly; near the optimum its f32 cost keeps resolution
    where the quadratic identity has already cancelled to eps*c."""
    from microtipi_tpu.ops.convolution import (
        QuadraticConvCost,
        UniformConvCost,
        WeightedConvolutionCost,
        convolve,
        convolve_spectrum,
    )

    rng = np.random.default_rng(3)
    shape = (6, 16, 16)
    k = jnp.asarray(rng.random(shape))
    x_star = jnp.asarray(rng.random(shape) * 100)
    d = convolve(x_star, convolve_spectrum(k), shape)  # zero-residual optimum

    u64 = UniformConvCost.build(k, d)
    w64 = WeightedConvolutionCost.build(k, d)
    x = x_star + 0.01 * jnp.asarray(rng.standard_normal(shape))
    fu, gu = jax.value_and_grad(u64.cost)(x)
    fw, gw = jax.value_and_grad(lambda z: w64.cost(z))(x)
    np.testing.assert_allclose(float(fu), float(fw), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(gw), rtol=1e-8, atol=1e-10)

    # f32 resolution at the optimum: residual form returns ~0 while the
    # quadratic identity returns noise on the order of eps * 0.5||d||^2
    k32, d32, xs32 = k.astype(jnp.float32), d.astype(jnp.float32), x_star.astype(jnp.float32)
    f_res = float(UniformConvCost.build(k32, d32).cost(xs32))
    f_quad = float(QuadraticConvCost.build(k32, d32).cost(xs32))
    c = 0.5 * float(jnp.sum(d32 * d32))
    assert abs(f_res) < 1e-5 * c
    # not asserting f_quad is LARGE (it can luck out), only documenting the
    # scale relation: the residual form is at least as accurate
    assert abs(f_res) <= abs(f_quad) + 1e-5 * c
