"""Fused Pallas hyperbolic-TV kernel vs the jnp reference (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.ops.pallas.hyperbolic_tv import hyperbolic_tv_fused, hyperbolic_tv_value
from microtipi_tpu.ops.regularization import hyperbolic_tv, hyperbolic_tv_and_gradient


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape).astype(np.float32)
    )


@pytest.mark.parametrize("shape", [(8, 16, 128), (5, 24, 128)])
@pytest.mark.parametrize("scales", [None, (2.0, 1.0, 1.0)])
def test_fused_matches_reference(shape, scales):
    x = _rand(shape, 0)
    f_ref, g_ref = hyperbolic_tv_and_gradient(x, 0.1, scales=scales)
    f, g = hyperbolic_tv_fused(x, 0.1, scales=scales, interpret=True)
    np.testing.assert_allclose(float(f), float(f_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_custom_vjp_single_kernel_gradient():
    x = _rand((6, 16, 128), 1)

    def obj(x):
        return hyperbolic_tv_value(x, 0.05, None, True) + 0.5 * jnp.sum(x * x)

    f, g = jax.value_and_grad(obj)(x)
    f_ref, g_ref = jax.value_and_grad(
        lambda x: hyperbolic_tv(x, 0.05) + 0.5 * jnp.sum(x * x)
    )(x)
    np.testing.assert_allclose(float(f), float(f_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_zero_on_constant_volume():
    x = jnp.full((4, 16, 128), 2.5, jnp.float32)
    f, g = hyperbolic_tv_fused(x, 0.1, interpret=True)
    assert abs(float(f)) < 1e-5
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_deep_stack_accumulation_accuracy():
    """256 z-planes: per-plane partials + XLA pairwise sum must stay at f32
    round-off vs the f64 reference (a sequential single-cell accumulator
    loses ~3-4 digits at this depth and fails this bound)."""
    x = _rand((256, 8, 128), 7)
    f64 = float(hyperbolic_tv(x.astype(jnp.float64), 0.1))
    f, _ = hyperbolic_tv_fused(x, 0.1, interpret=True)
    assert abs(float(f) - f64) / abs(f64) < 5e-7


def test_vmapped_fused_tv_routes_to_batched_kernel():
    """Under vmap the custom rule runs the (B, Nz)-grid kernel; values and
    gradients match the jnp reference per lane (interpret mode on CPU)."""
    import numpy as np

    from microtipi_tpu.ops.regularization import hyperbolic_tv

    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 6, 8, 8)), jnp.float32)
    eps, scales = 0.1, (2.0, 1.0, 1.0)
    vals, grads = jax.vmap(
        jax.value_and_grad(lambda xi: hyperbolic_tv_value(xi, eps, scales, True))
    )(x)
    for i in range(3):
        f_ref, g_ref = jax.value_and_grad(lambda xi: hyperbolic_tv(xi, eps, scales))(
            x[i].astype(jnp.float64)
        )
        np.testing.assert_allclose(float(vals[i]), float(f_ref), rtol=2e-6)
        np.testing.assert_allclose(np.asarray(grads[i]), np.asarray(g_ref),
                                   rtol=2e-4, atol=1e-6)
