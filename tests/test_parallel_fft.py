"""Distributed 3D FFT / convolution on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
from microtipi_tpu.parallel.fft import (
    sharded_convolve,
    sharded_irfftn,
    sharded_rfftn,
    sharded_spectrum,
)
from microtipi_tpu.parallel.mesh import make_mesh, volume_sharding


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape))


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    return make_mesh(batch=1, z=8)


@pytest.fixture(scope="module")
def mesh2x4():
    return make_mesh(batch=2, z=4)


def test_sharded_rfftn_matches_dense(mesh8):
    shape = (16, 32, 24)
    x = jax.device_put(_rand(shape, 0), volume_sharding(mesh8, batched=False))
    got = np.asarray(sharded_rfftn(x, mesh8))
    ref = np.fft.rfftn(np.asarray(x))
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_sharded_roundtrip(mesh8):
    shape = (16, 32, 24)
    x = jax.device_put(_rand(shape, 1), volume_sharding(mesh8, batched=False))
    y = sharded_rfftn(x, mesh8)
    back = sharded_irfftn(y, shape, mesh8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-12)


def test_sharded_convolve_matches_single_device(mesh8):
    shape = (16, 32, 32)
    x = _rand(shape, 2)
    k = _rand(shape, 3)
    ref = np.asarray(convolve(x, convolve_spectrum(k), shape))
    sh = volume_sharding(mesh8, batched=False)
    xs = jax.device_put(x, sh)
    ks = jax.device_put(k, sh)
    k_hat = sharded_spectrum(ks, mesh8)
    got = np.asarray(sharded_convolve(xs, k_hat, shape, mesh8))
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_sharded_convolve_batched_mesh(mesh2x4):
    shape = (8, 16, 16)
    xb = _rand((2,) + shape, 4)
    k = _rand(shape, 5)
    ref = np.stack(
        [np.asarray(convolve(xb[b], convolve_spectrum(k), shape)) for b in range(2)]
    )
    xs = jax.device_put(xb, volume_sharding(mesh2x4, batched=True))
    ks = jax.device_put(k, volume_sharding(mesh2x4, batched=False))
    k_hat = sharded_spectrum(ks, mesh2x4)
    got = np.asarray(sharded_convolve(xs, k_hat, shape, mesh2x4))
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_gradient_through_sharded_convolve(mesh8):
    """jax.grad must flow through the all_to_all transposes."""
    shape = (16, 16, 16)
    x = jax.device_put(_rand(shape, 6), volume_sharding(mesh8, batched=False))
    k = jax.device_put(jnp.abs(_rand(shape, 7)), volume_sharding(mesh8, batched=False))
    d = jax.device_put(_rand(shape, 8), volume_sharding(mesh8, batched=False))
    k_hat = sharded_spectrum(k, mesh8)

    def cost(x):
        r = sharded_convolve(x, k_hat, shape, mesh8) - d
        return 0.5 * jnp.sum(r * r)

    g = jax.grad(cost)(x)
    v = _rand(shape, 9)
    eps = 1e-6
    fd = (cost(x + eps * v) - cost(x - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, v)), float(fd), rtol=1e-6)
