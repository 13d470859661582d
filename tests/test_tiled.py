"""Tiled (overlap-discard) deconvolution invariants."""

import numpy as np
import jax.numpy as jnp

from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
from microtipi_tpu.jobs.tiled import tile_plan, tiled_deconvolve
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum


def test_tile_plan_covers_volume_exactly():
    for n, t, o in [(100, 40, 8), (64, 64, 0), (65, 32, 4), (128, 48, 10)]:
        (starts, cores), = tile_plan((n,), (t,), (o,))
        assert starts[0] == 0 and starts[-1] + t == max(n, t)
        covered = np.zeros(n, bool)
        for lo, hi in cores:
            covered[lo:hi] = True
        assert covered.all()
        # Every core lies inside its tile.
        for s, (lo, hi) in zip(starts, cores):
            assert s <= lo and hi <= s + t


def test_tile_plan_rejects_bad_geometry():
    import pytest

    with pytest.raises(ValueError, match="exceeds"):
        tile_plan((32,), (64,), (4,))
    with pytest.raises(ValueError, match="twice the overlap"):
        tile_plan((64,), (16,), (8,))


def _scene(shape, support=2, seed=0):
    """Blurred scene with a compactly supported kernel (support voxels)."""
    rng = np.random.default_rng(seed)
    psf = np.zeros(shape, np.float64)
    psf[:support, :support, :support] = rng.random((support,) * 3)
    psf /= psf.sum()
    obj = np.zeros(shape)
    for _ in range(12):
        z, y, x = rng.integers(1, shape[0] - 3), rng.integers(2, shape[1] - 8), rng.integers(2, shape[2] - 8)
        obj[z:z + 2, y:y + 5, x:x + 5] = rng.uniform(30, 100)
    data = np.asarray(convolve(jnp.asarray(obj), convolve_spectrum(jnp.asarray(psf)), shape))
    return psf, obj, data


def test_tiled_matches_full_solve_with_compact_psf():
    """With the halo covering the PSF support, tiled == full away from the
    (regularizer-coupled) seams to a loose tolerance, and recovery quality
    matches."""
    shape = (16, 48, 48)
    psf, obj, data = _scene(shape)
    cfg = DeconvolutionConfig(mu=1e-3, epsilon=1.0, max_iter=12, grtol=0.0)

    full = np.asarray(deconvolve(jnp.asarray(data), jnp.asarray(psf), config=cfg).x)
    tiled = tiled_deconvolve(data, psf, tile=(16, 32, 32), overlap=(0, 8, 8),
                             config=cfg, max_batch=4)
    assert tiled.shape == shape
    err_full = np.linalg.norm(full - obj) / np.linalg.norm(obj)
    err_tiled = np.linalg.norm(tiled - obj) / np.linalg.norm(obj)
    assert err_tiled < err_full * 1.05 + 0.02
    rel = np.linalg.norm(tiled - full) / np.linalg.norm(full)
    assert rel < 0.05


def test_tiled_single_tile_is_exact():
    """tile == volume -> zero overlap -> identical to the plain solve."""
    shape = (8, 24, 24)
    psf, obj, data = _scene(shape, seed=1)
    cfg = DeconvolutionConfig(mu=1e-3, epsilon=1.0, max_iter=6, grtol=0.0)
    full = np.asarray(deconvolve(jnp.asarray(data), jnp.asarray(psf), config=cfg).x)
    tiled = tiled_deconvolve(data, psf, tile=shape, overlap=4, config=cfg)
    np.testing.assert_allclose(tiled, full, rtol=1e-10, atol=1e-12)


def test_tiled_rl_method_runs():
    shape = (8, 32, 32)
    psf, obj, data = _scene(shape, seed=2)
    out = tiled_deconvolve(np.abs(data) + 1e-3, psf, tile=(8, 24, 24),
                           overlap=(0, 6, 6), method="rl", rl_iterations=10,
                           config=DeconvolutionConfig(mu=0.0))
    assert out.shape == shape and np.isfinite(out).all()


def test_tiled_with_weights_and_ragged_tail():
    shape = (8, 40, 40)
    psf, obj, data = _scene(shape, seed=3)
    w = np.ones(shape)
    w[:, :4] = 0.0  # saturated rows example
    cfg = DeconvolutionConfig(mu=1e-3, epsilon=1.0, max_iter=4, grtol=0.0)
    out = tiled_deconvolve(data, psf, weights=w, tile=(8, 24, 24),
                           overlap=(0, 6, 6), config=cfg, max_batch=3)
    assert out.shape == shape and np.isfinite(out).all()
