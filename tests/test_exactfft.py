"""f32-exact matmul-DFT transforms (ops/exactfft.py) + the exact_fft
config surface (round 5; BASELINE.md "TPU FFT precision")."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
from microtipi_tpu.ops import exactfft
from microtipi_tpu.utils.arrays import unroll


@pytest.mark.parametrize("shape,axes", [
    ((8, 12, 10), None),
    ((6, 8), None),
    ((4, 8, 12, 10), (1, 2, 3)),
    ((5, 7, 9), None),   # odd sizes incl. odd last axis
])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_exactfft_matches_numpy(shape, axes, dtype):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(dtype)
    ax = axes if axes is not None else tuple(range(x.ndim))
    ref = np.fft.rfftn(x.astype(np.float64), axes=ax)
    got = np.asarray(exactfft.rfftn(jnp.asarray(x), axes=axes))
    tol = 1e-4 if dtype == np.float32 else 1e-10
    np.testing.assert_allclose(got, ref, atol=tol * np.abs(ref).max())
    s = tuple(shape[a] for a in ax)
    back = np.asarray(exactfft.irfftn(jnp.asarray(got), s=s, axes=axes))
    np.testing.assert_allclose(back, x, atol=tol)
    if s[-1] % 2 == 0:  # default-s inverse (even last axis)
        back2 = np.asarray(exactfft.irfftn(jnp.asarray(got), axes=axes))
        np.testing.assert_allclose(back2, x, atol=tol)


def test_exactfft_jits_and_guards():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 6, 8)),
                    jnp.float32)
    y = jax.jit(lambda v: exactfft.irfftn(exactfft.rfftn(v), s=v.shape))(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)
    with pytest.raises(NotImplementedError, match="s must match"):
        exactfft.rfftn(x, s=(8, 6, 8))


def _problem(seed=0, shape=(6, 12, 12)):
    rng = np.random.default_rng(seed)
    truth = np.maximum(rng.normal(0, 1, shape), 0) * (rng.random(shape) < 0.05) * 50
    g = np.exp(-((np.arange(shape[0]) - shape[0] // 2)[:, None, None] ** 2 / 3
                 + (np.arange(shape[1]) - shape[1] // 2)[None, :, None] ** 2 / 2
                 + (np.arange(shape[2]) - shape[2] // 2)[None, None, :] ** 2 / 2))
    psf = np.asarray(unroll(jnp.asarray(g / g.sum())))
    data = np.fft.irfftn(np.fft.rfftn(truth) * np.fft.rfftn(psf), s=shape,
                         axes=(0, 1, 2))
    data = data + 0.01 * data.max() * rng.standard_normal(shape)
    return jnp.asarray(data), jnp.asarray(psf)


@pytest.mark.parametrize("variant", ["uniform", "weighted", "poisson",
                                     "padded"])
def test_deconvolve_exact_fft_equals_default_on_cpu(variant):
    """On the CPU backend jnp.fft is already exact, so exact_fft=True must
    reproduce the standard path to transform round-off — pinning that the
    exact path computes the SAME math on every cost class."""
    data, psf = _problem()
    kw = {}
    ckw = {}
    if variant == "weighted":
        kw["weights"] = jnp.asarray(
            0.5 + np.random.default_rng(2).random(data.shape))
    elif variant == "poisson":
        data = jnp.maximum(data, 0.0) + 1.0
        ckw = dict(data_term="poisson", background=0.5)
    elif variant == "padded":
        ckw = dict(var_shape=tuple(s + 4 for s in data.shape))
    cfg = DeconvolutionConfig(mu=0.01, epsilon=0.5, max_iter=10, grtol=0.0,
                              **ckw)
    ref = deconvolve(data, psf, config=cfg, **kw)
    got = deconvolve(data, psf,
                     config=DeconvolutionConfig(
                         mu=0.01, epsilon=0.5, max_iter=10, grtol=0.0,
                         exact_fft=True, **ckw), **kw)
    np.testing.assert_allclose(float(got.f), float(ref.f), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               atol=1e-5 * float(jnp.max(jnp.abs(ref.x))))


def test_admm_and_fista_exact_fft_equal_default_on_cpu():
    from microtipi_tpu.jobs.admm import admm_deconvolve, fista_deconvolve

    data, psf = _problem(seed=3)
    for engine in (admm_deconvolve, fista_deconvolve):
        ref = engine(data, psf, config=DeconvolutionConfig(
            mu=0.01, epsilon=0.5, max_iter=15))
        got = engine(data, psf, config=DeconvolutionConfig(
            mu=0.01, epsilon=0.5, max_iter=15, exact_fft=True))
        np.testing.assert_allclose(float(got.f), float(ref.f), rtol=1e-6)
    # tolerance stopping composes with exact_fft
    r = admm_deconvolve(data, psf, config=DeconvolutionConfig(
        mu=0.01, epsilon=0.5, max_iter=300, exact_fft=True,
        admm_reltol=1e-2, admm_check_every=5))
    assert int(r.status) == 0 and int(r.iterations) < 300


def test_exact_fft_equals_default_on_every_surface():
    """Round-5 roll-out: exact_fft=True must reproduce the standard path on
    the CPU backend (jnp.fft is exact there) across EVERY solver surface —
    the 4D/5D/multichannel/superres/depth-varying solvers, their ADMM
    engines, and the sharded path (z-leg 1D matmul-DFT)."""
    from microtipi_tpu.jobs.admm import (
        admm_deconvolve_multichannel,
        admm_deconvolve_timeseries,
        admm_deconvolve_timeseries_multichannel,
    )
    from microtipi_tpu.jobs.depthvar import deconvolve_depthvar
    from microtipi_tpu.jobs.multichannel import deconvolve_multichannel
    from microtipi_tpu.jobs.superres import (
        admm_deconvolve_superres,
        deconvolve_superres,
    )
    from microtipi_tpu.jobs.timeseries import deconvolve_timeseries

    data, psf = _problem()
    stack = jnp.stack([data, data * 0.9 + 0.1])
    psfs = jnp.stack([psf, psf])

    def pair(run):
        a = np.asarray(run(DeconvolutionConfig(
            mu=0.01, epsilon=0.5, max_iter=4, grtol=0.0, exact_fft=False)).x)
        b = np.asarray(run(DeconvolutionConfig(
            mu=0.01, epsilon=0.5, max_iter=4, grtol=0.0, exact_fft=True)).x)
        np.testing.assert_allclose(a, b, atol=2e-4 * max(np.abs(a).max(), 1))

    pair(lambda c: deconvolve_timeseries(stack, psf, config=c, mu_t=0.05))
    pair(lambda c: admm_deconvolve_timeseries(stack, psf, config=c, mu_t=0.05))
    pair(lambda c: deconvolve_multichannel(stack, psfs, config=c))
    pair(lambda c: admm_deconvolve_multichannel(stack, psfs, config=c))
    pair(lambda c: admm_deconvolve_timeseries_multichannel(
        stack[:, None], psfs[:1], config=c, mu_t=0.05))
    pair(lambda c: deconvolve_depthvar(data, psfs, config=c))

    srdata = jnp.asarray(np.asarray(data)[:, ::2, ::2].copy())
    fine = jnp.asarray(np.maximum(np.asarray(psf), 0))
    pair(lambda c: deconvolve_superres(srdata, fine, (1, 2, 2), config=c))
    pair(lambda c: admm_deconvolve_superres(srdata, fine, (1, 2, 2), config=c))

    if jax.device_count() >= 8:
        from microtipi_tpu.parallel.deconv import sharded_deconvolve
        from microtipi_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(batch=1, z=8)
        sd, sp = _problem(seed=7, shape=(8, 16, 16))
        pair(lambda c: sharded_deconvolve(sd, sp, mesh, config=c))


def test_exact_fft_through_tiled():
    """tiled_deconvolve passes the config per tile — the out-of-core path
    inherits exact transforms for free."""
    from microtipi_tpu.jobs.tiled import tiled_deconvolve

    data, psf = _problem(seed=4, shape=(6, 24, 24))
    cfg = DeconvolutionConfig(mu=0.01, epsilon=0.5, max_iter=6, grtol=0.0)
    ref = tiled_deconvolve(np.asarray(data), np.asarray(psf),
                           tile=(6, 16, 16), overlap=(0, 4, 4), config=cfg)
    got = tiled_deconvolve(
        np.asarray(data), np.asarray(psf), tile=(6, 16, 16),
        overlap=(0, 4, 4),
        config=DeconvolutionConfig(mu=0.01, epsilon=0.5, max_iter=6,
                                   grtol=0.0, exact_fft=True))
    np.testing.assert_allclose(got, ref, atol=1e-5 * np.abs(ref).max())


def test_exact_fft_cli_plumbing():
    import argparse

    from microtipi_tpu.cli.shared import _deconv_args, _deconv_config

    ap = argparse.ArgumentParser()
    ap.add_argument("stack")
    _deconv_args(ap)
    args = ap.parse_args(["in.tif", "--exact-fft"])
    args.pad = 0
    assert _deconv_config(args, (8, 16, 16)).exact_fft is True
    args2 = ap.parse_args(["in.tif"])
    args2.pad = 0
    assert _deconv_config(args2, (8, 16, 16)).exact_fft is None
