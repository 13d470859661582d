"""Precision policy: float32 (the TPU path) vs float64 (validation path).

BASELINE.md's fidelity target (<=1e-5 relative vs double semantics) is
checked between our own f32 and f64 paths on CPU — the reference Java stack
is not executable here, and our f64 path reproduces its double semantics
(same math, same conventions; see SURVEY.md section 4).
"""

import jax.numpy as jnp
import numpy as np

from microtipi_tpu.models.widefield import WideFieldConfig
from microtipi_tpu.ops.convolution import WeightedConvolutionCost

KW = dict(shape=(16, 64, 64), na=1.4, wavelength=561e-9, ni=1.518, dxy=80e-9, dz=200e-9,
          n_phase=6, n_modulus=3)


def _params(cfg):
    p = cfg.init_params()
    return p._replace(
        phase=jnp.asarray([0.3, -0.2, 0.1, 0.05, -0.15, 0.2], cfg.dtype),
        modulus=jnp.asarray([1.0, 0.1, -0.05], cfg.dtype),
    )


def test_psf_f32_matches_f64_normwise():
    c64 = WideFieldConfig(dtype=jnp.float64, **KW)
    c32 = WideFieldConfig(dtype=jnp.float32, **KW)
    p64 = c64.compute_psf(_params(c64))
    p32 = c32.compute_psf(_params(c32))
    rel = float(jnp.linalg.norm(p32.astype(jnp.float64) - p64) / jnp.linalg.norm(p64))
    assert rel < 1e-5, rel


def test_cost_and_gradient_f32_vs_f64():
    c64 = WideFieldConfig(dtype=jnp.float64, **KW)
    c32 = WideFieldConfig(dtype=jnp.float32, **KW)
    rng = np.random.default_rng(0)
    obj64 = jnp.asarray(rng.random(KW["shape"]))
    data64 = jnp.asarray(rng.random(KW["shape"]))

    cost64 = WeightedConvolutionCost.build(obj64, data64)
    cost32 = WeightedConvolutionCost.build(
        obj64.astype(jnp.float32), data64.astype(jnp.float32)
    )
    psf64 = c64.compute_psf(_params(c64))
    psf32 = c32.compute_psf(_params(c32))
    f64, g64 = cost64.cost_and_gradient(psf64)
    f32, g32 = cost32.cost_and_gradient(psf32)
    assert abs(float(f32) - float(f64)) / abs(float(f64)) < 1e-4
    rel = float(jnp.linalg.norm(g32.astype(jnp.float64) - g64) / jnp.linalg.norm(g64))
    assert rel < 1e-4, rel


def _scene(shape, dtype, seed=0):
    import jax

    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    cfg = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                          dxy=100e-9, dz=300e-9, dtype=dtype)
    psf = cfg.compute_psf(cfg.init_params())
    rng = np.random.default_rng(seed)
    obj = jnp.asarray(np.abs(rng.standard_normal(shape)) * 20, dtype)
    data = convolve(obj, convolve_spectrum(psf), shape) \
        + jnp.asarray(0.3 * rng.standard_normal(shape), dtype)
    return psf, data


def test_superres_f32_matches_f64():
    """The finer-grid solve's f32 path tracks f64 normwise (few iterations:
    chaotic divergence of long optimizations is not the claim — per-step
    numerics are)."""
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig
    from microtipi_tpu.jobs.superres import bin_volume, deconvolve_superres

    cfg = DeconvolutionConfig(mu=0.01, epsilon=0.5, max_iter=6, grtol=0.0)
    outs = {}
    for dt in (jnp.float64, jnp.float32):
        psf, _ = _scene((8, 48, 48), dt)
        rng = np.random.default_rng(1)
        obj_f = jnp.asarray(np.abs(rng.standard_normal((8, 48, 48))) * 50, dt)
        from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
        d = bin_volume(convolve(obj_f, convolve_spectrum(psf), (8, 48, 48)),
                       (1, 2, 2))
        outs[dt] = deconvolve_superres(d, psf, factor=(1, 2, 2), config=cfg).x
    rel = float(jnp.linalg.norm(outs[jnp.float32].astype(jnp.float64)
                                - outs[jnp.float64])
                / jnp.linalg.norm(outs[jnp.float64]))
    assert rel < 1e-3, rel


def test_timeseries_f32_matches_f64():
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig
    from microtipi_tpu.jobs.timeseries import deconvolve_timeseries

    cfg = DeconvolutionConfig(mu=0.02, epsilon=1.0, max_iter=6, grtol=0.0)
    outs = {}
    for dt in (jnp.float64, jnp.float32):
        psf, data = _scene((6, 32, 32), dt)
        series = jnp.stack([data, data * jnp.asarray(1.05, dt),
                            data * jnp.asarray(0.95, dt)])
        outs[dt] = deconvolve_timeseries(series, psf, config=cfg, mu_t=0.1).x
    rel = float(jnp.linalg.norm(outs[jnp.float32].astype(jnp.float64)
                                - outs[jnp.float64])
                / jnp.linalg.norm(outs[jnp.float64]))
    assert rel < 1e-3, rel


def test_estimators_f32_match_f64():
    """The self-configuration estimators agree across precisions to f32
    resolution (they feed production weighting/stopping decisions)."""
    from microtipi_tpu.jobs.autotune import estimate_noise_sigma
    from microtipi_tpu.weights.updaters import estimate_gain_readout

    rng = np.random.default_rng(2)
    zz, yy, xx = np.meshgrid(np.arange(8), np.arange(96), np.arange(96),
                             indexing="ij")
    m = 50 + 600 * np.exp(-(((yy - 48) / 30) ** 2 + ((xx - 48) / 30) ** 2))
    e = rng.poisson(m * 2.0)
    d = e / 2.0 + rng.normal(0, 3.0, m.shape)
    s64 = float(estimate_noise_sigma(jnp.asarray(d, jnp.float64)))
    s32 = float(estimate_noise_sigma(jnp.asarray(d, jnp.float32)))
    assert abs(s32 - s64) / s64 < 1e-4
    g64, r64 = estimate_gain_readout(jnp.asarray(d, jnp.float64))
    g32, r32 = estimate_gain_readout(jnp.asarray(d, jnp.float32))
    assert abs(float(g32) - float(g64)) / float(g64) < 5e-3
    assert abs(float(r32) - float(r64)) < 0.05 * max(float(r64), 1.0)
