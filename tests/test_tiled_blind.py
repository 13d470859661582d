"""Out-of-core blind: streamed PSF-fit statistics (jobs/tiled_blind.py).

Oracle strategy: the streamed quadratic objective is ALGEBRAICALLY equal
to the dense circulant objective with the support-limited PSF — pin value
equality at dense-checkable scale, then fitted-parameter equality, then
the composed blind loop against the dense blind loop.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from microtipi_tpu.jobs.blind import BlindDeconvConfig
from microtipi_tpu.jobs.deconv import DeconvolutionConfig
from microtipi_tpu.jobs.psf_fit import PsfFitConfig, fit_families_with_cost
from microtipi_tpu.jobs.tiled_blind import (
    blind_deconvolve_tiled,
    fit_psf_streamed,
    make_streamed_fit_cost,
    streamed_fit_stats,
)
from microtipi_tpu.models.microscope import DEFOCUS, FAMILY_NAMES, PHASE
from microtipi_tpu.models.widefield import WideFieldConfig
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
from microtipi_tpu.utils.arrays import pad_fft_kernel

VOL = (16, 64, 64)
PSF_SHAPE = (8, 24, 24)
KW = dict(na=1.2, wavelength=500e-9, ni=1.33, dxy=100e-9, dz=250e-9)


def _model(shape=PSF_SHAPE, n_phase=3):
    return WideFieldConfig(shape=shape, n_phase=n_phase, n_modulus=1,
                           dtype=jnp.float64, **KW)


def _scene(seed=0, phase=(0.3, -0.2, 0.1)):
    """Volume blurred by the SUPPORT-LIMITED true PSF + noise."""
    rng = np.random.default_rng(seed)
    obj = np.zeros(VOL)
    for _ in range(12):
        obj[rng.integers(0, VOL[0]), rng.integers(4, VOL[1] - 4),
            rng.integers(4, VOL[2] - 4)] = rng.uniform(50, 100)
    m = _model()
    true = m.init_params()._replace(phase=jnp.asarray(phase, jnp.float64))
    psf_small = m.compute_psf(true)
    kern = pad_fft_kernel(psf_small, VOL)
    data = np.asarray(convolve(jnp.asarray(obj), convolve_spectrum(kern), VOL))
    data = data + 0.01 * rng.standard_normal(VOL)
    return np.asarray(obj), np.asarray(data), m, true


def _dense_cost(obj, data, model):
    """Dense circulant objective with the support-limited PSF (the oracle)."""
    obj_hat = convolve_spectrum(jnp.asarray(obj))

    def cost(params):
        psf = model.compute_psf(params)
        kern = pad_fft_kernel(psf, VOL)
        r = convolve(kern, obj_hat, VOL) - jnp.asarray(data)
        return 0.5 * jnp.sum(r * r)

    return cost


def test_streamed_stats_objective_equals_dense():
    """The streamed quadratic == the dense objective, for several
    parameter points, several tile sizes (incl. flush-shifted ragged
    blocks), to f64 round-off."""
    obj, data, model, true = _scene()
    dense = _dense_cost(obj, data, model)
    for tile in [(16, 64, 64), (8, 32, 32), (16, 48, 48)]:
        stats = streamed_fit_stats(obj, data, PSF_SHAPE, tile=tile)
        cost = make_streamed_fit_cost(stats, model)
        for phase in [(0.0, 0.0, 0.0), (0.3, -0.2, 0.1), (-0.5, 0.4, 0.2)]:
            p = model.init_params()._replace(
                phase=jnp.asarray(phase, jnp.float64))
            f_s = float(cost(p))
            f_d = float(dense(p))
            assert f_s == pytest.approx(f_d, rel=1e-9), (tile, phase, f_s, f_d)


def test_streamed_stats_gradient_matches_dense():
    obj, data, model, true = _scene()
    stats = streamed_fit_stats(obj, data, PSF_SHAPE, tile=(8, 32, 32))
    cost = make_streamed_fit_cost(stats, model)
    dense = _dense_cost(obj, data, model)
    p = model.init_params()._replace(
        phase=jnp.asarray([0.1, 0.05, -0.1], jnp.float64))
    g_s = jax.grad(lambda ph: cost(p._replace(phase=ph)))(p.phase)
    g_d = jax.grad(lambda ph: dense(p._replace(phase=ph)))(p.phase)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d), rtol=1e-8)


def test_streamed_fit_matches_dense_fit():
    """fit_psf_streamed lands on the dense support-limited fit's parameters
    (same objective -> same optimizer trajectory; VERDICT bar ~1e-3, met
    at f64 round-off)."""
    obj, data, model, true = _scene()
    stats = streamed_fit_stats(obj, data, PSF_SHAPE)
    cfg = PsfFitConfig(max_iter=15, grtol=0.0)
    params, f, its = fit_psf_streamed(
        model, model.init_params(), (PHASE,), stats, cfg)

    dense = _dense_cost(obj, data, model)
    ref = fit_families_with_cost(dense, model.init_params(),
                                 (FAMILY_NAMES[PHASE],), cfg)
    np.testing.assert_allclose(np.asarray(params.phase),
                               np.asarray(ref.params.phase), atol=1e-6)
    # and it actually recovers the injected aberration
    np.testing.assert_allclose(np.asarray(params.phase),
                               np.asarray(true.phase), atol=0.05)


def test_streamed_guards():
    obj = np.zeros(VOL)
    with pytest.raises(ValueError, match="2\\*psf_shape"):
        streamed_fit_stats(obj, obj, (16, 40, 40))
    with pytest.raises(ValueError, match="!="):
        streamed_fit_stats(obj, np.zeros((8, 8, 8)), (4, 4, 4))


def test_blind_deconvolve_tiled_end_to_end():
    """The composed out-of-core blind loop shrinks the phase error on an
    identifiable (extended, structured) scene and the object beats the raw
    data. (Sparse point scenes cannot constrain phase in ANY blind loop —
    the BASELINE.md identifiability tables; the per-round tiled-vs-dense
    fit parity is pinned separately above.)"""
    rng = np.random.default_rng(2)
    obj = np.zeros(VOL)
    for _ in range(25):
        z = rng.integers(0, VOL[0] - 3)
        y = rng.integers(4, VOL[1] - 8)
        x = rng.integers(4, VOL[2] - 8)
        obj[z:z + 3, y:y + rng.integers(2, 6),
            x:x + rng.integers(2, 6)] = rng.uniform(30, 100)
    model = _model()
    true = model.init_params()._replace(
        phase=jnp.asarray([0.3, -0.2, 0.1], jnp.float64))
    kern = pad_fft_kernel(model.compute_psf(true), VOL)
    data = np.asarray(convolve(jnp.asarray(obj), convolve_spectrum(kern),
                               VOL))
    data = data + 0.005 * data.max() * rng.standard_normal(VOL)

    cfg = BlindDeconvConfig(
        loops=4, families=(PHASE,), psf_max_iter=(8,), joint_fit=True,
        deconv=DeconvolutionConfig(mu=0.005, epsilon=0.5, max_iter=25,
                                   grtol=0.0),
        fit=PsfFitConfig(grtol=0.0),
        mu_schedule=(0.32, 0.08, 0.02, 0.005),
    )
    logs = []
    out, params, psf, df, ff = blind_deconvolve_tiled(
        data, model, cfg, tile=(16, 48, 48), overlap=(0, 12, 12),
        log=logs.append)
    assert out.shape == VOL and np.isfinite(out).all()
    assert psf.shape == PSF_SHAPE and np.isfinite(psf).all()
    err0 = float(np.linalg.norm(np.asarray(true.phase)))
    err = float(np.linalg.norm(np.asarray(params.phase)
                               - np.asarray(true.phase)))
    assert err < 0.75 * err0, (err, err0)  # measured ~0.24 vs 0.37
    assert np.isnan(ff[-1])  # skip-last-fit semantics
    assert np.linalg.norm(out - obj) < 0.6 * np.linalg.norm(data - obj)
    assert len(logs) >= 4


def test_tiled_fit_tracks_dense_fit_in_the_loop():
    """Per-round parity: the fit from the TILED object step lands within a
    few percent of the fit from the DENSE object step (the object steps
    themselves differ by the documented halo/trajectory scatter)."""
    obj, data, model, true = _scene(seed=1)
    from microtipi_tpu.jobs.deconv import deconvolve
    from microtipi_tpu.jobs.tiled import tiled_deconvolve

    cfg = DeconvolutionConfig(mu=0.04, epsilon=0.5, max_iter=12, grtol=0.0)
    psf = np.asarray(model.compute_psf(model.init_params()))
    kern = pad_fft_kernel(jnp.asarray(psf), VOL)
    x_dense = np.asarray(deconvolve(jnp.asarray(data), kern, config=cfg).x)
    x_tiled = tiled_deconvolve(data, psf, tile=(16, 48, 48),
                               overlap=(0, 12, 12), config=cfg)
    fcfg = PsfFitConfig(max_iter=6, grtol=0.0)
    p_d, f_d, _ = fit_psf_streamed(
        model, model.init_params(), (PHASE,),
        streamed_fit_stats(x_dense, data, PSF_SHAPE), fcfg)
    p_t, f_t, _ = fit_psf_streamed(
        model, model.init_params(), (PHASE,),
        streamed_fit_stats(x_tiled, data, PSF_SHAPE), fcfg)
    np.testing.assert_allclose(np.asarray(p_t.phase), np.asarray(p_d.phase),
                               atol=0.12)
