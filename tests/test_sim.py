"""Structured-illumination reconstruction (jobs/sim.py).

Pinned: exact band separation, pattern frequency/phase self-calibration,
the resolution doubling itself (a point pair unresolvable in the
deconvolved widefield image splits in the SIM reconstruction), and
broadband-scene recovery.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from microtipi_tpu.jobs.sim import (
    estimate_sim_pattern,
    reconstruct_sim,
    separate_bands,
    simulate_sim,
)
from microtipi_tpu.models.widefield import WideFieldConfig

NY = NX = 64
DXY = 80e-9


def _psf_otf():
    m = WideFieldConfig(shape=(1, NY, NX), na=1.4, wavelength=500e-9,
                        ni=1.518, dxy=DXY, dz=120e-9, dtype=jnp.float64)
    h = m.compute_psf(m.init_params())[0]
    h = h / jnp.sum(h)
    return h, jnp.fft.fft2(h.astype(jnp.complex128))


def _patterns(frac=0.8, angles=3, phases=3):
    # incoherent cutoff 2 NA / lambda in cycles/px
    cutoff = 2 * 1.4 / 500e-9 * DXY
    k = frac * cutoff
    a_k = np.stack([
        [k * np.sin(t), k * np.cos(t)]
        for t in np.pi / angles * np.arange(angles)
    ])
    ph = np.tile(2 * np.pi / phases * np.arange(phases), (angles, 1))
    return a_k, ph


def _scene(seed=0):
    rng = np.random.default_rng(seed)
    x = np.zeros((NY, NX))
    for _ in range(14):
        x[rng.integers(8, 56), rng.integers(8, 56)] = rng.uniform(50, 100)
    x[20:44, 30] = 60.0
    return jnp.asarray(x)


def test_band_separation_is_exact():
    x = _scene()
    _h, otf = _psf_otf()
    a_k, ph = _patterns()
    data = simulate_sim(x, otf, a_k, ph, modulation=0.9)
    bands = separate_bands(data, ph, modulation=0.9)
    s = jnp.fft.fft2(x.astype(jnp.complex128))
    for a in range(a_k.shape[0]):
        np.testing.assert_allclose(np.asarray(bands[a, 0]),
                                   np.asarray(otf * s), atol=1e-6)
        from microtipi_tpu.jobs.sim import _phase_ramp

        ramp = _phase_ramp((NY, NX), a_k[a], jnp.float64)
        s_minus = jnp.fft.fft2(x * ramp)   # S(k - p)
        s_plus = jnp.fft.fft2(x * jnp.conj(ramp))
        np.testing.assert_allclose(np.asarray(bands[a, 1]),
                                   np.asarray(otf * s_minus), atol=1e-6)
        np.testing.assert_allclose(np.asarray(bands[a, 2]),
                                   np.asarray(otf * s_plus), atol=1e-6)


def test_pattern_self_calibration():
    x = _scene(1)
    _h, otf = _psf_otf()
    a_k, ph = _patterns()
    true_k = a_k + np.array([[0.4 / NY, -0.3 / NX]] * 3)
    true_ph = ph + np.array([[0.5], [-0.3], [0.2]])
    data = simulate_sim(x, otf, true_k, true_ph, modulation=0.9)
    est_k, est_ph = estimate_sim_pattern(data, otf, a_k, ph, modulation=0.9)
    # measured: 0.004-bin frequency, 0.012-rad phase on this scene
    np.testing.assert_allclose(est_k, true_k, atol=0.02 / NY)
    dphi = (est_ph - ph)[:, 0]
    np.testing.assert_allclose(dphi, [0.5, -0.3, 0.2], atol=0.05)

    # and the reconstruction driven by the ESTIMATED parameters matches
    # the truth-driven one closely
    rec_est = reconstruct_sim(data, otf, est_k, est_ph, modulation=0.9,
                              wiener=1e-3).x
    rec_true = reconstruct_sim(data, otf, true_k, true_ph, modulation=0.9,
                               wiener=1e-3).x
    num = float(jnp.linalg.norm(rec_est - rec_true))
    den = float(jnp.linalg.norm(rec_true))
    assert num / den < 0.05, num / den


def test_resolution_doubling_on_a_point_pair():
    """The SIM acid test: a pair below the widefield Rayleigh limit."""
    _h, otf = _psf_otf()
    # points at x = 31 and 33: 160 nm apart < 218 nm Rayleigh at NA 1.4
    x = np.zeros((NY, NX))
    x[32, 31] = 100.0
    x[32, 33] = 100.0
    x = jnp.asarray(x)
    a_k, ph = _patterns()
    data = simulate_sim(x, otf, a_k, ph, modulation=0.9)

    rec = reconstruct_sim(data, otf, a_k, ph, modulation=0.9,
                          wiener=1e-3).x
    plain = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(
        x.astype(jnp.complex128)) * otf))

    def valley_peak(img, scale):
        row = np.asarray(img)[32 * scale]
        p1, p2 = row[31 * scale], row[33 * scale]
        return row[32 * scale] / max((p1 + p2) / 2, 1e-12)

    vp_wf = valley_peak(plain, 1)
    vp_sim = valley_peak(rec, 2)
    assert vp_wf > 0.9, vp_wf   # widefield: fully merged
    assert vp_sim < 0.6, vp_sim  # SIM: resolved


def test_reconstruction_recovers_broadband_scene():
    x = _scene(2)
    _h, otf = _psf_otf()
    a_k, ph = _patterns()
    data = simulate_sim(x, otf, a_k, ph, modulation=0.9)
    data = data + 0.01 * float(jnp.max(data)) * jax.random.normal(
        jax.random.PRNGKey(0), data.shape, dtype=jnp.float64)
    rec = reconstruct_sim(data, otf, a_k, ph, modulation=0.9,
                          wiener=5e-3).x
    # compare on the fine grid: upsample truth by Fourier zero-pad
    xs = jnp.fft.fft2(x.astype(jnp.complex128))
    def up(spec):
        big = np.zeros((2 * NY, 2 * NX), np.complex128)
        h2, w2 = NY // 2, NX // 2
        sp = np.asarray(spec)
        big[:h2, :w2] = sp[:h2, :w2]
        big[:h2, -(NX - w2):] = sp[:h2, w2:]
        big[-(NY - h2):, :w2] = sp[h2:, :w2]
        big[-(NY - h2):, -(NX - w2):] = sp[h2:, w2:]
        return np.fft.ifft2(big).real

    x_fine = up(xs)
    r = np.asarray(rec)

    def ncc(a, b):
        a = a - a.mean()
        b = b - b.mean()
        return float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))

    wf = np.asarray(jnp.real(jnp.fft.ifft2(
        jnp.fft.fft2(x.astype(jnp.complex128)) * otf)))
    wf_fine = up(np.fft.fft2(wf))
    assert ncc(r, x_fine) > ncc(wf_fine, x_fine) + 0.05, (
        ncc(r, x_fine), ncc(wf_fine, x_fine))


def test_validation():
    a_k, ph = _patterns()
    with pytest.raises(ValueError, match="A, P"):
        separate_bands(jnp.zeros((3, NY, NX)), ph)
    with pytest.raises(ValueError, match="3 pattern phases"):
        separate_bands(jnp.zeros((3, 2, NY, NX)), ph[:, :2])
