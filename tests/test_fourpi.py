"""4Pi interferometric model (models/fourpi.py).

Pinned physics: axial interference fringes at ~lambda_exc/(2 ni), cavity
phase moving the focal fringe from bright to dark, the axial-resolution
ordering confocal > 4Pi-A > 4Pi-C, sidelobes (the reason 4Pi data needs
deconvolution), and cavity-phase calibration from a bead — the
instrument's alignment workflow — through the standard fit machinery.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from microtipi_tpu.models.confocal import ConfocalConfig
from microtipi_tpu.models.fourpi import FourPiConfig
from microtipi_tpu.models.microscope import CAVITY


def _model(fourpi_type="A", nz=64, **kw):
    base = dict(shape=(nz, 32, 32), na=1.2, wavelength=520e-9,
                wavelength_exc=488e-9, ni=1.518, dxy=80e-9, dz=40e-9,
                n_phase=2, radial=True, dtype=jnp.float64)
    base.update(kw)
    return FourPiConfig(fourpi_type=fourpi_type, **base)


def _axial(h):
    """Centered on-axis profile."""
    return np.fft.fftshift(np.asarray(h)[:, 0, 0])


def test_type_validation():
    with pytest.raises(ValueError, match="fourpi_type"):
        _model(fourpi_type="B")


def test_axial_fringes_at_half_wavelength_over_n():
    m = _model("A")
    h = m.compute_psf(m.init_params())
    assert float(jnp.sum(h)) == pytest.approx(1.0, rel=1e-12)
    prof = _axial(h)
    nz = prof.size
    # consecutive maxima spacing ~ lambda_exc / (2 ni) (excitation-arm
    # interference; the detection envelope modulates amplitudes, not spacing)
    period = m._lambda_exc / (2 * m.ni) / m.dz  # in samples, ~4.0
    peaks = [i for i in range(nz // 2, nz - 1)
             if prof[i] > prof[i - 1] and prof[i] >= prof[i + 1]
             and prof[i] > 0.01 * prof.max()]
    gaps = np.diff(peaks[:3])
    assert np.all(np.abs(gaps - period) <= 1.0), (gaps, period)


def test_cavity_phase_moves_the_focal_fringe():
    m = _model("A")
    p0 = m.init_params()
    h_bright = m.compute_psf(p0)
    h_dark = m.compute_psf(p0._replace(cavity=jnp.asarray([np.pi], jnp.float64)))
    # phi_c = pi: destructive interference at focus -> the on-axis focal
    # value collapses (the classic misaligned-cavity signature)
    assert float(h_dark[0, 0, 0]) < 0.1 * float(h_bright[0, 0, 0])


def _axial_fwhm(prof, dz):
    nz = prof.size
    c = np.argmax(prof)
    half = prof[c] / 2
    lo = c
    while lo > 0 and prof[lo] > half:
        lo -= 1
    hi = c
    while hi < nz - 1 and prof[hi] > half:
        hi += 1
    return (hi - lo) * dz


def test_axial_resolution_ordering_and_sidelobes():
    conf = ConfocalConfig(shape=(64, 32, 32), na=1.2, wavelength=520e-9,
                          wavelength_exc=488e-9, ni=1.518, dxy=80e-9,
                          dz=40e-9, n_phase=2, radial=True,
                          dtype=jnp.float64)
    w_conf = _axial_fwhm(_axial(conf.compute_psf(conf.init_params())), 40e-9)
    m_a = _model("A")
    prof_a = _axial(m_a.compute_psf(m_a.init_params()))
    w_a = _axial_fwhm(prof_a, 40e-9)
    m_c = _model("C")
    w_c = _axial_fwhm(_axial(m_c.compute_psf(m_c.init_params())), 40e-9)
    assert w_a < 0.5 * w_conf, (w_a, w_conf)  # the 4Pi axial gain
    assert w_c <= w_a
    # sidelobes: secondary axial maximum is a substantial fraction of the
    # main lobe — the artifact deconvolution exists to remove
    nz = prof_a.size
    c = np.argmax(prof_a)
    side = max(prof_a[i] for i in range(c + 2, nz - 1)
               if prof_a[i] > prof_a[i - 1] and prof_a[i] >= prof_a[i + 1])
    assert side > 0.1 * prof_a[c], side / prof_a[c]


def test_cavity_phase_calibrates_from_a_bead():
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig, fit_psf_beads
    from microtipi_tpu.utils.arrays import roll

    m = _model("A", nz=32)
    # |phi_c| * lambda/(4 pi ni) must stay under dz/2 or the bead
    # centering's integer-z snap re-gauges it across a fringe (class
    # docstring; measured: a 0.7 rad truth at dz=40 nm came back -0.61)
    truth = m.init_params()._replace(cavity=jnp.asarray([0.4], jnp.float64))
    bead = 2e3 * np.asarray(roll(m.compute_psf(truth)))
    rng = np.random.default_rng(0)
    bead = bead + 0.002 * bead.max() * rng.standard_normal(bead.shape)
    fit, _amp = fit_psf_beads(m, jnp.asarray(bead), families=(CAVITY,),
                              config=PsfFitConfig(max_iter=40, grtol=1e-12))
    assert float(jnp.abs(fit.params.cavity[0] - 0.4)) < 0.05, fit.params.cavity


def test_protocol_deconvolution_removes_ghosts():
    """Deconvolution with the true 4Pi PSF collapses the sidelobe ghosts —
    the end-to-end point of the family."""
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve

    m = _model("A", nz=32)
    h = m.compute_psf(m.init_params())
    obj = np.zeros(m.shape)
    obj[16, 16, 16] = 100.0
    obj = jnp.asarray(obj)
    data = jnp.fft.irfftn(jnp.fft.rfftn(h) * jnp.fft.rfftn(obj), s=m.shape)
    rec = deconvolve(data, h, config=DeconvolutionConfig(
        mu=1e-5, max_iter=80)).x

    def ghost(profile):
        # strongest value OUTSIDE +-2 planes of the main peak (the planes
        # next to the peak are main-lobe width, not ghosts)
        c = int(np.argmax(profile))
        mask = np.ones_like(profile, bool)
        mask[max(c - 2, 0):c + 3] = False
        return float(profile[mask].max() / max(profile[c], 1e-12))

    raw = np.asarray(data)[:, 16, 16]
    dec = np.asarray(rec)[:, 16, 16]
    assert ghost(raw) > 0.1  # the data genuinely carries ghosts
    assert ghost(dec) < 0.3 * ghost(raw), (ghost(raw), ghost(dec))
