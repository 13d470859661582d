"""Light-sheet (SPIM) PSF model: sheet physics, fittability, loop integration.

Beyond-parity family (``models/lightsheet.py``): widefield detection pupil
(reference parity arm, ``WideFieldModel.java:60-78``) times a Gaussian
excitation-sheet axial profile with a fittable (z0, w0) SHEET family.
"""

import dataclasses

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from microtipi_tpu.jobs.blind import BlindDeconvConfig, blind_deconvolve
from microtipi_tpu.jobs.deconv import DeconvolutionConfig
from microtipi_tpu.jobs.psf_fit import PsfFitConfig, fit_psf, fit_psf_beads
from microtipi_tpu.models.lightsheet import LightSheetConfig
from microtipi_tpu.models.microscope import DEFOCUS, SHEET
from microtipi_tpu.models.widefield import WideFieldConfig, WideFieldParams
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

KW = dict(na=0.8, wavelength=520e-9, ni=1.33, dxy=150e-9, dz=400e-9)


def _model(shape=(16, 32, 32), **kw):
    merged = dict(KW, sheet_na=0.15, wavelength_exc=488e-9, dtype=jnp.float64)
    merged.update(kw)
    return LightSheetConfig(shape=shape, **merged)


def test_sheet_confines_axially_vs_widefield():
    m = _model()
    p = m.init_params()
    h = np.asarray(jax.jit(m.compute_psf)(p))
    np.testing.assert_allclose(h.sum(), 1.0, rtol=1e-12)
    assert h.min() >= 0
    wf = WideFieldConfig(shape=m.shape, dtype=jnp.float64, **KW)
    hw = np.asarray(wf.compute_psf(WideFieldParams(p.defocus, p.phase, p.modulus)))
    hw = hw / hw.sum()
    # plane energy far from focus: the widefield PSF spreads energy equally
    # over planes (Parseval: each |FFT2(A)|^2 plane sums to sum|rho|^2), the
    # sheet must dim the far plane by orders of magnitude. At Nz/2 the
    # centered z is 3.2 um ~ 3.1 sheet waists -> exp(-2*3.1^2) ~ 5e-9.
    iz = m.shape[0] // 2
    assert h[iz].sum() < 1e-3 * hw[iz].sum()
    # nearer plane (1.55 waists): dimmed, but only by ~1-2 orders
    iq = m.shape[0] // 4
    assert h[iq].sum() < 0.2 * hw[iq].sum()


def test_sheet_profile_energy_conserving_divergence():
    """Gaussian-beam divergence widens w(x) but conserves the axial integral
    (intensity ~ w0/w(x)); the z=0 peak therefore dims away from the waist."""
    m = _model(shape=(32, 64, 64))
    prof = np.asarray(m.sheet_profile(m.init_params().sheet))[:, 0, :]
    integ = prof.sum(axis=0)  # axial integral per x column
    np.testing.assert_allclose(integ, integ[0], rtol=1e-6)
    assert prof[0, 32] < 0.95 * prof[0, 0]  # FOV-edge peak is dimmer
    # ideal-sheet variant: x-uniform, shape (Nz, 1, 1)
    m2 = dataclasses.replace(m, divergence=False)
    p2 = np.asarray(m2.sheet_profile(m2.init_params().sheet))
    assert p2.shape == (32, 1, 1) and p2[0, 0, 0] == 1.0


def test_sheet_offset_shifts_the_profile():
    m = _model()
    sheet = m.init_params().sheet
    off = sheet.at[0].set(2 * m.dz)  # two planes up
    prof = np.asarray(m.sheet_profile(off))[:, 0, 0] if not m.divergence else \
        np.asarray(m.sheet_profile(off))[:, 0, m.shape[2] // 2]
    assert np.argmax(prof) == 2  # corner-origin: wrapped plane index +2


def test_sheet_family_is_fittable():
    """fit_psf(SHEET) recovers a sheet offset and waist from sparse data —
    the sheet-alignment calibration workflow."""
    shape = (16, 32, 32)
    m = _model(shape=shape)
    p0 = m.init_params()
    true = p0._replace(sheet=jnp.asarray([0.5e-6, 1.25 * m.waist]))
    rng = np.random.default_rng(0)
    obj = np.zeros(shape)
    for _ in range(6):
        obj[rng.integers(0, 16), rng.integers(4, 28), rng.integers(4, 28)] = \
            rng.uniform(50, 100)
    obj = jnp.asarray(obj)
    data = convolve(obj, convolve_spectrum(m.compute_psf(true)), shape)
    res = fit_psf(m, p0, SHEET, data, obj,
                  config=PsfFitConfig(max_iter=40, grtol=0.0), precondition=True)
    got = np.asarray(res.params.sheet)
    assert abs(got[0] - 0.5e-6) < 0.1e-6
    assert abs(got[1] - 1.25 * m.waist) < 0.05 * m.waist


def test_sheet_bead_calibration():
    """fit_psf_beads with the joint (DEFOCUS, SHEET) families — the
    instrument-alignment calibration against a bead stack.

    The true sheet offset is kept well under half a voxel (dz = 400 nm): a
    larger offset visibly moves the bead's apparent peak plane, and the
    integer z-centering in ``center_bead_stack`` then re-absorbs whole
    voxels of it (the same axial gauge the centering deliberately leaves
    to the fit — psf_fit.py docstring)."""
    shape = (16, 32, 32)
    m = _model(shape=shape)
    true = m.init_params()._replace(sheet=jnp.asarray([0.15e-6, 1.2 * m.waist]))
    bead = 5e3 * m.compute_psf(true)
    res, amp = fit_psf_beads(m, bead, families=(DEFOCUS, SHEET),
                             config=PsfFitConfig(max_iter=40, grtol=0.0))
    got = np.asarray(res.params.sheet)
    assert abs(got[0] - 0.15e-6) < 0.075e-6
    assert abs(got[1] - 1.2 * m.waist) < 0.05 * m.waist


def test_sheet_in_blind_loop_with_bead_anchor():
    """The SHEET family plugs into the blind loop (preconditioned like DEPTH),
    anchored by a bead stack — the supported light-sheet calibration workflow.

    Measured dead end (same protocol as BASELINE.md's rejected levers): a
    *fully blind* sheet-waist fit is non-identifiable — TV+positivity absorb
    axial blur into the object, and more budget moves the waist *further*
    from truth (1.5x-waist truth: 3 loops x 8 iters end at 1.21x, 5 x 20 at
    1.18x, monotonically away). So the test exercises the shipped remedy:
    ``blind_deconvolve(..., bead_data=...)`` keeps the bead measurement in
    every SHEET fit as an auxiliary data term (``psf_fit.bead_anchor_term``),
    which pins the waist the bead constrains directly."""
    shape = (16, 32, 32)
    m = _model(shape=shape)
    true = m.init_params()._replace(sheet=jnp.asarray([0.0, 1.5 * m.waist]))
    rng = np.random.default_rng(1)
    obj = jnp.asarray((rng.random(shape) > 0.98) * rng.random(shape) * 100)
    data = convolve(obj, convolve_spectrum(m.compute_psf(true)), shape)
    bead = 5e3 * m.compute_psf(true)
    cfg = BlindDeconvConfig(
        loops=3, families=(SHEET,), psf_max_iter=(8,),
        deconv=DeconvolutionConfig(mu=1e-3, epsilon=1.0, max_iter=10, grtol=0.0),
    )
    res = jax.jit(lambda d, b: blind_deconvolve(d, m, config=cfg, bead_data=b))(
        data, bead)
    w0 = float(res.params.sheet[1])
    assert abs(w0 - 1.5 * m.waist) < 0.1 * m.waist
    assert abs(float(res.params.sheet[0])) < m.dz  # z0 stays bounded
    assert np.isfinite(np.asarray(res.obj)).all()


# ---------------------------------------------------------------------------
# Structured (Bessel / lattice) sheets
# ---------------------------------------------------------------------------


def _structured(mode="bessel", shape=(64, 16, 16), dz=50e-9, **kw):
    from microtipi_tpu.models.lightsheet import StructuredSheetConfig

    base = dict(shape=shape, na=1.1, wavelength=520e-9, wavelength_exc=488e-9,
                ni=1.33, dxy=100e-9, dz=dz, n_phase=0, radial=True,
                dtype=jnp.float64, sheet_mode=mode)
    base.update(kw)
    return StructuredSheetConfig(**base)


def _centered_profile(m, sheet=None):
    if sheet is None:
        sheet = m.init_params().sheet
    s = np.asarray(m.sheet_profile(jnp.asarray(sheet, jnp.float64)))[:, 0, 0]
    return np.fft.fftshift(s)  # centered along z


def test_structured_sheet_validation():
    from microtipi_tpu.models.lightsheet import StructuredSheetConfig

    with pytest.raises(ValueError, match="sheet_mode"):
        _structured(mode="airy")
    with pytest.raises(ValueError, match="sheet_na_min"):
        _structured(sheet_na_min=0.6, sheet_na_max=0.5)


def test_bessel_sheet_main_lobe_and_tails():
    """Main-lobe thickness ~ lambda_exc/(2 NA_max); a THIN annulus carries
    more far-tail energy than a thick one (the Bessel confinement trade)."""
    thin = _structured(sheet_na_min=0.52, sheet_na_max=0.55)
    thick = _structured(sheet_na_min=0.30, sheet_na_max=0.55)
    s_thin = _centered_profile(thin)
    s_thick = _centered_profile(thick)
    nz = s_thin.size
    for s in (s_thin, s_thick):
        assert s[nz // 2] == pytest.approx(1.0)  # unit peak at z=0
    # FWHM of the main lobe vs lambda/(2 NA_max) = 443 nm at these numbers
    half = np.where(s_thin[nz // 2:] < 0.5)[0][0]
    fwhm = 2 * half * thin.dz
    expect = thin._lambda_exc / (2 * thin.sheet_na_max)
    assert 0.4 * expect < fwhm < 2.0 * expect, (fwhm, expect)
    # tail energy beyond 3 FWHM: thin annulus must dominate
    far = nz // 2 + int(3 * expect / thin.dz)
    tail_thin = s_thin[far:].sum()
    tail_thick = s_thick[far:].sum()
    assert tail_thin > 2.0 * tail_thick, (tail_thin, tail_thick)


def test_lattice_sheet_period_and_scale():
    """Axial beam pair (u=0) -> cos^2 fringes of period pi/k_max; the
    fitted k-scale shrinks the period proportionally."""
    m = _structured(mode="lattice", lattice_ky=(0.0,), lattice_sigma=0.02)
    k_max = 2 * np.pi * m.sheet_na_max / m._lambda_exc
    period = np.pi / k_max
    def first_fringe(s):
        # first LOCAL max after the central lobe (global argmax can land on
        # a better-sampled later fringe)
        half = s[s.size // 2:]
        for i in range(2, half.size - 1):
            if half[i] > 0.5 and half[i] >= half[i - 1] and half[i] >= half[i + 1]:
                return i
        raise AssertionError("no fringe found")

    peak = first_fringe(_centered_profile(m))
    assert abs(peak * m.dz - period) < m.dz, (peak * m.dz, period)

    peak2 = first_fringe(_centered_profile(m, sheet=[0.0, 2.0]))  # 2x k-scale
    assert abs(peak2 * m.dz - period / 2) < m.dz, (peak2 * m.dz, period / 2)


def test_structured_sheet_offset_moves_profile():
    m = _structured()
    s0 = _centered_profile(m, sheet=[0.0, 1.0])
    s4 = _centered_profile(m, sheet=[4 * m.dz, 1.0])
    nz = s0.size
    assert np.argmax(s4) - np.argmax(s0) == 4
    np.testing.assert_allclose(np.roll(s0, 4)[8:-8], s4[8:-8], rtol=1e-6)


def test_structured_sheet_psf_and_bead_calibration():
    """compute_psf composes; (z0, scale) recover from a bead stack via the
    SHEET family (per-component preconditioning path)."""
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig, fit_psf_beads
    from microtipi_tpu.models.microscope import SHEET
    from microtipi_tpu.utils.arrays import roll

    m = _structured(shape=(16, 24, 24), dz=200e-9,
                    sheet_na_min=0.35, sheet_na_max=0.5)
    # sub-voxel z0: the integer-dz part is absorbed by the bead centering
    # (axial gauge, class docstring); scale is recovered up to sign (the
    # profile is even in scale) — both measured.
    truth = m.init_params()._replace(
        sheet=jnp.asarray([0.6 * m.dz, 1.15], jnp.float64))
    h = m.compute_psf(truth)
    assert float(jnp.min(h)) >= 0.0
    assert float(jnp.sum(h)) == pytest.approx(1.0, rel=1e-10)

    bead = 500.0 * np.asarray(roll(h))
    rng = np.random.default_rng(0)
    bead = bead + 0.002 * bead.max() * rng.standard_normal(bead.shape)
    fit, _amp = fit_psf_beads(
        m, jnp.asarray(bead), families=(SHEET,),
        config=PsfFitConfig(max_iter=60, grtol=1e-12))
    z0, scale = np.asarray(fit.params.sheet)
    assert abs(z0 - 0.6 * m.dz) < 0.1 * m.dz, z0
    assert abs(abs(scale) - 1.15) < 0.01, scale


def test_lattice_mask_validation_and_on_axis_weights():
    """Empty lattice_ky raises instead of a silent NaN profile, and the
    on-axis spots (u=0 or |u|=1) are not double-counted (review findings)."""
    m_bad = _structured(mode="lattice", lattice_ky=())
    with pytest.raises(ValueError, match="lattice_ky"):
        m_bad.sheet_profile(jnp.asarray([0.0, 1.0], jnp.float64))

    # u=1 (kz=0 pair) vs u=0 (ky=0 pair): both collapse one sign loop, so
    # total mask energy per u must match (2 spots each)
    m1 = _structured(mode="lattice", lattice_ky=(1.0,), lattice_sigma=0.02)
    m0 = _structured(mode="lattice", lattice_ky=(0.0,), lattice_sigma=0.02)
    e1 = float(m1._illumination_mask()[0].sum())
    e0 = float(m0._illumination_mask()[0].sum())
    assert abs(e1 - e0) / e0 < 0.05, (e1, e0)
