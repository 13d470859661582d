"""STED PSF model (models/sted.py).

Beyond parity — the reference models widefield only. Anchors: exact
confocal reduction at zeta=0, monotone resolution gain with saturation
(lateral for the donut, axial for the bottle), aberration coupling through
the shared pupil, and zeta recovery from a bead stack via the STED family.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.models.confocal import ConfocalConfig
from microtipi_tpu.models.microscope import STED
from microtipi_tpu.models.sted import STEDConfig

KW = dict(shape=(16, 48, 48), na=1.4, wavelength=600e-9, ni=1.518,
          dxy=30e-9, dz=100e-9, dtype=jnp.float64)


def _fwhm(profile_centered, spacing):
    p = np.asarray(profile_centered)
    p = p / p.max()
    above = np.where(p >= 0.5)[0]
    return (above.max() - above.min() + 1) * spacing


def _lateral_profile(h):
    """Center row of the focal plane, centered layout (h is corner-origin)."""
    return np.fft.fftshift(np.asarray(h)[0])[np.asarray(h).shape[1] // 2]


def _axial_profile(h):
    """On-axis z line through focus, centered layout."""
    return np.fft.fftshift(np.asarray(h)[:, 0, 0])


def test_sted_zeta_zero_is_confocal_and_resolution_scales():
    conf = ConfocalConfig(wavelength_exc=640e-9, pinhole=100e-9, **KW)
    hc = conf.compute_psf(conf.init_params())
    fwhm_by_zeta = {}
    for zeta in (0.0, 10.0, 30.0):
        sted = STEDConfig(wavelength_exc=640e-9, wavelength_dep=775e-9,
                          pinhole=100e-9, saturation=zeta, **KW)
        h = jax.jit(sted.compute_psf)(sted.init_params())
        assert float(h.min()) >= 0.0
        assert float(h.sum()) == pytest.approx(1.0, rel=1e-10)
        if zeta == 0.0:
            np.testing.assert_allclose(np.asarray(h), np.asarray(hc), atol=1e-12)
        fwhm_by_zeta[zeta] = _fwhm(_lateral_profile(h), KW["dxy"])
    # donut: lateral FWHM shrinks strongly (measured 150 -> 90 -> 30 nm)
    assert fwhm_by_zeta[30.0] < 0.5 * fwhm_by_zeta[0.0]
    assert fwhm_by_zeta[30.0] <= fwhm_by_zeta[10.0] <= fwhm_by_zeta[0.0]


def test_sted_bottle_shrinks_axially():
    mk = lambda z: STEDConfig(wavelength_exc=640e-9, wavelength_dep=775e-9,
                              pinhole=100e-9, depletion="bottle",
                              saturation=z, **KW)
    ax = {}
    for zeta in (0.0, 30.0):
        h = mk(zeta).compute_psf(mk(zeta).init_params())
        ax[zeta] = _fwhm(_axial_profile(h), KW["dz"])
    assert ax[30.0] < 0.5 * ax[0.0]
    with pytest.raises(ValueError, match="depletion"):
        STEDConfig(depletion="nope", **KW)


def test_sted_donut_zero_survives_and_aberrations_fill_it():
    """The vortex null is exact on axis for an unaberrated pupil; coma-like
    aberration partially fills it (the coupling blind STED fitting needs)."""
    sted = STEDConfig(wavelength_exc=640e-9, wavelength_dep=775e-9,
                      n_phase=6, radial=False, **KW)
    p0 = sted.init_params()
    d0 = sted.depletion_intensity(p0)
    # corner-origin: the optical axis at the focal plane is (0, 0, 0)
    assert float(d0[0, 0, 0]) < 1e-4
    # even aberrations (defocus/astigmatism, indices 0-2 after the full-basis
    # offset) PRESERVE a vortex null; odd ones (coma, indices 3-4) fill it —
    # inject coma and require a physically meaningful floor, not a ratio to
    # the machine-zero unaberrated null (measured 5.5e-33)
    p_even = p0._replace(phase=jnp.asarray([0.6, 0.6, 0.6, 0.0, 0.0, 0.0]))
    assert float(sted.depletion_intensity(p_even)[0, 0, 0]) < 1e-6
    p_coma = p0._replace(phase=jnp.asarray([0.0, 0.0, 0.0, 0.6, 0.6, 0.0]))
    assert float(sted.depletion_intensity(p_coma)[0, 0, 0]) > 1e-3


def test_sted_zeta_recovered_from_bead_stack():
    """The STED family is fittable: recover an injected saturation factor
    from a bead measurement (the instrument's resolution calibration)."""
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig, fit_psf_beads

    sted = STEDConfig(wavelength_exc=640e-9, wavelength_dep=775e-9,
                      pinhole=100e-9, saturation=1.0, **KW)
    true = sted.init_params()._replace(sted=jnp.asarray([12.0]))
    rng = np.random.default_rng(0)
    bead = 1e5 * np.asarray(sted.compute_psf(true)) \
        + 5.0 + 1.0 * rng.standard_normal(KW["shape"])
    res, _amp = fit_psf_beads(sted, jnp.asarray(bead), families=(STED,),
                              config=PsfFitConfig(max_iter=40, grtol=1e-12))
    assert float(res.params.sted[0]) == pytest.approx(12.0, rel=0.15)
