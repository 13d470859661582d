"""Nonparametric pupil retrieval (jobs/phase_retrieval.py).

Beyond parity — the reference's pupil is always a Zernike expansion
(WideFieldModel.java:1588-1665). Anchors: a localized non-Zernike pupil
defect is recovered to a few percent (modulo the position gauges a bead
measurement cannot determine) where the parametric fit structurally cannot
represent it, and the Gerchberg-Saxton initialization is pinned as
load-bearing (plain gradient descent stalls in a twin basin).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.jobs.phase_retrieval import (
    project_phase,
    remove_position_gauges,
    retrieve_pupil,
)
from microtipi_tpu.jobs.psf_fit import PsfFitConfig
from microtipi_tpu.models.widefield import WideFieldConfig

SHAPE = (16, 48, 48)


def _scene(amp=3e6, seed=0):
    """Zernike aberrations + a localized Gaussian phase defect no truncated
    Zernike expansion can represent, imaged as a bright bead stack."""
    model = WideFieldConfig(shape=SHAPE, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=200e-9, n_phase=4, radial=True,
                            dtype=jnp.float64)
    params_true = model.init_params()._replace(
        phase=jnp.asarray([0.4, -0.25, 0.15, 0.0]))
    _, phi_zern, psi, mask = model.compute_pupil(params_true)
    yy, xx = np.meshgrid(np.fft.fftfreq(48) * 48, np.fft.fftfreq(48) * 48,
                         indexing="ij")
    defect = 0.8 * np.exp(-(((yy - 4) / 2.0) ** 2 + ((xx - 3) / 2.0) ** 2))
    phi_true = (phi_zern + jnp.asarray(defect)) * mask
    psf_true = model.compute_psf_from_pupil(phi_true)
    rng = np.random.default_rng(seed)
    bead = amp * np.asarray(psf_true) + 10.0 + 5.0 * rng.standard_normal(SHAPE)
    return model, phi_true, psi, mask, psf_true, jnp.asarray(bead)


def _gauge_err(model, phi, phi_true, psi, mask):
    a = np.asarray(remove_position_gauges(phi, mask, psi))
    b = np.asarray(remove_position_gauges(phi_true, mask, psi))
    m = np.asarray(mask)
    return np.linalg.norm((a - b) * m) / np.linalg.norm(b * m)


def test_retrieval_recovers_nonzernike_defect():
    """Measured: map error 0.048 at bead SNR ~6000 (gauge-fixed), where the
    best 4-mode parametric pupil is structurally >50% wrong."""
    model, phi_true, psi, mask, psf_true, bead = _scene()
    res = jax.jit(lambda d: retrieve_pupil(
        model, d, smooth=1e-2, config=PsfFitConfig(max_iter=300, grtol=1e-12)
    ))(bead)
    err = _gauge_err(model, res.phi, phi_true, psi, mask)
    assert err < 0.08
    # PSF synthesized at the retrieved pupil matches the true PSF closely
    psf_rel = float(jnp.linalg.norm(res.psf - psf_true)
                    / jnp.linalg.norm(psf_true))
    assert psf_rel < 0.05
    # the defect is invisible to the truncated Zernike world: projecting the
    # true map onto the basis and resynthesizing leaves a large residual
    coefs = project_phase(model, phi_true, mask)
    from microtipi_tpu.ops.pupil import synthesize_phase

    zern, _, _ = model._static()
    phi_param = synthesize_phase(coefs, jnp.asarray(zern), mask, model.radial)
    assert _gauge_err(model, phi_param, phi_true, psi, mask) > 0.5

    # the retrieved map's low-order content agrees with the true map's
    got = np.asarray(project_phase(
        model, remove_position_gauges(res.phi, mask, psi), mask))
    want = np.asarray(project_phase(
        model, remove_position_gauges(phi_true, mask, psi), mask))
    np.testing.assert_allclose(got, want, atol=0.08)


def test_gs_initialization_improves_basin():
    """Pinned: the GS transform-cycling start lands ~3x closer than plain
    VMLMB from the flat start (measured 0.048 vs 0.156 gauge-fixed; the
    gradient polish from a flat start line-search-stalls early)."""
    model, phi_true, psi, mask, psf_true, bead = _scene()
    cold = retrieve_pupil(model, bead, smooth=1e-2, init="params",
                          config=PsfFitConfig(max_iter=150, grtol=1e-12))
    gs = retrieve_pupil(model, bead, smooth=1e-2, init="gs",
                        config=PsfFitConfig(max_iter=150, grtol=1e-12))
    e_gs = _gauge_err(model, gs.phi, phi_true, psi, mask)
    e_cold = _gauge_err(model, cold.phi, phi_true, psi, mask)
    assert e_gs < 0.1
    assert e_cold > 2.0 * e_gs


def test_retrieval_fit_modulus_and_validation():
    model, phi_true, psi, mask, psf_true, bead = _scene()
    res = retrieve_pupil(model, bead, fit_modulus=True, smooth=1e-2,
                         config=PsfFitConfig(max_iter=40))
    assert res.rho is not None and float(res.rho.min()) >= 0.0
    assert np.isfinite(np.asarray(res.phi)).all()
    assert np.isfinite(np.asarray(res.psf)).all()
    # phase still lands in the right neighborhood with the extra freedom
    assert _gauge_err(model, res.phi, phi_true, psi, mask) < 0.25

    with pytest.raises(ValueError, match="shape"):
        retrieve_pupil(dataclasses.replace(model, shape=(8, 32, 32)), bead)
    with pytest.raises(ValueError, match="init"):
        retrieve_pupil(model, bead, init="nope")


def test_gauge_removal_is_projection():
    model, phi_true, psi, mask, _, _ = _scene()
    g1 = remove_position_gauges(phi_true, mask, psi)
    g2 = remove_position_gauges(g1, mask, psi)  # idempotent
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-10)
    # adding any gauge combination is removed exactly (wrapped/FFT-layout
    # ramps — a physical tilt in corner-origin coordinates)
    from microtipi_tpu.utils.grids import fft_index

    ky = jnp.asarray(fft_index(48), phi_true.dtype)
    shifted = (phi_true + 0.3 + 0.01 * ky[:, None] + 1e-7 * psi) * mask
    np.testing.assert_allclose(
        np.asarray(remove_position_gauges(shifted, mask, psi)),
        np.asarray(g1), atol=1e-8)


def _freq_field(n, dxy, f):
    """Sample a smooth function of PHYSICAL frequency on a wrapped n-grid."""
    from microtipi_tpu.utils.grids import fft_index

    k = fft_index(n) / (n * dxy)
    return f(k[:, None], k[None, :])


def test_resample_pupil_map_identity_grid():
    """Same grid in, same map out (within the support, masked route)."""
    from microtipi_tpu.jobs.phase_retrieval import resample_pupil_map

    model, phi_true, psi, mask, _, _ = _scene()
    out = resample_pupil_map(phi_true, 100e-9, (48, 48), 100e-9, mask=mask)
    np.testing.assert_allclose(np.asarray(out * mask),
                               np.asarray(phi_true * mask), atol=1e-12)
    # unmasked route: exact everywhere (integer source indices, t == 0)
    out2 = resample_pupil_map(phi_true, 100e-9, (48, 48), 100e-9)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(phi_true),
                               atol=1e-12)


def test_resample_pupil_map_physical_frequency():
    """A smooth function of physical frequency resampled from a 48@100nm
    grid onto a 64@80nm grid matches direct sampling on the destination,
    well inside the (source-covered) pupil support."""
    from microtipi_tpu.jobs.phase_retrieval import resample_pupil_map

    sigma = 2.0e6  # cycles/m
    f = lambda ky, kx: np.exp(-(ky**2 + kx**2) / (2 * sigma**2)) \
        + 0.3 * np.sin(ky / 1.5e6)
    cutoff = 3.5e6  # a pupil-like support well inside both Nyquists
    src = _freq_field(48, 100e-9, f)
    src_mask = (_freq_field(48, 100e-9, lambda ky, kx: ky**2 + kx**2)
                < cutoff**2).astype(np.float64)
    want = _freq_field(64, 80e-9, f)
    # interior = more than one source cell inside the cutoff, where the
    # masked route reduces to pure bilinear interpolation
    h_src = 1.0 / (48 * 100e-9)
    interior = (_freq_field(64, 80e-9, lambda ky, kx: ky**2 + kx**2)
                < (cutoff - 1.5 * h_src) ** 2)

    got = np.asarray(resample_pupil_map(
        jnp.asarray(src * src_mask), 100e-9, (64, 64), 80e-9,
        mask=jnp.asarray(src_mask)))
    err = np.abs(got - want)[interior]
    assert err.max() < 0.02  # bilinear on a smooth field at this sampling


def test_resample_pupil_map_mask_normalization_at_edge():
    """Support-edge pixels extrapolate from INSIDE the pupil: a constant
    field stays exactly constant under the masked route, while the raw
    route droops toward the zeros outside the support."""
    from microtipi_tpu.jobs.phase_retrieval import resample_pupil_map

    cutoff = 3.5e6
    src_mask = (_freq_field(48, 100e-9, lambda ky, kx: ky**2 + kx**2)
                < cutoff**2).astype(np.float64)
    src = src_mask.copy()  # constant 1 on the support

    got = np.asarray(resample_pupil_map(
        jnp.asarray(src), 100e-9, (64, 64), 80e-9, mask=jnp.asarray(src_mask)))
    kept = got != 0
    assert kept.any()
    np.testing.assert_allclose(got[kept], 1.0, atol=1e-12)

    raw = np.asarray(resample_pupil_map(jnp.asarray(src), 100e-9,
                                        (64, 64), 80e-9))
    assert ((raw > 0) & (raw < 0.99)).any()  # the one-pixel dark rim


def test_resample_pupil_map_zeroes_beyond_source_nyquist():
    """Destination frequencies the source never sampled come back 0."""
    from microtipi_tpu.jobs.phase_retrieval import resample_pupil_map

    src = np.ones((32, 32))
    # dst pitch half the source's: the outer half of the dst grid is beyond
    # the source Nyquist
    got = np.asarray(resample_pupil_map(jnp.asarray(src), 100e-9,
                                        (32, 32), 50e-9))
    from microtipi_tpu.utils.grids import fft_index

    k_dst = fft_index(32) / (32 * 50e-9)
    k_nyq_src = 1.0 / (2 * 100e-9)
    beyond = (np.abs(k_dst[:, None]) > k_nyq_src) \
        | (np.abs(k_dst[None, :]) > k_nyq_src)
    assert (got[beyond] == 0).all()
    assert (got[~beyond] != 0).any()
