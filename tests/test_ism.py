"""ISM / Airyscan model and reconstruction (models/ism.py, jobs/ism.py).

Pinned claims: hex-array combinatorics, center-element == ideal confocal,
the half-offset element displacement physics, the reassignment identity
(reassigned element PSFs == ISMConfig.compute_psf), the resolution gain,
joint-MLE reconstruction, and the PsfModel protocol (fits run on
reassembled ISM images).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from microtipi_tpu.jobs.ism import ism_reassign, ism_richardson_lucy
from microtipi_tpu.models.confocal import ConfocalConfig
from microtipi_tpu.models.ism import ISMConfig, hex_offsets


def _model(rings=1, pitch_px=2.0, pinhole=0.0, **kw):
    base = dict(shape=(6, 24, 24), na=1.2, wavelength=520e-9,
                wavelength_exc=488e-9, ni=1.33, dxy=60e-9, dz=200e-9,
                n_phase=2, radial=True, dtype=jnp.float64)
    base.update(kw)
    return ISMConfig(element_pitch=pitch_px * base["dxy"], rings=rings,
                     pinhole=pinhole, **base)


def test_hex_offsets_combinatorics():
    for r, k in [(1, 7), (2, 19), (3, 37)]:
        off = hex_offsets(r, 1.0)
        assert off.shape == (k, 2)
        # center first, array symmetric (sums to zero)
        np.testing.assert_allclose(off[0], [0.0, 0.0])
        np.testing.assert_allclose(off.sum(0), [0.0, 0.0], atol=1e-12)
        # nearest-neighbor distance = pitch
        d01 = np.hypot(*(off[1] - off[0]))
        assert d01 == pytest.approx(1.0)


def test_config_validation():
    with pytest.raises(ValueError, match="element_pitch"):
        ISMConfig(shape=(4, 16, 16), na=1.2, wavelength=520e-9, ni=1.33,
                  dxy=60e-9, dz=200e-9)
    m = _model()
    with pytest.raises(ValueError, match="center-out element"):
        ism_reassign(m, jnp.zeros((3,) + m.shape))


def test_center_element_is_ideal_confocal():
    m = _model(rings=1)
    conf = ConfocalConfig(shape=m.shape, na=m.na, wavelength=m.wavelength,
                          wavelength_exc=m.wavelength_exc, ni=m.ni,
                          dxy=m.dxy, dz=m.dz, n_phase=2, radial=True,
                          dtype=jnp.float64, pinhole=0.0)
    p = m.init_params()._replace(phase=jnp.asarray([0.2, -0.1]))
    hk = m.compute_psfs(p)
    h0 = hk[0] / jnp.sum(hk[0])  # element 0 = center (center-out order)
    hc = conf.compute_psf(p)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(hc), atol=1e-12)


def test_element_psf_peaks_at_half_offset():
    m = _model(rings=1, pitch_px=4.0)  # d = 4 px -> peak at ~2 px
    p = m.init_params()
    # centered layout per volume (roll on the 4D stack would shift K too)
    hk = np.fft.fftshift(np.asarray(m.compute_psfs(p)), axes=(1, 2, 3))
    off = m.offsets() / m.dxy  # pixels
    nz, ny, nx = m.shape
    for k in range(1, m.n_elements):
        z, y, x = np.unravel_index(np.argmax(hk[k]), m.shape)
        expect_y = ny // 2 + off[k, 0] / 2
        expect_x = nx // 2 + off[k, 1] / 2
        assert abs(y - expect_y) <= 1.1 and abs(x - expect_x) <= 1.1, (
            k, (y, x), (expect_y, expect_x))


def test_reassignment_identity_and_resolution_gain():
    m = _model(rings=2, pitch_px=2.0)
    p = m.init_params()._replace(phase=jnp.asarray([0.15, -0.05]))
    hk = m.compute_psfs(p)
    # identity: reassembling the element PSFs IS the protocol PSF
    h_re = ism_reassign(m, hk)
    h_protocol = m.compute_psf(p)
    np.testing.assert_allclose(np.asarray(h_re / jnp.sum(h_re)),
                               np.asarray(h_protocol), atol=1e-12)

    # resolution: the reassigned PSF concentrates flux ~2x over the plain
    # sum (= open pinhole) — the ISM gain (second MOMENTS are tail-
    # dominated and move little; peak concentration is the right metric,
    # measured ratio 2.05 at this geometry)
    h_sum = jnp.sum(hk, axis=0)
    ratio = float(jnp.max(h_protocol) / jnp.max(h_sum / jnp.sum(h_sum)))
    assert ratio > 1.5, ratio


def test_element_aperture_broadens_detection():
    sharp = _model(rings=1, pinhole=0.0)
    wide = _model(rings=1, pinhole=2 * 60e-9)
    p = sharp.init_params()
    h_s = np.asarray(sharp.compute_psfs(p))
    h_w = np.asarray(wide.compute_psfs(p))
    assert h_s.shape == h_w.shape
    # aperture integration must lower the joint peak (flux conserved)
    assert h_w.max() < h_s.max()
    assert np.sum(h_w) == pytest.approx(1.0, rel=1e-10)


def test_joint_mle_reconstruction_beats_raw_sum():
    m = _model(rings=1, pitch_px=2.0)
    p = m.init_params()
    hk = m.compute_psfs(p)
    obj = np.zeros(m.shape)
    obj[3, 8, 8] = 60.0
    obj[3, 8, 13] = 60.0  # a close pair
    obj[2, 16, 16] = 80.0
    obj = jnp.asarray(obj)

    def blur(h):
        return jnp.fft.irfftn(jnp.fft.rfftn(h) * jnp.fft.rfftn(obj),
                              s=m.shape)

    data = jnp.stack([blur(hk[k]) for k in range(m.n_elements)])
    rec = ism_richardson_lucy(m, p, data, iterations=40)
    raw = jnp.sum(data, axis=0)

    def err(a):
        a = a * jnp.sum(obj) / jnp.sum(a)
        return float(jnp.linalg.norm(a - obj))

    assert err(rec) < 0.5 * err(raw), (err(rec), err(raw))
    assert np.isfinite(np.asarray(rec)).all()


def test_protocol_fit_on_reassembled_image():
    """PSF fitting works unchanged on ISM images (compute_psf protocol)."""
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig, fit_psf
    from microtipi_tpu.models.microscope import PHASE

    m = _model(rings=1, pitch_px=2.0)
    truth = m.init_params()._replace(phase=jnp.asarray([0.25, 0.0]))
    rng = np.random.default_rng(0)
    obj = jnp.asarray(np.abs(rng.standard_normal(m.shape)) * 10)
    h = m.compute_psf(truth)
    data = jnp.fft.irfftn(jnp.fft.rfftn(h) * jnp.fft.rfftn(obj), s=m.shape)
    res = fit_psf(m, m.init_params(), PHASE, data, obj,
                  config=PsfFitConfig(max_iter=25, grtol=1e-10))
    assert float(jnp.abs(res.params.phase[0] - 0.25)) < 0.05, res.params.phase


def test_element_gain_self_calibration():
    """Known per-element gains + a constant offset recover exactly from the
    totals-vs-light-share identity; correction restores the gain-free
    reassignment."""
    from microtipi_tpu.jobs.ism import ism_element_gains

    m = _model(rings=1, pitch_px=2.0)
    p = m.init_params()
    hk = m.compute_psfs(p)
    obj = jnp.asarray(np.abs(np.random.default_rng(0).standard_normal(m.shape)) * 20)
    clean = jnp.stack([
        jnp.fft.irfftn(jnp.fft.rfftn(hk[k]) * jnp.fft.rfftn(obj), s=m.shape)
        for k in range(m.n_elements)])
    g_true = jnp.asarray(np.linspace(0.7, 1.3, m.n_elements))
    g_true = g_true / jnp.mean(g_true)

    # offset-free data: exact recovery
    g = ism_element_gains(m, p, clean * g_true[:, None, None, None])
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_true), rtol=1e-10)

    # known dark level handled explicitly
    data = clean * g_true[:, None, None, None] + 0.5
    g2 = ism_element_gains(m, p, data, background=0.5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g_true), rtol=1e-10)

    re_corrected = ism_reassign(m, data - 0.5, gains=g2)
    re_free = ism_reassign(m, clean)
    np.testing.assert_allclose(np.asarray(re_corrected), np.asarray(re_free),
                               atol=1e-8 * float(jnp.max(re_free)))

    # median mode is for SPARSE scenes (mostly-background voxels)
    sparse = np.zeros(m.shape)
    sparse[3, 8, 8] = 100.0
    sparse = jnp.asarray(sparse)
    cs = jnp.stack([
        jnp.fft.irfftn(jnp.fft.rfftn(hk[k]) * jnp.fft.rfftn(sparse), s=m.shape)
        for k in range(m.n_elements)])
    g3 = ism_element_gains(
        m, p, cs * g_true[:, None, None, None] + 0.5, background="median")
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g_true), rtol=0.05)


def test_dead_element_is_excluded_not_amplified():
    """A dead element (zero signal, residual noise) must be dropped from
    the gain-corrected reassignment — clamp-and-divide would amplify its
    noise by 1/eps (review finding)."""
    from microtipi_tpu.jobs.ism import ism_element_gains

    m = _model(rings=1, pitch_px=2.0)
    p = m.init_params()
    hk = m.compute_psfs(p)
    obj = jnp.asarray(np.abs(np.random.default_rng(1).standard_normal(m.shape)) * 20)
    clean = jnp.stack([
        jnp.fft.irfftn(jnp.fft.rfftn(hk[k]) * jnp.fft.rfftn(obj), s=m.shape)
        for k in range(m.n_elements)])
    noise = 1e-3 * np.random.default_rng(2).standard_normal(clean.shape)
    data = np.asarray(clean) + noise
    data[3] = noise[3]  # element 3 is dead: pure residual noise
    data = jnp.asarray(data)
    g = ism_element_gains(m, p, data)
    assert abs(float(g[3])) < 1e-3  # ~zero (possibly negative) gain
    re = ism_reassign(m, data, gains=g)
    live = ism_reassign(m, data.at[3].set(0.0),
                        gains=g.at[3].set(1.0))
    # the dead element contributes nothing — identical to zeroing it
    np.testing.assert_allclose(np.asarray(re), np.asarray(live), atol=1e-10)
    assert np.isfinite(np.asarray(re)).all()
