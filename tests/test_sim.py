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


# ---------------------------------------------------------------------------
# 3D-SIM (3-beam, axial +-1 bands)
# ---------------------------------------------------------------------------

from microtipi_tpu.jobs.sim import (  # noqa: E402
    ORDERS_3D,
    reconstruct_sim3d,
    separate_bands_3d,
    sim3d_order_otfs,
    simulate_sim3d,
)


def _geom3d(nz=40, n=32, na=1.2, ni=1.33, wavelength=500e-9,
            dxy=80e-9, dz=150e-9):
    m = WideFieldConfig(shape=(nz, n, n), na=na, wavelength=wavelength,
                        ni=ni, dxy=dxy, dz=dz, dtype=jnp.float64)
    h = m.compute_psf(m.init_params())
    h = h / jnp.sum(h)
    # physical 3-beam pattern with the +-1 beams at the pupil edge:
    # lateral p = NA/lambda, axial q = ni (1 - cos theta) / lambda
    p = na / wavelength * dxy                      # cycles / lateral pixel
    cos_t = np.sqrt(1.0 - (na / ni) ** 2)
    q = ni * (1.0 - cos_t) / wavelength * dz       # cycles / z-plane
    return h, p, q


def _patterns3d(p, angles=3, phases=5):
    a_k = np.stack([[p * np.sin(t), p * np.cos(t)]
                    for t in np.pi / angles * np.arange(angles)])
    ph = np.tile(2 * np.pi / phases * np.arange(phases), (angles, 1))
    ph = ph + np.array([[0.0], [0.4], [-0.7]])[:angles]
    return a_k, ph


def test_band_separation_3d_is_exact():
    """The 3D analog of test_band_separation_is_exact: five orders unmixed
    noiselessly, B_m = O_m(k) S(k - m p) to float64 exactness."""
    rng = np.random.default_rng(3)
    nz, n = 8, 16
    x = jnp.asarray(rng.random((nz, n, n)) * 10.0)
    h, _p, _q = _geom3d(nz=nz, n=n)
    q, psi, m1, m2 = 0.23, 0.4, 0.8, 0.9
    a_k, ph = _patterns3d(0.3, angles=2, phases=5)
    data = simulate_sim3d(x, h, a_k, ph, q=q, psi=psi, m1=m1, m2=m2)
    assert data.shape == (2, 5, nz, n, n)
    bands = separate_bands_3d(data, ph)
    otfs = sim3d_order_otfs(h, q=q, psi=psi, m1=m1, m2=m2)

    from microtipi_tpu.jobs.sim import _phase_ramp

    for a in range(2):
        ramp = _phase_ramp((n, n), a_k[a], jnp.float64)[None]
        for i, m in enumerate(ORDERS_3D):
            xm = x * ramp ** m if m >= 0 else x * jnp.conj(ramp) ** (-m)
            want = otfs[i] * jnp.fft.fftn(xm.astype(jnp.complex128))
            got = np.asarray(bands[a, i])
            scale = float(np.abs(np.asarray(want)).max())
            np.testing.assert_allclose(got, np.asarray(want),
                                       atol=1e-9 * scale)


def test_sim3d_two_point_axial_resolution():
    """The 3D-SIM acid test: an axial point pair below the widefield axial
    limit (~660 nm here) merges in the widefield image and splits in the
    3D-SIM reconstruction — the axial +-1 bands at work."""
    nz, n = 40, 32
    h, p, q = _geom3d(nz=nz, n=n)
    x = np.zeros((nz, n, n))
    x[19, 16, 16] = 100.0  # 450 nm apart (3 planes at dz = 150 nm)
    x[22, 16, 16] = 100.0
    x = jnp.asarray(x)
    a_k, ph = _patterns3d(p)
    data = simulate_sim3d(x, h, a_k, ph, q=q)

    rec = reconstruct_sim3d(data, h, a_k, ph, q=q, wiener=1e-3).x
    wf = jnp.real(jnp.fft.ifftn(jnp.fft.fftn(x.astype(jnp.complex128))
                                * jnp.fft.fftn(h.astype(jnp.complex128))))

    prof_wf = np.asarray(wf)[:, 16, 16]
    prof_sim = np.asarray(rec)[:, 32, 32]
    # widefield: fully merged (midpoint as bright as the source planes)
    mid_wf = max(prof_wf[20], prof_wf[21])
    vp_wf = mid_wf / max(prof_wf[19], prof_wf[22])
    assert vp_wf > 0.9, vp_wf
    # 3D-SIM (fine z grid, 2x): clear dip between the two points
    vp_sim = prof_sim[41] / max(prof_sim[38], prof_sim[44])
    assert vp_sim < 0.6, vp_sim
    # and the peaks really are where the points are
    assert prof_sim[38] > 0 and prof_sim[44] > 0


def test_sim3d_no_axial_upsample_path():
    """upsample_z=False keeps the axial grid; the lateral story must hold."""
    nz, n = 16, 24
    h, p, q = _geom3d(nz=nz, n=n)
    x = np.zeros((nz, n, n))
    x[8, 8, 11] = 80.0
    x[8, 8, 13] = 80.0
    x = jnp.asarray(x)
    a_k, ph = _patterns3d(p)
    data = simulate_sim3d(x, h, a_k, ph, q=q)
    rec = reconstruct_sim3d(data, h, a_k, ph, q=q, wiener=1e-3,
                            upsample_z=False).x
    assert rec.shape == (nz, 2 * n, 2 * n)
    assert np.isfinite(np.asarray(rec)).all()
    row = np.asarray(rec)[8, 16]
    vp = row[24] / max(row[22], row[26])
    assert vp < 0.8, vp  # lateral pair resolved on the 2x grid


def test_sim3d_validation():
    h, p, q = _geom3d(nz=8, n=16)
    a_k, ph = _patterns3d(p, angles=2, phases=5)
    with pytest.raises(ValueError, match="A, P"):
        separate_bands_3d(jnp.zeros((2, 8, 16, 16)), ph)
    with pytest.raises(ValueError, match="5 pattern phases"):
        separate_bands_3d(jnp.zeros((2, 4, 8, 16, 16)), ph[:, :4])
    with pytest.raises(ValueError, match="phases"):
        separate_bands_3d(jnp.zeros((2, 5, 8, 16, 16)), ph[:1])
