"""Gibson-Lanni depth model + 2D deconvolution (BASELINE configs 1-2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
from microtipi_tpu.jobs.psf_fit import PsfFitConfig, fit_psf
from microtipi_tpu.models.gibson_lanni import DEPTH, GibsonLanniConfig
from microtipi_tpu.models.widefield import WideFieldConfig
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

KW = dict(na=1.3, wavelength=520e-9, ni=1.518, dxy=90e-9, dz=220e-9)


def test_gl_reduces_to_widefield_at_zero_depth():
    shape = (8, 32, 32)
    wf = WideFieldConfig(shape=shape, n_phase=4, dtype=jnp.float64, **KW)
    gl = GibsonLanniConfig(shape=shape, n_phase=4, dtype=jnp.float64, ns=1.38, depth=0.0, **KW)
    p_wf = wf.init_params()._replace(phase=jnp.asarray([0.2, -0.1, 0.3, 0.05]))
    p_gl = gl.init_params()._replace(phase=jnp.asarray([0.2, -0.1, 0.3, 0.05]))
    np.testing.assert_allclose(
        np.asarray(wf.compute_psf(p_wf)), np.asarray(gl.compute_psf(p_gl)), atol=1e-14
    )


def test_gl_depth_breaks_axial_symmetry():
    """Index mismatch at depth introduces spherical aberration: the PSF is no
    longer symmetric in +z/-z."""
    shape = (8, 32, 32)
    gl = GibsonLanniConfig(shape=shape, n_phase=0, dtype=jnp.float64, ns=1.33, depth=10e-6, **KW)
    psf = np.asarray(gl.compute_psf(gl.init_params()))
    asym = max(np.abs(psf[iz] - psf[8 - iz]).max() for iz in range(1, 4))
    assert asym > 1e-6
    # still a valid PSF
    assert psf.min() >= 0 and np.isfinite(psf).all()


def test_gl_depth_family_is_fittable():
    shape = (8, 32, 32)
    gl = GibsonLanniConfig(shape=shape, n_phase=0, dtype=jnp.float64, ns=1.36, depth=8e-6, **KW)
    true = gl.init_params()
    rng = np.random.default_rng(0)
    obj = jnp.asarray(rng.random(shape) * (rng.random(shape) > 0.99) * 100)
    data = convolve(obj, convolve_spectrum(gl.compute_psf(true)), shape)

    start = true._replace(depth=true.depth.at[1].set(4e-6))  # wrong depth
    res = fit_psf(gl, start, DEPTH, data, obj, config=PsfFitConfig(max_iter=60, grtol=1e-12))
    got_d = float(res.params.depth[1])
    assert abs(got_d - 8e-6) < 0.1 * abs(4e-6 - 8e-6)


def test_2d_nonblind_deconvolution():
    """BASELINE config 1: 2D deconvolution with a known PSF — every op in the
    chain (rfftn, TV, VMLMB) is rank-agnostic."""
    shape = (64, 64)
    rng = np.random.default_rng(0)
    # Piecewise-constant scene — the regime hyperbolic TV is built for.
    obj = np.zeros(shape)
    obj[10:25, 12:30] = 80.0
    obj[35:50, 40:55] = 120.0
    obj[40:46, 8:20] = 60.0
    obj = jnp.asarray(obj)
    # Gaussian corner-origin PSF
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    yy = np.minimum(yy, 64 - yy)
    xx = np.minimum(xx, 64 - xx)
    psf = np.exp(-(yy**2 + xx**2) / (2 * 2.5**2))
    psf = jnp.asarray(psf / psf.sum())
    data = convolve(obj, convolve_spectrum(psf), shape)
    data = data + 0.02 * jnp.asarray(rng.standard_normal(shape))

    res = deconvolve(data, psf, config=DeconvolutionConfig(mu=0.01, epsilon=1.0, max_iter=150, grtol=1e-9))
    # TV deconvolution recovers piecewise-constant structure ~6x better than
    # the blurred data (899 -> ~152 L2 on this scene).
    assert float(jnp.linalg.norm(res.x - obj)) < 0.25 * float(jnp.linalg.norm(data - obj))
    assert float(res.x.min()) >= 0.0


def test_gl_depth_in_blind_loop():
    """Full blind loop with the Gibson-Lanni DEPTH family as a fitted
    parameter (BASELINE config 2/3 composition): a known imaging depth is
    recovered while the object deconvolves."""
    from microtipi_tpu.jobs.blind import BlindDeconvConfig, blind_deconvolve
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (12, 24, 24)
    model = GibsonLanniConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                              dxy=100e-9, dz=250e-9, n_phase=0, ns=1.4,
                              dtype=jnp.float64)
    true = model.init_params()
    true = true._replace(depth=true.depth.at[1].set(3e-6))  # 3 um deep
    psf = model.compute_psf(true)
    rng = np.random.default_rng(0)
    obj = np.zeros(shape)
    obj[3:6, 6:18, 6:18] = 60.0
    obj[8:10, 12:20, 4:12] = 90.0
    data = convolve(jnp.asarray(obj), convolve_spectrum(psf), shape)
    data = data + 1e-4 * float(data.max()) * jnp.asarray(rng.standard_normal(shape))

    # Blind depth needs the measured levers: per-component preconditioning of
    # the DEPTH fit (automatic) and TV annealing — without the strong early
    # prior the object absorbs the depth aberration and d stalls ~1e-7
    # (measured; with the true object the fit recovers d exactly from 0).
    cfg = BlindDeconvConfig(
        loops=4, families=(DEPTH,), psf_max_iter=(20,),
        deconv=DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=8),
        mu_schedule=(0.5, 0.1, 0.02, 0.002),
    )
    res = blind_deconvolve(data, model, config=cfg)
    assert np.isfinite(np.asarray(res.deconv_f)).all()
    # right order of magnitude recovered (blind identifiability is partial)
    d_hat = float(res.params.depth[1])
    assert 1e-6 < d_hat < 6e-6, d_hat


# ---- confocal / two-photon families (models/confocal.py) -------------------


def test_confocal_matched_wavelength_ideal_pinhole():
    """lambda_exc == lambda_em, pinhole = 0: h is the normalized square of
    the widefield PSF (excitation and detection pupils coincide)."""
    from microtipi_tpu.models.confocal import ConfocalConfig

    shape = (6, 32, 32)
    wf = WideFieldConfig(shape=shape, n_phase=4, dtype=jnp.float64, **KW)
    cf = ConfocalConfig(shape=shape, n_phase=4, dtype=jnp.float64, **KW)
    phase = jnp.asarray([0.15, -0.2, 0.1, 0.05])
    h_wf = np.asarray(wf.compute_psf(wf.init_params()._replace(phase=phase)))
    h_cf = np.asarray(cf.compute_psf(cf.init_params()._replace(phase=phase)))
    ref = h_wf**2
    np.testing.assert_allclose(h_cf, ref / ref.sum(), rtol=1e-10, atol=1e-18)
    np.testing.assert_allclose(h_cf.sum(), 1.0, rtol=1e-12)


def test_two_photon_is_normalized_square():
    from microtipi_tpu.models.confocal import TwoPhotonConfig

    shape = (6, 32, 32)
    wf = WideFieldConfig(shape=shape, dtype=jnp.float64, **KW)
    tp = TwoPhotonConfig(shape=shape, dtype=jnp.float64, **KW)
    h = np.asarray(wf.compute_psf(wf.init_params()))
    ref = h**2
    np.testing.assert_allclose(
        np.asarray(tp.compute_psf(tp.init_params())), ref / ref.sum(), rtol=1e-12
    )


def test_confocal_is_sharper_than_widefield():
    """The headline property: lateral FWHM shrinks vs widefield (the product
    of two intensity PSFs narrows the central lobe)."""
    from microtipi_tpu.models.confocal import ConfocalConfig

    shape = (1, 64, 64)
    wf = WideFieldConfig(shape=shape, dtype=jnp.float64, **KW)
    cf = ConfocalConfig(shape=shape, wavelength_exc=488e-9, dtype=jnp.float64, **KW)

    def lateral_second_moment(h):
        h0 = np.fft.fftshift(h[0])
        h0 /= h0.sum()
        iy, ix = np.mgrid[: h0.shape[0], : h0.shape[1]]
        cy, cx = h0.shape[0] // 2, h0.shape[1] // 2
        return (h0 * ((iy - cy) ** 2 + (ix - cx) ** 2)).sum()

    m_wf = lateral_second_moment(np.asarray(wf.compute_psf(wf.init_params())))
    m_cf = lateral_second_moment(np.asarray(cf.compute_psf(cf.init_params())))
    assert m_cf < m_wf


def test_confocal_pinhole_widens_psf_monotonically():
    """Opening the pinhole re-admits out-of-focus detection light: the
    composite PSF's lateral spread grows with pinhole radius and approaches
    the excitation-only (two-photon-like) limit from below."""
    from microtipi_tpu.models.confocal import ConfocalConfig

    shape = (4, 48, 48)

    def spread(pinhole):
        cf = ConfocalConfig(shape=shape, pinhole=pinhole, dtype=jnp.float64, **KW)
        h = np.asarray(cf.compute_psf(cf.init_params()))
        h0 = np.fft.fftshift(h[0]) / h[0].sum()
        iy, ix = np.mgrid[:48, :48]
        return (h0 * ((iy - 24) ** 2 + (ix - 24) ** 2)).sum()

    s0, s1, s2 = spread(0.0), spread(200e-9), spread(600e-9)
    assert s0 < s1 < s2


def test_confocal_gradients_flow_and_fit_works():
    """The whole point of the shared-pupil design: autodiff drives the same
    PSF-fit machinery as widefield (PsfModel protocol)."""
    from microtipi_tpu.models.confocal import ConfocalConfig
    from microtipi_tpu.models.microscope import PHASE

    shape = (6, 24, 24)
    cf = ConfocalConfig(
        shape=shape, wavelength_exc=488e-9, pinhole=150e-9, n_phase=3,
        dtype=jnp.float64, **KW
    )
    true_phase = jnp.asarray([0.25, -0.15, 0.1])
    p_true = cf.init_params()._replace(phase=true_phase)
    psf_true = cf.compute_psf(p_true)

    # gradient of a scalar loss w.r.t. phase is finite and nonzero
    g = jax.grad(lambda p: jnp.sum(cf.compute_psf(p) ** 2))(p_true)
    assert np.isfinite(np.asarray(g.phase)).all()
    assert np.abs(np.asarray(g.phase)).max() > 0

    # blind-style fit: true object, recover injected coefficients
    rng = np.random.default_rng(3)
    obj = jnp.asarray(rng.random(shape), jnp.float64)
    data = convolve(obj, convolve_spectrum(psf_true), shape)
    res = fit_psf(
        cf, cf.init_params(), PHASE, data, obj,
        config=PsfFitConfig(max_iter=80),
    )
    np.testing.assert_allclose(np.asarray(res.params.phase), true_phase, atol=8e-3)


# ---- vectorial (Richards-Wolf) family (models/vectorial.py) ----------------


def test_vectorial_reduces_to_scalar_at_low_na():
    """Paraxial limit: cos(theta) -> 1 kills the cross/z terms and the
    vectorial PSF converges to the scalar widefield PSF."""
    from microtipi_tpu.models.vectorial import VectorialConfig

    shape = (6, 48, 48)
    kw = dict(na=0.2, wavelength=520e-9, ni=1.33, dxy=300e-9, dz=500e-9)
    wf = WideFieldConfig(shape=shape, n_phase=3, dtype=jnp.float64, **kw)
    ve = VectorialConfig(shape=shape, n_phase=3, dtype=jnp.float64, **kw)
    phase = jnp.asarray([0.2, -0.1, 0.15])
    h_s = np.asarray(wf.compute_psf(wf.init_params()._replace(phase=phase)))
    h_v = np.asarray(ve.compute_psf(ve.init_params()._replace(phase=phase)))
    h_s = h_s / h_s.sum()
    corr = (h_s * h_v).sum() / np.sqrt((h_s**2).sum() * (h_v**2).sum())
    assert corr > 0.9995
    np.testing.assert_allclose(h_v.sum(), 1.0, rtol=1e-12)


def test_vectorial_differs_at_high_na():
    """At NA 1.4 the z-dipole and cross-polarization terms broaden the focal
    spot measurably vs the scalar model."""
    from microtipi_tpu.models.vectorial import VectorialConfig

    shape = (1, 64, 64)
    kw = dict(na=1.4, wavelength=520e-9, ni=1.518, dxy=60e-9, dz=150e-9)
    wf = WideFieldConfig(shape=shape, dtype=jnp.float64, **kw)
    ve = VectorialConfig(shape=shape, dtype=jnp.float64, **kw)
    h_s = np.asarray(wf.compute_psf(wf.init_params()))
    h_v = np.asarray(ve.compute_psf(ve.init_params()))
    h_s = h_s / h_s.sum()
    # normalized shapes differ beyond tolerance at high NA
    assert np.abs(h_s - h_v).max() / h_s.max() > 0.01

    def spread(h):
        h0 = np.fft.fftshift(h[0]) / h[0].sum()
        iy, ix = np.mgrid[:64, :64]
        return (h0 * ((iy - 32) ** 2 + (ix - 32) ** 2)).sum()

    assert spread(h_v) > spread(h_s)  # vectorial spot is broader


def test_vectorial_fittable_through_psf_fit():
    """Aberration families act on the vectorial model through the same
    machinery (PsfModel protocol + autodiff)."""
    from microtipi_tpu.models.microscope import PHASE
    from microtipi_tpu.models.vectorial import VectorialConfig

    shape = (6, 24, 24)
    ve = VectorialConfig(shape=shape, n_phase=3, dtype=jnp.float64,
                         na=1.3, wavelength=520e-9, ni=1.518, dxy=90e-9, dz=220e-9)
    true_phase = jnp.asarray([0.3, -0.2, 0.12])
    p_true = ve.init_params()._replace(phase=true_phase)
    psf_true = ve.compute_psf(p_true)
    rng = np.random.default_rng(5)
    obj = jnp.asarray(rng.random(shape), jnp.float64)
    data = convolve(obj, convolve_spectrum(psf_true), shape)
    res = fit_psf(ve, ve.init_params(), PHASE, data, obj, config=PsfFitConfig(max_iter=60))
    np.testing.assert_allclose(np.asarray(res.params.phase), true_phase, atol=1e-2)
