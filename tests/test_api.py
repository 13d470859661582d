"""Reference-parity stateful API surface (api.py) + checkpointing."""

import numpy as np
import jax.numpy as jnp
import pytest

from microtipi_tpu.api import (
    DEFOCUS,
    MODULUS,
    PHASE,
    BlindDeconvJob,
    DeconvolutionJob,
    PSF_Estimation,
    WideFieldModel,
)
from microtipi_tpu.models.widefield import WideFieldConfig
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
from microtipi_tpu.utils.checkpoint import load_state, save_state

SHAPE = (8, 32, 32)
KW = dict(na=1.2, wavelength=500e-9, ni=1.33, dxy=100e-9, dz=250e-9)


def make_scene(model, seed=0):
    rng = np.random.default_rng(seed)
    obj = np.zeros(SHAPE)
    for _ in range(6):
        obj[rng.integers(0, 8), rng.integers(4, 28), rng.integers(4, 28)] = rng.uniform(50, 100)
    obj = jnp.asarray(obj)
    psf = jnp.asarray(model.get_psf())
    data = convolve(obj, convolve_spectrum(psf), SHAPE)
    data = data + 0.01 * jnp.asarray(rng.standard_normal(SHAPE))
    return obj, data


def test_widefield_model_getters():
    m = WideFieldModel(SHAPE, n_phase=4, n_modulus=2, single=False, **KW)
    psf = m.get_psf()
    assert psf.shape == SHAPE and psf.min() >= 0
    assert m.get_rho().shape == (32, 32)
    assert m.get_phi().shape == (32, 32)
    assert m.get_psi().shape == (32, 32)
    assert m.get_mask_pupil().shape == (32, 32)
    assert m.get_zernike().shape[0] == m.get_n_zern()
    assert m.get_n_phase() == 4 and m.get_n_modulus() == 2
    np.testing.assert_allclose(m.get_ni(), KW["ni"], rtol=1e-12)
    assert "PSF" in m.get_info()
    # MTF = 3D FFT of the PSF (getMtf's intent; the reference impl is broken)
    mtf = m.get_mtf()
    np.testing.assert_allclose(mtf[0, 0, 0].real, psf.sum(), rtol=1e-10)


def test_widefield_model_setters_invalidate():
    m = WideFieldModel(SHAPE, n_phase=3, n_modulus=1, single=False, **KW)
    psf0 = m.get_psf()
    m.set_phase([0.4, -0.2, 0.1])
    psf1 = m.get_psf()
    assert np.abs(psf1 - psf0).max() > 0
    m.set_defocus([KW["ni"] / KW["wavelength"] * 1.05])
    psf2 = m.get_psf()
    assert np.abs(psf2 - psf1).max() > 0
    # resizing the phase basis via set_phase with a longer vector
    m.set_phase([0.1, 0.2, 0.3, 0.4, 0.5])
    assert m.get_n_phase() == 5


def test_apply_jacobian_matches_functional_grad():
    import jax

    m = WideFieldModel(SHAPE, n_phase=3, n_modulus=1, single=False, **KW)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal(SHAPE))
    g_api = m.apply_jacobian(q, PHASE)
    cfg = m.config

    def loss(p):
        return jnp.vdot(q, cfg.compute_psf(p))

    g_fn = jax.grad(loss)(m.params).phase
    np.testing.assert_allclose(g_api, np.asarray(g_fn), rtol=1e-10)


def test_psf_estimation_and_deconv_job_flow():
    m = WideFieldModel(SHAPE, n_phase=3, n_modulus=1, radial=True, single=False, **KW)
    m.set_phase([0.5, -0.3, 0.2])
    obj, data = make_scene(m)
    truth_psf = m.get_psf()

    # forget the phase, then fit it back from the true object
    m.set_phase([0.0, 0.0, 0.0])
    est = PSF_Estimation(m)
    est.set_data(data)
    est.set_obj(obj)
    est.set_maximum_iterations(40)
    est.set_relative_tolerance(1e-10)
    est.fit_psf(PHASE)
    assert est.get_cost() >= 0
    assert est.get_iterations() > 0
    fitted = np.asarray(m.get_phase_coefs())
    np.testing.assert_allclose(fitted, [0.5, -0.3, 0.2], atol=0.1)


def test_blind_deconv_job_host_loop():
    m = WideFieldModel(SHAPE, n_phase=3, n_modulus=1, radial=True, single=False, **KW)
    m.set_phase([0.5, -0.3, 0.2])
    obj, data = make_scene(m)
    m.set_phase([0.0, 0.0, 0.0])

    est = PSF_Estimation(m)
    est.set_data(data)
    dec = DeconvolutionJob(data, mu=0.002, epsilon=2.0, max_iter=20)
    job = BlindDeconvJob(3, [PHASE], [20], est, dec)
    out = job.blind_deconv(jnp.maximum(data, 0.0))
    assert out.shape == SHAPE
    assert not job.is_running()
    assert job.get_psf() is not None
    # deconv output beats the raw data
    assert float(jnp.linalg.norm(out - obj)) < float(jnp.linalg.norm(data - obj))
    # model prediction available for weight updates
    assert job.get_model().shape == SHAPE


def test_abort_stops_job():
    m = WideFieldModel(SHAPE, n_phase=2, n_modulus=1, radial=True, single=False, **KW)
    obj, data = make_scene(m)
    est = PSF_Estimation(m)
    est.set_data(data)
    dec = DeconvolutionJob(data, mu=0.002, max_iter=5)
    job = BlindDeconvJob(5, [PHASE], [5], est, dec)
    job.abort()  # pre-abort: loop should bail after the first deconv
    out = job.blind_deconv(data)
    assert out.shape == SHAPE


def test_checkpoint_roundtrip(tmp_path):
    cfg = WideFieldConfig(shape=SHAPE, n_phase=3, n_modulus=2, dtype=jnp.float64, **KW)
    params = cfg.init_params()._replace(phase=jnp.asarray([0.1, 0.2, 0.3]))
    obj = jnp.asarray(np.random.default_rng(0).random(SHAPE))
    p = str(tmp_path / "state.npz")
    save_state(p, obj, params, 7, cost=1.25)
    obj2, params2, rnd, extra = load_state(p)
    np.testing.assert_array_equal(np.asarray(obj), np.asarray(obj2))
    np.testing.assert_array_equal(np.asarray(params.phase), np.asarray(params2.phase))
    assert rnd == 7
    assert float(extra["cost"]) == 1.25


def test_rebuild_family_isolation():
    """Resizing one family must not clobber the other — and the resized one
    re-initializes exactly like the reference (setNPhase zeroes phase,
    setNModulus re-inits modulus; WideFieldModel.java:1899-1961)."""
    m = WideFieldModel(SHAPE, n_phase=3, n_modulus=2, single=False, **KW)
    m.set_modulus([0.9, 0.1])
    m.set_n_phase(5)  # resize phase only
    np.testing.assert_allclose(m.get_modulus_coefs(), [0.9, 0.1])
    np.testing.assert_allclose(m.get_phase_coefs(), np.zeros(5))
    m.set_phase([0.1, 0.2, 0.3, 0.4, 0.5])
    m.set_n_modulus(3)  # resize modulus only
    np.testing.assert_allclose(m.get_modulus_coefs(), [1.0, 0.0, 0.0])
    np.testing.assert_allclose(m.get_phase_coefs(), [0.1, 0.2, 0.3, 0.4, 0.5])
    # set_phase with a new length resizes then installs the given coefficients
    m.set_modulus([0.8, 0.2, 0.0])
    m.set_phase([0.4, -0.2])
    np.testing.assert_allclose(m.get_phase_coefs(), [0.4, -0.2])
    np.testing.assert_allclose(m.get_modulus_coefs(), [0.8, 0.2, 0.0])


def test_fit_cache_not_stale_after_config_replacement():
    """The jit cache must key on the config VALUE: replacing a model's config
    (old one garbage-collected) must not serve a compiled fit for the old
    geometry (the id()-keyed cache bug class)."""
    import gc

    m = WideFieldModel(SHAPE, n_phase=3, n_modulus=1, single=False, **KW)
    obj, data = make_scene(m)
    est = PSF_Estimation(m)
    est.set_data(data)
    est.set_obj(obj)
    est.set_maximum_iterations(3)
    est.fit_psf(PHASE)
    f_before = est.get_cost()

    # Replace the config with a different geometry (same shapes, different
    # physics), drop the old one, force GC so its id() can be recycled.
    old_cfg = m.config
    m._cfg = WideFieldConfig(
        shape=SHAPE, na=1.0, wavelength=600e-9, ni=1.0, dxy=150e-9, dz=400e-9,
        n_phase=3, radial=old_cfg.radial, dtype=old_cfg.dtype,
    )
    m._jits = {}
    m.params = m.config.init_params()
    del old_cfg
    gc.collect()

    est.fit_psf(PHASE)
    f_after = est.get_cost()
    # Different optics on the same scene -> a genuinely different fit; a
    # stale cached program would reproduce the old trajectory instead.
    assert f_after != pytest.approx(f_before, rel=1e-9)

    # And re-fitting with the ORIGINAL config (fresh object, same value)
    # must hit the same compiled program without error.
    m2 = WideFieldModel(SHAPE, n_phase=3, n_modulus=1, single=False, **KW)
    est2 = PSF_Estimation(m2)
    est2.set_data(data)
    est2.set_obj(obj)
    est2.set_maximum_iterations(3)
    est2.fit_psf(PHASE)
    assert est2.get_cost() == pytest.approx(f_before, rel=1e-6)


def test_psf_estimation_parity_setters(capsys):
    """The reference's remaining setter surface: setDebugMode, the dead
    setLimitedMemorySize, inert bounds, enablePositivity->setLowerBound,
    and setPupil (PSF_Estimation.java:94-96,263-331)."""
    m = WideFieldModel(SHAPE, n_phase=3, n_modulus=1, radial=True, single=False, **KW)
    m.set_phase([0.5, -0.3, 0.2])
    obj, data = make_scene(m)
    m.set_phase([0.0, 0.0, 0.0])

    est = PSF_Estimation(m)
    est.set_data(data)
    est.set_obj(obj)
    est.set_maximum_iterations(10)
    est.set_limited_memory_size(3)   # dead in the reference: fit still uses m=5
    est.set_lower_bound(-1.0)        # recorded, inert (projector stays null)
    est.set_upper_bound(2.0)
    est.enable_positivity(True)      # setLowerBound(0.0)
    assert est._lower_bound == 0.0
    est.enable_positivity(False)
    assert est._lower_bound == float("-inf")
    est.set_debug_mode(True)
    est.fit_psf(PHASE)
    out = capsys.readouterr().out
    assert "fit_psf(flag=" in out and "f_history=" in out
    assert est.get_iterations() > 0

    # setPupil swaps the model: a fresh pupil fits from scratch
    m2 = WideFieldModel(SHAPE, n_phase=3, n_modulus=1, radial=True, single=False, **KW)
    est.set_pupil(m2)
    assert est.get_pupil() is m2
    est.set_debug_mode(False)
    est.fit_psf(PHASE)
    fitted = np.asarray(m2.get_phase_coefs())
    np.testing.assert_allclose(fitted, [0.5, -0.3, 0.2], atol=0.1)


def test_remaining_widefield_parity_surface():
    """getParametersFlags / computeDefocus / the named per-family adjoints
    (WideFieldModel.java:123,1452-1499,429,738,1029)."""
    m = WideFieldModel(SHAPE, n_phase=3, n_modulus=2, radial=True, single=False, **KW)
    assert m.get_parameters_flags() == [DEFOCUS, PHASE, MODULUS]
    m.compute_defocus()  # no-op, must not raise

    m.set_phase([0.2, -0.1, 0.05])
    rng = np.random.default_rng(0)
    q = rng.standard_normal(SHAPE)
    # the named adjoints equal the dispatching apply_jacobian
    np.testing.assert_allclose(m.apply_j_phase(q), m.apply_jacobian(q, PHASE))
    np.testing.assert_allclose(m.apply_j_defocus(q), m.apply_jacobian(q, DEFOCUS))
    np.testing.assert_allclose(m.apply_j_modulus(q), m.apply_jacobian(q, MODULUS))
    assert m.apply_j_phase(q).shape == (3,)
    assert m.apply_j_defocus(q).shape == (3,)
    assert m.apply_j_modulus(q).shape == (2,)


def test_chunked_deconv_bounded_abort_and_equivalence():
    """abort_check_iters (VERDICT r4 item 6): K-iteration slices with host
    carry. (a) Unaborted, the chunked solve tracks the monolithic one
    (slice restarts cost a little curvature memory, not correctness);
    (b) abort() from the progress callback stops within one slice."""
    m = WideFieldModel(SHAPE, n_phase=3, n_modulus=1, single=False, **KW)
    _, data = make_scene(m)
    psf = m.get_psf()

    mono = DeconvolutionJob(data, psf=psf, mu=0.01, epsilon=0.5,
                            max_iter=21, grtol=0.0)
    x_mono = mono.deconv()
    f_mono = mono.get_cost()

    chunked = DeconvolutionJob(data, psf=psf, mu=0.01, epsilon=0.5,
                               max_iter=21, grtol=0.0, abort_check_iters=7)
    x_ch = chunked.deconv()
    f_ch = chunked.get_cost()
    assert int(chunked._result.iterations) == 21
    hist = np.asarray(chunked._result.f_history)
    assert np.isfinite(hist[:22]).all()
    assert hist[21] <= hist[0]
    # slice restarts may cost a few percent of progress, no more
    assert f_ch <= f_mono * 1.05 + 1e-9, (f_ch, f_mono)
    assert x_ch.shape == x_mono.shape

    calls = []

    def aborting_progress(done, f):
        calls.append((done, f))
        job.abort()

    job = DeconvolutionJob(data, psf=psf, mu=0.01, epsilon=0.5,
                           max_iter=50, grtol=0.0, abort_check_iters=5,
                           progress=aborting_progress)
    job.deconv()
    assert int(job._result.iterations) <= 5  # stopped after ONE slice
    assert len(calls) == 1

    # grtol anchoring: a converging run stops early in chunked mode too,
    # using the FIRST slice's pg0 as the relative reference.
    loose = DeconvolutionJob(data, psf=psf, mu=0.01, epsilon=0.5,
                             max_iter=60, grtol=3e-2, abort_check_iters=10)
    loose.deconv()
    assert int(loose._result.iterations) < 60


def test_chunked_psf_fit_abort_and_equivalence():
    """PSF_Estimation.set_abort_check_iters: chunked fits recover the same
    parameters as one dispatch, and abort() between slices stops the fit."""
    m_true = WideFieldModel(SHAPE, n_phase=3, n_modulus=1, single=False, **KW)
    m_true.set_phase([0.3, -0.2, 0.1])
    obj, data = make_scene(m_true, seed=3)

    def fresh():
        m = WideFieldModel(SHAPE, n_phase=3, n_modulus=1, single=False, **KW)
        est = PSF_Estimation(m)
        est.set_data(data)
        est.set_obj(obj)
        est.set_maximum_iterations(12)
        est.set_relative_tolerance(0.0)
        return est

    est1 = fresh()
    est1.fit_psf(PHASE)
    ph_mono = np.asarray(est1.pupil.get_phase_coefs())

    est2 = fresh()
    est2.set_abort_check_iters(4)
    est2.fit_psf(PHASE)
    ph_ch = np.asarray(est2.pupil.get_phase_coefs())
    # an early slice may satisfy its own stopping rule sooner than the
    # monolithic run (re-anchored grtol / restarted memory) — parameter
    # agreement is the contract, not the iteration count
    assert est2.get_iterations() >= 2
    np.testing.assert_allclose(ph_ch, ph_mono, atol=0.05)
    assert est2.get_cost() <= est1.get_cost() * 1.10 + 1e-9

    # abort between slices: wrap the jitted fit to abort after 2 slices
    est3 = fresh()
    est3.set_abort_check_iters(3)
    orig = est3._fit_jitted
    n_calls = []

    def wrapped(flag):
        fn = orig(flag)

        def run(*a):
            n_calls.append(1)
            if len(n_calls) >= 2:
                est3.abort()
            return fn(*a)

        return run

    est3._fit_jitted = wrapped
    est3.fit_psf(PHASE)
    assert len(n_calls) == 2  # third slice never dispatched
    assert est3.get_iterations() <= 6
