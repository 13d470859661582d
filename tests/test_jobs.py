"""End-to-end jobs: object deconvolution, PSF fitting, blind loop.

Reference has no tests; these anchor to recovery behavior on synthetic data
(SURVEY.md section 4): blur a known object with a known/perturbed PSF, add
noise, and check the solvers move toward the truth.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.jobs.blind import BlindDeconvConfig, blind_deconvolve
from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
from microtipi_tpu.jobs.psf_fit import PsfFitConfig, fit_psf
from microtipi_tpu.models.microscope import DEFOCUS, MODULUS, PHASE
from microtipi_tpu.models.widefield import WideFieldConfig
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
from microtipi_tpu.weights.updaters import InverseVarianceWeights

SHAPE = (8, 32, 32)
CFG = dict(na=1.2, wavelength=500e-9, ni=1.33, dxy=100e-9, dz=250e-9)


def make_model(n_phase=4, n_modulus=1, radial=False):
    return WideFieldConfig(shape=SHAPE, n_phase=n_phase, n_modulus=n_modulus,
                           radial=radial, dtype=jnp.float64, **CFG)


def make_scene(model, params, noise=0.01, seed=0):
    rng = np.random.default_rng(seed)
    obj = np.zeros(SHAPE)
    # a few bright beads + a smooth blob
    for _ in range(6):
        z, y, x = rng.integers(0, SHAPE[0]), rng.integers(4, 28), rng.integers(4, 28)
        obj[z, y, x] = rng.uniform(50, 100)
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in SHAPE], indexing="ij")
    obj += 20 * np.exp(-(((zz - 4) / 2.5) ** 2 + ((yy - 16) / 5) ** 2 + ((xx - 16) / 5) ** 2))
    obj = jnp.asarray(obj)
    psf = model.compute_psf(params)
    blurred = convolve(obj, convolve_spectrum(psf), SHAPE)
    data = blurred + noise * float(blurred.max()) * jnp.asarray(rng.standard_normal(SHAPE))
    return obj, psf, data


def test_deconvolve_improves_object():
    model = make_model()
    params = model.init_params()
    obj, psf, data = make_scene(model, params)
    cfg = DeconvolutionConfig(mu=0.002, epsilon=2.0, max_iter=150, grtol=1e-8)
    res = deconvolve(data, psf, config=cfg)
    err_data = float(jnp.linalg.norm(data - obj))
    err_rec = float(jnp.linalg.norm(res.x - obj))
    assert err_rec < 0.5 * err_data
    assert float(res.x.min()) >= 0.0  # positivity enforced
    # cost decreased vs the warm start
    hist = np.asarray(res.f_history)
    assert hist[~np.isnan(hist)][-1] < hist[0]


def test_deconvolve_padded_variable():
    model = make_model()
    params = model.init_params()
    obj, psf, data = make_scene(model, params)
    cfg = DeconvolutionConfig(mu=0.002, epsilon=0.5, max_iter=30,
                              var_shape=(12, 40, 40))
    res = deconvolve(data, psf, config=cfg)
    assert res.x.shape == (12, 40, 40)
    hist = np.asarray(res.f_history)
    assert hist[~np.isnan(hist)][-1] < hist[0]


def test_fit_psf_recovers_defocus():
    model = make_model(n_phase=0)
    true_params = model.init_params()
    true_params = true_params._replace(
        defocus=true_params.defocus + jnp.asarray([0.08e6, 0.0, 0.0])
    )
    obj, psf, data = make_scene(model, true_params, noise=0.0)

    start = model.init_params()  # wrong ni/lambda
    res = fit_psf(model, start, DEFOCUS, data, obj,
                  config=PsfFitConfig(max_iter=60, grtol=1e-10))
    got = float(res.params.defocus[0])
    want = float(true_params.defocus[0])
    start_err = abs(float(start.defocus[0]) - want)
    assert abs(got - want) < 0.05 * start_err


def test_fit_psf_recovers_phase():
    model = make_model(n_phase=4)
    true_params = model.init_params()._replace(
        phase=jnp.asarray([0.5, -0.3, 0.2, 0.4])
    )
    obj, psf, data = make_scene(model, true_params, noise=0.0)

    start = model.init_params()
    res = fit_psf(model, start, PHASE, data, obj,
                  config=PsfFitConfig(max_iter=120, grtol=1e-12))
    np.testing.assert_allclose(
        np.asarray(res.params.phase), np.asarray(true_params.phase), atol=0.05
    )


def test_fit_psf_cost_decreases_with_weights():
    model = make_model(n_phase=4)
    true_params = model.init_params()._replace(phase=jnp.asarray([0.3, -0.2, 0.1, 0.0]))
    obj, psf, data = make_scene(model, true_params, noise=0.02)
    w = InverseVarianceWeights(gain=0.0, readout_variance=4.0).from_data(data)
    start = model.init_params()
    res = fit_psf(model, start, PHASE, data, obj, weights=w,
                  config=PsfFitConfig(max_iter=20))
    hist = np.asarray(res.f_history)
    valid = hist[~np.isnan(hist)]
    assert valid[-1] < valid[0]


def test_blind_deconvolve_end_to_end():
    model = make_model(n_phase=3, radial=True)
    true_params = model.init_params()._replace(phase=jnp.asarray([0.6, -0.3, 0.2]))
    obj, psf, data = make_scene(model, true_params, noise=0.005)

    cfg = BlindDeconvConfig(
        loops=4,
        families=(PHASE,),
        psf_max_iter=(40,),
        deconv=DeconvolutionConfig(mu=0.002, epsilon=2.0, max_iter=40),
        fit=PsfFitConfig(),
    )
    res = blind_deconvolve(data, model, config=cfg)

    # Object-step cost decreases across rounds (PSF refits help the next round).
    df = np.asarray(res.deconv_f)
    assert df[-1] < df[0]
    assert np.all(np.diff(df) <= 1e-9)
    # The blind estimate must beat the raw data by a wide margin (at this tiny
    # volume the phase coefficients themselves are only weakly identifiable —
    # the system-level recovery is the meaningful criterion).
    err_blind = float(jnp.linalg.norm(res.obj - obj))
    err_data = float(jnp.linalg.norm(data - obj))
    assert err_blind < 0.6 * err_data
    # Last round must not refit the PSF (BlindDeconvJob.java:116).
    assert np.isnan(np.asarray(res.fit_f)[-1]).all()
    # Earlier rounds did refit and reduced the PSF-step cost vs round 1.
    ff = np.asarray(res.fit_f)[:-1, 0]
    assert np.all(np.isfinite(ff)) and ff[-1] <= ff[0]


def test_blind_deconvolve_jits_once():
    model = make_model(n_phase=3, radial=True)
    true_params = model.init_params()._replace(phase=jnp.asarray([0.4, -0.2, 0.1]))
    obj, psf, data = make_scene(model, true_params, noise=0.01)
    cfg = BlindDeconvConfig(
        loops=2, families=(PHASE,), psf_max_iter=(5,),
        deconv=DeconvolutionConfig(mu=0.002, epsilon=0.5, max_iter=5),
    )
    fn = jax.jit(lambda d: blind_deconvolve(d, model, config=cfg).obj)
    out = fn(data)
    assert out.shape == SHAPE
    assert np.isfinite(np.asarray(out)).all()


def test_blind_weight_updater_feeds_only_psf_step():
    """The object step must always see the user weights (None here): with an
    updater present, results must match a loop whose updater output is used
    only for the PSF fits — and round-1 deconv must equal the no-updater run."""
    from microtipi_tpu.weights.updaters import InverseVarianceWeights

    model = make_model(n_phase=3, radial=True)
    true_params = model.init_params()._replace(phase=jnp.asarray([0.4, -0.2, 0.1]))
    obj, psf, data = make_scene(model, true_params, noise=0.01)
    upd = InverseVarianceWeights(gain=2.0, readout_variance=1.0)
    cfg = BlindDeconvConfig(
        loops=2, families=(PHASE,), psf_max_iter=(5,),
        deconv=DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=5),
    )
    plain = blind_deconvolve(data, model, config=cfg)
    with_upd = blind_deconvolve(data, model, weight_updater=upd.update, config=cfg)
    # Round-1 object step is identical (updater must not affect deconv).
    np.testing.assert_allclose(
        float(with_upd.deconv_f[0]), float(plain.deconv_f[0]), rtol=1e-12
    )
    # The PSF step differs (it does see the updated weights).
    assert abs(float(with_upd.fit_f[0, 0]) - float(plain.fit_f[0, 0])) > 0


def test_fit_psf_active_subset():
    """active=k fits only the first k phase modes and freezes the rest."""
    model = make_model(n_phase=4)
    true_params = model.init_params()._replace(phase=jnp.asarray([0.5, -0.3, 0.0, 0.0]))
    obj, psf, data = make_scene(model, true_params, noise=0.0)
    start = model.init_params()._replace(phase=jnp.asarray([0.0, 0.0, 0.123, -0.456]))
    res = fit_psf(model, start, PHASE, data, obj,
                  config=PsfFitConfig(max_iter=60, grtol=1e-12), active=2)
    got = np.asarray(res.params.phase)
    np.testing.assert_allclose(got[2:], [0.123, -0.456])  # frozen tail untouched
    assert abs(got[0] - 0.5) < 0.2 and abs(got[1] + 0.3) < 0.2


def test_blind_phase_schedule_runs():
    model = make_model(n_phase=3, radial=True)
    true_params = model.init_params()._replace(phase=jnp.asarray([0.4, -0.2, 0.1]))
    obj, psf, data = make_scene(model, true_params, noise=0.01)
    cfg = BlindDeconvConfig(
        loops=3, families=(PHASE,), psf_max_iter=(5,),
        deconv=DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=5),
        phase_schedule=(1, 2, 3),
    )
    res = blind_deconvolve(data, model, config=cfg)
    assert np.isfinite(np.asarray(res.deconv_f)).all()
    assert np.isnan(np.asarray(res.fit_f)[-1]).all()


def test_fit_psf_joint_recovers_coupled_families():
    """Joint defocus+phase fit: both families recovered in one VMLMB run."""
    from microtipi_tpu.jobs.psf_fit import fit_psf_joint

    model = make_model(n_phase=3)
    true_params = model.init_params()
    true_params = true_params._replace(
        defocus=true_params.defocus + jnp.asarray([0.05e6, 0.0, 0.0]),
        phase=jnp.asarray([0.3, -0.2, 0.1]),
    )
    obj, psf, data = make_scene(model, true_params, noise=0.0)
    start = model.init_params()
    res = fit_psf_joint(model, start, (DEFOCUS, PHASE), data, obj,
                        config=PsfFitConfig(max_iter=120, grtol=1e-12))
    np.testing.assert_allclose(
        float(res.params.defocus[0]), float(true_params.defocus[0]), rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(res.params.phase), np.asarray(true_params.phase), atol=0.06
    )


def test_blind_joint_fit_runs():
    model = make_model(n_phase=3, radial=True)
    true_params = model.init_params()._replace(phase=jnp.asarray([0.4, -0.2, 0.1]))
    obj, psf, data = make_scene(model, true_params, noise=0.01)
    cfg = BlindDeconvConfig(
        loops=2, families=(DEFOCUS, PHASE), psf_max_iter=(5, 5),
        deconv=DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=5),
        joint_fit=True,
    )
    res = blind_deconvolve(data, model, config=cfg)
    assert np.isfinite(np.asarray(res.deconv_f)).all()
    assert np.asarray(res.deconv_f)[1] <= np.asarray(res.deconv_f)[0] + 1e-9


def test_fit_psf_freeze_head_pins_z4():
    model = make_model(n_phase=3)
    true_params = model.init_params()._replace(phase=jnp.asarray([0.0, -0.3, 0.2]))
    obj, psf, data = make_scene(model, true_params, noise=0.0)
    start = model.init_params()._replace(phase=jnp.asarray([0.77, 0.0, 0.0]))
    res = fit_psf(model, start, PHASE, data, obj,
                  config=PsfFitConfig(max_iter=60, grtol=1e-12), freeze_head=1)
    got = np.asarray(res.params.phase)
    assert got[0] == np.float64(0.77)  # pinned value untouched by the fit
    # Pinned at the TRUE value (0), the remaining modes recover exactly.
    start0 = model.init_params()
    res0 = fit_psf(model, start0, PHASE, data, obj,
                   config=PsfFitConfig(max_iter=60, grtol=1e-12), freeze_head=1)
    got0 = np.asarray(res0.params.phase)
    assert got0[0] == 0.0
    np.testing.assert_allclose(got0[1:], [-0.3, 0.2], atol=0.02)


def test_fit_psf_beads_recovers_parameters_and_amplitude():
    """Bead calibration: the profiled-amplitude/background objective
    recovers the injected aberration from a realistic bead stack
    (background + noise). Tolerance is the ML noise scatter: on noiseless
    data the recovery is exact to f64 (measured), with this noise seed the
    ML optimum itself sits ~0.02 off on one mode."""
    from microtipi_tpu.jobs.psf_fit import fit_psf_beads
    from microtipi_tpu.models.microscope import PHASE
    from microtipi_tpu.utils.arrays import roll

    shape = (12, 32, 32)
    model = WideFieldConfig(shape=shape, na=1.3, wavelength=520e-9, ni=1.518,
                            dxy=90e-9, dz=220e-9, n_phase=3, dtype=jnp.float64)
    true_phase = jnp.asarray([0.3, -0.2, 0.15])
    true = model.init_params()._replace(phase=true_phase)
    bead = 800.0 * np.asarray(roll(model.compute_psf(true)))
    rng = np.random.default_rng(0)
    bead = bead + 0.5 + 0.002 * bead.max() * rng.standard_normal(shape)

    res, amp = fit_psf_beads(
        model, jnp.asarray(bead), (PHASE,),
        config=PsfFitConfig(max_iter=80, grtol=0.0),
    )
    np.testing.assert_allclose(np.asarray(res.params.phase), true_phase, atol=0.03)
    assert float(amp) == pytest.approx(800.0, rel=0.05)
    # jit-compatible end to end (argmax/median/scatter all trace)
    res2, _ = jax.jit(
        lambda d: fit_psf_beads(model, d, (PHASE,),
                                config=PsfFitConfig(max_iter=80, grtol=0.0))
    )(jnp.asarray(bead))
    # Not bitwise: jit may reassociate the matched-filter reductions; the
    # fits must still agree far beyond the recovery tolerance.
    np.testing.assert_allclose(np.asarray(res2.params.phase),
                               np.asarray(res.params.phase), atol=1e-5)


def test_fit_psf_beads_subvoxel_lateral_centering():
    """A bead at a fractional lateral position: subvoxel centering recovers
    the aberration where the integer-voxel fit is polluted by the residual
    shift (which masquerades as pupil tilt)."""
    from microtipi_tpu.jobs.psf_fit import fit_psf_beads
    from microtipi_tpu.models.microscope import PHASE

    shape = (12, 32, 32)
    nz, ny, nx = shape
    model = WideFieldConfig(shape=shape, na=1.3, wavelength=520e-9, ni=1.518,
                            dxy=90e-9, dz=220e-9, n_phase=3, dtype=jnp.float64)
    true_phase = jnp.asarray([0.3, -0.2, 0.15])
    psf = model.compute_psf(model.init_params()._replace(phase=true_phase))
    # place the bead at an off-grid lateral position (z on-grid: the axial
    # gauge belongs to the pupil fit)
    fz = np.fft.fftfreq(nz)[:, None, None]
    fy = np.fft.fftfreq(ny)[None, :, None]
    fx = np.fft.rfftfreq(nx)[None, None, :]
    shift = np.exp(-2j * np.pi * (fz * 6 + fy * (16 + 0.31) + fx * (16 - 0.42)))
    bead = 700.0 * np.fft.irfftn(np.fft.rfftn(np.asarray(psf)) * shift, s=shape)
    rng = np.random.default_rng(1)
    bead = bead + 0.3 + 0.002 * bead.max() * rng.standard_normal(shape)

    cfg = PsfFitConfig(max_iter=80, grtol=0.0)
    good, _ = fit_psf_beads(model, jnp.asarray(bead), (PHASE,), config=cfg, subvoxel=True)
    crude, _ = fit_psf_beads(model, jnp.asarray(bead), (PHASE,), config=cfg, subvoxel=False)
    err_good = np.linalg.norm(np.asarray(good.params.phase) - np.asarray(true_phase))
    err_crude = np.linalg.norm(np.asarray(crude.params.phase) - np.asarray(true_phase))
    assert err_good < 0.05
    assert err_good < err_crude


def test_fit_psf_prior_pulls_to_anchor():
    """A dominant calibration prior pins the fitted phase at the anchor."""
    import jax.numpy as jnp
    import numpy as np

    from microtipi_tpu.jobs.psf_fit import PsfFitConfig, fit_psf, fit_psf_joint
    from microtipi_tpu.models.microscope import DEFOCUS, PHASE
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (8, 24, 24)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=3, radial=True,
                            dtype=jnp.float64)
    rng = np.random.default_rng(0)
    obj = jnp.asarray(np.abs(rng.standard_normal(shape)) * 10)
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.2, 0.1]))
    data = convolve(obj, convolve_spectrum(model.compute_psf(true)), shape)
    anchor = jnp.asarray([0.25, -0.15, 0.05])
    params0 = model.init_params()._replace(phase=anchor)

    # Huge prior: fit stays at the anchor.
    res = fit_psf(model, params0, PHASE, data, obj,
                  config=PsfFitConfig(max_iter=6, grtol=0.0),
                  anchor=anchor, prior_weight=1e6)
    np.testing.assert_allclose(np.asarray(res.params.phase), np.asarray(anchor),
                               atol=1e-4)
    # Moderate prior: fit moves toward the truth but not past it.
    res2 = fit_psf_joint(model, params0, (DEFOCUS, PHASE), data, obj,
                         config=PsfFitConfig(max_iter=8, grtol=0.0),
                         phase_anchor=anchor, phase_prior_weight=1e-2)
    err_anchor = float(jnp.linalg.norm(anchor - true.phase))
    err_fit = float(jnp.linalg.norm(res2.params.phase - true.phase))
    assert err_fit < err_anchor  # noiseless data: prior-regularized fit improves


def test_sharded_fit_prior_matches_dense():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from microtipi_tpu.jobs.psf_fit import PsfFitConfig, fit_psf_joint
    from microtipi_tpu.models.microscope import DEFOCUS, PHASE
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
    from microtipi_tpu.parallel.mesh import make_mesh, volume_sharding
    from microtipi_tpu.parallel.psf_fit import sharded_fit_psf_joint

    mesh = make_mesh(batch=1, z=8)
    shape = (16, 24, 24)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=3, radial=True,
                            dtype=jnp.float64)
    rng = np.random.default_rng(1)
    obj = jnp.asarray(np.abs(rng.standard_normal(shape)) * 10)
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.2, 0.1]))
    data = convolve(obj, convolve_spectrum(model.compute_psf(true)), shape)
    anchor = jnp.asarray([0.25, -0.15, 0.05])
    params0 = model.init_params()._replace(phase=anchor)
    kw = dict(config=PsfFitConfig(max_iter=5, grtol=0.0),
              phase_anchor=anchor, phase_prior_weight=1e-2)

    dense = fit_psf_joint(model, params0, (DEFOCUS, PHASE), data, obj, **kw)
    d_sh = jax.device_put(data, volume_sharding(mesh, batched=False))
    o_sh = jax.device_put(obj, volume_sharding(mesh, batched=False))
    sh = jax.jit(lambda d, o: sharded_fit_psf_joint(
        model, params0, (DEFOCUS, PHASE), d, o, mesh, **kw))(d_sh, o_sh)
    # Dense uses the 2-FFT quadratic data term, sharded the residual form —
    # equal math, so trajectories agree to iteration-accumulated roundoff.
    np.testing.assert_allclose(np.asarray(sh.params.phase),
                               np.asarray(dense.params.phase), atol=2e-4)


def test_blind_loop_calibration_prior_pins_phase():
    """A dominant phase_prior_weight holds the blind loop's phase at the
    initial (calibration) parameters across rounds, dense and sharded."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from microtipi_tpu.jobs.blind import BlindDeconvConfig, blind_deconvolve
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig
    from microtipi_tpu.models.microscope import PHASE
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (8, 16, 16)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=2, radial=True,
                            dtype=jnp.float64)
    rng = np.random.default_rng(0)
    obj = jnp.asarray(np.abs(rng.standard_normal(shape)) * 10)
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.15]))
    data = convolve(obj, convolve_spectrum(model.compute_psf(true)), shape)
    anchor = jnp.asarray([0.2, -0.1])
    params0 = model.init_params()._replace(phase=anchor)
    cfg = BlindDeconvConfig(
        loops=3, families=(PHASE,), psf_max_iter=(4,),
        deconv=DeconvolutionConfig(mu=1e-3, epsilon=1.0, max_iter=3, grtol=0.0),
        joint_fit=True, phase_prior_weight=1e6,
    )
    res = jax.jit(lambda d: blind_deconvolve(d, model, params0=params0, config=cfg))(data)
    np.testing.assert_allclose(np.asarray(res.params.phase), np.asarray(anchor),
                               atol=1e-3)


def test_bead_anchor_term_is_profile_likelihood():
    """bead_anchor_term == min over amplitude of the delta-object data term,
    and vanishes at the true parameters on a noiseless bead stack."""
    from microtipi_tpu.jobs.psf_fit import bead_anchor_term, center_bead_stack
    from microtipi_tpu.utils.arrays import roll

    shape = (8, 16, 16)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=2, radial=True,
                            dtype=jnp.float64)
    true = model.init_params()._replace(phase=jnp.asarray([0.25, -0.1]))
    bead = 500.0 * roll(model.compute_psf(true))  # centered layout, no noise

    term = bead_anchor_term(model, bead)
    d0 = center_bead_stack(bead)
    d2 = float(jnp.sum(d0 * d0))

    # At the truth the profile-likelihood residual is ~0 (relative to
    # ||d||^2): amp and the constant-background nuisance absorb the
    # centering's own median bias exactly on noiseless data.
    assert float(term(true)) < 1e-12 * d2

    # At generic parameters it equals the explicit (amp, background)-profiled
    # least squares.
    p = model.init_params()._replace(phase=jnp.asarray([0.1, 0.05]))
    h = np.asarray(model.compute_psf(p)).ravel()
    dv = np.asarray(d0).ravel()
    basis = np.stack([h, np.ones_like(h)], axis=1)
    coef, *_ = np.linalg.lstsq(basis, dv, rcond=None)
    explicit = 0.5 * float(np.sum((basis @ coef - dv) ** 2))
    np.testing.assert_allclose(float(term(p)), explicit, rtol=1e-9)
    # ...and beats any non-optimal amplitude (profile optimality).
    for amp in (0.9 * coef[0], 1.1 * coef[0]):
        assert float(term(p)) <= 0.5 * float(np.sum((amp * h + coef[1] - dv) ** 2)) + 1e-9


def test_blind_loop_bead_anchor_pins_phase():
    """The structural bead anchor holds the blind loop's phase at the TRUTH
    (the bead stack carries it), where the free loop is free to drift."""
    shape = (8, 16, 16)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=2, radial=True,
                            dtype=jnp.float64)
    from microtipi_tpu.utils.arrays import roll

    rng = np.random.default_rng(0)
    obj = jnp.asarray(np.abs(rng.standard_normal(shape)) * 10)
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.15]))
    data = convolve(obj, convolve_spectrum(model.compute_psf(true)), shape)
    bead = 500.0 * roll(model.compute_psf(true))  # same optics, noiseless

    cfg = BlindDeconvConfig(
        loops=3, families=(PHASE,), psf_max_iter=(6,),
        deconv=DeconvolutionConfig(mu=1e-3, epsilon=1.0, max_iter=3, grtol=0.0),
        joint_fit=True, bead_weight=1e4,
    )
    res = jax.jit(
        lambda d, b: blind_deconvolve(d, model, config=cfg, bead_data=b)
    )(data, bead)
    np.testing.assert_allclose(np.asarray(res.params.phase),
                               np.asarray(true.phase), atol=2e-2)


def test_sharded_blind_bead_anchor_matches_dense():
    from microtipi_tpu.parallel.blind import sharded_blind_deconvolve
    from microtipi_tpu.parallel.mesh import make_mesh, volume_sharding
    from microtipi_tpu.utils.arrays import roll

    mesh = make_mesh(batch=1, z=8)
    shape = (16, 24, 24)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=2, radial=True,
                            dtype=jnp.float64)
    rng = np.random.default_rng(1)
    obj = jnp.asarray(np.abs(rng.standard_normal(shape)) * 10)
    true = model.init_params()._replace(phase=jnp.asarray([0.2, -0.1]))
    data = convolve(obj, convolve_spectrum(model.compute_psf(true)), shape)
    bead_shape = (8, 16, 16)
    bead_model = dataclasses.replace(model, shape=bead_shape)
    bead = 300.0 * roll(bead_model.compute_psf(true))

    cfg = BlindDeconvConfig(
        loops=2, families=(PHASE,), psf_max_iter=(4,),
        deconv=DeconvolutionConfig(mu=1e-3, epsilon=1.0, max_iter=3, grtol=0.0),
        joint_fit=True, bead_weight=10.0,
    )
    dense = blind_deconvolve(data, model, config=cfg, bead_data=bead)
    d_sh = jax.device_put(data, volume_sharding(mesh, batched=False))
    sh = jax.jit(lambda d, b: sharded_blind_deconvolve(
        d, model, mesh, config=cfg, bead_data=b))(d_sh, bead)
    np.testing.assert_allclose(np.asarray(sh.params.phase),
                               np.asarray(dense.params.phase), atol=2e-4)


def _bead_field(model, true, seed, noise=1.5):
    """6 bright beads of one PSF scattered in a (8, 128, 128) stack."""
    from microtipi_tpu.utils.arrays import roll

    h = np.asarray(roll(model.compute_psf(true)))
    rng = np.random.default_rng(seed)
    stack = np.zeros((8, 128, 128))
    for (y, x) in [(20, 20), (20, 70), (60, 40), (64, 100), (100, 24), (104, 84)]:
        stack[:, y - 12:y + 12, x - 12:x + 12] += rng.uniform(4000, 8000) * h
    return stack + 5.0 + noise * rng.standard_normal(stack.shape), h


def test_average_beads_exact_on_noiseless_field():
    """With no noise, the K-bead average reconstructs the PSF exactly
    (detection, registration and amplitude matching introduce NO
    distortion — the regression that motivated the plain-cross-correlation
    alignment; normalized phase correlation hallucinated ~0.1-voxel shifts
    between identical patches)."""
    from microtipi_tpu.jobs.psf_fit import average_beads

    patch = (8, 24, 24)
    model = WideFieldConfig(shape=patch, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=2, radial=True,
                            dtype=jnp.float64)
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.15]))
    stack, h = _bead_field(model, true, seed=0, noise=0.0)
    avg, used = average_beads(stack, n_beads=8, patch=patch)
    assert used == 6
    scale = np.sum(avg * h) / np.sum(h * h)
    resid = np.linalg.norm(avg - scale * h) / np.linalg.norm(scale * h)
    assert resid < 1e-9


def test_average_beads_improves_noisy_calibration():
    """Averaging K beads beats the single brightest bead on noisy stacks in
    the mean over seeds (each bead is an independent PSF measurement; a
    single-seed comparison is dominated by fit-realization noise —
    measured seed-mean 0.051 vs 0.079 over 6 seeds)."""
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig, average_beads, fit_psf_beads

    patch = (8, 24, 24)
    model = WideFieldConfig(shape=patch, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=2, radial=True,
                            dtype=jnp.float64)
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.15]))
    tp = np.asarray(true.phase)
    cfg = PsfFitConfig(max_iter=60, grtol=0.0)
    fit = jax.jit(lambda q: fit_psf_beads(model, q, (PHASE,), config=cfg)[0].params.phase)

    errs = {"avg": [], "one": []}
    for seed in range(3):
        stack, _h = _bead_field(model, true, seed=seed)
        avg, used = average_beads(stack, n_beads=8, patch=patch)
        assert used == 6 and avg.shape == patch
        one, used1 = average_beads(stack, n_beads=1, patch=patch)
        assert used1 == 1
        errs["avg"].append(np.linalg.norm(np.asarray(fit(jnp.asarray(avg))) - tp))
        errs["one"].append(np.linalg.norm(np.asarray(fit(jnp.asarray(one))) - tp))
    assert np.mean(errs["avg"]) < np.mean(errs["one"])
    assert np.mean(errs["avg"]) < 0.1


def test_average_beads_skips_edge_clipped():
    from microtipi_tpu.jobs.psf_fit import average_beads

    stack = np.zeros((4, 64, 64))
    stack[2, 32, 4] = 100.0  # clips a 24-wide lateral patch
    stack[2, 32, 40] = 90.0
    avg, used = average_beads(stack, n_beads=4, patch=(4, 24, 24))
    assert used == 1  # only the interior bead


def test_calibrate_field_recovers_per_region_aberrations():
    """Field-varying calibration: beads planted in two field regions under
    DIFFERENT aberrations each get their own fitted anchor (the calibration
    front end of the field-varying tiled solver, jobs/tiled.py::field_psf)."""
    from microtipi_tpu.jobs.psf_fit import calibrate_field
    from microtipi_tpu.models.microscope import DEFOCUS, PHASE
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.utils.arrays import roll

    patch = (8, 24, 24)
    vol = (8, 48, 96)
    model = WideFieldConfig(shape=patch, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=2, radial=True,
                            dtype=jnp.float64)
    p0 = model.init_params()
    phases = {24.0: [0.35, -0.15], 72.0: [-0.2, 0.25]}  # left / right field
    slide = np.zeros(vol)
    rng = np.random.default_rng(0)
    for x0, ph in phases.items():
        bead = 3000.0 * np.asarray(roll(model.compute_psf(
            p0._replace(phase=jnp.asarray(ph)))))
        y0 = 24
        slide[:, y0 - 12:y0 + 12, int(x0) - 12:int(x0) + 12] += bead
    slide += 1.0 + 0.2 * rng.standard_normal(vol)

    anchors, fits = calibrate_field(
        model, slide, families=(PHASE,), n_beads=2,
        config=PsfFitConfig(max_iter=40, grtol=0.0))
    assert len(anchors) == 2
    for (y, x), params in anchors:
        true_x = min(phases, key=lambda t: abs(t - x))
        assert abs(x - true_x) <= 1 and abs(y - 24) <= 1
        np.testing.assert_allclose(np.asarray(params.phase), phases[true_x],
                                   atol=0.05)


def test_estimate_gain_readout_recovers_camera_constants():
    """Single-shot photon transfer (weights/updaters.py): var = m/gain + rv
    regressed from structure-free local statistics. Beyond parity — TiPi
    weight updaters take gain/readout as constructor inputs."""
    from microtipi_tpu.weights.updaters import estimate_gain_readout

    rng = np.random.default_rng(0)
    zz, yy, xx = np.meshgrid(np.arange(8), np.arange(128), np.arange(128),
                             indexing="ij")
    m = 50 + 800 * np.exp(-(((yy - 64) / 40) ** 2 + ((xx - 64) / 40) ** 2)) + 5 * zz
    for gain, rv in [(2.0, 25.0), (4.0, 4.0)]:
        e = rng.poisson(m * gain)
        d = e / gain + rng.normal(0, np.sqrt(rv), m.shape)
        g_est, rv_est = jax.jit(estimate_gain_readout)(jnp.asarray(d))
        assert abs(float(g_est) - gain) / gain < 0.1
        assert abs(float(rv_est) - rv) / rv < 0.35
    # pure-Gaussian data on a flat field: gain and readout are not separable
    # (no dynamic range to regress over), but the PREDICTED variance at the
    # data level — what the weights actually use — must still be right.
    d = 100 + rng.normal(0, 3.0, (6, 96, 96))
    g_est, rv_est = estimate_gain_readout(jnp.asarray(d))
    var_pred = 100.0 / float(g_est) + float(rv_est)
    assert abs(var_pred - 9.0) / 9.0 < 0.2

    # small inputs (fewer interior voxels than bins*min_bin_count) must
    # return FINITE constants, not NaN (caught in review: the unguarded
    # regression emptied every bin and poisoned --auto-gain weights)
    for shape in [(32, 32), (4, 16, 16)]:
        g_s, rv_s = estimate_gain_readout(
            jnp.asarray(100 + rng.normal(0, 3.0, shape)))
        assert np.isfinite(float(g_s)) and np.isfinite(float(rv_s))

    with pytest.raises(ValueError, match="2D image or 3D stack"):
        estimate_gain_readout(jnp.zeros((4,)))


def test_sparse_deconvolution_priors():
    """The sparse-deconvolution prior pair on the object step (beyond
    parity; DeconvolutionConfig.sparsity/hessian). Pinned measurements:
    sparsity confines the PSF-halo flux monotonically at roughly constant
    error; the Hessian prior yields a much less staircased reconstruction
    than TV at similar error on a smooth specimen."""
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
    from microtipi_tpu.ops.regularization import hyperbolic_hessian

    shape = (8, 48, 48)
    wf = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                         dxy=100e-9, dz=250e-9, dtype=jnp.float64)
    psf = wf.compute_psf(wf.init_params())
    rng = np.random.default_rng(0)

    # sparse beads: background(=true-zero)-region flux falls with the weight
    obj = np.zeros(shape)
    for _ in range(12):
        obj[rng.integers(0, 8), rng.integers(6, 42), rng.integers(6, 42)] = \
            rng.uniform(80, 150)
    blurred = np.array(convolve(jnp.asarray(obj), convolve_spectrum(psf), shape))
    data = jnp.asarray(blurred + (0.03 * blurred.max()) * rng.standard_normal(shape))
    bg = jnp.asarray(obj == 0)
    errs, bgflux = [], []
    for sp in (0.0, 0.05, 0.2):
        cfg = DeconvolutionConfig(mu=0.02, epsilon=0.5, max_iter=60, grtol=1e-9,
                                  sparsity=sp, sparsity_epsilon=0.01)
        r = deconvolve(data, psf, config=cfg)
        errs.append(float(jnp.linalg.norm(r.x - jnp.asarray(obj))))
        bgflux.append(float(jnp.sum(jnp.where(bg, r.x, 0.0))))
    assert bgflux[0] > bgflux[1] > bgflux[2]          # monotone confinement
    assert bgflux[2] < 0.35 * bgflux[0]               # measured 307 vs 1259
    assert max(errs) < 1.15 * min(errs)               # error stays in band

    # smooth blob: hessian-only vs tv-only at weights with similar error —
    # the hessian reconstruction has far lower second-difference energy
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    smooth = 200 * np.exp(-(((zz - 4) / 2.5) ** 2 + ((yy - 24) / 10) ** 2
                            + ((xx - 24) / 10) ** 2))
    blurred = np.array(convolve(jnp.asarray(smooth), convolve_spectrum(psf), shape))
    data = jnp.asarray(blurred + (0.05 * blurred.max()) * rng.standard_normal(shape))
    r_tv = deconvolve(data, psf, config=DeconvolutionConfig(
        mu=0.2, epsilon=1.0, max_iter=60, grtol=1e-9))
    r_h = deconvolve(data, psf, config=DeconvolutionConfig(
        mu=0.0, hessian=0.2, epsilon=1.0, max_iter=60, grtol=1e-9))
    e_tv = float(jnp.linalg.norm(r_tv.x - jnp.asarray(smooth)))
    e_h = float(jnp.linalg.norm(r_h.x - jnp.asarray(smooth)))
    assert e_h < 1.15 * e_tv                          # similar recovery error
    stair_tv = float(hyperbolic_hessian(r_tv.x, 1e-3))
    stair_h = float(hyperbolic_hessian(r_h.x, 1e-3))
    assert stair_h < 0.5 * stair_tv                   # measured 42050 vs 106810


def test_empirical_psf_beats_raw_bead():
    """Model-free measured-PSF path (psf_fit.empirical_psf): centering is
    load-bearing (a raw off-center bead PSF scores WORSE than no
    deconvolution), clamp-only beats tail thresholding (measured 875 vs
    1479-1670 vs oracle 573 — thresholding destroys OTF support)."""
    from microtipi_tpu.jobs.psf_fit import empirical_psf

    shape = (16, 48, 48)
    wf = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                         dxy=100e-9, dz=250e-9, n_phase=3, radial=True,
                         dtype=jnp.float64)
    true = wf.init_params()._replace(phase=jnp.asarray([0.3, -0.2, 0.1]))
    psf = wf.compute_psf(true)
    rng = np.random.default_rng(0)
    obj = np.zeros(shape)
    obj[4:10, 10:38, 10:38] = 30.0
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    obj += 40 * np.exp(-(((zz - 8) / 2.5) ** 2 + ((yy - 24) / 6) ** 2
                         + ((xx - 24) / 6) ** 2))
    blurred = np.array(convolve(jnp.asarray(obj), convolve_spectrum(psf), shape))
    data = jnp.asarray(blurred + 0.02 * blurred.max() * rng.standard_normal(shape))
    bead = 2e5 * np.asarray(psf) + 50.0 + 5.0 * rng.standard_normal(shape)
    bead = np.roll(bead, (2, 5, -3), axis=(0, 1, 2))  # off-center acquisition

    h = jax.jit(empirical_psf)(jnp.asarray(bead))
    assert float(jnp.sum(h)) == pytest.approx(1.0, rel=1e-6)
    assert float(h.min()) >= 0.0

    cfg = DeconvolutionConfig(mu=0.02 / float(jnp.sum(psf)), epsilon=1.0,
                              max_iter=40, grtol=1e-9)

    def err_with(kern):
        r = deconvolve(data, kern * float(jnp.sum(psf)), config=cfg)
        return float(jnp.linalg.norm(r.x - jnp.asarray(obj)))

    err_emp = err_with(h)
    raw = jnp.asarray(np.maximum(bead - np.median(bead), 0.0))
    err_raw = err_with(raw / float(jnp.sum(raw)))
    err_oracle = err_with(psf / float(jnp.sum(psf)))
    err_data = float(jnp.linalg.norm(data - jnp.asarray(obj)))
    assert err_emp < 0.5 * err_raw          # centering is load-bearing
    assert err_emp < 0.55 * err_data        # clearly beats no deconvolution
    assert err_emp < 1.6 * err_oracle       # within reach of the true PSF


def test_blind_windowed_fit_mechanism_and_recovery():
    """PsfFitConfig.fit_window (VERDICT r3 item 3) mechanism tests.

    (a) A window equal to the data shape must reproduce the full fit
    EXACTLY (the crop degenerates to the identity and the window model is
    the data model) — pins the plumbing bit-for-bit. (b) A genuine crop
    must still run end to end and recover the object.

    The crop is a biased estimator at small window/PSF-support ratios:
    measured here (8,32,32 -> 8,28,28, noiseless, TRUE object), the fit
    minimum shifts by ~0.3 rad in phase norm because structure blurring
    across the window edge is mis-modeled periodically. The
    quality-vs-speed verdict at flagship scale is a BASELINE.md
    measurement, not a unit test."""
    import dataclasses

    model = make_model(n_phase=3, radial=True)
    true_params = model.init_params()._replace(phase=jnp.asarray([0.6, -0.3, 0.2]))
    obj, psf, data = make_scene(model, true_params, noise=0.005)

    base = BlindDeconvConfig(
        loops=3,
        families=(PHASE,),
        psf_max_iter=(30,),
        deconv=DeconvolutionConfig(mu=0.002, epsilon=2.0, max_iter=30),
        fit=PsfFitConfig(),
    )
    full = blind_deconvolve(data, model, config=base)
    same = blind_deconvolve(data, model, config=dataclasses.replace(
        base, fit=PsfFitConfig(fit_window=tuple(SHAPE))))
    np.testing.assert_allclose(np.asarray(same.params.phase),
                               np.asarray(full.params.phase), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(same.obj), np.asarray(full.obj),
                               rtol=0, atol=1e-12)

    win = blind_deconvolve(data, model, config=dataclasses.replace(
        base, fit=PsfFitConfig(fit_window=(8, 24, 24))))
    err_data = float(jnp.linalg.norm(data - obj))
    assert float(jnp.linalg.norm(win.obj - obj)) < 0.8 * err_data
    assert np.isfinite(np.asarray(win.params.phase)).all()
    # PSF output stays at the DATA grid (deconv step untouched)
    assert win.psf.shape == data.shape


def test_blind_windowed_fit_guards():
    import dataclasses

    import pytest

    from microtipi_tpu.jobs.blind import blind_deconvolve as bd

    model = make_model(n_phase=3, radial=True)
    data = jnp.zeros(SHAPE)
    cfg = BlindDeconvConfig(
        loops=2, families=(PHASE,), psf_max_iter=(2,),
        deconv=DeconvolutionConfig(max_iter=2),
        fit=PsfFitConfig(fit_window=(8, 16, 24)),
    )
    with pytest.raises(ValueError, match="square"):
        bd(data, model, config=cfg)
    cfg2 = dataclasses.replace(cfg, fit=PsfFitConfig(fit_window=(16, 32, 32)))
    with pytest.raises(ValueError, match="exceeds"):
        bd(data, model, config=cfg2)



def test_f32_stall_continuation_reaches_f64_optimum():
    """VERDICT r4 item 2: an f32 uniform-Gaussian solve whose quadratic
    fast path exhausts its eps*c value resolution (LINESEARCH_FAIL
    mid-budget) must continue on the residual-form objective and land at
    the f64 optimum — not 3.5x above it. The large-DC scene makes
    c = 0.5||d||^2 huge relative to f, the documented stall mechanism
    (jobs/deconv._f32_stall_continue; BASELINE.md round 5)."""
    from microtipi_tpu.jobs.deconv import make_objective
    from microtipi_tpu.optim.vmlmb import VMLMBStatus, minimize_vmlmb

    shape = (16, 48, 48)
    rng = np.random.default_rng(0)
    truth = (np.maximum(rng.normal(0, 1, shape), 0)
             * (rng.random(shape) < 0.02) * 300 + 2000.0)
    zz, yy, xx = np.meshgrid(*(np.arange(n) for n in shape), indexing="ij")
    cz, cy, cx = (n // 2 for n in shape)
    g = np.exp(-((zz - cz) ** 2 / 6 + (yy - cy) ** 2 / 5 + (xx - cx) ** 2 / 5))
    psf = np.fft.ifftshift(g / g.sum())
    data = np.fft.irfftn(np.fft.rfftn(truth) * np.fft.rfftn(psf), s=shape,
                         axes=(0, 1, 2))
    data = data + 0.002 * 300 * rng.standard_normal(shape)

    cfg = DeconvolutionConfig(mu=0.01, epsilon=1.0, max_iter=400,
                              max_eval=100000, grtol=0.0, gatol=0.0)
    r64 = deconvolve(jnp.asarray(data), jnp.asarray(psf), config=cfg)

    d32 = jnp.asarray(data, jnp.float32)
    p32 = jnp.asarray(psf, jnp.float32)
    # the uncured quadratic path stalls early (the mechanism precondition)
    rq = minimize_vmlmb(
        make_objective(p32, d32, None, cfg), jnp.maximum(d32, 0.0),
        lower=0.0, mem=5, maxiter=400, maxeval=100000, gatol=0.0, grtol=0.0)
    assert int(rq.status) == VMLMBStatus.LINESEARCH_FAIL
    assert int(rq.iterations) < 50

    r32 = deconvolve(d32, p32, config=cfg)
    assert int(r32.iterations) > int(rq.iterations) + 20  # it continued

    fg64 = make_objective(jnp.asarray(psf), jnp.asarray(data), None, cfg)
    f_star = float(r64.f)
    f_cured = float(fg64(jnp.asarray(np.asarray(r32.x), jnp.float64))[0])
    f_stall = float(fg64(jnp.asarray(np.asarray(rq.x), jnp.float64))[0])
    assert f_stall > 2.0 * f_star          # the stall is real on this scene
    assert f_cured <= f_star * 1.01        # the cure lands at the optimum
    # merged bookkeeping is sane
    assert int(r32.evaluations) > int(rq.evaluations)
    hist = np.asarray(r32.f_history)
    assert np.isfinite(hist[: int(r32.iterations) + 1]).all()
