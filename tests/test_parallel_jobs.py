"""Sharded jobs on the virtual 8-device mesh: deconv, PSF fit, blind loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.jobs.blind import BlindDeconvConfig
from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
from microtipi_tpu.jobs.psf_fit import PsfFitConfig, fit_psf
from microtipi_tpu.models.microscope import PHASE
from microtipi_tpu.models.widefield import WideFieldConfig
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
from microtipi_tpu.parallel.blind import sharded_blind_deconvolve
from microtipi_tpu.parallel.deconv import sharded_deconvolve
from microtipi_tpu.parallel.mesh import make_mesh, volume_sharding
from microtipi_tpu.parallel.psf_fit import sharded_fit_psf

SHAPE = (16, 32, 32)
KW = dict(na=1.2, wavelength=500e-9, ni=1.33, dxy=100e-9, dz=250e-9)


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(batch=1, z=8)


@pytest.fixture(scope="module")
def scene():
    model = WideFieldConfig(shape=SHAPE, n_phase=3, radial=True, dtype=jnp.float64, **KW)
    true = model.init_params()._replace(phase=jnp.asarray([0.4, -0.2, 0.1]))
    rng = np.random.default_rng(0)
    obj = np.zeros(SHAPE)
    obj[4:10, 8:20, 8:20] = 60.0
    obj[10:14, 20:28, 4:12] = 90.0
    obj = jnp.asarray(obj)
    psf = model.compute_psf(true)
    data = convolve(obj, convolve_spectrum(psf), SHAPE)
    data = data + 0.01 * jnp.asarray(rng.standard_normal(SHAPE))
    return model, true, obj, psf, data


def test_sharded_deconvolve_matches_single_device(mesh8, scene):
    model, true, obj, psf, data = scene
    cfg = DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=15, grtol=0.0)
    ref = deconvolve(data, psf, config=cfg)
    data_sh = jax.device_put(data, volume_sharding(mesh8, batched=False))
    got = sharded_deconvolve(data_sh, psf, mesh8, config=cfg)
    # Same math, same iterations -> near-identical result (fp reduction order
    # differs across the mesh).
    np.testing.assert_allclose(float(got.f), float(ref.f), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x), atol=1e-6)


def test_sharded_fit_psf_matches_single_device(mesh8, scene):
    model, true, obj, psf, data = scene
    start = model.init_params()
    cfg = PsfFitConfig(max_iter=15, grtol=0.0)
    ref = fit_psf(model, start, PHASE, data, obj, config=cfg)
    data_sh = jax.device_put(data, volume_sharding(mesh8, batched=False))
    obj_sh = jax.device_put(obj, volume_sharding(mesh8, batched=False))
    got = sharded_fit_psf(model, start, PHASE, data_sh, obj_sh, mesh8, config=cfg)
    np.testing.assert_allclose(
        np.asarray(got.params.phase), np.asarray(ref.params.phase), atol=1e-7
    )


def test_sharded_blind_deconvolve_batched(mesh8, scene):
    model, true, obj, psf, data = scene
    mesh = make_mesh(batch=2, z=4)
    batched = jnp.stack([data, data * 1.1])
    batched = jax.device_put(batched, volume_sharding(mesh, batched=True))
    cfg = BlindDeconvConfig(
        loops=2, families=(PHASE,), psf_max_iter=(5,),
        deconv=DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=5),
    )
    res = sharded_blind_deconvolve(batched, model, mesh, config=cfg)
    assert res.obj.shape == (2,) + SHAPE
    assert np.isfinite(np.asarray(res.deconv_f)).all()
    df = np.asarray(res.deconv_f)
    assert df[1] <= df[0]
    assert np.isnan(np.asarray(res.fit_f)[-1]).all()  # last round skips refit


def test_sharded_blind_matches_dense(mesh8, scene):
    """Full sharded blind loop == dense blind loop on one volume (same math,
    modulo cross-device reduction order)."""
    from microtipi_tpu.jobs.blind import blind_deconvolve
    from microtipi_tpu.parallel.blind import sharded_blind_deconvolve

    model, true, obj, psf, data = scene
    cfg = BlindDeconvConfig(
        loops=2, families=(PHASE,), psf_max_iter=(5,),
        deconv=DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=5),
    )
    # Dense path with explicit ones weights (the sharded path has no
    # quadratic fast path, so match the generic-weighted trajectory).
    dense = blind_deconvolve(data, model, weights=jnp.ones_like(data), config=cfg)
    data_sh = jax.device_put(data, volume_sharding(mesh8, batched=False))
    shard = sharded_blind_deconvolve(
        data_sh, model, mesh8, weights=jnp.ones_like(data), config=cfg
    )
    np.testing.assert_allclose(
        np.asarray(shard.deconv_f), np.asarray(dense.deconv_f), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(shard.params.phase), np.asarray(dense.params.phase), atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(shard.obj), np.asarray(dense.obj), atol=1e-6)


def test_sharded_blind_matches_dense_quality_recipe(mesh8, scene):
    """Feature parity of the sharded loop with the dense quality recipe:
    joint_fit + pin-Z4 (phase_freeze_head) + wiener warm start must produce
    the dense trajectory on the mesh (same math, modulo reduction order)."""
    from microtipi_tpu.jobs.blind import blind_deconvolve
    from microtipi_tpu.models.microscope import DEFOCUS

    model, true, obj, psf, data = scene
    cfg = BlindDeconvConfig(
        loops=2, families=(DEFOCUS, PHASE), psf_max_iter=(4, 4),
        deconv=DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=5),
        joint_fit=True, phase_freeze_head=1, init="wiener",
    )
    dense = blind_deconvolve(data, model, weights=jnp.ones_like(data), config=cfg)
    data_sh = jax.device_put(data, volume_sharding(mesh8, batched=False))
    shard = sharded_blind_deconvolve(
        data_sh, model, mesh8, weights=jnp.ones_like(data), config=cfg
    )
    np.testing.assert_allclose(
        np.asarray(shard.deconv_f), np.asarray(dense.deconv_f), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(shard.params.phase), np.asarray(dense.params.phase), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(shard.params.defocus), np.asarray(dense.params.defocus), rtol=1e-9
    )
    # pin-Z4: the frozen head coefficient must not have moved
    assert float(shard.params.phase[0]) == float(true.phase[0] * 0)


def test_sharded_blind_phase_schedule_matches_dense(mesh8, scene):
    from microtipi_tpu.jobs.blind import blind_deconvolve

    model, true, obj, psf, data = scene
    cfg = BlindDeconvConfig(
        loops=3, families=(PHASE,), psf_max_iter=(4,),
        deconv=DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=4),
        phase_schedule=(1, 2, 3),
    )
    dense = blind_deconvolve(data, model, weights=jnp.ones_like(data), config=cfg)
    data_sh = jax.device_put(data, volume_sharding(mesh8, batched=False))
    shard = sharded_blind_deconvolve(
        data_sh, model, mesh8, weights=jnp.ones_like(data), config=cfg
    )
    np.testing.assert_allclose(
        np.asarray(shard.params.phase), np.asarray(dense.params.phase), atol=1e-7
    )


def test_sharded_deconvolve_padded_matches_dense_crop(mesh8, scene):
    """Odd-sized stack (Nz=12 on an 8-way z axis): the mesh's zero-weight
    padded-variable mode must equal the dense crop-operator mode exactly."""
    model, true, obj, psf, data = scene
    data_odd = data[:12, :16, :16]
    model_odd = WideFieldConfig(shape=(12, 16, 16), n_phase=3, radial=True,
                                dtype=jnp.float64, **KW)
    psf_odd = model_odd.compute_psf(true)
    cfg = DeconvolutionConfig(
        mu=0.002, epsilon=1.0, max_iter=10, grtol=0.0, var_shape=(16, 16, 16)
    )
    ref = deconvolve(data_odd, psf_odd, config=cfg)
    got = sharded_deconvolve(data_odd, psf_odd, mesh8, config=cfg)
    assert got.x.shape == (16, 16, 16)
    np.testing.assert_allclose(float(got.f), float(ref.f), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x), atol=1e-6)


def test_sharded_deconvolve_ny_indivisible_matches_dense_crop(mesh8, scene):
    """BOTH trailing axes indivisible by the 8-way mesh z axis (Nz=12,
    Ny=14): the distributed FFT's all-to-all layout runs on the padded
    (16, 16, 14) grid and must equal the dense crop-operator mode exactly —
    the shard-size regime VERDICT r2 flagged as untested (a layout bug
    confined to Ny padding would not trip the Nz-only tests)."""
    model, true, obj, psf, data = scene
    data_odd = data[:12, :14, :14]
    model_odd = WideFieldConfig(shape=(12, 14, 14), n_phase=3, radial=True,
                                dtype=jnp.float64, **KW)
    psf_odd = model_odd.compute_psf(true)
    cfg = DeconvolutionConfig(
        mu=0.002, epsilon=1.0, max_iter=10, grtol=0.0, var_shape=(16, 16, 14)
    )
    ref = deconvolve(data_odd, psf_odd, config=cfg)
    got = sharded_deconvolve(data_odd, psf_odd, mesh8, config=cfg)
    assert got.x.shape == (16, 16, 14)
    np.testing.assert_allclose(float(got.f), float(ref.f), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x), atol=1e-6)


def test_sharded_blind_ny_indivisible_autopads(mesh8, scene):
    """Nz=12 AND Ny=14 on an 8-way z mesh: the blind loop rounds both axes
    up internally (parallel/blind.py var_shape) and runs the full recipe."""
    model, true, obj, psf, data = scene
    data_odd = data[:12, :14, :14]
    model_odd = WideFieldConfig(shape=(12, 14, 14), n_phase=3, radial=True,
                                dtype=jnp.float64, **KW)
    cfg = BlindDeconvConfig(
        loops=2, families=(PHASE,), psf_max_iter=(4,),
        deconv=DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=5),
        joint_fit=True, init="wiener",
    )
    res = sharded_blind_deconvolve(data_odd, model_odd, mesh8, config=cfg)
    assert res.obj.shape == (16, 16, 14)
    df = np.asarray(res.deconv_f)
    assert np.isfinite(df).all() and df[1] <= df[0]
    assert np.isfinite(np.asarray(res.params.phase)).all()


def test_sharded_blind_odd_shape_autopads(mesh8, scene):
    """Nz=12, Ny=16 on an 8-way z mesh: the blind loop pads internally and
    still runs the full recipe (no manual padding required)."""
    model, true, obj, psf, data = scene
    data_odd = data[:12, :16, :16]
    model_odd = WideFieldConfig(shape=(12, 16, 16), n_phase=3, radial=True,
                                dtype=jnp.float64, **KW)
    cfg = BlindDeconvConfig(
        loops=2, families=(PHASE,), psf_max_iter=(4,),
        deconv=DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=5),
        joint_fit=True, init="wiener",
    )
    res = sharded_blind_deconvolve(data_odd, model_odd, mesh8, config=cfg)
    assert res.obj.shape == (16, 16, 16)
    df = np.asarray(res.deconv_f)
    assert np.isfinite(df).all() and df[1] <= df[0]
    assert np.isfinite(np.asarray(res.params.phase)).all()


def test_sharded_richardson_lucy_matches_dense(mesh8, scene):
    from microtipi_tpu.jobs.richardson_lucy import richardson_lucy
    from microtipi_tpu.parallel.richardson_lucy import sharded_richardson_lucy

    model, true, obj, psf, data = scene
    ref = richardson_lucy(data, psf, iterations=10, mu=0.01, epsilon=0.5)
    data_sh = jax.device_put(data, volume_sharding(mesh8, batched=False))
    got = sharded_richardson_lucy(data_sh, psf, mesh8, iterations=10, mu=0.01, epsilon=0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-8, atol=1e-10)


def test_sharded_richardson_lucy_batched(mesh8, scene):
    from microtipi_tpu.parallel.richardson_lucy import sharded_richardson_lucy

    model, true, obj, psf, data = scene
    mesh = make_mesh(batch=2, z=4)
    batched = jnp.stack([data, data * 1.2])
    batched = jax.device_put(batched, volume_sharding(mesh, batched=True))
    got = sharded_richardson_lucy(batched, psf, mesh, iterations=5)
    assert got.shape == (2,) + SHAPE
    assert np.isfinite(np.asarray(got)).all() and (np.asarray(got) >= 0).all()


def test_sharded_blind_mu_schedule_matches_dense(mesh8, scene):
    from microtipi_tpu.jobs.blind import blind_deconvolve

    model, true, obj, psf, data = scene
    cfg = BlindDeconvConfig(
        loops=2, families=(PHASE,), psf_max_iter=(4,),
        deconv=DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=4),
        mu_schedule=(0.02, 0.002),
    )
    dense = blind_deconvolve(data, model, weights=jnp.ones_like(data), config=cfg)
    data_sh = jax.device_put(data, volume_sharding(mesh8, batched=False))
    shard = sharded_blind_deconvolve(
        data_sh, model, mesh8, weights=jnp.ones_like(data), config=cfg
    )
    np.testing.assert_allclose(
        np.asarray(shard.params.phase), np.asarray(dense.params.phase), atol=1e-7
    )
    # annealed first round actually used the stronger mu
    cfg_const = BlindDeconvConfig(
        loops=2, families=(PHASE,), psf_max_iter=(4,),
        deconv=DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=4),
    )
    const = blind_deconvolve(data, model, weights=jnp.ones_like(data), config=cfg_const)
    assert abs(float(dense.deconv_f[0]) - float(const.deconv_f[0])) > 1e-6


def test_sharded_fit_psf_generic_over_model_families(mesh8):
    """The mesh paths consume only the PsfModel protocol: a confocal model
    (extra internal FFTs, product composition) fits on the mesh and matches
    the dense fit_psf result."""
    from microtipi_tpu.models.confocal import ConfocalConfig

    model = ConfocalConfig(
        shape=SHAPE, n_phase=3, radial=True, dtype=jnp.float64,
        wavelength_exc=488e-9, pinhole=150e-9, **KW
    )
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.15, 0.1]))
    rng = np.random.default_rng(1)
    obj = jnp.asarray(rng.random(SHAPE))
    data = convolve(obj, convolve_spectrum(model.compute_psf(true)), SHAPE)

    cfg = PsfFitConfig(max_iter=12)
    ref = fit_psf(model, model.init_params(), PHASE, data, obj, config=cfg)
    data_sh = jax.device_put(data, volume_sharding(mesh8, batched=False))
    obj_sh = jax.device_put(obj, volume_sharding(mesh8, batched=False))
    got = sharded_fit_psf(model, model.init_params(), PHASE, data_sh, obj_sh, mesh8, config=cfg)
    # mesh FFT decomposition reorders reductions; through 12 VMLMB
    # iterations the trajectories agree to fit-level precision only
    np.testing.assert_allclose(np.asarray(got.params.phase), np.asarray(ref.params.phase),
                               atol=5e-4)


def test_sharded_fit_psf_preconditioned_sheet_matches_dense(mesh8):
    """Physical-scale families (SHEET here, same mechanism as GL DEPTH) need
    the per-component gradient preconditioning on the mesh exactly as in the
    dense fit — without it the meter-scale coordinates stall (jobs/psf_fit.py).
    The sharded preconditioned fit must match the dense one."""
    from microtipi_tpu.models.lightsheet import LightSheetConfig
    from microtipi_tpu.models.microscope import SHEET

    model = LightSheetConfig(
        shape=SHAPE, n_phase=3, radial=True, dtype=jnp.float64,
        sheet_na=0.15, wavelength_exc=488e-9, **KW
    )
    p0 = model.init_params()
    true = p0._replace(sheet=jnp.asarray([0.3e-6, 1.3 * model.waist]))
    rng = np.random.default_rng(2)
    obj = jnp.asarray((rng.random(SHAPE) > 0.97) * rng.random(SHAPE) * 80)
    data = convolve(obj, convolve_spectrum(model.compute_psf(true)), SHAPE)

    cfg = PsfFitConfig(max_iter=25, grtol=0.0)
    ref = fit_psf(model, p0, SHEET, data, obj, config=cfg, precondition=True)
    data_sh = jax.device_put(data, volume_sharding(mesh8, batched=False))
    obj_sh = jax.device_put(obj, volume_sharding(mesh8, batched=False))
    got = sharded_fit_psf(model, p0, SHEET, data_sh, obj_sh, mesh8,
                          config=cfg, precondition=True)
    # Both recover the true geometry...
    assert abs(float(ref.params.sheet[1]) - 1.3 * model.waist) < 0.05 * model.waist
    assert abs(float(got.params.sheet[1]) - 1.3 * model.waist) < 0.05 * model.waist
    # ...and agree with each other to fit-level precision.
    np.testing.assert_allclose(np.asarray(got.params.sheet),
                               np.asarray(ref.params.sheet), rtol=5e-4)


def test_sharded_sparse_hessian_priors_match_dense(mesh8, scene):
    """The sparse-deconvolution priors (sparsity + hessian fields) take the
    same value on the mesh as on one device (GSPMD halo exchange of the
    second differences)."""
    model, true, obj, psf, data = scene
    cfg = DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=12, grtol=0.0,
                              sparsity=0.01, sparsity_epsilon=0.05,
                              hessian=0.05)
    ref = deconvolve(data, psf, config=cfg)
    data_sh = jax.device_put(data, volume_sharding(mesh8, batched=False))
    got = sharded_deconvolve(data_sh, psf, mesh8, config=cfg)
    np.testing.assert_allclose(float(got.f), float(ref.f), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x), atol=1e-6)


def test_sharded_admm_matches_dense(mesh8, scene):
    """parallel.admm.sharded_admm_deconvolve == jobs.admm.admm_deconvolve:
    same splitting, same masked-prox objective, distributed FFTs — identical
    trajectory up to cross-mesh reduction order. Uniform-Gaussian (2-FFT
    x-update), weighted (data split), and Poisson variants."""
    from microtipi_tpu.jobs.admm import admm_deconvolve
    from microtipi_tpu.parallel.admm import sharded_admm_deconvolve

    model, true, obj, psf, data = scene
    cfg = DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=15, grtol=0.0)
    data_sh = jax.device_put(data, volume_sharding(mesh8, batched=False))

    ref = admm_deconvolve(data, psf, config=cfg)
    got = sharded_admm_deconvolve(data_sh, psf, mesh8, config=cfg)
    np.testing.assert_allclose(float(got.f), float(ref.f), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.f_history),
                               np.asarray(ref.f_history), rtol=1e-7)

    rng = np.random.default_rng(1)
    w = jnp.asarray(0.5 + rng.random(SHAPE))
    ref_w = admm_deconvolve(data, psf, weights=w, config=cfg)
    got_w = sharded_admm_deconvolve(data_sh, psf, mesh8, weights=w, config=cfg)
    np.testing.assert_allclose(float(got_w.f), float(ref_w.f), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(got_w.x), np.asarray(ref_w.x), atol=1e-6)

    # Zero-weight NaN exclusion (ADVICE r4): a NaN at a zero-weight voxel
    # must not poison the sharded solve — the dense-engine invariant,
    # pinned here because the sharded prox/default-x0 read data directly.
    wz = w.at[0, 0, 0].set(0.0)
    bad = data.at[0, 0, 0].set(jnp.nan)
    ref_z = admm_deconvolve(bad, psf, weights=wz, config=cfg)
    bad_sh = jax.device_put(bad, volume_sharding(mesh8, batched=False))
    got_z = sharded_admm_deconvolve(bad_sh, psf, mesh8, weights=wz, config=cfg)
    assert np.isfinite(np.asarray(got_z.x)).all()
    assert np.isfinite(float(got_z.f))
    np.testing.assert_allclose(float(got_z.f), float(ref_z.f), rtol=1e-8)

    dpois = jnp.maximum(data, 0.0) + 1.0
    pcfg = DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=10, grtol=0.0,
                               data_term="poisson", background=0.5)
    ref_p = admm_deconvolve(dpois, psf, config=pcfg)
    dpois_sh = jax.device_put(dpois, volume_sharding(mesh8, batched=False))
    got_p = sharded_admm_deconvolve(dpois_sh, psf, mesh8, config=pcfg)
    np.testing.assert_allclose(float(got_p.f), float(ref_p.f), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(got_p.x), np.asarray(ref_p.x), atol=1e-6)


def test_sharded_blind_admm_engine_matches_dense(mesh8, scene):
    """The sharded blind loop with deconv_engine='admm' == the dense loop
    with the same engine (mesh-divisible volume, no padding)."""
    from microtipi_tpu.jobs.blind import blind_deconvolve
    from microtipi_tpu.models.microscope import DEFOCUS

    model, true, obj, psf, data = scene
    cfg = BlindDeconvConfig(
        loops=2, families=(DEFOCUS, PHASE), psf_max_iter=(3, 3),
        joint_fit=True, deconv_engine="admm",
        deconv=DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=8,
                                   grtol=0.0, gatol=0.0),
        fit=PsfFitConfig(grtol=0.0))
    ref = blind_deconvolve(data, model, config=cfg)
    data_sh = jax.device_put(data, volume_sharding(mesh8, batched=False))
    got = sharded_blind_deconvolve(data_sh, model, mesh8, config=cfg)
    np.testing.assert_allclose(np.asarray(got.deconv_f),
                               np.asarray(ref.deconv_f), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(got.params.phase),
                               np.asarray(ref.params.phase), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.obj), np.asarray(ref.obj),
                               atol=1e-5)


def test_sharded_blind_admm_guards(mesh8, scene):
    """Batched and auto-padded sharded loops reject the admm engine with an
    actionable message instead of silently running a different solver."""
    model, true, obj, psf, data = scene
    cfg = BlindDeconvConfig(
        loops=2, families=(PHASE,), psf_max_iter=(2,), deconv_engine="admm",
        deconv=DeconvolutionConfig(mu=0.002, max_iter=4, grtol=0.0))
    with pytest.raises(ValueError, match="mesh-divisible"):
        sharded_blind_deconvolve(
            jnp.stack([data, data]), model, mesh8, config=cfg)
    odd = data[:-1]  # Nz=15 on an 8-way z axis -> auto-pad path
    model_odd = WideFieldConfig(shape=odd.shape, n_phase=3, radial=True,
                                dtype=jnp.float64, **KW)
    with pytest.raises(ValueError, match="mesh-divisible"):
        sharded_blind_deconvolve(odd, model_odd, mesh8, config=cfg)
