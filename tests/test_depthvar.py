"""Depth-varying convolution + deconvolution invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
from microtipi_tpu.jobs.depthvar import deconvolve_depthvar, depth_anchor_psfs
from microtipi_tpu.models.gibson_lanni import GibsonLanniConfig
from microtipi_tpu.ops.convolution import WeightedConvolutionCost
from microtipi_tpu.ops.depthconv import (
    DepthVaryingConvCost,
    depth_varying_convolve,
    depth_weights,
)

SHAPE = (12, 24, 24)


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape))


def _gl_model(depth=0.0):
    return GibsonLanniConfig(
        shape=SHAPE, na=1.3, wavelength=500e-9, ni=1.518, dxy=100e-9, dz=250e-9,
        n_phase=0, n_modulus=1, ns=1.36, depth=depth, dtype=jnp.float64,
    )


def test_depth_weights_partition_of_unity():
    w = depth_weights(17, [0.0, 4.5, 16.0])
    np.testing.assert_allclose(w.sum(axis=0), 1.0, atol=1e-14)
    assert (w >= 0).all()
    # Exactly-on-anchor planes take the full weight of that anchor.
    assert w[1, 4] < 1.0 and w[0, 0] == 1.0 and w[2, 16] == 1.0


def test_depth_weights_clamp_outside_span():
    w = depth_weights(10, [3.0, 6.0])
    np.testing.assert_allclose(w[0, :4], 1.0)
    np.testing.assert_allclose(w[1, 6:], 1.0)


def test_constant_stack_reduces_to_plain_convolution():
    """Identical anchor PSFs + partition of unity == shift-invariant blur."""
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.random(SHAPE))
    x = jnp.asarray(rng.random(SHAPE))
    kernels = jnp.stack([h, h, h])
    cost_dv = DepthVaryingConvCost.build(kernels, x)
    cost_si = WeightedConvolutionCost.build(h, x)
    np.testing.assert_allclose(
        np.asarray(cost_dv.model(x)), np.asarray(cost_si.model(x)), rtol=1e-12
    )


def test_adjoint_dot_product():
    """<H x, y> == <x, H^T y> with H^T from autodiff (SURVEY section 4)."""
    rng = np.random.default_rng(1)
    kernels = jnp.asarray(rng.random((3,) + SHAPE))
    zw = jnp.asarray(depth_weights(SHAPE[0], [0.0, 5.0, 11.0]))
    k_hat = jnp.fft.rfftn(kernels, axes=(1, 2, 3))

    def fwd(x):
        return depth_varying_convolve(x, k_hat, zw, SHAPE)

    x = _rand(SHAPE, 2)
    y = _rand(SHAPE, 3)
    hx = fwd(x)
    _, vjp = jax.vjp(fwd, x)
    (hty,) = vjp(y)
    np.testing.assert_allclose(
        float(jnp.vdot(hx, y)), float(jnp.vdot(x, hty)), rtol=1e-10
    )


def test_depth_anchor_psfs_match_single_synthesis():
    model = _gl_model(depth=1e-6)
    params = model.init_params()
    anchors = np.array([0.0, 6.0, 11.0])
    stack = depth_anchor_psfs(model, params, anchors)
    assert stack.shape == (3,) + SHAPE
    for i, a in enumerate(anchors):
        p = params._replace(depth=params.depth.at[1].set(1e-6 + a * model.dz))
        np.testing.assert_allclose(
            np.asarray(stack[i]), np.asarray(model.compute_psf(p)), rtol=1e-10
        )


def test_depthvar_deconv_beats_mismatched_single_psf():
    """On strongly depth-variant blur, the depth-aware solve fits the data
    better than the best shift-invariant approximation (middle-depth PSF)."""
    model = _gl_model(depth=0.0)
    params = model.init_params()
    anchors = np.array([0.0, 5.5, 11.0])
    # Index mismatch ns=1.36 vs ni=1.518 over a 2.75 um stack: ~2 waves of
    # spherical-aberration change between the first and last anchor.
    stack = depth_anchor_psfs(model, params, anchors, depth0=0.0)

    rng = np.random.default_rng(4)
    obj = np.zeros(SHAPE)
    for _ in range(8):
        z, y, x = rng.integers(1, 11), rng.integers(4, 20), rng.integers(4, 20)
        obj[z, y, x] = rng.uniform(50, 200)
    obj = jnp.asarray(obj)

    zw = jnp.asarray(depth_weights(SHAPE[0], anchors))
    k_hat = jnp.fft.rfftn(stack, axes=(1, 2, 3))
    data = depth_varying_convolve(obj, k_hat, zw, SHAPE)
    data = data + 1e-3 * float(jnp.max(data)) * _rand(SHAPE, 5)

    cfg = DeconvolutionConfig(mu=1e-4, epsilon=1.0, max_iter=15, grtol=0.0)
    res_dv = deconvolve_depthvar(data, stack, anchors, config=cfg)
    res_si = deconvolve(data, stack[1], config=cfg)
    err_dv = float(jnp.linalg.norm(res_dv.x - obj) / jnp.linalg.norm(obj))
    err_si = float(jnp.linalg.norm(res_si.x - obj) / jnp.linalg.norm(obj))
    assert np.isfinite(float(res_dv.f))
    assert err_dv < err_si


def test_depthvar_padded_variable_mode():
    model = _gl_model()
    params = model.init_params()
    anchors = np.array([0.0, 11.0])
    psfs = depth_anchor_psfs(model, params, anchors)
    data = jnp.maximum(_rand(SHAPE, 6), 0.0)
    var_shape = (16, 32, 32)
    cfg = DeconvolutionConfig(mu=1e-3, epsilon=1.0, max_iter=4, grtol=0.0,
                              var_shape=var_shape)
    res = deconvolve_depthvar(data, psfs, anchors, config=cfg)
    assert res.x.shape == var_shape
    assert np.isfinite(float(res.f))


def test_sharded_depthvar_matches_dense():
    """Mesh-sharded depth-varying solve == dense solve (8-device z mesh)."""
    from microtipi_tpu.parallel.depthvar import sharded_deconvolve_depthvar
    from microtipi_tpu.parallel.mesh import make_mesh, volume_sharding

    mesh = make_mesh(batch=1, z=8)
    rng = np.random.default_rng(7)
    shape = (16, 24, 24)  # Nz divisible by the z axis for the strict-equality variant
    model16 = GibsonLanniConfig(
        shape=shape, na=1.3, wavelength=500e-9, ni=1.518, dxy=100e-9, dz=250e-9,
        n_phase=0, n_modulus=1, ns=1.36, depth=0.0, dtype=jnp.float64,
    )
    anchors16 = np.array([0.0, 7.5, 15.0])
    stack16 = depth_anchor_psfs(model16, model16.init_params(), anchors16)
    data = jnp.asarray(rng.random(shape))
    cfg = DeconvolutionConfig(mu=1e-3, epsilon=1.0, max_iter=6, grtol=0.0)

    dense = deconvolve_depthvar(data, stack16, anchors16, config=cfg)
    data_sh = jax.device_put(data, volume_sharding(mesh, batched=False))
    sh = jax.jit(lambda d: sharded_deconvolve_depthvar(
        d, stack16, mesh, anchors16, config=cfg))(data_sh)
    np.testing.assert_allclose(float(sh.f), float(dense.f), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(sh.x), np.asarray(dense.x), rtol=1e-8)


def test_sharded_depthvar_padded_odd_nz():
    """Mesh-odd Nz auto-works via the padded-variable route."""
    from microtipi_tpu.parallel.depthvar import sharded_deconvolve_depthvar
    from microtipi_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(batch=1, z=8)
    shape = (12, 24, 24)  # 12 % 8 != 0 -> pad to 16
    model = _gl_model()
    anchors = np.array([0.0, 11.0])
    psfs = depth_anchor_psfs(model, model.init_params(), anchors)
    data = jnp.maximum(_rand(shape, 8), 0.0)
    cfg = DeconvolutionConfig(mu=1e-3, epsilon=1.0, max_iter=3, grtol=0.0,
                              var_shape=(16, 24, 24))
    res = jax.jit(lambda d: sharded_deconvolve_depthvar(
        d, psfs, mesh, anchors, config=cfg))(data)
    assert res.x.shape == (16, 24, 24)
    assert np.isfinite(float(res.f))


def _depthvar_scene(model, p_true, anchors, seed=9, n_points=8):
    """Sparse-point object blurred by the depth-varying operator at p_true."""
    rng = np.random.default_rng(seed)
    obj = np.zeros(SHAPE)
    for _ in range(n_points):
        z, y, x = rng.integers(1, 11), rng.integers(4, 20), rng.integers(4, 20)
        obj[z, y, x] = rng.uniform(50, 200)
    obj = jnp.asarray(obj)
    stack = depth_anchor_psfs(model, p_true, anchors, depth0=float(p_true.depth[1]))
    zw = jnp.asarray(depth_weights(SHAPE[0], anchors))
    data = depth_varying_convolve(obj, jnp.fft.rfftn(stack, axes=(1, 2, 3)), zw, SHAPE)
    return obj, data


def test_fit_psf_depthvar_recovers_phase():
    """Depth-varying PSF fit (true object fixed) recovers the phase family —
    the depth-varying analog of psf_fit.fit_psf's object-as-kernel trick."""
    from microtipi_tpu.jobs.depthvar import fit_psf_depthvar
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig
    from microtipi_tpu.models.microscope import PHASE

    model = GibsonLanniConfig(
        shape=SHAPE, na=1.3, wavelength=500e-9, ni=1.518, dxy=100e-9, dz=250e-9,
        n_phase=3, ns=1.36, depth=0.0, dtype=jnp.float64,
    )
    anchors = np.array([0.0, 5.5, 11.0])
    phase_true = jnp.asarray([0.2, -0.1, 0.05])
    p_true = model.init_params()._replace(phase=phase_true)
    obj, data = _depthvar_scene(model, p_true, anchors)

    res = fit_psf_depthvar(
        model, model.init_params(), (PHASE,), data, obj, anchors,
        config=PsfFitConfig(max_iter=40, grtol=0.0),
    )
    np.testing.assert_allclose(np.asarray(res.params.phase),
                               np.asarray(phase_true), atol=2e-3)


def test_fit_psf_depthvar_joint_depth_family():
    """Joint (DEFOCUS, DEPTH) fit under the depth-varying operator moves the
    sample index toward truth when the true object is known (the fixed-object
    identifiability regime — blind ns is a measured dead end, BASELINE.md)."""
    from microtipi_tpu.jobs.depthvar import fit_psf_depthvar
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig
    from microtipi_tpu.models.microscope import DEFOCUS, DEPTH

    model = _gl_model()
    anchors = np.array([0.0, 5.5, 11.0])
    p_true = model.init_params()._replace(
        depth=jnp.asarray([1.36 / 500e-9, 0.0]))
    obj, data = _depthvar_scene(model, p_true, anchors, seed=10)

    p0 = p_true._replace(depth=jnp.asarray([1.42 / 500e-9, 0.0]))
    res = fit_psf_depthvar(
        model, p0, (DEFOCUS, DEPTH), data, obj, anchors,
        config=PsfFitConfig(max_iter=50, grtol=0.0),
    )
    ns_fit = float(res.params.depth[0]) * 500e-9
    assert abs(ns_fit - 1.36) < abs(1.42 - 1.36) / 4
    assert np.isfinite(float(res.f))


def test_blind_deconvolve_depthvar_recovers_phase():
    """End-to-end blind alternation under the depth-varying operator: the
    phase family converges toward truth and the anchor stack is returned."""
    from microtipi_tpu.jobs.blind import BlindDeconvConfig
    from microtipi_tpu.jobs.depthvar import blind_deconvolve_depthvar
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig
    from microtipi_tpu.models.microscope import PHASE

    model = GibsonLanniConfig(
        shape=SHAPE, na=1.3, wavelength=500e-9, ni=1.518, dxy=100e-9, dz=250e-9,
        n_phase=3, ns=1.36, depth=0.0, dtype=jnp.float64,
    )
    anchors = np.array([0.0, 5.5, 11.0])
    phase_true = jnp.asarray([0.3, -0.15, 0.0])
    p_true = model.init_params()._replace(phase=phase_true)
    obj, data = _depthvar_scene(model, p_true, anchors, seed=11, n_points=12)
    data = data + 1e-4 * float(jnp.max(data)) * _rand(SHAPE, 12)

    cfg = BlindDeconvConfig(
        loops=3, families=(PHASE,), psf_max_iter=(15,),
        deconv=DeconvolutionConfig(mu=1e-4, epsilon=1.0, max_iter=15, grtol=0.0),
        fit=PsfFitConfig(max_iter=15),
    )
    res = blind_deconvolve_depthvar(data, model, anchors, config=cfg)
    assert res.psf.shape == (3,) + SHAPE
    err0 = float(jnp.linalg.norm(model.init_params().phase - phase_true))
    err1 = float(jnp.linalg.norm(res.params.phase - phase_true))
    assert err1 < 0.5 * err0  # 0.335 -> ~0.134 measured at this tiny budget
    assert np.isfinite(float(jnp.sum(res.obj)))


def test_calibrate_depth_ladder_recovers_ns():
    """Depth-ladder bead calibration: beads at K known depths pin the sample
    index (single-depth cannot — the slope of aberration vs depth IS ns)."""
    from microtipi_tpu.jobs.depthvar import calibrate_depth
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig
    from microtipi_tpu.models.microscope import DEPTH

    model = _gl_model()
    ns_true = 1.36
    p_true = model.init_params()._replace(
        depth=jnp.asarray([ns_true / 500e-9, 0.0]))
    ladder_z = np.array([0.0, 5.5, 11.0])
    rng = np.random.default_rng(13)
    beads = []
    for zj in ladder_z:
        h = model.compute_psf(p_true._replace(
            depth=jnp.asarray([ns_true / 500e-9, zj * model.dz])))
        beads.append(2e4 * np.asarray(h) + 10.0
                     + 1.0 * rng.standard_normal(SHAPE))
    beads = jnp.asarray(np.stack(beads))

    p0 = p_true._replace(depth=jnp.asarray([1.45 / 500e-9, 0.0]))
    fit, zshifts = calibrate_depth(
        model, beads, ladder_z, families=(DEPTH,), params0=p0,
        config=PsfFitConfig(max_iter=50, grtol=0.0),
    )
    ns_fit = float(fit.params.depth[0]) * 500e-9
    assert abs(ns_fit - ns_true) < 5e-3
    assert zshifts.shape == (3,)
    assert np.all(np.isfinite(np.asarray(zshifts)))


def test_rl_depthvar_constant_stack_matches_plain_rl():
    """Partition of unity: identical anchors reduce depth-varying RL to the
    plain (shift-invariant) RL update exactly — incl. TV and acceleration."""
    from microtipi_tpu.jobs.depthvar import richardson_lucy_depthvar
    from microtipi_tpu.jobs.richardson_lucy import richardson_lucy

    rng = np.random.default_rng(17)
    h = jnp.asarray(rng.random(SHAPE))
    h = h / jnp.sum(h)
    data = jnp.asarray(rng.random(SHAPE) * 50)
    for kw in (dict(iterations=8), dict(iterations=8, mu=1e-3),
               dict(iterations=8, accelerate=True)):
        x_si = richardson_lucy(data, h, **kw)
        x_dv = richardson_lucy_depthvar(
            data, jnp.stack([h, h, h]), np.array([0.0, 5.0, 11.0]), **kw)
        np.testing.assert_allclose(np.asarray(x_dv), np.asarray(x_si),
                                   rtol=1e-8, atol=1e-10)


def test_rl_depthvar_beats_mismatched_single_psf():
    """On a depth-variant scene, depth-aware RL recovers better than RL with
    the best shift-invariant compromise (mid-depth) PSF."""
    from microtipi_tpu.jobs.depthvar import richardson_lucy_depthvar
    from microtipi_tpu.jobs.richardson_lucy import richardson_lucy

    model = _gl_model(depth=0.0)
    params = model.init_params()
    anchors = np.array([0.0, 5.5, 11.0])
    stack = depth_anchor_psfs(model, params, anchors, depth0=0.0)

    rng = np.random.default_rng(18)
    obj = np.zeros(SHAPE)
    for _ in range(8):
        z, y, x = rng.integers(1, 11), rng.integers(4, 20), rng.integers(4, 20)
        obj[z, y, x] = rng.uniform(50, 200)
    obj = jnp.asarray(obj)
    zw = jnp.asarray(depth_weights(SHAPE[0], anchors))
    data = depth_varying_convolve(obj, jnp.fft.rfftn(stack, axes=(1, 2, 3)),
                                  zw, SHAPE)
    data = jnp.maximum(data + 1e-3 * float(jnp.max(data)) * _rand(SHAPE, 19), 0.0)

    x_dv, iters = richardson_lucy_depthvar(
        data, stack, anchors, iterations=30, accelerate=True,
        return_iterations=True)
    x_si = richardson_lucy(data, stack[1], iterations=30, accelerate=True)
    err_dv = float(jnp.linalg.norm(x_dv - obj) / jnp.linalg.norm(obj))
    err_si = float(jnp.linalg.norm(x_si - obj) / jnp.linalg.norm(obj))
    assert int(iters) == 30
    assert err_dv < err_si, (err_dv, err_si)


def test_ladder_fit_uncertainty_monte_carlo():
    """The GN/Laplace ns error bar from ladder_fit_uncertainty matches the
    Monte-Carlo scatter of calibrate_depth over noise draws (within the
    usual 2.5x/0.4x band), with the per-rung axial-origin and amp/background
    nuisances marginalized."""
    from microtipi_tpu.jobs.depthvar import calibrate_depth, ladder_fit_uncertainty
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig
    from microtipi_tpu.models.microscope import DEPTH

    model = _gl_model()
    ns_true = 1.36
    p_true = model.init_params()._replace(
        depth=jnp.asarray([ns_true / 500e-9, 0.0]))
    ladder_z = np.array([0.0, 5.5, 11.0])
    clean = []
    for zj in ladder_z:
        h = model.compute_psf(p_true._replace(
            depth=jnp.asarray([ns_true / 500e-9, zj * model.dz])))
        clean.append(2e3 * np.asarray(h) + 10.0)
    clean = np.stack(clean)
    noise_sd = 1.0
    rng = np.random.default_rng(21)
    p0 = p_true._replace(depth=jnp.asarray([1.40 / 500e-9, 0.0]))
    cal = jax.jit(lambda b: calibrate_depth(
        model, b, ladder_z, families=(DEPTH,), params0=p0,
        config=PsfFitConfig(max_iter=40, grtol=0.0)))

    fits, zss, beads0 = [], None, None
    for i in range(8):
        b = jnp.asarray(clean + noise_sd * rng.standard_normal(clean.shape))
        fit, zs = cal(b)
        fits.append(float(fit.params.depth[0]))
        if i == 0:
            zss, beads0, params0_fit = zs, b, fit.params
    empirical = np.std(fits, ddof=1)

    unc = jax.jit(lambda b, p, z: ladder_fit_uncertainty(
        model, p, (DEPTH,), b, ladder_z, z))(beads0, params0_fit, zss)
    predicted = float(np.asarray(unc.std["depth"])[0])
    assert predicted < 2.5 * empirical, (predicted, empirical)
    assert predicted > 0.4 * empirical, (predicted, empirical)
    for key in ("zshift", "amp", "background"):
        v = np.asarray(unc.std[key])
        assert v.shape == (3,) and np.isfinite(v).all() and (v > 0).all()


def _dv_mesh_scene(shape=(16, 24, 24)):
    """GL depth-varying scene on a mesh-divisible grid, with true phase."""
    model = GibsonLanniConfig(
        shape=shape, na=1.3, wavelength=500e-9, ni=1.518, dxy=100e-9,
        dz=250e-9, n_phase=3, ns=1.36, depth=0.0, dtype=jnp.float64,
    )
    p_true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.15, 0.1]))
    anchors = np.array([0.0, (shape[0] - 1) / 2.0, shape[0] - 1.0])
    stack = depth_anchor_psfs(model, p_true, anchors, depth0=0.0)
    rng = np.random.default_rng(30)
    obj = np.zeros(shape)
    obj[2:8, 6:18, 6:18] = 60.0
    obj[9:13, 4:12, 12:20] = 90.0
    obj = jnp.asarray(obj)
    zw = jnp.asarray(depth_weights(shape[0], anchors))
    data = depth_varying_convolve(obj, jnp.fft.rfftn(stack, axes=(1, 2, 3)),
                                  zw, shape)
    data = data + 0.01 * jnp.asarray(rng.standard_normal(shape))
    return model, p_true, anchors, obj, data


def test_sharded_fit_psf_depthvar_matches_dense():
    """Mesh depth-varying PSF fit (single family + joint) == dense fit."""
    from microtipi_tpu.jobs.depthvar import fit_psf_depthvar
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig
    from microtipi_tpu.models.microscope import DEFOCUS, PHASE
    from microtipi_tpu.parallel.depthvar import sharded_fit_psf_depthvar
    from microtipi_tpu.parallel.mesh import make_mesh, volume_sharding

    mesh = make_mesh(batch=1, z=8)
    model, p_true, anchors, obj, data = _dv_mesh_scene()
    cfg = PsfFitConfig(max_iter=8, grtol=0.0)
    ones = jnp.ones_like(data)

    dense = fit_psf_depthvar(model, model.init_params(), (PHASE,), data, obj,
                             anchors, weights=ones, config=cfg)
    data_sh = jax.device_put(data, volume_sharding(mesh, batched=False))
    shard = jax.jit(lambda d, o, w: sharded_fit_psf_depthvar(
        model, model.init_params(), (PHASE,), d, o, mesh, anchors,
        weights=w, config=cfg))(data_sh, obj, ones)
    np.testing.assert_allclose(np.asarray(shard.params.phase),
                               np.asarray(dense.params.phase), atol=1e-7)
    np.testing.assert_allclose(float(shard.f), float(dense.f), rtol=1e-8)

    dense_j = fit_psf_depthvar(model, model.init_params(), (DEFOCUS, PHASE),
                               data, obj, anchors, weights=ones, config=cfg,
                               phase_freeze_head=1)
    shard_j = jax.jit(lambda d, o, w: sharded_fit_psf_depthvar(
        model, model.init_params(), (DEFOCUS, PHASE), d, o, mesh, anchors,
        weights=w, config=cfg, phase_freeze_head=1))(data_sh, obj, ones)
    np.testing.assert_allclose(np.asarray(shard_j.params.phase),
                               np.asarray(dense_j.params.phase), atol=1e-6)
    np.testing.assert_allclose(np.asarray(shard_j.params.defocus),
                               np.asarray(dense_j.params.defocus), rtol=1e-6)


def test_sharded_blind_depthvar_matches_dense():
    """Full sharded depth-varying blind loop == dense loop (same math,
    modulo cross-device reduction order)."""
    from microtipi_tpu.jobs.blind import BlindDeconvConfig
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig as DCfg
    from microtipi_tpu.jobs.depthvar import blind_deconvolve_depthvar
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig
    from microtipi_tpu.models.microscope import PHASE
    from microtipi_tpu.parallel.depthvar import sharded_blind_deconvolve_depthvar
    from microtipi_tpu.parallel.mesh import make_mesh, volume_sharding

    mesh = make_mesh(batch=1, z=8)
    model, p_true, anchors, obj, data = _dv_mesh_scene()
    cfg = BlindDeconvConfig(
        loops=2, families=(PHASE,), psf_max_iter=(4,),
        deconv=DCfg(mu=0.002, epsilon=1.0, max_iter=5),
        fit=PsfFitConfig(max_iter=4),
    )
    ones = jnp.ones_like(data)
    dense = blind_deconvolve_depthvar(data, model, anchors, weights=ones,
                                      config=cfg)
    data_sh = jax.device_put(data, volume_sharding(mesh, batched=False))
    shard = jax.jit(lambda d, w: sharded_blind_deconvolve_depthvar(
        d, model, mesh, anchors, weights=w, config=cfg))(data_sh, ones)
    np.testing.assert_allclose(np.asarray(shard.deconv_f),
                               np.asarray(dense.deconv_f), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(shard.params.phase),
                               np.asarray(dense.params.phase), atol=1e-7)
    np.testing.assert_allclose(np.asarray(shard.obj), np.asarray(dense.obj),
                               atol=1e-6)
    assert shard.psf.shape == (3,) + data.shape


def test_sharded_blind_depthvar_odd_shape_autopads():
    """Nz not divisible by the mesh z-axis: the sharded depth-varying blind
    auto-pads (zero-weight padding) and returns finite results."""
    from microtipi_tpu.jobs.blind import BlindDeconvConfig
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig as DCfg
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig
    from microtipi_tpu.models.microscope import PHASE
    from microtipi_tpu.parallel.deconv import crop_trailing
    from microtipi_tpu.parallel.depthvar import sharded_blind_deconvolve_depthvar
    from microtipi_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(batch=1, z=8)
    model, p_true, anchors, obj, data = _dv_mesh_scene(shape=(12, 24, 24))
    cfg = BlindDeconvConfig(
        loops=2, families=(PHASE,), psf_max_iter=(3,),
        deconv=DCfg(mu=0.002, epsilon=1.0, max_iter=3),
        fit=PsfFitConfig(max_iter=3),
    )
    res = jax.jit(lambda d: sharded_blind_deconvolve_depthvar(
        d, model, mesh, anchors, config=cfg))(data)
    assert res.obj.shape == (16, 24, 24)  # padded up to the mesh multiple
    win = crop_trailing(res.obj, data.shape)
    assert np.isfinite(np.asarray(win)).all()
    assert np.isfinite(np.asarray(res.deconv_f)).all()
    assert np.isfinite(np.asarray(res.params.phase)).all()


def test_depth_anchor_psfs_from_maps_matches_single():
    """Each anchor slice == compute_psf_from_pupil at that map/defocus;
    flat maps at the nominal defocus reproduce the parametric init PSF."""
    import pytest
    from microtipi_tpu.jobs.depthvar import depth_anchor_psfs_from_maps
    from microtipi_tpu.models.widefield import WideFieldConfig

    model = WideFieldConfig(shape=SHAPE, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=3, radial=True,
                            dtype=jnp.float64)
    p0 = model.init_params()
    _, phi1, _, mask = model.compute_pupil(
        p0._replace(phase=jnp.asarray([0.4, -0.2, 0.1])))
    phis = jnp.stack([jnp.zeros_like(phi1), phi1])
    defoc = jnp.stack([p0.defocus, p0.defocus.at[1].set(1e5)])

    stack = depth_anchor_psfs_from_maps(model, phis, defocus=defoc)
    assert stack.shape == (2,) + SHAPE
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(stack[i]),
            np.asarray(model.compute_psf_from_pupil(phis[i], defocus=defoc[i])),
            rtol=1e-12)
    # the flat map at the nominal defocus IS the parametric init PSF
    np.testing.assert_allclose(np.asarray(stack[0]),
                               np.asarray(model.compute_psf(p0)), rtol=1e-10)

    # one (3,) defocus broadcasts over K; modulus maps ride along
    rhos = jnp.stack([mask, 0.5 * mask])
    stack_r = depth_anchor_psfs_from_maps(model, phis, rhos=rhos,
                                          defocus=p0.defocus)
    np.testing.assert_allclose(
        np.asarray(stack_r[1]),
        np.asarray(model.compute_psf_from_pupil(phis[1], rho=rhos[1],
                                                defocus=p0.defocus)),
        rtol=1e-12)
    with pytest.raises(ValueError, match="K, Ny, Nx"):
        depth_anchor_psfs_from_maps(model, phi1)
