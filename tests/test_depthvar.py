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
