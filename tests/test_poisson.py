"""Poisson (generalized-KL deviance) data term invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
from microtipi_tpu.jobs.richardson_lucy import richardson_lucy
from microtipi_tpu.ops.convolution import PoissonConvCost, convolve, convolve_spectrum

SHAPE = (6, 20, 20)


def _kernel(seed=0):
    rng = np.random.default_rng(seed)
    k = np.zeros(SHAPE)
    k[:2, :3, :3] = rng.random((2, 3, 3))
    return jnp.asarray(k / k.sum())


def test_deviance_zero_at_exact_fit_positive_elsewhere():
    k = _kernel()
    x = jnp.asarray(np.random.default_rng(1).random(SHAPE) * 10)
    d = convolve(x, convolve_spectrum(k), SHAPE)
    cost = PoissonConvCost.build(k, d)
    np.testing.assert_allclose(float(cost.cost(x)), 0.0, atol=1e-8)
    assert float(cost.cost(x * 1.3)) > 0.0
    assert float(cost.cost(x * 0.7)) > 0.0


def test_gradient_matches_finite_differences():
    k = _kernel(2)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random(SHAPE) * 5 + 0.5)
    d = jnp.asarray(rng.poisson(np.asarray(convolve(x, convolve_spectrum(k), SHAPE)) + 2.0).astype(np.float64))
    cost = PoissonConvCost.build(k, d, background=2.0)
    g = jax.grad(cost.cost)(x)
    v = jnp.asarray(rng.standard_normal(SHAPE))
    eps = 1e-6
    fd = (float(cost.cost(x + eps * v)) - float(cost.cost(x - eps * v))) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, v)), fd, rtol=1e-6)


def test_zero_count_voxels_contribute_linearly():
    """d = 0 voxels must add exactly m (no NaN from 0*log0)."""
    k = _kernel(4)
    x = jnp.asarray(np.random.default_rng(5).random(SHAPE))
    d = jnp.zeros(SHAPE)
    cost = PoissonConvCost.build(k, d, background=0.5)
    m = cost.model(x) + 0.5
    np.testing.assert_allclose(float(cost.cost(x)), float(jnp.sum(m)), rtol=1e-12)
    assert np.isfinite(np.asarray(jax.grad(cost.cost)(x))).all()


def test_vmlmb_poisson_descends_the_rl_objective():
    """VMLMB on the deviance reaches at least RL's cost at equal iteration
    budget (both descend the same objective; VMLMB is superlinear)."""
    k = _kernel(6)
    rng = np.random.default_rng(7)
    obj = np.zeros(SHAPE)
    obj[2:4, 6:14, 6:14] = 40.0
    obj[1, 15:18, 4:8] = 80.0
    lam = np.asarray(convolve(jnp.asarray(obj), convolve_spectrum(k), SHAPE)) + 1.0
    d = jnp.asarray(rng.poisson(lam).astype(np.float64))

    cfg = DeconvolutionConfig(mu=0.0, positivity=True, max_iter=30, grtol=0.0,
                              data_term="poisson", background=1.0)
    res = deconvolve(d, k, config=cfg)
    x_rl = richardson_lucy(jnp.maximum(d - 1.0, 0.0), k, iterations=30)
    cost = PoissonConvCost.build(k, d, background=1.0)
    assert float(res.f) <= float(cost.cost(x_rl)) * 1.001
    assert np.isfinite(np.asarray(res.x)).all() and float(jnp.min(res.x)) >= 0.0


def test_poisson_beats_gaussian_on_low_count_data():
    """On strongly Poisson data (counts of a few), the matched likelihood
    recovers the object better than least squares at equal budget."""
    k = _kernel(8)
    rng = np.random.default_rng(9)
    obj = np.zeros(SHAPE)
    for _ in range(10):
        z, y, x = rng.integers(0, 5), rng.integers(2, 17), rng.integers(2, 17)
        obj[z, y, x] = rng.uniform(2, 8)  # a few photons per source
    lam = np.asarray(convolve(jnp.asarray(obj), convolve_spectrum(k), SHAPE)) + 0.2
    d = jnp.asarray(rng.poisson(lam).astype(np.float64))

    common = dict(mu=1e-3, epsilon=0.1, positivity=True, max_iter=40, grtol=0.0)
    res_p = deconvolve(d, k, config=DeconvolutionConfig(
        data_term="poisson", background=0.2, **common))
    res_g = deconvolve(jnp.maximum(d - 0.2, 0.0), k,
                       config=DeconvolutionConfig(**common))
    err_p = float(jnp.linalg.norm(res_p.x - obj) / np.linalg.norm(obj))
    err_g = float(jnp.linalg.norm(res_g.x - obj) / np.linalg.norm(obj))
    assert err_p < err_g


def test_poisson_rejects_weights():
    k = _kernel()
    d = jnp.ones(SHAPE)
    cfg = DeconvolutionConfig(data_term="poisson", max_iter=2)
    with pytest.raises(ValueError, match="weights"):
        deconvolve(d, k, weights=jnp.ones(SHAPE), config=cfg)


def test_unknown_data_term_rejected():
    k = _kernel()
    d = jnp.ones(SHAPE)
    with pytest.raises(ValueError, match="unknown data_term"):
        deconvolve(d, k, config=DeconvolutionConfig(data_term="huber", max_iter=2))


def test_blind_loop_with_poisson_object_step():
    """data_term flows through the blind loop's object step unchanged."""
    from microtipi_tpu.jobs.blind import BlindDeconvConfig, blind_deconvolve
    from microtipi_tpu.models.widefield import WideFieldConfig

    shape = (8, 16, 16)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=2, radial=True,
                            dtype=jnp.float64)
    psf = model.compute_psf(model.init_params()._replace(phase=jnp.asarray([0.2, -0.1])))
    rng = np.random.default_rng(0)
    obj = np.abs(rng.standard_normal(shape)) * 5
    lam = np.asarray(convolve(jnp.asarray(obj), convolve_spectrum(psf), shape)) + 0.5
    d = jnp.asarray(rng.poisson(lam).astype(np.float64))
    cfg = BlindDeconvConfig(
        loops=2, families=(0, 1), psf_max_iter=(2, 2),
        deconv=DeconvolutionConfig(mu=1e-3, epsilon=0.5, max_iter=4, grtol=0.0,
                                   data_term="poisson", background=0.5),
    )
    res = jax.jit(lambda d: blind_deconvolve(d, model, config=cfg))(d)
    f = np.asarray(res.deconv_f)
    assert np.isfinite(f).all() and f[1] <= f[0]


def test_sharded_poisson_matches_dense():
    from microtipi_tpu.parallel.deconv import sharded_deconvolve
    from microtipi_tpu.parallel.mesh import make_mesh, volume_sharding

    mesh = make_mesh(batch=1, z=8)
    shape = (16, 24, 24)
    rng = np.random.default_rng(1)
    k = np.zeros(shape)
    k[:2, :3, :3] = rng.random((2, 3, 3))
    k = jnp.asarray(k / k.sum())
    obj = jnp.asarray(rng.random(shape) * 5)
    lam = np.asarray(convolve(obj, convolve_spectrum(k), shape)) + 1.0
    d = jnp.asarray(rng.poisson(lam).astype(np.float64))
    cfg = DeconvolutionConfig(mu=1e-3, epsilon=0.5, max_iter=6, grtol=0.0,
                              data_term="poisson", background=1.0)
    dense = deconvolve(d, k, config=cfg)
    d_sh = jax.device_put(d, volume_sharding(mesh, batched=False))
    sh = jax.jit(lambda v: sharded_deconvolve(v, k, mesh, config=cfg))(d_sh)
    np.testing.assert_allclose(float(sh.f), float(dense.f), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(sh.x), np.asarray(dense.x), rtol=1e-8, atol=1e-12)


def test_sharded_poisson_padded_odd_nz():
    from microtipi_tpu.parallel.deconv import sharded_deconvolve
    from microtipi_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(batch=1, z=8)
    shape = (12, 16, 16)
    rng = np.random.default_rng(2)
    k = np.zeros(shape)
    k[:2, :2, :2] = rng.random((2, 2, 2))
    k = jnp.asarray(k / k.sum())
    d = jnp.asarray(rng.poisson(np.full(shape, 3.0)).astype(np.float64))
    cfg = DeconvolutionConfig(mu=1e-3, epsilon=0.5, max_iter=3, grtol=0.0,
                              data_term="poisson", background=0.5,
                              var_shape=(16, 16, 16))
    res = jax.jit(lambda v: sharded_deconvolve(v, k, mesh, config=cfg))(d)
    assert res.x.shape == (16, 16, 16)
    assert np.isfinite(float(res.f))


def test_depthvar_poisson_runs_and_descends():
    from microtipi_tpu.jobs.depthvar import deconvolve_depthvar
    from microtipi_tpu.ops.depthconv import depth_varying_convolve, depth_weights

    shape = (8, 16, 16)
    rng = np.random.default_rng(3)
    psfs = jnp.asarray(rng.random((2,) + shape))
    psfs = psfs / psfs.sum(axis=(1, 2, 3), keepdims=True)
    anchors = np.array([0.0, 7.0])
    zw = jnp.asarray(depth_weights(shape[0], anchors))
    obj = jnp.asarray(rng.random(shape) * 5)
    lam = np.asarray(depth_varying_convolve(
        obj, jnp.fft.rfftn(psfs, axes=(1, 2, 3)), zw, shape)) + 0.5
    d = jnp.asarray(rng.poisson(np.maximum(lam, 0)).astype(np.float64))
    cfg = DeconvolutionConfig(mu=1e-3, epsilon=0.5, max_iter=8, grtol=0.0,
                              data_term="poisson", background=0.5)
    res = deconvolve_depthvar(d, psfs, anchors, config=cfg)
    assert np.isfinite(float(res.f)) and float(res.f) >= 0.0
    hist = np.asarray(res.f_history)
    it = int(res.iterations)
    assert hist[it] < hist[0]
