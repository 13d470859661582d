"""Single-chip batched (vmapped) solves."""

import jax
import jax.numpy as jnp
import numpy as np

from microtipi_tpu.jobs.batch import batched_blind_deconvolve, batched_deconvolve
from microtipi_tpu.jobs.blind import BlindDeconvConfig
from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
from microtipi_tpu.models.microscope import PHASE
from microtipi_tpu.models.widefield import WideFieldConfig
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

SHAPE = (8, 32, 32)
KW = dict(na=1.2, wavelength=500e-9, ni=1.33, dxy=100e-9, dz=250e-9)


def _scene(b=3):
    model = WideFieldConfig(shape=SHAPE, n_phase=3, radial=True, dtype=jnp.float64, **KW)
    psf = model.compute_psf(model.init_params())
    rng = np.random.default_rng(0)
    objs, datas = [], []
    for i in range(b):
        o = np.zeros(SHAPE)
        o[2 + i : 6 + i, 8:24, 8:24] = 50.0 + 10 * i
        o = jnp.asarray(o)
        d = convolve(o, convolve_spectrum(psf), SHAPE)
        d = d + 0.01 * jnp.asarray(rng.standard_normal(SHAPE))
        objs.append(o)
        datas.append(d)
    return model, psf, jnp.stack(objs), jnp.stack(datas)


def test_batched_deconvolve_matches_per_lane():
    model, psf, objs, datas = _scene()
    cfg = DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=10, grtol=0.0)
    batched = batched_deconvolve(datas, psf, config=cfg)
    assert batched.x.shape == datas.shape
    for b in range(3):
        ref = deconvolve(datas[b], psf, config=cfg)
        # vmapped while_loop runs the max lane count of iterations, but with
        # grtol=0 every lane runs exactly max_iter -> identical trajectories.
        np.testing.assert_allclose(np.asarray(batched.x[b]), np.asarray(ref.x), atol=1e-8)


def test_batched_blind_shapes_and_progress():
    model, psf, objs, datas = _scene()
    cfg = BlindDeconvConfig(
        loops=2, families=(PHASE,), psf_max_iter=(4,),
        deconv=DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=5),
    )
    res = batched_blind_deconvolve(datas, model, config=cfg)
    assert res.obj.shape == datas.shape
    assert res.params.phase.shape == (3, 3)  # independent per-frame estimates
    df = np.asarray(res.deconv_f)
    assert df.shape == (3, 2) and np.isfinite(df).all()
    assert (df[:, 1] <= df[:, 0] + 1e-9).all()


def test_batched_blind_joint_psf_single_chip():
    """joint_psf=True: one parameter vector fitted against all frames, on a
    trivial single-device mesh — and it matches the 8-device mesh result."""
    import jax

    from microtipi_tpu.parallel.blind import sharded_blind_deconvolve
    from microtipi_tpu.parallel.mesh import make_mesh, volume_sharding

    shape = (8, 16, 16)
    model = WideFieldConfig(shape=shape, n_phase=3, radial=True,
                            dtype=jnp.float64, **KW)
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.15, 0.1]))
    psf = model.compute_psf(true)
    rng = np.random.default_rng(0)
    objs = jnp.asarray(np.abs(rng.standard_normal((2,) + shape)) * 30)
    frames = jax.vmap(lambda o: convolve(o, convolve_spectrum(psf), shape))(objs)

    cfg = BlindDeconvConfig(
        loops=2, families=(PHASE,), psf_max_iter=(4,),
        deconv=DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=4),
        joint_fit=True,
    )
    res = batched_blind_deconvolve(frames, model, config=cfg, joint_psf=True)
    assert res.params.phase.shape == (3,)  # ONE parameter vector
    assert res.obj.shape == (2,) + shape

    mesh = make_mesh(batch=2, z=4)
    frames_sh = jax.device_put(frames, volume_sharding(mesh, batched=True))
    ref = sharded_blind_deconvolve(frames_sh, model, mesh, config=cfg)
    np.testing.assert_allclose(
        np.asarray(res.params.phase), np.asarray(ref.params.phase), atol=1e-7
    )


def test_batched_depthvar_matches_per_frame():
    from microtipi_tpu.jobs.batch import batched_deconvolve_depthvar
    from microtipi_tpu.jobs.depthvar import deconvolve_depthvar

    import numpy as np
    import jax.numpy as jnp

    shape = (6, 16, 16)
    rng = np.random.default_rng(0)
    psfs = jnp.asarray(rng.random((2,) + shape))
    anchors = np.array([0.0, 5.0])
    data = jnp.asarray(rng.random((3,) + shape))
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig

    cfg = DeconvolutionConfig(mu=1e-3, epsilon=1.0, max_iter=4, grtol=0.0)
    res = batched_deconvolve_depthvar(data, psfs, anchors, config=cfg)
    assert res.x.shape == data.shape
    for b in range(3):
        ref = deconvolve_depthvar(data[b], psfs, anchors, config=cfg)
        # atol: batched vs single FFT kernels differ at the 1e-16 roundoff
        # level, visible relatively only on bound-projected ~0 voxels.
        np.testing.assert_allclose(np.asarray(res.x[b]), np.asarray(ref.x),
                                   rtol=1e-8, atol=1e-12)


def test_batched_blind_bead_anchor():
    """One unbatched bead stack anchors every frame's fit (vmapped path):
    with the anchor dominant, every per-frame phase lands at the truth."""
    from microtipi_tpu.utils.arrays import roll

    model = WideFieldConfig(shape=SHAPE, n_phase=3, radial=True,
                            dtype=jnp.float64, **KW)
    true = model.init_params()._replace(phase=jnp.asarray([0.25, -0.12, 0.08]))
    psf = model.compute_psf(true)
    rng = np.random.default_rng(1)
    objs = jnp.asarray(np.abs(rng.standard_normal((2,) + SHAPE)) * 20)
    frames = jax.vmap(lambda o: convolve(o, convolve_spectrum(psf), SHAPE))(objs)
    bead = 400.0 * roll(psf)  # noiseless, same optics, unbatched

    cfg = BlindDeconvConfig(
        loops=2, families=(PHASE,), psf_max_iter=(6,),
        deconv=DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=4),
        joint_fit=True, bead_weight=1e4,
    )
    res = jax.jit(lambda d, b: batched_blind_deconvolve(
        d, model, config=cfg, bead_data=b))(frames, bead)
    assert res.params.phase.shape == (2, 3)
    for k in range(2):
        np.testing.assert_allclose(np.asarray(res.params.phase[k]),
                                   np.asarray(true.phase), atol=3e-2)


def test_batched_auto_mu_tracks_per_frame_noise():
    """Per-frame discrepancy mu: frames with more noise get more
    regularization, each lane's blind sigma estimate tracks its own noise
    (the bleaching time-lapse scenario)."""
    from microtipi_tpu.jobs.batch import batched_deconvolve_auto_mu

    model = WideFieldConfig(shape=SHAPE, dtype=jnp.float64, **KW)
    psf = model.compute_psf(model.init_params())
    rng = np.random.default_rng(1)
    obj = np.zeros(SHAPE)
    obj[2:6, 8:24, 8:24] = 60.0
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in SHAPE], indexing="ij")
    obj += 25 * np.exp(-(((zz - 4) / 2) ** 2 + ((yy - 16) / 5) ** 2
                         + ((xx - 16) / 5) ** 2))
    clean = np.asarray(convolve(jnp.asarray(obj), convolve_spectrum(psf), SHAPE))
    sigmas = [0.01, 0.04, 0.12]
    data = jnp.stack([
        jnp.asarray(clean + s * clean.max() * rng.standard_normal(SHAPE))
        for s in sigmas
    ])
    cfg = DeconvolutionConfig(epsilon=2.0, max_iter=25, grtol=1e-9)
    res = jax.jit(lambda d: batched_deconvolve_auto_mu(
        d, psf, config=cfg, steps=10))(data)
    assert res.mu.shape == (3,)
    mus = np.asarray(res.mu)
    sig_est = np.asarray(res.sigma)
    # per-lane sigma estimates track the injected noise ordering
    assert sig_est[0] < sig_est[1] < sig_est[2]
    # noisier frames draw more regularization
    assert mus[0] < mus[1] < mus[2]
    # every lane's solution improves on its data
    for i in range(3):
        assert float(jnp.linalg.norm(res.result.x[i] - jnp.asarray(obj))) < \
            float(jnp.linalg.norm(data[i] - jnp.asarray(obj)))


def test_batched_deconvolve_admm_engine():
    """engine='admm' vmaps the round-4 engine: per-lane results equal the
    unbatched admm solves exactly (pure-jnp engine under vmap)."""
    import numpy as np
    import pytest
    from microtipi_tpu.jobs.admm import admm_deconvolve
    from microtipi_tpu.jobs.batch import batched_deconvolve
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig

    rng = np.random.default_rng(4)
    shape = (4, 12, 12)
    psf = jnp.zeros(shape).at[0, 0, 0].set(0.7)
    psf = psf.at[0, 0, 1].set(0.1).at[0, 1, 0].set(0.1).at[1, 0, 0].set(0.1)
    data = jnp.asarray(np.abs(rng.standard_normal((3,) + shape)) + 0.1)
    cfg = DeconvolutionConfig(mu=0.01, epsilon=0.5, max_iter=20, grtol=0.0)
    got = batched_deconvolve(data, psf, config=cfg, engine="admm")
    assert got.x.shape == data.shape
    for i in range(3):
        ref = admm_deconvolve(data[i], psf, config=cfg, track_objective=False)
        np.testing.assert_allclose(np.asarray(got.x[i]), np.asarray(ref.x),
                                   atol=1e-10)
        assert float(got.f[i]) == pytest.approx(float(ref.f), rel=1e-10)
    with pytest.raises(ValueError, match="unknown engine"):
        batched_deconvolve(data, psf, config=cfg, engine="sgd")
