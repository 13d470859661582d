"""Joint 4D time-series deconvolution with temporal TV (jobs/timeseries.py).

Beyond parity — the reference solves one volume at a time
(BlindDeconvJob.java:97-138). Anchors: the temporal prior's measured ~11%
recovery improvement over per-frame solves at 20% noise, preservation of
step events (piecewise-constant-in-time preference), and decoupled
equivalence at mu_t=0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.jobs.batch import batched_deconvolve
from microtipi_tpu.jobs.deconv import DeconvolutionConfig
from microtipi_tpu.jobs.timeseries import deconvolve_timeseries
from microtipi_tpu.models.widefield import WideFieldConfig
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

VOL = (8, 48, 48)
T = 8


def _timelapse(noise=0.2, seed=0):
    """Slow drifting blob + static bead + a bead that APPEARS at t=4."""
    model = WideFieldConfig(shape=VOL, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, dtype=jnp.float64)
    psf = model.compute_psf(model.init_params())
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in VOL], indexing="ij")
    objs = []
    for t in range(T):
        o = np.zeros(VOL)
        o += 60 * np.exp(-(((zz - 4) / 2) ** 2 + ((yy - 20 - 0.7 * t) / 4) ** 2
                           + ((xx - 16 - 1.0 * t) / 4) ** 2))
        o[2, 10, 36] = 120.0
        if t >= 4:
            o[5, 34, 12] = 150.0
        objs.append(o)
    objs = np.stack(objs)
    ks = convolve_spectrum(psf)
    clean = np.stack([np.asarray(convolve(jnp.asarray(o), ks, VOL)) for o in objs])
    sigma = noise * clean.max()
    data = jnp.asarray(clean + sigma * rng.standard_normal(clean.shape))
    return jnp.asarray(objs), psf, data


def test_temporal_prior_beats_per_frame_and_keeps_events():
    objs, psf, data = _timelapse(noise=0.2)
    cfg = DeconvolutionConfig(mu=0.12, epsilon=1.0, max_iter=40, grtol=1e-9)
    per = batched_deconvolve(data, psf, config=cfg)
    err_per = float(jnp.linalg.norm(per.x - objs))
    res = jax.jit(lambda d, p: deconvolve_timeseries(
        d, p, config=cfg, mu_t=0.4))(data, psf)
    err_joint = float(jnp.linalg.norm(res.x - objs))
    # measured 11% at this noise; pin a conservative 6%
    assert err_joint < 0.94 * err_per
    assert float(res.x.min()) >= 0.0
    # the appearing bead stays OFF before t=4 (no temporal smearing of the
    # step) and ON after — 3x3x3 neighborhood sums (the point spreads a
    # little under TV); measured pre ~1.5-3.6 vs post ~19-22
    nb = lambda t: float(jnp.sum(res.x[t, 4:7, 33:36, 11:14]))
    assert nb(2) < 6.0 and nb(3) < 6.0
    assert min(nb(4), nb(5)) > 2.5 * max(nb(2), nb(3))


def test_timeseries_mu_t_zero_matches_batched():
    """Decoupled frames: the joint solve at mu_t=0 and the vmapped
    per-frame solve minimize the same separable objective — costs agree
    (iteration structure differs: one 4D VMLMB vs T lockstep solves)."""
    objs, psf, data = _timelapse(noise=0.05)
    cfg = DeconvolutionConfig(mu=0.05, epsilon=1.0, max_iter=60, grtol=1e-10)
    per = batched_deconvolve(data, psf, config=cfg)
    joint = deconvolve_timeseries(data, psf, config=cfg, mu_t=0.0)
    f_per = float(jnp.sum(per.f))
    f_joint = float(joint.f)
    assert abs(f_joint - f_per) / f_per < 5e-3


def test_timeseries_weights_poisson_and_validation():
    objs, psf, data = _timelapse(noise=0.1)
    cfg = DeconvolutionConfig(mu=0.05, epsilon=1.0, max_iter=15)
    # per-volume weights broadcast over t
    w = jnp.ones(VOL)
    r = deconvolve_timeseries(data, psf, weights=w, config=cfg, mu_t=0.1)
    assert r.x.shape == data.shape and np.isfinite(np.asarray(r.x)).all()
    # poisson data term composes with the temporal prior
    rng = np.random.default_rng(3)
    counts = jnp.asarray(rng.poisson(np.maximum(np.asarray(data), 0.0)) + 0.0)
    cfgp = DeconvolutionConfig(mu=0.05, epsilon=1.0, max_iter=15,
                               data_term="poisson", background=0.1)
    rp = deconvolve_timeseries(counts, psf, config=cfgp, mu_t=0.1)
    assert np.isfinite(np.asarray(rp.x)).all()

    with pytest.raises(ValueError, match="T, Nz"):
        deconvolve_timeseries(data[0], psf, config=cfg)
    with pytest.raises(ValueError, match="var_shape"):
        deconvolve_timeseries(
            data, psf, config=DeconvolutionConfig(var_shape=(10, 50, 50)))
    with pytest.raises(ValueError, match="poisson"):
        deconvolve_timeseries(data, psf, weights=w, config=cfgp)


def _bleached(decay=0.18, noise=0.05, bg=2.0, seed=1):
    """Frame 0 of the _timelapse scene, STATIC, under exponential
    photobleaching + a constant background pedestal:
    ``d_t = g_t * (H x_0) + bg + noise``, ``g_t = exp(-decay*t)``.
    Static by design: estimate_bleach assumes registered frames (its
    docstring measures the unregistered-drift bias); the drift composition
    is --register-t's job and is covered by test_register.py."""
    objs, psf, data_clean = _timelapse(noise=0.0, seed=seed)
    base = np.asarray(data_clean[0])
    objs = jnp.broadcast_to(objs[0], (T,) + VOL)
    gains = np.exp(-decay * np.arange(T))
    rng = np.random.default_rng(seed)
    clean = gains[:, None, None, None] * base[None]
    sigma = noise * clean.max()
    series = jnp.asarray(clean + bg + sigma * rng.standard_normal(clean.shape))
    return objs, psf, series, jnp.asarray(gains)


def test_estimate_bleach_recovers_exponential_fade():
    from microtipi_tpu.ops.preprocess import estimate_bleach

    objs, psf, series, gains = _bleached(noise=0.05, bg=2.0)
    g = jax.jit(estimate_bleach)(series)
    assert float(g[0]) == 1.0
    # union-support flux ratio over the median background; measured max rel
    # err 6.3% at 5% noise over the pedestal — pin 10%
    np.testing.assert_allclose(np.asarray(g), np.asarray(gains), rtol=0.10)

    with pytest.raises(ValueError, match="T>=2"):
        estimate_bleach(series[:1])


def test_timeseries_bleach_correction_beats_uncorrected():
    """Model-side gains under the temporal prior: fading is explained by
    g_t instead of being smeared as 'change' by the temporal TV."""
    from microtipi_tpu.ops.preprocess import estimate_bleach

    objs, psf, series, gains = _bleached(decay=0.18, noise=0.05, bg=0.0)
    cfg = DeconvolutionConfig(mu=0.05, epsilon=1.0, max_iter=30, grtol=1e-9)
    g = estimate_bleach(series)
    run = jax.jit(lambda d, p, g: deconvolve_timeseries(
        d, p, config=cfg, mu_t=0.4, bleach=g))
    corr = run(series, psf, g)
    uncorr = deconvolve_timeseries(series, psf, config=cfg, mu_t=0.4)
    err_c = float(jnp.linalg.norm(corr.x - objs))
    err_u = float(jnp.linalg.norm(uncorr.x - objs))
    # measured 472 vs 779 (~39% better); pin a conservative 20%
    assert err_c < 0.80 * err_u

    # unit gains are exactly the uncorrected objective
    ones = deconvolve_timeseries(series, psf, config=cfg, mu_t=0.4,
                                 bleach=jnp.ones(T))
    np.testing.assert_allclose(float(ones.f), float(uncorr.f), rtol=1e-12)


def test_timeseries_bleach_weighted_poisson_and_validation():
    objs, psf, series, gains = _bleached(noise=0.05)
    cfg = DeconvolutionConfig(mu=0.05, epsilon=1.0, max_iter=10)
    w = jnp.ones(series.shape[1:])
    r = deconvolve_timeseries(series, psf, weights=w, config=cfg, mu_t=0.1,
                              bleach=gains)
    assert np.isfinite(np.asarray(r.x)).all()
    rng = np.random.default_rng(5)
    counts = jnp.asarray(rng.poisson(np.maximum(np.asarray(series), 0.0)) + 0.0)
    cfgp = DeconvolutionConfig(mu=0.05, epsilon=1.0, max_iter=10,
                               data_term="poisson", background=0.1)
    rp = deconvolve_timeseries(counts, psf, config=cfgp, mu_t=0.1, bleach=gains)
    assert np.isfinite(np.asarray(rp.x)).all()
    with pytest.raises(ValueError, match="bleach"):
        deconvolve_timeseries(series, psf, config=cfg, bleach=gains[:3])


@pytest.mark.parametrize("bleach", [False, True])
def test_cli_deconv_mu_t_hyperstack(tmp_path, bleach):
    """deconv --mu-t: full-T joint solve of an OME hyperstack, hyperstack
    output with the same T. Parametrized over --bleach-correct so both the
    plain path (bleach=None through the jitted run lambda) and the
    corrected path keep subprocess coverage."""
    import os
    import subprocess
    import sys

    from microtipi_tpu.io.ome import read_ome_hyperstack, write_ome_hyperstack
    from microtipi_tpu.io.tiffstack import write_stack

    vol = (6, 24, 24)
    model = WideFieldConfig(shape=vol, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, dtype=jnp.float32)
    psf = model.compute_psf(model.init_params())
    rng = np.random.default_rng(0)
    ks = convolve_spectrum(psf)
    frames = []
    for t in range(4):
        o = np.zeros(vol, np.float32)
        o[2:4, 6 + t:14 + t, 8:16] = 40.0
        d = np.asarray(convolve(jnp.asarray(o), ks, vol))
        frames.append(d + 1.5 * rng.standard_normal(vol).astype(np.float32))
    arr = np.stack(frames)[:, None]  # (T, 1, Z, Y, X)
    write_ome_hyperstack(tmp_path / "ts.ome.tif", arr, dxy=100e-9, dz=250e-9)
    write_stack(tmp_path / "psf.tif", np.asarray(psf))

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable, "-m", "microtipi_tpu", "deconv",
           str(tmp_path / "ts.ome.tif"), "--psf", str(tmp_path / "psf.tif"),
           "--out", str(tmp_path / "rec.ome.tif"), "--iters", "8",
           "--mu", "0.02", "--mu-t", "0.05"]
    if bleach:
        cmd.append("--bleach-correct")
    r = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=tmp_path, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "deconv[timeseries T=4 vmlmb]" in r.stdout
    assert ("bleach gains (relative to frame 0):" in r.stdout) == bleach
    out, _meta = read_ome_hyperstack(tmp_path / "rec.ome.tif")
    assert out.shape == (4, 1) + vol and np.isfinite(out).all()

    # --method admm runs the same joint objective through the round-4
    # engine (bleach composes via the data-split prox)
    r = subprocess.run(
        cmd + ["--method", "admm", "--out",
               str(tmp_path / "rec_admm.ome.tif")],  # last --out wins
        capture_output=True, text=True, env=env, cwd=tmp_path, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "deconv[timeseries T=4 admm]" in r.stdout
    out_a, _ = read_ome_hyperstack(tmp_path / "rec_admm.ome.tif")
    assert out_a.shape == (4, 1) + vol and np.isfinite(out_a).all()

    if bleach:
        return  # the refusal cases below do not depend on the parameter

    # single-timepoint inputs are refused clearly
    write_ome_hyperstack(tmp_path / "one.ome.tif", arr[:1], dxy=100e-9, dz=250e-9)
    r = subprocess.run(
        [sys.executable, "-m", "microtipi_tpu", "deconv",
         str(tmp_path / "one.ome.tif"), "--psf", str(tmp_path / "psf.tif"),
         "--out", str(tmp_path / "x.ome.tif"), "--mu-t", "0.05"],
        capture_output=True, text=True, env=env, cwd=tmp_path, timeout=600,
    )
    assert r.returncode != 0 and "SizeT=1" in (r.stderr + r.stdout)

    # --bleach-correct without --mu-t is an error, not a silent no-op
    r = subprocess.run(
        [sys.executable, "-m", "microtipi_tpu", "deconv",
         str(tmp_path / "ts.ome.tif"), "--psf", str(tmp_path / "psf.tif"),
         "--out", str(tmp_path / "x.ome.tif"), "--bleach-correct"],
        capture_output=True, text=True, env=env, cwd=tmp_path, timeout=600,
    )
    assert r.returncode != 0 and "--mu-t" in (r.stderr + r.stdout)


def test_sharded_timeseries_matches_dense():
    """Temporal TV across the mesh batch axis: the sharded batched solve
    with mu_t equals the dense joint 4D solve (GSPMD halos across the
    frame shards)."""
    from jax.sharding import Mesh

    from microtipi_tpu.parallel.deconv import sharded_deconvolve
    from microtipi_tpu.parallel.mesh import make_mesh, volume_sharding

    objs, psf, data = _timelapse(noise=0.1)
    gains = jnp.asarray(np.exp(-0.1 * np.arange(T)))
    cfg = DeconvolutionConfig(mu=0.05, epsilon=1.0, max_iter=12, grtol=0.0)
    dense = deconvolve_timeseries(data, psf, config=cfg, mu_t=0.2,
                                  bleach=gains)
    mesh = make_mesh(batch=4, z=2)
    data_sh = jax.device_put(data, volume_sharding(mesh, batched=True))
    got = sharded_deconvolve(data_sh, psf, mesh, config=cfg, mu_t=0.2,
                             bleach=gains)
    np.testing.assert_allclose(float(got.f), float(dense.f), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(dense.x), atol=1e-6)

    # mu_t / bleach on unbatched data are rejected
    import pytest
    with pytest.raises(ValueError, match="batch axis"):
        sharded_deconvolve(data[0], psf, mesh, config=cfg, mu_t=0.1)
    with pytest.raises(ValueError, match="batch axis"):
        sharded_deconvolve(data[0], psf, mesh, config=cfg, bleach=gains)
