"""Acquisition preprocessing (ops/preprocess.py): flat-field, hot pixels,
rolling-ball background. Beyond-parity input hygiene (the reference's host
did these upstream)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.ops.preprocess import (
    flat_field_correct,
    remove_hot_pixels,
    rolling_ball_background,
    subtract_background,
)


def test_flat_field_correct_removes_gradient():
    shape = (4, 32, 32)
    rng = np.random.default_rng(0)
    truth = jnp.asarray(rng.uniform(50, 100, shape))
    gain = jnp.asarray(0.5 + np.linspace(0, 1, 32))[None, None, :] * jnp.ones(shape)
    dark = 7.0 * jnp.ones(shape)
    acquired = truth * gain + dark
    bright = 200.0 * gain[0] + dark[0]  # 2D flat-field reference
    out = jax.jit(flat_field_correct)(acquired, bright, dark[0])
    # correction removes the gradient up to one global scale
    ratio = np.asarray(out) / np.asarray(truth)
    np.testing.assert_allclose(ratio, ratio.mean(), rtol=1e-6)


def test_flat_field_guards_dead_pixels():
    data = jnp.ones((2, 8, 8))
    bright = jnp.ones((8, 8)).at[3, 3].set(0.0)  # dead reference pixel
    out = flat_field_correct(data, bright)
    assert np.isfinite(np.asarray(out)).all()


def test_remove_hot_pixels_kills_impulses_keeps_structure():
    shape = (6, 32, 32)
    rng = np.random.default_rng(1)
    clean = jnp.asarray(10 + rng.standard_normal(shape))
    # a laterally-extended bright feature across several planes (real signal)
    clean = clean.at[2:5, 10:14, 10:14].add(100.0)
    hot = clean.at[1, 5, 5].set(5000.0).at[4, 20, 7].set(-4000.0)
    out = np.asarray(jax.jit(remove_hot_pixels)(hot))
    assert abs(out[1, 5, 5] - np.asarray(clean)[1, 5, 5]) < 20
    assert abs(out[4, 20, 7] - np.asarray(clean)[4, 20, 7]) < 20
    # the extended feature interior is untouched
    np.testing.assert_allclose(out[3, 11:13, 11:13],
                               np.asarray(clean)[3, 11:13, 11:13])


def test_rolling_ball_background_subtraction():
    """A smooth gradient + narrow peaks: the opening removes the gradient
    and keeps the peaks (classical rolling-ball behavior)."""
    shape = (3, 64, 64)
    y = np.linspace(0, 30, 64)[None, :, None]
    x = np.linspace(0, 20, 64)[None, None, :]
    bg_true = 10.0 + y + x  # slow gradient
    data = np.broadcast_to(bg_true, shape).copy()
    peaks = [(1, 20, 20), (2, 40, 50), (0, 10, 55)]
    for z, yy, xx in peaks:
        data[z, yy - 1:yy + 2, xx - 1:xx + 2] += 200.0
    data = jnp.asarray(data)
    bg = np.asarray(jax.jit(lambda d: rolling_ball_background(d, radius=8))(data))
    # estimated background tracks the true gradient away from peaks...
    assert abs(bg[0, 32, 5] - bg_true[0, 32, 5]) < 3.0
    # ...and never exceeds the data
    assert (bg <= np.asarray(data) + 1e-6).all()
    out = np.asarray(subtract_background(data, radius=8))
    # peaks survive subtraction nearly intact; flats go to ~0
    for z, yy, xx in peaks:
        assert out[z, yy, xx] > 150.0
    assert out[0, 32, 5] < 5.0
    assert (out >= 0).all()


def test_cli_deconv_with_preprocessing(tmp_path):
    """deconv --dark --flat --hot-pixels --subtract-background: the
    corrections apply before the solve, and a corrupted acquisition
    reconstructs close to the clean-acquisition solve."""
    import os
    import subprocess
    import sys

    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (6, 32, 32)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, dtype=jnp.float32)
    psf = model.compute_psf(model.init_params())
    rng = np.random.default_rng(0)
    obj = np.zeros(shape, np.float32)
    obj[1:5, 8:24, 8:24] = 60.0
    clean = np.asarray(convolve(jnp.asarray(obj), convolve_spectrum(psf), shape))
    gain = (0.6 + np.linspace(0, 0.8, 32))[None, None, :].astype(np.float32)
    dark = 5.0 * np.ones(shape, np.float32)
    corrupted = clean * gain + dark
    corrupted[2, 4, 4] = 1e4  # hot pixel
    bright = (150.0 * gain[0] + dark[0]) * np.ones((32, 32), np.float32)

    write_stack(tmp_path / "d.tif", corrupted, dxy=100e-9, dz=250e-9)
    write_stack(tmp_path / "psf.tif", np.asarray(psf))
    write_stack(tmp_path / "flat.tif", bright[None])
    write_stack(tmp_path / "dark.tif", dark[:1])

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(extra):
        return subprocess.run(
            [sys.executable, "-m", "microtipi_tpu", "deconv",
             str(tmp_path / "d.tif"), "--psf", str(tmp_path / "psf.tif"),
             "--out", str(tmp_path / "o.tif"), "--iters", "10",
             "--mu", "1e-3", *extra],
            capture_output=True, text=True, env=env, timeout=600)

    r = run(["--flat", str(tmp_path / "flat.tif"),
             "--dark", str(tmp_path / "dark.tif"), "--hot-pixels", "5"])
    assert r.returncode == 0, r.stderr
    assert "preprocessed input" in r.stdout
    rec = read_stack(tmp_path / "o.tif")
    # corrected solve is far closer to truth than the raw corrupted solve
    r2 = run([])
    assert r2.returncode == 0, r2.stderr
    rec_raw = read_stack(tmp_path / "o.tif")
    # scale-match both before comparing (flat-field keeps mean gain)
    def err(x):
        sc = (x * obj).sum() / (x * x).sum()
        return np.linalg.norm(sc * x - obj)
    assert err(rec) < 0.7 * err(rec_raw)


# ---- destripe ------------------------------------------------------------


def test_destripe_removes_stripes_keeps_structure():
    """Fourier-notch destriping (Muench et al. 2009 core): >=80% of the
    stripe energy removed while smooth structure passes through with a few
    % change, DC exactly preserved."""
    import jax

    from microtipi_tpu.ops.preprocess import destripe

    ny = nx = 128
    yy, xx = np.mgrid[0:ny, 0:nx]
    clean = 100.0 * np.exp(-((yy - 64) ** 2 + (xx - 64) ** 2) / (2 * 18.0**2))
    stripes = 8.0 * np.sin(2 * np.pi * yy / 7.3) \
        * (1 + 0.3 * np.sin(2 * np.pi * yy / 23.0))  # along x, vary with y
    out = np.asarray(jax.jit(destripe)(jnp.asarray(clean + stripes)))
    assert np.linalg.norm(out - clean) < 0.2 * np.linalg.norm(stripes)
    passthrough = np.asarray(jax.jit(destripe)(jnp.asarray(clean)))
    assert np.linalg.norm(passthrough - clean) < 0.05 * np.linalg.norm(clean)
    np.testing.assert_allclose(out.mean(), (clean + stripes).mean(), rtol=1e-12)


def test_destripe_axes_batching_and_validation():
    import jax

    from microtipi_tpu.ops.preprocess import destripe

    rng = np.random.default_rng(3)
    plane = np.asarray(rng.random((32, 48)))
    # stripes along y == transposed stripes along x
    np.testing.assert_allclose(
        np.asarray(destripe(jnp.asarray(plane.T), axis=-2)),
        np.asarray(destripe(jnp.asarray(plane))).T, atol=1e-12)
    # leading dims are batched planes
    vol = np.asarray(rng.random((3, 32, 48)))
    np.testing.assert_allclose(
        np.asarray(destripe(jnp.asarray(vol))),
        np.stack([np.asarray(destripe(jnp.asarray(p))) for p in vol]),
        atol=1e-12)
    with pytest.raises(ValueError):
        destripe(jnp.asarray(plane), axis=0)
    with pytest.raises(ValueError):
        destripe(jnp.ones(5))


def test_build_preprocess_destripe_wiring():
    """--destripe y maps to axis=-2 through the shared preprocessing
    pipeline builder (in-process — no subprocess needed to pin wiring)."""
    import argparse

    from microtipi_tpu.__main__ import _build_preprocess

    args = argparse.Namespace(flat=None, dark=None, hot_pixels=0.0,
                              subtract_background=0, destripe="y",
                              destripe_sigma=2.0, destripe_protect=4.0)
    pre = _build_preprocess(args)
    assert pre is not None
    ny = nx = 64
    yy, xx = np.mgrid[0:ny, 0:nx]
    clean = 50.0 * np.exp(-((yy - 32) ** 2 + (xx - 32) ** 2) / (2 * 9.0**2))
    stripes = 6.0 * np.sin(2 * np.pi * xx / 5.7)  # along y: vary with x
    vol = np.stack([clean + stripes] * 3).astype(np.float32)
    out = pre(vol)
    assert out.shape == vol.shape
    assert np.linalg.norm(out[0] - clean) < 0.25 * np.linalg.norm(stripes)


def test_destripe_integer_input_upcasts():
    """Raw uint16 camera frames: the fractional Fourier gain must not
    truncate to 0 in the input dtype (round-3 review fix) — integer input
    computes and returns float32, matching the float path."""
    from microtipi_tpu.ops.preprocess import destripe

    rng = np.random.default_rng(5)
    plane = (1000 + 200 * rng.random((32, 32))).astype(np.uint16)
    out = np.asarray(destripe(jnp.asarray(plane)))
    assert out.dtype == np.float32
    ref = np.asarray(destripe(jnp.asarray(plane, jnp.float32)))
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    assert np.abs(out).max() > 100  # not zeroed by integer truncation
