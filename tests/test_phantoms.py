"""Phantom generators + camera model (utils/phantoms.py) and the simulate CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from microtipi_tpu.utils.phantoms import (
    apply_camera,
    beads_phantom,
    filaments_phantom,
    shells_phantom,
)


def test_phantoms_shapes_determinism_and_structure():
    shape = (8, 32, 32)
    for gen in (beads_phantom, filaments_phantom, shells_phantom):
        a = gen(shape, seed=3)
        b = gen(shape, seed=3)
        c = gen(shape, seed=4)
        assert a.shape == shape and a.dtype == np.float32
        assert (a >= 0).all() and a.max() > 0
        np.testing.assert_array_equal(a, b)  # deterministic per seed
        assert np.abs(a - c).max() > 0  # and seed-dependent
    # beads are sparse deltas; shells are extended
    assert (beads_phantom(shape, n=10, seed=0) > 0).sum() <= 10
    assert (shells_phantom(shape, n=3, seed=0) > 0).sum() > 100


def test_apply_camera_noise_statistics():
    """Mean follows lam/gain + offset; variance follows lam/gain^2 + readout^2
    (the model InverseVarianceWeights inverts)."""
    clean = np.full((16, 64, 64), 50.0)
    out = apply_camera(clean, photons_at_max=400.0, gain=2.0,
                       readout_sigma=1.5, offset=100.0, seed=0)
    # every voxel expects 400 photons -> 200 ADU + 100 offset
    assert out.mean() == pytest.approx(300.0, rel=0.01)
    expected_var = 400.0 / 4.0 + 1.5**2  # shot/gain^2 + readout^2
    assert out.var() == pytest.approx(expected_var, rel=0.05)


def test_cli_simulate_roundtrip_deconv(tmp_path):
    """simulate writes a noisy acquisition + truth + PSF; deconv with the
    printed gain/readout weights recovers the object better than the data."""
    from microtipi_tpu.io.tiffstack import read_stack

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(cmd):
        return subprocess.run([sys.executable, "-m", "microtipi_tpu", *cmd],
                              capture_output=True, text=True, env=env, timeout=600)

    r = run(["simulate", str(tmp_path / "d.tif"), "--shape", "8", "32", "32",
             "--phantom", "shells", "--n", "3", "--photons", "2e4",
             "--truth", str(tmp_path / "t.tif"), "--psf-out", str(tmp_path / "p.tif"),
             "--na", "1.2", "--wavelength", "500e-9", "--ni", "1.33",
             "--dxy", "100e-9", "--dz", "250e-9", "--n-phase", "2", "--radial",
             "--phase", "0.2", "-0.1"])
    assert r.returncode == 0, r.stderr
    data = read_stack(tmp_path / "d.tif")
    truth = read_stack(tmp_path / "t.tif")
    psf = read_stack(tmp_path / "p.tif")
    assert data.shape == truth.shape == psf.shape == (8, 32, 32)
    assert data.min() > 50.0  # camera offset floor

    r = run(["deconv", str(tmp_path / "d.tif"), "--psf", str(tmp_path / "p.tif"),
             "--out", str(tmp_path / "o.tif"), "--iters", "25", "--mu", "3e-3",
             "--gain", "2.0", "--readout", "2.25"])
    assert r.returncode == 0, r.stderr
    rec = read_stack(tmp_path / "o.tif")

    # scale/offset-invariant comparison: the acquisition has offset+gain
    def err(x):
        x = x - np.median(x)
        sc = (x * truth).sum() / max((x * x).sum(), 1e-9)
        return np.linalg.norm(sc * x - truth)

    assert err(rec) < 0.8 * err(data)


def test_cli_simulate_depthvar_roundtrip(tmp_path):
    """simulate --depthvar blurs with the anchor-blend operator; the
    depth-varying deconv recovers the phantom better than the raw data."""
    from microtipi_tpu.io.tiffstack import read_stack

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(cmd):
        return subprocess.run([sys.executable, "-m", "microtipi_tpu", *cmd],
                              capture_output=True, text=True, env=env, timeout=600)

    geo = ["--model", "gl", "--ns", "1.36", "--na", "1.2",
           "--wavelength", "500e-9", "--ni", "1.518",
           "--dxy", "100e-9", "--dz", "300e-9", "--n-phase", "0"]
    r = run(["simulate", str(tmp_path / "d.tif"), "--shape", "8", "24", "24",
             "--phantom", "beads", "--n", "6", "--photons", "2e4",
             "--depthvar", "3",
             "--truth", str(tmp_path / "t.tif"), *geo])
    assert r.returncode == 0, r.stderr
    data = read_stack(tmp_path / "d.tif")
    truth = read_stack(tmp_path / "t.tif")
    assert data.shape == truth.shape == (8, 24, 24)

    r = run(["deconv", str(tmp_path / "d.tif"), "--out", str(tmp_path / "o.tif"),
             "--depthvar", "3", *geo, "--iters", "20", "--mu", "1e-3",
             "--gain", "2.0", "--readout", "2.25"])
    assert r.returncode == 0, r.stderr
    rec = read_stack(tmp_path / "o.tif")
    assert np.isfinite(rec).all()

    def corr(a, b):  # scale/offset-free sharpness metric
        a, b = a - a.mean(), b - b.mean()
        return float((a * b).sum() / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12))

    assert corr(rec, truth) > corr(data, truth), \
        (corr(rec, truth), corr(data, truth))
