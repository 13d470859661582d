"""CLI smoke tests (subprocess, CPU backend)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable, "-m", "microtipi_tpu", *args],
        capture_output=True, text=True, env=env, cwd=cwd, timeout=600,
    )


def test_cli_psf_info_deconv_roundtrip(tmp_path):
    r = _run(
        ["psf", str(tmp_path / "psf.tif"), "--shape", "8", "32", "32",
         "--n-phase", "3", "--phase", "0.3", "-0.2", "0.1"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr

    r = _run(["info", str(tmp_path / "psf.tif")], tmp_path)
    assert r.returncode == 0 and "Nz=8 Ny=32 Nx=32" in r.stdout

    # blur the PSF against itself as a trivial dataset and deconvolve
    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
    import jax.numpy as jnp

    psf = jnp.asarray(read_stack(tmp_path / "psf.tif"))
    obj = np.zeros((8, 32, 32), np.float32)
    obj[3:5, 10:22, 10:22] = 50.0
    data = convolve(jnp.asarray(obj), convolve_spectrum(psf), (8, 32, 32))
    write_stack(tmp_path / "data.tif", np.asarray(data))

    r = _run(
        ["deconv", str(tmp_path / "data.tif"), "--psf", str(tmp_path / "psf.tif"),
         "--out", str(tmp_path / "rec.tif"), "--iters", "10", "--mu", "0.005"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "wrote" in r.stdout
    rec = read_stack(tmp_path / "rec.tif")
    assert rec.shape == (8, 32, 32) and np.isfinite(rec).all()


def test_cli_bad_family_rejected(tmp_path):
    r = _run(["blind", "x.tif", "--out", "y.tif", "--families", "bogus"], tmp_path)
    assert r.returncode != 0
    assert "invalid choice" in r.stderr
