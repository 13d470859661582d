"""Stage-scan deskewing (ops/geometry.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.ops.geometry import deskew, deskew_geometry


def _angle_for_shift(px, dz, dxy):
    """Angle whose per-plane shear is exactly ``px`` pixels."""
    return math.degrees(math.acos(px * dxy / dz))


def test_deskew_integer_shift_matches_roll():
    """An angle chosen for an exactly-2-pixel-per-plane shear must equal
    integer rolls into the padded grid (Fourier shift is exact there)."""
    dz, dxy = 1e-6, 100e-9
    angle = _angle_for_shift(2.0, dz, dxy)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((5, 8, 16)))
    out, dz_new = jax.jit(
        lambda v: deskew(v, angle, dz, dxy))(vol)
    assert out.shape == (5, 8, 16 + 2 * 4)
    expect = np.zeros(out.shape)
    for k in range(5):
        expect[k, :, 2 * k:2 * k + 16] = np.asarray(vol)[k]
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-10)
    assert dz_new == pytest.approx(dz * math.sin(math.radians(angle)))


def test_deskew_invert_mirrors():
    dz, dxy = 1e-6, 100e-9
    angle = _angle_for_shift(1.0, dz, dxy)
    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.random((4, 6, 12)))
    fwd, _ = deskew(vol, angle, dz, dxy)
    inv, _ = deskew(vol[:, :, ::-1], angle, dz, dxy, invert=True)
    np.testing.assert_allclose(np.asarray(inv)[:, :, ::-1], np.asarray(fwd),
                               atol=1e-10)


def test_deskew_subvoxel_preserves_energy_and_centroid():
    """Fractional shears: per-plane energy is conserved (unitary shift) and
    each plane's x centroid moves by exactly shift*k."""
    dz, dxy = 0.7e-6, 100e-9
    angle = 60.0  # shift = dz*cos(60)/dxy = 3.5 px/plane
    shift, nx_out, _ = deskew_geometry((4, 8, 16), angle, dz, dxy)
    assert shift == pytest.approx(3.5)
    # content decaying to ~0 at the plane edges: Fourier shifting steps at
    # the data/padding boundary would ring and bias the centroid
    yy, xx = np.mgrid[0:8, 0:16]
    base = np.exp(-((yy - 4.0) ** 2 + (xx - 7.5) ** 2) / 6.0)
    vol = jnp.asarray(np.stack([base for _ in range(4)]))
    out, _ = deskew(vol, angle, dz, dxy)
    assert out.shape[2] == nx_out
    x = np.arange(nx_out)
    for k in range(4):
        p0 = np.asarray(out)[0].sum(axis=0)
        pk = np.asarray(out)[k].sum(axis=0)
        np.testing.assert_allclose(pk.sum(), p0.sum(), rtol=1e-9)
        c0 = (x * p0).sum() / p0.sum()
        ck = (x * pk).sum() / pk.sum()
        # centroid of the circular shift differs only by wrap leakage, which
        # the zero padding absorbs for in-range shears
        assert abs(ck - c0 - shift * k) < 0.05


def test_cli_deskew(tmp_path):
    import json
    import os
    import subprocess
    import sys

    from microtipi_tpu.io.tiffstack import read_pixel_size, read_stack, write_stack

    dz, dxy = 1e-6, 100e-9
    angle = _angle_for_shift(2.0, dz, dxy)
    rng = np.random.default_rng(3)
    vol = rng.random((5, 8, 16)).astype(np.float32)
    write_stack(tmp_path / "raw.tif", vol, dxy=dxy, dz=dz)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "microtipi_tpu", "deskew",
         str(tmp_path / "raw.tif"), "--out", str(tmp_path / "d.tif"),
         "--angle", f"{angle}"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    out = read_stack(tmp_path / "d.tif")
    assert out.shape == (5, 8, 24)
    # output metadata carries the DESKEWED axial spacing dz*sin(theta)
    got_dxy, got_dz = read_pixel_size(tmp_path / "d.tif")
    assert got_dz == pytest.approx(dz * math.sin(math.radians(angle)), rel=1e-4)
    assert got_dxy == pytest.approx(dxy, rel=1e-6)


def _cli_env():
    import os

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return env


def test_cli_register_two_volumes(tmp_path):
    """register REF MOV recovers a known subvoxel shift and writes the
    aligned volume."""
    import subprocess
    import sys

    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.ops.register import fourier_shift

    shape = (8, 32, 32)
    rng = np.random.default_rng(5)
    ref = jnp.asarray(rng.random(shape).astype(np.float32))
    mov = fourier_shift(ref, jnp.asarray([0.0, 1.4, -2.2]))
    write_stack(tmp_path / "ref.tif", np.asarray(ref), dxy=100e-9, dz=250e-9)
    write_stack(tmp_path / "mov.tif", np.asarray(mov, np.float32))

    r = subprocess.run(
        [sys.executable, "-m", "microtipi_tpu", "register",
         str(tmp_path / "ref.tif"), str(tmp_path / "mov.tif"),
         "--out", str(tmp_path / "ali.tif")],
        capture_output=True, text=True, env=_cli_env(), timeout=600)
    assert r.returncode == 0, r.stderr
    assert "shift:" in r.stdout
    ali = read_stack(tmp_path / "ali.tif")
    # white-noise content is the interpolation worst case: a ~0.05-voxel
    # estimate residual shows up as O(0.1) pixel-value differences
    assert np.abs(ali - np.asarray(ref)).max() < 0.2
    assert np.abs(ali - np.asarray(ref)).mean() < 0.03


def test_cli_register_align_channels(tmp_path):
    """register --align-channels corrects a chromatic shift on every
    timepoint of a hyperstack, measured once at t=0."""
    import subprocess
    import sys

    from microtipi_tpu.io.ome import read_ome_hyperstack, write_ome_hyperstack
    from microtipi_tpu.ops.register import fourier_shift

    shape = (6, 24, 24)
    rng = np.random.default_rng(6)
    base = [jnp.asarray(rng.random(shape).astype(np.float32)) for _ in range(2)]
    shift = jnp.asarray([0.0, -1.2, 0.8])
    arr = np.zeros((2, 2, *shape), np.float32)
    for t in range(2):
        arr[t, 0] = np.asarray(base[t])
        arr[t, 1] = np.asarray(fourier_shift(base[t], shift))
    write_ome_hyperstack(tmp_path / "h.ome.tif", arr, dxy=100e-9, dz=250e-9)

    r = subprocess.run(
        [sys.executable, "-m", "microtipi_tpu", "register",
         str(tmp_path / "h.ome.tif"), "--align-channels",
         "--out", str(tmp_path / "ali.ome.tif")],
        capture_output=True, text=True, env=_cli_env(), timeout=600)
    assert r.returncode == 0, r.stderr
    assert "channel 1 -> 0" in r.stdout
    out, _meta = read_ome_hyperstack(tmp_path / "ali.ome.tif")
    assert out.shape == (2, 2, *shape)
    for t in range(2):
        assert np.abs(out[t, 1] - arr[t, 0]).max() < 0.2
        assert np.abs(out[t, 1] - arr[t, 0]).mean() < 0.03
        np.testing.assert_allclose(out[t, 0], arr[t, 0])  # ref channel untouched
