"""OME-NGFF plate (HCS multi-position) collections: store round-trips in
both zarr formats, image addressing, and the CLI well-selection and
fan-out paths (``--well A/1``; plate in -> plate out without ``--well``).

The reference has no IO layer at all (data enters as TiPi arrays from the
host GUI, microscopy/PSF_Estimation.java:316-330); plates are rebuild-owned
breadth for screening workflows.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from microtipi_tpu.io.plate import (
    is_plate,
    list_plate_images,
    plate_info,
    read_plate_image,
    read_plate_meta,
    write_plate,
)


def _wells(rng, shape=(4, 8, 9), paths=("A/1", "A/2", "B/1"), fields=2):
    return {
        wp: [rng.normal(size=shape).astype(np.float32) for _ in range(fields)]
        for wp in paths
    }


@pytest.mark.parametrize("fmt", [2, 3])
def test_plate_roundtrip(tmp_path, fmt):
    rng = np.random.default_rng(0)
    wells = _wells(rng)
    p = tmp_path / f"p{fmt}.zarr"
    write_plate(p, wells, dxy=65e-9, dz=200e-9, zarr_format=fmt,
                compressor="zlib" if fmt == 2 else "zstd")
    assert is_plate(p)
    meta = read_plate_meta(p)
    assert [w["path"] for w in meta["wells"]] == ["A/1", "A/2", "B/1"]
    assert meta["rows"] == ["A", "B"]
    assert meta["columns"] == ["1", "2"]
    assert meta["field_count"] == 2
    assert meta["wells"][2]["row_index"] == 1  # B
    assert len(list_plate_images(p)) == 6
    arr, imeta = read_plate_image(p, "B/1", 1)
    np.testing.assert_allclose(arr[0, 0], wells["B/1"][1], rtol=1e-6)
    assert imeta["dxy"] == pytest.approx(65e-9)
    info = plate_info(p)
    assert "plate 2x2" in info and "6 images" in info


def test_plate_bad_well_and_field_are_clear_errors(tmp_path):
    rng = np.random.default_rng(1)
    p = tmp_path / "p.zarr"
    write_plate(p, _wells(rng), dxy=65e-9, dz=200e-9)
    with pytest.raises(ValueError, match="well"):
        read_plate_image(p, "C/9")
    with pytest.raises(ValueError, match="field"):
        read_plate_image(p, "A/1", 5)


def _run(argv, cwd):
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    return subprocess.run([sys.executable, "-m", "microtipi_tpu", *argv],
                          cwd=cwd, env=env, capture_output=True, text=True)


def test_cli_plate_info_well_selection_and_fan_out(tmp_path):
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (8, 16, 16)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, dtype=jnp.float32)
    psf = model.compute_psf(model.init_params())
    rng = np.random.default_rng(2)
    wells, objs = {}, {}
    for wp in ("A/1", "B/2"):
        obj = np.abs(rng.standard_normal(shape)).astype(np.float32) * 10
        data = np.asarray(
            convolve(jnp.asarray(obj), convolve_spectrum(psf), shape))
        wells[wp], objs[wp] = [data], obj
    write_plate(tmp_path / "p.zarr", wells, dxy=100e-9, dz=250e-9,
                zarr_format=3, compressor="zstd")
    write_stack(tmp_path / "psf.tif", np.asarray(psf))

    r = _run(["info", "p.zarr"], tmp_path)
    assert r.returncode == 0 and "OME-NGFF plate" in r.stdout
    assert "dxy = 100 nm" in r.stdout

    # plate input without --well and a non-plate --out is refused clearly
    r = _run(["deconv", "p.zarr", "--psf", "psf.tif", "--out", "o.tif",
              "--iters", "3"], tmp_path)
    assert r.returncode != 0 and "plate" in (r.stdout + r.stderr)

    # single-well selection writes one ordinary NGFF image
    r = _run(["deconv", "p.zarr", "--well", "B/2", "--psf", "psf.tif",
              "--out", "one.zarr", "--iters", "5", "--mu", "1e-3"], tmp_path)
    assert r.returncode == 0, r.stderr
    from microtipi_tpu.io.zarrstack import read_ngff_hyperstack

    one, _ = read_ngff_hyperstack(tmp_path / "one.zarr")
    assert one.shape == (1, 1, *shape)

    # fan-out: plate in -> plate out, same zarr format, every well improves
    r = _run(["deconv", "p.zarr", "--psf", "psf.tif", "--out", "out.zarr",
              "--iters", "5", "--mu", "1e-3"], tmp_path)
    assert r.returncode == 0, r.stderr
    assert "zarr v3" in r.stdout
    assert is_plate(tmp_path / "out.zarr")
    for wp in wells:
        out, meta = read_plate_image(tmp_path / "out.zarr", wp, 0)
        before = np.linalg.norm(wells[wp][0] - objs[wp])
        after = np.linalg.norm(out[0, 0] - objs[wp])
        assert after < before
        assert meta["dxy"] == pytest.approx(100e-9)


def test_cli_plate_deconv_depthvar_fan_out(tmp_path):
    """deconv --depthvar on a plate without --well: every well solves with
    the depth-varying operator (thick HCS samples), params from one JSON."""
    import json

    import jax.numpy as jnp

    shape = (8, 16, 16)
    rng = np.random.default_rng(4)
    wells = {wp: [np.abs(rng.standard_normal(shape)).astype(np.float32) * 10]
             for wp in ("A/1", "B/2")}
    write_plate(tmp_path / "p.zarr", wells, dxy=100e-9, dz=300e-9)
    (tmp_path / "cal.json").write_text(json.dumps(
        {"defocus": [1.518 / 500e-9, 0.0, 0.0], "phase": [],
         "modulus": [1.0], "depth": [1.36 / 500e-9, 0.0]}))

    r = _run(["deconv", "p.zarr", "--out", "out.zarr", "--depthvar", "2",
              "--model", "gl", "--params-json", "cal.json", "--ns", "1.36",
              "--na", "1.2", "--wavelength", "500e-9", "--n-phase", "0",
              "--iters", "3", "--mu", "1e-3"], tmp_path)
    assert r.returncode == 0, r.stderr
    assert is_plate(tmp_path / "out.zarr")
    for wp in wells:
        out, _ = read_plate_image(tmp_path / "out.zarr", wp, 0)
        assert out.shape == (1, 1, *shape) and np.isfinite(out).all()

    # the RL variant rides the same fan-out
    r = _run(["deconv", "p.zarr", "--out", "rl.zarr", "--depthvar", "2",
              "--model", "gl", "--params-json", "cal.json", "--ns", "1.36",
              "--na", "1.2", "--wavelength", "500e-9", "--n-phase", "0",
              "--method", "rl", "--iters", "4"], tmp_path)
    assert r.returncode == 0, r.stderr
    out, _ = read_plate_image(tmp_path / "rl.zarr", "A/1", 0)
    assert np.isfinite(out).all() and (out >= 0).all()


def test_cli_plate_deconv_auto_mu_calibrates_once(tmp_path):
    """Plate fan-out with --auto-mu: the first well's discrepancy bisection
    sets mu, later wells reuse it (one calibration line, the serving
    calibrate-once semantics)."""
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (6, 16, 16)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, dtype=jnp.float32)
    psf = model.compute_psf(model.init_params())
    rng = np.random.default_rng(5)
    wells = {}
    for wp in ("A/1", "A/2"):
        obj = np.abs(rng.standard_normal(shape)).astype(np.float32) * 10
        d = np.asarray(convolve(jnp.asarray(obj), convolve_spectrum(psf), shape))
        wells[wp] = [d + 0.3 * rng.standard_normal(shape).astype(np.float32)]
    write_plate(tmp_path / "p.zarr", wells, dxy=100e-9, dz=250e-9)
    write_stack(tmp_path / "psf.tif", np.asarray(psf))

    r = _run(["deconv", "p.zarr", "--psf", "psf.tif", "--out", "out.zarr",
              "--iters", "6", "--auto-mu"], tmp_path)
    assert r.returncode == 0, r.stderr
    assert r.stdout.count("auto-mu (first plate image): mu=") == 1
    assert is_plate(tmp_path / "out.zarr")
    for wp in wells:
        out, _ = read_plate_image(tmp_path / "out.zarr", wp, 0)
        assert np.isfinite(out).all()
