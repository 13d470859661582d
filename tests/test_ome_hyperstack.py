"""OME hyperstack (multi-channel/timepoint) IO + CLI channel selection."""

import os

import numpy as np
import pytest

from microtipi_tpu.io.ome import (
    ome_xml,
    parse_ome,
    read_ome_hyperstack,
    write_ome_hyperstack,
)
from microtipi_tpu.io.tiffstack import write_stack


def _arr(shape, seed=0):
    return np.random.default_rng(seed).random(shape).astype(np.float32) * 50


def test_hyperstack_roundtrip_with_channels(tmp_path):
    a = _arr((2, 3, 4, 10, 12))
    p = tmp_path / "h.ome.tif"
    write_ome_hyperstack(
        p, a, dxy=65e-9, dz=150e-9,
        channel_names=["dapi", "gfp", "mcherry"],
        emission_wavelengths=[461e-9, 509e-9, 610e-9],
    )
    back, meta = read_ome_hyperstack(p)
    np.testing.assert_array_equal(back, a)
    assert meta["size_c"] == 3 and meta["size_t"] == 2
    assert meta["shape"] == (4, 10, 12)
    np.testing.assert_allclose(meta["dxy"], 65e-9, rtol=1e-6)
    assert [c["name"] for c in meta["channels"]] == ["dapi", "gfp", "mcherry"]
    np.testing.assert_allclose(
        [c["emission_wavelength"] for c in meta["channels"]],
        [461e-9, 509e-9, 610e-9], rtol=1e-6,
    )


def test_hyperstack_3d_and_4d_promote(tmp_path):
    v3 = _arr((4, 8, 8), 1)
    p = tmp_path / "v3.ome.tif"
    write_ome_hyperstack(p, v3)
    back, meta = read_ome_hyperstack(p)
    assert back.shape == (1, 1, 4, 8, 8)
    np.testing.assert_array_equal(back[0, 0], v3)

    v4 = _arr((2, 4, 8, 8), 2)  # (C, Z, Y, X)
    p4 = tmp_path / "v4.ome.tif"
    write_ome_hyperstack(p4, v4)
    back4, meta4 = read_ome_hyperstack(p4)
    assert back4.shape == (1, 2, 4, 8, 8)
    assert meta4["size_c"] == 2
    np.testing.assert_array_equal(back4[0], v4)


def test_non_ome_tiff_reads_as_plain_volume(tmp_path):
    v = _arr((5, 6, 7), 3)
    p = tmp_path / "plain.tif"
    write_stack(p, v)
    back, meta = read_ome_hyperstack(p)
    assert back.shape == (1, 1, 5, 6, 7)
    np.testing.assert_array_equal(back[0, 0], v)
    assert meta["size_c"] == 1 and meta["size_t"] == 1


def test_dimension_order_xyczt(tmp_path):
    """Third-party files may interleave channels fastest (XYCZT)."""
    nt, nc, nz, ny, nx = 2, 3, 4, 6, 5
    a = _arr((nt, nc, nz, ny, nx), 4)
    # Page order for XYCZT: c fastest, then z, then t.
    pages = np.transpose(a, (0, 2, 1, 3, 4)).reshape(nt * nz * nc, ny, nx)
    desc = ome_xml((nz, ny, nx), size_c=nc, size_t=nt).replace(
        'DimensionOrder="XYZCT"', 'DimensionOrder="XYCZT"'
    )
    p = tmp_path / "czt.ome.tif"
    write_stack(p, pages, description=desc)
    back, meta = read_ome_hyperstack(p)
    assert meta["dimension_order"] == "XYCZT"
    np.testing.assert_array_equal(back, a)


def test_parse_ome_channel_units():
    xml = ome_xml((2, 3, 3), size_c=1, emission_wavelengths=[525e-9])
    meta = parse_ome(xml)
    np.testing.assert_allclose(meta["channels"][0]["emission_wavelength"], 525e-9)
    # Unit override honored.
    xml2 = xml.replace('EmissionWavelengthUnit="nm"', 'EmissionWavelengthUnit="µm"')
    meta2 = parse_ome(xml2)
    np.testing.assert_allclose(meta2["channels"][0]["emission_wavelength"], 525e-6)


def test_cli_deconv_selects_channel(tmp_path, capsys):
    """deconv on a 2-channel hyperstack solves the selected channel only."""
    import jax.numpy as jnp

    from microtipi_tpu.__main__ import main
    from microtipi_tpu.io.tiffstack import read_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (8, 24, 24)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.518,
                            dxy=100e-9, dz=200e-9, dtype=jnp.float32)
    psf = model.compute_psf(model.init_params())
    rng = np.random.default_rng(5)
    objs = [rng.random(shape).astype(np.float32) * (rng.random(shape) > 0.99) * 100
            for _ in range(2)]
    blurred = np.stack([
        np.asarray(convolve(jnp.asarray(o), convolve_spectrum(psf), shape))
        for o in objs
    ])
    hyper = blurred[None]  # (T=1, C=2, Z, Y, X)
    data_p = tmp_path / "d.ome.tif"
    write_ome_hyperstack(data_p, hyper, dxy=100e-9, dz=200e-9,
                         emission_wavelengths=[461e-9, 610e-9])
    psf_p = tmp_path / "psf.tif"
    write_stack(psf_p, np.asarray(psf))
    out_p = tmp_path / "o.tif"
    main(["deconv", str(data_p), "--psf", str(psf_p), "--out", str(out_p),
          "--channel", "1", "--iters", "3", "--mu", "1e-3"])
    msgs = capsys.readouterr().out
    assert "hyperstack T=1 C=2" in msgs and "c=1" in msgs
    out = read_stack(out_p)
    # The solve ran on channel 1: its result correlates with obj 1's blur,
    # not channel 0's.
    r1 = np.corrcoef(out.ravel(), blurred[1].ravel())[0, 1]
    r0 = np.corrcoef(out.ravel(), blurred[0].ravel())[0, 1]
    assert r1 > r0


def test_cli_blind_wavelength_from_ome_channel(tmp_path, capsys):
    """blind auto-fills the model wavelength from the OME channel emission."""
    import jax.numpy as jnp

    from microtipi_tpu.__main__ import main
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (8, 16, 16)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=610e-9, ni=1.518,
                            dxy=100e-9, dz=200e-9, dtype=jnp.float32)
    psf = model.compute_psf(model.init_params())
    rng = np.random.default_rng(6)
    obj = rng.random(shape).astype(np.float32) * 10
    blurred = np.asarray(convolve(jnp.asarray(obj), convolve_spectrum(psf), shape))
    p = tmp_path / "d.ome.tif"
    write_ome_hyperstack(p, blurred[None, None], dxy=100e-9, dz=200e-9,
                         emission_wavelengths=[610e-9])
    main(["blind", str(p), "--out", str(tmp_path / "o.tif"),
          "--loops", "2", "--iters", "2", "--psf-iters", "1",
          "--n-phase", "3", "--radial"])
    out = capsys.readouterr().out
    assert "wavelength = 610 nm (OME channel 0 emission)" in out


def test_cli_blind_all_channels(tmp_path, capsys):
    """blind --all-channels solves each channel with its own emission
    wavelength and writes a multi-channel OME hyperstack."""
    import jax.numpy as jnp

    from microtipi_tpu.__main__ import main
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (8, 16, 16)
    rng = np.random.default_rng(7)
    chans, wls = [], [480e-9, 630e-9]
    for wl in wls:
        model = WideFieldConfig(shape=shape, na=1.2, wavelength=wl, ni=1.518,
                                dxy=100e-9, dz=200e-9, dtype=jnp.float32)
        psf = model.compute_psf(model.init_params())
        o = rng.random(shape).astype(np.float32) * 10
        chans.append(np.asarray(convolve(jnp.asarray(o), convolve_spectrum(psf), shape)))
    p = tmp_path / "mc.ome.tif"
    write_ome_hyperstack(p, np.stack(chans)[None], dxy=100e-9, dz=200e-9,
                         channel_names=["blue", "red"], emission_wavelengths=wls)
    out_p = tmp_path / "out.ome.tif"
    main(["blind", str(p), "--out", str(out_p), "--all-channels",
          "--loops", "2", "--iters", "2", "--psf-iters", "1",
          "--n-phase", "2", "--radial"])
    msgs = capsys.readouterr().out
    assert "channel 0: wavelength 480 nm" in msgs
    assert "channel 1: wavelength 630 nm" in msgs
    back, meta = read_ome_hyperstack(out_p)
    assert back.shape == (1, 2) + shape
    np.testing.assert_allclose(
        [c["emission_wavelength"] for c in meta["channels"]], wls, rtol=1e-6)
    assert [c["name"] for c in meta["channels"]] == ["blue", "red"]


def test_ome_companion_roundtrip(tmp_path):
    """write_ome_companion splits per (t, c); the companion document
    reassembles the exact hyperstack, including geometry and emissions."""
    from microtipi_tpu.io.ome import (
        read_ome_companion,
        read_ome_hyperstack,
        write_ome_companion,
    )

    rng = np.random.default_rng(0)
    arr = rng.normal(size=(2, 3, 4, 8, 8)).astype(np.float32)
    files = write_ome_companion(
        tmp_path / "set.companion.ome", arr, dxy=65e-9, dz=200e-9,
        channel_names=["a", "b", "c"],
        emission_wavelengths=[510e-9, 561e-9, 610e-9],
    )
    assert len(files) == 6  # one z-stack per (t, c)
    assert sorted(files)[0] == "set_t0_c0.ome.tif"
    out, meta = read_ome_companion(tmp_path / "set.companion.ome")
    np.testing.assert_allclose(out, arr, rtol=1e-7)
    assert meta["dxy"] == pytest.approx(65e-9)
    assert meta["channels"][2]["emission_wavelength"] == pytest.approx(610e-9)
    # read_ome_hyperstack dispatches .companion.ome transparently
    out2, _ = read_ome_hyperstack(tmp_path / "set.companion.ome")
    np.testing.assert_allclose(out2, arr, rtol=1e-7)


def test_ome_companion_singleton_axes_names(tmp_path):
    """Singleton axes drop their index from the per-file names."""
    from microtipi_tpu.io.ome import read_ome_companion, write_ome_companion

    arr = np.random.default_rng(1).normal(size=(1, 2, 3, 6, 6)).astype(np.float32)
    files = write_ome_companion(tmp_path / "x.companion.ome", arr)
    assert sorted(files) == ["x_c0.ome.tif", "x_c1.ome.tif"]
    out, _ = read_ome_companion(tmp_path / "x.companion.ome")
    np.testing.assert_allclose(out, arr, rtol=1e-7)


def test_ome_master_file_with_foreign_tiffdata(tmp_path):
    """A master OME-TIFF whose TiffData references sibling files assembles
    across files (channel 0 in the master, channel 1 in the sibling)."""
    from microtipi_tpu.io.ome import ome_xml, read_ome_hyperstack
    from microtipi_tpu.io.tiffstack import write_stack

    rng = np.random.default_rng(2)
    arr = rng.normal(size=(1, 2, 3, 6, 6)).astype(np.float32)
    desc = ome_xml((3, 6, 6), size_c=2, tiff_data=[
        {"ifd": 0, "plane_count": 3, "first_z": 0, "first_c": 0, "first_t": 0,
         "filename": "m.ome.tif"},
        {"ifd": 0, "plane_count": 3, "first_z": 0, "first_c": 1, "first_t": 0,
         "filename": "s.ome.tif"},
    ])
    write_stack(tmp_path / "m.ome.tif", arr[0, 0], description=desc)
    write_stack(tmp_path / "s.ome.tif", arr[0, 1])
    out, meta = read_ome_hyperstack(tmp_path / "m.ome.tif")
    np.testing.assert_allclose(out, arr, rtol=1e-7)


def test_ome_companion_incomplete_set_is_an_error(tmp_path):
    from microtipi_tpu.io.ome import read_ome_companion, write_ome_companion
    import os

    arr = np.zeros((1, 2, 2, 4, 4), np.float32)
    write_ome_companion(tmp_path / "p.companion.ome", arr)
    os.remove(tmp_path / "p_c1.ome.tif")
    with pytest.raises((ValueError, IOError, OSError)):
        read_ome_companion(tmp_path / "p.companion.ome")


def test_cli_companion_input(tmp_path):
    """info + blind accept a .companion.ome path (geometry from the doc,
    channel selection as with a single-file hyperstack)."""
    import subprocess
    import sys

    from microtipi_tpu.io.ome import write_ome_companion

    rng = np.random.default_rng(3)
    arr = np.abs(rng.normal(size=(1, 2, 4, 16, 16))).astype(np.float32) * 10
    write_ome_companion(tmp_path / "d.companion.ome", arr, dxy=100e-9, dz=250e-9,
                        emission_wavelengths=[500e-9, 600e-9])

    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")

    def run(argv):
        return subprocess.run([sys.executable, "-m", "microtipi_tpu", *argv],
                              cwd=tmp_path, env=env, capture_output=True, text=True)

    r = run(["info", "d.companion.ome"])
    assert r.returncode == 0 and "companion set" in r.stdout and "2 files" in r.stdout

    r = run(["blind", "d.companion.ome", "--out", "o.tif", "--channel", "1",
             "--loops", "1", "--iters", "3", "--psf-iters", "2",
             "--n-phase", "2", "--radial", "--na", "1.2", "--ni", "1.33"])
    assert r.returncode == 0, r.stderr
    assert "wavelength = 600 nm" in r.stdout  # channel 1 emission drove the model
    assert "dxy = 100 nm" in r.stdout
