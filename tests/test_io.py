"""Native TIFF stack IO: roundtrip, cross-validation vs PIL, prefetcher."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")

from microtipi_tpu.io.tiffstack import StackPrefetcher, read_stack, stack_info, write_stack


def _vol(shape, seed=0):
    return np.random.default_rng(seed).random(shape).astype(np.float32) * 100


def test_roundtrip(tmp_path):
    v = _vol((7, 33, 41))
    p = tmp_path / "s.tif"
    write_stack(p, v)
    assert stack_info(p) == (7, 33, 41)
    back = read_stack(p)
    np.testing.assert_array_equal(back, v)


def test_partial_read(tmp_path):
    v = _vol((10, 16, 16), 1)
    p = tmp_path / "s.tif"
    write_stack(p, v)
    part = read_stack(p, z0=3, nz=4)
    np.testing.assert_array_equal(part, v[3:7])


def test_cross_validation_with_pil_reader(tmp_path):
    """Our writer's output must be readable by an independent decoder."""
    v = _vol((3, 20, 24), 2)
    p = tmp_path / "s.tif"
    write_stack(p, v)
    img = PIL.open(p)
    for z in range(3):
        img.seek(z)
        np.testing.assert_array_equal(np.asarray(img), v[z])


def test_reads_pil_written_uint16(tmp_path):
    """Our reader must decode third-party uint16 stacks (the common camera
    format), converting to float32."""
    rng = np.random.default_rng(3)
    pages = [rng.integers(0, 65535, (18, 22), dtype=np.uint16) for _ in range(4)]
    p = tmp_path / "u16.tif"
    PIL.fromarray(pages[0]).save(
        p, save_all=True, append_images=[PIL.fromarray(x) for x in pages[1:]]
    )
    got = read_stack(p)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, np.stack(pages).astype(np.float32))


def test_prefetcher_order_and_content(tmp_path):
    vols = [_vol((4, 8, 8), seed=s) for s in range(5)]
    paths = []
    for i, v in enumerate(vols):
        p = tmp_path / f"t{i}.tif"
        write_stack(p, v)
        paths.append(p)
    out = list(StackPrefetcher(paths, depth=3))
    assert [p for p, _ in out] == [str(p) for p in paths]
    for (_, got), want in zip(out, vols):
        np.testing.assert_array_equal(got, want)


def test_error_on_missing_file(tmp_path):
    with pytest.raises(IOError):
        stack_info(tmp_path / "nope.tif")


def test_prefetcher_is_reusable(tmp_path):
    vols = [_vol((2, 8, 8), seed=s) for s in range(3)]
    paths = []
    for i, v in enumerate(vols):
        p = tmp_path / f"r{i}.tif"
        write_stack(p, v)
        paths.append(p)
    pf = StackPrefetcher(paths, depth=2)
    first = list(pf)
    # break out mid-iteration, then iterate again from scratch
    for _, _ in pf:
        break
    second = list(pf)
    assert [p for p, _ in first] == [p for p, _ in second]
    for (_, a), (_, b) in zip(first, second):
        np.testing.assert_array_equal(a, b)


def test_hdf5_roundtrip(tmp_path):
    pytest.importorskip("h5py")
    from microtipi_tpu.io.hdf5stack import list_datasets, read_h5, write_h5

    v = _vol((6, 12, 14), 7)
    p = tmp_path / "v.h5"
    write_h5(p, v, dataset="stack")
    assert list_datasets(p) == ["stack"]
    np.testing.assert_array_equal(read_h5(p), v)
    np.testing.assert_array_equal(read_h5(p, "stack", z0=2, nz=3), v[2:5])


# ---- tiled / compressed / pixel-size metadata (round-2 native features) ----

def test_tiled_roundtrip(tmp_path):
    """Tile-layout TIFFs (incl. non-multiple-of-tile edges) decode exactly."""
    from microtipi_tpu.io.tiffstack import read_stack, write_stack

    rng = np.random.default_rng(3)
    vol = rng.standard_normal((3, 40, 56)).astype(np.float32)  # edges < tile
    p = tmp_path / "tiled.tif"
    write_stack(p, vol, tile=32)
    got = read_stack(p)
    np.testing.assert_array_equal(got, vol)


def test_lzw_and_deflate_roundtrip(tmp_path):
    from microtipi_tpu.io.tiffstack import read_stack, write_stack

    rng = np.random.default_rng(4)
    vol = np.round(rng.standard_normal((4, 32, 48)).astype(np.float32), 2)
    for comp in ("lzw", "deflate"):
        p = tmp_path / f"{comp}.tif"
        write_stack(p, vol, compression=comp)
        np.testing.assert_array_equal(read_stack(p), vol)


def test_tiled_compressed_roundtrip(tmp_path):
    from microtipi_tpu.io.tiffstack import read_stack, write_stack

    rng = np.random.default_rng(5)
    vol = rng.standard_normal((2, 33, 47)).astype(np.float32)
    p = tmp_path / "tc.tif"
    write_stack(p, vol, compression="deflate", tile=16)
    np.testing.assert_array_equal(read_stack(p), vol)


def test_pixel_size_imagej_roundtrip(tmp_path):
    from microtipi_tpu.io.tiffstack import read_pixel_size, write_stack

    vol = np.zeros((2, 16, 16), np.float32)
    p = tmp_path / "geom.tif"
    write_stack(p, vol, dxy=80e-9, dz=200e-9)
    dxy, dz = read_pixel_size(p)
    assert dxy == pytest.approx(80e-9, rel=1e-6)
    assert dz == pytest.approx(200e-9, rel=1e-6)


def test_pixel_size_ome_description(tmp_path):
    """OME-XML PhysicalSize* attributes take priority (default unit um)."""
    from microtipi_tpu.io.tiffstack import read_pixel_size, write_stack

    ome = ('<?xml version="1.0"?><OME><Image><Pixels '
           'PhysicalSizeX="0.065" PhysicalSizeXUnit="µm" '
           'PhysicalSizeZ="150.0" PhysicalSizeZUnit="nm" '
           '/></Image></OME>')
    vol = np.zeros((2, 16, 16), np.float32)
    p = tmp_path / "ome.tif"
    write_stack(p, vol, description=ome)
    dxy, dz = read_pixel_size(p)
    assert dxy == pytest.approx(65e-9, rel=1e-6)
    assert dz == pytest.approx(150e-9, rel=1e-6)


def test_pixel_size_absent_is_none(tmp_path):
    from microtipi_tpu.io.tiffstack import read_pixel_size, write_stack

    p = tmp_path / "plain.tif"
    write_stack(p, np.zeros((1, 8, 8), np.float32))
    assert read_pixel_size(p) == (None, None)


def test_deconv_cli_on_tiled_lzw_input(tmp_path):
    """__main__ deconv must work on tiled/compressed inputs unmodified."""
    import jax.numpy as jnp
    from microtipi_tpu.__main__ import main
    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (4, 32, 32)
    rng = np.random.default_rng(6)
    obj = np.abs(rng.standard_normal(shape)).astype(np.float32)
    psf = np.zeros(shape, np.float32)
    psf[0, 0, 0] = 0.7
    psf[0, 1, 0] = 0.3
    data = np.asarray(convolve(jnp.asarray(obj), convolve_spectrum(jnp.asarray(psf)), shape))
    write_stack(tmp_path / "data.tif", data, compression="lzw", tile=16)
    write_stack(tmp_path / "psf.tif", psf)
    main(["deconv", str(tmp_path / "data.tif"), "--psf", str(tmp_path / "psf.tif"),
          "--out", str(tmp_path / "out.tif"), "--iters", "5"])
    rec = read_stack(tmp_path / "out.tif")
    assert rec.shape == shape and np.isfinite(rec).all()


def test_bigtiff_roundtrip(tmp_path):
    """BigTIFF (64-bit offsets, 'w8') round-trips through the same reader."""
    from microtipi_tpu.io.tiffstack import read_stack, stack_info, write_stack

    rng = np.random.default_rng(7)
    vol = rng.standard_normal((3, 24, 24)).astype(np.float32)
    p = tmp_path / "big.tif"
    write_stack(p, vol, bigtiff=True, compression="lzw")
    # BigTIFF magic is 43 (classic is 42)
    magic = int.from_bytes(p.read_bytes()[2:4], "little")
    assert magic == 43
    assert stack_info(p) == (3, 24, 24)
    np.testing.assert_array_equal(read_stack(p), vol)


def test_bdv_pyramid_roundtrip(tmp_path):
    """BigDataViewer-layout HDF5 pyramid: exact level-0 round-trip, correct
    group structure and 2x mean-downsampled levels."""
    h5py = pytest.importorskip("h5py")
    from microtipi_tpu.io.hdf5stack import bdv_info, read_bdv, write_bdv

    rng = np.random.default_rng(8)
    vol = rng.standard_normal((9, 33, 40)).astype(np.float32)
    p = tmp_path / "bdv.h5"
    write_bdv(p, vol, levels=3)
    np.testing.assert_array_equal(read_bdv(p, level=0), vol)
    l1 = read_bdv(p, level=1)
    assert l1.shape == (4, 16, 20)
    # level 1 is the 2x mean of the even-cropped level 0
    ref = vol[:8, :32, :40].reshape(4, 2, 16, 2, 20, 2).mean(axis=(1, 3, 5))
    np.testing.assert_allclose(l1, ref, rtol=1e-6)
    res, shapes = bdv_info(p)
    assert res.shape[1] == 3 and len(shapes) >= 2
    with h5py.File(p) as f:   # spec group layout
        assert "t00000/s00/0/cells" in f and "s00/resolutions" in f
    # z-range read
    np.testing.assert_array_equal(read_bdv(p, z0=2, nz=3), vol[2:5])


def test_ome_write_read_roundtrip(tmp_path):
    """write_ome_stack stamps a schema-shaped OME-XML document that both the
    Python parser and the native pixel-size fast path read back exactly."""
    from microtipi_tpu.io.ome import ome_xml, parse_ome, read_description, read_ome, write_ome_stack
    from microtipi_tpu.io.tiffstack import read_pixel_size

    vol = _vol((4, 17, 23), seed=5)
    p = tmp_path / "v.ome.tif"
    write_ome_stack(p, vol, dxy=65e-9, dz=150e-9, compression="deflate", name="stack&<7>")
    np.testing.assert_array_equal(read_stack(p), vol)
    meta = read_ome(p)
    assert meta["shape"] == (4, 17, 23)
    assert meta["dtype"] == "float"
    assert meta["name"] == "stack&<7>"  # attribute escaping survives
    np.testing.assert_allclose([meta["dxy"], meta["dz"]], [65e-9, 150e-9], rtol=1e-12)
    # native reader agrees (it is what the CLI geometry resolution uses)
    dxy, dz = read_pixel_size(p)
    np.testing.assert_allclose([dxy, dz], [65e-9, 150e-9], rtol=1e-6)
    # the stored description is well-formed XML with the OME namespace
    import xml.etree.ElementTree as ET

    root = ET.fromstring(read_description(p))
    assert root.tag.endswith("}OME")
    # generator output parses standalone too (no file round-trip needed)
    d = parse_ome(ome_xml((2, 3, 4), dxy=1e-7))
    assert d["shape"] == (2, 3, 4) and d["dz"] is None


def test_ome_absent_returns_none(tmp_path):
    from microtipi_tpu.io.ome import read_ome

    p = tmp_path / "plain.tif"
    write_stack(p, _vol((2, 8, 8)))
    assert read_ome(p) is None


def test_ome_unit_conversion():
    """Non-default OME units (nm) convert to meters on parse."""
    from microtipi_tpu.io.ome import parse_ome

    xml = (
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        '<Image ID="Image:0"><Pixels ID="Pixels:0" DimensionOrder="XYZCT" Type="uint16"'
        ' SizeX="10" SizeY="11" SizeZ="12" SizeC="1" SizeT="1"'
        ' PhysicalSizeX="65" PhysicalSizeXUnit="nm"'
        ' PhysicalSizeZ="0.2"></Pixels></Image></OME>'
    )
    d = parse_ome(xml)
    assert d["shape"] == (12, 11, 10)
    np.testing.assert_allclose(d["dxy"], 65e-9)
    np.testing.assert_allclose(d["dz"], 0.2e-6)  # default unit is micrometer
    assert d["dtype"] == "uint16"


def test_cli_ome_output(tmp_path):
    """psf --ome writes an OME-TIFF whose geometry round-trips."""
    from microtipi_tpu.__main__ import main
    from microtipi_tpu.io.ome import read_ome

    out = tmp_path / "psf.ome.tif"
    main(["psf", str(out), "--shape", "4", "16", "16", "--ome",
          "--dxy", "80e-9", "--dz", "200e-9", "--n-phase", "3"])
    meta = read_ome(out)
    assert meta["shape"] == (4, 16, 16)
    np.testing.assert_allclose([meta["dxy"], meta["dz"]], [80e-9, 200e-9], rtol=1e-12)
