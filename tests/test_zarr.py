"""zarr v2 / OME-NGFF store: round-trips, format corners, CLI dispatch.

The store is implemented from scratch on the stdlib (io/zarrstack.py), so
these tests pin the v2 container format itself: chunk grids with full-size
edge chunks, fill_value for missing chunks, C/F chunk order, null/zlib/gzip
compressors, dimension separators, NGFF multiscales axes/scale handling.
"""

import json
import os
import subprocess
import sys
import zlib

import numpy as np
import pytest

from microtipi_tpu.io.zarrstack import (
    is_zarr,
    read_ngff_hyperstack,
    read_ngff_metadata_only,
    read_pixel_size,
    read_zarr,
    write_ngff_hyperstack,
    write_zarr,
    zarr_info,
)


def test_zarr_roundtrip_compressors(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(5, 12, 17)).astype(np.float32)
    for comp in (None, "zlib", "gzip"):
        p = tmp_path / f"a_{comp}.zarr"
        write_zarr(p, arr, chunks=(2, 5, 9), compressor=comp)
        np.testing.assert_array_equal(read_zarr(p), arr)
        meta = json.loads((p / ".zarray").read_text())
        assert meta["zarr_format"] == 2
        assert (meta["compressor"] is None) == (comp is None)


def test_zarr_edge_chunks_stored_full_size(tmp_path):
    """v2 stores edge chunks at the full chunk shape (zero-padded)."""
    arr = np.arange(7 * 5, dtype=np.int32).reshape(7, 5)
    p = tmp_path / "e.zarr"
    write_zarr(p, arr, chunks=(4, 4), compressor=None)
    raw = (p / "1.1").read_bytes()
    assert len(raw) == 4 * 4 * 4  # full chunk, not 3x1
    np.testing.assert_array_equal(read_zarr(p), arr)


def test_zarr_missing_chunk_reads_fill_value(tmp_path):
    arr = np.ones((4, 4), np.float32)
    p = tmp_path / "m.zarr"
    write_zarr(p, arr, chunks=(2, 2), compressor=None)
    os.remove(p / "1.0")
    out = read_zarr(p)
    assert out[:2].sum() == 8.0
    assert out[2:, :2].sum() == 0.0  # fill_value = 0
    assert out[2:, 2:].sum() == 4.0


def test_zarr_foreign_writer_conventions(tmp_path):
    """Read a store laid out the way other writers commonly do it:
    F order, '/' dimension separator, big-endian dtype, nonzero fill."""
    p = tmp_path / "f.zarr"
    os.makedirs(p)
    arr = np.arange(6 * 4, dtype=">u2").reshape(6, 4)
    chunks = (3, 4)
    meta = {
        "zarr_format": 2, "shape": [6, 4], "chunks": list(chunks),
        "dtype": ">u2", "compressor": {"id": "zlib", "level": 5},
        "fill_value": 7, "order": "F", "filters": None,
        "dimension_separator": "/",
    }
    (p / ".zarray").write_text(json.dumps(meta))
    os.makedirs(p / "0")
    # write only the first chunk row; second is missing -> fill 7
    block = np.asfortranarray(arr[:3])
    (p / "0" / "0").write_bytes(zlib.compress(block.tobytes(order="F")))
    out = read_zarr(p)
    np.testing.assert_array_equal(out[:3], arr[:3])
    assert (out[3:] == 7).all()


def test_zarr_unsupported_compressor_is_a_clear_error(tmp_path):
    p = tmp_path / "b.zarr"
    os.makedirs(p)
    meta = {"zarr_format": 2, "shape": [2], "chunks": [2], "dtype": "<f4",
            "compressor": {"id": "zfp", "mode": "a"}, "fill_value": 0,
            "order": "C", "filters": None}
    (p / ".zarray").write_text(json.dumps(meta))
    (p / "0").write_bytes(b"xx")
    with pytest.raises(ValueError, match="zfp"):
        read_zarr(p)


def test_zarr_corrupt_blosc_chunk_is_a_clear_error(tmp_path):
    p = tmp_path / "b.zarr"
    os.makedirs(p)
    meta = {"zarr_format": 2, "shape": [2], "chunks": [2], "dtype": "<f4",
            "compressor": {"id": "blosc", "cname": "lz4"}, "fill_value": 0,
            "order": "C", "filters": None}
    (p / ".zarray").write_text(json.dumps(meta))
    (p / "0").write_bytes(b"xx")  # truncated container
    with pytest.raises(ValueError, match="blosc"):
        read_zarr(p)


def test_ngff_hyperstack_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(2, 3, 4, 8, 8)).astype(np.float32)
    p = tmp_path / "h.zarr"
    channels = [
        {"name": "GFP", "emission_wavelength": 510e-9},
        {"name": "RFP", "emission_wavelength": 610e-9},
        {"name": "DAPI", "emission_wavelength": 461e-9},
    ]
    write_ngff_hyperstack(p, arr, dxy=65e-9, dz=200e-9, channels=channels)
    out, meta = read_ngff_hyperstack(p)
    np.testing.assert_allclose(out, arr, rtol=1e-7)
    assert meta["dxy"] == pytest.approx(65e-9)
    assert meta["dz"] == pytest.approx(200e-9)
    assert [c["name"] for c in meta["channels"]] == ["GFP", "RFP", "DAPI"]
    assert meta["channels"][1]["emission_wavelength"] == pytest.approx(610e-9)
    # metadata-only path agrees without decoding chunks
    shape, meta2 = read_ngff_metadata_only(p)
    assert shape == (2, 3, 4, 8, 8)
    assert read_pixel_size(p) == (pytest.approx(65e-9), pytest.approx(200e-9))
    assert "T=2 C=3" in zarr_info(p)


def test_ngff_3d_volume_and_axes_subset(tmp_path):
    """A 3D write round-trips with singleton T/C; a foreign zyx-axes image
    reads with the right scale mapping."""
    vol = np.random.default_rng(2).normal(size=(3, 6, 6)).astype(np.float32)
    p = tmp_path / "v.zarr"
    write_ngff_hyperstack(p, vol, dxy=100e-9, dz=300e-9)
    out, meta = read_ngff_hyperstack(p)
    assert out.shape == (1, 1, 3, 6, 6)
    np.testing.assert_allclose(out[0, 0], vol, rtol=1e-7)

    # foreign: 3-axis NGFF (z, y, x) written by hand
    q = tmp_path / "w.zarr"
    os.makedirs(q)
    (q / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    attrs = {"multiscales": [{
        "version": "0.4",
        "axes": [{"name": "z", "type": "space"}, {"name": "y", "type": "space"},
                 {"name": "x", "type": "space"}],
        "datasets": [{"path": "s0", "coordinateTransformations": [
            {"type": "scale", "scale": [0.25, 0.1, 0.1]}]}],
    }]}
    (q / ".zattrs").write_text(json.dumps(attrs))
    write_zarr(q / "s0", vol)
    out2, meta2 = read_ngff_hyperstack(q)
    assert out2.shape == (1, 1, 3, 6, 6)
    assert meta2["dz"] == pytest.approx(0.25e-6)
    assert meta2["dxy"] == pytest.approx(0.1e-6)
    assert is_zarr(q)


def _run(argv, cwd):
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    return subprocess.run([sys.executable, "-m", "microtipi_tpu", *argv],
                          cwd=cwd, env=env, capture_output=True, text=True)


def test_cli_zarr_in_zarr_out(tmp_path):
    """deconv reads an NGFF input (geometry from the scale transform) and
    writes an NGFF output; info prints the hyperstack line."""
    import jax.numpy as jnp

    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
    from microtipi_tpu.io.tiffstack import write_stack

    shape = (8, 16, 16)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, dtype=jnp.float32)
    psf = model.compute_psf(model.init_params())
    rng = np.random.default_rng(0)
    obj = np.abs(rng.standard_normal(shape)).astype(np.float32) * 10
    data = np.asarray(convolve(jnp.asarray(obj), convolve_spectrum(psf), shape))
    write_ngff_hyperstack(tmp_path / "d.zarr", data, dxy=100e-9, dz=250e-9)
    write_stack(tmp_path / "psf.tif", np.asarray(psf))

    r = _run(["info", "d.zarr"], tmp_path)
    assert r.returncode == 0 and "OME-NGFF" in r.stdout
    assert "dxy = 100 nm" in r.stdout  # geometry from the NGFF scale transform

    r = _run(["deconv", "d.zarr", "--psf", "psf.tif", "--out", "o.zarr",
              "--iters", "5", "--mu", "1e-3", "--zarr-levels", "3"], tmp_path)
    assert r.returncode == 0, r.stderr
    out, meta = read_ngff_hyperstack(tmp_path / "o.zarr")
    assert out.shape == (1, 1, *shape)
    assert np.isfinite(out).all()
    assert meta["dxy"] == pytest.approx(100e-9)
    # --zarr-levels wrote the viewer pyramid
    attrs = json.loads((tmp_path / "o.zarr" / ".zattrs").read_text())
    assert [d["path"] for d in attrs["multiscales"][0]["datasets"]] == ["0", "1", "2"]
    assert read_zarr(tmp_path / "o.zarr" / "2").shape == (1, 1, 2, 4, 4)


def test_zarr_roundtrip_fuzz(tmp_path):
    """Randomized shapes x chunk grids x dtypes x codecs round-trip exactly
    (the store is hand-rolled — pin the format corners broadly)."""
    rng = np.random.default_rng(0)
    dtypes = ["<f4", "<f8", "<u2", "<i4", ">f4"]
    for trial in range(12):
        ndim = int(rng.integers(1, 5))
        shape = tuple(int(rng.integers(1, 9)) for _ in range(ndim))
        chunks = tuple(int(rng.integers(1, s + 3)) for s in shape)
        dt = np.dtype(dtypes[trial % len(dtypes)])
        if dt.kind == "f":
            arr = rng.normal(size=shape).astype(dt)
        else:
            arr = rng.integers(0, 1000, size=shape).astype(dt)
        comp = [None, "zlib", "gzip"][trial % 3]
        p = tmp_path / f"t{trial}.zarr"
        write_zarr(p, arr, chunks=chunks, compressor=comp)
        out = read_zarr(p)
        assert out.dtype == dt
        np.testing.assert_array_equal(out, arr)


# ---------------------------------------------------------------------------
# compression codecs: blosc / zstd / lz4 (io/codecs.py, system C libraries
# with a pure-Python blosc+lz4 fallback decoder)
# ---------------------------------------------------------------------------


def test_zarr_blosc_zstd_lz4_roundtrip(tmp_path):
    from microtipi_tpu.io import codecs

    if not codecs.have_blosc_lib():
        pytest.skip("libblosc not present")
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(5, 12, 17)).astype(np.float32)
    comps = ["blosc", "zstd", "lz4",
             {"id": "blosc", "cname": "zstd", "clevel": 3, "shuffle": 2,
              "blocksize": 0},
             {"id": "blosc", "cname": "blosclz", "clevel": 9, "shuffle": 0,
              "blocksize": 0}]
    for i, comp in enumerate(comps):
        p = tmp_path / f"c{i}.zarr"
        write_zarr(p, arr, chunks=(2, 5, 9), compressor=comp)
        np.testing.assert_array_equal(read_zarr(p), arr)


def test_blosc_python_decoder_matches_libblosc():
    """The pure-Python blosc decoder (used when libblosc is absent) decodes
    libblosc-compressed containers bit-exactly for the lz4/lz4hc/zlib inner
    codecs, with and without byte shuffle, across the split-block regimes."""
    from microtipi_tpu.io import codecs

    if not codecs.have_blosc_lib():
        pytest.skip("libblosc not present")
    rng = np.random.default_rng(2)
    for cname in ("lz4", "lz4hc", "zlib"):
        for shuffle in (0, 1):
            for typesize in (1, 4, 8):
                for n in (0, 1, 100, 4096, 100_000):
                    raw = (np.arange(n, dtype=np.uint8) // 7
                           + rng.integers(0, 3, n, dtype=np.uint8)).tobytes()
                    comp = codecs.blosc_compress(
                        raw, typesize=typesize, cname=cname, clevel=5,
                        shuffle=shuffle)
                    assert codecs._blosc_decompress_py(comp) == raw, (
                        cname, shuffle, typesize, n)
    # incompressible data exercises the memcpy fast path
    raw = rng.bytes(70_000)
    comp = codecs.blosc_compress(raw, typesize=4, cname="lz4", shuffle=1)
    assert codecs._blosc_decompress_py(comp) == raw
    # numcodecs lz4 framing decodes without liblz4 too
    framed = codecs.lz4_compress(b"abc" * 1000)
    assert codecs._lz4_block_decompress_py(framed[4:], 3000) == b"abc" * 1000


# ---------------------------------------------------------------------------
# zarr v3 (io/zarr3.py)
# ---------------------------------------------------------------------------


def test_zarr3_roundtrip_compressors_and_sharding(tmp_path):
    rng = np.random.default_rng(3)
    arr = rng.normal(size=(9, 17, 23)).astype(np.float32)
    for comp in (None, "gzip", "zstd", "blosc"):
        for shard in (None, (2, 8, 8)):
            p = tmp_path / f"v3_{comp}_{bool(shard)}.zarr"
            write_zarr(p, arr, chunks=(4, 9, 12), compressor=comp,
                       zarr_format=3, shard=shard)
            meta = json.loads((p / "zarr.json").read_text())
            assert meta["zarr_format"] == 3
            if shard:
                assert meta["codecs"][0]["name"] == "sharding_indexed"
            np.testing.assert_array_equal(read_zarr(p), arr)


def test_zarr3_dtypes_and_missing_chunk_fill(tmp_path):
    rng = np.random.default_rng(4)
    for dt in ("uint16", "int32", "float64", "complex64", "bool"):
        arr = (rng.normal(size=(4, 5, 6)) * 10).astype(dt)
        p = tmp_path / f"dt_{dt}.zarr"
        write_zarr(p, arr, compressor="zstd", zarr_format=3)
        out = read_zarr(p)
        assert out.dtype == np.dtype(dt)
        np.testing.assert_array_equal(out, arr)
    # missing chunk -> fill_value, incl. the "NaN" JSON spelling
    p = tmp_path / "fill.zarr"
    write_zarr(p, np.ones((4, 4), np.float32), chunks=(2, 2),
               compressor=None, zarr_format=3)
    meta = json.loads((p / "zarr.json").read_text())
    meta["fill_value"] = "NaN"
    (p / "zarr.json").write_text(json.dumps(meta))
    os.remove(p / "c" / "0" / "0")
    out = read_zarr(p)
    assert np.isnan(out[:2, :2]).all() and (out[2:, 2:] == 1).all()


def test_zarr3_foreign_writer_conventions(tmp_path):
    """v2 chunk-key encoding, transpose codec, crc32c verification — the
    corners another writer may emit."""
    from microtipi_tpu.io import zarr3

    # crc32c known-answer (RFC 3720 test vector)
    assert zarr3.crc32c(b"123456789") == 0xE3069283

    blk = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
    p = tmp_path / "t.zarr"
    os.makedirs(p)
    codecs_list = [
        {"name": "transpose", "configuration": {"order": [2, 0, 1]}},
        {"name": "bytes", "configuration": {"endian": "big"}},
        {"name": "crc32c"},
        {"name": "gzip", "configuration": {"level": 1}},
    ]
    meta = {
        "zarr_format": 3, "node_type": "array", "shape": [2, 3, 4],
        "data_type": "uint8",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": [2, 3, 4]}},
        "chunk_key_encoding": {"name": "v2", "configuration":
                               {"separator": "."}},
        "fill_value": 0, "codecs": codecs_list,
    }
    (p / "zarr.json").write_text(json.dumps(meta))
    enc = zarr3._encode_chunk(blk, codecs_list, np.dtype(np.uint8))
    (p / "0.0.0").write_bytes(enc)
    np.testing.assert_array_equal(read_zarr(p), blk)

    # corrupting one byte must trip the crc32c check
    bad = bytearray(enc)
    import zlib as _zlib
    body = bytearray(_zlib.decompress(bytes(bad), wbits=31))
    body[0] ^= 0xFF
    co = _zlib.compressobj(1, _zlib.DEFLATED, 31)
    (p / "0.0.0").write_bytes(co.compress(bytes(body)) + co.flush())
    with pytest.raises(ValueError, match="crc32c"):
        read_zarr(p)


def test_ngff_05_hyperstack_roundtrip(tmp_path):
    """OME-NGFF 0.5 (zarr v3): attributes under the group's ``ome`` key,
    metadata (pixel sizes, channels) round-trips like 0.4."""
    rng = np.random.default_rng(5)
    hyp = rng.normal(size=(2, 3, 4, 17, 19)).astype(np.float32)
    p = tmp_path / "ngff5.zarr"
    write_ngff_hyperstack(
        p, hyp, dxy=65e-9, dz=200e-9,
        channels=[{"name": f"ch{i}", "emission_wavelength": 510e-9}
                  for i in range(3)],
        zarr_format=3, compressor="zstd", shard=(1, 1, 2, 8, 8))
    gmeta = json.loads((p / "zarr.json").read_text())
    assert gmeta["attributes"]["ome"]["version"] == "0.5"
    arr, meta = read_ngff_hyperstack(p)
    np.testing.assert_allclose(arr, hyp)
    assert meta["dxy"] == pytest.approx(65e-9)
    assert meta["dz"] == pytest.approx(200e-9)
    assert meta["channels"][1]["name"] == "ch1"
    assert meta["channels"][1]["emission_wavelength"] == pytest.approx(510e-9)
    assert "OME-NGFF" in zarr_info(p)
    shape, _ = read_ngff_metadata_only(p)
    assert shape == (2, 3, 4, 17, 19)
    assert read_pixel_size(p) == (pytest.approx(65e-9), pytest.approx(200e-9))


def test_zarr3_roundtrip_fuzz(tmp_path):
    """Randomized shapes x chunks x shards x dtypes x codecs round-trip
    exactly through the v3 store (hand-rolled format — pin corners broadly,
    mirroring the v2 fuzz above)."""
    rng = np.random.default_rng(9)
    dtypes = ["<f4", "<f8", "<u2", "<i4", ">f4", "<c8"]
    comps = [None, "gzip", "zstd", "blosc"]
    for trial in range(12):
        ndim = int(rng.integers(1, 5))
        shape = tuple(int(rng.integers(1, 9)) for _ in range(ndim))
        chunks = tuple(int(rng.integers(1, s + 3)) for s in shape)
        dt = np.dtype(dtypes[trial % len(dtypes)])
        if dt.kind == "f":
            arr = rng.normal(size=shape).astype(dt)
        elif dt.kind == "c":
            arr = (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(dt)
        else:
            arr = rng.integers(0, 1000, size=shape).astype(dt)
        shard = None
        if trial % 3 == 0:  # every third trial stores sharded
            shard = tuple(max(1, c // 2) for c in chunks)
        p = tmp_path / f"t{trial}.zarr"
        write_zarr(p, arr, chunks=chunks, compressor=comps[trial % len(comps)],
                   zarr_format=3, shard=shard)
        out = read_zarr(p)
        assert out.dtype.kind == dt.kind and out.dtype.itemsize == dt.itemsize
        np.testing.assert_array_equal(out, arr)


def test_ngff_multiscale_pyramid(tmp_path):
    """levels > 1 writes a 2x mean-downsampled NGFF pyramid: datasets 0..L-1,
    per-level doubled scale transforms, exact level-0 round-trip, thin axes
    stop halving at extent 1."""
    rng = np.random.default_rng(2)
    arr = rng.normal(size=(1, 1, 4, 32, 32)).astype(np.float32)
    for fmt in (2, 3):
        p = tmp_path / f"pyr_v{fmt}.zarr"
        write_ngff_hyperstack(p, arr, dxy=100e-9, dz=300e-9,
                              zarr_format=fmt, levels=4)
        # full-res round-trip unchanged
        out, meta = read_ngff_hyperstack(p)
        np.testing.assert_allclose(out, arr, rtol=1e-7)
        assert meta["dxy"] == pytest.approx(100e-9)
        # levels on disk: 4 requested; z stops halving at 1 (4->2->1)
        import json as _json
        import os as _os

        if fmt == 2:
            attrs = _json.loads((p / ".zattrs").read_text())
        else:
            attrs = _json.loads((p / "zarr.json").read_text())["attributes"]["ome"]
        ds = attrs["multiscales"][0]["datasets"]
        assert [d["path"] for d in ds] == ["0", "1", "2", "3"]
        scales = [d["coordinateTransformations"][0]["scale"] for d in ds]
        np.testing.assert_allclose(scales[0][2:], [0.3, 0.1, 0.1])
        np.testing.assert_allclose(scales[1][2:], [0.6, 0.2, 0.2])
        np.testing.assert_allclose(scales[2][2:], [1.2, 0.4, 0.4])
        # z exhausted at extent 1
        np.testing.assert_allclose(scales[3][2:], [1.2, 0.8, 0.8])
        # level data: 2x mean over spatial axes, shapes halve
        lv1 = read_zarr(p / "1")
        assert lv1.shape == (1, 1, 2, 16, 16)
        manual = arr.reshape(1, 1, 2, 2, 16, 2, 16, 2).mean(axis=(3, 5, 7))
        np.testing.assert_allclose(lv1, manual, rtol=1e-5, atol=1e-6)
        lv3 = read_zarr(p / "3")
        assert lv3.shape == (1, 1, 1, 4, 4)


def test_ngff_pyramid_stops_when_exhausted(tmp_path):
    """A volume too small to halve writes a single level no matter the ask."""
    arr = np.ones((1, 1, 1, 1, 1), np.float32)
    p = tmp_path / "tiny.zarr"
    write_ngff_hyperstack(p, arr, levels=5)
    import json as _json

    attrs = _json.loads((p / ".zattrs").read_text())
    assert len(attrs["multiscales"][0]["datasets"]) == 1
