"""Wire-format conformance against spec-derived fixtures (VERDICT r3 #7).

Two directions, both independent of self-roundtrip:

- READERS parse byte streams hand-assembled field-by-field from the specs
  (``tests/fixtures/builders.py`` — stdlib only, no microtipi_tpu import):
  a systematic wire error in the reader (endianness, header field, chunk
  key, codec framing, checksum) fails against the known-good bytes.
- WRITERS' output is decoded by INDEPENDENT minimal parsers written here
  from the same specs (struct/zlib only), asserting the on-disk fields —
  so a writer drift can no longer be masked by the matching reader.

The native TIFF path (``native/stackio.cpp``) reads via libtiff, but its
conventions — page order, float conversion, resolution-unit arithmetic,
ImageJ/OME description parsing — are repo code and are what these pin.
The zarr v2/v3 stores (``io/zarrstack.py``, ``io/zarr3.py``) are fully
from scratch, codecs included.
"""

import json
import os
import struct
import zlib

import numpy as np
import pytest

from fixtures import builders


# ---------------------------------------------------------------------------
# TIFF readers vs hand-assembled fixtures
# ---------------------------------------------------------------------------


def test_classic_tiff_little_endian_float32(tmp_path):
    from microtipi_tpu.io.tiffstack import read_pixel_size, read_stack, stack_info

    rng = np.random.default_rng(0)
    pages = rng.standard_normal((3, 5, 7)).astype(np.float32)
    # 125000 px/cm -> 80 nm pixels (0.01 m / 125000)
    expected = builders.build_tiff_classic(
        tmp_path / "fix.tif", pages, xres=125000.0, res_unit=3)
    assert stack_info(tmp_path / "fix.tif") == (3, 5, 7)
    got = read_stack(tmp_path / "fix.tif")
    np.testing.assert_array_equal(got, expected)
    dxy, dz = read_pixel_size(tmp_path / "fix.tif")
    assert dxy == pytest.approx(80e-9, rel=1e-6)
    assert dz is None


def test_classic_tiff_big_endian_uint16(tmp_path):
    from microtipi_tpu.io.tiffstack import read_stack

    rng = np.random.default_rng(1)
    pages = rng.integers(0, 60000, (2, 4, 6)).astype(np.uint16)
    expected = builders.build_tiff_classic(tmp_path / "be.tif", pages, endian=">")
    got = read_stack(tmp_path / "be.tif")
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, expected)


def test_classic_tiff_partial_read(tmp_path):
    from microtipi_tpu.io.tiffstack import read_stack

    pages = np.arange(4 * 3 * 3, dtype=np.float32).reshape(4, 3, 3)
    builders.build_tiff_classic(tmp_path / "p.tif", pages)
    got = read_stack(tmp_path / "p.tif", z0=1, nz=2)
    np.testing.assert_array_equal(got, pages[1:3])


def test_imagej_description_pixel_size(tmp_path):
    """ImageJ convention: 'spacing' (z step) in 'unit'; lateral size is
    XResolution in pixels per that unit (stackio.cpp parity with Fiji)."""
    from microtipi_tpu.io.tiffstack import read_pixel_size

    pages = np.zeros((2, 4, 4), np.float32)
    desc = "ImageJ=1.54\nimages=2\nslices=2\nspacing=0.25\nunit=micron\n"
    builders.build_tiff_classic(
        tmp_path / "ij.tif", pages, xres=12.5, res_unit=2, description=desc)
    dxy, dz = read_pixel_size(tmp_path / "ij.tif")
    assert dz == pytest.approx(0.25e-6, rel=1e-9)   # spacing * micron
    assert dxy == pytest.approx(1e-6 / 12.5, rel=1e-6)  # unit / XResolution


def test_ome_description_pixel_size(tmp_path):
    from microtipi_tpu.io.tiffstack import read_pixel_size

    pages = np.zeros((1, 4, 4), np.float32)
    builders.build_tiff_classic(
        tmp_path / "ome.tif", pages, description=builders.build_ome_xml())
    dxy, dz = read_pixel_size(tmp_path / "ome.tif")
    assert dxy == pytest.approx(0.0805e-6, rel=1e-9)
    assert dz == pytest.approx(0.25e-6, rel=1e-9)


def test_bigtiff_reader(tmp_path):
    from microtipi_tpu.io.tiffstack import read_stack, stack_info

    rng = np.random.default_rng(2)
    pages = rng.standard_normal((2, 6, 4)).astype(np.float32)
    expected = builders.build_bigtiff(tmp_path / "big.tif", pages)
    assert stack_info(tmp_path / "big.tif") == (2, 6, 4)
    np.testing.assert_array_equal(read_stack(tmp_path / "big.tif"), expected)


# ---------------------------------------------------------------------------
# TIFF writer vs an independent parser
# ---------------------------------------------------------------------------


def _parse_tiff(path):
    """Minimal independent classic/BigTIFF parser (TIFF 6.0 / BigTIFF specs;
    struct only). Returns (magic, [page dicts]) where each page maps tag ->
    list of values (SHORT/LONG/LONG8/RATIONAL/ASCII)."""
    data = open(path, "rb").read()
    end = {b"II": "<", b"MM": ">"}[data[:2]]
    magic = struct.unpack(end + "H", data[2:4])[0]
    if magic == 42:
        off = struct.unpack(end + "I", data[4:8])[0]
        entry_fmt, entry_size, count_size = end + "HHI", 12, 2
        off_size = 4
    elif magic == 43:
        osz, zero = struct.unpack(end + "HH", data[4:8])
        assert osz == 8 and zero == 0, "BigTIFF header constants"
        off = struct.unpack(end + "Q", data[8:16])[0]
        entry_fmt, entry_size, count_size = end + "HHQ", 20, 8
        off_size = 8
    else:
        raise AssertionError(f"bad magic {magic}")

    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 16: 8}
    pages = []
    while off:
        count = struct.unpack(
            end + ("H" if magic == 42 else "Q"),
            data[off:off + count_size])[0]
        tags = {}
        prev_tag = -1
        for i in range(count):
            e = off + count_size + i * entry_size
            tag, typ, n = struct.unpack(
                entry_fmt, data[e:e + struct.calcsize(entry_fmt)])
            assert tag > prev_tag, "IFD entries must be sorted by tag"
            prev_tag = tag
            vfield_off = e + struct.calcsize(entry_fmt)
            vfield = data[vfield_off:vfield_off + (4 if magic == 42 else 8)]
            total = type_size[typ] * n
            if total <= len(vfield):
                payload = vfield[:total]
            else:
                p = struct.unpack(end + ("I" if magic == 42 else "Q"), vfield)[0]
                payload = data[p:p + total]
            if typ == 3:
                vals = list(struct.unpack(end + "H" * n, payload))
            elif typ == 4:
                vals = list(struct.unpack(end + "I" * n, payload))
            elif typ == 16:
                vals = list(struct.unpack(end + "Q" * n, payload))
            elif typ == 5:
                parts = struct.unpack(end + "II" * n, payload)
                vals = [parts[2 * i] / parts[2 * i + 1] for i in range(n)]
            elif typ == 2:
                vals = [payload.rstrip(b"\0").decode(errors="replace")]
            else:
                vals = [payload]
            tags[tag] = vals
        pages.append(tags)
        nxt_off = off + count_size + count * entry_size
        off = struct.unpack(end + ("I" if magic == 42 else "Q"),
                            data[nxt_off:nxt_off + off_size])[0]
    return magic, pages, data, end


def _strip_pixels(tags, data, end, ny, nx):
    offs = tags[builders.TAG_STRIP_OFFSETS]
    cnts = tags[builders.TAG_STRIP_BYTE_COUNTS]
    raw = b"".join(data[o:o + c] for o, c in zip(offs, cnts))
    return np.frombuffer(raw, dtype=end + "f4").reshape(ny, nx)


@pytest.mark.parametrize("bigtiff", [False, True])
def test_write_stack_fields(tmp_path, bigtiff):
    from microtipi_tpu.io.tiffstack import write_stack

    rng = np.random.default_rng(3)
    vol = rng.standard_normal((2, 5, 7)).astype(np.float32)
    path = tmp_path / "out.tif"
    write_stack(path, vol, dxy=80e-9, dz=2e-7, bigtiff=bigtiff)

    magic, pages, data, end = _parse_tiff(path)
    assert magic == (43 if bigtiff else 42)
    assert len(pages) == 2
    for z, tags in enumerate(pages):
        assert tags[builders.TAG_IMAGE_WIDTH] == [7]
        assert tags[builders.TAG_IMAGE_LENGTH] == [5]
        assert tags[builders.TAG_BITS_PER_SAMPLE] == [32]
        assert tags[builders.TAG_SAMPLE_FORMAT] == [3]      # IEEE float
        assert tags[builders.TAG_COMPRESSION] == [1]        # none
        np.testing.assert_array_equal(
            _strip_pixels(tags, data, end, 5, 7), vol[z])
    # Geometry stamp: with no explicit description the writer uses the
    # ImageJ/Fiji convention — ResolutionUnit NONE (1), XResolution in
    # pixels per MICRON, and an ImageJ description carrying unit+spacing;
    # with one, plain TIFF 6.0 resolution (unit cm=3 or inch=2) applies.
    tags0 = pages[0]
    unit = tags0.get(builders.TAG_RESOLUTION_UNIT, [2])[0]
    xres = tags0[builders.TAG_X_RESOLUTION][0]
    if unit == 1:
        desc = tags0[builders.TAG_DESCRIPTION][0]
        assert "ImageJ" in desc and "unit=micron" in desc
        assert 1e-6 / xres == pytest.approx(80e-9, rel=1e-4)
        assert "spacing=0.2" in desc  # dz=2e-7 m = 0.2 micron
    else:
        per_m = {2: 0.0254, 3: 0.01}[unit]
        assert per_m / xres == pytest.approx(80e-9, rel=1e-4)


def test_write_stack_deflate_strips_decode_independently(tmp_path):
    """compression='deflate' chunks must be raw zlib streams (TIFF tag
    Compression=8, Adobe deflate) an external reader can inflate."""
    from microtipi_tpu.io.tiffstack import write_stack

    vol = np.arange(4 * 4, dtype=np.float32).reshape(1, 4, 4)
    path = tmp_path / "z.tif"
    write_stack(path, vol, compression="deflate")
    magic, pages, data, end = _parse_tiff(path)
    tags = pages[0]
    assert tags[builders.TAG_COMPRESSION] == [8]  # COMPRESSION_ADOBE_DEFLATE
    offs = tags[builders.TAG_STRIP_OFFSETS]
    cnts = tags[builders.TAG_STRIP_BYTE_COUNTS]
    rows = tags[builders.TAG_ROWS_PER_STRIP][0]
    out = b"".join(zlib.decompress(data[o:o + c]) for o, c in zip(offs, cnts))
    np.testing.assert_array_equal(
        np.frombuffer(out, end + "f4").reshape(4, 4), vol[0])
    assert rows >= 1


# ---------------------------------------------------------------------------
# zarr v2
# ---------------------------------------------------------------------------


def test_zarr_v2_reader_c_order_zlib(tmp_path):
    from microtipi_tpu.io.zarrstack import read_zarr

    expected = builders.build_zarr_v2(str(tmp_path / "a.zarr"))
    np.testing.assert_array_equal(read_zarr(tmp_path / "a.zarr"), expected)


def test_zarr_v2_reader_f_order_bigendian_raw_fill(tmp_path):
    from microtipi_tpu.io.zarrstack import read_zarr

    expected = builders.build_zarr_v2(
        str(tmp_path / "b.zarr"), order="F", endian=">", compress=False,
        drop_chunk=(1, 1), fill_value=7.0)
    got = read_zarr(tmp_path / "b.zarr")
    np.testing.assert_array_equal(np.asarray(got, "f4"), expected)


def test_zarr_v2_writer_fields(tmp_path):
    from microtipi_tpu.io.zarrstack import write_zarr

    rng = np.random.default_rng(5)
    arr = rng.standard_normal((5, 6)).astype("<f4")
    adir = tmp_path / "w.zarr"
    write_zarr(adir, arr, chunks=(3, 4), compressor="zlib", level=6)

    meta = json.load(open(adir / ".zarray"))
    # Required keys and spec-shaped values (zarr v2 array metadata):
    assert meta["zarr_format"] == 2
    assert meta["shape"] == [5, 6] and meta["chunks"] == [3, 4]
    assert meta["dtype"] == "<f4"
    assert meta["order"] in ("C", "F")
    assert meta["filters"] is None
    assert meta["compressor"]["id"] == "zlib"

    # chunk (1, 1) is an edge chunk: spec requires FULL chunk-shape storage
    raw = zlib.decompress(open(adir / "1.1", "rb").read())
    assert len(raw) == 3 * 4 * 4, "edge chunk must be stored full-size"
    block = np.frombuffer(raw, "<f4").reshape(3, 4, order=meta["order"])
    np.testing.assert_array_equal(block[:2, :2], arr[3:5, 4:6])
    # in-bounds chunk decodes to the exact sub-array
    raw0 = zlib.decompress(open(adir / "0.0", "rb").read())
    np.testing.assert_array_equal(
        np.frombuffer(raw0, "<f4").reshape(3, 4, order=meta["order"]),
        arr[:3, :4])


# ---------------------------------------------------------------------------
# zarr v3
# ---------------------------------------------------------------------------


def test_zarr_v3_reader_gzip_nan_fill(tmp_path):
    from microtipi_tpu.io.zarr3 import read_array

    expected = builders.build_zarr_v3(str(tmp_path / "v3.zarr"))
    got = read_array(str(tmp_path / "v3.zarr"))
    np.testing.assert_array_equal(got, expected)  # NaN == NaN elementwise ok
    assert np.isnan(got[3:, 4:]).all()            # missing chunk -> NaN fill


def test_zarr_v3_reader_crc32c(tmp_path):
    from microtipi_tpu.io.zarr3 import read_array

    expected = builders.build_zarr_v3(str(tmp_path / "crc.zarr"),
                                      with_crc32c=True, fill_value=0.0)
    np.testing.assert_array_equal(read_array(str(tmp_path / "crc.zarr")),
                                  expected)
    # corrupt one payload byte -> the checksum must catch it
    cpath = tmp_path / "crc.zarr" / "c" / "0" / "0"
    buf = bytearray(open(cpath, "rb").read())
    buf[0] ^= 0xFF
    open(cpath, "wb").write(bytes(buf))
    with pytest.raises(ValueError, match="crc32c"):
        read_array(str(tmp_path / "crc.zarr"))


def test_zarr_v3_reader_sharding_indexed(tmp_path):
    from microtipi_tpu.io.zarr3 import read_array

    expected = builders.build_zarr_v3_shard(str(tmp_path / "s.zarr"))
    np.testing.assert_array_equal(read_array(str(tmp_path / "s.zarr")),
                                  expected)


def test_zarr_v3_writer_fields(tmp_path):
    from microtipi_tpu.io.zarr3 import write_array

    rng = np.random.default_rng(6)
    arr = rng.standard_normal((5, 6)).astype("<f4")
    adir = tmp_path / "w3.zarr"
    write_array(str(adir), arr, chunks=(3, 4), compressor="gzip")

    meta = json.load(open(adir / "zarr.json"))
    assert meta["zarr_format"] == 3 and meta["node_type"] == "array"
    assert meta["shape"] == [5, 6]
    assert meta["data_type"] == "float32"
    assert meta["chunk_grid"] == {
        "name": "regular", "configuration": {"chunk_shape": [3, 4]}}
    assert meta["chunk_key_encoding"]["name"] == "default"
    names = [c["name"] for c in meta["codecs"]]
    assert names[0] == "bytes" and "gzip" in names

    # default key encoding: 'c' prefix + '/' separator
    cpath = adir / "c" / "1" / "1"
    assert cpath.exists(), "chunk key must be c/<i>/<j>"
    raw = zlib.decompress(open(cpath, "rb").read(), wbits=31)  # gzip framing
    assert len(raw) == 3 * 4 * 4, "edge chunk stored full-size"
    np.testing.assert_array_equal(
        np.frombuffer(raw, "<f4").reshape(3, 4)[:2, :2], arr[3:5, 4:6])


def test_zarr_v3_writer_shard_decodes_independently(tmp_path):
    """write_array(shard=...) must produce a spec-shaped sharding_indexed
    object: u64 (offset, nbytes) index + crc32c at the END, inner chunks
    decodable by this test's own logic (independent crc32c included)."""
    from microtipi_tpu.io.zarr3 import write_array

    rng = np.random.default_rng(8)
    arr = rng.standard_normal((4, 4)).astype("<f4")
    adir = tmp_path / "ws.zarr"
    write_array(str(adir), arr, chunks=(4, 4), compressor=None, shard=(2, 2))

    meta = json.load(open(adir / "zarr.json"))
    (codec,) = meta["codecs"]
    assert codec["name"] == "sharding_indexed"
    assert codec["configuration"]["chunk_shape"] == [2, 2]

    buf = open(adir / "c" / "0" / "0", "rb").read()
    # index: 2x2 inner grid x (offset, nbytes) u64 pairs + crc32c, at end
    isize = 2 * 2 * 2 * 8 + 4
    idx_raw, crc_stored = buf[-isize:-4], struct.unpack("<I", buf[-4:])[0]
    assert builders.crc32c(idx_raw) == crc_stored
    index = np.frombuffer(idx_raw, "<u8").reshape(2, 2, 2)
    out = np.zeros((4, 4), "<f4")
    for iz in range(2):
        for ix in range(2):
            off, nb = int(index[iz, ix, 0]), int(index[iz, ix, 1])
            assert nb == 2 * 2 * 4
            block = np.frombuffer(buf[off:off + nb], "<f4").reshape(2, 2)
            out[iz * 2:iz * 2 + 2, ix * 2:ix * 2 + 2] = block
    np.testing.assert_array_equal(out, arr)


# ---------------------------------------------------------------------------
# OME-XML
# ---------------------------------------------------------------------------


def test_parse_ome_fixture():
    from microtipi_tpu.io.ome import parse_ome

    meta = parse_ome(builders.build_ome_xml())
    assert meta["shape"] == (4, 8, 16)
    assert meta["size_c"] == 2 and meta["size_t"] == 3
    assert meta["dimension_order"] == "XYZCT"
    assert meta["dtype"] == "float"
    assert meta["dxy"] == pytest.approx(0.0805e-6)
    assert meta["dz"] == pytest.approx(0.25e-6)
    assert [c["name"] for c in meta["channels"]] == ["DAPI", "GFP"]
    assert meta["channels"][0]["emission_wavelength"] == pytest.approx(461e-9)
    assert meta["tiff_data"][0]["plane_count"] == 4 * 2 * 3


def test_ome_xml_writer_fields():
    """The emitted document must carry the schema-required structure the
    wider OME ecosystem (Bio-Formats, Fiji) keys on."""
    import xml.etree.ElementTree as ET

    from microtipi_tpu.io.ome import ome_xml

    xml = ome_xml((4, 8, 16), dxy=80e-9, dz=2e-7, size_c=2, size_t=1,
                  channel_names=["a", "b"])
    root = ET.fromstring(xml)
    ns = root.tag.split("}")[0][1:]
    assert ns == builders.OME_NS  # the 2016-06 schema namespace
    pixels = root.find(f"{{{ns}}}Image/{{{ns}}}Pixels")
    assert pixels is not None
    assert pixels.get("DimensionOrder") == "XYZCT"
    assert pixels.get("Type") == "float"
    assert (pixels.get("SizeX"), pixels.get("SizeY"), pixels.get("SizeZ"),
            pixels.get("SizeC"), pixels.get("SizeT")) == ("16", "8", "4", "2", "1")
    # PhysicalSize in micrometres (the OME default unit): 80 nm -> 0.08
    assert float(pixels.get("PhysicalSizeX")) == pytest.approx(0.08)
    assert float(pixels.get("PhysicalSizeZ")) == pytest.approx(0.2)
    chans = pixels.findall(f"{{{ns}}}Channel")
    assert [c.get("Name") for c in chans] == ["a", "b"]
    td = pixels.find(f"{{{ns}}}TiffData")
    assert td is not None and td.get("PlaneCount") == "8"
