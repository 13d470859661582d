"""Hand-assembled wire-format fixtures, field by field from the specs.

Every builder documents the byte-level provenance of each field it emits
(spec section / page numbers). None of them import ``microtipi_tpu`` — the
point is an implementation INDEPENDENT of the readers/writers under test.

Specs used:

- TIFF 6.0 specification (Adobe, 1992-06-03): header §2 p.13, IFD
  structure §2 p.14-16, field types p.15-16, baseline grayscale required
  tags §4 p.22-26, SampleFormat tag 339 §19 p.80, rational resolution
  tags 282/283/296 p.37-38.
- BigTIFF (Adobe/AWare joint design, ratified by the libtiff project,
  2007): 16-byte header (magic 43, offset-size field 8), IFD8 layout with
  u64 entry counts and 20-byte entries.
- zarr v2 storage spec (zarr-specs v2.0): ``.zarray`` required keys,
  C/F chunk memory layout, "." dimension separator default, edge chunks
  stored at full chunk shape, missing chunk == fill_value.
- zarr v3 core spec (zarr-specs v3.0, approved 2023): ``zarr.json`` node
  metadata, regular chunk grid, "default" chunk-key encoding with "/"
  separator and ``c`` prefix, codec chain (bytes -> bytes->bytes), NaN
  fill-value JSON encoding; sharding_indexed codec spec (ZEP 2): inner
  chunk grid, u64-pair index (offset, nbytes) with 2^64-1 sentinel for
  missing chunks, index codecs ``bytes`` + ``crc32c``, index at shard end.
- crc32c: RFC 3720 §B.4 (iSCSI CRC32C, Castagnoli polynomial 0x11EDC6F41,
  reflected table constant 0x82F63B78, init/final XOR 0xFFFFFFFF).
- OME-XML 2016-06 schema (Open Microscopy Environment): OME/Image/Pixels
  element structure, ``PhysicalSize{X,Y,Z}`` + ``...Unit`` attributes,
  DimensionOrder, per-plane TiffData blocks.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# crc32c — independent implementation straight from RFC 3720 §B.4
# ---------------------------------------------------------------------------

_CRC32C_POLY_REFLECTED = 0x82F63B78  # reflected form of 0x11EDC6F41


def _crc32c_table():
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ _CRC32C_POLY_REFLECTED if c & 1 else c >> 1
        table.append(c)
    return table


_TABLE = _crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# ---------------------------------------------------------------------------
# TIFF 6.0 (classic) — little- and big-endian
# ---------------------------------------------------------------------------

# Field type codes, TIFF 6.0 p.15: BYTE=1, ASCII=2, SHORT=3, LONG=4,
# RATIONAL=5 (two LONGs: numerator, denominator).
_ASCII, _SHORT, _LONG, _RATIONAL = 2, 3, 4, 5

# Tag numbers, TIFF 6.0 §4 (baseline) and §19 (SampleFormat):
TAG_IMAGE_WIDTH = 256
TAG_IMAGE_LENGTH = 257
TAG_BITS_PER_SAMPLE = 258
TAG_COMPRESSION = 259          # 1 = no compression (p.30)
TAG_PHOTOMETRIC = 262          # 1 = BlackIsZero (p.37)
TAG_DESCRIPTION = 270
TAG_STRIP_OFFSETS = 273
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_BYTE_COUNTS = 279
TAG_X_RESOLUTION = 282         # RATIONAL, pixels per ResolutionUnit (p.37)
TAG_Y_RESOLUTION = 283
TAG_RESOLUTION_UNIT = 296      # 2 = inch (default), 3 = centimeter (p.38)
TAG_SAMPLE_FORMAT = 339        # 3 = IEEE floating point (§19 p.80)


def _pack_ifd_classic(end: str, entries, next_ifd: int) -> bytes:
    """One classic IFD: u16 entry count, 12-byte entries sorted by tag
    (required: TIFF 6.0 p.15 'sorted in ascending order by Tag'), u32 next
    IFD offset (0 terminates the chain)."""
    out = struct.pack(end + "H", len(entries))
    for tag, typ, count, value4 in sorted(entries):
        out += struct.pack(end + "HHI", tag, typ, count) + value4
    out += struct.pack(end + "I", next_ifd)
    return out


def _short4(end: str, v: int) -> bytes:
    # Values shorter than 4 bytes are LEFT-justified within the 4-byte value
    # field (TIFF 6.0 p.15) — i.e. they sit in the first bytes in file order.
    return struct.pack(end + "HH", v, 0)


def _long4(end: str, v: int) -> bytes:
    return struct.pack(end + "I", v)


def build_tiff_classic(path: str, pages: np.ndarray, *, endian: str = "<",
                       xres: float | None = None, res_unit: int = 3,
                       description: str | None = None) -> np.ndarray:
    """Minimal classic TIFF: one strip per page, grayscale, no compression.

    ``pages``: (nz, ny, nx) array; float32 -> BitsPerSample 32 +
    SampleFormat 3 (IEEE FP), uint16 -> 16 + 1. ``endian``: "<" writes the
    'II' (little-endian) header, ">" the 'MM' (big-endian) header — sample
    data is byte-swapped to match, as the spec requires a single byte order
    for the whole file (TIFF 6.0 p.13). ``xres`` emits XResolution/
    YResolution RATIONALs (pixels per ResolutionUnit) with
    ``res_unit`` (2 = inch — the spec default — or 3 = centimeter, p.38).
    Returns the expected decoded float32 array for assertions.
    """
    pages = np.asarray(pages)
    nz, ny, nx = pages.shape
    if pages.dtype == np.float32:
        bits, fmt = 32, 3
    elif pages.dtype == np.uint16:
        bits, fmt = 16, 1
    else:
        raise ValueError(pages.dtype)
    end = endian
    order_mark = b"II" if end == "<" else b"MM"

    # --- layout: header | page data | (rationals/description) | IFD chain
    header_size = 8                     # bytes 0-7: order, 42, first IFD offset
    strip_bytes = ny * nx * bits // 8
    data_off = [header_size + z * strip_bytes for z in range(nz)]
    pos = header_size + nz * strip_bytes

    aux = b""
    xres_off = yres_off = desc_off = 0
    if xres is not None:
        # RATIONAL = numerator u32, denominator u32 (TIFF 6.0 p.15); store
        # value*10000/10000 for fractional resolutions.
        xres_off = pos + len(aux)
        aux += struct.pack(end + "II", int(round(xres * 10000)), 10000)
        yres_off = pos + len(aux)
        aux += struct.pack(end + "II", int(round(xres * 10000)), 10000)
    if description is not None:
        raw = description.encode() + b"\0"     # ASCII is NUL-terminated (p.15)
        if len(raw) > 4:
            desc_off = pos + len(aux)
            aux += raw
            if len(aux) % 2:
                aux += b"\0"                   # word-align (p.15 recommends)
    pos += len(aux)

    ifd_offsets = []
    ifd_blobs = []
    for z in range(nz):
        entries = [
            (TAG_IMAGE_WIDTH, _LONG, 1, _long4(end, nx)),
            (TAG_IMAGE_LENGTH, _LONG, 1, _long4(end, ny)),
            (TAG_BITS_PER_SAMPLE, _SHORT, 1, _short4(end, bits)),
            (TAG_COMPRESSION, _SHORT, 1, _short4(end, 1)),
            (TAG_PHOTOMETRIC, _SHORT, 1, _short4(end, 1)),
            (TAG_STRIP_OFFSETS, _LONG, 1, _long4(end, data_off[z])),
            (TAG_ROWS_PER_STRIP, _LONG, 1, _long4(end, ny)),
            (TAG_STRIP_BYTE_COUNTS, _LONG, 1, _long4(end, strip_bytes)),
            (TAG_SAMPLE_FORMAT, _SHORT, 1, _short4(end, fmt)),
        ]
        if xres is not None:
            entries += [
                (TAG_X_RESOLUTION, _RATIONAL, 1, _long4(end, xres_off)),
                (TAG_Y_RESOLUTION, _RATIONAL, 1, _long4(end, yres_off)),
                (TAG_RESOLUTION_UNIT, _SHORT, 1, _short4(end, res_unit)),
            ]
        if description is not None and z == 0:
            raw = description.encode() + b"\0"
            if len(raw) <= 4:
                entries.append((TAG_DESCRIPTION, _ASCII, len(raw),
                                raw + b"\0" * (4 - len(raw))))
            else:
                entries.append((TAG_DESCRIPTION, _ASCII, len(raw),
                                _long4(end, desc_off)))
        blob_len = 2 + 12 * len(entries) + 4
        ifd_offsets.append(pos)
        ifd_blobs.append(entries)
        pos += blob_len

    out = order_mark + struct.pack(end + "HI", 42, ifd_offsets[0])
    swapped = pages.astype(pages.dtype.newbyteorder(end))
    for z in range(nz):
        out += np.ascontiguousarray(swapped[z]).tobytes()
    out += aux
    for z in range(nz):
        nxt = ifd_offsets[z + 1] if z + 1 < nz else 0
        out += _pack_ifd_classic(end, ifd_blobs[z], nxt)

    with open(path, "wb") as fh:
        fh.write(out)
    return pages.astype(np.float32)


def build_bigtiff(path: str, pages: np.ndarray) -> np.ndarray:
    """Minimal little-endian BigTIFF, float32, one strip per page.

    BigTIFF header (16 bytes): 'II', magic 43, offset-byte-size 8,
    constant 0, u64 offset of the first IFD. IFD8: u64 entry count,
    20-byte entries (tag u16, type u16, count u64, value/offset u64),
    u64 next-IFD offset. New types LONG8=16 are used for offsets/counts.
    """
    pages = np.asarray(pages, np.float32)
    nz, ny, nx = pages.shape
    LONG8 = 16
    header_size = 16
    strip_bytes = ny * nx * 4
    data_off = [header_size + z * strip_bytes for z in range(nz)]
    pos = header_size + nz * strip_bytes

    def entry(tag, typ, count, value):
        return struct.pack("<HHQQ", tag, typ, count, value)

    def entry_short(tag, v):
        # value left-justified in the 8-byte field: pack as u16 + padding
        return struct.pack("<HHQHHI", tag, _SHORT, 1, v, 0, 0)

    ifd_offsets = []
    blobs = []
    for z in range(nz):
        entries = [
            entry(TAG_IMAGE_WIDTH, _LONG, 1, nx),
            entry(TAG_IMAGE_LENGTH, _LONG, 1, ny),
            entry_short(TAG_BITS_PER_SAMPLE, 32),
            entry_short(TAG_COMPRESSION, 1),
            entry_short(TAG_PHOTOMETRIC, 1),
            entry(TAG_STRIP_OFFSETS, LONG8, 1, data_off[z]),
            entry(TAG_ROWS_PER_STRIP, _LONG, 1, ny),
            entry(TAG_STRIP_BYTE_COUNTS, LONG8, 1, strip_bytes),
            entry_short(TAG_SAMPLE_FORMAT, 3),
        ]
        entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])
        blob = struct.pack("<Q", len(entries)) + b"".join(entries)
        ifd_offsets.append(pos)
        blobs.append(blob)
        pos += len(blob) + 8  # + u64 next-IFD offset

    out = b"II" + struct.pack("<HHHQ", 43, 8, 0, ifd_offsets[0])
    for z in range(nz):
        out += np.ascontiguousarray(pages[z]).tobytes()
    for z in range(nz):
        nxt = ifd_offsets[z + 1] if z + 1 < nz else 0
        out += blobs[z] + struct.pack("<Q", nxt)

    with open(path, "wb") as fh:
        fh.write(out)
    return pages


# ---------------------------------------------------------------------------
# zarr v2
# ---------------------------------------------------------------------------


def build_zarr_v2(adir: str, *, order: str = "C", endian: str = "<",
                  compress: bool = True, drop_chunk=None,
                  fill_value=0) -> np.ndarray:
    """A (5, 6) float array chunked (3, 4) — exercises edge chunks (stored
    at FULL chunk shape per the v2 spec), C/F memory order, byte order from
    the dtype string, zlib or raw chunks, and missing-chunk fill_value.

    ``drop_chunk``: grid index tuple whose file is omitted (reader must
    substitute ``fill_value``). Returns the expected full array.
    """
    shape, chunks = (5, 6), (3, 4)
    dt = np.dtype(endian + "f4")
    rng = np.random.default_rng(42)
    arr = rng.standard_normal(shape).astype("f4").astype(dt)

    os.makedirs(adir, exist_ok=True)
    meta = {
        # Required .zarray keys per the v2 spec ("Arrays - Metadata"):
        "zarr_format": 2,
        "shape": list(shape),
        "chunks": list(chunks),
        "dtype": dt.str,                      # e.g. "<f4" / ">f4"
        "compressor": {"id": "zlib", "level": 6} if compress else None,
        "fill_value": fill_value,
        "order": order,                       # chunk memory layout
        "filters": None,
    }
    with open(os.path.join(adir, ".zarray"), "w") as fh:
        json.dump(meta, fh)

    expected = np.full(shape, fill_value, "f4")
    for iz in range(2):
        for ix in range(2):
            if drop_chunk == (iz, ix):
                continue
            # v2 spec: every stored chunk has the FULL chunk shape; edge
            # chunks are padded (values beyond the array bounds arbitrary —
            # zeros here) and the reader crops.
            block = np.zeros(chunks, dt)
            sl = (slice(iz * 3, min(iz * 3 + 3, 5)),
                  slice(ix * 4, min(ix * 4 + 4, 6)))
            src = arr[sl]
            block[:src.shape[0], :src.shape[1]] = src
            expected[sl] = src.astype("f4")
            raw = block.tobytes(order=order)
            if compress:
                raw = zlib.compress(raw, 6)
            # default dimension_separator is "." (v2 spec, storage keys)
            with open(os.path.join(adir, f"{iz}.{ix}"), "wb") as fh:
                fh.write(raw)
    return expected


# ---------------------------------------------------------------------------
# zarr v3
# ---------------------------------------------------------------------------


def _v3_meta(shape, chunk_shape, codecs, fill_value, sep="/"):
    # Required zarr.json members per the v3 core spec §Array metadata.
    return {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(shape),
        "data_type": "float32",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": list(chunk_shape)}},
        "chunk_key_encoding": {"name": "default",
                               "configuration": {"separator": sep}},
        "fill_value": fill_value,
        "codecs": codecs,
    }


def build_zarr_v3(adir: str, *, with_crc32c: bool = False,
                  fill_value="NaN") -> np.ndarray:
    """A (5, 6) float32 v3 array chunked (3, 4): gzip bytes->bytes codec,
    default ('c/'-prefixed, '/'-separated) chunk keys, one chunk missing
    (-> fill), optional trailing crc32c codec (checksum computed by the
    independent RFC 3720 implementation above), NaN fill encoded as the
    JSON string "NaN" per the v3 fill-value rules."""
    shape, chunks = (5, 6), (3, 4)
    rng = np.random.default_rng(7)
    arr = rng.standard_normal(shape).astype("<f4")

    codecs = [{"name": "bytes", "configuration": {"endian": "little"}},
              {"name": "gzip", "configuration": {"level": 5}}]
    if with_crc32c:
        codecs.append({"name": "crc32c"})

    os.makedirs(os.path.join(adir, "c"), exist_ok=True)
    with open(os.path.join(adir, "zarr.json"), "w") as fh:
        json.dump(_v3_meta(shape, chunks, codecs, fill_value), fh)

    fill = np.float32("nan") if fill_value == "NaN" else np.float32(fill_value)
    expected = np.full(shape, fill, "f4")
    for iz in range(2):
        for ix in range(2):
            if (iz, ix) == (1, 1):
                continue  # missing chunk -> fill_value
            block = np.zeros(chunks, "<f4")
            sl = (slice(iz * 3, min(iz * 3 + 3, 5)),
                  slice(ix * 4, min(ix * 4 + 4, 6)))
            src = arr[sl]
            block[:src.shape[0], :src.shape[1]] = src
            expected[sl] = src
            buf = block.tobytes()          # "bytes" codec, little endian
            co = zlib.compressobj(5, zlib.DEFLATED, 31)  # gzip framing
            buf = co.compress(buf) + co.flush()
            if with_crc32c:
                buf += struct.pack("<I", crc32c(buf))
            os.makedirs(os.path.join(adir, "c", str(iz)), exist_ok=True)
            with open(os.path.join(adir, "c", str(iz), str(ix)), "wb") as fh:
                fh.write(buf)
    return expected


def build_zarr_v3_shard(adir: str) -> np.ndarray:
    """A (4, 4) float32 array stored as ONE (4, 4) shard of (2, 2) inner
    chunks via the sharding_indexed codec (ZEP 2): inner chunks encoded
    with the bytes codec, index = u64 (offset, nbytes) pairs on the inner
    grid + crc32c, located at the shard END; one inner chunk omitted with
    the 2^64-1/2^64-1 sentinel (-> fill_value 0)."""
    shape = (4, 4)
    rng = np.random.default_rng(3)
    arr = rng.standard_normal(shape).astype("<f4")
    missing = (1, 0)  # inner-grid index of the omitted chunk
    expected = arr.copy()
    expected[2:4, 0:2] = 0.0  # fill_value

    codecs = [{
        "name": "sharding_indexed",
        "configuration": {
            "chunk_shape": [2, 2],
            "codecs": [{"name": "bytes",
                        "configuration": {"endian": "little"}}],
            "index_codecs": [
                {"name": "bytes", "configuration": {"endian": "little"}},
                {"name": "crc32c"},
            ],
            "index_location": "end",
        },
    }]
    os.makedirs(os.path.join(adir, "c", "0"), exist_ok=True)
    with open(os.path.join(adir, "zarr.json"), "w") as fh:
        json.dump(_v3_meta(shape, shape, codecs, 0.0), fh)

    body = b""
    index = np.full((2, 2, 2), (1 << 64) - 1, "<u8")  # sentinel everywhere
    for iz in range(2):
        for ix in range(2):
            if (iz, ix) == missing:
                continue
            block = np.ascontiguousarray(
                arr[iz * 2:iz * 2 + 2, ix * 2:ix * 2 + 2])
            enc = block.tobytes()
            index[iz, ix] = (len(body), len(enc))
            body += enc
    idx_bytes = index.tobytes()
    idx_bytes += struct.pack("<I", crc32c(idx_bytes))
    with open(os.path.join(adir, "c", "0", "0"), "wb") as fh:
        fh.write(body + idx_bytes)  # index at shard end
    return expected


# ---------------------------------------------------------------------------
# OME-XML 2016-06
# ---------------------------------------------------------------------------

OME_NS = "http://www.openmicroscopy.org/Schemas/OME/2016-06"


def build_ome_xml(nz=4, ny=8, nx=16, nc=2, nt=3,
                  phys_x_um=0.0805, phys_z_um=0.25) -> str:
    """A minimal OME 2016-06 document written from the schema docs (not via
    the package's emitter): OME/Image/Pixels with DimensionOrder XYZCT,
    Type float, sizes, PhysicalSize{X,Y,Z} + micrometre units, two named
    channels, and one TiffData block covering all planes."""
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<OME xmlns="{OME_NS}">'
        '<Image ID="Image:0" Name="fixture">'
        '<Pixels ID="Pixels:0" DimensionOrder="XYZCT" Type="float"'
        f' SizeX="{nx}" SizeY="{ny}" SizeZ="{nz}" SizeC="{nc}" SizeT="{nt}"'
        ' BigEndian="false"'
        f' PhysicalSizeX="{phys_x_um}" PhysicalSizeXUnit="µm"'
        f' PhysicalSizeY="{phys_x_um}" PhysicalSizeYUnit="µm"'
        f' PhysicalSizeZ="{phys_z_um}" PhysicalSizeZUnit="µm">'
        '<Channel ID="Channel:0:0" Name="DAPI" SamplesPerPixel="1"'
        ' EmissionWavelength="461" EmissionWavelengthUnit="nm"/>'
        '<Channel ID="Channel:0:1" Name="GFP" SamplesPerPixel="1"'
        ' EmissionWavelength="509" EmissionWavelengthUnit="nm"/>'
        f'<TiffData IFD="0" PlaneCount="{nz * nc * nt}"/>'
        '</Pixels></Image></OME>'
    )
