"""Compression codecs for the zarr stores: blosc, zstd, lz4.

The reference ecosystem's cloud-native side (zarr v2 via numcodecs, zarr v3)
defaults to blosc(lz4, shuffle) chunks; plain zstd and the numcodecs lz4
framing are the other common choices. No ``numcodecs``/``zstandard``/``lz4``
Python packages ship in this environment, but the system carries the C
libraries (``libblosc.so.1`` 1.21, ``libzstd.so.1``, ``liblz4.so.1``), so the
primary path binds them with ``ctypes`` — spec-compliant by construction.

A pure-Python fallback decoder for the blosc container (inner codecs lz4 and
zlib, byte-shuffle filter) keeps reads working even without the shared
libraries; it is tested against libblosc output. Compression always requires
the libraries (there is no reason to hand-roll an encoder when decode-anywhere
is the portability goal).

Reference provenance: the reference (jplumail/microTiPi) has no IO layer at
all — data enters as TiPi ShapedArrays from the host GUI (see
microscopy/PSF_Estimation.java:316-330 setters). The rebuild owns ingestion,
and blosc-compressed NGFF is what today's microscopy pipelines emit.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct
import zlib

import numpy as np

__all__ = [
    "have_blosc_lib",
    "have_zstd_lib",
    "have_lz4_lib",
    "blosc_compress",
    "blosc_decompress",
    "zstd_compress",
    "zstd_decompress",
    "lz4_compress",
    "lz4_decompress",
]


def _load(*names):
    for n in names:
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    return None


_blosc = _load("libblosc.so.1", "libblosc.so", "libblosc.dylib")
_zstd = _load("libzstd.so.1", "libzstd.so", "libzstd.dylib")
_lz4 = _load("liblz4.so.1", "liblz4.so", "liblz4.dylib")

if _blosc is not None:
    _blosc.blosc_compress_ctx.restype = ctypes.c_int
    _blosc.blosc_compress_ctx.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_size_t, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_char_p,
        ctypes.c_size_t, ctypes.c_int,
    ]
    _blosc.blosc_decompress_ctx.restype = ctypes.c_int
    _blosc.blosc_decompress_ctx.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int,
    ]
    _blosc.blosc_cbuffer_validate.restype = ctypes.c_int
    _blosc.blosc_cbuffer_validate.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t),
    ]

if _zstd is not None:
    _zstd.ZSTD_compressBound.restype = ctypes.c_size_t
    _zstd.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
    _zstd.ZSTD_compress.restype = ctypes.c_size_t
    _zstd.ZSTD_compress.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_int,
    ]
    _zstd.ZSTD_decompress.restype = ctypes.c_size_t
    _zstd.ZSTD_decompress.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
    ]
    _zstd.ZSTD_isError.restype = ctypes.c_uint
    _zstd.ZSTD_isError.argtypes = [ctypes.c_size_t]
    _zstd.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
    _zstd.ZSTD_getFrameContentSize.argtypes = [ctypes.c_void_p, ctypes.c_size_t]

if _lz4 is not None:
    _lz4.LZ4_compressBound.restype = ctypes.c_int
    _lz4.LZ4_compressBound.argtypes = [ctypes.c_int]
    _lz4.LZ4_compress_default.restype = ctypes.c_int
    _lz4.LZ4_compress_default.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    _lz4.LZ4_decompress_safe.restype = ctypes.c_int
    _lz4.LZ4_decompress_safe.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]


def have_blosc_lib() -> bool:
    return _blosc is not None


def have_zstd_lib() -> bool:
    return _zstd is not None


def have_lz4_lib() -> bool:
    return _lz4 is not None


# ---------------------------------------------------------------------------
# blosc container
# ---------------------------------------------------------------------------

#: numcodecs shuffle constants: 0 noshuffle, 1 byte shuffle, 2 bitshuffle,
#: -1 auto (bitshuffle for 1-byte items, byte shuffle otherwise).
_BLOSC_CODECS = ("blosclz", "lz4", "lz4hc", "snappy", "zlib", "zstd")


def blosc_compress(data, typesize: int = 1, cname: str = "lz4",
                   clevel: int = 5, shuffle: int = 1, blocksize: int = 0) -> bytes:
    """Compress ``data`` into a blosc1 container (numcodecs.Blosc semantics)."""
    if _blosc is None:
        raise RuntimeError(
            "blosc compression needs libblosc (not found); write with "
            "compressor='zlib' instead"
        )
    if cname not in _BLOSC_CODECS:
        raise ValueError(f"unknown blosc cname {cname!r}")
    data = bytes(data) if not isinstance(data, (bytes, bytearray, memoryview)) else data
    src = (ctypes.c_char * len(data)).from_buffer_copy(data)
    n = len(data)
    typesize = max(1, int(typesize))
    if shuffle == -1:  # numcodecs AUTOSHUFFLE
        shuffle = 2 if typesize == 1 else 1
    dest = ctypes.create_string_buffer(n + 16 + 4096)
    rc = _blosc.blosc_compress_ctx(
        int(clevel), int(shuffle), typesize, n, src, dest, len(dest),
        cname.encode(), int(blocksize), 1,
    )
    if rc <= 0:
        raise RuntimeError(f"blosc_compress_ctx failed (rc={rc})")
    return dest.raw[:rc]


def blosc_decompress(buf) -> bytes:
    """Decompress a blosc1 container (libblosc, else the Python decoder)."""
    buf = bytes(buf)
    if len(buf) < 16:
        raise ValueError("truncated blosc buffer")
    nbytes = struct.unpack_from("<I", buf, 4)[0]
    if _blosc is not None:
        nb = ctypes.c_size_t(0)
        if _blosc.blosc_cbuffer_validate(buf, len(buf), ctypes.byref(nb)) < 0:
            raise ValueError("corrupt blosc buffer (validation failed)")
        dest = ctypes.create_string_buffer(max(1, nbytes))
        rc = _blosc.blosc_decompress_ctx(buf, dest, nbytes, 1)
        if rc < 0:
            raise ValueError(f"blosc_decompress_ctx failed (rc={rc})")
        return dest.raw[:rc]
    return _blosc_decompress_py(buf)


def _lz4_block_decompress_py(src: bytes, dest_size: int) -> bytes:
    """Pure-Python LZ4 block decode (the raw block format, no frame)."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        # literals
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        out += src[i:i + lit]
        i += lit
        if i >= n:  # last sequence has no match part
            break
        off = src[i] | (src[i + 1] << 8)
        i += 2
        if off == 0:
            raise ValueError("invalid lz4 stream (zero offset)")
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - off
        if start < 0:
            raise ValueError("invalid lz4 stream (offset past start)")
        if off >= mlen:
            out += out[start:start + mlen]
        else:  # overlapping copy replicates the window
            for k in range(mlen):
                out.append(out[start + k])
    if len(out) != dest_size:
        raise ValueError(f"lz4 decode size mismatch: {len(out)} != {dest_size}")
    return bytes(out)


def _unshuffle(data: bytes, typesize: int) -> bytes:
    """Undo blosc byte-shuffle over one block (trailing remainder unshuffled)."""
    n = len(data)
    nel = n // typesize
    body = nel * typesize
    arr = np.frombuffer(data[:body], dtype=np.uint8).reshape(typesize, nel)
    return arr.T.tobytes() + data[body:]


def _blosc_decompress_py(buf: bytes) -> bytes:
    """Pure-Python blosc1 container decoder.

    Supports inner codecs lz4/lz4hc (one block format) and zlib, the memcpy
    fast path, and the byte-shuffle filter. Bitshuffle and blosclz/snappy/zstd
    inner codecs require libblosc. Format per c-blosc 1.x ``blosc.c``:
    16-byte header, uint32 block-start table, per-block split streams each
    prefixed with an int32 compressed length.
    """
    version, _versionlz, flags, typesize = buf[0], buf[1], buf[2], buf[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", buf, 4)
    if cbytes != len(buf):
        raise ValueError("blosc header cbytes does not match buffer length")
    if flags & 0x2:  # memcpyed: raw original buffer follows the header
        if len(buf) < 16 + nbytes:
            raise ValueError("truncated memcpy blosc buffer")
        return buf[16:16 + nbytes]
    if flags & 0x4:
        raise ValueError("bitshuffled blosc needs libblosc (not found)")
    # flags bits 5-7 carry the *format* code (lz4hc shares lz4's format):
    # 0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd.
    codec = (flags >> 5) & 0x7
    shuffle = bool(flags & 0x1)
    if blocksize <= 0 or nbytes == 0:
        return b""
    nblocks = (nbytes + blocksize - 1) // blocksize
    bstarts = struct.unpack_from(f"<{nblocks}I", buf, 16)
    out = bytearray()
    for j in range(nblocks):
        bsize = blocksize if j < nblocks - 1 or nbytes % blocksize == 0 \
            else nbytes % blocksize
        leftover = bsize != blocksize
        # Split rule of c-blosc 1.x blosc_d (verified against libblosc
        # 1.21.3 in tests): full blocks with small typesize are stored as
        # `typesize` independent split streams, for every inner codec.
        if typesize <= 16 and bsize // max(typesize, 1) >= 128 and not leftover:
            nsplits = typesize
        else:
            nsplits = 1
        neblock = bsize // nsplits
        pos = bstarts[j]
        block = bytearray()
        for _ in range(nsplits):
            (sz,) = struct.unpack_from("<i", buf, pos)
            pos += 4
            chunk = buf[pos:pos + abs(sz)]
            pos += abs(sz)
            if sz == neblock:  # stored raw
                block += chunk
            elif codec == 1:  # lz4 and lz4hc share one block format
                block += _lz4_block_decompress_py(chunk, neblock)
            elif codec == 3:
                block += zlib.decompress(chunk)
            else:
                names = ("blosclz", "lz4", "snappy", "zlib", "zstd")
                name = names[codec] if codec < len(names) else codec
                raise ValueError(
                    f"blosc inner codec {name!r} needs libblosc (not found)"
                )
        if shuffle and typesize > 1:
            block = _unshuffle(bytes(block), typesize)
        out += block
    if len(out) != nbytes:
        raise ValueError(f"blosc decode size mismatch: {len(out)} != {nbytes}")
    return bytes(out)


# ---------------------------------------------------------------------------
# zstd frames
# ---------------------------------------------------------------------------


def zstd_compress(data, level: int = 1) -> bytes:
    if _zstd is None:
        raise RuntimeError("zstd compression needs libzstd (not found)")
    data = bytes(data)
    bound = _zstd.ZSTD_compressBound(len(data))
    dest = ctypes.create_string_buffer(bound)
    rc = _zstd.ZSTD_compress(dest, bound, data, len(data), int(level))
    if _zstd.ZSTD_isError(rc):
        raise RuntimeError(f"ZSTD_compress failed (code={rc})")
    return dest.raw[:rc]


_ZSTD_CONTENTSIZE_UNKNOWN = (1 << 64) - 1
_ZSTD_CONTENTSIZE_ERROR = (1 << 64) - 2


def zstd_decompress(buf) -> bytes:
    if _zstd is None:
        raise RuntimeError("zstd decompression needs libzstd (not found)")
    buf = bytes(buf)
    size = _zstd.ZSTD_getFrameContentSize(buf, len(buf))
    if size == _ZSTD_CONTENTSIZE_ERROR:
        raise ValueError("not a zstd frame")
    if size == _ZSTD_CONTENTSIZE_UNKNOWN:
        # Streamed frame without a stored content size: grow-and-retry.
        cap = max(4 * len(buf), 1 << 20)
        while True:
            dest = ctypes.create_string_buffer(cap)
            rc = _zstd.ZSTD_decompress(dest, cap, buf, len(buf))
            if not _zstd.ZSTD_isError(rc):
                return dest.raw[:rc]
            if cap > (1 << 33):
                raise ValueError("zstd frame too large or corrupt")
            cap *= 4
    dest = ctypes.create_string_buffer(max(1, size))
    rc = _zstd.ZSTD_decompress(dest, size, buf, len(buf))
    if _zstd.ZSTD_isError(rc):
        raise ValueError("corrupt zstd frame")
    return dest.raw[:rc]


# ---------------------------------------------------------------------------
# numcodecs-framed lz4 (4-byte LE original size + one lz4 block)
# ---------------------------------------------------------------------------


def lz4_compress(data, acceleration: int = 1) -> bytes:
    if _lz4 is None:
        raise RuntimeError("lz4 compression needs liblz4 (not found)")
    data = bytes(data)
    bound = _lz4.LZ4_compressBound(len(data))
    dest = ctypes.create_string_buffer(bound)
    rc = _lz4.LZ4_compress_default(data, dest, len(data), bound)
    if rc <= 0 and len(data) > 0:
        raise RuntimeError(f"LZ4_compress_default failed (rc={rc})")
    return struct.pack("<I", len(data)) + dest.raw[:rc]


def lz4_decompress(buf) -> bytes:
    buf = bytes(buf)
    if len(buf) < 4:
        raise ValueError("truncated lz4 buffer")
    (n,) = struct.unpack_from("<I", buf, 0)
    if n == 0:
        return b""
    if _lz4 is None:
        return _lz4_block_decompress_py(buf[4:], n)
    dest = ctypes.create_string_buffer(n)
    rc = _lz4.LZ4_decompress_safe(buf[4:], dest, len(buf) - 4, n)
    if rc < 0:
        raise ValueError(f"corrupt lz4 block (rc={rc})")
    return dest.raw[:rc]
