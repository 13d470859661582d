"""OME-XML metadata: generate, write, and read OME-TIFF geometry.

The reference ecosystem (Icy, which hosted microTiPi's GUI — provenance
headers at ``/root/reference/src/microTiPi/epifluorescence/WideFieldModel.java``)
exchanges volumes as OME-TIFF: a plain TIFF whose first page carries an
OME-XML document in its ImageDescription tag. Round 1 shipped OME *reading*
(pixel sizes, ``native/stackio.cpp::mt_tiff_pixel_size``); this module adds
the writing half so results re-enter OME-aware tools (Fiji/Bio-Formats,
Icy, napari-ome) with correct voxel geometry, plus a Python-side parser for
the richer fields the native fast path does not need.

Only the metadata this framework produces is emitted (single-channel,
single-timepoint float volumes) — a minimal but schema-shaped OME 2016-06
document, not a full Bio-Formats implementation.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import quoteattr

import numpy as np

__all__ = [
    "ome_xml",
    "parse_ome",
    "read_description",
    "read_ome",
    "read_ome_hyperstack",
    "write_ome_stack",
    "write_ome_hyperstack",
]

_OME_NS = "http://www.openmicroscopy.org/Schemas/OME/2016-06"
_MICRON = "µm"


def ome_xml(
    shape: tuple[int, int, int],
    dxy: float | None = None,
    dz: float | None = None,
    name: str = "microtipi",
    size_c: int = 1,
    size_t: int = 1,
    channel_names=None,
    emission_wavelengths=None,
) -> str:
    """Minimal OME 2016-06 document for float32 volume(s), (Nz, Ny, Nx) per
    channel/timepoint.

    ``dxy``/``dz`` are in meters (the framework's unit end to end) and are
    emitted as ``PhysicalSize*`` in micrometers, the OME default unit — the
    same attributes ``mt_tiff_pixel_size`` reads back, so write->read
    round-trips the geometry exactly. Multi-channel/timepoint documents
    (``size_c``/``size_t`` > 1) describe pages in ``XYZCT`` order (z fastest,
    then channel, then time); ``emission_wavelengths`` are per-channel, in
    meters, emitted in nm (what the PSF model's ``wavelength`` wants back).
    """
    nz, ny, nx = (int(s) for s in shape)
    nc, nt = int(size_c), int(size_t)
    phys = ""
    if dxy:
        um = dxy * 1e6
        phys += (
            f' PhysicalSizeX="{um:.9g}" PhysicalSizeXUnit={quoteattr(_MICRON)}'
            f' PhysicalSizeY="{um:.9g}" PhysicalSizeYUnit={quoteattr(_MICRON)}'
        )
    if dz:
        phys += f' PhysicalSizeZ="{dz * 1e6:.9g}" PhysicalSizeZUnit={quoteattr(_MICRON)}'
    channels = ""
    for c in range(nc):
        attrs = f'<Channel ID="Channel:0:{c}" SamplesPerPixel="1"'
        if channel_names is not None and c < len(channel_names) and channel_names[c]:
            attrs += f" Name={quoteattr(str(channel_names[c]))}"
        if (
            emission_wavelengths is not None
            and c < len(emission_wavelengths)
            and emission_wavelengths[c]
        ):
            attrs += (
                f' EmissionWavelength="{emission_wavelengths[c] * 1e9:.9g}"'
                ' EmissionWavelengthUnit="nm"'
            )
        channels += attrs + "/>"
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<OME xmlns="{_OME_NS}"'
        ' xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"'
        f' xsi:schemaLocation="{_OME_NS} {_OME_NS}/ome.xsd">'
        f'<Image ID="Image:0" Name={quoteattr(name)}>'
        '<Pixels ID="Pixels:0" DimensionOrder="XYZCT" Type="float"'
        f' SizeX="{nx}" SizeY="{ny}" SizeZ="{nz}" SizeC="{nc}" SizeT="{nt}"'
        f' BigEndian="false"{phys}>'
        f"{channels}"
        f'<TiffData IFD="0" PlaneCount="{nz * nc * nt}"/>'
        "</Pixels></Image></OME>"
    )


def parse_ome(xml: str) -> dict:
    """Parse an OME-XML document into a flat dict.

    Returns ``shape`` (Nz, Ny, Nx), ``dxy``/``dz`` in meters (None where
    absent), ``dtype`` (OME ``Type`` string), ``name``, plus the hyperstack
    fields: ``size_c``/``size_t``, ``dimension_order``, and ``channels`` —
    one dict per channel with ``name`` and ``emission_wavelength`` in meters
    (None where absent). Namespace-agnostic so documents from any OME schema
    year parse.
    """
    root = ET.fromstring(xml)

    def local(tag):
        return tag.rsplit("}", 1)[-1]

    pixels = image = None
    channel_els = []
    for el in root.iter():
        if local(el.tag) == "Pixels" and pixels is None:
            pixels = el
        elif local(el.tag) == "Image" and image is None:
            image = el
        elif local(el.tag) == "Channel":
            channel_els.append(el)
    if pixels is None:
        raise ValueError("no <Pixels> element in OME-XML")

    def size(axis):
        v = pixels.get(f"Size{axis}")
        return int(v) if v else None

    _UNIT = {
        _MICRON: 1e-6, "um": 1e-6, "micron": 1e-6, "nm": 1e-9,
        "mm": 1e-3, "cm": 1e-2, "m": 1.0, "Å": 1e-10, "pm": 1e-12,
    }

    def phys(axis):
        v = pixels.get(f"PhysicalSize{axis}")
        if not v:
            return None
        scale = _UNIT.get(pixels.get(f"PhysicalSize{axis}Unit") or _MICRON)
        return float(v) * scale if scale else None

    def emission(el):
        v = el.get("EmissionWavelength")
        if not v:
            return None
        # OME 2016-06 defaults EmissionWavelength to nm.
        scale = _UNIT.get(el.get("EmissionWavelengthUnit") or "nm")
        return float(v) * scale if scale else None

    return {
        "shape": (size("Z") or 1, size("Y"), size("X")),
        "dxy": phys("X"),
        "dz": phys("Z"),
        "dtype": pixels.get("Type"),
        "name": image.get("Name") if image is not None else None,
        "size_c": size("C") or 1,
        "size_t": size("T") or 1,
        "dimension_order": pixels.get("DimensionOrder") or "XYZCT",
        "channels": [
            {"name": el.get("Name"), "emission_wavelength": emission(el)}
            for el in channel_els
        ],
    }


def read_description(path: str | os.PathLike) -> str:
    """The first page's ImageDescription tag ('' when absent)."""
    import ctypes

    from microtipi_tpu.io.tiffstack import _lib

    lib = _lib()
    if not hasattr(lib.mt_tiff_description, "_mt_configured"):
        lib.mt_tiff_description.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
        lib.mt_tiff_description.restype = ctypes.c_int
        lib.mt_tiff_description._mt_configured = True
    cap = 1 << 16
    while True:
        buf = ctypes.create_string_buffer(cap)
        n = lib.mt_tiff_description(str(path).encode(), buf, cap)
        if n < 0:
            raise IOError(lib.mt_last_error().decode(errors="replace"))
        if n < cap:
            return buf.value.decode("utf-8", errors="replace")
        cap = n + 1  # description longer than the probe buffer: retry exact


def read_ome(path: str | os.PathLike) -> dict | None:
    """Parsed OME metadata of a TIFF, or None if it carries no OME-XML."""
    desc = read_description(path)
    if "<OME" not in desc:
        return None
    # OME-TIFF allows leading comments/BOM; slice from the root element.
    start = desc.find("<OME")
    m = re.search(r"<\?xml[^>]*\?>", desc[:start])
    xml = (m.group(0) if m else "") + desc[start:]
    return parse_ome(xml)


def read_ome_hyperstack(path: str | os.PathLike):
    """Read a (possibly multi-channel/timepoint) OME-TIFF as a 5D array.

    Returns ``(array, meta)`` with ``array`` shaped ``(T, C, Z, Y, X)``
    (singleton axes kept — a plain single-volume file comes back as
    ``(1, 1, Z, Y, X)``) and ``meta`` the :func:`parse_ome` dict (or a
    minimal dict for non-OME TIFFs, where every page is treated as z).
    Page order follows the document's ``DimensionOrder``; all six valid
    orders are handled.
    """
    from microtipi_tpu.io.tiffstack import read_stack

    pages = read_stack(path)  # (P, Y, X)
    meta = read_ome(path)
    if meta is None:
        meta = {
            "shape": pages.shape, "dxy": None, "dz": None, "dtype": "float",
            "name": None, "size_c": 1, "size_t": 1,
            "dimension_order": "XYZCT", "channels": [],
        }
        return pages[None, None], meta
    nz = meta["shape"][0] or 1
    nc, nt = meta["size_c"], meta["size_t"]
    if nz * nc * nt != pages.shape[0]:
        raise ValueError(
            f"OME sizes Z={nz} C={nc} T={nt} do not match {pages.shape[0]} pages"
        )
    order = meta["dimension_order"].upper()
    letters = order[2:5]  # fastest-varying page dimension first
    if sorted(letters) != ["C", "T", "Z"]:
        raise ValueError(f"unsupported DimensionOrder {order!r}")
    sizes = {"Z": nz, "C": nc, "T": nt}
    # Pages reshape as (slowest, middle, fastest); transpose to (T, C, Z).
    slowest_first = letters[::-1]
    arr = pages.reshape(tuple(sizes[d] for d in slowest_first) + pages.shape[1:])
    perm = tuple(slowest_first.index(d) for d in "TCZ") + (3, 4)
    return arr.transpose(perm), meta


def write_ome_hyperstack(
    path: str | os.PathLike,
    array: np.ndarray,
    dxy: float | None = None,
    dz: float | None = None,
    name: str | None = None,
    channel_names=None,
    emission_wavelengths=None,
    **kwargs,
) -> None:
    """Write a ``(T, C, Z, Y, X)`` (or 4D ``(C, Z, Y, X)`` / 3D) array as a
    multi-channel/timepoint OME-TIFF, pages in ``XYZCT`` order.

    ``emission_wavelengths``: per-channel emission in meters — stamped so a
    later ``blind``/PSF fit can pick the right model wavelength per channel.
    Same ``compression``/``tile``/``bigtiff`` options as
    :func:`~microtipi_tpu.io.tiffstack.write_stack`.
    """
    from microtipi_tpu.io.tiffstack import write_stack

    arr = np.asarray(array)
    while arr.ndim < 5:
        arr = arr[None]
    if arr.ndim != 5:
        raise ValueError("expected a (T, C, Z, Y, X) array (3D/4D allowed)")
    nt, nc, nz, ny, nx = arr.shape
    desc = ome_xml(
        (nz, ny, nx), dxy=dxy, dz=dz,
        name=name or os.path.basename(str(path)),
        size_c=nc, size_t=nt,
        channel_names=channel_names, emission_wavelengths=emission_wavelengths,
    )
    # C-order flatten of [t, c, z] = z fastest, then c, then t == XYZCT.
    write_stack(path, arr.reshape(nt * nc * nz, ny, nx), dxy=dxy, dz=dz,
                description=desc, **kwargs)


def write_ome_stack(
    path: str | os.PathLike,
    volume: np.ndarray,
    dxy: float | None = None,
    dz: float | None = None,
    name: str | None = None,
    **kwargs,
) -> None:
    """Write a volume as OME-TIFF: TIFF pages + OME-XML first-page description.

    Thin convenience over :func:`~microtipi_tpu.io.tiffstack.write_stack`
    (same ``compression``/``tile``/``bigtiff`` options) that stamps the
    OME-XML document *and* the baseline resolution tags, so both OME-aware
    and plain-TIFF readers recover the geometry.
    """
    from microtipi_tpu.io.tiffstack import write_stack

    vol = np.asarray(volume)
    if vol.ndim != 3:
        raise ValueError("expected a 3D (Nz, Ny, Nx) volume")
    desc = ome_xml(vol.shape, dxy=dxy, dz=dz, name=name or os.path.basename(str(path)))
    write_stack(path, vol, dxy=dxy, dz=dz, description=desc, **kwargs)
