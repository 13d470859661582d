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

__all__ = ["ome_xml", "parse_ome", "read_description", "read_ome", "write_ome_stack"]

_OME_NS = "http://www.openmicroscopy.org/Schemas/OME/2016-06"
_MICRON = "µm"


def ome_xml(
    shape: tuple[int, int, int],
    dxy: float | None = None,
    dz: float | None = None,
    name: str = "microtipi",
) -> str:
    """Minimal OME 2016-06 document for a (Nz, Ny, Nx) float32 volume.

    ``dxy``/``dz`` are in meters (the framework's unit end to end) and are
    emitted as ``PhysicalSize*`` in micrometers, the OME default unit — the
    same attributes ``mt_tiff_pixel_size`` reads back, so write->read
    round-trips the geometry exactly.
    """
    nz, ny, nx = (int(s) for s in shape)
    phys = ""
    if dxy:
        um = dxy * 1e6
        phys += (
            f' PhysicalSizeX="{um:.9g}" PhysicalSizeXUnit={quoteattr(_MICRON)}'
            f' PhysicalSizeY="{um:.9g}" PhysicalSizeYUnit={quoteattr(_MICRON)}'
        )
    if dz:
        phys += f' PhysicalSizeZ="{dz * 1e6:.9g}" PhysicalSizeZUnit={quoteattr(_MICRON)}'
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<OME xmlns="{_OME_NS}"'
        ' xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"'
        f' xsi:schemaLocation="{_OME_NS} {_OME_NS}/ome.xsd">'
        f'<Image ID="Image:0" Name={quoteattr(name)}>'
        '<Pixels ID="Pixels:0" DimensionOrder="XYZCT" Type="float"'
        f' SizeX="{nx}" SizeY="{ny}" SizeZ="{nz}" SizeC="1" SizeT="1"'
        f' BigEndian="false"{phys}>'
        '<Channel ID="Channel:0:0" SamplesPerPixel="1"/>'
        f'<TiffData IFD="0" PlaneCount="{nz}"/>'
        "</Pixels></Image></OME>"
    )


def parse_ome(xml: str) -> dict:
    """Parse an OME-XML document into a flat dict.

    Returns ``shape`` (Nz, Ny, Nx), ``dxy``/``dz`` in meters (None where
    absent), ``dtype`` (OME ``Type`` string), and ``name``. Namespace-agnostic
    so documents from any OME schema year parse.
    """
    root = ET.fromstring(xml)

    def local(tag):
        return tag.rsplit("}", 1)[-1]

    pixels = image = None
    for el in root.iter():
        if local(el.tag) == "Pixels" and pixels is None:
            pixels = el
        elif local(el.tag) == "Image" and image is None:
            image = el
    if pixels is None:
        raise ValueError("no <Pixels> element in OME-XML")

    def size(axis):
        v = pixels.get(f"Size{axis}")
        return int(v) if v else None

    def phys(axis):
        v = pixels.get(f"PhysicalSize{axis}")
        if not v:
            return None
        unit = pixels.get(f"PhysicalSize{axis}Unit") or _MICRON
        scale = {
            _MICRON: 1e-6, "um": 1e-6, "micron": 1e-6, "nm": 1e-9,
            "mm": 1e-3, "cm": 1e-2, "m": 1.0, "Å": 1e-10,
        }.get(unit)
        return float(v) * scale if scale else None

    return {
        "shape": (size("Z") or 1, size("Y"), size("X")),
        "dxy": phys("X"),
        "dz": phys("Z"),
        "dtype": pixels.get("Type"),
        "name": image.get("Name") if image is not None else None,
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
