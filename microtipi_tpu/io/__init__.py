"""Volume IO: native TIFF (C++ parallel decode), OME-TIFF metadata, HDF5,
zarr/OME-NGFF (stdlib-only store implementation)."""
from microtipi_tpu.io.ome import (
    ome_xml,
    parse_ome,
    read_ome,
    read_ome_companion,
    read_ome_hyperstack,
    write_ome_companion,
    write_ome_hyperstack,
    write_ome_stack,
)
from microtipi_tpu.io.tiffstack import StackPrefetcher, read_stack, stack_info, write_stack
from microtipi_tpu.io.zarrstack import (
    read_ngff_hyperstack,
    read_zarr,
    write_ngff_hyperstack,
    write_zarr,
)

__all__ = [
    "read_stack",
    "write_stack",
    "stack_info",
    "StackPrefetcher",
    "ome_xml",
    "parse_ome",
    "read_ome",
    "read_ome_hyperstack",
    "read_ome_companion",
    "write_ome_companion",
    "write_ome_hyperstack",
    "write_ome_stack",
    "read_zarr",
    "write_zarr",
    "read_ngff_hyperstack",
    "write_ngff_hyperstack",
]
