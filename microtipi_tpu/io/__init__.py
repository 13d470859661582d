"""Volume IO: native TIFF (C++ parallel decode), OME-TIFF metadata, HDF5."""
from microtipi_tpu.io.ome import (
    ome_xml,
    parse_ome,
    read_ome,
    read_ome_hyperstack,
    write_ome_hyperstack,
    write_ome_stack,
)
from microtipi_tpu.io.tiffstack import StackPrefetcher, read_stack, stack_info, write_stack

__all__ = [
    "read_stack",
    "write_stack",
    "stack_info",
    "StackPrefetcher",
    "ome_xml",
    "parse_ome",
    "read_ome",
    "read_ome_hyperstack",
    "write_ome_hyperstack",
    "write_ome_stack",
]
