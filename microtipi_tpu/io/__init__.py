"""Volume IO: native TIFF (C++ parallel decode) and HDF5."""
from microtipi_tpu.io.tiffstack import StackPrefetcher, read_stack, stack_info, write_stack

__all__ = ["read_stack", "write_stack", "stack_info", "StackPrefetcher"]
