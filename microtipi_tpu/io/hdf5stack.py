"""HDF5 volume IO (Imaris / BigDataViewer-style containers).

Complements the native TIFF path for the other half of the microscopy
ecosystem. Thin, gated on h5py (present in this environment; the module
degrades with a clear error elsewhere). Datasets are read as float32
volumes in this framework's (Nz, Ny, Nx) layout.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["read_h5", "write_h5", "list_datasets"]

try:
    import h5py

    _H5_ERR = None
except Exception as e:  # pragma: no cover - environment without h5py
    h5py = None
    _H5_ERR = e


def _require():
    if h5py is None:
        raise ImportError(f"h5py is unavailable: {_H5_ERR}")


def list_datasets(path: str | os.PathLike) -> list[str]:
    """All dataset paths in the file (depth-first)."""
    _require()
    out: list[str] = []
    with h5py.File(path, "r") as f:
        f.visititems(lambda name, obj: out.append(name) if isinstance(obj, h5py.Dataset) else None)
    return out


def read_h5(path: str | os.PathLike, dataset: str | None = None,
            z0: int = 0, nz: int | None = None) -> np.ndarray:
    """Read (a z-range of) a 3D dataset as float32.

    ``dataset=None`` picks the first 3D dataset in the file (the common
    single-volume case)."""
    _require()
    with h5py.File(path, "r") as f:
        if dataset is None:
            candidates = [n for n in list_datasets(path) if f[n].ndim == 3]
            if not candidates:
                raise ValueError(f"no 3D dataset found in {path}")
            dataset = candidates[0]
        d = f[dataset]
        if d.ndim != 3:
            raise ValueError(f"dataset {dataset!r} is {d.ndim}D, expected 3D")
        stop = d.shape[0] if nz is None else z0 + nz
        if z0 < 0 or stop > d.shape[0]:
            raise ValueError(
                f"z-range [{z0}, {stop}) out of bounds for depth {d.shape[0]}"
            )
        return np.asarray(d[z0:stop], dtype=np.float32)


def write_h5(path: str | os.PathLike, volume: np.ndarray,
             dataset: str = "volume", compression: str | None = None) -> None:
    """Write a (Nz, Ny, Nx) float32 volume, chunked by z-plane (so later
    z-range reads touch only the needed chunks)."""
    _require()
    vol = np.ascontiguousarray(volume, np.float32)
    if vol.ndim != 3:
        raise ValueError("expected a 3D (Nz, Ny, Nx) volume")
    with h5py.File(path, "w") as f:
        f.create_dataset(dataset, data=vol, chunks=(1,) + vol.shape[1:],
                         compression=compression)
