"""Device-mesh construction for batched / spatially-sharded deconvolution.

The reference's only parallelism is a single-JVM thread pool fanned over
z-slices (``WideFieldModel.java:216-217`` and 7 more sites — SURVEY.md
section 5-h). The TPU-native equivalent is a 2-axis logical mesh:

- ``batch``: pure data parallelism over independent volumes
  (time-lapse frames / channels) — no communication;
- ``z``: spatial sharding of each volume's z-stack — the distributed 3D FFT
  transposes over this axis via ``all_to_all`` riding the ICI.

On a v5e-8 the default split for the batched 512^3 config is (2, 4); a single
big volume uses (1, 8).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "BATCH_AXIS", "Z_AXIS", "volume_sharding", "constrain_volume"]

BATCH_AXIS = "batch"
Z_AXIS = "z"


def make_mesh(batch: int = 1, z: int | None = None, devices=None) -> Mesh:
    """Build a (batch, z) mesh. With ``z=None`` all remaining devices go to
    the spatial axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if z is None:
        if n % batch:
            raise ValueError(f"{n} devices not divisible by batch={batch}")
        z = n // batch
    if batch * z != n:
        raise ValueError(f"mesh {batch}x{z} != {n} devices")
    return Mesh(np.asarray(devices).reshape(batch, z), (BATCH_AXIS, Z_AXIS))


def volume_sharding(mesh: Mesh, batched: bool = True) -> NamedSharding:
    """Canonical sharding of a (B, Nz, Ny, Nx) stack (or (Nz, Ny, Nx) volume):
    batch over ``batch``, z over ``z``, (y, x) replicated locally."""
    spec = P(BATCH_AXIS, Z_AXIS) if batched else P(Z_AXIS)
    return NamedSharding(mesh, spec)


def constrain_volume(a, mesh: Mesh, batched: bool | None = None):
    """``with_sharding_constraint(a, volume_sharding(...))`` when the shape
    divides the mesh; identity otherwise (NamedSharding rejects uneven
    shards — odd-sized arrays stay unconstrained and GSPMD lays them out)."""
    import jax

    if batched is None:
        batched = a.ndim == 4
    if a.shape[-3] % mesh.shape[Z_AXIS]:
        return a
    if batched and a.shape[0] % mesh.shape[BATCH_AXIS]:
        return a
    return jax.lax.with_sharding_constraint(a, volume_sharding(mesh, batched=batched))
