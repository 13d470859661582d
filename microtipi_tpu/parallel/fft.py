"""Distributed 3D real FFT and FFT-domain convolution over a device mesh.

Transpose-based decomposition (the spectral analogue of sequence parallelism,
SURVEY.md section 5-g): with each volume sharded along z over mesh axis ``z``,

  forward:  local batched 2D ``rfft2`` over (y, x)
            -> ``all_to_all`` transpose (gather z, scatter y) over ICI
            -> local 1D ``fft`` along the now-complete z axis
  inverse:  mirror image.

The spectrum therefore lives **y-sharded** — pointwise multiplication by a
kernel spectrum in the same layout needs no communication, so a full
convolution costs exactly two all-to-alls. Gradients flow through
``all_to_all`` natively (its transpose is the reverse all_to_all), so these
primitives drop straight into the jitted VMLMB solvers.

Everything is exposed two ways:

- *inside-shard_map* primitives (``rfft3_local``/``irfft3_local``) for
  composing bigger SPMD blocks;
- global-array wrappers (``sharded_rfftn``/``sharded_convolve``) built with
  ``jax.shard_map`` for direct use on sharded arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from microtipi_tpu.parallel.mesh import BATCH_AXIS, Z_AXIS

__all__ = [
    "rfft3_local",
    "irfft3_local",
    "sharded_rfftn",
    "sharded_irfftn",
    "sharded_spectrum",
    "sharded_convolve",
]


def rfft3_local(x_local: jax.Array, axis_name: str = Z_AXIS,
                exact: bool | None = None) -> jax.Array:
    """Forward distributed rfftn body (call inside shard_map).

    ``x_local``: (..., Nz/p, Ny, Nx) real. Returns (..., Nz, Ny/p, Nx//2+1)
    complex — z complete, y sharded. The z-axis 1D transform follows the
    ``exact_fft`` backend policy (exact matmul-DFT on TPU — the XLA FFT
    there is bf16-grade, BASELINE.md round 5; the 2D ``rfft2`` leg keeps
    ``jnp.fft``, measured f32-exact). ``exact=None`` = the auto rule.
    """
    from microtipi_tpu.ops.convolution import auto_exact_fft

    if exact is None:
        exact = auto_exact_fft()
    xk = jnp.fft.rfft2(x_local, axes=(-2, -1))
    # gather z (concat on -3), scatter y (split on -2)
    xk = lax.all_to_all(xk, axis_name, split_axis=xk.ndim - 2, concat_axis=xk.ndim - 3, tiled=True)
    if exact:
        from microtipi_tpu.ops import exactfft

        return exactfft.fft(xk, axis=-3)
    return jnp.fft.fft(xk, axis=-3)


def irfft3_local(y_local: jax.Array, ny: int, nx: int, axis_name: str = Z_AXIS,
                 exact: bool | None = None) -> jax.Array:
    """Inverse of :func:`rfft3_local`. ``y_local``: (..., Nz, Ny/p, Nx//2+1);
    returns (..., Nz/p, Ny, Nx) real. ``ny``/``nx`` are the *global* sizes."""
    from microtipi_tpu.ops.convolution import auto_exact_fft

    if exact is None:
        exact = auto_exact_fft()
    if exact:
        from microtipi_tpu.ops import exactfft

        y = exactfft.ifft(y_local, axis=-3)
    else:
        y = jnp.fft.ifft(y_local, axis=-3)
    y = lax.all_to_all(y, axis_name, split_axis=y.ndim - 3, concat_axis=y.ndim - 2, tiled=True)
    return jnp.fft.irfft2(y, s=(ny, nx), axes=(-2, -1))


def _specs(mesh: Mesh, ndim: int, spectrum: bool):
    """PartitionSpec for a volume (ndim=3) or batched stack (ndim=4):
    real space = z-sharded, spectrum = y-sharded; batch always on BATCH_AXIS."""
    batch = (BATCH_AXIS,) if ndim == 4 else ()
    if spectrum:
        return P(*batch, None, Z_AXIS, None)
    return P(*batch, Z_AXIS, None, None)


def sharded_rfftn(x: jax.Array, mesh: Mesh,
                  exact: bool | None = None) -> jax.Array:
    """Global-array distributed rfftn; input z-sharded, output y-sharded.
    ``exact``: z-leg precision policy (None = the ``exact_fft`` backend
    auto rule — see :func:`rfft3_local`)."""
    ndim = x.ndim
    return jax.shard_map(
        partial(rfft3_local, axis_name=Z_AXIS, exact=exact),
        mesh=mesh,
        in_specs=_specs(mesh, ndim, False),
        out_specs=_specs(mesh, ndim, True),
        check_vma=False,
    )(x)


def sharded_irfftn(y: jax.Array, shape: tuple[int, int, int], mesh: Mesh,
                   exact: bool | None = None) -> jax.Array:
    """Global-array distributed irfftn; ``shape`` is the global (Nz, Ny, Nx)."""
    nz, ny, nx = shape
    ndim = y.ndim
    return jax.shard_map(
        partial(irfft3_local, ny=ny, nx=nx, axis_name=Z_AXIS, exact=exact),
        mesh=mesh,
        in_specs=_specs(mesh, ndim, True),
        out_specs=_specs(mesh, ndim, False),
        check_vma=False,
    )(y)


def sharded_spectrum(kernel: jax.Array, mesh: Mesh,
                     exact: bool | None = None) -> jax.Array:
    """Kernel spectrum in the distributed layout (y-sharded), computed once."""
    return sharded_rfftn(kernel, mesh, exact)


def sharded_convolve(
    x: jax.Array, kernel_hat: jax.Array, shape: tuple[int, int, int],
    mesh: Mesh, exact: bool | None = None
) -> jax.Array:
    """Circular convolution with a kernel spectrum in distributed layout.

    ``x`` is z-sharded (optionally with a leading batch axis); ``kernel_hat``
    comes from :func:`sharded_spectrum` and broadcasts over batch. Two
    all-to-alls total; the spectral product is purely local.
    """
    y = sharded_rfftn(x, mesh, exact)
    return sharded_irfftn(y * kernel_hat, shape, mesh, exact)
