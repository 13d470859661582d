"""Edge-preserving regularizers for the object update.

The reference's object step (external TiPi ``DeconvolutionJob``, used at
``microUtils/BlindDeconvJob.java:103-108``) minimizes data term + mu * R(x)
with R the *hyperbolic total variation*, per the north star in BASELINE.json:

    R(x) = sum_v ( sqrt( ||D_v x||^2 + eps^2 ) - eps )

where ``D_v`` stacks forward finite differences along each axis, optionally
scaled by the voxel size (anisotropic sampling: dz != dxy). Subtracting eps
makes R(constant) = 0; it does not change the gradient. As eps -> 0 this is
exact TV; large eps tends to Tikhonov on the gradient.

The jnp implementation below is the semantic definition; a fused Pallas
kernel with a custom VJP lives in ``microtipi_tpu.ops.pallas.hyperbolic_tv``
and is bit-tested against this one.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["hyperbolic_tv", "hyperbolic_tv_and_gradient"]


def _forward_diffs(x: jax.Array, scales, axes) -> list[jax.Array]:
    """Forward differences along the given axes, zero at the trailing face.

    Replicate-boundary convention: the difference at the last index along an
    axis is 0 (equivalent to clamping), so a constant volume has zero cost.
    """
    diffs = []
    for i, axis in enumerate(axes):
        d = jnp.diff(x, axis=axis)
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, 1)
        d = jnp.pad(d, pad)
        if scales is not None:
            d = d * (1.0 / scales[i])
        diffs.append(d)
    return diffs


def hyperbolic_tv(x: jax.Array, epsilon: float, scales=None, axes=None) -> jax.Array:
    """Hyperbolic (pseudo-Huber) total variation cost.

    ``epsilon`` is the edge threshold in object-intensity units; ``scales``
    optionally gives the per-axis voxel size so gradients are in physical
    units (pass ``(dz, dxy, dxy)`` for the reference's geometry). ``axes``
    selects the differenced axes (default: all) — for batched stacks pass
    ``(-3, -2, -1)`` so no gradient is taken across the batch axis.
    """
    if axes is None:
        axes = tuple(range(x.ndim))
    axes = tuple(a % x.ndim for a in axes)
    diffs = _forward_diffs(x, scales, axes)
    g2 = sum(d * d for d in diffs)
    eps = jnp.asarray(epsilon, x.dtype)
    return jnp.sum(jnp.sqrt(g2 + eps * eps) - eps)


def hyperbolic_tv_and_gradient(x: jax.Array, epsilon: float, scales=None, axes=None):
    """Fused (cost, gradient); gradient via autodiff of the cost above."""
    return jax.value_and_grad(
        partial(hyperbolic_tv, epsilon=epsilon, scales=scales, axes=axes)
    )(x)
