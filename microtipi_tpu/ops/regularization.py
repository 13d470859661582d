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

__all__ = [
    "hyperbolic_hessian",
    "hyperbolic_tv",
    "hyperbolic_tv_and_gradient",
    "joint_hyperbolic_tv",
    "smoothed_l1",
]


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


def joint_hyperbolic_tv(
    x: jax.Array,
    epsilon: float,
    scales=None,
    axes=None,
    couple_axis: int = 0,
) -> jax.Array:
    """Channel-coupled (vector/color) hyperbolic total variation.

    Beyond parity — the multichannel prior of Bresson & Chan (color TV):
    per voxel, ONE hyperbolic norm over the finite differences of EVERY
    channel jointly,

        R(x) = sum_v ( sqrt( sum_c ||D_v x_c||^2 + eps^2 ) - eps ),

    instead of one norm per channel. The shared sqrt makes an edge cheap
    when the channels place it at the SAME voxel — edges align across
    channels (shared cell structure) while per-channel intensities stay
    free (channels are unordered labels; differencing ALONG the channel
    axis, the ``mu_t`` temporal prior, would be meaningless here). By
    concavity of sqrt, R(joint) <= sum_c R(x_c): coupling never costs more
    than independent TV and saves exactly where edges coincide.

    ``couple_axis`` names the channel axis of ``x`` (default 0 for a
    (C, Nz, Ny, Nx) block); ``axes`` the differenced spatial axes (default:
    every axis except ``couple_axis``); ``scales``/``epsilon`` as in
    :func:`hyperbolic_tv`. With C == 1 this equals :func:`hyperbolic_tv`
    exactly (test-pinned).
    """
    couple_axis = couple_axis % x.ndim
    if axes is None:
        axes = tuple(a for a in range(x.ndim) if a != couple_axis)
    axes = tuple(a % x.ndim for a in axes)
    if couple_axis in axes:
        raise ValueError("couple_axis cannot also be a differenced axis")
    diffs = _forward_diffs(x, scales, axes)
    g2 = sum(d * d for d in diffs)  # per channel, per voxel
    g2 = jnp.sum(g2, axis=couple_axis)  # couple: one norm across channels
    eps = jnp.asarray(epsilon, x.dtype)
    return jnp.sum(jnp.sqrt(g2 + eps * eps) - eps)


def hyperbolic_tv_and_gradient(x: jax.Array, epsilon: float, scales=None, axes=None):
    """Fused (cost, gradient); gradient via autodiff of the cost above."""
    return jax.value_and_grad(
        partial(hyperbolic_tv, epsilon=epsilon, scales=scales, axes=axes)
    )(x)


def smoothed_l1(x: jax.Array, epsilon: float) -> jax.Array:
    """Smoothed L1 on intensity: ``sum sqrt(x^2 + eps^2) - eps``.

    Beyond parity — the sparsity prior of modern "sparse deconvolution"
    (Zhao et al., Nat. Biotech. 2021 use L1-on-intensity + Hessian
    continuity). ``epsilon`` (intensity units) sets where the pull
    flattens; smaller = closer to exact L1. Measured effect in the object
    step (TUNING.md): confines the PSF-halo flux around point sources
    (background-region flux falls monotonically with the weight) at
    roughly constant recovery error — NOT a guarantee of exact-zero
    voxels (the bound projection, not this prior, produces those).
    """
    eps = jnp.asarray(epsilon, x.dtype)
    return jnp.sum(jnp.sqrt(x * x + eps * eps) - eps)


def hyperbolic_hessian(x: jax.Array, epsilon: float, scales=None, axes=None) -> jax.Array:
    """Hyperbolic penalty on the full second-difference Hessian.

    Per voxel, the squared Frobenius norm of the Hessian built from the same
    padded forward differences as :func:`hyperbolic_tv` applied twice
    (cross terms counted twice),

        R(x) = sum_v ( sqrt( sum_{i<=j} m_ij (D_i D_j x)_v^2 + eps^2 ) - eps ),
        m_ij = 1 if i == j else 2,

    with per-axis voxel-size scaling ``1/(s_i s_j)``. This is the continuity
    prior that complements TV: TV's piecewise-constant preference staircases
    smooth gradients, the Hessian penalty is zero on affine ramps away from
    the replicate boundary face (pinned by a test). Convex and smooth, so it
    drops into the VMLMB object step unchanged.
    """
    if axes is None:
        axes = tuple(range(x.ndim))
    axes = tuple(a % x.ndim for a in axes)
    firsts = _forward_diffs(x, scales, axes)
    h2 = None
    for i in range(len(axes)):
        seconds = _forward_diffs(firsts[i], scales, axes)
        for j in range(i, len(axes)):
            m = 1.0 if j == i else 2.0
            term = m * seconds[j] * seconds[j]
            h2 = term if h2 is None else h2 + term
    eps = jnp.asarray(epsilon, x.dtype)
    return jnp.sum(jnp.sqrt(h2 + eps * eps) - eps)
