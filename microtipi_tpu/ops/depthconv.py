"""Depth-varying (spatially-variant along z) FFT convolution data term.

Beyond-parity extension: the reference models a single shift-invariant PSF
(``WeightedConvolutionCost`` usage at ``microscopy/PSF_Estimation.java:
147-157``), but its own physics says the PSF changes with imaging depth —
the Gibson-Lanni stratified-medium aberration grows linearly with ``d``
(``models/gibson_lanni.py``). The standard correction (PSF-interpolation
depth-variant imaging, Preza & Conchello, J. Opt. Soc. Am. A 21 (2004)) is a
small set of anchor PSFs blended along z:

    H x = sum_k  h_k (*) (w_k ⊙ x),

with ``w_k(z)`` hat-function interpolation weights over K anchor depths
(partition of unity), each ``h_k`` the PSF synthesized at that depth. This
is the *scatter* form — every source voxel emits with the PSF of its own
depth — and its adjoint (the gather form) falls out of autodiff.

TPU mapping: the K per-anchor volumes go through ONE batched ``rfftn`` over
the stacked leading axis (the MXU/FFT pipeline sees a single big batch, not
K dispatches), spectra are reduced in Fourier space, and a single ``irfftn``
returns the model — (K+1) forward + 1 inverse transforms per cost, all
static-shaped.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from microtipi_tpu.utils.arrays import crop_to_shape

__all__ = ["depth_weights", "DepthVaryingConvCost", "depth_varying_convolve"]


def depth_weights(nz: int, anchors) -> np.ndarray:
    """Hat-function interpolation weights, shape ``(K, nz)``.

    ``anchors`` are strictly increasing z indices (floats allowed) in
    ``[0, nz-1]``. Each z plane's blur is a convex blend of its two
    surrounding anchor PSFs; planes outside the anchor span clamp to the
    nearest anchor. Rows sum to 1 over k (partition of unity), so a constant
    PSF stack reproduces plain convolution exactly.
    """
    anchors = np.asarray(anchors, np.float64)
    if anchors.ndim != 1 or anchors.size < 1:
        raise ValueError("anchors must be a non-empty 1D sequence")
    if anchors.size > 1 and not np.all(np.diff(anchors) > 0):
        raise ValueError("anchors must be strictly increasing")
    z = np.arange(nz, dtype=np.float64)
    k = anchors.size
    w = np.zeros((k, nz))
    if k == 1:
        w[0] = 1.0
        return w
    zc = np.clip(z, anchors[0], anchors[-1])
    seg = np.clip(np.searchsorted(anchors, zc, side="right") - 1, 0, k - 2)
    t = (zc - anchors[seg]) / (anchors[seg + 1] - anchors[seg])
    w[seg, np.arange(nz)] = 1.0 - t
    w[seg + 1, np.arange(nz)] += t
    return w


def depth_varying_convolve(
    x: jax.Array, kernels_hat: jax.Array, zweights: jax.Array,
    shape: tuple[int, ...], exact: bool = False
) -> jax.Array:
    """``sum_k h_k (*) (w_k ⊙ x)`` with precomputed anchor spectra.

    ``kernels_hat`` is the batched rfftn of the K corner-origin anchor
    kernels at ``shape``; ``zweights`` is ``(K, Nz)``.
    """
    from microtipi_tpu.ops.convolution import fft_pair

    _rfftn, _irfftn = fft_pair(exact)
    xk = zweights[:, :, None, None] * x[None]
    xk_hat = _rfftn(xk, axes=(1, 2, 3))
    return _irfftn(jnp.sum(kernels_hat * xk_hat, axis=0), s=shape)


class DepthVaryingConvCost(NamedTuple):
    """Weighted data term under the depth-varying blur operator.

    Same contract as ``WeightedConvolutionCost`` (build / model / cost),
    with a stack of K anchor kernels instead of one. ``anchors`` are z
    indices *of the data grid*; on a padded variable grid they are offset
    to the centered data window automatically.
    """

    kernels_hat: jax.Array  # (K,) + rfftn spectrum shape at var_shape
    zweights: jax.Array  # (K, var_nz)
    data: jax.Array
    weights: jax.Array | None
    var_shape: tuple[int, ...]
    exact: bool = False

    @classmethod
    def build(
        cls,
        kernels: jax.Array,
        data: jax.Array,
        weights: jax.Array | None = None,
        var_shape: tuple[int, ...] | None = None,
        anchors=None,
        exact: bool = False,
    ) -> "DepthVaryingConvCost":
        """``kernels``: (K, Nz, Ny, Nx) corner-origin anchor PSFs at
        ``var_shape`` (embed with ``utils.arrays.pad_fft_kernel`` per anchor
        if padding). ``anchors`` default to K evenly spaced z indices over
        the data grid."""
        if var_shape is None:
            var_shape = data.shape
        var_shape = tuple(var_shape)
        if kernels.ndim != len(var_shape) + 1:
            raise ValueError("kernels must be a (K,)+volume stack")
        if kernels.shape[1:] != var_shape:
            raise ValueError(
                f"kernel shape {kernels.shape[1:]} != variable shape {var_shape}; "
                "use utils.arrays.pad_fft_kernel per anchor to embed them"
            )
        if weights is not None and weights.shape != data.shape:
            raise ValueError("weights must match the data shape")
        if weights is not None:
            # Zero weight EXCLUDES the voxel whatever its value (0*NaN=NaN
            # would otherwise defeat the validity mask — see
            # ops.convolution.WeightedConvolutionCost.build).
            data = jnp.where(weights > 0, data, 0.0)
        k = kernels.shape[0]
        if anchors is None:
            anchors = np.linspace(0.0, data.shape[0] - 1.0, k)
        anchors = np.asarray(anchors, np.float64)
        if anchors.shape != (k,):
            raise ValueError(f"need one anchor per kernel, got {anchors.shape} for K={k}")
        # Weights live on the variable z grid; the data window is centered
        # (utils.arrays._offsets), so data z index 0 sits at var index off_z.
        off_z = (var_shape[0] - data.shape[0]) // 2
        from microtipi_tpu.ops.convolution import fft_pair

        zw = depth_weights(var_shape[0], anchors + off_z)
        return cls(
            fft_pair(exact)[0](kernels, axes=(1, 2, 3)),
            jnp.asarray(zw, data.dtype),
            data,
            weights,
            var_shape,
            exact,
        )

    def model(self, x: jax.Array) -> jax.Array:
        """Forward model H x = crop(sum_k h_k (*) (w_k ⊙ x))."""
        hx = depth_varying_convolve(x, self.kernels_hat, self.zweights,
                                    self.var_shape, self.exact)
        if hx.shape != self.data.shape:
            hx = crop_to_shape(hx, self.data.shape)
        return hx

    def cost(self, x: jax.Array, alpha: float = 1.0) -> jax.Array:
        """0.5 * alpha * sum w * (H x - d)^2 — residual form (no quadratic
        identity: the depth blend breaks circulant structure anyway)."""
        r = self.model(x) - self.data
        wr2 = r * r if self.weights is None else self.weights * r * r
        return 0.5 * alpha * jnp.sum(wr2)
