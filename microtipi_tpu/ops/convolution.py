"""FFT-domain weighted convolution data term.

Rebuild of TiPi's ``WeightedConvolutionCost`` as the reference uses it
(``microscopy/PSF_Estimation.java:147-157,206``):

    f(x) = 0.5 * alpha * sum_i  w_i * ((K (*) x)_i - d_i)^2

where ``(*)`` is *circular* convolution computed in the Fourier domain and the
kernel ``K`` is corner-origin (its center at index 0 — the reference passes
``off = {0,0,0}`` at ``PSF_Estimation.java:145-148``). Because convolution
commutes, the same object serves both sub-problems:

- object step: kernel = PSF, variable = object;
- PSF step:    kernel = object, variable = PSF  (the object-as-kernel trick,
  ``PSF_Estimation.java:148,157``).

TPU mapping: real volumes, so the transform is ``rfftn``/``irfftn`` — half the
FLOPs and bandwidth of the reference's interleaved complex transforms. The
kernel spectrum can be precomputed once per outer round. Gradients come from
``jax.value_and_grad`` (fused cost+gradient like the reference's
``computeCostAndGradient``); the adjoint that autodiff derives is exactly
``irfftn(conj(K_hat) * rfftn(w*r))``.

Optional padded-object support: if the variable lives on a grid larger than
the data (to suppress periodic wraparound), the model is cropped to the
centered data window before the residual — TiPi's R operator.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from microtipi_tpu.utils.arrays import crop_to_shape

__all__ = [
    "PoissonConvCost",
    "WeightedConvolutionCost",
    "convolve",
    "convolve_spectrum",
    "fft_pair",
    "generalized_kl",
]


def auto_exact_fft() -> bool:
    """Backend auto rule shared by every ``exact_fft``-style default: the
    f32-exact matmul-DFT on TPU backends — measured both MORE ACCURATE
    (the XLA TPU FFT is bf16-grade, ~35% RMS spectrum error at 256^3) and
    FASTER (+45-80% solve throughput, it rides the MXU) there; ``jnp.fft``
    on CPU where it is already exact and faster (BASELINE.md round 5)."""
    import jax as _jax

    return _jax.default_backend() in ("tpu", "axon")


def fft_pair(exact: bool = False):
    """(rfftn, irfftn) — ``exact=True`` routes to the highest-precision
    matmul-DFT (``ops.exactfft``): f32-exact transforms on TPU, where the
    XLA FFT runs at bf16-grade internal precision (measured ~35% RMS error
    on a 256^3 white-noise convolution — BASELINE.md round 5 "TPU FFT
    precision"). CPU backends keep ``jnp.fft`` semantics either way (the
    exact path equals it there to f32 round-off; tests pin this)."""
    if exact:
        from microtipi_tpu.ops import exactfft

        return exactfft.rfftn, exactfft.irfftn
    return jnp.fft.rfftn, jnp.fft.irfftn


def generalized_kl(m: jax.Array, d: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Generalized Kullback-Leibler deviance ``sum (m - d) - d*log(m/d)``.

    The Poisson negative log-likelihood of ``d`` under mean ``m``, up to the
    x-independent constant; >= 0 with equality at m == d. ``d == 0`` voxels
    contribute exactly ``m``; the log is guarded at the dtype floor.
    ``mask`` (0/1) excludes voxels entirely (padded regions with no data).
    """
    tiny = jnp.asarray(jnp.finfo(m.dtype).tiny, m.dtype)
    m = jnp.maximum(m, tiny)
    log_ratio = jnp.log(m) - jnp.log(jnp.maximum(d, tiny))
    term = (m - d) - jnp.where(d > 0, d * log_ratio, 0.0)
    return jnp.sum(term if mask is None else mask * term)


def convolve_spectrum(kernel: jax.Array, exact: bool = False) -> jax.Array:
    """Precompute the rfftn spectrum of a corner-origin kernel."""
    return fft_pair(exact)[0](kernel)


def convolve(x: jax.Array, kernel_hat: jax.Array, shape: tuple[int, ...],
             exact: bool = False) -> jax.Array:
    """Circular convolution of ``x`` with a precomputed kernel spectrum."""
    fwd, inv = fft_pair(exact)
    return inv(fwd(x) * kernel_hat, s=shape)


class WeightedConvolutionCost(NamedTuple):
    """Weighted FFT-convolution data fidelity term.

    Fields:
      kernel_hat: rfftn spectrum of the corner-origin kernel, at the
        *variable* grid shape.
      data: observed volume, natural layout.
      weights: per-voxel statistical weights (inverse variance); ``None``
        means uniform 1 (TiPi ``setWeights(null)`` default).
      var_shape: static shape of the optimization variable (>= data shape).

    Build with :meth:`build`; evaluate with :meth:`cost` /
    :meth:`cost_and_gradient`.
    """

    kernel_hat: jax.Array
    data: jax.Array
    weights: jax.Array | None
    var_shape: tuple[int, ...]
    exact: bool = False

    @classmethod
    def build(
        cls,
        kernel: jax.Array,
        data: jax.Array,
        weights: jax.Array | None = None,
        var_shape: tuple[int, ...] | None = None,
        exact: bool = False,
    ) -> "WeightedConvolutionCost":
        """Assemble the cost. ``kernel`` is corner-origin at ``var_shape``
        (defaults to the data shape, the reference's configuration —
        ``PSF_Estimation.java:134-140`` uses dataShape for both spaces)."""
        if var_shape is None:
            var_shape = data.shape
        if kernel.shape != tuple(var_shape):
            raise ValueError(
                f"kernel shape {kernel.shape} != variable shape {tuple(var_shape)}; "
                "use utils.arrays.pad_fft_kernel to embed it"
            )
        if weights is not None and weights.shape != data.shape:
            raise ValueError("weights must match the data shape")
        if weights is not None:
            # Zero weight must EXCLUDE the voxel whatever its value: a
            # NaN/Inf voxel (dead camera pixel, file corruption) otherwise
            # poisons the cost through 0*NaN=NaN (IEEE), defeating the
            # validity mask (weights/updaters.validity_mask) entirely.
            data = jnp.where(weights > 0, data, 0.0)
        return cls(convolve_spectrum(kernel, exact), data, weights,
                   tuple(var_shape), exact)

    # -- model & residual --------------------------------------------------

    def model(self, x: jax.Array) -> jax.Array:
        """Forward model H x = crop(K (*) x) at the data window."""
        hx = convolve(x, self.kernel_hat, self.var_shape, self.exact)
        if hx.shape != self.data.shape:
            hx = crop_to_shape(hx, self.data.shape)
        return hx

    def cost(self, x: jax.Array, alpha: float = 1.0) -> jax.Array:
        """0.5 * alpha * sum w * (H x - d)^2 — the reference evaluates with
        alpha = 1.0 (``PSF_Estimation.java:157,206``)."""
        r = self.model(x) - self.data
        wr2 = r * r if self.weights is None else self.weights * r * r
        return 0.5 * alpha * jnp.sum(wr2)

    def cost_and_gradient(self, x: jax.Array, alpha: float = 1.0):
        """Fused (f, grad f) — TiPi ``computeCostAndGradient`` equivalent."""
        return jax.value_and_grad(partial(self.cost, alpha=alpha))(x)


class PoissonConvCost(NamedTuple):
    """Poisson-likelihood data term (generalized KL deviance).

    For photon-counting data the Gaussian term underweights dim voxels; the
    exact negative log-likelihood of ``d ~ Poisson(H x + b)`` is, up to the
    x-independent constant, the generalized Kullback-Leibler deviance

        f(x) = sum_i  (m_i - d_i) - d_i * log(m_i / d_i),   m = H x + b,

    which is >= 0 with equality at m == d (so costs are interpretable and
    comparable across runs). This is the objective Richardson-Lucy descends
    by EM (``jobs.richardson_lucy``); here it plugs into VMLMB + TV +
    positivity instead. ``background`` b > 0 is recommended under the
    positivity bound (at b = 0 a voxel with m -> 0 and d > 0 is an infinite
    barrier; a tiny internal floor guards the log either way).

    Beyond parity: TiPi's cost zoo is Gaussian-only in the surface the
    reference uses (``PSF_Estimation.java:147-150``).
    """

    kernel_hat: jax.Array
    data: jax.Array
    background: float
    var_shape: tuple[int, ...]
    exact: bool = False

    @classmethod
    def build(
        cls,
        kernel: jax.Array,
        data: jax.Array,
        background: float = 0.0,
        var_shape: tuple[int, ...] | None = None,
        exact: bool = False,
    ) -> "PoissonConvCost":
        if var_shape is None:
            var_shape = data.shape
        if kernel.shape != tuple(var_shape):
            raise ValueError(
                f"kernel shape {kernel.shape} != variable shape {tuple(var_shape)}; "
                "use utils.arrays.pad_fft_kernel to embed it"
            )
        if background < 0:
            raise ValueError("background must be >= 0")
        return cls(convolve_spectrum(kernel, exact), data, float(background),
                   tuple(var_shape), exact)

    def model(self, x: jax.Array) -> jax.Array:
        hx = convolve(x, self.kernel_hat, self.var_shape, self.exact)
        if hx.shape != self.data.shape:
            hx = crop_to_shape(hx, self.data.shape)
        return hx

    def cost(self, x: jax.Array, alpha: float = 1.0) -> jax.Array:
        return alpha * generalized_kl(self.model(x) + self.background, self.data)


# ---------------------------------------------------------------------------
# Uniform-weight fast path: the data term is a circulant quadratic form.
#
#   0.5*||K(*)x - d||^2 = 0.5*<x, A x> - <x, b> + 0.5*||d||^2,
#   A = H^T H  (diagonal |K_hat|^2 in Fourier),  b = H^T d  (precomputed).
#
# One rfftn/irfftn pair yields BOTH the cost and the exact gradient
# (g = A x - b), halving the FFT count of the generic weighted path (whose
# residual must be formed in real space). The custom VJP below makes
# jax.value_and_grad reuse A x instead of differentiating through the FFTs
# (which would add the second FFT pair right back).
# ---------------------------------------------------------------------------


class QuadraticConvCost(NamedTuple):
    """Uniform-weight data term with the 2-FFT fused cost+gradient.

    Only valid when the variable grid equals the data grid (no crop: a crop
    operator breaks circulant structure). ``c`` is the 0.5*||d||^2 constant so
    cost values match ``WeightedConvolutionCost.cost`` exactly.
    """

    kernel_sq: jax.Array  # |K_hat|^2, real, rfftn layout
    b: jax.Array  # H^T d, real space
    c: jax.Array  # 0.5 * sum(d^2)
    shape: tuple[int, ...]
    exact: bool = False

    @classmethod
    def build(cls, kernel: jax.Array, data: jax.Array,
              exact: bool = False) -> "QuadraticConvCost":
        if kernel.shape != data.shape:
            raise ValueError("quadratic fast path requires kernel shape == data shape")
        fwd, inv = fft_pair(exact)
        k_hat = fwd(kernel)
        kernel_sq = jnp.real(k_hat) ** 2 + jnp.imag(k_hat) ** 2
        b = inv(jnp.conj(k_hat) * fwd(data), s=data.shape)
        c = 0.5 * jnp.sum(data * data)
        return cls(kernel_sq, b, c, tuple(data.shape), exact)

    def cost(self, x: jax.Array) -> jax.Array:
        """Differentiable cost; under value_and_grad the gradient is the
        byproduct A x - b (no extra FFTs)."""
        return _quadratic_cost(x, self.kernel_sq, self.b, self.c, self.shape,
                               self.exact)

    def cost_and_gradient(self, x: jax.Array):
        fwd, inv = fft_pair(self.exact)
        ax = inv(self.kernel_sq * fwd(x), s=self.shape)
        f = 0.5 * jnp.vdot(x, ax) - jnp.vdot(x, self.b) + self.c
        return f.real.astype(x.dtype), ax - self.b


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _quadratic_cost(x, kernel_sq, b, c, shape, exact=False):
    fwd, inv = fft_pair(exact)
    ax = inv(kernel_sq * fwd(x), s=shape)
    return (0.5 * jnp.vdot(x, ax) - jnp.vdot(x, b) + c).real.astype(x.dtype)


def _quadratic_cost_fwd(x, kernel_sq, b, c, shape, exact=False):
    fwd, inv = fft_pair(exact)
    ax = inv(kernel_sq * fwd(x), s=shape)
    f = (0.5 * jnp.vdot(x, ax) - jnp.vdot(x, b) + c).real.astype(x.dtype)
    return f, (ax - b)


def _quadratic_cost_bwd(shape, exact, res, g):
    grad = res
    # cotangents for (x, kernel_sq, b, c): only x is differentiated here —
    # the kernel spectrum/b/c are per-round constants in the object step.
    return (g * grad, None, None, None)


_quadratic_cost.defvjp(_quadratic_cost_fwd, _quadratic_cost_bwd)


# ---------------------------------------------------------------------------
# Uniform-weight ACCURATE fast path (3 FFTs/eval): the cost comes from the
# residual sum of squares (no cancellation — the quadratic identity's
# 0.5<x,Ax> - <x,b> + c loses eps*c of resolution, which stalls f32 PSF
# fits, see jobs/psf_fit.py::_fit_data_term), while the gradient reuses the
# forward spectrum: g = irfftn(|K|^2 X) - b — one inverse FFT, not the
# adjoint pair the generic weighted path pays. 2 FFTs (quadratic, f64 fits
# and the object step) < 3 FFTs (this) < 4 FFTs (weighted path).
# ---------------------------------------------------------------------------


class UniformConvCost(NamedTuple):
    """Residual-accurate uniform-weight data term, 3 FFTs per evaluation."""

    kernel_hat: jax.Array  # rfftn spectrum of the kernel
    kernel_sq: jax.Array  # |K_hat|^2
    b: jax.Array  # H^T d
    data: jax.Array
    shape: tuple[int, ...]
    exact: bool = False

    @classmethod
    def build(cls, kernel: jax.Array, data: jax.Array,
              exact: bool = False) -> "UniformConvCost":
        if kernel.shape != data.shape:
            raise ValueError("uniform fast path requires kernel shape == data shape")
        fwd, inv = fft_pair(exact)
        k_hat = fwd(kernel)
        kernel_sq = jnp.real(k_hat) ** 2 + jnp.imag(k_hat) ** 2
        b = inv(jnp.conj(k_hat) * fwd(data), s=data.shape)
        return cls(k_hat, kernel_sq, b, data, tuple(data.shape), exact)

    def cost(self, x: jax.Array) -> jax.Array:
        return _uniform_cost(x, self.kernel_hat, self.kernel_sq, self.b,
                             self.data, self.shape, self.exact)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _uniform_cost(x, kernel_hat, kernel_sq, b, data, shape, exact=False):
    fwd, inv = fft_pair(exact)
    r = inv(kernel_hat * fwd(x), s=shape) - data
    return 0.5 * jnp.sum(r * r)


def _uniform_cost_fwd(x, kernel_hat, kernel_sq, b, data, shape, exact=False):
    fwd, inv = fft_pair(exact)
    x_hat = fwd(x)
    r = inv(kernel_hat * x_hat, s=shape) - data
    f = 0.5 * jnp.sum(r * r)
    grad = inv(kernel_sq * x_hat, s=shape) - b
    return f, grad


def _uniform_cost_bwd(shape, exact, grad, g):
    return (g * grad, None, None, None, None)


_uniform_cost.defvjp(_uniform_cost_fwd, _uniform_cost_bwd)
