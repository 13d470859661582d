"""f32-exact FFTs for TPU via highest-precision MXU matmul-DFT.

Round-5 finding (BASELINE.md "TPU FFT precision"): the XLA TPU FFT runs
at bf16-grade internal precision — measured ~35% RMS error on a single
256^3 white-noise convolution against the f64 reference, while every
elementwise op and the 2D FFT path are f32-exact (~2e-7). On extended
low-contrast scenes the solvers inherit a few-percent error PER FFT,
amplified by the ill-conditioned inverse to tens of percent of
reconstruction error (measured: CPU f32 == f64 at rel-err 0.2828 on the
blobs scene where the TPU solver lands 0.42-0.57 on identical inputs).

The cure is the round-1 measured fact that a matmul-DFT at
``precision='highest'`` is 1.8e-10-accurate at TIMING PARITY with the XLA
FFT (both bandwidth-bound): this module provides drop-in
``rfftn``/``irfftn`` built from per-axis DFT matrix contractions with
``precision="highest"`` einsums. Complex64 in/out, same spectrum layout
as ``jnp.fft.rfftn`` (half spectrum on the last axis). CPU/f64 backends
should keep ``jnp.fft`` (already exact there) — the
``DeconvolutionConfig.exact_fft`` auto rule does.

Matrices are built per axis length at trace time as numpy constants
(f64-accurate twiddles rounded once to f32) and cached; sizes used here
(<= 1024) keep them tiny next to the volumes.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

__all__ = ["fft", "fftn", "ifft", "ifftn", "irfftn", "rfftn"]

_P = "highest"


@lru_cache(maxsize=None)
def _dft_mats(n: int, wide: bool):
    """(full forward W[n,n], half forward Wh[n, n//2+1])."""
    k = np.arange(n)
    w = np.exp(-2j * np.pi * np.outer(k, k) / n)
    ct = np.complex128 if wide else np.complex64
    return (w.astype(ct), w[:, : n // 2 + 1].astype(ct))


@lru_cache(maxsize=None)
def _idft_mats(n: int, wide: bool):
    """(full inverse Winv[n,n], half-to-real pair (C, S)[n//2+1, n]).

    Half-to-real: x[j] = sum_k c_k (re_k cos(2 pi k j / n) - im_k
    sin(2 pi k j / n)) / n with c_k = 2 except DC and (even n) Nyquist.
    """
    k = np.arange(n)
    ct = np.complex128 if wide else np.complex64
    ft = np.float64 if wide else np.float32
    winv = (np.exp(2j * np.pi * np.outer(k, k) / n) / n).astype(ct)
    nh = n // 2 + 1
    kk = np.arange(nh)
    c = np.full(nh, 2.0)
    c[0] = 1.0
    if n % 2 == 0:
        c[-1] = 1.0
    ang = 2 * np.pi * np.outer(kk, k) / n
    cmat = (c[:, None] * np.cos(ang) / n).astype(ft)
    smat = (c[:, None] * np.sin(ang) / n).astype(ft)
    return winv, cmat, smat


def _wide(dtype):
    return jnp.dtype(dtype) in (jnp.float64, jnp.complex128)


def _to_device(mat):
    """numpy constant -> device array. Complex constants are shipped as a
    real/imag PAIR recombined on device: the axon TPU runtime rejects
    complex host<->device transfers (UNIMPLEMENTED), which would break
    EAGER use of these transforms (under jit the constants embed in the
    program and never transfer, so both paths compile identically)."""
    if np.iscomplexobj(mat):
        import jax as _jax

        return _jax.lax.complex(jnp.asarray(np.ascontiguousarray(mat.real)),
                                jnp.asarray(np.ascontiguousarray(mat.imag)))
    return jnp.asarray(mat)


def _contract(a, mat, axis):
    """Apply: contract ``a``'s ``axis`` with ``mat[in, out]``."""
    a = jnp.moveaxis(a, axis, -1)
    out = jnp.einsum("...i,io->...o", a, _to_device(mat), precision=_P)
    return jnp.moveaxis(out, -1, axis)


def _contract_real_in(a, mat, axis):
    """Contract a REAL ``a`` with a complex ``mat[in, out]``: two real
    matmuls (re/im of the matrix separately) instead of the four a
    complex-cast input costs — the forward rfftn's first (last-axis)
    contraction always has a real input, so this shaves ~1/6 of the
    transform's MXU FLOPs at identical numerics."""
    import jax as _jax

    a = jnp.moveaxis(a, axis, -1)
    mr = np.ascontiguousarray(mat.real)
    mi = np.ascontiguousarray(mat.imag)
    re = jnp.einsum("...i,io->...o", a, jnp.asarray(mr), precision=_P)
    im = jnp.einsum("...i,io->...o", a, jnp.asarray(mi), precision=_P)
    return jnp.moveaxis(_jax.lax.complex(re, im), -1, axis)


def rfftn(x, s=None, axes=None):
    """``jnp.fft.rfftn``-compatible forward transform, f32-exact on TPU.

    Supports the subset the solvers use: full-size transforms over the
    trailing ``x.ndim`` axes (or the given ``axes``), no padding via ``s``
    (``s`` must match the axes' sizes when given).
    """
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    axes = tuple(a % x.ndim for a in axes)
    if s is not None and tuple(s) != tuple(x.shape[a] for a in axes):
        raise NotImplementedError("exactfft.rfftn: s must match input sizes")
    last = axes[-1]
    n_last = x.shape[last]
    wide = _wide(x.dtype)
    _, wh = _dft_mats(n_last, wide)
    if not jnp.issubdtype(x.dtype, jnp.complexfloating):
        out = _contract_real_in(x, wh, last)
    else:
        out = _contract(x.astype(jnp.complex128 if wide else jnp.complex64),
                        wh, last)
    for a in axes[:-1]:
        w, _ = _dft_mats(out.shape[a], wide)
        out = _contract(out, w, a)
    return out


def fft(x, axis=-1):
    """``jnp.fft.fft``-compatible 1D full complex transform along ``axis``
    (the distributed transpose-FFT's z leg — ``parallel/fft.py``)."""
    x = jnp.asarray(x)
    wide = _wide(x.dtype)
    w, _ = _dft_mats(x.shape[axis], wide)
    return _contract(x.astype(jnp.complex128 if wide else jnp.complex64),
                     w, axis % x.ndim)


def ifft(y, axis=-1):
    """``jnp.fft.ifft``-compatible 1D inverse transform along ``axis``."""
    y = jnp.asarray(y)
    wide = _wide(y.dtype)
    winv, _, _ = _idft_mats(y.shape[axis], wide)
    return _contract(y.astype(jnp.complex128 if wide else jnp.complex64),
                     winv, axis % y.ndim)


def fftn(x, axes=None):
    """``jnp.fft.fftn``-compatible full complex transform (the superres
    OTF-resampling path uses it once at setup). Full-size over ``axes``."""
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    axes = tuple(a % x.ndim for a in axes)
    wide = _wide(x.dtype)
    out = x.astype(jnp.complex128 if wide else jnp.complex64)
    for a in axes:
        w, _ = _dft_mats(out.shape[a], wide)
        out = _contract(out, w, a)
    return out


def ifftn(y, axes=None):
    """``jnp.fft.ifftn``-compatible full complex inverse transform."""
    y = jnp.asarray(y)
    if axes is None:
        axes = tuple(range(y.ndim))
    axes = tuple(a % y.ndim for a in axes)
    wide = _wide(y.dtype)
    out = y.astype(jnp.complex128 if wide else jnp.complex64)
    for a in axes:
        winv, _, _ = _idft_mats(out.shape[a], wide)
        out = _contract(out, winv, a)
    return out


def irfftn(y, s=None, axes=None):
    """``jnp.fft.irfftn``-compatible inverse transform, f32-exact on TPU.

    ``s`` (required, like the solvers always pass) gives the real output
    sizes over ``axes`` (default: the trailing ``y.ndim`` axes).
    """
    y = jnp.asarray(y)
    if axes is None:
        axes = tuple(range(y.ndim))
    axes = tuple(a % y.ndim for a in axes)
    if s is None:
        s = tuple(y.shape[a] for a in axes[:-1]) + (2 * (y.shape[axes[-1]] - 1),)
    s = tuple(int(v) for v in s)
    wide = _wide(y.dtype)
    for a, n in zip(axes[:-1], s[:-1]):
        winv, _, _ = _idft_mats(n, wide)
        y = _contract(y, winv, a)
    last = axes[-1]
    n_last = s[-1]
    _, cmat, smat = _idft_mats(n_last, wide)
    re = _contract(jnp.real(y), cmat, last)
    im = _contract(jnp.imag(y), smat, last)
    return re - im
