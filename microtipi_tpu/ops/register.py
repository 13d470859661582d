"""Volume registration: subvoxel phase correlation + Fourier shifting.

Completes the multi-view fusion workflow (``jobs.richardson_lucy.
multiview_richardson_lucy`` assumes registered views): estimate the rigid
translation between two volumes by phase correlation (Kuglin & Hines 1975)
with subvoxel refinement, then resample by Fourier shift — both exact
FFT-domain operations, so the whole register-then-fuse pipeline stays one
jitted program.

Phase correlation: the normalized cross-power spectrum
``R = F(a) conj(F(b)) / |F(a) conj(F(b))|`` back-transforms to a delta at
the translation. The argmax gives the integer shift (wrapped to signed);
the subvoxel part uses the Foroosh estimator (Foroosh, Zerubia & Berthod,
IEEE TIP 2002) — the correlation peak of a pure translation is a sinc, for
which the two-point ratio ``r_side / (r_side + r_peak)`` is exact, unlike
parabolic interpolation (measured ~0.2-voxel bias on band-limited tests).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["register_translation", "fourier_shift"]


def register_translation(a: jax.Array, b: jax.Array, subvoxel: bool = True) -> jax.Array:
    """Translation ``t`` (voxels, per axis, signed) such that
    ``fourier_shift(b, t)`` aligns ``b`` with ``a``. Jittable.

    Phase correlation assumes the two volumes share one transfer function;
    registering views blurred by DIFFERENT PSFs directly gives biased
    shifts along the blur axes (sinc-lobe sign flips corrupt the
    cross-power phase — measured several voxels of error). Blur-match
    first: register ``convolve(a, psf_b)`` against ``convolve(b, psf_a)``
    — both become ``psf_a * psf_b * object`` and the estimate is exact
    again (see tests/test_register.py's pipeline test).
    """
    if a.shape != b.shape:
        raise ValueError("register_translation requires equal shapes")
    f = jnp.fft.rfftn(a) * jnp.conj(jnp.fft.rfftn(b))
    tiny = jnp.asarray(np.finfo(np.float32).tiny, f.real.dtype)
    r = jnp.fft.irfftn(f / jnp.maximum(jnp.abs(f), tiny), s=a.shape)
    idx = jnp.unravel_index(jnp.argmax(r), a.shape)

    shifts = []
    for ax, (i, n) in enumerate(zip(idx, a.shape)):
        p = i.astype(r.dtype)
        if subvoxel:
            def take(j, ax=ax, idx=idx):
                sel = list(idx)
                sel[ax] = j
                return r[tuple(sel)]

            f0 = r[idx]
            fm = take((i - 1) % n)
            fp = take((i + 1) % n)
            # Foroosh two-point ratio toward the larger neighbor.
            d_pos = fp / jnp.maximum(fp + f0, 1e-30)
            d_neg = -fm / jnp.maximum(fm + f0, 1e-30)
            frac = jnp.where(fp >= fm, d_pos, d_neg)
            p = p + jnp.clip(frac, -0.999, 0.999)
        # wrap to signed shift in (-n/2, n/2]
        shifts.append(jnp.where(p > n / 2, p - n, p))
    return jnp.stack(shifts)


def fourier_shift(x: jax.Array, shift) -> jax.Array:
    """Circularly shift ``x`` by (possibly fractional) ``shift`` voxels per
    axis via the Fourier shift theorem; exact for band-limited content and
    the inverse of the displacement :func:`register_translation` reports."""
    shift = jnp.asarray(shift)
    freqs = [
        jnp.asarray(
            np.fft.rfftfreq(n) if ax == x.ndim - 1 else np.fft.fftfreq(n), x.dtype
        )
        for ax, n in enumerate(x.shape)
    ]
    phase = jnp.zeros((), x.dtype)
    for ax, fr in enumerate(freqs):
        sl = [None] * x.ndim
        sl[ax] = slice(None)
        phase = phase + fr[tuple(sl)] * shift[ax]
    cdtype = jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64
    ramp = jnp.exp((-2j * jnp.pi) * phase.astype(cdtype))
    return jnp.fft.irfftn(jnp.fft.rfftn(x) * ramp, s=x.shape).astype(x.dtype)
