"""Reconstruction / optics quality metrics: FSC resolution and Strehl ratio.

Beyond-parity observability (the reference computes no quality metrics;
SURVEY.md section 5-e lists only cost/iteration counters): the two numbers a
microscopist actually quotes about a reconstruction and an instrument.

- **Fourier Shell Correlation** (Harauz & van Heel 1986): the normalized
  cross-correlation of two volumes' spectra per frequency shell — THE
  standard resolution estimate in microscopy/cryo-EM. Correlate two
  independent acquisitions (or odd/even split volumes) of the same scene;
  the frequency where FSC drops through the threshold (0.143 for
  independent noise realizations, van Heel & Schatz 2005) is the resolution.
- **Strehl ratio**: the aberrated PSF's peak over the unaberrated peak —
  the single-number instrument-quality score (S >= 0.8 is "diffraction
  limited", the Marechal criterion). Computed from any :class:`PsfModel`
  at fitted parameters, so a bead calibration directly grades the optics.

TPU-first shape: the shell sums are one segment-sum over a precomputed
(static, host-side NumPy) shell-index grid — no data-dependent control flow,
jit-friendly, and the FFTs dominate as they should.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "checkerboard_split",
    "fourier_shell_correlation",
    "fsc_resolution",
    "strehl_ratio",
    "strehl_ratio_from_pupil",
]


def checkerboard_split(vol):
    """Two quasi-independent half-volumes from ONE acquisition (single-image
    FRC, Koho et al. 2019): diagonal lateral decimation.

    ``a = vol[:, 0::2, 0::2]``, ``b = vol[:, 1::2, 1::2]`` — the two
    diagonal sub-lattices see the same continuous scene through the same
    optics but carry independent noise realizations, so their FSC measures
    resolution without a second acquisition. Caveats for the caller (the
    CLI prints them): the sub-volumes sample at 2x the lateral pitch, so
    the estimate is bounded at the decimated Nyquist (4 * dxy resolution),
    and sub-pixel aliasing adds a small optimistic bias near that bound —
    use a genuine two-acquisition FSC when it matters. Pass
    ``spacing=(dz, 2*dxy, 2*dxy)`` to :func:`fourier_shell_correlation`.
    Odd trailing rows/columns are trimmed.
    """
    vol = jnp.asarray(vol)
    ny, nx = vol.shape[-2] & ~1, vol.shape[-1] & ~1
    v = vol[..., :ny, :nx]
    return v[..., 0::2, 0::2], v[..., 1::2, 1::2]


def _shell_indices(shape, spacing, n_shells):
    """Static (host) shell-index grid + shell center frequencies.

    Frequencies are physical (cycles/m) when ``spacing`` (dz, dy, dx in
    meters) is given — anisotropic voxels then bin correctly — else in
    index units (cycles/extent). Shells span [0, k_max_lateral]: with
    anisotropic sampling the corners beyond the smallest per-axis Nyquist
    are clipped into the last shell and excluded from the resolution range.
    """
    freqs = [np.fft.fftfreq(n, d) for n, d in zip(shape, spacing)]
    k = np.sqrt(sum(
        f.reshape([-1 if i == ax else 1 for i in range(len(shape))]) ** 2
        for ax, f in enumerate(freqs)
    ))
    k_ny = min(np.abs(f).max() for f in freqs)
    edges = np.linspace(0.0, k_ny, n_shells + 1)
    idx = np.clip(np.digitize(k, edges) - 1, 0, n_shells - 1)
    centers = 0.5 * (edges[:-1] + edges[1:])
    return jnp.asarray(idx.ravel()), centers


def fourier_shell_correlation(a, b, spacing=None, n_shells=None):
    """FSC of two volumes; returns ``(freqs, fsc)`` with ``n_shells`` bins.

    ``spacing``: per-axis sampling (dz, dy, dx) in meters — frequencies come
    back in cycles/m (resolution = 1/frequency); omit for index-unit
    frequencies. The volumes must be registered (``ops.register``) —
    translation misalignment depresses high-frequency shells. Jittable with
    static shape/spacing/n_shells.
    """
    a = jnp.asarray(a)
    if a.shape != jnp.asarray(b).shape:
        raise ValueError("FSC needs equal shapes")
    if spacing is None:
        spacing = (1.0,) * a.ndim
    if n_shells is None:
        n_shells = max(8, min(a.shape) // 2)
    idx, centers = _shell_indices(a.shape, spacing, n_shells)

    from microtipi_tpu.ops.convolution import auto_exact_fft

    if auto_exact_fft():
        from microtipi_tpu.ops import exactfft

        fa = exactfft.fftn(a).ravel()
        fb = exactfft.fftn(b).ravel()
    else:
        fa = jnp.fft.fftn(a).ravel()
        fb = jnp.fft.fftn(b).ravel()
    cross = jax.ops.segment_sum(jnp.real(fa * jnp.conj(fb)), idx, n_shells)
    pa = jax.ops.segment_sum(jnp.abs(fa) ** 2, idx, n_shells)
    pb = jax.ops.segment_sum(jnp.abs(fb) ** 2, idx, n_shells)
    tiny = jnp.asarray(np.finfo(np.float32).tiny, cross.dtype)
    fsc = cross / jnp.maximum(jnp.sqrt(pa * pb), tiny)
    return jnp.asarray(centers, fsc.dtype), fsc


def fsc_resolution(freqs, fsc, threshold: float = 0.143):
    """Resolution from an FSC curve: 1 / (first crossing below ``threshold``).

    Linear interpolation inside the crossing shell; returns ``inf``
    frequency -> resolution 0 never happens — when the curve never drops
    below threshold the last shell's frequency is used (resolution limited
    by sampling, not by the data). Host-side NumPy (a 1D curve).
    """
    f = np.asarray(freqs, np.float64)
    c = np.asarray(fsc, np.float64)
    below = np.nonzero(c < threshold)[0]
    # shell 0 (DC) is degenerate; never report a crossing there
    below = below[below > 0]
    if below.size == 0:
        return 1.0 / f[-1]
    i = int(below[0])
    f0, f1 = f[i - 1], f[i]
    c0, c1 = c[i - 1], c[i]
    t = (c0 - threshold) / max(c0 - c1, 1e-30)
    return 1.0 / (f0 + t * (f1 - f0))


def strehl_ratio(model, params):
    """Peak of the aberrated PSF over the unaberrated peak (same model).

    Works for every :class:`PsfModel` family (it only calls
    ``compute_psf``); both PSFs are peak-normalized by their total energy
    first so models that normalize to unit sum (confocal, light-sheet)
    grade identically to raw-|FFT|^2 models (widefield,
    ``WideFieldModel.java:213``'s PSFnorm cancels in the ratio). The
    corner-origin convention puts the nominal focus at index (0, 0, 0) of
    the centered-peak plane; the peak is taken as a max over the volume so
    focal-shift aberrations (e.g. GL depth) are not misread as loss.
    Marechal: S ~ exp(-sigma_phi^2) for small phase variance, S >= 0.8 is
    conventionally diffraction-limited. Jittable.
    """
    h_ab = model.compute_psf(params)
    h_0 = model.compute_psf(model.init_params())
    return (jnp.max(h_ab) / jnp.sum(h_ab)) / (jnp.max(h_0) / jnp.sum(h_0))


def strehl_ratio_from_pupil(model, phi, rho=None, defocus=None):
    """Strehl of an explicit pupil map (``jobs.phase_retrieval`` output).

    Same peak-over-energy ratio as :func:`strehl_ratio`, with the aberrated
    PSF synthesized from the pixelwise maps
    (``WideFieldConfig.compute_psf_from_pupil``) — grades a retrieved pupil,
    including the localized defects a Zernike expansion can't represent.
    Gauge note: retrieval output already has piston/tip/tilt/psi projected
    out, so the ratio reflects genuine aberration, not bead position.
    """
    h_ab = model.compute_psf_from_pupil(phi, rho=rho, defocus=defocus)
    h_0 = model.compute_psf(model.init_params())
    return (jnp.max(h_ab) / jnp.sum(h_ab)) / (jnp.max(h_0) / jnp.sum(h_0))
