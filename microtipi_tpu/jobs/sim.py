"""Structured-illumination microscopy (SIM) reconstruction — lateral 2x.

Beyond-parity modality: linear SIM (Gustafsson 2000; Heintzmann & Cremer
1999) illuminates the sample with a sinusoidal pattern at A angles x P
phases; each raw image downmixes object frequencies from ``k -+ p`` into
the OTF passband, and reconstruction recovers a lateral frequency support
of ``|k| + |p|`` — up to 2x resolution with a pattern near the OTF edge.
The whole pipeline is Fourier-domain linear algebra + batched FFTs, i.e.
exactly the compute shape this framework is built around, and the end
product (a generalized-Wiener division by the summed OTF power) pairs
naturally with the existing deconvolution/apodization machinery.

Two protocols live here:

- **2D/TIRF-SIM** (2-beam, >=3 phases x A angles): lateral-only bands,
  volumetric stacks processed plane-wise — everything below through
  :func:`reconstruct_sim`;
- **3D-SIM** (3-beam, >=5 phases x A angles, 15 images at the classical
  5x3): the three-beam interference adds +-1 orders that carry BOTH a
  lateral frequency p and an axial frequency q, so reconstruction also
  doubles axial resolution and fills the missing cone —
  :func:`simulate_sim3d` / :func:`separate_bands_3d` /
  :func:`reconstruct_sim3d` (Gustafsson et al. 2008, Biophys J 94:4957).

Model per angle a, phase j (2D protocol):

    I_aj(r) = [ x(r) * (1 + m cos(2 pi p_a . r + phi_aj)) ] (*) h(r)

so in Fourier space, with ``S = FFT(x)`` and OTF ``H``:

    D_aj(k) = H(k) [ S(k) + (m/2) e^{+i phi_aj} S(k - p_a)
                           + (m/2) e^{-i phi_aj} S(k + p_a) ]

**Band separation** inverts the P x 3 phase matrix per angle (P >= 3
phases; least squares for P > 3) to recover the three mixed products
``H(k) S(k)``, ``H(k) S(k -+ p_a)`` exactly — noiselessly exact for any
pattern, pinned by tests. **Recombination** shifts each sideband to its
true frequency on a 2x-padded grid (real-space modulation by
``e^{+-i 2 pi p_a . r}`` = exact subpixel Fourier shift) and combines all
bands with matched-filter weights and Wiener damping:

    S_hat(k) = sum_b conj(H_b)(k) B_b(k) / (sum_b |H_b(k)|^2 + w^2)

with a triangle apodization to the extended support (raw Wiener edges
ring; standard practice). **Pattern parameters** come from the data
itself: the sideband/carrier cross-correlation peak refines ``p_a`` to
subpixel and the complex correlation phase gives the absolute pattern
phase — the classical Gustafsson parameter fit, implemented as one
FFT-domain correlation per angle (:func:`estimate_sim_pattern`).

The reference has no SIM (no scanning/patterned modality at all,
SURVEY.md section 0); OTF conventions ride on the widefield pupil
synthesis (``WideFieldModel.java:60-78`` parity notes in
``models/widefield.py``).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "SIMReconstruction",
    "estimate_sim_pattern",
    "reconstruct_sim",
    "reconstruct_sim3d",
    "separate_bands",
    "separate_bands_3d",
    "sim3d_order_otfs",
    "simulate_sim",
    "simulate_sim3d",
]

#: 3D-SIM illumination orders in band-index order (m = lateral order; the
#: +-1 orders carry the axial +-q sidebands inside their effective OTFs).
ORDERS_3D = (0, 1, -1, 2, -2)


def _fft2c(x):
    return jnp.fft.fft2(x.astype(jnp.complex128 if x.dtype == jnp.float64
                                 else jnp.complex64))


def _phase_ramp(shape, p, dtype):
    """``e^{i 2 pi p . r}`` on the (Ny, Nx) grid — the real-space modulation
    that shifts a spectrum by +p (p in cycles/pixel, (py, px))."""
    ny, nx = shape
    y = np.arange(ny)[:, None]
    x = np.arange(nx)[None, :]
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    ph = 2.0 * np.pi * (p[0] * y + p[1] * x)
    return jnp.exp(1j * jnp.asarray(ph).astype(cdtype))


def simulate_sim(x: jax.Array, otf: jax.Array, pattern_k, phases,
                 modulation: float = 1.0) -> jax.Array:
    """Forward model: raw SIM images ``(A, P, Ny, Nx)`` of a 2D object.

    ``otf`` is the fft2 of the corner-origin 2D PSF at the CAMERA grid;
    ``pattern_k`` is ``(A, 2)`` pattern frequencies in cycles/pixel
    ``(ky, kx)``; ``phases`` is ``(A, P)`` radians. Used by the tests and
    for pipeline validation (acquisition simulators live here because the
    pattern convention must match :func:`separate_bands` exactly).
    """
    x = jnp.asarray(x)
    a_k = np.asarray(pattern_k, np.float64)
    phases = np.asarray(phases, np.float64)
    out = []
    for a in range(a_k.shape[0]):
        ramp = _phase_ramp(x.shape, a_k[a], x.dtype)
        row = []
        for j in range(phases.shape[1]):
            illum = 1.0 + modulation * jnp.real(
                ramp * np.exp(1j * phases[a, j]))
            img = jnp.fft.ifft2(_fft2c(x * illum) * otf)
            row.append(jnp.real(img).astype(x.dtype))
        out.append(jnp.stack(row))
    return jnp.stack(out)


def separate_bands(data: jax.Array, phases, modulation: float = 1.0):
    """Unmix carrier and sidebands per angle: ``(A, 3, Ny, Nx)`` complex.

    ``data`` is ``(A, P, Ny, Nx)`` raw images, ``phases`` the known (or
    estimated) pattern phases ``(A, P)``. Returns bands ``[b0, b+, b-]``
    with ``b0 = H(k) S(k)`` and ``b+- = H(k) S(k -+ p)`` — the
    ``(m/2)`` factor is divided out so band amplitudes are commensurate.
    Least-squares inversion of the phase matrix (exact at P = 3).
    """
    d = jnp.asarray(data)
    if d.ndim != 4:
        raise ValueError(f"data must be (A, P, Ny, Nx), got {d.shape}")
    a_n, p_n = d.shape[:2]
    phases = np.asarray(phases, np.float64)
    if phases.shape != (a_n, p_n):
        raise ValueError(f"phases must be ({a_n}, {p_n}), got {phases.shape}")
    if p_n < 3:
        raise ValueError("band separation needs >= 3 pattern phases")
    spec = _fft2c(d)  # (A, P, Ny, Nx)
    half_m = 0.5 * modulation
    bands = []
    for a in range(a_n):
        m = np.stack([
            np.ones(p_n, np.complex128),
            half_m * np.exp(1j * phases[a]),
            half_m * np.exp(-1j * phases[a]),
        ], axis=1)  # (P, 3)
        pinv = jnp.asarray(np.linalg.pinv(m), spec.dtype)  # (3, P)
        bands.append(jnp.einsum("bp,pyx->byx", pinv, spec[a]))
    return jnp.stack(bands)  # (A, 3, Ny, Nx)


def _separate_np(data: np.ndarray, phases: np.ndarray,
                 modulation: float) -> np.ndarray:
    """Host-NumPy band separation for the calibration path (same math as
    :func:`separate_bands`; kept in NumPy so the estimator never touches
    the device — see :func:`estimate_sim_pattern`)."""
    a_n, p_n = data.shape[:2]
    spec = np.fft.fft2(data.astype(np.float64))
    half_m = 0.5 * modulation
    out = np.empty((a_n, 3) + data.shape[2:], np.complex128)
    for a in range(a_n):
        m = np.stack([
            np.ones(p_n, np.complex128),
            half_m * np.exp(1j * phases[a]),
            half_m * np.exp(-1j * phases[a]),
        ], axis=1)
        out[a] = np.einsum("bp,pyx->byx", np.linalg.pinv(m), spec[a])
    return out


def estimate_sim_pattern(data, otf, pattern_k0, phases0,
                         modulation: float = 1.0, refine_radius: int = 2,
                         iterations: int = 2, support: float = 0.05):
    """Refine pattern frequencies and per-angle phase offsets from the data.

    Separating bands with ASSUMED phases that are off by a common offset
    ``delta`` (correct phase steps, e.g. the SLM's 2 pi / P) yields
    EXACTLY ``e^{+-i delta}`` times the true sidebands (the separation
    matrix factorizes — no leakage). At the TRUE pattern frequency the
    per-bin product of the aligned sideband and carrier spectra,

        q(k) = b+(k + p) conj(b0(k)) = e^{i delta} H(k+p) conj(H(k)) |S(k)|^2,

    has CONSTANT phase ``delta`` over the band overlap (H real) — so the
    estimator maximizes the PHASE COHERENCE ``|sum q| / sum |q|`` over
    candidate subpixel shifts (zoomed 5x5 grids, 0.5 -> 0.1 -> 0.02 ->
    0.004 bins; each candidate is one modulate+FFT), and reads
    ``delta = angle(sum q)`` at the optimum. Coherence is the unbiased
    criterion here: two cheaper ones were measured off — the raw
    real-space correlation-magnitude peak sits ~0.2-0.4 bins away (the
    OTF-overlap gradient pulls it inward), and Wiener-prefiltering only
    shrinks that to ~0.1 bins / 0.4 rad, while phase flatness is
    indifferent to magnitude gradients by construction. ``support``
    masks the overlap to bins with both OTFs above this fraction of
    peak. The phase read needs the frequency within ~0.01 bins (a
    residual eta tilts it by ``2 pi eta . centroid``) — hence the deep
    zoom. Frequency and phase couple through the separation, so the
    loop runs ``iterations`` times (default 2).

    HOST NumPy throughout, deliberately: calibration is a setup step and
    the candidate search is hundreds of small FFTs — on the axon TPU
    eager dispatch remote-compiles per op and a complex device->host
    fetch poisons the process (CLAUDE.md platform rules), so the inputs
    are pulled to the host once (pass real arrays; a NumPy ``otf`` is
    accepted directly) and everything runs locally. Only the per-angle
    OFFSET is estimable; the relative phase STEPS in ``phases0`` are
    trusted. Returns ``(pattern_k, phases)``.
    """
    d = np.asarray(data, np.float64)
    a_k = np.asarray(pattern_k0, np.float64).copy()
    ph = np.asarray(phases0, np.float64).copy()
    ny, nx = d.shape[2:]
    yg = np.arange(ny, dtype=np.float64)[:, None]
    xg = np.arange(nx, dtype=np.float64)[None, :]
    h = np.asarray(otf, np.complex128)
    habs = np.abs(h)
    thresh = support * habs.max()

    for _ in range(int(iterations)):
        bands = _separate_np(d, ph, modulation)
        for a in range(a_k.shape[0]):
            b0 = bands[a, 0]
            ip = np.fft.ifft2(bands[a, 1])
            # overlap mask at the nominal shift (candidates move < 1 bin:
            # mask error negligible, and a static mask keeps candidates
            # comparable)
            ramp0 = np.exp(2j * np.pi * (a_k[a][0] * yg + a_k[a][1] * xg))
            h_shift = np.fft.fft2(np.fft.ifft2(h) * np.conj(ramp0))
            mask = (habs > thresh) & (np.abs(h_shift) > thresh)
            b0m = np.where(mask, np.conj(b0), 0.0)

            def q_sum(dy, dx, base=a_k[a].copy()):
                py, px = base[0] + dy / ny, base[1] + dx / nx
                ramp = np.exp(-2j * np.pi * (py * yg + px * xg))
                q = np.fft.fft2(ip * ramp) * b0m
                return q.sum(), np.abs(q).sum()

            best = (-np.inf, 0.0, 0.0)
            r = refine_radius
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    sq, tot = q_sum(float(dy), float(dx))
                    coh = abs(sq) / max(tot, 1e-300)
                    if coh > best[0]:
                        best = (coh, float(dy), float(dx))
            _, fy, fx = best
            for step in (0.5, 0.1, 0.02, 0.004):
                best = (-np.inf, fy, fx)
                for jy in np.linspace(fy - 2 * step, fy + 2 * step, 5):
                    for jx in np.linspace(fx - 2 * step, fx + 2 * step, 5):
                        sq, tot = q_sum(jy, jx)
                        coh = abs(sq) / max(tot, 1e-300)
                        if coh > best[0]:
                            best = (coh, jy, jx)
                _, fy, fx = best
            sq, _tot = q_sum(fy, fx)
            a_k[a] += np.array([fy / ny, fx / nx])
            ph[a] += np.angle(sq)
    return a_k, ph


class SIMReconstruction(NamedTuple):
    """Outcome of :func:`reconstruct_sim`."""

    x: jax.Array  #: reconstructed object on the 2x-upsampled grid
    spectrum_weight: jax.Array  #: sum_b |H_b|^2 on the extended grid (support diagnostic)


def reconstruct_sim(
    data: jax.Array,
    otf: jax.Array,
    pattern_k,
    phases,
    modulation: float = 1.0,
    wiener: float = 1e-2,
    apodize: bool = True,
) -> SIMReconstruction:
    """Generalized-Wiener SIM reconstruction on a 2x grid.

    ``data`` ``(A, P, Ny, Nx)``; ``otf`` the fft2 of the corner-origin 2D
    PSF at the camera grid; ``pattern_k`` ``(A, 2)`` cycles/pixel;
    ``phases`` ``(A, P)``. ``wiener`` is relative to the carrier OTF peak
    (same damping convention as the diversity metric): raise with noise.
    Bands are placed on the padded grid by exact real-space modulation,
    weighted by their shifted conjugate OTFs, and the division is
    apodized with a triangle window to the extended support (raw Wiener
    edges ring — standard practice).
    """
    d = jnp.asarray(data)
    bands = separate_bands(d, phases, modulation)
    a_n = d.shape[0]
    ny, nx = d.shape[2:]
    ny2, nx2 = 2 * ny, 2 * nx
    rdtype = jnp.float64 if d.dtype == jnp.float64 else jnp.float32

    def upsample_spec(spec_small):
        """Zero-pad a corner-origin SPECTRUM onto the 2x-Nyquist grid
        (finer spatial pixels, same FOV): quadrants move to the corners,
        the new mid-band stays zero. Values within the old support are
        preserved exactly (OTF-limited content vanishes before the old
        Nyquist rows, so the split is clean)."""
        big = jnp.zeros((ny2, nx2), spec_small.dtype)
        hy, hx = ny // 2, nx // 2
        big = big.at[:hy, :hx].set(spec_small[:hy, :hx])
        big = big.at[:hy, nx2 - (nx - hx):].set(spec_small[:hy, hx:])
        big = big.at[ny2 - (ny - hy):, :hx].set(spec_small[hy:, :hx])
        big = big.at[ny2 - (ny - hy):, nx2 - (nx - hx):].set(
            spec_small[hy:, hx:])
        return big

    otf_big = upsample_spec(jnp.asarray(otf))
    otf_big_img = jnp.fft.ifft2(otf_big)  # hoisted: shared by all sidebands
    num = jnp.zeros((ny2, nx2),
                    jnp.complex128 if rdtype == jnp.float64 else jnp.complex64)
    den = jnp.zeros((ny2, nx2), rdtype)
    a_k = np.asarray(pattern_k, np.float64)
    # carrier contributions: per-angle numerators, ONE shared denominator
    # term (identical |otf_big|^2 for every angle — accumulated once, x A)
    for a in range(a_n):
        num = num + jnp.conj(otf_big) * upsample_spec(bands[a, 0])
    den = den + a_n * (jnp.real(otf_big) ** 2 + jnp.imag(otf_big) ** 2)
    for a in range(a_n):
        # b+ = H S(k - p) lives at its true frequency after a shift by -p;
        # b- symmetrically by +p (both spectra AND their OTF weights).
        # On the fine grid p is halved (cycles per FINE pixel).
        for b, sign in ((1, -1.0), (2, +1.0)):
            ramp = _phase_ramp((ny2, nx2), sign * a_k[a] / 2.0, rdtype)
            big_b = jnp.fft.fft2(
                jnp.fft.ifft2(upsample_spec(bands[a, b])) * ramp)
            big_h = jnp.fft.fft2(otf_big_img * ramp)
            num = num + jnp.conj(big_h) * big_b
            den = den + jnp.real(big_h) ** 2 + jnp.imag(big_h) ** 2
    otf_peak = jnp.max(jnp.sqrt(jnp.real(otf) ** 2 + jnp.imag(otf) ** 2))
    w2 = (wiener * otf_peak) ** 2  # traced-safe: reconstruct_sim must jit
    s_hat = num / (den + w2)
    if apodize:
        # triangle apodization to the extended lateral support
        kmax = 0.5 + float(np.max(np.hypot(a_k[:, 0], a_k[:, 1])))
        fy = np.fft.fftfreq(ny2) * 2.0  # in original cycles/pixel
        fx = np.fft.fftfreq(nx2) * 2.0
        rr = np.hypot(fy[:, None], fx[None, :])
        apo = jnp.asarray(np.clip(1.0 - rr / kmax, 0.0, 1.0), rdtype)
        s_hat = s_hat * apo
    x = jnp.real(jnp.fft.ifft2(s_hat)).astype(rdtype)
    return SIMReconstruction(x, den)


# ---------------------------------------------------------------------------
# 3D-SIM (3-beam): axial +-1 bands
# ---------------------------------------------------------------------------
#
# Three-beam illumination (0th + both +-1st diffraction orders) interferes to
#
#   I(rho, z) = 1 + m1 cos(2 pi p . rho + phi_j) cos(2 pi q z + psi)
#                 + m2 cos(2 (2 pi p . rho + phi_j))
#
# (p = beam separation in the pupil, q = axial beat between the 0th and the
# +-1st orders). Because the SAMPLE is z-scanned through the pattern, which
# is fixed to the objective, the axial profile multiplies the DETECTION PSF
# while the lateral modulation multiplies the OBJECT: the raw stack is
#
#   D_j = sum_{m=-2..2} e^{i m phi_j} [ (x e^{i m 2 pi p . rho}) (*) h c_m ]
#
# with c_0 = 1, c_{+-1}(z) = (m1/2) cos(2 pi q z + psi), c_{+-2} = m2/2 —
# i.e. the order-m band carries the object spectrum S(k - m p) seen through
# the effective OTF O_m = FFT3[h(r) c_m(z)]; the +-1 OTFs are the detection
# OTF split into two axially shifted copies (H(k -+ q zhat)/2 each, scaled),
# which is what fills the missing cone and extends the axial support by q.


def _fft3(x, axes=None):
    """Full complex 3D FFT, exact matmul-DFT on TPU backends (the XLA 3D
    FFT is bf16-grade there — BASELINE.md round 5; the 2D paths keep
    ``jnp.fft.fft2``, measured f32-exact)."""
    from microtipi_tpu.ops.convolution import auto_exact_fft

    if auto_exact_fft():
        from microtipi_tpu.ops import exactfft

        return exactfft.fftn(x, axes=axes)
    return jnp.fft.fftn(x, axes=axes)


def _ifft3(x, axes=None):
    """Inverse of :func:`_fft3` (same backend policy)."""
    from microtipi_tpu.ops.convolution import auto_exact_fft

    if auto_exact_fft():
        from microtipi_tpu.ops import exactfft

        return exactfft.ifftn(x, axes=axes)
    return jnp.fft.ifftn(x, axes=axes)


def _fftnc(x):
    """3D FFT over the trailing (Nz, Ny, Nx) axes (leading axes are batch)."""
    return _fft3(x.astype(jnp.complex128 if x.dtype == jnp.float64
                          else jnp.complex64), axes=(-3, -2, -1))


def _wrapped_coord(n):
    i = np.arange(n)
    return np.where(i > n // 2, i - n, i).astype(np.float64)


def sim3d_order_otfs(psf: jax.Array, q: float, psi: float = 0.0,
                     m1: float = 1.0, m2: float = 1.0) -> jax.Array:
    """Effective OTFs of the five 3D-SIM orders, ``(5, Nz, Ny, Nx)`` complex.

    ``psf`` is the corner-origin 3D detection PSF; ``q`` the axial pattern
    frequency in cycles per z-plane (``q = dz / axial_period``); ``psi`` the
    axial pattern phase at the focal plane. Orders follow :data:`ORDERS_3D`.
    ``O_m = FFT3[h(r) * c_m(z)]`` with the axial profile evaluated on the
    signed wrapped plane index (the PSF's own z layout).
    """
    h = jnp.asarray(psf)
    nz = h.shape[0]
    zs = _wrapped_coord(nz)
    c1 = 0.5 * m1 * np.cos(2.0 * np.pi * q * zs + psi)
    c1 = jnp.asarray(c1, h.dtype)[:, None, None]
    o0 = _fftnc(h)
    o1 = _fftnc(h * c1)
    o2 = (0.5 * m2) * o0
    return jnp.stack([o0, o1, o1, o2, o2])


def simulate_sim3d(x: jax.Array, psf: jax.Array, pattern_k, phases,
                   q: float, psi: float = 0.0, m1: float = 1.0,
                   m2: float = 1.0) -> jax.Array:
    """Forward 3D-SIM acquisition: raw stacks ``(A, P, Nz, Ny, Nx)``.

    ``x`` is the 3D object, ``psf`` the corner-origin detection PSF,
    ``pattern_k`` ``(A, 2)`` lateral pattern frequencies in cycles/pixel
    ``(ky, kx)`` (the +-2 orders sit at ``2 * pattern_k``), ``phases``
    ``(A, P)`` lateral pattern phases (P >= 5 for separability). Lives here
    for the same reason as :func:`simulate_sim`: the order conventions must
    match :func:`separate_bands_3d` exactly.
    """
    x = jnp.asarray(x)
    otfs = sim3d_order_otfs(jnp.asarray(psf), q, psi, m1, m2)
    a_k = np.asarray(pattern_k, np.float64)
    phases = np.asarray(phases, np.float64)
    cdtype = otfs.dtype
    out = []
    for a in range(a_k.shape[0]):
        ramp = _phase_ramp(x.shape[1:], a_k[a], x.dtype)[None]  # (1, Ny, Nx)
        # per-order blurred components Y_m (complex); D_j mixes them by phase
        y = []
        for i, m in enumerate(ORDERS_3D):
            if m == 0:
                xm = x.astype(cdtype)
            elif m > 0:
                xm = (x * ramp ** m).astype(cdtype)
            else:
                xm = (x * jnp.conj(ramp) ** (-m)).astype(cdtype)
            y.append(_ifft3(_fft3(xm) * otfs[i]))
        row = []
        for j in range(phases.shape[1]):
            d = y[0]
            for i, m in enumerate(ORDERS_3D):
                if m == 0:
                    continue
                d = d + np.exp(1j * m * phases[a, j]) * y[i]
            row.append(jnp.real(d).astype(x.dtype))
        out.append(jnp.stack(row))
    return jnp.stack(out)


def separate_bands_3d(data: jax.Array, phases) -> jax.Array:
    """Unmix the five 3D-SIM orders per angle: ``(A, 5, Nz, Ny, Nx)`` complex.

    ``data`` is ``(A, P, Nz, Ny, Nx)`` raw stacks (P >= 5), ``phases`` the
    known lateral pattern phases ``(A, P)``. Returns bands in
    :data:`ORDERS_3D` order with ``B_m(k) = O_m(k) S(k - m p)`` — exactly
    (least squares for P > 5), the same noiseless-exactness contract as the
    2D :func:`separate_bands` (pinned by tests). Modulation depths stay
    inside the effective OTFs, so no amplitude rescaling happens here.
    """
    d = jnp.asarray(data)
    if d.ndim != 5:
        raise ValueError(f"data must be (A, P, Nz, Ny, Nx), got {d.shape}")
    a_n, p_n = d.shape[:2]
    phases = np.asarray(phases, np.float64)
    if phases.shape != (a_n, p_n):
        raise ValueError(f"phases must be ({a_n}, {p_n}), got {phases.shape}")
    if p_n < 5:
        raise ValueError("3D band separation needs >= 5 pattern phases")
    spec = _fftnc(d)  # (A, P, Nz, Ny, Nx)
    bands = []
    for a in range(a_n):
        m = np.stack([np.exp(1j * mm * phases[a]) for mm in ORDERS_3D],
                     axis=1)  # (P, 5)
        pinv = jnp.asarray(np.linalg.pinv(m), spec.dtype)  # (5, P)
        bands.append(jnp.einsum("bp,pzyx->bzyx", pinv, spec[a]))
    return jnp.stack(bands)  # (A, 5, Nz, Ny, Nx)


def _zeropad_spectrum(spec: jax.Array, out_shape) -> jax.Array:
    """Zero-pad a corner-origin N-D SPECTRUM onto a finer-sampling grid
    (same FOV): each axis's low half keeps its place, the high half moves to
    the end, the new mid-band stays zero — the N-D generalization of the 2D
    ``upsample_spec`` above, with per-axis factor 1 (pass-through) or 2."""
    import itertools

    big = jnp.zeros(tuple(out_shape), spec.dtype)
    per_axis = []
    for n, n2 in zip(spec.shape, out_shape):
        h = n // 2
        if n2 == n:
            per_axis.append([(slice(0, n), slice(0, n))])
        else:
            per_axis.append([(slice(0, h), slice(0, h)),
                             (slice(h, n), slice(n2 - (n - h), n2))])
    for combo in itertools.product(*per_axis):
        src = tuple(c[0] for c in combo)
        dst = tuple(c[1] for c in combo)
        big = big.at[dst].set(spec[src])
    return big


def reconstruct_sim3d(
    data: jax.Array,
    psf: jax.Array,
    pattern_k,
    phases,
    q: float,
    psi: float = 0.0,
    m1: float = 1.0,
    m2: float = 1.0,
    wiener: float = 1e-2,
    apodize: bool = True,
    upsample_z: bool = True,
) -> SIMReconstruction:
    """Generalized-Wiener 3D-SIM reconstruction on a 2x lateral (and by
    default 2x axial) grid.

    ``data`` ``(A, P, Nz, Ny, Nx)`` raw stacks; ``psf`` the corner-origin 3D
    detection PSF; ``pattern_k``/``phases``/``q``/``psi``/``m1``/``m2`` as in
    :func:`simulate_sim3d`. Each separated band is shifted to its true
    lateral frequency by exact real-space modulation together with its
    effective OTF (whose axial +-q structure needs no explicit shift — it is
    already part of ``O_m``), then all five orders x A angles are combined
    with matched-filter weights and Wiener damping, exactly as the 2D
    recombination. ``upsample_z=False`` keeps the axial grid when the
    extended axial support ``kz_max + q`` still fits under the original
    axial Nyquist (saves 2x memory; the default is the safe choice).
    """
    d = jnp.asarray(data)
    bands = separate_bands_3d(d, phases)
    a_n = d.shape[0]
    nz, ny, nx = d.shape[2:]
    fine = (2 * nz if upsample_z else nz, 2 * ny, 2 * nx)
    rdtype = jnp.float64 if d.dtype == jnp.float64 else jnp.float32
    cdtype = jnp.complex128 if rdtype == jnp.float64 else jnp.complex64

    otfs = sim3d_order_otfs(jnp.asarray(psf), q, psi, m1, m2)
    a_k = np.asarray(pattern_k, np.float64)

    num = jnp.zeros(fine, cdtype)
    den = jnp.zeros(fine, rdtype)

    o0_big = _zeropad_spectrum(otfs[0].astype(cdtype), fine)
    # carrier: per-angle numerators, ONE shared denominator term
    for a in range(a_n):
        num = num + jnp.conj(o0_big) * _zeropad_spectrum(
            bands[a, 0].astype(cdtype), fine)
    den = den + a_n * (jnp.real(o0_big) ** 2 + jnp.imag(o0_big) ** 2)

    for i, m in enumerate(ORDERS_3D):
        if m == 0:
            continue
        o_big_img = _ifft3(_zeropad_spectrum(otfs[i].astype(cdtype),
                                             fine))
        for a in range(a_n):
            # band m carries S(k - m p): shift BOTH the band and its OTF by
            # -m p (real-space ramp; on the fine lateral grid p halves)
            ramp = _phase_ramp(fine[1:], -m * a_k[a] / 2.0, rdtype)[None]
            big_b = _fft3(_ifft3(
                _zeropad_spectrum(bands[a, i].astype(cdtype), fine)) * ramp)
            big_h = _fft3(o_big_img * ramp)
            num = num + jnp.conj(big_h) * big_b
            den = den + jnp.real(big_h) ** 2 + jnp.imag(big_h) ** 2
    otf_peak = jnp.max(jnp.abs(jnp.real(otfs[0])))  # H(0) real positive
    w2 = (wiener * otf_peak) ** 2
    s_hat = num / (den + w2)
    if apodize:
        # separable triangle apodization to the extended 3D support
        kmax_lat = 0.5 + float(np.max(np.hypot(a_k[:, 0], a_k[:, 1]))) * 2.0
        fy = np.fft.fftfreq(fine[1]) * 2.0  # original lateral cycles/pixel
        fx = np.fft.fftfreq(fine[2]) * 2.0
        rr = np.hypot(fy[:, None], fx[None, :])
        apo_lat = np.clip(1.0 - rr / kmax_lat, 0.0, 1.0)
        kmax_ax = 0.5 + float(q)
        fz = np.fft.fftfreq(fine[0]) * (2.0 if upsample_z else 1.0)
        apo_ax = np.clip(1.0 - np.abs(fz) / kmax_ax, 0.0, 1.0)
        apo = jnp.asarray(apo_ax[:, None, None] * apo_lat[None], rdtype)
        s_hat = s_hat * apo
    x = jnp.real(_ifft3(s_hat)).astype(rdtype)
    return SIMReconstruction(x, den)
