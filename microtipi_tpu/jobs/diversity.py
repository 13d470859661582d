"""Phase-diversity aberration estimation (Gonsalves 1982; Paxman-Schulz-Fienup 1992).

Beyond-parity extension addressing the framework's central measured
limitation: *fully blind* pupil estimation from one image of an unknown
object is not identifiable — every object-marginalization route is a
measured dead end (BASELINE.md: evidence, ELBO, post-hoc disambiguation),
and the shipped remedies (bead anchor, calibration prior) all require side
information. Phase diversity is the classical way the INSTRUMENT creates
that side information: acquire D >= 2 images of the *same unknown object*,
each through the same pupil plus a KNOWN diversity phase ``theta_d``
(a defocus step of the camera, a deformable-mirror pattern, a cylindrical
lens). The unknown object is common to all channels, so the pupil phase
that renders the channels *mutually consistent* is identifiable without
ever knowing the object.

With the Gaussian data model and circulant convolution the joint problem
over (object, params) has the object eliminated in closed form per Fourier
mode (Paxman, Schulz & Fienup, JOSA A 9, 1992): for each spatial frequency
``k``, the optimal object spectrum is

    Xhat_k = sum_d w_d conj(H_dk) Y_dk / (sum_d w_d |H_dk|^2 + gamma)

and the profiled objective is evaluated here in RESIDUAL form

    E = (0.5/N) sum_k m_k [ sum_d w_d |Y_dk - H_dk Xhat_k|^2 + gamma |Xhat_k|^2 ]

which is algebraically the Paxman metric ``sum w|Y|^2 - |num|^2/(S+gamma)``
but cancellation-free — the subtractive form differences two large
near-equal numbers near convergence and stalls f32 line searches, the same
mechanism (and the same cure) as the residual-form PSF-fit data term
(``jobs/psf_fit._fit_data_term``). ``m_k`` is the rfft multiplicity
(conjugate-pair bins count twice), ``N`` the voxel count, so values are
comparable to the spatial-domain costs.

TPU mapping: the D diversity pupils go through ONE batched 2D FFT
(synthesis parity with ``models/widefield.py``; reference forward at
``epifluorescence/WideFieldModel.java:202-203,241-255``), the metric is a
pure elementwise reduction in the rfft domain, and the whole fit — VMLMB
over the selected parameter families — is one jitted program reusing the
shared scaffolding (``jobs/psf_fit.fit_families_with_cost``). Complex
arrays never leave the device (platform rule).

Geometry guidance (all measured, tests + BASELINE.md):

- **2D planar objects** (``model.shape = (1, Ny, Nx)``): the classical
  setup. Defocus diversity (:func:`defocus_diversity`) works — the 2D PSFs
  at different defoci are not related by any shift. Estimation is
  variance-limited, not biased: phase L2 error scales ~linearly with the
  noise level (64^2 scene, +-0.37-wave defocus pair: ~0.04 at 0.2% noise,
  ~0.1-0.3 at 1% across seeds).
- **3D volumetric stacks**: both defocus and Zernike (astigmatism)
  diversity carry information — a defocus step is NOT an exact cyclic
  shift of the sampled PSF (h(z) is z-band-limited beyond the stack's
  Nyquist, so the shift symmetry is broken; measured: noiseless 3D
  defocus-diversity recovery to 1e-4). But the COMMON-MODE Z4 pupil mode
  is gauge-degenerate with an object z-shift, which the profiled object
  absorbs for free — the metric has a flat valley along it and noise runs
  away down the valley (measured: phase L2 8.2 unpinned vs 0.14 pinned at
  0.5% noise). This is the blind loop's familiar pin-Z4 axial gauge
  (BASELINE.md), so :func:`fit_psf_diversity` pins Z4 automatically for
  volumetric models (``phase_freeze_head=None`` -> 1 when Nz > 1); a
  z-shifted reconstruction is the same reconstruction.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from microtipi_tpu.models.microscope import FAMILY_NAMES, PHASE
from microtipi_tpu.utils.grids import fft_freq2

def _rfftn(*a, **k):
    from microtipi_tpu.ops.convolution import auto_exact_fft, fft_pair

    return fft_pair(auto_exact_fft())[0](*a, **k)


def _irfftn(*a, **k):
    from microtipi_tpu.ops.convolution import auto_exact_fft, fft_pair

    return fft_pair(auto_exact_fft())[1](*a, **k)


__all__ = [
    "defocus_diversity",
    "zernike_diversity",
    "diversity_psfs",
    "diversity_cost",
    "diversity_fit_uncertainty",
    "diversity_object_estimate",
    "fit_psf_diversity",
]


def defocus_diversity(model, deltas, lambda_ni: float | None = None) -> np.ndarray:
    """Known diversity phases for camera/stage defocus steps, ``(D, Ny, Nx)``.

    ``theta_d = 2*pi*delta_d*psi`` with ``psi`` the nominal defocus function
    ``sqrt((ni/lambda)^2 - kx^2 - ky^2)`` on the pupil support (the same
    function the model's own z planes use, ``WideFieldModel.java:1452-1499``
    / ``ops/pupil.defocus_psi``) — i.e. "the d-th image was recorded with the
    camera moved by ``delta_d`` meters along z under nominal optics".
    ``deltas`` are the axial offsets in meters. The diversity is treated as
    KNOWN and fixed through the fit (classical phase-diversity semantics);
    pass ``lambda_ni`` to evaluate psi at a non-nominal ``ni/lambda``.

    Static geometry -> host NumPy float64 (framework convention for
    constants; cast at use sites). Only meaningfully informative for 2D
    planar models — see the module docstring's 3D caveat.
    """
    deltas = np.atleast_1d(np.asarray(deltas, np.float64))
    ny, nx = model.shape[1:]
    if lambda_ni is None:
        lambda_ni = model.ni / model.wavelength
    ky, kx = fft_freq2(ny, nx, model.dxy)
    q = lambda_ni * lambda_ni - kx * kx - ky * ky
    psi = np.sqrt(np.maximum(q, 0.0))  # 0 on the evanescent region
    return (2.0 * np.pi) * deltas[:, None, None] * psi[None]


def zernike_diversity(model, coeffs) -> np.ndarray:
    """Known diversity phases from Zernike coefficients, ``(D, Ny, Nx)``.

    ``coeffs[d, j]`` multiplies the SAME orthonormalized basis mode that the
    model's phase coefficient ``alpha_j`` does (offset 1 radial / 3 full,
    ``WideFieldModel.java:1640-1644``), so a diversity coefficient of 1.0 in
    column j is directly comparable to one radian-scale unit of ``alpha_j``.
    Use a non-radial model (full basis) to express astigmatism/coma
    diversities — the recommended choice for 3D volumetric diversity (module
    docstring). The basis is built once on the host (NumPy), consistent with
    the model's own construction (prefix-stable Gram-Schmidt).
    """
    from microtipi_tpu.ops.zernike import orthonormalize, zernike_basis

    coeffs = np.atleast_2d(np.asarray(coeffs, np.float64))
    ny, nx = model.shape[1:]
    off = model.phase_offset
    n = off + coeffs.shape[1]
    radius_px = model.radius * model.dxy * nx
    z = zernike_basis(max(n, model.n_zern), ny, nx, radius_px,
                      normalize=True, radial=model.radial)
    z = orthonormalize(z)
    return np.tensordot(coeffs, z[off:n], axes=1)


def diversity_psfs(model, params, phases: jax.Array) -> jax.Array:
    """Synthesize the D diversity-channel PSFs, ``(D,) + model.shape``.

    Channel d's pupil field is ``A_d(z) = rho * exp(i(phi + theta_d +
    2*pi*z*dz*psi))`` — the model's own synthesis
    (``WideFieldModel.java:241-255`` / ``models/widefield.py``) with the
    known diversity phase added before the batched FFT; all D*Nz planes go
    through one ``fft2``. ``phases`` is ``(D, Ny, Nx)`` (values outside the
    pupil support are inert: rho is zero there).
    """
    rho, phi, psi, _ = model.compute_pupil(params)
    _, _, zw = model._static()
    nz, ny, nx = model.shape
    theta = jnp.asarray(phases, model.dtype)
    if theta.ndim != 3 or theta.shape[1:] != (ny, nx):
        raise ValueError(f"phases must be (D, {ny}, {nx}), got {theta.shape}")
    defoc = (2.0 * np.pi * model.dz) * jnp.asarray(zw, model.dtype)
    full = (phi[None, None] + theta[:, None]
            + defoc[None, :, None, None] * psi[None, None])
    a = rho[None, None] * jnp.exp(1j * full.astype(model.cdtype))
    a_hat = jnp.fft.fft2(a.astype(model.cdtype))
    norm = jnp.asarray(1.0 / (nx * ny * nz), model.dtype)
    return ((jnp.real(a_hat) ** 2 + jnp.imag(a_hat) ** 2) * norm).astype(model.dtype)


def _rfft_multiplicity(shape, dtype) -> np.ndarray:
    """Conjugate-pair bin multiplicity for an rfftn over a real volume:
    2 everywhere on the halved last axis except the self-conjugate columns
    ix=0 and (even Nx) ix=Nx/2 — makes half-spectrum sums equal full-spectrum
    sums (Parseval)."""
    nx = shape[-1]
    m = np.full(nx // 2 + 1, 2.0)
    m[0] = 1.0
    if nx % 2 == 0:
        m[-1] = 1.0
    return m.astype(dtype)


def diversity_cost(
    model,
    data: jax.Array,
    phases,
    *,
    gamma: float = 1e-3,
    image_weights=None,
):
    """Build the object-profiled phase-diversity objective ``cost(params)``.

    ``data`` is ``(D,) + model.shape`` — D acquisitions of the same unknown
    object; ``phases`` the matching known diversity phases ``(D, Ny, Nx)``.
    ``gamma`` is the Tikhonov damping on the profiled object spectrum,
    RELATIVE to the peak of the channel-summed OTF power ``S_k`` (a Wiener
    ``1/SNR^2`` in spirit): it keeps the out-of-OTF-support bins (S = 0)
    inert and suppresses noise overfitting in weak bins, at the price of a
    small estimation bias that scales with gamma (measured, noiseless
    64^2: phase L2 bias 0.06 at 1e-3, 9e-4 at 1e-5, exact at <=1e-7).
    Default 1e-3 suits ~0.2-1% noise; drop toward 1e-8 for
    noiseless/validation data. ``image_weights``: optional per-image
    scalar inverse-variance weights ``(D,)`` when channel noise levels
    differ.

    Returns a closure for ``psf_fit.fit_families_with_cost`` (the shared
    VMLMB scaffolding; reference fit semantics ``PSF_Estimation.java``).
    See the module docstring for the metric and its residual form.
    """
    d = jnp.asarray(data, model.dtype)
    if d.ndim != 4 or d.shape[1:] != model.shape:
        raise ValueError(
            f"data must be (D,) + {model.shape}, got {d.shape}; build the "
            "model with dataclasses.replace(model, shape=img.shape)")
    phases = jnp.asarray(phases, model.dtype)
    if phases.shape[0] != d.shape[0]:
        raise ValueError(f"{d.shape[0]} images but {phases.shape[0]} diversity phases")
    y_hat = _rfftn(d, axes=(1, 2, 3))
    mult = jnp.asarray(_rfft_multiplicity(model.shape, np.float32), model.dtype)
    n_vox = float(np.prod(model.shape))
    if image_weights is not None:
        w = jnp.asarray(image_weights, model.dtype)[:, None, None, None]
    else:
        w = None

    def cost(params):
        h = diversity_psfs(model, params, phases)
        h_hat = _rfftn(h, axes=(1, 2, 3))
        wh = h_hat if w is None else w * h_hat
        s = jnp.sum(jnp.real(h_hat) * jnp.real(wh)
                    + jnp.imag(h_hat) * jnp.imag(wh), axis=0)
        num = jnp.sum(jnp.conj(wh) * y_hat, axis=0)
        g = gamma * jax.lax.stop_gradient(jnp.max(s))
        x_hat = num / (s + g)
        r = y_hat - h_hat * x_hat[None]
        r2 = jnp.real(r) ** 2 + jnp.imag(r) ** 2
        wr2 = jnp.sum(r2, axis=0) if w is None else jnp.sum(w * r2, axis=0)
        e = wr2 + g * (jnp.real(x_hat) ** 2 + jnp.imag(x_hat) ** 2)
        return (0.5 / n_vox) * jnp.sum(mult * e)

    return cost


def diversity_object_estimate(
    model, params, data: jax.Array, phases, *, gamma: float = 1e-3,
    image_weights=None,
) -> jax.Array:
    """The profiled object at ``params`` — the multi-frame Wiener restoration
    ``irfftn(sum_d w_d conj(H_d) Y_d / (sum_d w_d |H_d|^2 + gamma))``.

    Free once the diversity fit converged (one more synthesis); for a
    regularized reconstruction (TV, positivity) feed the fitted params to
    ``jobs.deconv.deconvolve`` with any one channel instead.
    """
    d = jnp.asarray(data, model.dtype)
    y_hat = _rfftn(d, axes=(1, 2, 3))
    h = diversity_psfs(model, params, phases)
    h_hat = _rfftn(h, axes=(1, 2, 3))
    wh = h_hat if image_weights is None else (
        jnp.asarray(image_weights, model.dtype)[:, None, None, None] * h_hat)
    s = jnp.sum(jnp.real(h_hat) * jnp.real(wh)
                + jnp.imag(h_hat) * jnp.imag(wh), axis=0)
    num = jnp.sum(jnp.conj(wh) * y_hat, axis=0)
    x_hat = num / (s + gamma * jnp.max(s))
    return _irfftn(x_hat, s=model.shape).astype(model.dtype)


def diversity_fit_uncertainty(
    model,
    params,
    families: tuple[int, ...],
    data: jax.Array,
    phases,
    *,
    gamma: float = 1e-3,
    image_weights=None,
    sigma: float | None = None,
    phase_freeze_head: int | None = None,
):
    """1-sigma error bars for a :func:`fit_psf_diversity` solution.

    The Fisher information of the object-PROFILED problem — the Schur
    complement of the joint (params, object) Gaussian Fisher, which is
    separable per Fourier mode because the object enters each mode
    independently (the phase-diversity CRLB construction of Paxman et al.
    1992):

        M_ij = (1/N) sum_k m_k |Xhat_k|^2
               [ sum_d Re(conj(A_dki) A_dkj)
                 - Re(conj(u_ki) u_kj) / (S_k + gamma_abs) ],
        u_ki = sum_d conj(H_dk) A_dki,   A_dki = dH_dk/dtheta_i,

    with ``cov = sigma^2 M^{-1}``. The OTF Jacobian ``A`` comes from
    forward-mode autodiff through the synthesis (k passes). A plain GN on
    the concentrated residual is NOT equivalent here — the profiled
    object estimate carries the noise into the Jacobian and the naive
    formula was measured ~5x optimistic; this form matches the
    Monte-Carlo seed scatter (robust MAD, tests).

    ``sigma`` (per-voxel noise std) defaults to the profiled-residual MLE
    with the correct dof count — the object absorbs one complex dof of
    the D per Fourier mode, so ``sigma^2 ~ sum_channels ||r||^2 /
    ((D-1)*Nvox - k)``; the damped-object term is EXCLUDED (it is signal
    leakage, not noise — including it was measured 2.2x high).

    ``phase_freeze_head`` must MATCH the fit's (None = the same auto rule
    as :func:`fit_psf_diversity`: pin Z4 for volumetric models): frozen
    modes were never estimated, so they are excluded from the Fisher
    variable — including the near-flat pinned gauge direction would both
    fabricate an error bar for a held-fixed parameter and leak its
    near-singularity into the other modes' marginals through the inverse
    (caught in review). Frozen entries come back as NaN in ``std``
    ("held fixed, not estimated").

    Caveat (measured): these are LOCAL (in-basin) error bars. At small
    ``gamma`` an occasional noise realization jumps basins entirely
    (1/16 seeds in the validation MC) — a heavy tail no local covariance
    describes; see the ``gamma`` guidance in :func:`diversity_cost`.
    Returns :class:`~microtipi_tpu.jobs.psf_fit.FitUncertainty` with
    ``std`` as a ``{family: array}`` dict.
    """
    from microtipi_tpu.jobs.psf_fit import FitUncertainty

    d = jnp.asarray(data, model.dtype)
    n_img = d.shape[0]
    phases = jnp.asarray(phases, model.dtype)
    y_hat = _rfftn(d, axes=(1, 2, 3))
    mult = jnp.asarray(_rfft_multiplicity(model.shape, np.float64), model.dtype)
    n_vox = float(np.prod(model.shape))
    w = (None if image_weights is None
         else jnp.asarray(image_weights, model.dtype)[:, None, None, None])

    if phase_freeze_head is None:
        volumetric = model.shape[0] > 1
        phase_freeze_head = 1 if (volumetric and model.n_phase >= 2) else 0
    names = tuple(FAMILY_NAMES[f] for f in families)
    freeze = {nm: (phase_freeze_head if nm == "phase" else 0) for nm in names}
    for nm in names:
        if not 0 <= freeze[nm] < getattr(params, nm).shape[0]:
            raise ValueError(
                f"phase_freeze_head={freeze[nm]} out of range for {nm!r}")
    sizes = [int(getattr(params, nm).shape[0]) - freeze[nm] for nm in names]
    x0 = jnp.concatenate([getattr(params, nm)[freeze[nm]:] for nm in names])

    def otf(v):
        sub, off = {}, 0
        for nm, sz in zip(names, sizes):
            full = getattr(params, nm)
            sub[nm] = full.at[freeze[nm]:].set(v[off:off + sz])
            off += sz
        h = diversity_psfs(model, params._replace(**sub), phases)
        return _rfftn(h, axes=(1, 2, 3))

    h_hat = otf(x0)                       # (D, ...) complex
    a = jax.jacfwd(otf)(x0)               # (D, ..., k) complex
    wh = h_hat if w is None else w * h_hat
    s = jnp.sum(jnp.real(h_hat) * jnp.real(wh)
                + jnp.imag(h_hat) * jnp.imag(wh), axis=0)
    g = gamma * jnp.max(s)
    x_hat = jnp.sum(jnp.conj(wh) * y_hat, axis=0) / (s + g)
    x2 = jnp.real(x_hat) ** 2 + jnp.imag(x_hat) ** 2

    wa = a if w is None else w[..., None] * a
    aa = jnp.einsum("d...i,d...j->...ij", jnp.conj(a), wa).real
    u = jnp.einsum("d...,d...i->...i", jnp.conj(h_hat), wa)
    uu = (jnp.einsum("...i,...j->...ij", jnp.conj(u), u).real
          / (s + g)[..., None, None])
    m = jnp.einsum("zyx,zyxij->ij",
                   (mult * x2).reshape(s.shape), aa - uu) / n_vox
    m = 0.5 * (m + m.T)

    k_model = x0.shape[0]
    if sigma is None:
        r = (y_hat - h_hat * x_hat[None]) * (1.0 if w is None else jnp.sqrt(w))
        rss = jnp.sum(mult * jnp.sum(jnp.real(r) ** 2 + jnp.imag(r) ** 2,
                                     axis=0)) / n_vox
        sigma2 = rss / max((n_img - 1) * n_vox - k_model, 1.0)
        sigma_out = jnp.sqrt(sigma2)
    else:
        sigma_out = jnp.asarray(sigma, model.dtype)
        sigma2 = sigma_out * sigma_out
    eye = jnp.eye(k_model, dtype=m.dtype)
    cov = sigma2 * jnp.linalg.solve(m, eye)
    std_all = jnp.sqrt(jnp.diagonal(cov))
    std, off = {}, 0
    nan = jnp.asarray(jnp.nan, std_all.dtype)
    for nm, sz in zip(names, sizes):
        s = std_all[off:off + sz]
        if freeze[nm]:
            s = jnp.concatenate([jnp.full((freeze[nm],), nan), s])
        std[nm] = s
        off += sz
    return FitUncertainty(std, cov, sigma_out)


def fit_psf_diversity(
    model,
    data: jax.Array,
    phases,
    families: tuple[int, ...] = (PHASE,),
    params0=None,
    config=None,
    *,
    gamma: float = 1e-3,
    image_weights=None,
    phase_active: int | None = None,
    phase_freeze_head: int | None = None,
    phase_anchor: jax.Array | None = None,
    phase_prior_weight: float = 0.0,
    aux_terms: tuple = (),
):
    """Estimate pupil parameters from D diversity images of one unknown object.

    The instrument-side identifiability lever: no bead, no calibration
    prior, no object model — the object is profiled out exactly
    (:func:`diversity_cost`). Use D >= 2 (a single theta=0 image reduces to
    the blind Wiener objective, which is NOT identifiable — the measured
    dead ends in BASELINE.md); defocus steps of ~0.5-2 waves peak-to-valley
    are the classical choice for planar scenes; defocus or astigmatism
    both work for volumetric ones (module docstring).

    ``phase_freeze_head=None`` (default) resolves to 1 (pin Z4) for
    volumetric models (Nz > 1, when the phase family has >= 2 modes) and 0
    for planar ones: in 3D the common-mode Z4 is the object-z-shift gauge
    and noise runs away along its flat valley unpinned (measured — module
    docstring); in 2D it is a real, identifiable aberration. Pass an
    explicit value to override.

    Shares the family-fit semantics of ``fit_psf``/``fit_psf_joint``
    (``PSF_Estimation.java`` parity: VMLMB defaults, graduated
    ``phase_active``, pin-Z4 ``phase_freeze_head``, the scale-invariant
    calibration prior, auxiliary bead terms). Returns a
    ``psf_fit.PsfFitResult``; reconstruct with
    :func:`diversity_object_estimate` or a regularized solve.
    """
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig, fit_families_with_cost

    if params0 is None:
        params0 = model.init_params()
    if config is None:
        config = PsfFitConfig()
    if phase_freeze_head is None:
        volumetric = model.shape[0] > 1
        phase_freeze_head = 1 if (volumetric and model.n_phase >= 2) else 0
    names = tuple(FAMILY_NAMES[f] for f in families)
    cost = diversity_cost(model, data, phases, gamma=gamma,
                          image_weights=image_weights)
    return fit_families_with_cost(
        cost, params0, names, config,
        phase_active=phase_active,
        phase_freeze_head=phase_freeze_head,
        phase_anchor=phase_anchor,
        phase_prior_weight=phase_prior_weight,
        aux_terms=aux_terms,
    )
