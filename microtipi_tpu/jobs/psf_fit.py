"""PSF-parameter sub-problem: fit one parameter family to data given the object.

Rebuild of ``microscopy/PSF_Estimation.java``. The essential trick carries
over unchanged: convolution commutes, so the *object* is installed as the
convolution kernel and the synthesized PSF is the image the data term is
evaluated at (``PSF_Estimation.java:147-157``: ``setPSF(obj)`` then cost at
``pupil.getPsf()``).

What the rebuild collapses:

- the reverse-communication VMLMB driver loop (``:199-251``) becomes a
  ``value_and_grad`` closure handed to the functional VMLMB;
- ``pupil.setParam -> computePsf -> computeCostAndGradient ->
  apply_Jacobian`` (``:202-217``) becomes one differentiable composition
  ``cost(compute_psf(params))`` — ``jax.grad`` *is* the Jacobian application;
- best-parameters restore (``:208-216,254``) is VMLMB's best-x tracking.

Defaults mirror the reference: ``grtol = 1e-3`` (``:55``), ``gatol = 0``
(``:54``), ``maxeval = 2*maxiter`` (``:272``), VMLMB memory 5 + More-Thuente
``(0.05, 0.1, 1e-17)`` (``:186-188``). Like the reference, no bounds are
applied to PSF parameters (bounds are computed there but the projector stays
null, ``:168-189``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from microtipi_tpu.models.microscope import FAMILY_NAMES
from microtipi_tpu.ops.convolution import WeightedConvolutionCost
from microtipi_tpu.optim.vmlmb import minimize_vmlmb
from microtipi_tpu.utils.arrays import pad_to_shape

__all__ = [
    "FitUncertainty",
    "PsfFitConfig",
    "PsfFitResult",
    "average_beads",
    "bead_anchor_term",
    "bead_fit_uncertainty",
    "calibrate_field",
    "center_bead_stack",
    "detect_beads",
    "empirical_psf",
    "fit_families_with_cost",
    "fit_psf",
    "fit_psf_beads",
    "fit_psf_joint",
    "fit_uncertainty",
    "joint_variable",
]


@dataclasses.dataclass(frozen=True)
class PsfFitConfig:
    max_iter: int = 20  # PSF_Estimation.java:59
    max_eval: int | None = None  # defaults to 2*max_iter (:272)
    gatol: float = 0.0  # :54
    grtol: float = 1e-3  # :55
    mem: int = 5  # :188
    #: Windowed fit (beyond parity; VERDICT r3 item 3): evaluate the PSF
    #: fit's data term on a CENTERED crop of this shape instead of the full
    #: volume — the fit's ~40 pupil parameters don't need 16.7M voxels of
    #: residual, and the object-as-kernel cost
    #: (``PSF_Estimation.java:147-150``) is shape-agnostic, so the fit
    #: sub-problem simply moves to the crop grid (cropped data + object as
    #: kernel + a window-shaped pupil model; coefficients are
    #: grid-independent physical parameters). Approximation: structure
    #: blurring across the window edge is modeled periodically — keep the
    #: window >= a few PSF supports (measured drift in BASELINE.md).
    #: Lateral dims must be square (the pupil model requires Nx == Ny).
    #: None = full-volume fit (reference semantics). Single-chip loops
    #: only; the sharded loop rejects it.
    fit_window: tuple[int, int, int] | None = None


class PsfFitResult(NamedTuple):
    params: object  # full params pytree with the fitted family replaced
    f: jax.Array
    iterations: jax.Array
    evaluations: jax.Array
    status: jax.Array
    f_history: jax.Array



def _resolve_fit_exact() -> bool:
    """Backend auto rule for the fit transforms — same policy as
    ``jobs.deconv.resolve_exact_fft`` (exact matmul-DFT on TPU backends,
    where the XLA FFT is bf16-grade AND slower — BASELINE.md round 5;
    ``jnp.fft`` elsewhere)."""
    from microtipi_tpu.ops.convolution import auto_exact_fft

    return auto_exact_fft()


def _fit_data_term(obj, data, weights, exact: bool | None = None):
    """Data term for PSF fits: object as kernel (PSF_Estimation.java:147-150).

    f64: the circulant quadratic form (2 FFTs/eval for cost AND psf-space
    gradient via the custom VJP). f32: the residual form (3 FFTs/eval, UniformConvCost) —
    the quadratic identity ``0.5<x,Ax> - <x,b> + c`` cancels catastrophically
    near convergence (f << c, resolution eps*c), which stalls f32 fits after
    the first mode; the residual sum of squares has no cancellation.
    Measured (confocal 16x64x64, f32): quadratic recovers [0.295, -0.0005,
    0.0007] of [0.3, -0.2, 0.1]; residual recovers [0.295, -0.118, 0.133].
    """
    if exact is None:
        exact = _resolve_fit_exact()
    if weights is None:
        if jnp.asarray(data).dtype == jnp.float64:
            from microtipi_tpu.ops.convolution import QuadraticConvCost

            return QuadraticConvCost.build(obj, data, exact=exact)
        from microtipi_tpu.ops.convolution import UniformConvCost

        # 3 FFTs, cancellation-free
        return UniformConvCost.build(obj, data, exact=exact)
    return WeightedConvolutionCost.build(obj, data, weights, exact=exact)


def center_bead_stack(data: jax.Array, subvoxel: bool = True) -> jax.Array:
    """Background-subtract a bead stack and shift the bead to the corner origin.

    The preprocessing half of :func:`fit_psf_beads` (see its docstring for
    the measured rationale): the background is the median, the bead is
    localized at the intensity peak with optional parabolic *lateral*
    subvoxel refinement (the axial position stays integer — a fractional z
    shift is gauge-degenerate with the defocus/Z4 phase mode), and the data
    is Fourier-shifted so the bead sits exactly at index (0, 0, 0), where a
    corner-origin model PSF lives. Returns the centered, background-free
    stack; jit-friendly.
    """
    import numpy as np

    bg = jnp.median(data)
    d = data - bg
    shape = d.shape
    idx = jnp.argmax(d)
    iz, iy, ix = jnp.unravel_index(idx, shape)

    def _frac(i, n, take_axis):
        f0 = d[iz, iy, ix]
        fm = take_axis((i - 1) % n)
        fp = take_axis((i + 1) % n)
        denom = fm - 2.0 * f0 + fp
        s = jnp.where(jnp.abs(denom) > 1e-30, 0.5 * (fm - fp) / denom, 0.0)
        return jnp.clip(s, -0.5, 0.5)

    nz, ny, nx = shape
    pz = iz.astype(d.dtype)
    py = iy.astype(d.dtype)
    px = ix.astype(d.dtype)
    if subvoxel:
        py = py + _frac(iy, ny, lambda j: d[iz, j, ix])
        px = px + _frac(ix, nx, lambda j: d[iz, iy, j])

    fz = jnp.asarray(np.fft.fftfreq(nz), d.dtype)
    fy = jnp.asarray(np.fft.fftfreq(ny), d.dtype)
    fx = jnp.asarray(np.fft.rfftfreq(nx), d.dtype)
    phase = (fz[:, None, None] * pz + fy[None, :, None] * py
             + fx[None, None, :] * px)
    ramp = jnp.exp((2j * jnp.pi) * phase.astype(
        jnp.complex128 if d.dtype == jnp.float64 else jnp.complex64))
    from microtipi_tpu.ops.convolution import fft_pair

    _rfftn, _irfftn = fft_pair(_resolve_fit_exact())
    return _irfftn(_rfftn(d) * ramp, s=shape).astype(d.dtype)


def detect_beads(
    data,
    n_beads: int = 8,
    patch: tuple[int, int, int] | None = None,
    min_separation: int | None = None,
    rel_threshold: float = 0.3,
):
    """Detect up to ``n_beads`` bead candidates and cut patches around them.

    The shared detection front end of :func:`average_beads` (one high-SNR
    synthetic bead) and :func:`calibrate_field` (per-position anchors):
    median background subtraction, greedy peak picking with lateral
    non-max suppression (``min_separation``, default the lateral patch
    size), and patch extraction (peaks whose lateral tails would clip the
    volume edge are skipped; z is clamped, not skipped — calibration
    stacks often hold one z-range). Host-side NumPy (offline path).

    Returns ``(patches, positions)``: background-free float64 patches and
    the matching peak positions ``(z, y, x)`` in volume voxels, brightest
    first. ``rel_threshold``: stop below this fraction of the brightest
    peak (background bumps are not beads).
    """
    import numpy as np

    d = np.asarray(data, np.float64)
    d = d - np.median(d)
    nz, ny, nx = d.shape
    if patch is None:
        # Square laterally: the patch often becomes a PSF-model grid, and
        # the pupil models require Nx == Ny.
        m = min(32, ny, nx)
        patch = (nz, m, m)
    pz, py, px = patch
    if min_separation is None:
        min_separation = max(py, px)

    work = d.copy()
    peaks = []
    first = None
    for _ in range(int(n_beads)):
        idx = np.unravel_index(np.argmax(work), work.shape)
        val = work[idx]
        if first is None:
            first = val
        if val <= 0 or val < rel_threshold * first:
            break
        peaks.append((idx, val))
        z0, y0, x0 = idx
        s = min_separation
        work[:, max(0, y0 - s):y0 + s + 1, max(0, x0 - s):x0 + s + 1] = -np.inf

    patches, positions = [], []
    cy, cx, cz = py // 2, px // 2, pz // 2
    for (z0, y0, x0), val in peaks:
        if not (cy <= y0 <= ny - (py - cy) and cx <= x0 <= nx - (px - cx)):
            continue  # lateral tails would clip
        zlo = min(max(z0 - cz, 0), nz - pz)  # clamp z: the stack often holds one z-range
        patches.append(d[zlo:zlo + pz, y0 - cy:y0 + (py - cy), x0 - cx:x0 + (px - cx)])
        positions.append((z0, y0, x0))
    if not patches:
        raise ValueError("no usable bead found (all candidates clip the patch edges)")
    return patches, positions


def empirical_psf(
    data,
    *,
    n_beads: int = 1,
    patch: tuple[int, int, int] | None = None,
    subvoxel: bool = True,
) -> jax.Array:
    """Distill a measured bead stack into a usable empirical PSF.

    The model-free third calibration path (besides the parametric
    :func:`fit_psf_beads` and the nonparametric ``retrieve_pupil``): when
    the optics fit no model, use the measurement itself. Recipe, each step
    measured on a synthetic off-center bead at SNR ~4e4 (deconvolution
    recovery error vs the true-PSF oracle's 573):

    - ``n_beads > 1``: detect + average beads first (:func:`average_beads`,
      ~sqrt(N) SNR);
    - center to the corner origin with sub-voxel lateral refinement and
      median background subtraction (:func:`center_bead_stack`) — skipping
      this is catastrophic: the raw median-subtracted bead scored 1904,
      WORSE than no deconvolution at all (1780), because an off-center PSF
      translates the whole reconstruction;
    - clamp negatives (noise around zero) to 0 — scored 875;
    - unit-sum normalize (flux-conserving convolution).

    Do NOT threshold the faint tails: zeroing voxels below k*sigma was
    measured to WRECK the result (1479/1582/1670 at k=2/3/5 vs 875 for
    clamp-only) — the PSF's dim wings carry the OTF support that
    deconvolution inverts. Returns a corner-origin, unit-sum volume ready
    for ``deconvolve``/``richardson_lucy`` (note mu is per data-intensity
    unit: a unit-sum PSF keeps blurred intensity at object scale, so the
    usual mu guidance applies unchanged).
    """
    if n_beads > 1:
        import numpy as np

        avg, _used = average_beads(np.asarray(data), n_beads=n_beads, patch=patch)
        data = jnp.asarray(avg)
    c = center_bead_stack(jnp.asarray(data), subvoxel=subvoxel)
    c = jnp.maximum(c, 0.0)
    return c / jnp.maximum(jnp.sum(c), jnp.finfo(c.dtype).tiny)


def average_beads(
    data,
    n_beads: int = 8,
    patch: tuple[int, int, int] | None = None,
    min_separation: int | None = None,
    rel_threshold: float = 0.3,
):
    """Detect up to ``n_beads`` beads in a calibration stack and average them
    into one high-SNR synthetic bead patch (centered layout).

    The ecosystem's standard calibration practice: a bead slide carries many
    sub-resolution beads, and since each is an independent measurement of
    the same PSF, averaging K of them buys ~sqrt(K) SNR — which matters
    because aberrations move the PSF by only a few percent in L2
    (BASELINE.md bead-anchored notes). Pipeline: greedy peak detection
    with non-max suppression (``min_separation``, default the lateral
    patch size), patch extraction around each peak (beads closer than half
    a patch to any lateral edge are skipped — their tails are clipped),
    then subvoxel *plain cross-correlation registration of every patch
    against the brightest one* (all voxels vote; two measured dead ends
    shaped this choice: aligning each bead on its own noisy argmax blurs
    the average with inconsistent +-1-voxel offsets, and NORMALIZED phase
    correlation (``ops.register``) hallucinates ~0.1-voxel shifts between
    identical patches because bead spectra are zero outside the OTF
    support and the cross-power normalization amplifies those bins —
    matched-filter correlation has no such zeros problem), with the axial
    shift rounded to an integer (the axial gauge belongs to the pupil fit,
    same rule as :func:`fit_psf_beads`), matched-filter amplitude
    normalization against the reference, and the mean.

    Host-side NumPy (calibration is offline; no jit needed). Returns
    ``(averaged_patch, n_used)`` — feed the patch to :func:`fit_psf_beads`
    or ``blind_deconvolve(..., bead_data=...)`` with a model at the patch
    shape. ``rel_threshold``: stop accepting peaks below this fraction of
    the brightest (background bumps are not beads).
    """
    import numpy as np

    patches, _positions = detect_beads(
        data, n_beads=n_beads, patch=patch,
        min_separation=min_separation, rel_threshold=rel_threshold)

    def _np_shift(p, t):
        """NumPy Fourier shift by +t voxels per axis. Host math on purpose:
        the jax fourier_shift would dispatch eagerly here, which on the
        remote-compile TPU runtime costs minutes per op (CLAUDE.md), and
        would silently downcast the deliberate float64 accumulation."""
        fz = np.fft.fftfreq(p.shape[0])[:, None, None]
        fy = np.fft.fftfreq(p.shape[1])[None, :, None]
        fx = np.fft.rfftfreq(p.shape[2])[None, None, :]
        ramp = np.exp(-2j * np.pi * (fz * t[0] + fy * t[1] + fx * t[2]))
        return np.fft.irfftn(np.fft.rfftn(p) * ramp, s=p.shape, axes=(0, 1, 2))

    def _xcorr_shift(ref, p):
        """Signed (z, y, x) shift aligning p to ref by plain (matched-filter)
        cross-correlation: integer argmax + parabolic subvoxel refinement."""
        c = np.fft.irfftn(np.fft.rfftn(ref) * np.conj(np.fft.rfftn(p)),
                          s=ref.shape, axes=(0, 1, 2))
        idx = np.unravel_index(np.argmax(c), c.shape)
        out = []
        for ax, (i, n) in enumerate(zip(idx, c.shape)):
            take = list(idx)

            def at(j):
                take[ax] = j % n
                return c[tuple(take)]

            fm, f0, fp = at(i - 1), at(i), at(i + 1)
            den = fm - 2.0 * f0 + fp
            s = np.clip(0.5 * (fm - fp) / den, -0.5, 0.5) if abs(den) > 1e-300 else 0.0
            out.append((i if i <= n // 2 else i - n) + s)
        return np.asarray(out)

    ref = patches[0]  # brightest (peaks come out in amplitude order)
    acc, used = ref.copy(), 1
    rr = float(np.sum(ref * ref))
    for p in patches[1:]:
        t = _xcorr_shift(ref, p)
        t[0] = np.round(t[0])  # axial gauge stays integer
        aligned = _np_shift(p, t)
        amp = float(np.sum(aligned * ref)) / rr  # matched filter vs reference
        if amp <= 0:
            continue
        acc = acc + aligned / amp
        used += 1
    return (acc / used).astype(np.asarray(data).dtype), used


def calibrate_field(
    model,
    data,
    families: tuple[int, ...] = (0, 1),  # (DEFOCUS, PHASE)
    n_beads: int = 8,
    min_separation: int | None = None,
    rel_threshold: float = 0.3,
    config: PsfFitConfig = PsfFitConfig(),
    phase_freeze_head: int = 0,
    subvoxel: bool = True,
):
    """Field-varying calibration: one PSF fit per detected bead.

    Where :func:`average_beads` assumes ONE PSF across the slide (and buys
    SNR by averaging), this assumes the aberrations VARY across the field:
    each detected bead is fitted individually (:func:`fit_psf_beads`, one
    jitted program reused across beads — patches share a shape), and the
    result is ``[( (y, x), params ), ...]`` anchors ready for
    ``jobs.tiled.field_psf`` — the calibration front end of the
    field-varying tiled solver. ``model`` must carry the patch shape
    (``detect_beads``'s default 32x32 lateral patch at the full stack
    depth, i.e. ``(Nz, 32, 32)``).

    Each bead's fit sees that bead's local SNR — no averaging gain; prefer
    bright beads and, when regions are densely seeded, a coarser
    ``n_beads`` with IDW interpolation between them (``field_psf``) over
    fitting every dim bead.

    Returns ``(anchors, fits)`` with ``fits`` the per-bead
    :class:`PsfFitResult` list (inspect ``f``/``status`` to drop bad
    beads; pair with :func:`bead_fit_uncertainty` for error bars).
    """
    patches, positions = detect_beads(
        data, n_beads=n_beads, patch=model.shape[-3:],
        min_separation=min_separation, rel_threshold=rel_threshold)

    fit = jax.jit(lambda d: fit_psf_beads(
        model, d, families=families, config=config,
        phase_freeze_head=phase_freeze_head, subvoxel=subvoxel)[0])
    anchors, fits = [], []
    for (z0, y0, x0), p in zip(positions, patches):
        res = fit(jnp.asarray(p, model.dtype))
        anchors.append(((float(y0), float(x0)), jax.tree.map(jnp.asarray, res.params)))
        fits.append(res)
    return anchors, fits


def bead_anchor_term(model, bead_data: jax.Array, subvoxel: bool = True):
    """Build a bead-stack data term ``term(params) -> cost`` for anchored fits.

    The *structural* calibration anchor (vs the quadratic ``prior_weight``
    point-estimate prior): the bead measurement itself stays in the joint
    objective, so pupil modes the bead constrains well are pinned hard while
    poorly-constrained modes stay free for the sample data to determine —
    the uncertainty structure a scalar prior weight cannot express.

    A sub-resolution bead is a delta object, so the convolution data term
    collapses: ``K = amp * delta`` makes the model just ``amp * h(params)``
    — no FFTs. Bead brightness ``amp`` AND a constant residual background
    ``c`` (the median estimate in :func:`center_bead_stack` is biased by the
    PSF's own tail mass) are nuisance parameters profiled out analytically
    — the 2x2 linear least-squares ``min_{amp,c} 0.5*||amp*h + c - d||^2``
    substituted back. The substituted value is evaluated in RESIDUAL form
    (an explicit ``0.5*||amp*h + c - d||^2`` sum of squares), not via the
    normal-equations shortcut ``0.5*(||d||^2 - amp*<h,d> - c*<1,d>)``:
    the shortcut differences large near-equal numbers and in f32 the
    cancellation noise (~eps*||d||^2, orders above the tiny optimal
    residual) wrecks the More-Thuente value comparisons — measured on the
    serving bead calibration (f32, 6x24x24): the shortcut form line-search-
    stalls after 4 iterations with one phase mode 5x off, the residual form
    converges. Same cancellation mechanism, same cure as the fit data
    term's residual form (``_fit_data_term``).

    This is the same objective :func:`fit_psf_beads` alternates over,
    without its amplitude-staleness and background bias. ``model`` must
    carry the *bead stack's* geometry (same optics as the sample model:
    ``dataclasses.replace(model, shape=bead_data.shape)``); see
    ``jobs.blind.blind_deconvolve`` for the loop wiring. The stack is
    centered once here (:func:`center_bead_stack`).
    """
    if bead_data.shape != model.shape:
        raise ValueError(
            f"bead model shape {model.shape} != bead stack shape {bead_data.shape}; "
            "build it with dataclasses.replace(sample_model, shape=bead_data.shape)"
        )
    d0 = center_bead_stack(bead_data, subvoxel=subvoxel)
    s1d = jnp.sum(d0)
    n = float(d0.size)

    def term(params):
        h = model.compute_psf(params)
        shh = jnp.sum(h * h)
        sh1 = jnp.sum(h)
        shd = jnp.sum(h * d0)
        det = shh * n - sh1 * sh1  # > 0 unless h is constant
        tiny = jnp.asarray(jnp.finfo(h.dtype).tiny, h.dtype)
        det = jnp.maximum(det, tiny)
        amp = (n * shd - sh1 * s1d) / det
        c = (shh * s1d - sh1 * shd) / det
        r = amp * h + c - d0
        return 0.5 * jnp.sum(r * r)

    return term


def _combine_aux_terms(param_of, aux_terms):
    """Natural-weight mixing of auxiliary data terms into a PSF-fit objective.

    Each ``(term, w)`` contributes ``w * term(params)`` — raw intensity
    units, so ``w = 1`` is the joint maximum-likelihood objective when both
    stacks share the same (uniform) noise weighting; set
    ``w = sigma_data^2 / sigma_aux^2`` when noise levels differ. Natural
    weighting deliberately: an earlier scale-invariant ``f0_data/f0_aux``
    normalization (like the calibration prior's) was measured to AMPLIFY a
    low-SNR bead stack's noise floor into a dominant random pull (the aux
    cost at a weak bead is ~flat ||noise||^2, and dividing by it blows the
    noisy landscape up to data-term magnitude — anchored fits came out
    WORSE than free ones). A quadratic coefficient prior has no intensity
    scale, so normalizing it is right; a *data term* has one, so its
    information content must keep its own weight.
    """

    def extra(v):
        p = param_of(v)
        out = 0.0
        for term, w in aux_terms:
            out = out + w * term(p)
        return out

    return extra


def fit_psf(
    model,
    params,
    flag: int,
    data: jax.Array,
    obj: jax.Array,
    weights: jax.Array | None = None,
    config: PsfFitConfig = PsfFitConfig(),
    active: int | None = None,
    freeze_head: int = 0,
    precondition: bool = False,
    anchor: jax.Array | None = None,
    prior_weight: float = 0.0,
    aux_terms: tuple = (),
) -> PsfFitResult:
    """Fit the parameter family selected by ``flag`` (DEFOCUS/PHASE/MODULUS/DEPTH).

    ``model`` is a PSF model config (e.g. ``WideFieldConfig``); ``obj`` is the
    current object estimate at the data shape (the reference pads weights to
    the PSF shape, ``PSF_Estimation.java:322-324`` — here data/obj/PSF share
    one grid, and a larger obj is center-cropped upstream).

    ``active`` (static) fits only the family's first ``active`` coefficients,
    freezing the rest — the graduated/mode-scheduled optimization used to
    stabilize blind estimation (fit low-order aberrations first).
    ``freeze_head`` (static) additionally freezes the first k coefficients —
    e.g. ``freeze_head=1`` on the full-basis PHASE family pins Zernike Z4,
    whose gauge degeneracy with an object z-shift lets blind alternation
    drift (BASELINE.md quality notes).

    ``precondition`` rescales each coefficient by its initial gradient
    magnitude (one extra gradient evaluation) — needed for families whose
    components live on wildly different physical scales, like the GL DEPTH
    family's (ns/lambda ~ 1e6 1/m, d ~ 1e-6 m): unpreconditioned, the
    first steepest-descent step is meters of depth, the search collapses to
    nothing, and the fit stalls (measured). Off by default — the
    reference-parity families match the reference's unscaled behavior.
    """
    family = FAMILY_NAMES[flag]
    full0 = getattr(params, family)
    if full0.shape[0] == 0:
        raise ValueError(f"family {family!r} has no coefficients to fit")
    if active is None or active >= full0.shape[0]:
        active = full0.shape[0]
    if not 0 <= freeze_head < active:
        raise ValueError(f"freeze_head={freeze_head} must be in [0, active={active})")
    x0 = full0[freeze_head:active]

    if weights is not None and weights.shape != data.shape:
        weights = pad_to_shape(weights, data.shape)

    cost = _fit_data_term(obj, data, weights)

    def param_of(v):
        return params._replace(**{family: full0.at[freeze_head : freeze_head + v.shape[0]].set(v)})

    def data_objective(v):
        return cost.cost(model.compute_psf(param_of(v)))

    extra_parts = []
    if prior_weight > 0:
        # Calibration prior in the family's raw units, normalized by the
        # data cost at the fit start (scale-invariant weight — see
        # fit_psf_joint and the BASELINE.md calibration-prior table).
        anchor_v = (full0 if anchor is None else anchor)[freeze_head:active]
        f0 = data_objective(x0)
        extra_parts.append(lambda v: prior_weight * f0 * jnp.sum((v - anchor_v) ** 2))
    if aux_terms:
        # Bead-anchored (or other auxiliary-stack) joint terms; see
        # bead_anchor_term for the structural-anchor rationale.
        extra_parts.append(_combine_aux_terms(param_of, aux_terms))
    if extra_parts:

        def objective(v):
            out = data_objective(v)
            for e in extra_parts:
                out = out + e(v)
            return out

    else:
        objective = data_objective

    if precondition:
        g0 = jax.grad(objective)(x0)
        gmax = jnp.max(jnp.abs(g0))
        tiny = jnp.asarray(jnp.finfo(gmax.dtype).tiny, gmax.dtype)
        scale = 1.0 / jnp.maximum(jnp.abs(g0), jnp.maximum(1e-12 * gmax, tiny))
        fun = jax.value_and_grad(lambda u: objective(u * scale))
        res = minimize_vmlmb(
            fun, x0 / scale,
            mem=config.mem, maxiter=config.max_iter, maxeval=config.max_eval,
            gatol=config.gatol, grtol=config.grtol,
        )
        x_fit = res.x * scale
    else:
        fun = jax.value_and_grad(objective)
        res = minimize_vmlmb(
            fun,
            x0,
            mem=config.mem,
            maxiter=config.max_iter,
            maxeval=config.max_eval,
            gatol=config.gatol,
            grtol=config.grtol,
        )
        x_fit = res.x
    return PsfFitResult(
        params._replace(**{family: full0.at[freeze_head:active].set(x_fit)}),
        res.f,
        res.iterations,
        res.evaluations,
        res.status,
        res.f_history,
    )


def fit_families_with_cost(
    cost,
    params,
    names: tuple[str, ...],
    config: "PsfFitConfig",
    phase_active: int | None = None,
    phase_freeze_head: int = 0,
    phase_anchor: jax.Array | None = None,
    phase_prior_weight: float = 0.0,
    aux_terms: tuple = (),
) -> "PsfFitResult":
    """The VMLMB fit scaffolding over an abstract ``cost(params)`` closure —
    single-family (graduated ``phase_active`` scheduling, pin-Z4
    ``phase_freeze_head``, the scale-invariant calibration prior, per-
    component preconditioning for the physical-scale DEPTH/SHEET families)
    for one name, the gradient-balanced :func:`joint_variable` fit for
    several. Shared by the depth-varying fits (``jobs.depthvar`` dense and
    ``parallel.depthvar`` sharded), whose data terms differ only in the
    forward operator; semantics match :func:`fit_psf`/:func:`fit_psf_joint`
    (reference parity notes there, ``PSF_Estimation.java``).
    """
    for n in names:
        if getattr(params, n).shape[0] == 0:
            raise ValueError(f"family {n!r} has no coefficients to fit")

    if len(names) == 1:
        family = names[0]
        full0 = getattr(params, family)
        active = full0.shape[0]
        freeze = 0
        if family == "phase":
            if phase_active is not None and phase_active < active:
                active = phase_active
            freeze = phase_freeze_head
            if not 0 <= freeze < active:
                raise ValueError(
                    f"phase_freeze_head={freeze} must be in [0, active={active})")
        x0 = full0[freeze:active]

        def rebuild(v):
            return params._replace(
                **{family: full0.at[freeze:freeze + v.shape[0]].set(v)})

        def data_objective(v):
            return cost(rebuild(v))

        extra_parts = []
        if phase_prior_weight > 0 and family == "phase":
            anchor_v = (full0 if phase_anchor is None
                        else phase_anchor)[freeze:active]
            f0 = data_objective(x0)
            extra_parts.append(
                lambda v: phase_prior_weight * f0 * jnp.sum((v - anchor_v) ** 2))
        if aux_terms:
            extra_parts.append(_combine_aux_terms(rebuild, aux_terms))

        def objective(v):
            out = data_objective(v)
            for e in extra_parts:
                out = out + e(v)
            return out

        if family in ("depth", "sheet"):
            # Per-component preconditioning: these families mix physical
            # scales (ns/lambda ~ 1e6 1/m next to d ~ 1e-6 m) — see
            # fit_psf(precondition=True) for the measured stall.
            g0 = jax.grad(objective)(x0)
            gmax = jnp.max(jnp.abs(g0))
            tiny = jnp.asarray(jnp.finfo(gmax.dtype).tiny, gmax.dtype)
            scale = 1.0 / jnp.maximum(jnp.abs(g0),
                                      jnp.maximum(1e-12 * gmax, tiny))
            res = minimize_vmlmb(
                jax.value_and_grad(lambda u: objective(u * scale)),
                x0 / scale, mem=config.mem, maxiter=config.max_iter,
                maxeval=config.max_eval, gatol=config.gatol,
                grtol=config.grtol,
            )
            x_fit = res.x * scale
        else:
            res = minimize_vmlmb(
                jax.value_and_grad(objective), x0,
                mem=config.mem, maxiter=config.max_iter,
                maxeval=config.max_eval, gatol=config.gatol,
                grtol=config.grtol,
            )
            x_fit = res.x
        return PsfFitResult(rebuild(x_fit), res.f, res.iterations,
                            res.evaluations, res.status, res.f_history)

    # Joint path: gradient-balanced multi-family variable.
    f0, g0 = jax.value_and_grad(
        lambda sub: cost(params._replace(**sub))
    )({n: getattr(params, n) for n in names})
    x0, rebuild = joint_variable(params, names, phase_freeze_head, grads=g0)

    use_prior = phase_prior_weight > 0 and "phase" in names
    if use_prior and phase_anchor is None:
        phase_anchor = params.phase
    extra = _combine_aux_terms(rebuild, aux_terms) if aux_terms else None

    def objective(v):
        p = rebuild(v)
        f = cost(p)
        if use_prior:
            f = f + phase_prior_weight * f0 * jnp.sum((p.phase - phase_anchor) ** 2)
        if extra is not None:
            f = f + extra(v)
        return f

    res = minimize_vmlmb(
        jax.value_and_grad(objective), x0,
        mem=config.mem, maxiter=config.max_iter, maxeval=config.max_eval,
        gatol=config.gatol, grtol=config.grtol,
    )
    return PsfFitResult(rebuild(res.x), res.f, res.iterations,
                        res.evaluations, res.status, res.f_history)


def joint_variable(params, names: tuple[str, ...], phase_freeze_head: int = 0,
                   grads=None):
    """(x0, rebuild) for a multi-family fit, with per-family preconditioning
    so no family dominates the shared L-BFGS metric; the first
    ``phase_freeze_head`` coefficients of the PHASE family are frozen
    (pin-Z4 composes with the joint fit). Shared by the dense and
    mesh-sharded joint fits.

    ``grads`` (dict family -> initial raw gradient) selects
    *gradient-balanced* scaling: each family's scaled initial gradient gets
    unit inf-norm. This matters: defocus lives in 1/m (~1e6) with gradients
    orders of magnitude above the Zernike coefficients', and the older
    initial-VALUE scaling left the first steepest-descent step moving only
    defocus — the phase coordinates of a joint fit stalled at zero (measured
    on the flagship example). Falls back to value scaling without ``grads``.

    The heterogeneous physical families (GL DEPTH: ns/lambda ~ 1e6 1/m next
    to d ~ 1e-6 m; light-sheet SHEET: offset z0 next to waist w0) get
    per-COMPONENT scaling — the same recipe as ``fit_psf(precondition=True)``
    — because one inf-norm scale per family leaves their small-gradient
    coordinate stuck (measured on the SHEET bead calibration: the
    family-scaled joint fit line-search-failed with the waist 11% off and
    the cost 270x above the reachable minimum; per-component scaling
    converges to the true geometry)."""
    import jax.numpy as jnp

    _HETEROGENEOUS = ("depth", "sheet")
    if grads is not None:
        gmax = {n: jnp.max(jnp.abs(grads[n])) for n in names}
        leaves = list(gmax.values())
        global_max = leaves[0]
        for l in leaves[1:]:
            global_max = jnp.maximum(global_max, l)
        tiny = jnp.asarray(jnp.finfo(global_max.dtype).tiny, global_max.dtype)
        floor = jnp.maximum(1e-12 * global_max, tiny)
        scales = {
            n: 1.0 / jnp.maximum(jnp.abs(grads[n]) if n in _HETEROGENEOUS
                                 else gmax[n], floor)
            for n in names
        }
    else:
        scales = {n: jnp.maximum(jnp.max(jnp.abs(getattr(params, n))), 1.0) for n in names}
    k = phase_freeze_head

    def var_of(n):
        full = getattr(params, n) / scales[n]
        return full[k:] if (n == "phase" and k > 0) else full

    x0 = {n: var_of(n) for n in names}

    def rebuild(v):
        out = {}
        for n in names:
            if n == "phase" and k > 0:
                full = getattr(params, n)
                out[n] = full.at[k:].set(v[n] * scales[n])
            else:
                out[n] = v[n] * scales[n]
        return params._replace(**out)

    return x0, rebuild


def fit_psf_joint(
    model,
    params,
    flags: tuple[int, ...],
    data: jax.Array,
    obj: jax.Array,
    weights: jax.Array | None = None,
    config: PsfFitConfig = PsfFitConfig(),
    phase_freeze_head: int = 0,
    phase_anchor: jax.Array | None = None,
    phase_prior_weight: float = 0.0,
    aux_terms: tuple = (),
) -> PsfFitResult:
    """Fit several parameter families *simultaneously* in one VMLMB run.

    Beyond-parity: the reference alternates per-family fits because its
    optimizer is bound to one typed vector space at a time
    (``PSF_Estimation.java:117,144``); coupled families (defocus <-> phase
    Z4) zig-zag under that coordinate descent. Here the variable is simply
    the sub-pytree of the selected families (see :func:`joint_variable` for
    the per-family scaling and the pin-Z4 freeze).

    ``phase_anchor``/``phase_prior_weight``: calibration prior. The
    objective gains ``w * f0 * ||phase - anchor||^2`` with ``f0`` the data
    cost at the fit start (so the weight is scale-invariant). Measured
    (BASELINE.md calibration-prior table): at w ~ 1e-2, refitting from a
    bead calibration IMPROVES on both free refitting (which drifts toward
    the object-absorbed basin) and on trusting the calibration outright —
    the only measured lever to do so.
    """
    names = tuple(FAMILY_NAMES[f] for f in flags)
    for n in names:
        if getattr(params, n).shape[0] == 0:
            raise ValueError(f"family {n!r} has no coefficients to fit")
    if weights is not None and weights.shape != data.shape:
        weights = pad_to_shape(weights, data.shape)
    cost = _fit_data_term(obj, data, weights)

    # One extra evaluation seeds the gradient-balanced scaling (and the
    # prior's scale-invariant f0 normalization).
    f0, g0 = jax.value_and_grad(
        lambda sub: cost.cost(model.compute_psf(params._replace(**sub)))
    )({n: getattr(params, n) for n in names})
    x0, rebuild = joint_variable(params, names, phase_freeze_head, grads=g0)

    use_prior = phase_prior_weight > 0 and "phase" in names
    if use_prior and phase_anchor is None:
        phase_anchor = getattr(params, "phase")
    # Bead-anchored (or other auxiliary-stack) joint terms; see
    # bead_anchor_term for the structural-anchor rationale.
    extra = _combine_aux_terms(rebuild, aux_terms) if aux_terms else None

    def objective(v):
        p = rebuild(v)
        f = cost.cost(model.compute_psf(p))
        if use_prior:
            f = f + phase_prior_weight * f0 * jnp.sum((p.phase - phase_anchor) ** 2)
        if extra is not None:
            f = f + extra(v)
        return f

    res = minimize_vmlmb(
        jax.value_and_grad(objective), x0,
        mem=config.mem, maxiter=config.max_iter, maxeval=config.max_eval,
        gatol=config.gatol, grtol=config.grtol,
    )
    return PsfFitResult(
        rebuild(res.x),
        res.f, res.iterations, res.evaluations, res.status, res.f_history,
    )


def fit_psf_beads(
    model,
    data: jax.Array,
    families: tuple[int, ...] = (0, 1),  # (DEFOCUS, PHASE)
    params0=None,
    config: PsfFitConfig = PsfFitConfig(),
    phase_freeze_head: int = 0,
    rounds: int = 2,  # retained for API compatibility; unused (see below)
    subvoxel: bool = True,
):
    """Calibrate PSF parameters from a bead (point-source) stack.

    The ecosystem's standard PSF-calibration workflow (the reference obtains
    its pupils via Icy tooling; microTiPi itself assumes the fit harness
    exists — ``PSF_Estimation.java`` fits against an arbitrary object): a
    sub-resolution bead IS a delta object, so the measured stack equals the
    shifted, scaled PSF.

    Two details make this robust on real data:

    - **Subvoxel centering** (``subvoxel=True``): the bead position is
      localized to a fraction of a voxel (parabolic peak interpolation) and
      the *data* is Fourier-shifted so the bead sits exactly at the origin —
      a half-voxel residual lateral shift would otherwise masquerade as tilt
      in the fitted pupil. The object is then an exact integer delta.
      Lateral (y, x) only: a fractional *z* shift is gauge-degenerate with
      the defocus/Z4 phase mode, and pre-correcting it silently steals that
      mode from the fit (measured here, and the same failure as the
      rejected z-recentering lever in BASELINE.md) — the z position stays
      integer and the pupil fit owns the axial gauge.
    - **Profiled amplitude and background** (variable projection): a
      sub-resolution bead is a delta object, so the convolution model
      collapses to ``amp * h(params) + c`` — no FFTs — and the nuisance
      pair ``(amp, c)`` has a closed-form optimum substituted back into the
      objective (:func:`bead_anchor_term`). The amplitude is therefore
      *always* optimal for the current geometry inside the differentiated
      graph. The previous design alternated a frozen matched-filter
      amplitude with geometry refits (``rounds``); measured on the
      light-sheet SHEET calibration, that alternation is a slow coordinate
      descent that line-search-stalls at the stale-amplitude optimum
      (waist 11% off, cost 1500x above the reachable minimum after 8
      rounds / 240 iterations) while the profiled objective reaches the
      true geometry in 9 iterations. ``rounds`` is kept in the signature
      for compatibility and ignored.

    Jit-friendly (argmax/median/scatter/Fourier shift all trace). Returns
    ``(PsfFitResult, amplitude)``; the fitted PSF is
    ``model.compute_psf(result.params)``.
    """
    del rounds
    if params0 is None:
        params0 = model.init_params()
    names = tuple(FAMILY_NAMES[f] for f in families)
    for n in names:
        if getattr(params0, n).shape[0] == 0:
            raise ValueError(f"family {n!r} has no coefficients to fit")
    # The profiled-amplitude/background bead objective (centers the stack).
    # The profiled objective is scale-equivariant (scaling d scales the cost
    # by s^2 without moving the argmin), so the stack is normalized to unit
    # peak first: at raw camera scales (ADU ~ 1e5, cost ~ 1e7) the f32
    # line search stalls at the very first iterate — the trial-point value
    # differences fall at the dtype's resolution eps*f — while the
    # normalized fit converges identically to f64 (measured on chip:
    # raw-scale fit returns phase [0,0,0] status=line-search-fail, the
    # same stack scaled recovers [0.348, -0.191, 0.105] in 4 iterations).
    data = jnp.asarray(data)
    peak = jnp.maximum(jnp.max(jnp.abs(data)),
                       jnp.asarray(jnp.finfo(data.dtype).tiny, data.dtype))
    term = bead_anchor_term(model, data / peak, subvoxel=subvoxel)

    g0 = jax.grad(
        lambda sub: term(params0._replace(**sub))
    )({n: getattr(params0, n) for n in names})
    x0, rebuild = joint_variable(params0, names, phase_freeze_head, grads=g0)

    res = minimize_vmlmb(
        jax.value_and_grad(lambda v: term(rebuild(v))), x0,
        mem=config.mem, maxiter=config.max_iter, maxeval=config.max_eval,
        gatol=config.gatol, grtol=config.grtol,
    )
    params = rebuild(res.x)

    # Report the matched-filter amplitude at the solution (the profiled
    # amp of the background-free model — what callers scale beads by).
    d0 = center_bead_stack(data, subvoxel=subvoxel)
    h = model.compute_psf(params)
    amp = jnp.sum(h * d0) / jnp.sum(h * h)
    fit = PsfFitResult(params, res.f, res.iterations, res.evaluations,
                       res.status, res.f_history)
    return fit, amp


# ---------------------------------------------------------------------------
# Fit uncertainty (Laplace / Gauss-Newton error bars)
# ---------------------------------------------------------------------------


class FitUncertainty(NamedTuple):
    """Per-coefficient 1-sigma error bars for a PSF fit.

    ``std``: 1-sigma marginal standard deviation per coefficient — an array
    for :func:`fit_uncertainty`, a ``{family: array}`` dict (plus ``"amp"``
    and ``"background"`` scalars) for :func:`bead_fit_uncertainty`.
    ``cov``: the full posterior covariance (coefficient order matches
    ``std``; bead fits append the profiled amp and background last).
    ``sigma``: the noise standard deviation used — estimated from the fit
    residual when not supplied (1.0 when per-voxel inverse-variance weights
    already carry the noise model).
    """

    std: object
    cov: jax.Array
    sigma: jax.Array


def _gn_covariance(jac_flat, weights_flat, k_model, sigma, resid, dtype):
    """Covariance from a flattened prediction Jacobian.

    GN/Laplace: ``cov = sigma^2 (J^T W J)^{-1}`` — exact for the (weighted)
    least-squares posterior under local linearity. ``sigma`` estimated as
    ``sqrt(||r||_W^2 / (n - k))`` when absent (homoscedastic residual MLE
    with the dof correction).
    """
    jw = jac_flat if weights_flat is None else jac_flat * weights_flat[:, None]
    gn = jac_flat.T @ jw
    gn = 0.5 * (gn + gn.T)
    if weights_flat is not None:
        sigma_out = jnp.asarray(1.0, dtype)  # weights are inverse variance
        scale2 = 1.0
    else:
        n = resid.shape[0]
        if sigma is None:
            sigma_out = jnp.sqrt(jnp.sum(resid * resid) / max(n - k_model, 1))
        else:
            sigma_out = jnp.asarray(sigma, dtype)
        scale2 = sigma_out * sigma_out
    eye = jnp.eye(gn.shape[0], dtype=gn.dtype)
    cov = scale2 * jnp.linalg.solve(gn, eye)
    return cov, sigma_out


def fit_uncertainty(
    model,
    params,
    flag: int,
    data: jax.Array,
    obj: jax.Array,
    weights: jax.Array | None = None,
    sigma: float | None = None,
) -> FitUncertainty:
    """Error bars for a :func:`fit_psf` solution (call it at the *fitted*
    ``params``).

    Laplace approximation with the Gauss-Newton Hessian of the data term
    the fit minimized (``0.5 sum w (obj (*) h(x) - d)^2``, the reference's
    objective at ``PSF_Estimation.java:147-157``): ``cov = sigma^2 (J^T W
    J)^{-1}`` where ``J = d(obj (*) h)/dx`` is built column-exactly by
    forward-mode autodiff through the PSF synthesis. With per-voxel
    inverse-variance ``weights`` the covariance needs no sigma; otherwise
    ``sigma`` defaults to the residual MLE with dof correction. Memory is
    ``k`` volumes for the Jacobian — fine for calibration-sized stacks;
    crop large ones around structure first.

    The reference has no uncertainty reporting (SURVEY.md section 5-e);
    this is the beyond-parity observability piece calibration workflows
    need (is the fitted Z5 real, or noise?).
    """
    from microtipi_tpu.ops.convolution import convolve

    family = FAMILY_NAMES[flag]
    x = getattr(params, family)
    if x.shape[0] == 0:
        raise ValueError(f"family {family!r} has no coefficients")
    if weights is not None and weights.shape != data.shape:
        weights = pad_to_shape(weights, data.shape)
    from microtipi_tpu.ops.convolution import fft_pair

    _exact = _resolve_fit_exact()
    obj_hat = fft_pair(_exact)[0](obj)

    def predict(v):
        h = model.compute_psf(params._replace(**{family: v}))
        return convolve(h, obj_hat, data.shape, _exact)

    jac = jax.jacfwd(predict)(x).reshape(-1, x.shape[0])
    resid = (predict(x) - data).ravel()
    w_flat = None if weights is None else weights.ravel()
    cov, sigma_out = _gn_covariance(
        jac, w_flat, x.shape[0], sigma, resid, data.dtype)
    return FitUncertainty(jnp.sqrt(jnp.diagonal(cov)), cov, sigma_out)


def bead_fit_uncertainty(
    model,
    params,
    families: tuple[int, ...],
    bead_data: jax.Array,
    subvoxel: bool = True,
    sigma: float | None = None,
) -> FitUncertainty:
    """Error bars for a :func:`fit_psf_beads` solution.

    Same GN/Laplace recipe as :func:`fit_uncertainty`, on the bead model
    ``amp * h(x) + c`` with the profiled nuisances (amp, background)
    included as Jacobian columns and *marginalized* — their uncertainty
    correctly inflates the geometry coefficients they trade against
    (e.g. background vs the PSF's diffuse tails). ``std`` comes back as a
    ``{family: array}`` dict plus scalar ``"amp"`` / ``"background"``
    entries; ``cov`` is over the concatenated ``[families..., amp, c]``
    vector.
    """
    names = tuple(FAMILY_NAMES[f] for f in families)
    d0 = center_bead_stack(bead_data, subvoxel=subvoxel)
    n = float(d0.size)

    # Profiled (amp, c) at the solution — same normal equations as
    # bead_anchor_term.
    h0 = model.compute_psf(params)
    shh = jnp.sum(h0 * h0)
    sh1 = jnp.sum(h0)
    shd = jnp.sum(h0 * d0)
    s1d = jnp.sum(d0)
    det = jnp.maximum(shh * n - sh1 * sh1, jnp.asarray(jnp.finfo(d0.dtype).tiny, d0.dtype))
    amp = (n * shd - sh1 * s1d) / det
    c = (shh * s1d - sh1 * shd) / det

    sizes = [int(getattr(params, nm).shape[0]) for nm in names]
    x0 = jnp.concatenate([getattr(params, nm) for nm in names]
                         + [amp[None], c[None]])

    def predict(v):
        sub, off = {}, 0
        for nm, sz in zip(names, sizes):
            sub[nm] = v[off:off + sz]
            off += sz
        a_, c_ = v[off], v[off + 1]
        return a_ * model.compute_psf(params._replace(**sub)) + c_

    jac = jax.jacfwd(predict)(x0).reshape(-1, x0.shape[0])
    resid = (predict(x0) - d0).ravel()
    cov, sigma_out = _gn_covariance(jac, None, x0.shape[0], sigma, resid, d0.dtype)
    std_all = jnp.sqrt(jnp.diagonal(cov))
    std, off = {}, 0
    for nm, sz in zip(names, sizes):
        std[nm] = std_all[off:off + sz]
        off += sz
    std["amp"] = std_all[off]
    std["background"] = std_all[off + 1]
    return FitUncertainty(std, cov, sigma_out)
