"""Blind deconvolution: alternate object updates and PSF-parameter fits.

Rebuild of ``microUtils/BlindDeconvJob.java`` with the same loop semantics
(``blindDeconv``, ``:97-138``):

  for each of ``loops`` rounds:
    1. synthesize the PSF from the current parameters and run the object
       update (``deconvolver.updatePsf`` + ``deconv``, ``:100-108``);
    2. optionally re-estimate data weights from the current model for the
       PSF step (``:109-111``; the pre-deconv update is disabled upstream,
       ``:105-107``);
    3. unless this is the last round (``:116``), fit each configured
       parameter family in order with its own iteration budget and
       ``grtol = 0`` (``:118-133``, ``setRelativeTolerance(0)`` at ``:124``);
       families with a zero budget are skipped (``:126``).

TPU-first: the whole loop is one jitted program — rounds are a
``lax.fori_loop`` whose carry is (object, params), each inner solver is a
``lax.while_loop``, so a full blind solve is a single device dispatch with
zero host round-trips (the BASELINE.json north star). The reference's
cooperative ``abort()`` between rounds (``:112-115,129-132``) is a host-side
concern; the streaming variant in ``api.BlindDeconvJob`` runs rounds as
separate dispatches and honors aborts between them.

The PSF handed to the object step stays corner-origin: the reference rolls to
centered layout (``:100``) only because TiPi's ``setPSF`` expects that; our
convolution consumes FFT-layout kernels directly — one layout, no shuffles.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
from microtipi_tpu.jobs.psf_fit import PsfFitConfig, fit_psf
from microtipi_tpu.models.microscope import DEFOCUS, DEPTH, MODULUS, PHASE, SHEET
from microtipi_tpu.ops.convolution import WeightedConvolutionCost
from microtipi_tpu.utils.arrays import crop_to_shape, pad_fft_kernel, pad_to_shape

__all__ = ["BlindDeconvConfig", "BlindDeconvResult", "blind_deconvolve", "run_blind_loop"]


@dataclasses.dataclass(frozen=True)
class BlindDeconvConfig:
    """Static schedule of the alternating loop.

    ``families``/``psf_max_iter`` pair up like the reference's
    ``parametersFlags``/``maxIter`` arrays (``BlindDeconvJob.java:80-88``);
    the canonical order is (DEFOCUS, PHASE, MODULUS)
    (``WideFieldModel.java:123``).
    """

    loops: int = 5
    families: tuple[int, ...] = (DEFOCUS, PHASE, MODULUS)
    psf_max_iter: tuple[int, ...] = (20, 20, 20)
    deconv: DeconvolutionConfig = dataclasses.field(default_factory=DeconvolutionConfig)
    fit: PsfFitConfig = dataclasses.field(default_factory=PsfFitConfig)
    #: Graduated optimization: number of *active* phase modes per round
    #: (length ``loops``); low-order aberrations are fitted first, higher
    #: orders unlock in later rounds — the standard stabilizer for the
    #: object-absorbs-aberration failure mode of alternating blind deconv.
    #: None = all modes every round (reference behavior). With a schedule the
    #: rounds are unrolled (static per-round shapes) instead of a fori_loop.
    phase_schedule: tuple[int, ...] | None = None
    #: Fit all configured families *jointly* in one VMLMB run per round
    #: (budget = max(psf_max_iter)) instead of the reference's sequential
    #: per-family coordinate descent. Helps coupled families (defocus/Z4).
    joint_fit: bool = False
    #: Freeze the first k phase coefficients during fits (0 = none). With the
    #: full basis, k=1 pins Zernike Z4 — gauge-degenerate with an object
    #: z-shift, the main blind drift mode (BASELINE.md quality notes).
    phase_freeze_head: int = 0
    #: Round-1 object warm start: "data" (reference behavior) or "wiener"
    #: (clamped regularized inverse; ~2x fewer object iterations to a given
    #: cost — see docs/TUNING.md). Later rounds warm-start from the previous.
    init: str = "data"
    #: Reference semantics skip the PSF refit on the final round
    #: (BlindDeconvJob.java:116). Set False when composing per-round
    #: dispatches on the host (checkpointed runs): every round then fits,
    #: and the composer applies the skip on the true last round itself.
    skip_last_fit: bool = True
    #: Calibration prior on the PHASE family: each fit gains
    #: ``w * f0 * ||phase - phase(params0)||^2`` anchored at the INITIAL
    #: parameters (pass a bead calibration as ``params0``). Measured
    #: (BASELINE.md): at w ~ 1e-2 the refit improves on BOTH free refitting
    #: and trusting the calibration — the one lever found to do so. 0 = off
    #: (reference behavior).
    phase_prior_weight: float = 0.0
    #: Weight of the structural bead anchor when ``bead_data`` is passed to
    #: :func:`blind_deconvolve`: the bead measurement joins every PSF fit as
    #: an auxiliary data term (``psf_fit.bead_anchor_term``) in natural
    #: intensity units — 1.0 is the joint maximum-likelihood objective when
    #: bead and sample share the same noise level; use
    #: ``sigma_sample^2 / sigma_bead^2`` otherwise, or larger values to
    #: trust the bead more. Unlike ``phase_prior_weight`` (a quadratic pull
    #: toward a point estimate), the anchor keeps the bead *data* in the
    #: joint objective, so modes the bead constrains are pinned hard while
    #: poorly-constrained modes stay free — and a low-SNR bead degrades
    #: gracefully to no pull at all (see ``psf_fit._combine_aux_terms`` for
    #: the measured failure of scale-invariant weighting here).
    bead_weight: float = 1.0
    #: Subvoxel lateral bead centering for the anchor (see fit_psf_beads for
    #: why z stays integer).
    bead_subvoxel: bool = True
    #: Object-prior annealing: per-round TV weight (length ``loops``),
    #: overriding ``deconv.mu``. Strong TV early keeps the object smooth so
    #: aberrations land in the PSF estimate instead of being absorbed by the
    #: object; relax in later rounds to recover detail. Like phase_schedule,
    #: a schedule unrolls the rounds (static per-round numerics).
    mu_schedule: tuple[float, ...] | None = None
    #: Object-step engine: "vmlmb" (reference semantics,
    #: ``PSF_Estimation.java:186-199``) or "admm" (``jobs.admm``: closed-form
    #: circulant x-update — measured ~5x faster to matched reconstruction
    #: quality at 256^3 and able to reach objectives the f32 VMLMB path
    #: line-search-stalls above; BASELINE.md round-4 engine head-to-head).
    #: "admm" runs ``deconv.max_iter`` fixed iterations per round and
    #: requires the plain TV objective (no sparsity/hessian priors, no
    #: padded-variable mode); dense path + single-volume mesh-divisible
    #: sharded path (``parallel.admm``). IMPORTANT: pair it with an
    #: annealed ``mu_schedule`` (e.g. :meth:`recommended`) — the exactly-
    #: converged object step under a weak constant mu absorbs the
    #: aberration and the PSF fits blow up (measured both ways,
    #: BASELINE.md "ADMM engine inside the blind loop").
    deconv_engine: str = "vmlmb"

    def __post_init__(self):
        if len(self.families) != len(self.psf_max_iter):
            raise ValueError("families and psf_max_iter must have the same length")
        if self.phase_schedule is not None and len(self.phase_schedule) != self.loops:
            raise ValueError("phase_schedule must have one entry per loop")
        if self.mu_schedule is not None and len(self.mu_schedule) != self.loops:
            raise ValueError("mu_schedule must have one entry per loop")
        if self.joint_fit and self.phase_schedule is not None:
            raise ValueError("phase_schedule is not supported with joint_fit")
        if self.init not in ("data", "wiener"):
            raise ValueError(f"unknown init {self.init!r}")
        if self.deconv_engine not in ("vmlmb", "admm"):
            raise ValueError(f"unknown deconv_engine {self.deconv_engine!r}")
        if self.deconv_engine == "admm" and (
            self.deconv.sparsity > 0
            or self.deconv.hessian > 0
            or self.deconv.var_shape is not None
        ):
            raise ValueError(
                "deconv_engine='admm' supports the plain TV objective only "
                "(no sparsity/hessian priors, no padded-variable mode); "
                "use the vmlmb engine"
            )

    @classmethod
    def recommended(cls, pin_z4: bool = False, **overrides) -> "BlindDeconvConfig":
        """The measured-best quality recipe as ONE call (docs/TUNING.md,
        BASELINE.md round-2 tables): joint multi-family fit (prevents the
        sequential loop's defocus degradation; gradient-balanced), the
        wiener warm start (~2x fewer object iterations to a given cost),
        and object-prior annealing (strong TV early, relaxing to the base
        ``mu`` — measured -31% blind phase error). ``pin_z4`` additionally
        freezes the first phase mode; measured to HELP when the true Z4 is
        ~0 and to HURT when it is not — enable it only when absolute focus
        position is not itself of interest. Defaults elsewhere stay at
        reference parity; pass overrides for loops/budgets/etc."""
        base = dict(joint_fit=True, init="wiener",
                    phase_freeze_head=1 if pin_z4 else 0)
        base.update(overrides)
        cfg = cls(**base)
        if cfg.mu_schedule is None and cfg.deconv.mu > 0:
            # x64 early prior decaying by 4x per round down to the base mu.
            sched = tuple(
                cfg.deconv.mu * max(1.0, 64.0 / 4.0**i) for i in range(cfg.loops)
            )
            cfg = dataclasses.replace(cfg, mu_schedule=sched)
        return cfg


class BlindDeconvResult(NamedTuple):
    obj: jax.Array  # restored object, at the (possibly padded) variable grid
    params: object  # fitted PSF parameters
    psf: jax.Array  # final synthesized PSF (corner-origin)
    deconv_f: jax.Array  # per-round final object-step cost, shape (loops,)
    fit_f: jax.Array  # per-round per-family final PSF-step cost (loops, nfam)
    deconv_iters: jax.Array = None  # per-round object-step VMLMB iterations (loops,)


def run_blind_loop(config, f_dtype, x0, params0, object_step, fit_weights, fit_one, fit_joint):
    """Shared driver of the alternating loop (dense and mesh-sharded paths).

    Keeps the reference's loop semantics in exactly one place — round order,
    skip-refit-on-last-round (``BlindDeconvJob.java:116``), zero-budget family
    skip (``:126``), phase-schedule unrolling, joint-fit dispatch. The backend
    supplies four callables:

    - ``object_step(x, params, mu) -> (x_new, f, iterations, psf)`` (``mu``
      is the per-round TV weight from ``mu_schedule``, or None = config)
    - ``fit_weights(x, psf) -> weights-or-None`` (the post-deconv update
      feeding only the PSF step, ``:109-111``)
    - ``fit_one(params, x, w_fit, j, phase_active) -> (params, f)`` for family
      index ``j`` of ``config.families``
    - ``fit_joint(params, x, w_fit, jfams) -> (params, f)`` fitting the
      families ``jfams`` simultaneously
    """
    nfam = len(config.families)

    def round_body(i, carry, phase_active=None, mu=None, unrolled=False):
        x, params, deconv_f, fit_f, deconv_iters = carry
        x, df, dit, psf = object_step(x, params, mu)
        deconv_f = deconv_f.at[i].set(df)
        deconv_iters = deconv_iters.at[i].set(dit)
        w_fit = fit_weights(x, psf)

        def run_fits(params):
            ff = jnp.zeros((nfam,), f_dtype)
            if config.joint_fit:
                # Honor the zero-budget skip semantics (BlindDeconvJob.java:126)
                # by excluding those families from the joint variable.
                jfams = tuple(
                    f for f, it in zip(config.families, config.psf_max_iter) if it > 0
                )
                params, jf = fit_joint(params, x, w_fit, jfams)
                # One shared cost: report it in every participating slot
                # (NaN-vs-0 ambiguity in fit_f would read as "converged to 0").
                ff = jnp.where(
                    jnp.asarray([it > 0 for it in config.psf_max_iter]), jf, jnp.nan
                ).astype(ff.dtype)
                return params, ff
            for j, flag in enumerate(config.families):
                if config.psf_max_iter[j] <= 0:  # BlindDeconvJob.java:126
                    continue
                params, fj = fit_one(
                    params, x, w_fit, j, phase_active if flag == PHASE else None
                )
                ff = ff.at[j].set(fj)
            return params, ff

        def skip_fits(params):
            return params, jnp.full((nfam,), jnp.nan, f_dtype)

        fits_this_round = (lambda i: i < config.loops - 1) if config.skip_last_fit else (lambda i: i >= 0)
        if unrolled:  # i is a python int: last-round skip resolves statically
            params, ff = run_fits(params) if fits_this_round(i) else skip_fits(params)
        else:
            params, ff = lax.cond(fits_this_round(i), run_fits, skip_fits, params)
        return x, params, deconv_f, fit_f.at[i].set(ff), deconv_iters

    carry0 = (
        x0,
        params0,
        jnp.full((config.loops,), jnp.nan, f_dtype),
        jnp.full((config.loops, nfam), jnp.nan, f_dtype),
        jnp.zeros((config.loops,), jnp.int32),
    )
    if config.phase_schedule is None and config.mu_schedule is None:
        return lax.fori_loop(0, config.loops, round_body, carry0)
    carry = carry0
    for i in range(config.loops):
        carry = round_body(
            i, carry,
            phase_active=config.phase_schedule[i] if config.phase_schedule else None,
            mu=config.mu_schedule[i] if config.mu_schedule else None,
            unrolled=True,
        )
    return carry


def blind_deconvolve(
    data: jax.Array,
    model,
    params0=None,
    x0: jax.Array | None = None,
    weights: jax.Array | None = None,
    weight_updater: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
    config: BlindDeconvConfig = BlindDeconvConfig(),
    bead_data: jax.Array | None = None,
    phase_anchor: jax.Array | None = None,
) -> BlindDeconvResult:
    """Run the alternating blind-deconvolution loop; see module docstring.

    ``model`` is a PSF model config (``WideFieldConfig``); ``weight_updater``
    maps (model_prediction, data) -> weights (see ``weights.updaters``).

    ``bead_data``: an optional bead (point-source) stack measured on the same
    optics — the structural calibration anchor. Every PSF fit then jointly
    minimizes the sample data term plus the bead data term
    (``psf_fit.bead_anchor_term``, weight ``config.bead_weight``), keeping
    the calibration *measurement* in the loop instead of (or in addition to)
    the ``phase_prior_weight`` point-estimate prior.
    """
    if params0 is None:
        params0 = model.init_params()
    var_shape = (
        tuple(config.deconv.var_shape) if config.deconv.var_shape is not None else data.shape
    )
    if x0 is None:
        if config.init == "wiener":
            from microtipi_tpu.jobs.wiener import wiener

            x0 = pad_to_shape(wiener(data, model.compute_psf(params0)), var_shape)
        else:
            x0 = pad_to_shape(data, var_shape)
        x0 = jnp.maximum(x0, 0.0)

    fit_cfg = dataclasses.replace(config.fit, grtol=0.0)  # BlindDeconvJob.java:124

    def object_step(x, params, mu):
        psf = model.compute_psf(params)
        dcfg = config.deconv if mu is None else dataclasses.replace(config.deconv, mu=mu)
        # Object step always sees the user-supplied weights: the reference
        # deliberately disables the pre-deconv weight update
        # (BlindDeconvJob.java:105-107). Keeping weights=None here also
        # preserves the uniform-weight quadratic fast path.
        if config.deconv_engine == "admm":
            from microtipi_tpu.jobs.admm import admm_deconvolve

            # over_relax=1.0 INSIDE the alternation: the relaxed engine's
            # faster per-round convergence re-feeds the object-absorbs-
            # aberration mode (measured 3-seed quality probe, BASELINE.md
            # over-relaxation entry) — the same mechanism the annealed
            # mu_schedule exists to suppress. Standalone solves keep the
            # engine's 1.8 default.
            dres = admm_deconvolve(data, psf, weights=weights, x0=x,
                                   config=dcfg, over_relax=1.0,
                                   track_objective=False)
        else:
            dres = deconvolve(data, psf, weights=weights, x0=x, config=dcfg)
        return dres.x, dres.f, dres.iterations, psf

    def fit_weights(x, psf):
        if weight_updater is None:
            return weights
        # Model prediction H*x at the data window from the updated object
        # — deconvolver.getModel(); the re-estimated weights feed ONLY the
        # PSF step of this round (BlindDeconvJob.java:109-111).
        kern = pad_fft_kernel(psf, var_shape)
        from microtipi_tpu.jobs.psf_fit import _resolve_fit_exact

        full_cost = WeightedConvolutionCost.build(kern, data, None, var_shape,
                                                  exact=_resolve_fit_exact())
        return weight_updater(full_cost.model(x), data)

    def _obj_at_data(x):
        return crop_to_shape(x, data.shape) if x.shape != data.shape else x

    # Calibration-prior anchor: the ORIGINAL params0 (e.g. a bead
    # calibration), not the drifting per-round estimate. Host-driven
    # round-at-a-time composition (api/CLI checkpointing) must pass the
    # original as ``phase_anchor`` explicitly, since its per-round params0
    # IS the drifting estimate.
    if phase_anchor is None:
        phase_anchor = params0.phase if config.phase_prior_weight > 0 else None

    # Structural bead anchor: the bead stack joins every fit as an auxiliary
    # data term at its own geometry (same optics, bead-stack shape).
    aux_terms = ()
    if bead_data is not None:
        from microtipi_tpu.jobs.psf_fit import bead_anchor_term

        if bead_data.shape[-1] != bead_data.shape[-2]:
            raise ValueError(
                f"bead stack must be laterally square for the pupil model, got "
                f"{tuple(bead_data.shape)}; crop it or run psf_fit.average_beads "
                "(its default patch is square)"
            )
        bead_model = dataclasses.replace(model, shape=tuple(bead_data.shape))
        aux_terms = (
            (bead_anchor_term(bead_model, bead_data, subvoxel=config.bead_subvoxel),
             config.bead_weight),
        )

    # Windowed fit (PsfFitConfig.fit_window): the fit sub-problem moves to
    # a centered crop — cropped data + cropped object-as-kernel + a
    # window-shaped pupil model. The deconvolution step is untouched.
    fitw = config.fit.fit_window
    if fitw is not None:
        fitw = tuple(int(v) for v in fitw)
        if any(w > s for w, s in zip(fitw, data.shape)):
            raise ValueError(
                f"fit_window {fitw} exceeds the data shape {tuple(data.shape)}")
        if fitw[1] != fitw[2]:
            raise ValueError(
                f"fit_window lateral dims must be square (pupil model), got {fitw}")
        fit_model = dataclasses.replace(model, shape=fitw)
    else:
        fit_model = model

    def _fit_view(x, w_fit):
        """(data, object, weights) at the fit grid."""
        xd = _obj_at_data(x)
        if fitw is None:
            return data, xd, w_fit
        return (crop_to_shape(data, fitw), crop_to_shape(xd, fitw),
                None if w_fit is None else crop_to_shape(w_fit, fitw))

    def fit_one(params, x, w_fit, j, phase_active):
        flag = config.families[j]
        fdata, fobj, fw = _fit_view(x, w_fit)
        fres = fit_psf(
            fit_model, params, flag, fdata, fobj, weights=fw,
            config=dataclasses.replace(fit_cfg, max_iter=config.psf_max_iter[j]),
            active=phase_active,
            freeze_head=config.phase_freeze_head if flag == PHASE else 0,
            # DEPTH/SHEET are beyond-parity families whose components live on
            # physical (meter) scales far from O(1); unpreconditioned they
            # stall (psf_fit.py).
            precondition=flag in (DEPTH, SHEET),
            anchor=phase_anchor if flag == PHASE else None,
            prior_weight=config.phase_prior_weight if flag == PHASE else 0.0,
            aux_terms=aux_terms,
        )
        return fres.params, fres.f

    def fit_joint(params, x, w_fit, jfams):
        from microtipi_tpu.jobs.psf_fit import fit_psf_joint

        fdata, fobj, fw = _fit_view(x, w_fit)
        fres = fit_psf_joint(
            fit_model, params, jfams, fdata, fobj, weights=fw,
            config=dataclasses.replace(fit_cfg, max_iter=max(config.psf_max_iter)),
            phase_freeze_head=config.phase_freeze_head,
            phase_anchor=phase_anchor,
            phase_prior_weight=config.phase_prior_weight,
            aux_terms=aux_terms,
        )
        return fres.params, fres.f

    x, params, deconv_f, fit_f, deconv_iters = run_blind_loop(
        config, data.dtype, x0, params0, object_step, fit_weights, fit_one, fit_joint
    )
    return BlindDeconvResult(
        x, params, model.compute_psf(params), deconv_f, fit_f, deconv_iters
    )
