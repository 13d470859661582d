"""Depth-variant deconvolution: object update under a z-varying PSF.

Beyond-parity companion to ``jobs/deconv.py``: same solver (VMLMB +
hyperbolic TV + positivity, reference semantics per ``PSF_Estimation.java``
defaults), but the data term is the depth-varying blur of
``ops/depthconv.py`` — K anchor PSFs blended along z — instead of one
shift-invariant kernel. The natural pairing is the Gibson-Lanni model
(``models/gibson_lanni.py``), whose DEPTH family makes "the PSF at depth d"
a one-line parameter edit; :func:`depth_anchor_psfs` synthesizes the anchor
stack with one vmapped call (a single batched FFT program on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from microtipi_tpu.jobs.deconv import (
    DeconvolutionConfig,
    DeconvolutionResult,
    make_regularizer,
)
from microtipi_tpu.ops.depthconv import DepthVaryingConvCost
from microtipi_tpu.optim.vmlmb import minimize_vmlmb
from microtipi_tpu.utils.arrays import pad_fft_kernel, pad_to_shape

__all__ = [
    "blind_deconvolve_depthvar",
    "calibrate_depth",
    "depth_anchor_psfs",
    "depth_anchor_psfs_from_maps",
    "deconvolve_depthvar",
    "fit_psf_depthvar",
    "ladder_fit_uncertainty",
    "richardson_lucy_depthvar",
]


def depth_anchor_psfs(model, params, anchors, depth0: float | None = None) -> jax.Array:
    """Synthesize the K anchor PSFs for a depth-varying solve, shape
    ``(K, Nz, Ny, Nx)``.

    ``model`` is a :class:`~microtipi_tpu.models.gibson_lanni.GibsonLanniConfig`
    (or any model whose params carry a ``depth = (ns/lambda, d)`` family);
    ``anchors`` are z indices of the data grid; the PSF for anchor ``a`` is
    synthesized at physical depth ``depth0 + a * dz`` (``depth0`` defaults to
    ``model.depth``, the nominal depth of plane z=0). One ``vmap`` over the
    depth coordinate — on TPU the K syntheses run as a single batched FFT
    program, not K dispatches.
    """
    if depth0 is None:
        depth0 = getattr(model, "depth", 0.0)
    anchors = np.asarray(anchors, np.float64)
    depths = jnp.asarray(depth0 + anchors * model.dz, model.dtype)

    def one(d):
        p = params._replace(depth=params.depth.at[1].set(d))
        return model.compute_psf(p)

    return jax.vmap(one)(depths)


def depth_anchor_psfs_from_maps(
    model, phis, rhos=None, defocus=None
) -> jax.Array:
    """Anchor PSFs from K *retrieved* (nonparametric) pupil maps, shape
    ``(K, Nz, Ny, Nx)``.

    The measured-calibration route to depth-varying deconvolution: retrieve a
    pixelwise pupil map from a bead at each of K depths
    (:func:`~microtipi_tpu.jobs.phase_retrieval.retrieve_pupil`, resampled to
    the SAMPLE grid with
    :func:`~microtipi_tpu.jobs.phase_retrieval.resample_pupil_map` if the
    bead crop geometry differs), then synthesize the anchor stack here —
    depth variation that the parametric route
    (:func:`depth_anchor_psfs` + Gibson-Lanni's linear-in-depth model,
    ``models/gibson_lanni.py``) cannot represent (dust, SLM ripple,
    sample-induced higher-order aberration) rides in with the maps. One
    ``vmap`` over ``model.compute_psf_from_pupil`` — a single batched FFT
    program on TPU, like the parametric anchors.

    ``model``: a ``WideFieldConfig`` (scalar pupil synthesis) at the SAMPLE
    geometry. ``phis``: (K, Ny, Nx) phase maps on that grid. ``rhos``:
    optional (K, Ny, Nx) modulus maps (None = nominal flat modulus).
    ``defocus``: None (nominal), one (3,) vector, or (K, 3) per-anchor
    defocus — each retrieval is anchored at its own fitted defocus, which
    the npz from ``fitpsf --retrieve-map`` records.
    """
    phis = jnp.asarray(phis, model.dtype)
    if phis.ndim != 3:
        raise ValueError(f"phis must be (K, Ny, Nx), got {phis.shape}")
    k = phis.shape[0]
    if defocus is None:
        defocus = model.init_params().defocus
    defocus = jnp.asarray(defocus, model.dtype)
    if defocus.ndim == 1:
        defocus = jnp.broadcast_to(defocus, (k,) + defocus.shape)
    if rhos is None:
        return jax.vmap(
            lambda p, d: model.compute_psf_from_pupil(p, defocus=d)
        )(phis, defocus)
    rhos = jnp.asarray(rhos, model.dtype)
    return jax.vmap(
        lambda p, r, d: model.compute_psf_from_pupil(p, rho=r, defocus=d)
    )(phis, rhos, defocus)


def deconvolve_depthvar(
    data: jax.Array,
    psfs: jax.Array,
    anchors=None,
    weights: jax.Array | None = None,
    x0: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
) -> DeconvolutionResult:
    """Solve the object sub-problem under the depth-varying blur.

    ``psfs`` is the (K, Nz, Ny, Nx) corner-origin anchor stack (e.g. from
    :func:`depth_anchor_psfs`); ``anchors`` the matching z indices of the
    data grid (default: K evenly spaced). Supports the padded-variable mode
    (``config.var_shape``) like the shift-invariant solver.
    """
    from microtipi_tpu.jobs.deconv import resolve_exact_fft
    exact = resolve_exact_fft(config)
    var_shape = tuple(config.var_shape) if config.var_shape is not None else data.shape
    if psfs.shape[1:] != var_shape:
        psfs = jax.vmap(lambda h: pad_fft_kernel(h, var_shape))(psfs)
    cost = DepthVaryingConvCost.build(psfs, data, weights, var_shape, anchors,
                                      exact=exact)
    reg = make_regularizer(config, var_shape)

    if config.data_term == "poisson":
        if weights is not None:
            raise ValueError("data_term='poisson' does not compose with weights")
        from microtipi_tpu.ops.convolution import generalized_kl

        def objective(x):
            return generalized_kl(cost.model(x) + config.background, data) + reg(x)

    elif config.data_term != "gaussian":
        raise ValueError(f"unknown data_term {config.data_term!r}")
    else:

        def objective(x):
            return cost.cost(x) + reg(x)

    if x0 is None:
        x0 = pad_to_shape(data, var_shape)
        if config.positivity:
            x0 = jnp.maximum(x0, 0.0)
    from microtipi_tpu.jobs.deconv import resolve_mem_dtype

    res = minimize_vmlmb(
        jax.value_and_grad(objective),
        x0,
        lower=0.0 if config.positivity else None,
        mem=config.mem,
        maxiter=config.max_iter,
        maxeval=config.max_eval,
        gatol=config.gatol,
        grtol=config.grtol,
        mem_dtype=resolve_mem_dtype(config, x0),
    )
    return DeconvolutionResult(
        res.x, res.f, res.iterations, res.evaluations, res.status,
        res.f_history, res.pg_history,
    )


def richardson_lucy_depthvar(
    data: jax.Array,
    psfs: jax.Array,
    anchors=None,
    iterations: int = 50,
    background: float = 0.0,
    mu: float = 0.0,
    epsilon: float = 1e-2,
    x0: jax.Array | None = None,
    accelerate: bool = False,
    stop: str = "fixed",
    stop_sigma=None,
    stop_tau: float = 1.0,
    return_iterations: bool = False,
):
    """Richardson-Lucy under the DEPTH-VARYING blur operator.

    The RL fixed point generalizes verbatim to a spatially-variant H (the
    EM derivation never uses shift invariance): the update divides by the
    per-voxel sensitivity ``H^T 1`` — a scalar for circulant H, here a
    per-z profile ``sum_k w_k(z) * sum(h_k)``. Forward is the anchor blend
    ``sum_k h_k (*) (w_k ⊙ x)`` (``ops/depthconv.py``), the backprojection
    its exact adjoint ``sum_k w_k ⊙ (h_k^T (*) r)`` — K batched FFTs each.
    All :func:`~microtipi_tpu.jobs.richardson_lucy.richardson_lucy`
    semantics ride along unchanged through the shared engine (RL-TV,
    Biggs-Andrews acceleration, gaussian/poisson discrepancy stopping);
    the matched backprojector only (no per-anchor Wiener-Butterworth yet).

    ``psfs``: (K, ...) corner-origin anchor stack (e.g.
    :func:`depth_anchor_psfs`); ``anchors``: matching z indices of the data
    grid (default evenly spaced). A constant stack reproduces plain RL
    exactly (partition of unity).
    """
    from microtipi_tpu.jobs.richardson_lucy import _rl_engine
    from microtipi_tpu.ops.depthconv import depth_varying_convolve, depth_weights

    shape = data.shape
    if psfs.shape[1:] != shape:
        psfs = jax.vmap(lambda h: pad_fft_kernel(h, shape))(psfs)
    k = psfs.shape[0]
    if anchors is None:
        anchors = np.linspace(0.0, shape[0] - 1.0, k)
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig, resolve_exact_fft
    from microtipi_tpu.ops.convolution import fft_pair

    exact = resolve_exact_fft(DeconvolutionConfig())
    _rfftn, _irfftn = fft_pair(exact)
    zw = jnp.asarray(depth_weights(shape[0], anchors), data.dtype)
    h_hat = _rfftn(psfs, axes=(1, 2, 3))

    def forward(y):
        return depth_varying_convolve(y, h_hat, zw, shape, exact)

    def backward(r):
        r_hat = _rfftn(r)
        backs = _irfftn(jnp.conj(h_hat) * r_hat[None], s=shape,
                        axes=(1, 2, 3))
        return jnp.sum(zw[:, :, None, None] * backs, axis=0)

    # Per-voxel sensitivity H^T 1 = sum_k w_k(z) * flux(h_k): a z profile.
    flux = jnp.sum(zw * jnp.sum(psfs, axis=(1, 2, 3))[:, None],
                   axis=0)[:, None, None]
    return _rl_engine(data, forward, backward, flux, iterations, background,
                      mu, epsilon, x0, accelerate, stop, stop_sigma,
                      stop_tau, return_iterations)


def _depthvar_fit_cost(obj, data, weights, anchors):
    """Data term for depth-varying PSF fits: the OBJECT is fixed and the K
    anchor PSFs are the variable.

    The depth-varying analog of the reference's object-as-kernel trick
    (``PSF_Estimation.java:147-157``): with ``H_theta x = sum_k h_k(theta)
    (*) (w_k ⊙ x)``, the K masked objects ``w_k ⊙ x`` are fixed during a
    PSF fit, so their spectra are computed ONCE here and each cost
    evaluation is K batched forward FFTs of the anchor stack + one inverse.
    Residual form on purpose — the quadratic shortcut's catastrophic f32
    cancellation near convergence is measured in ``psf_fit._fit_data_term``.
    """
    from microtipi_tpu.ops.depthconv import depth_weights

    shape = data.shape
    if weights is not None:
        # Zero weight EXCLUDES the voxel (see WeightedConvolutionCost.build).
        data = jnp.where(weights > 0, data, 0.0)
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig, resolve_exact_fft
    from microtipi_tpu.ops.convolution import fft_pair

    _rfftn, _irfftn = fft_pair(resolve_exact_fft(DeconvolutionConfig()))
    zw = jnp.asarray(depth_weights(shape[0], anchors), data.dtype)
    xk_hat = _rfftn(zw[:, :, None, None] * obj[None], axes=(1, 2, 3))

    def cost(psfs):
        h_hat = _rfftn(psfs, axes=(1, 2, 3))
        pred = _irfftn(jnp.sum(h_hat * xk_hat, axis=0), s=shape)
        r = pred - data
        if weights is None:
            return 0.5 * jnp.sum(r * r)
        return 0.5 * jnp.sum(weights * r * r)

    return cost


def fit_psf_depthvar(
    model,
    params,
    flags: tuple[int, ...],
    data: jax.Array,
    obj: jax.Array,
    anchors,
    weights: jax.Array | None = None,
    config=None,
    phase_active: int | None = None,
    phase_freeze_head: int = 0,
    phase_anchor: jax.Array | None = None,
    phase_prior_weight: float = 0.0,
    aux_terms: tuple = (),
):
    """Fit PSF parameter families under the DEPTH-VARYING forward operator.

    The depth-varying counterpart of ``psf_fit.fit_psf`` (one family, with
    ``phase_active``/``phase_freeze_head`` mode scheduling) and
    ``psf_fit.fit_psf_joint`` (several families at once, gradient-balanced):
    pass one flag for the former, several for the latter. The anchor stack
    is re-synthesized from the CURRENT parameters at every evaluation
    (:func:`depth_anchor_psfs` with ``depth0 = params.depth[1]``), so the
    GL DEPTH family — sample index ``ns/lambda`` and the depth offset of
    plane z=0 — is itself fittable: blind sample-index estimation.

    Reference semantics carried over from ``PSF_Estimation.java`` via the
    shared pieces: VMLMB defaults (``PsfFitConfig``), per-component
    preconditioning for the heterogeneous DEPTH family
    (``psf_fit.joint_variable`` rationale), the scale-invariant phase
    calibration prior, and auxiliary bead-anchor terms.
    """
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig, fit_families_with_cost
    from microtipi_tpu.models.microscope import FAMILY_NAMES

    if config is None:
        config = PsfFitConfig()
    if not hasattr(params, "depth"):
        raise ValueError(
            "fit_psf_depthvar needs a model with a DEPTH family "
            "(models/gibson_lanni.py) — the anchors vary that family")
    names = tuple(FAMILY_NAMES[f] for f in flags)
    if weights is not None and weights.shape != data.shape:
        weights = pad_to_shape(weights, data.shape)
    data_cost = _depthvar_fit_cost(obj, data, weights, anchors)

    def cost(p):
        return data_cost(depth_anchor_psfs(model, p, anchors,
                                           depth0=p.depth[1]))

    return fit_families_with_cost(
        cost, params, names, config,
        phase_active=phase_active,
        phase_freeze_head=phase_freeze_head,
        phase_anchor=phase_anchor,
        phase_prior_weight=phase_prior_weight,
        aux_terms=aux_terms,
    )


def blind_deconvolve_depthvar(
    data: jax.Array,
    model,
    anchors,
    params0=None,
    x0: jax.Array | None = None,
    weights: jax.Array | None = None,
    weight_updater=None,
    config=None,
    bead_data: jax.Array | None = None,
    phase_anchor: jax.Array | None = None,
):
    """Blind deconvolution under a DEPTH-VARYING PSF.

    The flagship blind loop (``jobs/blind.py``, reference semantics per
    ``BlindDeconvJob.java:97-138``) with the shift-invariant forward model
    replaced by the Preza-Conchello anchor-blend operator end to end: the
    object step is :func:`deconvolve_depthvar`, every PSF fit is
    :func:`fit_psf_depthvar`, and the anchor stack is re-synthesized from
    the current parameters each round. Include ``DEPTH`` in
    ``config.families`` to estimate the sample refractive index and the
    z=0 depth offset BLIND — the physics knob the shift-invariant blind
    loop cannot even represent. Same one-jitted-program structure: rounds
    are a ``lax.fori_loop`` (or unrolled under schedules), zero host
    round-trips.

    ``anchors``: K anchor z indices of the data grid (int K = evenly
    spaced). All ``BlindDeconvConfig`` knobs apply (joint_fit,
    mu/phase schedules, calibration priors, bead anchor); the PSF handed
    back in the result is the (K, Nz, Ny, Nx) anchor stack.
    """
    import dataclasses as _dc

    from microtipi_tpu.jobs.blind import BlindDeconvConfig, BlindDeconvResult, run_blind_loop
    from microtipi_tpu.models.microscope import PHASE
    from microtipi_tpu.utils.arrays import crop_to_shape

    if config is None:
        config = BlindDeconvConfig()
    if config.deconv_engine != "vmlmb":
        raise ValueError(
            "deconv_engine='admm' needs a circulant forward model; the "
            "depth-varying anchor blend is not circulant — use vmlmb")
    if params0 is None:
        params0 = model.init_params()
    if not hasattr(params0, "depth"):
        raise ValueError(
            "blind_deconvolve_depthvar needs a model with a DEPTH family "
            "(models/gibson_lanni.py)")
    if isinstance(anchors, int):
        anchors = np.linspace(0.0, data.shape[0] - 1.0, anchors)
    anchors = np.asarray(anchors, np.float64)

    var_shape = (tuple(config.deconv.var_shape)
                 if config.deconv.var_shape is not None else data.shape)

    def synth(p):
        return depth_anchor_psfs(model, p, anchors, depth0=p.depth[1])

    if x0 is None:
        if config.init == "wiener":
            from microtipi_tpu.jobs.wiener import wiener

            # Regularized-inverse warm start with the MIDDLE anchor — the
            # best shift-invariant stand-in for the depth-varying blur.
            mid = synth(params0)[anchors.shape[0] // 2]
            x0 = pad_to_shape(wiener(data, mid), var_shape)
        else:
            x0 = pad_to_shape(data, var_shape)
        x0 = jnp.maximum(x0, 0.0)

    fit_cfg = _dc.replace(config.fit, grtol=0.0)  # BlindDeconvJob.java:124

    def object_step(x, params, mu):
        psfs = synth(params)
        dcfg = config.deconv if mu is None else _dc.replace(config.deconv, mu=mu)
        dres = deconvolve_depthvar(
            data, psfs, anchors, weights=weights, x0=x, config=dcfg)
        return dres.x, dres.f, dres.iterations, psfs

    def fit_weights(x, psfs):
        if weight_updater is None:
            return weights
        if psfs.shape[1:] != var_shape:
            psfs = jax.vmap(lambda h: pad_fft_kernel(h, var_shape))(psfs)
        full_cost = DepthVaryingConvCost.build(psfs, data, None, var_shape, anchors)
        return weight_updater(full_cost.model(x), data)

    def _obj_at_data(x):
        return crop_to_shape(x, data.shape) if x.shape != data.shape else x

    if phase_anchor is None:
        phase_anchor = params0.phase if config.phase_prior_weight > 0 else None

    aux_terms = ()
    if bead_data is not None:
        from microtipi_tpu.jobs.psf_fit import bead_anchor_term

        if bead_data.shape[-1] != bead_data.shape[-2]:
            raise ValueError(
                f"bead stack must be laterally square for the pupil model, "
                f"got {tuple(bead_data.shape)}")
        bead_model = _dc.replace(model, shape=tuple(bead_data.shape))
        aux_terms = (
            (bead_anchor_term(bead_model, bead_data,
                              subvoxel=config.bead_subvoxel),
             config.bead_weight),
        )

    def fit_one(params, x, w_fit, j, phase_active):
        flag = config.families[j]
        fres = fit_psf_depthvar(
            model, params, (flag,), data, _obj_at_data(x), anchors,
            weights=w_fit,
            config=_dc.replace(fit_cfg, max_iter=config.psf_max_iter[j]),
            phase_active=phase_active,
            phase_freeze_head=config.phase_freeze_head if flag == PHASE else 0,
            phase_anchor=phase_anchor if flag == PHASE else None,
            phase_prior_weight=config.phase_prior_weight if flag == PHASE else 0.0,
            aux_terms=aux_terms,
        )
        return fres.params, fres.f

    def fit_joint(params, x, w_fit, jfams):
        fres = fit_psf_depthvar(
            model, params, jfams, data, _obj_at_data(x), anchors,
            weights=w_fit,
            config=_dc.replace(fit_cfg, max_iter=max(config.psf_max_iter)),
            phase_freeze_head=config.phase_freeze_head,
            phase_anchor=phase_anchor,
            phase_prior_weight=config.phase_prior_weight,
            aux_terms=aux_terms,
        )
        return fres.params, fres.f

    x, params, deconv_f, fit_f, deconv_iters = run_blind_loop(
        config, data.dtype, x0, params0, object_step, fit_weights,
        fit_one, fit_joint,
    )
    return BlindDeconvResult(
        x, params, synth(params), deconv_f, fit_f, deconv_iters
    )


def _cyclic_shift_z(h, s, cdtype):
    """Cyclic z-shift of a stack by +s voxels via a Fourier phase ramp (the
    per-bead axial origin nuisance of :func:`calibrate_depth`):
    ``shifted[0] = h[-s]``, so ``s = -(wrapped peak plane)`` aligns the model
    peak with peak-centered data. Differentiable and exact."""
    nz = h.shape[0]
    fz = jnp.asarray(np.fft.rfftfreq(nz), h.dtype)
    ramp = jnp.exp((-2j * jnp.pi) * (fz * s).astype(cdtype))
    return jnp.fft.irfft(
        jnp.fft.rfft(h, axis=0) * ramp[:, None, None], n=nz, axis=0
    ).astype(h.dtype)


def calibrate_depth(
    model,
    beads,
    anchors_z,
    families: tuple[int, ...] = (3,),  # (DEPTH,)
    params0=None,
    config=None,
    phase_freeze_head: int = 0,
    subvoxel: bool = True,
):
    """Depth-ladder calibration: fit the GL DEPTH family (sample index
    ``ns/lambda`` and the z=0 depth offset ``d0``) from bead stacks measured
    at K KNOWN z positions — the measured production route to depth-varying
    deconvolution.

    Why a ladder: a single bead at one depth cannot separate ``ns`` from
    ``d0`` (one SA magnitude fits many (ns, d) pairs), and estimating ns
    fully blind from the sample is a measured identifiability dead end —
    the object absorbs the depth aberration and the joint cost's minimum
    sits AT the wrong index (BASELINE.md depth-blind table). Beads at two
    or more known depths pin the *slope* of aberration vs depth, which is
    exactly ns. Each bead contributes the profiled-amplitude/background
    objective of ``psf_fit.bead_anchor_term`` (delta object — no FFTs in
    the data term) with its depth tied to the shared variable as
    ``d_j = d0 + anchors_z[j] * model.dz``; all other families are shared
    across the ladder. One joint VMLMB run over the gradient-balanced
    variable (``psf_fit.joint_variable``).

    Per-bead axial origin nuisance: a depth-aberrated PSF carries a real
    FOCAL SHIFT (the z=7.5-voxel ladder rung peaks at plane 14 of a
    16-plane grid, measured), while each acquisition's absolute z origin
    is an arbitrary stage coordinate — so the data's integer peak
    centering (``center_bead_stack``) leaves a bead-dependent axial offset
    that would otherwise bias ns hard (measured: with it unmodeled the
    known-pupil ladder fit converges to ns 1.557 for truth 1.36, the TRUE
    params costing 100x more than the wrong ones). Each bead therefore
    gets a free z-shift ``s_j`` (voxels, possibly several planes) applied
    to the MODEL as a cyclic Fourier shift (differentiable, exact),
    initialized at the model's own focal shift under ``params0`` so the
    fit starts within a fraction of a voxel of aligned; ns identification
    then rides on the depth-SA *shape* (the k^4-and-up structure a shift
    cannot absorb), not on absolute focal position.

    ``beads``: (K, nz, ny, nx) stack or list of same-shape stacks (each is
    centered internally); ``anchors_z``: the K bead z positions in data-grid
    voxels (floats allowed; KNOWN, e.g. stage positions). ``families``
    defaults to DEPTH alone — include DEFOCUS/PHASE to calibrate the pupil
    from the same ladder. Returns ``(PsfFitResult, zshifts)``; feed
    ``result.params`` to :func:`depth_anchor_psfs` / ``deconv --depthvar``.
    """
    from microtipi_tpu.jobs.psf_fit import (
        PsfFitConfig, PsfFitResult, center_bead_stack, joint_variable)
    from microtipi_tpu.models.microscope import FAMILY_NAMES

    if config is None:
        config = PsfFitConfig()
    if params0 is None:
        params0 = model.init_params()
    if not hasattr(params0, "depth"):
        raise ValueError("calibrate_depth needs a model with a DEPTH family "
                         "(models/gibson_lanni.py)")
    beads = jnp.asarray(beads, model.dtype)
    if beads.ndim != 4:
        raise ValueError(f"beads must be (K, nz, ny, nx), got {beads.shape}")
    anchors_z = np.asarray(anchors_z, np.float64)
    if anchors_z.shape != (beads.shape[0],):
        raise ValueError(
            f"anchors_z needs one z position per bead, got {anchors_z.shape} "
            f"for {beads.shape[0]} beads")
    names = tuple(FAMILY_NAMES[f] for f in families)
    if "depth" not in names:
        raise ValueError("calibrate_depth fits the DEPTH family; include it "
                         "in families")
    for n in names:
        if getattr(params0, n).shape[0] == 0:
            raise ValueError(f"family {n!r} has no coefficients to fit")

    import dataclasses as _dc

    k, nz = int(beads.shape[0]), int(beads.shape[1])
    bead_model = _dc.replace(model, shape=tuple(beads.shape[1:]))
    offsets = jnp.asarray(anchors_z * model.dz, model.dtype)
    # Unit-peak normalize + center each rung (same measured rationale as
    # fit_psf_beads: raw ADU scales stall the f32 line search).
    centered, s1d = [], []
    for j in range(k):
        peak = jnp.maximum(jnp.max(jnp.abs(beads[j])),
                           jnp.asarray(jnp.finfo(beads.dtype).tiny, beads.dtype))
        d0j = center_bead_stack(beads[j] / peak, subvoxel=subvoxel)
        centered.append(d0j)
        s1d.append(jnp.sum(d0j))
    n_vox = float(beads[0].size)

    def _shift_z(h, s):
        return _cyclic_shift_z(h, s, model.cdtype)

    def _rung_cost(h, d0j, s1dj):
        # Profiled amplitude+background residual (bead_anchor_term math).
        shh = jnp.sum(h * h)
        sh1 = jnp.sum(h)
        shd = jnp.sum(h * d0j)
        det = jnp.maximum(shh * n_vox - sh1 * sh1,
                          jnp.asarray(jnp.finfo(h.dtype).tiny, h.dtype))
        amp = (n_vox * shd - sh1 * s1dj) / det
        c = (shh * s1dj - sh1 * shd) / det
        r = amp * h + c - d0j
        return 0.5 * jnp.sum(r * r)

    centered_stack = jnp.stack(centered)
    s1d_vec = jnp.stack(s1d)

    def ladder_cost(p, zshifts):
        # p.depth = (ns/lambda, d0); bead j sits at d0 + z_j*dz. One vmap
        # over the rungs: the K syntheses run as a single batched FFT
        # program (the depth_anchor_psfs convention), not K unrolled ones.
        def one(off, s, d0j, s1dj):
            h = bead_model.compute_psf(
                p._replace(depth=p.depth.at[1].add(off)))
            return _rung_cost(_shift_z(h, s), d0j, s1dj)

        return jnp.sum(jax.vmap(one)(offsets, zshifts, centered_stack, s1d_vec))

    # Start each s_j at the params0 model's own focal shift: the data peak
    # sits at plane 0 after centering, the model's at its wrapped argmax
    # plane, and a zero start several planes off can strand deep-stack fits
    # in a cyclic-shift local minimum.
    def _peak_shift(off):
        h = bead_model.compute_psf(
            params0._replace(depth=params0.depth.at[1].add(off)))
        prof = jnp.max(h.reshape(nz, -1), axis=1)
        i = jnp.argmax(prof)
        return -jnp.where(i > nz // 2, i - nz, i).astype(model.dtype)

    zs0 = jax.lax.stop_gradient(jax.vmap(_peak_shift)(offsets))
    g0 = jax.grad(
        lambda sub: ladder_cost(params0._replace(**sub), zs0)
    )({n: getattr(params0, n) for n in names})
    x0, rebuild = joint_variable(params0, names, phase_freeze_head, grads=g0)
    assert "zshift" not in x0  # family names can never collide
    var0 = dict(x0, zshift=zs0)

    def objective(v):
        return ladder_cost(rebuild({n: v[n] for n in names}), v["zshift"])

    res = minimize_vmlmb(
        jax.value_and_grad(objective), var0,
        mem=config.mem, maxiter=config.max_iter, maxeval=config.max_eval,
        gatol=config.gatol, grtol=config.grtol,
    )
    fit = PsfFitResult(rebuild({n: res.x[n] for n in names}), res.f,
                       res.iterations, res.evaluations, res.status,
                       res.f_history)
    return fit, res.x["zshift"]


def ladder_fit_uncertainty(
    model,
    params,
    families: tuple[int, ...],
    beads,
    anchors_z,
    zshifts,
    subvoxel: bool = True,
    sigma: float | None = None,
):
    """Error bars for a :func:`calibrate_depth` solution.

    The ladder analog of ``psf_fit.bead_fit_uncertainty`` (same GN/Laplace
    recipe, reference-parity rationale there): the Jacobian stacks every
    rung's prediction ``amp_j * shift_z(h(theta, d0 + z_j dz), s_j) + c_j``
    over the SHARED geometry variable, with the per-rung nuisances — axial
    origin ``s_j`` and profiled ``(amp_j, c_j)`` — included as columns and
    marginalized, so their uncertainty correctly inflates what they trade
    against (s_j trades against the depth offset d0; amp/background against
    the diffuse SA tails). ``std`` gains ``"zshift"``/``"amp"``/
    ``"background"`` ``(K,)`` entries next to the family vectors; the
    headline number is ``std["depth"][0] * wavelength`` — the 1-sigma error
    bar on the calibrated sample index ns.

    Pass the SAME ``model``/``beads``/``anchors_z``/``subvoxel`` as the
    :func:`calibrate_depth` call and its fitted ``(params, zshifts)``.
    """
    import dataclasses as _dc

    from microtipi_tpu.jobs.psf_fit import (
        FitUncertainty, _gn_covariance, center_bead_stack)
    from microtipi_tpu.models.microscope import FAMILY_NAMES

    names = tuple(FAMILY_NAMES[f] for f in families)
    beads = jnp.asarray(beads, model.dtype)
    k, nz = int(beads.shape[0]), int(beads.shape[1])
    anchors_z = np.asarray(anchors_z, np.float64)
    bead_model = _dc.replace(model, shape=tuple(beads.shape[1:]))
    offsets = jnp.asarray(anchors_z * model.dz, model.dtype)
    n_vox = float(beads[0].size)

    centered = []
    for j in range(k):
        peak = jnp.maximum(jnp.max(jnp.abs(beads[j])),
                           jnp.asarray(jnp.finfo(beads.dtype).tiny, beads.dtype))
        centered.append(center_bead_stack(beads[j] / peak, subvoxel=subvoxel))
    d_all = jnp.stack(centered)

    def _h_all(p, s_all):
        # One batched synthesis+shift over the K rungs (depth_anchor_psfs
        # convention: vmap, not K unrolled FFT programs).
        def one(off, s):
            h = bead_model.compute_psf(
                p._replace(depth=p.depth.at[1].add(off)))
            return _cyclic_shift_z(h, s, model.cdtype)

        return jax.vmap(one)(offsets, s_all)

    # Profiled (amp_j, c_j) at the solution — the _rung_cost normal equations.
    tiny = jnp.asarray(jnp.finfo(model.dtype).tiny, model.dtype)
    h_all = _h_all(params, jnp.asarray(zshifts, model.dtype))
    shh = jnp.sum(h_all * h_all, axis=(1, 2, 3))
    sh1 = jnp.sum(h_all, axis=(1, 2, 3))
    shd = jnp.sum(h_all * d_all, axis=(1, 2, 3))
    s1d = jnp.sum(d_all, axis=(1, 2, 3))
    det = jnp.maximum(shh * n_vox - sh1 * sh1, tiny)
    amps = (n_vox * shd - sh1 * s1d) / det
    cs = (shh * s1d - sh1 * shd) / det

    sizes = [int(getattr(params, nm).shape[0]) for nm in names]
    x0 = jnp.concatenate(
        [getattr(params, nm) for nm in names]
        + [jnp.asarray(zshifts, model.dtype), amps, cs])

    def predict(v):
        sub, off = {}, 0
        for nm, sz in zip(names, sizes):
            sub[nm] = v[off:off + sz]
            off += sz
        s_all = v[off:off + k]
        a_all = v[off + k:off + 2 * k]
        c_all = v[off + 2 * k:off + 3 * k]
        p = params._replace(**sub)
        return (a_all[:, None, None, None] * _h_all(p, s_all)
                + c_all[:, None, None, None])

    jac = jax.jacfwd(predict)(x0).reshape(-1, x0.shape[0])
    resid = (predict(x0) - d_all).ravel()
    cov, sigma_out = _gn_covariance(jac, None, x0.shape[0], sigma, resid,
                                    d_all.dtype)
    std_all = jnp.sqrt(jnp.diagonal(cov))
    std, off = {}, 0
    for nm, sz in zip(names, sizes):
        std[nm] = std_all[off:off + sz]
        off += sz
    std["zshift"] = std_all[off:off + k]
    std["amp"] = std_all[off + k:off + 2 * k]
    std["background"] = std_all[off + 2 * k:off + 3 * k]
    return FitUncertainty(std, cov, sigma_out)
