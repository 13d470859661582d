"""Mesh-sharded depth-varying deconvolution.

Distributed analogue of ``jobs/depthvar.py``: the depth-variant operator
``H x = sum_k h_k (*) (w_k ⊙ x)`` runs on the (batch, z) mesh with one
distributed-FFT convolution per anchor (2K all-to-alls per model
evaluation; K is small and static). The per-plane blend weights ``w_k``
multiply the z-sharded object locally — GSPMD broadcasts the (Nz,) weight
rows with no communication — and the anchor spectra live in the y-sharded
distributed layout (``parallel.fft``), replicated over batch.

Padded-variable mode follows the mesh convention of
``parallel.deconv.make_sharded_objective``: the object lives on the padded
grid and the pad region carries zero weight (numerically the crop-operator
data term), which is also how mesh-odd Nz/Ny stacks become divisible.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from microtipi_tpu.jobs.deconv import (
    DeconvolutionConfig,
    DeconvolutionResult,
    has_regularizer,
    regularization_cost,
    resolve_mem_dtype,
)
from microtipi_tpu.ops.depthconv import depth_weights
from microtipi_tpu.optim.vmlmb import minimize_vmlmb
from microtipi_tpu.parallel.deconv import pad_trailing
from microtipi_tpu.parallel.fft import sharded_convolve, sharded_spectrum
from microtipi_tpu.parallel.mesh import constrain_volume
from microtipi_tpu.utils.arrays import pad_fft_kernel

__all__ = [
    "sharded_blind_deconvolve_depthvar",
    "sharded_deconvolve_depthvar",
    "sharded_fit_psf_depthvar",
]


def sharded_deconvolve_depthvar(
    data: jax.Array,
    psfs: jax.Array,
    mesh: Mesh,
    anchors=None,
    weights: jax.Array | None = None,
    x0: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
) -> DeconvolutionResult:
    """Depth-varying object update on the mesh.

    ``data`` is (Nz, Ny, Nx) or batched (B, Nz, Ny, Nx), z-sharded; ``psfs``
    the (K,)+volume corner-origin anchor stack shared across the batch;
    ``anchors`` the matching z indices of the data grid (default K evenly
    spaced). Drop-in sharded analogue of ``jobs.depthvar.deconvolve_depthvar``.
    """
    vol_shape = data.shape[-3:]
    var_shape = tuple(config.var_shape) if config.var_shape is not None else vol_shape
    k = psfs.shape[0]
    if anchors is None:
        anchors = np.linspace(0.0, vol_shape[0] - 1.0, k)
    anchors = np.asarray(anchors, np.float64)
    if anchors.shape != (k,):
        raise ValueError(f"need one anchor per kernel, got {anchors.shape} for K={k}")

    if psfs.shape[1:] != var_shape:
        psfs = jnp.stack([pad_fft_kernel(psfs[i], var_shape) for i in range(k)])
    k_hats = [sharded_spectrum(psfs[i], mesh) for i in range(k)]
    off_z = (var_shape[0] - vol_shape[0]) // 2
    zw = jnp.asarray(depth_weights(var_shape[0], anchors + off_z), data.dtype)

    if weights is not None:
        # Zero weight EXCLUDES the voxel whatever its value (0*NaN=NaN
        # would defeat the validity mask — WeightedConvolutionCost.build).
        data = jnp.where(weights > 0, data, 0.0)
    data = constrain_volume(data, mesh)
    padded = var_shape != vol_shape
    batched = data.ndim == 4
    if padded:
        d = constrain_volume(pad_trailing(data, var_shape), mesh)
        w = jnp.ones(vol_shape, data.dtype) if weights is None else weights
        w = constrain_volume(pad_trailing(w, var_shape), mesh, batched=False)
    else:
        d, w = data, weights

    def model(x):
        hx = sharded_convolve(zw[0][:, None, None] * x, k_hats[0], var_shape, mesh)
        for i in range(1, k):
            hx = hx + sharded_convolve(zw[i][:, None, None] * x, k_hats[i], var_shape, mesh)
        return hx

    def objective(x):
        r = model(x) - d
        f = 0.5 * jnp.sum(r * r) if w is None else 0.5 * jnp.sum(w * r * r)
        if has_regularizer(config):
            f = f + regularization_cost(
                x, config, axes=(-3, -2, -1) if batched else None
            )
        return f

    if x0 is None:
        x0 = pad_trailing(data, var_shape)
        if config.positivity:
            x0 = jnp.maximum(x0, 0.0)
    x0 = constrain_volume(x0, mesh)
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


def _sharded_depthvar_fit_cost(model, data, obj, weights, mesh, anchors,
                               off_z: int = 0):
    """Depth-varying PSF-fit data term on the mesh: the K masked-object
    spectra ``rfftn(w_k ⊙ obj)`` are computed ONCE (the sharded analogue of
    ``jobs.depthvar._depthvar_fit_cost``'s object-as-kernel trick,
    ``PSF_Estimation.java:147-157``); each evaluation then re-synthesizes
    the K anchor PSFs from the CURRENT parameters (z-sharded,
    communication-free synthesis) and runs K distributed convolutions.

    ``off_z`` shifts the blend weights when ``data``/``obj`` live on a
    padded grid (``pad_trailing`` centers the data window); the SYNTHESIS
    depths stay at the data-grid anchors — padding moves the blend rows,
    not the physics.
    """
    vol = data.shape[-3:]
    if weights is not None:
        # Zero weight EXCLUDES the voxel (see WeightedConvolutionCost.build).
        data = jnp.where(weights > 0, data, 0.0)
    anchors = np.asarray(anchors, np.float64)
    k = anchors.shape[0]
    zw = jnp.asarray(depth_weights(vol[0], anchors + off_z), data.dtype)
    obj = constrain_volume(obj, mesh)
    obj_k_hats = [
        sharded_spectrum(constrain_volume(zw[i][:, None, None] * obj, mesh), mesh)
        for i in range(k)
    ]
    offsets = jnp.asarray(anchors * model.dz, model.dtype)

    def cost(p):
        pred = None
        for i in range(k):
            psf = model.compute_psf(
                p._replace(depth=p.depth.at[1].add(offsets[i])))
            psf = constrain_volume(psf, mesh, batched=False)
            if psf.shape != vol:
                psf = constrain_volume(pad_fft_kernel(psf, vol), mesh,
                                       batched=False)
            term = sharded_convolve(psf, obj_k_hats[i], vol, mesh)
            pred = term if pred is None else pred + term
        r = pred - data
        wr2 = r * r if weights is None else weights * r * r
        return 0.5 * jnp.sum(wr2)

    return cost


def sharded_fit_psf_depthvar(
    model,
    params,
    flags: tuple[int, ...],
    data: jax.Array,
    obj: jax.Array,
    mesh: Mesh,
    anchors,
    weights: jax.Array | None = None,
    config=None,
    phase_active: int | None = None,
    phase_freeze_head: int = 0,
    phase_anchor: jax.Array | None = None,
    phase_prior_weight: float = 0.0,
    aux_terms: tuple = (),
    off_z: int = 0,
):
    """Sharded analogue of ``jobs.depthvar.fit_psf_depthvar``: fit PSF
    parameter families under the DEPTH-VARYING forward operator on the
    (batch, z) mesh — one flag for the single-family fit (graduated
    ``phase_active``, pin-Z4 ``phase_freeze_head``, calibration prior),
    several for the gradient-balanced joint fit. Batched ``data``/``obj``
    produce one jointly-fitted parameter vector (frames share the optics).
    The GL DEPTH family is fittable (``anchors`` offset ``params.depth[1]``
    per anchor), with the same per-component preconditioning as the dense
    fit (``jobs.psf_fit`` physical-scale stall rationale).
    """
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig, fit_families_with_cost
    from microtipi_tpu.models.microscope import FAMILY_NAMES

    if config is None:
        config = PsfFitConfig()
    if not hasattr(params, "depth"):
        raise ValueError(
            "sharded_fit_psf_depthvar needs a model with a DEPTH family "
            "(models/gibson_lanni.py) — the anchors vary that family")
    names = tuple(FAMILY_NAMES[f] for f in flags)
    cost = _sharded_depthvar_fit_cost(model, data, obj, weights, mesh,
                                      anchors, off_z=off_z)
    return fit_families_with_cost(
        cost, params, names, config,
        phase_active=phase_active,
        phase_freeze_head=phase_freeze_head,
        phase_anchor=phase_anchor,
        phase_prior_weight=phase_prior_weight,
        aux_terms=aux_terms,
    )


def sharded_blind_deconvolve_depthvar(
    data: jax.Array,
    model,
    mesh: Mesh,
    anchors,
    params0=None,
    weights: jax.Array | None = None,
    weight_updater=None,
    config=None,
    bead_data: jax.Array | None = None,
):
    """Blind DEPTH-VARYING deconvolution on the (batch, z) mesh — the
    sharded analogue of ``jobs.depthvar.blind_deconvolve_depthvar`` with
    the feature set of ``parallel.blind.sharded_blind_deconvolve``:
    batched frames share one optical system, Nz/Ny need not divide the
    mesh z-axis (zero-weight padding), and all the
    ``BlindDeconvConfig`` knobs (joint_fit, schedules, calibration prior,
    bead anchor, wiener init) behave identically. The PSF handed back is
    the (K, ...) anchor stack at the fitted parameters.
    """
    import dataclasses

    from microtipi_tpu.jobs.blind import (
        BlindDeconvConfig, BlindDeconvResult, run_blind_loop)
    from microtipi_tpu.jobs.depthvar import depth_anchor_psfs
    from microtipi_tpu.models.microscope import DEPTH, PHASE, SHEET
    from microtipi_tpu.parallel.blind import _round_up
    from microtipi_tpu.parallel.deconv import crop_trailing, sharded_wiener
    from microtipi_tpu.parallel.mesh import Z_AXIS

    if config is None:
        config = BlindDeconvConfig()
    if params0 is None:
        params0 = model.init_params()
    if not hasattr(params0, "depth"):
        raise ValueError(
            "sharded_blind_deconvolve_depthvar needs a model with a DEPTH "
            "family (models/gibson_lanni.py)")
    batched = data.ndim == 4
    data = constrain_volume(data, mesh)
    vol = data.shape[-3:]
    if isinstance(anchors, int):
        anchors = np.linspace(0.0, vol[0] - 1.0, anchors)
    anchors = np.asarray(anchors, np.float64)
    zp = mesh.shape[Z_AXIS]

    base_var = (tuple(config.deconv.var_shape)
                if config.deconv.var_shape is not None else vol)
    var_shape = (_round_up(base_var[0], zp), _round_up(base_var[1], zp),
                 base_var[2])
    padded = var_shape != vol
    off_z = (var_shape[0] - vol[0]) // 2
    dcfg = dataclasses.replace(config.deconv,
                               var_shape=var_shape if padded else None)
    fit_cfg = dataclasses.replace(config.fit, grtol=0.0)  # BlindDeconvJob.java:124

    if padded:
        d_fit = constrain_volume(pad_trailing(data, var_shape), mesh)
        w_base = jnp.ones(vol, data.dtype) if weights is None else weights
        w_fit_base = constrain_volume(pad_trailing(w_base, var_shape), mesh)
        window = constrain_volume(
            pad_trailing(jnp.ones(vol, data.dtype), var_shape), mesh,
            batched=False)
    else:
        d_fit, w_fit_base, window = data, weights, None

    def _mask(x):
        return x * window if padded else x

    def synth(p):
        return depth_anchor_psfs(model, p, anchors, depth0=p.depth[1])

    if config.init == "wiener":
        # Middle-anchor regularized inverse: the best shift-invariant
        # stand-in for the depth-varying blur (jobs/depthvar.py).
        mid = synth(params0)[anchors.shape[0] // 2]
        if padded:
            x0 = sharded_wiener(d_fit, pad_fft_kernel(mid, var_shape), mesh)
        else:
            x0 = sharded_wiener(data, mid, mesh)
    else:
        x0 = pad_trailing(data, var_shape)
    x0 = jnp.maximum(x0, 0.0)

    def object_step(x, params, mu):
        psfs = synth(params)
        cfg_i = dcfg if mu is None else dataclasses.replace(dcfg, mu=mu)
        res = sharded_deconvolve_depthvar(
            data, psfs, mesh, anchors, weights=weights, x0=x, config=cfg_i)
        return res.x, res.f, res.iterations, psfs

    def fit_weights(x, psfs):
        if weight_updater is None:
            return w_fit_base
        zw = jnp.asarray(depth_weights(var_shape[0], anchors + off_z),
                         data.dtype)
        pred = None
        for i in range(psfs.shape[0]):
            h = psfs[i]
            if h.shape != var_shape:
                h = pad_fft_kernel(h, var_shape)
            k_hat = sharded_spectrum(h, mesh)
            term = sharded_convolve(zw[i][:, None, None] * x, k_hat,
                                    var_shape, mesh)
            pred = term if pred is None else pred + term
        w = weight_updater(crop_trailing(pred, vol), data)
        return pad_trailing(w, var_shape) if padded else w

    phase_anchor = params0.phase if config.phase_prior_weight > 0 else None

    aux_terms = ()
    if bead_data is not None:
        from microtipi_tpu.jobs.psf_fit import bead_anchor_term

        if bead_data.shape[-1] != bead_data.shape[-2]:
            raise ValueError(
                f"bead stack must be laterally square for the pupil model, "
                f"got {tuple(bead_data.shape)}")
        bead_model = dataclasses.replace(model, shape=tuple(bead_data.shape))
        aux_terms = (
            (bead_anchor_term(bead_model, bead_data,
                              subvoxel=config.bead_subvoxel),
             config.bead_weight),
        )

    def fit_one(params, x, w_fit, j, phase_active):
        flag = config.families[j]
        fres = sharded_fit_psf_depthvar(
            model, params, (flag,), d_fit, _mask(x), mesh, anchors,
            weights=w_fit,
            config=dataclasses.replace(fit_cfg,
                                       max_iter=config.psf_max_iter[j]),
            phase_active=phase_active,
            phase_freeze_head=config.phase_freeze_head if flag == PHASE else 0,
            phase_anchor=phase_anchor if flag == PHASE else None,
            phase_prior_weight=(config.phase_prior_weight
                                if flag == PHASE else 0.0),
            aux_terms=aux_terms,
            off_z=off_z,
        )
        return fres.params, fres.f

    def fit_joint(params, x, w_fit, jfams):
        fres = sharded_fit_psf_depthvar(
            model, params, jfams, d_fit, _mask(x), mesh, anchors,
            weights=w_fit,
            config=dataclasses.replace(fit_cfg,
                                       max_iter=max(config.psf_max_iter)),
            phase_freeze_head=config.phase_freeze_head,
            phase_anchor=phase_anchor,
            phase_prior_weight=config.phase_prior_weight,
            aux_terms=aux_terms,
            off_z=off_z,
        )
        return fres.params, fres.f

    x, params, deconv_f, fit_f, deconv_iters = run_blind_loop(
        config, data.dtype, x0, params0, object_step, fit_weights,
        fit_one, fit_joint,
    )
    return BlindDeconvResult(
        x, params, synth(params), deconv_f, fit_f, deconv_iters
    )
