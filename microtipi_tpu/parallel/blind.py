"""Mesh-sharded blind deconvolution: the full alternating loop on a mesh.

BASELINE.json config 5 end-to-end: batched time-lapse / multi-channel stacks
on a (batch, z) mesh, alternating the sharded object update
(``parallel.deconv``) with the sharded PSF fits (``parallel.psf_fit``) —
one optical system constrained by every frame. Loop semantics live in
``jobs.blind.run_blind_loop`` (shared with the dense path), so
skip-refit-on-last-round, zero-budget skips, graduated phase scheduling,
``joint_fit``, ``phase_freeze_head`` and the wiener warm start behave
identically on the mesh; one jitted program.

Arbitrary stack sizes: when Nz or Ny is not a multiple of the mesh z-axis
(the divisibility the transpose-based distributed FFT needs), the loop
switches to padded-variable mode — the object lives on the rounded-up grid
and the padding carries zero weight, the same semantics as the dense
crop-operator mode (and as TiPi's pad-weights-to-PSF-shape convention,
``PSF_Estimation.java:322-324``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from microtipi_tpu.jobs.blind import BlindDeconvConfig, BlindDeconvResult, run_blind_loop
from microtipi_tpu.models.microscope import DEPTH, PHASE, SHEET
from microtipi_tpu.parallel.deconv import (
    crop_trailing,
    pad_trailing,
    sharded_deconvolve,
    sharded_wiener,
)
from microtipi_tpu.parallel.fft import sharded_convolve, sharded_spectrum
from microtipi_tpu.parallel.mesh import Z_AXIS, constrain_volume
from microtipi_tpu.parallel.psf_fit import sharded_fit_psf, sharded_fit_psf_joint
from microtipi_tpu.utils.arrays import pad_fft_kernel

__all__ = ["sharded_blind_deconvolve"]


def _round_up(v: int, m: int) -> int:
    return v + (-v) % m


def sharded_blind_deconvolve(
    data: jax.Array,
    model,
    mesh: Mesh,
    params0=None,
    weights: jax.Array | None = None,
    weight_updater=None,
    config: BlindDeconvConfig = BlindDeconvConfig(),
    bead_data: jax.Array | None = None,
) -> BlindDeconvResult:
    """Sharded analogue of ``jobs.blind.blind_deconvolve``.

    ``data``: (Nz, Ny, Nx) or batched (B, Nz, Ny, Nx), z-sharded over the
    mesh. Nz/Ny need not divide the mesh z-axis — the grid is padded up
    internally (zero-weight padding; the returned object lives on the padded
    grid, ``crop_trailing`` recovers the data window).

    ``bead_data``: optional bead stack for the structural calibration anchor
    (``jobs.blind.blind_deconvolve``). The bead term is tiny and evaluates
    replicated on the mesh.
    """
    if params0 is None:
        params0 = model.init_params()
    batched = data.ndim == 4
    data = constrain_volume(data, mesh)
    vol = data.shape[-3:]
    zp = mesh.shape[Z_AXIS]

    base_var = tuple(config.deconv.var_shape) if config.deconv.var_shape is not None else vol
    var_shape = (_round_up(base_var[0], zp), _round_up(base_var[1], zp), base_var[2])
    padded = var_shape != vol
    dcfg = dataclasses.replace(config.deconv, var_shape=var_shape if padded else None)
    if config.fit.fit_window is not None:
        raise ValueError(
            "PsfFitConfig.fit_window is a single-chip optimization (the "
            "crop would gather across shards); drop it for the sharded loop"
        )
    if config.deconv_engine == "admm" and (batched or padded):
        raise ValueError(
            "the sharded admm object engine takes one mesh-divisible "
            "(Nz, Ny, Nx) volume (parallel.admm); batched/auto-padded "
            "sharded loops run the VMLMB object step"
        )
    fit_cfg = dataclasses.replace(config.fit, grtol=0.0)  # BlindDeconvJob.java:124

    # Fit-step grid: the var grid when padded (zero weight outside the data
    # window), the data grid otherwise.
    if padded:
        d_fit = constrain_volume(pad_trailing(data, var_shape), mesh)
        w_base = jnp.ones(vol, data.dtype) if weights is None else weights
        w_fit_base = constrain_volume(pad_trailing(w_base, var_shape), mesh)
        window = constrain_volume(
            pad_trailing(jnp.ones(vol, data.dtype), var_shape), mesh, batched=False
        )
    else:
        d_fit, w_fit_base, window = data, weights, None

    def _mask(x):
        # The dense loop crops the object to the data window before using it
        # as the fit kernel; masking is the padded-grid equivalent.
        return x * window if padded else x

    if config.init == "wiener":
        psf0 = model.compute_psf(params0)
        if padded:
            x0 = sharded_wiener(d_fit, pad_fft_kernel(psf0, var_shape), mesh)
        else:
            x0 = sharded_wiener(data, psf0, mesh)
    else:
        x0 = pad_trailing(data, var_shape)
    x0 = jnp.maximum(x0, 0.0)

    def object_step(x, params, mu):
        psf = model.compute_psf(params)
        cfg_i = dcfg if mu is None else dataclasses.replace(dcfg, mu=mu)
        if config.deconv_engine == "admm":
            from microtipi_tpu.parallel.admm import sharded_admm_deconvolve

            # over_relax=1.0 inside the alternation (jobs/blind.py rationale).
            res = sharded_admm_deconvolve(data, psf, mesh, weights=weights,
                                          x0=x, config=cfg_i,
                                          over_relax=1.0,
                                          track_objective=False)
        else:
            res = sharded_deconvolve(data, psf, mesh, weights=weights, x0=x, config=cfg_i)
        return res.x, res.f, res.iterations, psf

    def fit_weights(x, psf):
        if weight_updater is None:
            return w_fit_base
        # Model prediction H*x at the data window (deconvolver.getModel());
        # re-estimated weights feed ONLY the PSF step (BlindDeconvJob.java:109-111).
        k_hat = sharded_spectrum(pad_fft_kernel(psf, var_shape), mesh)
        pred = crop_trailing(sharded_convolve(x, k_hat, var_shape, mesh), vol)
        w = weight_updater(pred, data)
        return pad_trailing(w, var_shape) if padded else w

    # Calibration-prior anchor at the ORIGINAL params0 (jobs/blind.py).
    phase_anchor = params0.phase if config.phase_prior_weight > 0 else None

    # Structural bead anchor (jobs/blind.py): replicated auxiliary term.
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

    def fit_one(params, x, w_fit, j, phase_active):
        flag = config.families[j]
        fres = sharded_fit_psf(
            model, params, flag, d_fit, _mask(x), mesh, weights=w_fit,
            config=dataclasses.replace(fit_cfg, max_iter=config.psf_max_iter[j]),
            active=phase_active,
            freeze_head=config.phase_freeze_head if flag == PHASE else 0,
            # physical-scale families stall unpreconditioned (jobs/blind.py)
            precondition=flag in (DEPTH, SHEET),
            anchor=phase_anchor if flag == PHASE else None,
            prior_weight=config.phase_prior_weight if flag == PHASE else 0.0,
            aux_terms=aux_terms,
        )
        return fres.params, fres.f

    def fit_joint(params, x, w_fit, jfams):
        fres = sharded_fit_psf_joint(
            model, params, jfams, d_fit, _mask(x), mesh, weights=w_fit,
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
