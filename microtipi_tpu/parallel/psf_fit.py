"""Mesh-sharded PSF-parameter fitting, including multi-frame joint fits.

Two sharding facts make the PSF step parallelize cleanly:

- PSF synthesis is *embarrassingly z-parallel*: each plane's pupil field and
  2D FFT are independent (the property the reference exploits with its
  thread pool, ``WideFieldModel.java:216-261``) — with the PSF z-sharded the
  synthesis runs with zero communication;
- the data term is the same distributed convolution as the object step, with
  the roles swapped (object spectrum precomputed once per fit).

For batched stacks (time-lapse / channels) all frames share one optical
system, so the joint fit minimizes the *sum* of per-frame costs over a single
parameter vector — the parameters are tiny and replicated; only the volumes
are sharded.

Feature parity with the dense fits (``jobs.psf_fit``): graduated ``active``
mode scheduling, ``freeze_head`` (pin-Z4), multi-family ``fit_psf_joint``,
and fitting on a grid larger than the model's (the PSF kernel is zero-padded
in FFT layout) — the grid the sharded blind loop uses when Nz/Ny are not
multiples of the mesh z-axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from microtipi_tpu.jobs.psf_fit import PsfFitConfig, PsfFitResult
from microtipi_tpu.models.microscope import FAMILY_NAMES
from microtipi_tpu.optim.vmlmb import minimize_vmlmb
from microtipi_tpu.parallel.fft import sharded_convolve, sharded_spectrum
from microtipi_tpu.parallel.mesh import constrain_volume
from microtipi_tpu.utils.arrays import pad_fft_kernel

__all__ = ["sharded_fit_psf", "sharded_fit_psf_joint"]


def _sharded_data_term(model, data, obj, weights, mesh):
    """Build ``cost(params) = 0.5*sum w*(obj (*) psf(params) - data)^2`` on the
    mesh. ``data``/``obj`` share one (possibly padded) grid; the synthesized
    PSF is z-sharded (communication-free synthesis) and zero-padded to the
    grid if the model grid is smaller."""
    vol_shape = data.shape[-3:]
    if weights is not None:
        # Zero weight EXCLUDES the voxel whatever its value (0*NaN=NaN
        # would defeat the validity mask — WeightedConvolutionCost.build).
        data = jnp.where(weights > 0, data, 0.0)
    obj_hat = sharded_spectrum(constrain_volume(obj, mesh), mesh)

    def cost(p):
        psf = model.compute_psf(p)
        # z-sharded synthesis: per-plane pupil + fft2 are communication-free
        # (skipped when the model grid does not divide the mesh — the padded
        # kernel below is the sharded one then).
        psf = constrain_volume(psf, mesh, batched=False)
        if psf.shape != vol_shape:
            psf = pad_fft_kernel(psf, vol_shape)
            psf = constrain_volume(psf, mesh, batched=False)
        r = sharded_convolve(psf, obj_hat, vol_shape, mesh) - data
        wr2 = r * r if weights is None else weights * r * r
        return 0.5 * jnp.sum(wr2)

    return cost


def sharded_fit_psf(
    model,
    params,
    flag: int,
    data: jax.Array,
    obj: jax.Array,
    mesh: Mesh,
    weights: jax.Array | None = None,
    config: PsfFitConfig = PsfFitConfig(),
    active: int | None = None,
    freeze_head: int = 0,
    precondition: bool = False,
    anchor: jax.Array | None = None,
    prior_weight: float = 0.0,
    aux_terms: tuple = (),
) -> PsfFitResult:
    """Sharded analogue of ``jobs.psf_fit.fit_psf``.

    ``data``/``obj`` are (Nz, Ny, Nx) or batched (B, Nz, Ny, Nx), z-sharded;
    batched inputs produce one jointly-fitted parameter vector. ``active``
    and ``freeze_head`` slice the coefficient vector exactly like the dense
    fit (graduated scheduling / pin-Z4); ``precondition`` applies the same
    per-component initial-gradient scaling the dense fit uses for the
    physical-scale families (GL DEPTH, light-sheet SHEET — without it the
    first step is meters of depth and the fit stalls, ``jobs.psf_fit``).
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

    cost = _sharded_data_term(model, data, obj, weights, mesh)

    def param_of(v):
        return params._replace(**{family: full0.at[freeze_head : freeze_head + v.shape[0]].set(v)})

    def data_objective(v):
        return cost(param_of(v))

    extra_parts = []
    if prior_weight > 0:
        # Calibration prior (see jobs.psf_fit.fit_psf).
        anchor_v = (full0 if anchor is None else anchor)[freeze_head:active]
        f0 = data_objective(x0)
        extra_parts.append(lambda v: prior_weight * f0 * jnp.sum((v - anchor_v) ** 2))
    if aux_terms:
        # Auxiliary (e.g. bead-anchor) terms evaluate replicated: the bead
        # stack is tiny next to the sharded sample volume.
        from microtipi_tpu.jobs.psf_fit import _combine_aux_terms

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
        # Per-component initial-gradient scaling (same recipe and floor as
        # the dense fit_psf).
        g0 = jax.grad(objective)(x0)
        gmax = jnp.max(jnp.abs(g0))
        tiny = jnp.asarray(jnp.finfo(gmax.dtype).tiny, gmax.dtype)
        scale = 1.0 / jnp.maximum(jnp.abs(g0), jnp.maximum(1e-12 * gmax, tiny))
        fun = jax.value_and_grad(lambda u: objective(u * scale))
        res = minimize_vmlmb(
            fun, x0 / scale, mem=config.mem, maxiter=config.max_iter,
            maxeval=config.max_eval, gatol=config.gatol, grtol=config.grtol,
        )
        x_fit = res.x * scale
    else:
        fun = jax.value_and_grad(objective)
        res = minimize_vmlmb(
            fun, x0, mem=config.mem, maxiter=config.max_iter, maxeval=config.max_eval,
            gatol=config.gatol, grtol=config.grtol,
        )
        x_fit = res.x
    return PsfFitResult(
        params._replace(**{family: full0.at[freeze_head:active].set(x_fit)}),
        res.f, res.iterations, res.evaluations, res.status, res.f_history,
    )


def sharded_fit_psf_joint(
    model,
    params,
    flags: tuple[int, ...],
    data: jax.Array,
    obj: jax.Array,
    mesh: Mesh,
    weights: jax.Array | None = None,
    config: PsfFitConfig = PsfFitConfig(),
    phase_freeze_head: int = 0,
    phase_anchor: jax.Array | None = None,
    phase_prior_weight: float = 0.0,
    aux_terms: tuple = (),
) -> PsfFitResult:
    """Sharded analogue of ``jobs.psf_fit.fit_psf_joint``: fit several
    parameter families simultaneously in one VMLMB run (per-family scaling
    and pin-Z4 freeze via ``jobs.psf_fit.joint_variable``), including the
    calibration prior (``phase_anchor``/``phase_prior_weight``)."""
    from microtipi_tpu.jobs.psf_fit import joint_variable

    names = tuple(FAMILY_NAMES[f] for f in flags)
    for n in names:
        if getattr(params, n).shape[0] == 0:
            raise ValueError(f"family {n!r} has no coefficients to fit")

    cost = _sharded_data_term(model, data, obj, weights, mesh)
    # One extra evaluation seeds the gradient-balanced scaling and the
    # prior's f0 normalization (see jobs.psf_fit).
    f0, g0 = jax.value_and_grad(
        lambda sub: cost(params._replace(**sub))
    )({n: getattr(params, n) for n in names})
    x0, rebuild = joint_variable(params, names, phase_freeze_head, grads=g0)

    use_prior = phase_prior_weight > 0 and "phase" in names
    if use_prior and phase_anchor is None:
        phase_anchor = getattr(params, "phase")
    if aux_terms:
        from microtipi_tpu.jobs.psf_fit import _combine_aux_terms

        extra = _combine_aux_terms(rebuild, aux_terms)
    else:
        extra = None

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
    return PsfFitResult(
        rebuild(res.x),
        res.f, res.iterations, res.evaluations, res.status, res.f_history,
    )
