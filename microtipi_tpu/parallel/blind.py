"""Mesh-sharded blind deconvolution: the full alternating loop on a mesh.

BASELINE.json config 5 end-to-end: batched time-lapse / multi-channel stacks
on a (batch, z) mesh, alternating the sharded object update
(``parallel.deconv``) with the sharded joint PSF fit (``parallel.psf_fit``) —
one optical system constrained by every frame. Same loop semantics as
``jobs.blind`` (skip-refit-on-last-round etc.); one jitted program.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from microtipi_tpu.jobs.blind import BlindDeconvConfig, BlindDeconvResult
from microtipi_tpu.optim.vmlmb import minimize_vmlmb
from microtipi_tpu.parallel.deconv import make_sharded_objective
from microtipi_tpu.parallel.mesh import volume_sharding
from microtipi_tpu.parallel.psf_fit import sharded_fit_psf

__all__ = ["sharded_blind_deconvolve"]


def sharded_blind_deconvolve(
    data: jax.Array,
    model,
    mesh: Mesh,
    params0=None,
    weights: jax.Array | None = None,
    config: BlindDeconvConfig = BlindDeconvConfig(),
) -> BlindDeconvResult:
    """Sharded analogue of ``jobs.blind.blind_deconvolve``.

    ``data``: (Nz, Ny, Nx) or batched (B, Nz, Ny, Nx), z-sharded over the
    mesh. No padded-variable mode (var grid == data grid).
    """
    if config.joint_fit or config.phase_schedule is not None or config.init != "data":
        raise NotImplementedError(
            "joint_fit/phase_schedule/init are dense-loop features "
            "(jobs.blind.blind_deconvolve); the sharded loop does not support "
            "them yet — results would silently differ otherwise"
        )
    if params0 is None:
        params0 = model.init_params()
    sharding = volume_sharding(mesh, batched=data.ndim == 4)
    data = jax.lax.with_sharding_constraint(data, sharding)
    x0 = jnp.maximum(data, 0.0) if config.deconv.positivity else data

    nfam = len(config.families)
    fit_cfg = dataclasses.replace(config.fit, grtol=0.0)
    dcfg = config.deconv

    def round_body(i, carry):
        x, params, deconv_f, fit_f = carry
        psf = model.compute_psf(params)
        fun = make_sharded_objective(psf, data, weights, dcfg, mesh)
        res = minimize_vmlmb(
            fun, x,
            lower=0.0 if dcfg.positivity else None,
            mem=dcfg.mem, maxiter=dcfg.max_iter, maxeval=dcfg.max_eval,
            gatol=dcfg.gatol, grtol=dcfg.grtol,
        )
        x = res.x
        deconv_f = deconv_f.at[i].set(res.f)

        def run_fits(params):
            ff = jnp.zeros((nfam,), res.f.dtype)
            for j, flag in enumerate(config.families):
                if config.psf_max_iter[j] <= 0:
                    continue
                fres = sharded_fit_psf(
                    model, params, flag, data, x, mesh, weights=weights,
                    config=dataclasses.replace(fit_cfg, max_iter=config.psf_max_iter[j]),
                )
                params = fres.params
                ff = ff.at[j].set(fres.f)
            return params, ff

        def skip_fits(params):
            return params, jnp.full((nfam,), jnp.nan, res.f.dtype)

        params, ff = lax.cond(i < config.loops - 1, run_fits, skip_fits, params)
        return x, params, deconv_f, fit_f.at[i].set(ff)

    carry0 = (
        x0, params0,
        jnp.full((config.loops,), jnp.nan, data.dtype),
        jnp.full((config.loops, nfam), jnp.nan, data.dtype),
    )
    x, params, deconv_f, fit_f = lax.fori_loop(0, config.loops, round_body, carry0)
    return BlindDeconvResult(x, params, model.compute_psf(params), deconv_f, fit_f)
