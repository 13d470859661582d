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
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from microtipi_tpu.jobs.psf_fit import PsfFitConfig, PsfFitResult
from microtipi_tpu.models.microscope import FAMILY_NAMES
from microtipi_tpu.optim.vmlmb import minimize_vmlmb
from microtipi_tpu.parallel.fft import sharded_convolve, sharded_spectrum
from microtipi_tpu.parallel.mesh import volume_sharding

__all__ = ["sharded_fit_psf"]


def sharded_fit_psf(
    model,
    params,
    flag: int,
    data: jax.Array,
    obj: jax.Array,
    mesh: Mesh,
    weights: jax.Array | None = None,
    config: PsfFitConfig = PsfFitConfig(),
) -> PsfFitResult:
    """Sharded analogue of ``jobs.psf_fit.fit_psf``.

    ``data``/``obj`` are (Nz, Ny, Nx) or batched (B, Nz, Ny, Nx), z-sharded;
    batched inputs produce one jointly-fitted parameter vector.
    """
    family = FAMILY_NAMES[flag]
    x0 = getattr(params, family)
    vol_shape = data.shape[-3:]
    vol_sh = volume_sharding(mesh, batched=False)

    obj_hat = sharded_spectrum(
        jax.lax.with_sharding_constraint(obj, volume_sharding(mesh, batched=obj.ndim == 4)),
        mesh,
    )

    def objective(v):
        p = params._replace(**{family: v})
        psf = model.compute_psf(p)
        # z-sharded synthesis: per-plane pupil + fft2 are communication-free.
        psf = jax.lax.with_sharding_constraint(psf, vol_sh)
        r = sharded_convolve(psf, obj_hat, vol_shape, mesh) - data
        wr2 = r * r if weights is None else weights * r * r
        return 0.5 * jnp.sum(wr2)

    fun = jax.value_and_grad(objective)
    res = minimize_vmlmb(
        fun, x0, mem=config.mem, maxiter=config.max_iter, maxeval=config.max_eval,
        gatol=config.gatol, grtol=config.grtol,
    )
    return PsfFitResult(
        params._replace(**{family: res.x}),
        res.f, res.iterations, res.evaluations, res.status, res.f_history,
    )
