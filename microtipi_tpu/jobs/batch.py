"""Single-chip batched solves: vmap over time-lapse frames / channels.

The mesh path (``parallel/``) scales one big problem across chips; this module
is the complementary throughput path — many small volumes on one chip, where
``vmap`` turns the per-volume VMLMB solves into one lockstep batched program
(batched FFTs keep the chip saturated far better than solving sequentially).

Lockstep semantics: all lane solves share iteration structure; a lane that
converges early keeps iterating harmlessly until the batch finishes (standard
vmap-over-while behavior). Costs/histories come back per lane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from microtipi_tpu.jobs.blind import BlindDeconvConfig, blind_deconvolve
from microtipi_tpu.jobs.deconv import DeconvolutionConfig, DeconvolutionResult, deconvolve

__all__ = ["batched_deconvolve", "batched_blind_deconvolve",
           "batched_deconvolve_auto_mu", "batched_deconvolve_depthvar"]


def batched_deconvolve(
    data: jax.Array,
    psf: jax.Array,
    weights: jax.Array | None = None,
    x0: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
    engine: str = "vmlmb",
) -> DeconvolutionResult:
    """Object update over a (B, ...) stack sharing one PSF.

    ``weights``/``x0`` may be batched or None. Returns per-lane results
    (leading batch axis on every field). The fused Pallas TV rides along
    under vmap via its custom_vmap routing to the flattened (B*Nz,)-grid
    kernel — measured 1.3x over the jnp TV at 256^2 planes, parity below
    (BASELINE.md), so the standard auto rule applies unmodified.

    ``engine="admm"`` vmaps the round-4 seconds-to-quality engine instead
    (``jobs.admm.admm_deconvolve``, ``config.max_iter`` per lane — no
    lockstep line searches at all; BASELINE.md engine head-to-head).
    ``config.admm_abstol``/``admm_reltol`` compose: each lane stops at its
    own Boyd §3.3 residual test (converged lanes freeze under the batched
    while_loop; the batch runs until the slowest lane stops).
    """
    if engine == "admm":
        from microtipi_tpu.jobs.admm import admm_deconvolve

        solve = lambda d, p, w, x: admm_deconvolve(
            d, p, weights=w, x0=x, config=config, track_objective=False)
    elif engine != "vmlmb":
        raise ValueError(f"unknown engine {engine!r}")
    else:
        solve = lambda d, p, w, x: deconvolve(d, p, weights=w, x0=x, config=config)
    in_axes = (0, None, 0 if weights is not None else None, 0 if x0 is not None else None)
    fn = jax.vmap(solve, in_axes=in_axes)
    return fn(data, psf, weights, x0)


def batched_deconvolve_depthvar(
    data: jax.Array,
    psfs: jax.Array,
    anchors=None,
    weights: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
) -> DeconvolutionResult:
    """Depth-varying object update over a (B, ...) time-lapse sharing one
    anchor-PSF stack (``jobs.depthvar``; the optics and the depth profile
    are per-acquisition, not per-frame)."""
    from microtipi_tpu.jobs.depthvar import deconvolve_depthvar

    in_axes = (0, None, 0 if weights is not None else None)
    fn = jax.vmap(
        lambda d, p, w: deconvolve_depthvar(d, p, anchors=anchors, weights=w, config=config),
        in_axes=in_axes,
    )
    return fn(data, psfs, weights)


def batched_blind_deconvolve(
    data: jax.Array,
    model,
    params0=None,
    weights: jax.Array | None = None,
    config: BlindDeconvConfig = BlindDeconvConfig(),
    joint_psf: bool = False,
    bead_data: jax.Array | None = None,
):
    """Blind deconvolution over a (B, ...) stack.

    ``joint_psf=False`` (default): each frame gets its own independent PSF
    parameter estimate (vmapped solves; ``params0`` may be batched).
    ``joint_psf=True``: ONE optical system constrained by all frames — the
    sum-over-frames joint fit runs through the mesh implementation on a
    trivial single-device mesh (``params0`` is a single pytree; the result's
    ``params`` is too).

    ``bead_data``: one (unbatched) bead stack — the same optics measured
    once anchors every frame's fit (``jobs.blind.blind_deconvolve``).
    """
    if joint_psf:
        from microtipi_tpu.parallel.blind import sharded_blind_deconvolve
        from microtipi_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(batch=1, z=1, devices=jax.devices()[:1])
        return sharded_blind_deconvolve(
            data, model, mesh, params0=params0, weights=weights, config=config,
            bead_data=bead_data,
        )
    if params0 is None:
        params0 = model.init_params()
        params0 = jax.tree.map(lambda l: jnp.broadcast_to(l, (data.shape[0],) + l.shape), params0)
    in_axes = (0, 0, 0 if weights is not None else None)
    fn = jax.vmap(
        lambda d, p, w: blind_deconvolve(d, model, params0=p, weights=w, config=config,
                                         bead_data=bead_data),
        in_axes=in_axes,
    )
    return fn(data, params0, weights)


def batched_deconvolve_auto_mu(
    data: jax.Array,
    psf: jax.Array,
    weights: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
    **auto_kw,
):
    """Discrepancy-principle auto-mu over a (B, ...) stack — PER FRAME.

    Each lane runs its own bisection (``jobs.autotune.deconvolve_auto_mu``)
    with its own blind noise estimate, so a bleaching time-lapse gets a mu
    that tracks the decaying SNR frame by frame instead of one compromise
    value. All probes across the batch run lockstep in one program (the
    same vmap economics as :func:`batched_deconvolve`).

    ``auto_kw`` forwards ``sigma``/``tau``/``bracket``/``steps``/
    ``search_max_iter``/``init``; a ``sigma`` float is shared by all
    lanes, None estimates per lane. Returns an ``AutoMuResult`` with a
    leading batch axis on every field (``result.mu`` is (B,)).
    """
    from microtipi_tpu.jobs.autotune import deconvolve_auto_mu

    in_axes = (0, 0 if weights is not None else None)
    fn = jax.vmap(
        lambda d, w: deconvolve_auto_mu(d, psf, weights=w, config=config, **auto_kw),
        in_axes=in_axes,
    )
    return fn(data, weights)
