"""ISM / Airyscan reconstruction: pixel reassignment and joint multi-element MLE.

The two standard reconstruction routes for detector-array confocal data
(``models/ism.ISMConfig``), both jit-friendly:

- :func:`ism_reassign` — classical pixel reassignment (Sheppard 1988;
  Mueller & Enderlein 2010): shift element image k back by
  ``reassign_factor * d_k`` and sum. One batched FFT pair; the result is
  a single volume whose PSF is exactly ``ISMConfig.compute_psf`` (pinned
  by tests), ready for every downstream solver (``deconvolve``,
  ``richardson_lucy``, ``blind_deconvolve`` — "Airyscan joint
  deconvolution" is reassignment + deconvolution with this PSF).
- :func:`ism_richardson_lucy` — joint Poisson MLE over the K raw element
  images through their individual PSFs (no reassignment approximation;
  the multi-view RL machinery, ``jobs/richardson_lucy.py``). Slower per
  iteration (K forward models) but uses the exact per-element physics —
  the measured comparison lives in BASELINE.md.

Data layout: ``(K,) + (Nz, Ny, Nx)`` with element order matching
``ISMConfig.offsets()`` (center-out hex). The reference has no scanning
modality at all (SURVEY.md section 0); pupil-synthesis parity semantics
flow in through the confocal model (``WideFieldModel.java:60-78``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ism_element_gains", "ism_reassign", "ism_richardson_lucy"]


def ism_element_gains(
    model, params, data: jax.Array, background="none"
) -> jax.Array:
    """Self-calibrate relative detector-element gains, shape ``(K,)``.

    Real arrays have per-element sensitivity spread (SPAD PDE, fiber
    coupling); uncorrected it biases the reassignment sum toward the hot
    elements. Because every element images the SAME object through a
    flux-preserving convolution, the MODEL predicts each element's share
    of the light independent of the object — ``F_k = sum_r h_k(r)`` —
    so the measured totals give the gains in closed form:
    ``g_k ~ sum(data_k) / F_k``, normalized to mean 1. Exact on
    offset-free data (test-pinned); noise averages out over the volume.

    ``background``: camera offset handling — a constant offset biases
    the totals, and per-element offsets are NOT identifiable jointly
    with the gains from one acquisition (2K unknowns, K totals). Options:
    "none" (default — data already dark-subtracted), a scalar or ``(K,)``
    array of known dark levels (subtracted), or "median" (per-element
    median as the dark level — valid only for SPARSE scenes where most
    voxels are background; on a dense scene the median sits on real
    signal and the subtraction biases the gains, measured in tests).
    Feed the result to :func:`ism_reassign`/:func:`ism_richardson_lucy`.
    """
    d = jnp.asarray(data, model.dtype)
    k = d.shape[0]
    if isinstance(background, str):
        if background == "median":
            med = jnp.median(d.reshape(k, -1), axis=1)
            d = d - med[:, None, None, None]
        elif background != "none":
            raise ValueError(f"unknown background mode {background!r}")
    else:
        b = jnp.broadcast_to(jnp.asarray(background, model.dtype), (k,))
        d = d - b[:, None, None, None]
    totals = jnp.sum(d, axis=(1, 2, 3))
    share = jnp.sum(model.compute_psfs(params), axis=(1, 2, 3))
    g = totals / jnp.maximum(share, jnp.finfo(d.dtype).tiny)
    return g / jnp.mean(g)


def ism_reassign(
    model, data: jax.Array, factor: float | None = None, gains=None
) -> jax.Array:
    """Assemble the ISM image: shift element k by ``-factor * d_k``, sum.

    ``model``: an ``ISMConfig`` carrying the array geometry; ``data``:
    ``(K,) + model.shape`` raw element images (K must match
    ``model.n_elements``); ``factor`` defaults to
    ``model.reassign_factor``. ``gains``: per-element relative gains
    ``(K,)`` (:func:`ism_element_gains`) — each image is divided by its
    gain first. Lateral Fourier shifts (exact, subvoxel) batched over
    K*Nz planes.
    """
    if factor is None:
        factor = model.reassign_factor
    d = jnp.asarray(data, model.dtype)
    if gains is not None:
        g = jnp.asarray(gains, model.dtype)
        # a dead/defective element (gain ~0 or negative from noise in
        # ism_element_gains) is EXCLUDED, not divided: clamping and
        # dividing would amplify its residual noise by 1/eps (caught in
        # review); gains are mean-1 normalized so 1e-3 only catches
        # genuinely dead elements
        gc = g[:, None, None, None]
        d = jnp.where(gc > 1e-3, d / jnp.where(gc > 1e-3, gc, 1.0), 0.0)
    k = model.n_elements
    if d.ndim != 4 or d.shape[0] != k or d.shape[1:] != model.shape:
        raise ValueError(
            f"data must be ({k},) + {model.shape} (center-out element "
            f"order, ISMConfig.offsets()), got {d.shape}")
    _, ny, nx = model.shape
    ramps = jnp.asarray(model._shift_ramps(-factor), model.cdtype)[:, None]
    out = jnp.fft.irfft2(jnp.fft.rfft2(d) * ramps, s=(ny, nx))
    return jnp.sum(out, axis=0).astype(model.dtype)


def ism_richardson_lucy(
    model,
    params,
    data: jax.Array,
    iterations: int = 50,
    background: float = 0.0,
    x0: jax.Array | None = None,
    backprojector: str = "matched",
    wb_beta: float = 0.1,
    gains=None,
) -> jax.Array:
    """Joint Poisson-MLE RL over the K raw element images.

    Synthesizes the per-element PSFs at ``params``
    (``ISMConfig.compute_psfs``) and runs the multi-view RL fusion with
    one "view" per detector element — the exact-physics alternative to
    reassignment + deconvolution. ``gains`` (:func:`ism_element_gains`)
    scale the element PSFs so the forward model matches each element's
    sensitivity (the statistically right treatment: the raw counts keep
    their own noise). All ``multiview_richardson_lucy`` options pass
    through (Wiener-Butterworth backprojector, background, warm start).
    """
    from microtipi_tpu.jobs.richardson_lucy import multiview_richardson_lucy

    d = jnp.asarray(data, model.dtype)
    k = model.n_elements
    if d.ndim != 4 or d.shape[0] != k or d.shape[1:] != model.shape:
        raise ValueError(
            f"data must be ({k},) + {model.shape}, got {d.shape}")
    psfs = model.compute_psfs(params)
    if gains is not None:
        psfs = psfs * jnp.asarray(gains, model.dtype)[:, None, None, None]
    return multiview_richardson_lucy(
        d, psfs, iterations=iterations, background=background, x0=x0,
        backprojector=backprojector, wb_beta=wb_beta)
