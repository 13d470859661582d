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

__all__ = ["ism_reassign", "ism_richardson_lucy"]


def ism_reassign(model, data: jax.Array, factor: float | None = None) -> jax.Array:
    """Assemble the ISM image: shift element k by ``-factor * d_k``, sum.

    ``model``: an ``ISMConfig`` carrying the array geometry; ``data``:
    ``(K,) + model.shape`` raw element images (K must match
    ``model.n_elements``); ``factor`` defaults to
    ``model.reassign_factor``. Lateral Fourier shifts (exact, subvoxel)
    batched over K*Nz planes.
    """
    if factor is None:
        factor = model.reassign_factor
    d = jnp.asarray(data, model.dtype)
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
) -> jax.Array:
    """Joint Poisson-MLE RL over the K raw element images.

    Synthesizes the per-element PSFs at ``params``
    (``ISMConfig.compute_psfs``) and runs the multi-view RL fusion with
    one "view" per detector element — the exact-physics alternative to
    reassignment + deconvolution. All ``multiview_richardson_lucy``
    options pass through (Wiener-Butterworth backprojector, background,
    warm start).
    """
    from microtipi_tpu.jobs.richardson_lucy import multiview_richardson_lucy

    d = jnp.asarray(data, model.dtype)
    k = model.n_elements
    if d.ndim != 4 or d.shape[0] != k or d.shape[1:] != model.shape:
        raise ValueError(
            f"data must be ({k},) + {model.shape}, got {d.shape}")
    psfs = model.compute_psfs(params)
    return multiview_richardson_lucy(
        d, psfs, iterations=iterations, background=background, x0=x0,
        backprojector=backprojector, wb_beta=wb_beta)
