"""Nonparametric pupil retrieval from a bead stack (pixelwise phase map).

Beyond parity: the reference's pupil is always a low-order Zernike expansion
(``WideFieldModel.java:1588-1665``), which cannot represent localized pupil
defects (dust, phase-plate edges, high-order SLM ripple). This job recovers
the pupil phase — and optionally the modulus — as free per-pixel maps on the
pupil support from a measured point-source (bead) through-focus stack, in
the spirit of Hanser et al. 2004 (J. Microsc. 216: phase retrieval for
high-NA PSFs), but as a single regularized gradient solve instead of
Gerchberg-Saxton projections: VMLMB over the maps with the same
profiled-amplitude/background bead objective as the parametric calibration
(``psf_fit.bead_anchor_term``) plus a hyperbolic-TV smoothness prior on each
map. Autodiff through the synthesis replaces the transform cycling, so
modulus fitting, defocus refinement, and any regularizer come for free.

Gauge notes (measured consequences, see tests): piston and tip/tilt are
projected out of the returned phase — piston never changes ``|FFT A|^2``
and tip/tilt is the lateral shift the sub-voxel bead centering leaves
behind (measured to carry ~4/5 of the raw map error at SNR 6000); the
reference's full-basis phase expansion excludes the same three modes
(``WideFieldModel.java:1640-1644``). The z-defocus gauge (Zernike 4 vs an
axial shift) is the blind loop's known drift mode and applies here too:
retrieval is anchored at the ``params0`` defocus and the psi component is
kept in the output as a focus diagnostic.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from microtipi_tpu.jobs.psf_fit import PsfFitConfig, center_bead_stack
from microtipi_tpu.ops.regularization import hyperbolic_tv
from microtipi_tpu.optim.vmlmb import minimize_vmlmb
from microtipi_tpu.utils.grids import fft_index

__all__ = [
    "PupilRetrievalResult",
    "project_phase",
    "remove_position_gauges",
    "resample_pupil_map",
    "retrieve_pupil",
]


def resample_pupil_map(
    m: jax.Array,
    src_dxy: float,
    dst_shape: tuple[int, int],
    dst_dxy: float,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Resample a wrapped pupil-plane map onto another frequency grid.

    A retrieved map (:func:`retrieve_pupil`) lives on the BEAD crop's wrapped
    FFT-frequency grid — ``k = fft_index(n)/(n*dxy)`` cycles/m, the
    reference's pupil sampling (``WideFieldModel.java:1378-1391``) — which
    differs from the sample stack's grid whenever the crop size (or pixel
    pitch) differs. This bridges the two: bilinear interpolation *in physical
    frequency*, so the same pupil phase field lands on the sample model's
    grid and can feed ``compute_psf_from_pupil`` /
    :func:`~microtipi_tpu.jobs.depthvar.depth_anchor_psfs_from_maps`.

    ``mask``: the source support (``PupilRetrievalResult.mask``). When given,
    interpolation is mask-normalized (numerator ``m*mask`` and denominator
    ``mask`` interpolated separately, ratio kept where the interpolated
    support weight exceeds 0.5) so support-edge pixels extrapolate from
    inside the pupil instead of drooping toward the zeros outside — without
    it a one-pixel dark rim appears at the destination support edge. The
    output is NOT re-masked by a destination support; the synthesis masks
    internally (``compute_psf_from_pupil``).

    All index arithmetic is static (shapes and pitches are Python numbers),
    so this traces to pure gathers — jit-friendly.
    """
    ny_s, nx_s = m.shape
    ny_d, nx_d = int(dst_shape[0]), int(dst_shape[1])
    dtype = m.dtype
    # Destination physical frequencies -> fractional signed source indices.
    fy = fft_index(ny_d) / (ny_d * dst_dxy) * (ny_s * src_dxy)
    fx = fft_index(nx_d) / (nx_d * dst_dxy) * (nx_s * src_dxy)
    # Frequencies beyond the source Nyquist were never sampled: zero them
    # (they only occur outside any physical pupil support anyway).
    valid = jnp.asarray(
        (np.abs(fy)[:, None] <= ny_s / 2.0) & (np.abs(fx)[None, :] <= nx_s / 2.0),
        dtype,
    )
    y0 = np.floor(fy).astype(np.int64)
    x0 = np.floor(fx).astype(np.int64)
    ty = jnp.asarray(fy - y0, dtype)[:, None]
    tx = jnp.asarray(fx - x0, dtype)[None, :]
    iy0, iy1 = y0 % ny_s, (y0 + 1) % ny_s
    ix0, ix1 = x0 % nx_s, (x0 + 1) % nx_s

    def bilerp(a):
        v00, v01 = a[np.ix_(iy0, ix0)], a[np.ix_(iy0, ix1)]
        v10, v11 = a[np.ix_(iy1, ix0)], a[np.ix_(iy1, ix1)]
        return ((1 - ty) * ((1 - tx) * v00 + tx * v01)
                + ty * ((1 - tx) * v10 + tx * v11))

    if mask is None:
        return bilerp(jnp.asarray(m, dtype)) * valid
    mask = jnp.asarray(mask, dtype)
    num = bilerp(jnp.asarray(m, dtype) * mask)
    den = bilerp(mask)
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
    keep = (den > 0.5).astype(dtype) * valid
    return jnp.where(keep > 0, num / jnp.maximum(den, tiny), 0.0).astype(dtype)


def remove_position_gauges(phi: jax.Array, mask: jax.Array, psi: jax.Array) -> jax.Array:
    """Project the position gauges {piston, tip/tilt ramp, psi} out of a
    pupil phase map over the support. Apply to BOTH maps before comparing
    two retrievals (or a retrieval against a ground truth) — the gauges are
    arbitrary per measurement (see :func:`retrieve_pupil`)."""
    ny, nx = phi.shape
    ky = jnp.asarray(fft_index(ny), phi.dtype)
    kx = jnp.asarray(fft_index(nx), phi.dtype)
    gauges = jnp.stack([
        jnp.ones_like(phi),
        jnp.broadcast_to(ky[:, None], phi.shape),
        jnp.broadcast_to(kx[None, :], phi.shape),
        psi.astype(phi.dtype),
    ])
    gm = (gauges * mask[None]).reshape(gauges.shape[0], -1)
    gm = gm / jnp.linalg.norm(gm, axis=1, keepdims=True)
    coefs = jnp.linalg.solve(gm @ gm.T, gm @ phi.reshape(-1))
    return (phi - (coefs @ gm).reshape(phi.shape)) * mask


class PupilRetrievalResult(NamedTuple):
    """Outcome of :func:`retrieve_pupil`."""

    phi: jax.Array  #: retrieved pupil phase map (Ny, Nx), piston removed, masked
    rho: jax.Array | None  #: retrieved modulus map (None unless fit_modulus)
    mask: jax.Array  #: full pupil support the maps live on
    psf: jax.Array  #: synthesized PSF at the retrieved pupil (corner-origin)
    f: jax.Array  #: final objective value
    iterations: jax.Array
    evaluations: jax.Array
    status: jax.Array


def project_phase(model, phi: jax.Array, mask: jax.Array) -> jax.Array:
    """Least-squares Zernike coefficients of a retrieved phase map.

    Solves ``min_alpha || mask * (sum_k alpha_k Z_(k+off) - phi) ||^2`` over
    the model's ``n_phase`` phase modes (offset per the radial/full
    convention, ``ops/pupil.synthesize_phase``) — the bridge back to the
    parametric world: feed the coefficients to ``blind_deconvolve`` as
    ``params0``, or compare against a parametric calibration.
    """
    zern, _, _ = model._static()
    off = model.phase_offset
    basis = jnp.asarray(zern[off:off + model.n_phase], phi.dtype)
    m = jnp.asarray(mask, phi.dtype)
    a = (basis * m[None]).reshape(basis.shape[0], -1).T  # (pix, k)
    b = (phi * m).reshape(-1)
    coefs, *_ = jnp.linalg.lstsq(a, b, rcond=None)
    return coefs


def retrieve_pupil(
    model,
    bead_data: jax.Array,
    *,
    params0=None,
    fit_modulus: bool = False,
    smooth: float = 1e-2,
    smooth_epsilon: float = 0.05,
    config: PsfFitConfig = PsfFitConfig(max_iter=100, grtol=1e-9),
    subvoxel: bool = True,
    init: str = "gs",
    gs_iterations: int = 30,
) -> PupilRetrievalResult:
    """Retrieve pixelwise pupil maps from a centered bead stack.

    Parameters:
      model: a ``WideFieldConfig`` at the BEAD stack's geometry
        (``dataclasses.replace(sample_model, shape=bead.shape)``).
      params0: warm start / anchor. The phase map starts at its Zernike
        phase (zeros if None) and the defocus stays FIXED at its value —
        refine defocus parametrically first (``fit_psf_beads``), then
        retrieve the residual map on top.
      fit_modulus: also free the modulus map (lower-bounded at 0, started
        at ``params0``'s modulus). Off by default: modulus errors are
        second-order in the PSF and the extra freedom slows the phase —
        the ``params0`` modulus then stays FIXED through the objective and
        the returned ``psf`` (so a parametric modulus calibration is
        honored, not silently replaced by the nominal flat pupil).
      smooth: RELATIVE weight of the hyperbolic-TV smoothness prior on
        each map — the regularization that replaces the Zernike
        truncation. Scale-invariant: the prior enters as
        ``smooth * f_data(init) * TV(map)/TV(init)``-free form
        ``smooth * f0 * TV`` with ``f0`` the data term at the initial
        maps, so ``smooth=0.01`` means "the prior may contribute ~1% of
        the initial misfit". This normalization is load-bearing (measured:
        an absolute weight of 1e-2 made the prior 50x the data term at
        the TRUE pupil — the solve returned a maximally smooth wrong map
        with better objective than truth). 0 disables (ill-advised: the
        per-pixel problem is underdetermined at the support edge where
        ``rho`` is small).
      smooth_epsilon: TV knee in radians (phase) / modulus units.
      init: "gs" (default) runs ``gs_iterations`` Gerchberg-Saxton
        projection rounds before the gradient polish; "params" starts the
        maps straight from ``params0``. Measured at bead SNR 6000
        (gauge-fixed map error vs a truth with a non-Zernike defect): GS
        start + polish 0.048, flat start + polish 0.156 (the |FFT|^2
        objective is non-convex and the flat-start polish stalls early) —
        GS alone reaches 0.21. GS per round: impose the measured per-plane
        magnitudes on FFT(A_z), back-project, strip defocus, average the
        pupil coherently over z, keep the modulus (Hanser et al. 2004's
        transform cycling, batched over z — 2 batched FFTs per round).

    The data objective is the profiled-amplitude/background bead residual
    of ``psf_fit.bead_anchor_term`` (the stack is normalized to unit peak —
    same f32 conditioning fix as ``fit_psf_beads``). Fully jittable.
    """
    if bead_data.shape != model.shape:
        raise ValueError(
            f"model shape {model.shape} != bead stack shape {bead_data.shape}; "
            "build it with dataclasses.replace(sample_model, shape=bead.shape)"
        )
    if init not in ("gs", "params"):
        raise ValueError(f"unknown init {init!r}")
    if params0 is None:
        params0 = model.init_params()

    ny, nx = model.shape[1:]
    # Initial maps + fixed geometry from the parametric anchor.
    rho0, phi0, psi0, mask = model.compute_pupil(params0)
    defocus = params0.defocus

    data = jnp.asarray(bead_data, model.dtype)
    peak = jnp.maximum(jnp.max(jnp.abs(data)),
                       jnp.asarray(jnp.finfo(data.dtype).tiny, data.dtype))
    d0 = center_bead_stack(data / peak, subvoxel=subvoxel)
    s1d = jnp.sum(d0)
    n = float(d0.size)

    if init == "gs":
        from microtipi_tpu.utils.grids import wrapped_z

        cz = jnp.asarray(
            (2.0 * np.pi * model.dz) * wrapped_z(model.shape[0]), model.dtype
        )
        sqrt_d = jnp.sqrt(jnp.maximum(d0 - jnp.median(d0), 0.0))
        rho_c = rho0.astype(model.cdtype)
        tiny = jnp.asarray(np.finfo(np.float32).tiny, model.dtype)

        def gs_round(_, phi):
            a = rho_c * jnp.exp(1j * (phi[None] + cz[:, None, None] * psi0[None])
                                .astype(model.cdtype))
            f_hat = jnp.fft.fft2(a)
            f_hat = sqrt_d * f_hat / jnp.maximum(jnp.abs(f_hat), tiny)
            a = jnp.fft.ifft2(f_hat)
            pupil = jnp.mean(
                a * jnp.exp(-1j * (cz[:, None, None] * psi0[None]).astype(model.cdtype)),
                axis=0,
            )
            return jnp.angle(pupil).astype(model.dtype) * mask

        phi0 = jax.lax.fori_loop(0, gs_iterations, gs_round, phi0 * mask)

    def bead_cost(h):
        # profiled (amp, c), residual form — see bead_anchor_term for why
        shh = jnp.sum(h * h)
        sh1 = jnp.sum(h)
        shd = jnp.sum(h * d0)
        det = jnp.maximum(shh * n - sh1 * sh1,
                          jnp.asarray(jnp.finfo(h.dtype).tiny, h.dtype))
        amp = (n * shd - sh1 * s1d) / det
        c = (shh * s1d - sh1 * shd) / det
        r = amp * h + c - d0
        return 0.5 * jnp.sum(r * r)

    # Scale-invariant prior weight: anchored at the data misfit of the
    # initial maps (see the `smooth` docstring for the measured failure of
    # an absolute weight).
    f0 = jax.lax.stop_gradient(bead_cost(
        model.compute_psf_from_pupil(phi0, rho=rho0, defocus=defocus)))
    w_smooth = smooth * f0

    def objective(v):
        phi = v["phi"]
        # fit_modulus=False keeps params0's FITTED modulus fixed (rho0) —
        # substituting the nominal flat modulus here would make the phase
        # absorb modulus error (caught in review).
        rho = v["rho"] if fit_modulus else rho0
        h = model.compute_psf_from_pupil(phi, rho=rho, defocus=defocus)
        f = bead_cost(h)
        if smooth > 0:
            f = f + w_smooth * hyperbolic_tv(phi * mask, smooth_epsilon)
            if fit_modulus:
                f = f + w_smooth * hyperbolic_tv(rho * mask, smooth_epsilon)
        return f

    v0 = {"phi": phi0}
    lower = None
    if fit_modulus:
        v0["rho"] = rho0
        lower = {"phi": -jnp.inf, "rho": 0.0}

    res = minimize_vmlmb(
        jax.value_and_grad(objective), v0, lower=lower,
        mem=config.mem, maxiter=config.max_iter, maxeval=config.max_eval,
        gatol=config.gatol, grtol=config.grtol,
    )
    phi = res.x["phi"] * mask
    # Gauge fixing: remove the best-fit piston + tip/tilt ramp + psi
    # component over the support. These are the POSITION gauges of a bead
    # measurement — piston never changes |FFT A|^2, a tip/tilt ramp is a
    # lateral shift, a psi multiple is an axial shift, and the bead's true
    # 3D position is unknown (sub-voxel centering leaves residuals of all
    # three). Measured at SNR 6000: raw map error 0.19 vs truth, 0.047
    # after removing the gauges — tip/tilt and psi carry ~4/5 of the raw
    # difference. The reference's full phase basis excludes piston/tip/tilt
    # for the same reason (``WideFieldModel.java:1640-1644``), and the psi
    # ambiguity is the familiar pin-Z4 axial gauge of blind fitting:
    # absolute focus cannot come from a bead at an unknown z — it stays
    # anchored at the ``params0`` defocus.
    phi = remove_position_gauges(phi, mask, psi0)
    rho = res.x["rho"] * mask if fit_modulus else None
    psf = model.compute_psf_from_pupil(
        phi, rho=rho if fit_modulus else rho0, defocus=defocus)
    return PupilRetrievalResult(
        phi, rho, mask, psf, res.f, res.iterations, res.evaluations, res.status
    )
