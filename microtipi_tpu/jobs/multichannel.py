"""Joint multi-channel deconvolution with chromatic PSFs (color-TV solve).

Beyond parity: the reference deconvolves one volume with one PSF
(``BlindDeconvJob.java:97-138``); a multi-channel acquisition is C
independent solves. But fluorescence channels image the SAME specimen —
membranes, nuclei and organelles share boundaries even though each label
lights up different structures — and each channel has its OWN PSF (the
pupil radius NA/lambda and the defocus ni/lambda both scale with the
emission wavelength, ``WideFieldModel.java:165-166``). A joint solve over
the (C, Nz, Ny, Nx) block couples the channels where it is physically
justified — edge LOCATIONS — while leaving per-channel intensities free:

    f(x) = sum_c [ 0.5 ||H_c x_c - d_c||^2_{w_c} ]  +  mu * JTV_eps(x)
           (+ sparsity/hessian per channel),            x >= 0

with JTV the channel-coupled hyperbolic TV (one sqrt across channels per
voxel, ``ops.regularization.joint_hyperbolic_tv`` — Bresson & Chan's color
TV). The shared edge map lets a dim channel borrow edge positions from a
bright one instead of blurring them away. ``coupling="separate"`` keeps
per-channel TV (decoupled prior, still one batched solve).

TPU mapping: the data term is batched 3D rFFTs over the leading channel
axis with PER-CHANNEL kernel spectra — the chip sees the same large batched
transforms as ``jobs.batch``/``jobs.timeseries``; the prior couples lanes
elementwise. One VMLMB ``lax.while_loop`` over the 4D block.
:func:`deconvolve_timeseries_multichannel` extends the same program to the
full (T, C) 5D acquisition: color TV within each timepoint + temporal TV
along t + per-frame-per-channel bleaching gains.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from microtipi_tpu.jobs.deconv import (
    DeconvolutionConfig,
    DeconvolutionResult,
    _extra_priors,
    regularization_cost,
    resolve_mem_dtype,
)
from microtipi_tpu.ops.convolution import fft_pair, generalized_kl
from microtipi_tpu.ops.regularization import hyperbolic_tv, joint_hyperbolic_tv
from microtipi_tpu.optim.vmlmb import minimize_vmlmb
from microtipi_tpu.utils.arrays import pad_fft_kernel

__all__ = [
    "deconvolve_multichannel",
    "make_tsmc_objective",
    "deconvolve_timeseries_multichannel",
    "mixing_from_controls",
]


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _perchannel_quadratic_cost(x, kernel_sq, g2, b, c, vol, exact=False):
    """Sum over leading (channel/time) axes of the circulant quadratic data
    term with a PER-CHANNEL kernel spectrum (``kernel_sq`` broadcasts
    against the batched rfftn of ``x`` — (C,) + spec for a 4D block,
    unchanged for the (T, C) 5D block) — one batched FFT pair yields cost
    AND gradient, same harmless-cancellation caveat as the object step
    (``jobs.deconv.make_objective``). ``g2``: per-frame quadratic weight
    (squared bleaching gains; a scalar 1.0 when uncorrected)."""
    axes = tuple(range(x.ndim - 3, x.ndim))
    _rfftn, _irfftn = fft_pair(exact)
    ax = _irfftn(kernel_sq * _rfftn(x, axes=axes), s=vol, axes=axes)
    return (0.5 * jnp.vdot(x, g2 * ax) - jnp.vdot(x, b) + c).real.astype(x.dtype)


def _perchannel_quadratic_fwd(x, kernel_sq, g2, b, c, vol, exact=False):
    axes = tuple(range(x.ndim - 3, x.ndim))
    _rfftn, _irfftn = fft_pair(exact)
    ax = _irfftn(kernel_sq * _rfftn(x, axes=axes), s=vol, axes=axes)
    f = (0.5 * jnp.vdot(x, g2 * ax) - jnp.vdot(x, b) + c).real.astype(x.dtype)
    return f, (g2 * ax - b)


def _perchannel_quadratic_bwd(vol, exact, res, g):
    return (g * res, None, None, None, None)


_perchannel_quadratic_cost.defvjp(_perchannel_quadratic_fwd, _perchannel_quadratic_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _mixed_quadratic_cost(x, normal_spec, b, c, vol, exact=False):
    """Quadratic data term for the spectrally MIXED forward model
    ``y_tc = sum_k M_ck (H_k x_tk)``: the normal operator stays a one-FFT-
    pair circulant program because mixing is pointwise in Fourier space,

        (A^T A x)_k = irfftn( sum_j N_kj xhat_j ),
        N_kj = conj(Hhat_k) (M^T M)_kj Hhat_j            (Hermitian in k,j),

    so unmixing costs ONE (K, K) einsum over spectra on top of the batched
    transforms — no extra FFTs vs the unmixed path. ``b = A^T d`` and
    ``c = 0.5 sum d^2`` are precomputed; gradient = irfftn-sum - b."""
    _rfftn, _irfftn = fft_pair(exact)
    xh = _rfftn(x, axes=(-3, -2, -1))
    ax = _irfftn(jnp.einsum("kjzyx,tjzyx->tkzyx", normal_spec, xh),
                 s=vol, axes=(-3, -2, -1))
    return (0.5 * jnp.vdot(x, ax) - jnp.vdot(x, b) + c).real.astype(x.dtype)


def _mixed_quadratic_fwd(x, normal_spec, b, c, vol, exact=False):
    _rfftn, _irfftn = fft_pair(exact)
    xh = _rfftn(x, axes=(-3, -2, -1))
    ax = _irfftn(jnp.einsum("kjzyx,tjzyx->tkzyx", normal_spec, xh),
                 s=vol, axes=(-3, -2, -1))
    f = (0.5 * jnp.vdot(x, ax) - jnp.vdot(x, b) + c).real.astype(x.dtype)
    return f, (ax - b)


def _mixed_quadratic_bwd(vol, exact, res, g):
    return (g * res, None, None, None)


_mixed_quadratic_cost.defvjp(_mixed_quadratic_fwd, _mixed_quadratic_bwd)


def mixing_from_controls(controls) -> "jnp.ndarray":
    """Detection-spectrum mixing matrix from single-stain controls.

    ``controls`` is a length-K sequence, one per dye, each a ``(C,) + vol``
    stack of a specimen carrying ONLY that dye imaged in every detection
    channel (the standard bleed-through calibration protocol). Column k of
    the returned ``(C, K)`` matrix is control k's background-floor-clipped
    per-channel flux, normalized to unit sum — ``M[c, k]`` = fraction of dye
    k's photons detected in channel c. Host-side NumPy by design (a
    calibration-time utility; eager device dispatch is expensive on
    tunnel-attached deployments — CLAUDE.md platform rules)."""
    import numpy as np

    cols = []
    for arr in controls:
        a = np.asarray(arr, np.float64)
        if a.ndim < 2:
            raise ValueError("each control must be a (C,) + volume stack")
        flux = np.maximum(a, 0.0).reshape(a.shape[0], -1).sum(axis=1)
        total = flux.sum()
        if not total > 0:
            raise ValueError("a control stack has no positive flux")
        cols.append(flux / total)
    return jnp.asarray(np.stack(cols, axis=1))


def deconvolve_multichannel(
    data: jax.Array,
    psfs: jax.Array,
    weights: jax.Array | None = None,
    x0: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
    *,
    coupling: str = "joint",
    mixing: jax.Array | None = None,
) -> DeconvolutionResult:
    """Jointly deconvolve a (C,) + volume stack with per-channel PSFs.

    ``psfs`` is (C,) + vol (one corner-origin PSF per channel — chromatic
    optics) or a single vol broadcast to every channel. ``weights`` may be
    (C,) + vol or per-volume (broadcast over c). ``coupling="joint"``
    (default) applies ``config.mu`` to the channel-coupled hyperbolic TV
    (:func:`~microtipi_tpu.ops.regularization.joint_hyperbolic_tv` — edges
    align across channels, intensities stay free); ``"separate"`` keeps
    per-channel TV, making this exactly C independent solves sharing one
    VMLMB run (test-pinned against the batched solver). The
    ``sparsity``/``hessian`` priors and positivity apply per channel in
    both modes. Returns one joint cost with ``x`` of shape (C,) + vol.
    ``mixing`` adds joint spectral unmixing: pass the (C_det, K)
    bleed-through matrix and the solve recovers the K DYE volumes (``psfs``
    become per dye, ``x`` is (K,) + vol) — semantics and the no-extra-FFT
    fast path per :func:`deconvolve_timeseries_multichannel`.

    Measured guidance (BASELINE.md): tune ``config.mu`` 3-10x LARGER than
    for per-channel TV — shared edges are cheap under the coupled norm, so
    the same mu regularizes less. At each prior's own best mu, joint wins
    on shared-structure labels (dim-channel error -15% to -36%, bright
    channel equal or better) and LOSES ~9% on channels labeling disjoint
    structures — pick the coupling by what the labels decorate, not by
    default.
    """
    data = jnp.asarray(data)
    if data.ndim != 4:
        raise ValueError(f"expected a (C, Nz, Ny, Nx) stack, got {data.shape}")
    # The (T, C) solver with a single timepoint and no temporal prior IS the
    # channel solve (every dot/FFT/prior term is identical up to the leading
    # length-1 axis — the T==1 exactness pin in tests/test_multichannel.py),
    # so delegate instead of duplicating the data-term/objective plumbing.
    if weights is not None:
        weights = jnp.asarray(weights)
        if weights.ndim == 4:
            weights = weights[None]
    res = deconvolve_timeseries_multichannel(
        data[None], psfs, weights=weights,
        x0=None if x0 is None else jnp.asarray(x0)[None],
        config=config, mu_t=0.0, coupling=coupling, mixing=mixing,
    )
    return DeconvolutionResult(
        res.x[0], res.f, res.iterations, res.evaluations, res.status,
        res.f_history, res.pg_history,
    )


def deconvolve_timeseries_multichannel(
    data: jax.Array,
    psfs: jax.Array,
    weights: jax.Array | None = None,
    x0: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
    *,
    mu_t: float = 0.0,
    epsilon_t: float | None = None,
    bleach: jax.Array | None = None,
    coupling: str = "joint",
    mixing: jax.Array | None = None,
) -> DeconvolutionResult:
    """Jointly deconvolve a (T, C) + volume block — the full acquisition.

    The 5D completion of :func:`deconvolve_multichannel` (channel axis) and
    :func:`~microtipi_tpu.jobs.timeseries.deconvolve_timeseries` (time
    axis): one VMLMB run over every timepoint AND channel, with

    - per-channel PSF spectra (``psfs`` is (C,) + vol or one broadcast
      volume — channels keep their chromatic optics across all frames),
    - the color-TV prior coupling channels WITHIN each timepoint
      (``coupling="joint"``; ``config.mu``, couple axis 1 — see
      :func:`deconvolve_multichannel` for the measured guidance, incl. the
      3-10x-larger-mu rule),
    - temporal hyperbolic TV along t per channel (``mu_t``/``epsilon_t`` —
      same semantics and tuning as ``deconvolve_timeseries``),
    - per-frame-per-channel photobleaching gains ``bleach`` of shape
      (T, C) folded into the forward model as ``g_tc * H_c x_tc``
      (channels fade at their own rates — estimate with
      ``ops.preprocess.estimate_bleach`` per channel),
    - optional spectral unmixing: ``mixing`` is the (C_det, K) bleed-through
      matrix (column k = dye k's detection spectrum, from dye tables or
      :func:`mixing_from_controls`), making the forward model
      ``y_tc = sum_k M_ck g_tk (H_k x_tk)`` — the solve recovers the K DYE
      volumes jointly with deconvolution instead of unmix-then-deconvolve
      (which colors the noise) or deconvolve-then-unmix (which deconvolves
      each detected channel with the WRONG single PSF: a mixed channel is a
      sum of differently-blurred dyes). ``psfs``/``bleach``/the returned
      ``x`` are per DYE (K of them); ``weights`` stay per detected channel.
      Unmixing rides the quadratic fast path at no extra FFTs (pointwise
      (K, K) Fourier coupling — ``_mixed_quadratic_cost``); with ``bleach``
      it falls back to the explicit residual. When ``x0`` is omitted the
      solve starts from the clipped pseudo-inverse unmix ``relu(M^+ d)``.

    Exactness pins (tests/test_multichannel.py): C == 1 reproduces
    ``deconvolve_timeseries`` and T == 1 (mu_t=0) reproduces
    ``deconvolve_multichannel`` — identical objectives, near-identical
    trajectories; ``mixing=I`` reproduces the unmixed solve. ``weights``
    may be (T, C)+vol, (C,)+vol (broadcast over t) or one volume.
    """
    objective, aux = make_tsmc_objective(
        psfs, data, weights, config, mu_t=mu_t, epsilon_t=epsilon_t,
        bleach=bleach, coupling=coupling, mixing=mixing)

    if x0 is None:
        if aux["m"] is None:
            x0 = aux["data"]
        else:
            # Linear-unmix warm start: the least-squares dye estimate
            # M^+ d, clipped — the classical unmix-then-deconvolve result
            # is exactly this followed by per-dye deconvolution.
            x0 = jnp.einsum("kc,tczyx->tkzyx", jnp.linalg.pinv(aux["m"]),
                            aux["data"])
    if config.positivity:
        x0 = jnp.maximum(x0, 0.0)

    res = minimize_vmlmb(
        jax.value_and_grad(objective), x0,
        lower=0.0 if config.positivity else None,
        mem=config.mem, maxiter=config.max_iter, maxeval=config.max_eval,
        gatol=config.gatol, grtol=config.grtol,
        mem_dtype=resolve_mem_dtype(config, x0),
    )
    return DeconvolutionResult(
        res.x, res.f, res.iterations, res.evaluations, res.status,
        res.f_history, res.pg_history,
    )


def make_tsmc_objective(
    psfs: jax.Array,
    data: jax.Array,
    weights: jax.Array | None,
    config: DeconvolutionConfig,
    *,
    mu_t: float = 0.0,
    epsilon_t: float | None = None,
    bleach: jax.Array | None = None,
    coupling: str = "joint",
    mixing: jax.Array | None = None,
    accurate: bool = False,
):
    """The joint (T, C)-block objective — the single definition shared by
    the VMLMB solver and the ADMM engine (mirrors
    ``jobs.timeseries.make_timeseries_objective``). Returns
    ``(objective, aux)`` with ``aux`` carrying the prepared pieces the
    engines reuse: ``k_hat`` (per-channel spectra), ``m`` (mixing), ``g5``
    (bleach gains), ``nk``, and the (possibly zero-weight-masked)
    ``data``/``weights``."""
    from microtipi_tpu.jobs.deconv import resolve_exact_fft
    exact = resolve_exact_fft(config)
    _rfftn, _irfftn = fft_pair(exact)

    data = jnp.asarray(data)
    if data.ndim != 5:
        raise ValueError(f"expected a (T, C, Nz, Ny, Nx) block, got {data.shape}")
    if coupling not in ("joint", "separate"):
        raise ValueError(f"unknown coupling {coupling!r}")
    if config.var_shape is not None:
        raise ValueError("var_shape is not supported for the joint 5D solve; "
                         "pad the input data instead")
    nt, nc = data.shape[:2]
    vol = data.shape[2:]
    axes = (2, 3, 4)
    m = None
    nk = nc
    if mixing is not None:
        m = jnp.asarray(mixing, data.dtype)
        if m.ndim != 2 or m.shape[0] != nc:
            raise ValueError(
                f"mixing must be a ({nc}, K) detection-spectra matrix "
                f"(rows = the data's detected channels), got "
                f"{getattr(m, 'shape', None)}")
        nk = m.shape[1]
    psfs = jnp.asarray(psfs)
    if psfs.ndim == 3:  # one corner-origin PSF (any size <= vol), broadcast
        psfs = psfs[None]
    if psfs.ndim != 4 or psfs.shape[0] not in (1, nk):
        raise ValueError(
            f"psfs must be ({'K' if m is not None else 'C'}={nk},) + a "
            f"corner-origin kernel shape <= {vol} (or one volume "
            f"broadcast), got {psfs.shape}")
    kernel = jax.vmap(lambda p: pad_fft_kernel(p, vol))(psfs)
    k_hat = _rfftn(kernel, axes=(1, 2, 3))  # (C or K,) + spec
    if m is not None and k_hat.shape[0] == 1 and nk > 1:
        # The (K, K) Fourier coupling needs one spectrum per dye.
        k_hat = jnp.broadcast_to(k_hat, (nk,) + k_hat.shape[1:])
    if weights is not None:
        weights = jnp.asarray(weights)
        if weights.ndim == 3:
            weights = weights[None, None]
        elif weights.ndim == 4:
            weights = weights[None]
    g5 = None
    if bleach is not None:
        bleach = jnp.asarray(bleach, data.dtype)
        if bleach.shape != (nt, nk):
            raise ValueError(
                f"bleach must be per-frame-per-{'dye' if m is not None else 'channel'} "
                f"gains of shape ({nt}, {nk}), got {bleach.shape}")
        g5 = bleach.reshape(nt, nk, 1, 1, 1)

    def model(x):
        hx = _irfftn(k_hat * _rfftn(x, axes=axes), s=vol, axes=axes)
        if g5 is not None:
            hx = g5 * hx
        if m is not None:
            hx = jnp.einsum("ck,tkzyx->tczyx", m, hx)
        return hx

    bg = jnp.asarray(config.background, data.dtype)
    if config.data_term == "poisson":
        if weights is not None:
            raise ValueError("data_term='poisson' does not compose with weights")

        def data_term(x):
            return generalized_kl(model(x) + bg, jnp.maximum(data, 0.0))
    elif config.data_term != "gaussian":
        raise ValueError(f"unknown data_term {config.data_term!r}")
    elif weights is None and m is None and accurate:
        # Residual form: same FFT count for a VALUE, no eps*c cancellation
        # (the ADMM engines' f_history tracker; jobs.deconv.make_objective).
        def data_term(x):
            r = model(x) - data
            return 0.5 * jnp.sum(r * r)
    elif weights is None and m is None:
        kernel_sq = jnp.real(k_hat) ** 2 + jnp.imag(k_hat) ** 2
        g2 = jnp.ones((), data.dtype) if g5 is None else g5 * g5
        b = _irfftn(jnp.conj(k_hat) * _rfftn(data, axes=axes),
                    s=vol, axes=axes)
        if g5 is not None:
            b = g5 * b
        c = 0.5 * jnp.sum(data * data)

        def data_term(x):
            return _perchannel_quadratic_cost(x, kernel_sq, g2, b, c, vol,
                                              exact)
    elif weights is None and g5 is None and accurate:
        def data_term(x):
            r = model(x) - data
            return 0.5 * jnp.sum(r * r)
    elif weights is None and g5 is None:
        # Mixed quadratic fast path: pointwise (K, K) Fourier coupling.
        gram = m.T @ m  # (K, K)
        normal_spec = jnp.einsum("kzyx,kj,jzyx->kjzyx",
                                 jnp.conj(k_hat), gram, k_hat)
        b = _irfftn(
            jnp.conj(k_hat) * jnp.einsum(
                "ck,tczyx->tkzyx", m, _rfftn(data, axes=axes)),
            s=vol, axes=axes)
        c = 0.5 * jnp.sum(data * data)

        def data_term(x):
            return _mixed_quadratic_cost(x, normal_spec, b, c, vol, exact)
    else:
        if weights is None:  # mixing + bleach: explicit residual
            weights = jnp.ones((), data.dtype)
        else:
            # Zero weight EXCLUDES the voxel whatever its value (0*NaN=NaN
            # would defeat the validity mask — same invariant as every
            # other weighted path, ops/convolution.py).
            data = jnp.where(weights > 0, data, 0.0)

        def data_term(x):
            r = model(x) - data
            return 0.5 * jnp.sum(weights * r * r)

    eps_t = config.epsilon if epsilon_t is None else epsilon_t

    def objective(x):
        f = data_term(x)
        if coupling == "joint":
            if config.mu > 0:
                f = f + config.mu * joint_hyperbolic_tv(
                    x, config.epsilon, config.scales, axes=(-3, -2, -1),
                    couple_axis=1,
                )
            f = f + _extra_priors(x, config, axes=(-3, -2, -1))
        else:
            f = f + regularization_cost(x, config, axes=(-3, -2, -1))
        if mu_t > 0:
            f = f + mu_t * hyperbolic_tv(x, eps_t, axes=(0,))
        return f

    aux = {"k_hat": k_hat, "m": m, "g5": g5, "nk": nk, "nt": nt, "nc": nc,
           "vol": vol, "data": data, "weights": weights}
    return objective, aux
