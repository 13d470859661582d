"""Finer-grid ("super-resolution") deconvolution: solve below the camera pixel.

Beyond parity: the reference reconstructs on the acquisition grid
(``BlindDeconvJob.java:97-138`` — object and data share one TiPi space).
But the camera pixel is a hard sampling floor only for the DATA; the
forward model extends naturally to an object on an f-times finer lattice,

    d  =  Bin_f( h_fine (*) x_fine ) + noise,

where ``Bin_f`` integrates each camera pixel over its f_z x f_y x f_x
fine-grid block (photon counting sums, it does not average) and ``h_fine``
is the PSF sampled at the fine pitch — which the pupil models synthesize
exactly (``WideFieldConfig`` at ``dxy/f``): the optical transfer function
is band-limited by NA/lambda, not by the camera, so when the camera
undersamples the optics (pixel pitch above lambda/(4 NA)) the fine grid
recovers real frequencies the coarse grid aliases. Even at adequate
sampling it removes pixelation: point sources land at their true
sub-pixel positions instead of snapping to the acquisition lattice
(pinned by a test).

TPU shape: everything is the ordinary circulant solve at the FINE size —
the FFTs just get f^3 bigger — plus a reshape-sum (bin) and its
broadcast adjoint, both bandwidth-trivial; positivity + TV(+sparsity)
priors act on the fine grid where they are most informative.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from microtipi_tpu.jobs.deconv import (
    DeconvolutionConfig,
    DeconvolutionResult,
    has_regularizer,
    make_regularizer,
    resolve_mem_dtype,
)
from microtipi_tpu.ops.convolution import generalized_kl
from microtipi_tpu.optim.vmlmb import minimize_vmlmb
from microtipi_tpu.utils.arrays import pad_fft_kernel

__all__ = ["admm_deconvolve_superres", "bin_volume", "deconvolve_superres",
           "make_superres_objective", "upsample_psf", "upsample_volume"]


def upsample_psf(psf: jax.Array, factor: tuple[int, int, int]) -> jax.Array:
    """Band-limited (Fourier zero-pad) upsampling of a measured PSF to the
    fine grid — the bridge from ``empirical_psf`` to the superres solve
    when no pupil model fits the optics.

    Sinc interpolation is EXACT when the coarse measurement itself sampled
    the PSF adequately (pixel pitch below lambda/(4 NA)): verified against
    the pupil model to 1e-15 relative error (NA 0.8 at 150 nm pitch,
    2x lateral). CAVEAT: an undersampled PSF measurement carries aliased
    content that no interpolation can unfold — in that regime synthesize
    the fine PSF from a fitted model instead (``fitpsf`` then the CLI's
    model path). Even-size Nyquist bins are split/duplicated so the result
    is exactly real; tiny sinc-ringing negatives are clamped. Corner-origin
    in, corner-origin out. Flux convention: the total SUM is preserved and
    per-voxel values scale by 1/f^3 — measured to be exactly the pupil
    model's own convention (its PSF sum is invariant to refinement), so
    model-synthesized and upsampled-measured fine PSFs are interchangeable
    in :func:`deconvolve_superres`.
    """
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig, resolve_exact_fft
    from microtipi_tpu.ops import exactfft

    fz, fy, fx = (int(v) for v in factor)
    n = psf.shape
    _fftn = exactfft.fftn if resolve_exact_fft(DeconvolutionConfig()) \
        else jnp.fft.fftn
    spec = _fftn(jnp.asarray(psf).astype(
        jnp.complex128 if psf.dtype == jnp.float64 else jnp.complex64))
    # halve even-size Nyquist bins before the split below
    for ax, (N, f) in enumerate(zip(n, (fz, fy, fx))):
        if f > 1 and N % 2 == 0:
            idx = [slice(None)] * 3
            idx[ax] = N // 2
            spec = spec.at[tuple(idx)].multiply(0.5)
    sh = jnp.fft.fftshift(spec)
    pads = [((N * f - N + 1) // 2, (N * f - N) // 2)
            for N, f in zip(n, (fz, fy, fx))]
    big = jnp.pad(sh, pads)
    # duplicate the (halved) -N/2 bin at +N/2 so interpolation stays real
    for ax, (N, f) in enumerate(zip(n, (fz, fy, fx))):
        if f > 1 and N % 2 == 0:
            lo = (N * f - N + 1) // 2
            src = [slice(None)] * 3
            dst = [slice(None)] * 3
            src[ax] = lo
            dst[ax] = lo + N
            big = big.at[tuple(dst)].set(big[tuple(src)])
    _ifftn = exactfft.ifftn if resolve_exact_fft(DeconvolutionConfig()) \
        else jnp.fft.ifftn
    out = _ifftn(jnp.fft.ifftshift(big)).real
    return jnp.maximum(out.astype(psf.dtype), 0.0)


def bin_volume(x: jax.Array, factor: tuple[int, int, int]) -> jax.Array:
    """Integrate f_z x f_y x f_x fine-grid blocks into camera pixels (sum)."""
    fz, fy, fx = factor
    nz, ny, nx = x.shape
    return x.reshape(nz // fz, fz, ny // fy, fy, nx // fx, fx).sum(axis=(1, 3, 5))


def upsample_volume(d: jax.Array, factor: tuple[int, int, int]) -> jax.Array:
    """Adjoint-direction start: replicate each camera pixel over its block,
    dividing by the block size so ``bin(upsample(d)) == d`` (flux split
    evenly — the minimum-information inverse of :func:`bin_volume`)."""
    fz, fy, fx = factor
    n = fz * fy * fx
    up = jnp.broadcast_to(
        d[:, None, :, None, :, None],
        (d.shape[0], fz, d.shape[1], fy, d.shape[2], fx),
    )
    return (up / n).reshape(d.shape[0] * fz, d.shape[1] * fy, d.shape[2] * fx)


def deconvolve_superres(
    data: jax.Array,
    psf_fine: jax.Array,
    factor: tuple[int, int, int] = (1, 2, 2),
    weights: jax.Array | None = None,
    x0: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
) -> DeconvolutionResult:
    """Deconvolve onto a ``factor``-times finer object grid.

    ``psf_fine`` is the corner-origin PSF sampled at the FINE pitch and
    fine shape ``(fz*Nz, fy*Ny, fx*Nx)`` — synthesize it from the model at
    ``dxy/f_x`` / ``dz/f_z`` (the CLI does this automatically); binning a
    fine PSF of the same optics is NOT equivalent to a coarse PSF, that is
    the whole point. ``weights`` live on the DATA grid. ``config.scales``
    (TV voxel sizes) should be the fine pitches. ``config.var_shape`` is
    unsupported (the fine grid is already the variable grid; pad the data
    instead). Returns the fine-grid object; ``bin_volume(res.x, factor)``
    is the model's camera-plane prediction (before PSF re-blur it is NOT
    the data — it is the deconvolved image integrated to camera pixels).
    """
    data = jnp.asarray(data)
    factor, fine_shape = _check_superres(data, psf_fine, factor, config)
    objective = make_superres_objective(psf_fine, data, weights, config, factor)

    if x0 is None:
        x0 = upsample_volume(data, factor)
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


def _check_superres(data, psf_fine, factor, config):
    """Shared validation; returns (factor, fine_shape)."""
    if data.ndim != 3:
        raise ValueError(f"expected a (Nz, Ny, Nx) volume, got {data.shape}")
    if config.var_shape is not None:
        raise ValueError("var_shape is not supported on the superres path; "
                         "pad the data instead")
    fz, fy, fx = (int(f) for f in factor)
    if min(fz, fy, fx) < 1:
        raise ValueError(f"factor components must be >= 1, got {factor}")
    if (fz, fy, fx) == (1, 1, 1):
        raise ValueError("factor (1, 1, 1) is the ordinary solve; use deconvolve")
    factor = (fz, fy, fx)
    fine_shape = (fz * data.shape[0], fy * data.shape[1], fx * data.shape[2])
    if psf_fine.shape != fine_shape:
        raise ValueError(
            f"psf_fine shape {psf_fine.shape} != fine grid {fine_shape} "
            f"(= factor {factor} x data {data.shape})")
    return factor, fine_shape


def make_superres_objective(psf_fine, data, weights, config, factor):
    """The fine-grid objective value (scalar) — the single definition shared
    by the VMLMB solver and the ADMM engine (mirrors
    ``jobs.timeseries.make_timeseries_objective``; returns the plain
    objective, wrap in ``jax.value_and_grad`` for the solver)."""
    from microtipi_tpu.jobs.deconv import resolve_exact_fft
    from microtipi_tpu.ops.convolution import fft_pair

    _rfftn, _irfftn = fft_pair(resolve_exact_fft(config))
    factor, fine_shape = _check_superres(jnp.asarray(data), psf_fine, factor,
                                         config)
    kernel = pad_fft_kernel(psf_fine, fine_shape)
    k_hat = _rfftn(kernel)

    def model(x):
        conv = _irfftn(k_hat * _rfftn(x), s=fine_shape)
        return bin_volume(conv, factor)

    bg = jnp.asarray(config.background, data.dtype)
    if config.data_term == "poisson":
        if weights is not None:
            raise ValueError("data_term='poisson' does not compose with weights")

        def data_term(x):
            return generalized_kl(model(x) + bg, jnp.maximum(data, 0.0))
    elif config.data_term != "gaussian":
        raise ValueError(f"unknown data_term {config.data_term!r}")
    else:
        if weights is not None:
            # Zero weight EXCLUDES the voxel (0*NaN = NaN would defeat the
            # validity mask — WeightedConvolutionCost.build invariant).
            data = jnp.where(weights > 0, data, 0.0)

        def data_term(x):
            r = model(x) - data
            return (0.5 * jnp.sum(r * r) if weights is None
                    else 0.5 * jnp.sum(weights * r * r))

    # make_regularizer (not the sharded-objective jnp form): the fine grid
    # is a plain single-device 3D volume, so the fused Pallas TV kernel
    # applies — and TV is a proportionally bigger share of each evaluation
    # here (the grid is f^3 larger than the camera's).
    reg = make_regularizer(config, fine_shape)

    def objective(x):
        f = data_term(x)
        if has_regularizer(config):
            f = f + reg(x)
        return f

    return objective


def admm_deconvolve_superres(
    data: jax.Array,
    psf_fine: jax.Array,
    factor: tuple[int, int, int] = (1, 2, 2),
    weights: jax.Array | None = None,
    x0: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
    *,
    rho0: float | None = None,
    rho1: float | None = None,
    rho2: float | None = None,
    over_relax: float = 1.8,
    track_objective: bool = True,
) -> DeconvolutionResult:
    """ADMM engine for the finer-grid solve (same objective as
    :func:`deconvolve_superres` via ``make_superres_objective``).

    The binning operator does not break the circulant structure: split
    ``z0 = h_fine (*) x`` on the FINE grid, so the x-update is the plain
    fine-grid circulant solve, and the data term ``0.5 w ||Bin(z0) - d||^2``
    has a PER-BLOCK closed-form prox — ``Bin^T Bin`` is rank-1 on each
    f_z x f_y x f_x block (Sherman-Morrison):

        z = v - 1 * w (sum_block v - d) / (rho0 + w n),   n = fz*fy*fx

    (Poisson: the scalar binned intensity ``s = sum_block z`` solves the
    same quadratic-root prox as the 3D engine with ``rho0/n``, then
    ``z = v + (s - sum_block v)/n``.) Per iteration: 4 fine-grid FFTs +
    pointwise proxes. sparsity/hessian priors raise (VMLMB covers them).
    """
    from microtipi_tpu.jobs.admm import (
        _check_config,
        _circ_diffs,
        _circ_diffs_adjoint,
        _grad_sq_spectrum,
        _hyperbolic_prox,
    )

    _check_config(config, "admm", weights, allow_exact=True)
    from microtipi_tpu.jobs.deconv import resolve_exact_fft as _ref
    from microtipi_tpu.ops.convolution import fft_pair as _fp

    _rfftn, _irfftn = _fp(_ref(config))
    data = jnp.asarray(data)
    if weights is not None:
        # Zero weight EXCLUDES the camera pixel (0*NaN in the block prox
        # would poison — WeightedConvolutionCost.build invariant).
        data = jnp.where(jnp.asarray(weights) > 0, data, 0.0)
    factor, fine_shape = _check_superres(data, psf_fine, factor, config)
    fz, fy, fx = factor
    nblk = fz * fy * fx
    dtype = data.dtype
    mu, eps = float(config.mu), float(config.epsilon)
    bg = float(config.background)
    scales = config.scales
    poisson = config.data_term == "poisson"
    r1 = float(rho1) if rho1 is not None else max(mu / max(eps, 1e-30), 1e-6)
    r2 = float(rho2) if rho2 is not None else r1
    if rho0 is not None:
        r0 = float(rho0)
    elif poisson:
        r0 = 1.0 / jnp.maximum(jnp.mean(data) / nblk + bg, 1e-12)
    elif weights is not None:
        r0 = jnp.mean(weights)
    else:
        r0 = 1.0

    kernel = pad_fft_kernel(psf_fine, fine_shape)
    k_hat = _rfftn(kernel)
    h2 = jnp.real(k_hat) ** 2 + jnp.imag(k_hat) ** 2
    s2 = _grad_sq_spectrum(fine_shape, scales, h2.dtype)
    den = r0 * h2 + r1 * s2 + r2

    objective = make_superres_objective(psf_fine, data, weights, config, factor)

    w_d = jnp.asarray(1.0, dtype) if weights is None else jnp.asarray(weights)

    def _data_prox(v, rr0):
        """Per-block prox of the binned data term (see docstring)."""
        s_v = bin_volume(v, factor)  # sum over each block
        if poisson:
            b_ = jnp.asarray(bg, dtype)
            rr = rr0 / nblk
            B = 1.0 + rr * (b_ - s_v)
            C = b_ - data - rr * s_v * b_
            disc = jnp.maximum(B * B - 4.0 * rr * C, 0.0)
            s_star = (-B + jnp.sqrt(disc)) / (2.0 * rr)
            corr = (s_star - s_v) / nblk
        else:
            corr = -w_d * (s_v - data) / (rr0 + w_d * nblk)
        return v + upsample_volume(corr, factor) * nblk

    def step_core(carry):
        x, z0, u0, z1, u1, z2, u2 = carry
        rhs = r1 * _circ_diffs_adjoint(
            [z - u for z, u in zip(z1, u1)], scales) + r2 * (z2 - u2)
        x_hat = (r0 * jnp.conj(k_hat) * _rfftn(z0 - u0)
                 + _rfftn(rhs)) / den
        x = _irfftn(x_hat, s=fine_shape).astype(dtype)
        al = float(over_relax)  # Boyd 2011 §3.4.3; measured table BASELINE.md
        hx = _irfftn(k_hat * x_hat, s=fine_shape).astype(dtype)
        hxr = hx if al == 1.0 else al * hx + (1.0 - al) * z0
        z0 = _data_prox(hxr + u0, r0)
        u0 = u0 + hxr - z0
        dx = _circ_diffs(x, scales)
        dxr = dx if al == 1.0 else [al * d + (1.0 - al) * z
                                    for d, z in zip(dx, z1)]
        v = [d + u for d, u in zip(dxr, u1)]
        vmag = jnp.sqrt(
            sum(m * t * t for m, t in zip(masks, v)) + jnp.finfo(dtype).tiny)
        s = _hyperbolic_prox(vmag, mu / r1, eps)
        scale = s / vmag
        z1 = [jnp.where(m > 0, scale * t, t) for m, t in zip(masks, v)]
        u1 = [u + d - z for u, d, z in zip(u1, dxr, z1)]
        xr = x if al == 1.0 else al * x + (1.0 - al) * z2
        z2 = jnp.maximum(xr + u2, 0.0) if config.positivity else xr + u2
        u2 = u2 + xr - z2
        f = objective(z2) if track_objective else jnp.asarray(jnp.nan, dtype)
        return (x, z0, u0, z1, u1, z2, u2), f, dx, hx

    def step(carry, _):
        new_carry, f, _, _ = step_core(carry)
        return new_carry, f

    if x0 is None:
        x0 = upsample_volume(data, factor)
    if config.positivity:
        x0 = jnp.maximum(x0, 0.0)
    x = jnp.asarray(x0, dtype)
    f0 = objective(x)
    masks = []
    for a in range(3):
        m = jnp.ones(fine_shape, dtype)
        masks.append(m.at[tuple(
            slice(-1, None) if i == a else slice(None)
            for i in range(3))].set(0.0))
    z0 = _irfftn(k_hat * _rfftn(x), s=fine_shape).astype(dtype)
    u0 = jnp.zeros_like(x)
    z1 = _circ_diffs(x, scales)
    u1 = [jnp.zeros_like(g) for g in z1]
    z2 = x
    u2 = jnp.zeros_like(x)
    from jax import lax

    from microtipi_tpu.jobs.admm import _admm_tolerances, _boyd_criterion

    init = (x, z0, u0, z1, u1, z2, u2)
    n = int(config.max_iter)
    abstol, reltol, check_every, use_tol = _admm_tolerances(config)
    if not use_tol:
        (x, z0, u0, z1, u1, z2, u2), fs = lax.scan(
            step, init, None, length=n)
        out = z2 if config.positivity else x
        f_final = objective(out)
        if track_objective:
            hist = jnp.concatenate([f0[None], fs])
        else:
            hist = jnp.full((n + 1,), jnp.nan, dtype).at[0].set(f0)
        return DeconvolutionResult(
            out, f_final, jnp.asarray(n), jnp.asarray(n),
            jnp.asarray(0), hist, jnp.full_like(hist, jnp.nan),
        )

    # Boyd §3.3 residual-controlled path — see jobs.admm.admm_deconvolve.
    # Splits: z0 = h_fine (*) x (always — the binned data term lives in its
    # prox), z1 = Dx, z2 = x, all on the fine grid.
    n_el = 1.0
    for d_ in fine_shape:
        n_el *= float(d_)
    p_el = n_el * 5.0

    def _convT(v):
        return _irfftn(jnp.conj(k_hat) * _rfftn(v),
                              s=fine_shape).astype(dtype)

    hist0 = jnp.full((n + 1,), jnp.nan, jnp.asarray(f0).dtype).at[0].set(f0)

    def w_cond(st):
        _, i, _, conv = st
        return (~conv) & (i < n)

    def w_body(st):
        carry, i, hist, _ = st
        z0_o, z1_o, z2_o = carry[1], carry[3], carry[5]
        new_carry, f, dx, hx = step_core(carry)
        xn, z0n, u0n, z1n, u1n, z2n, u2n = new_carry
        i1 = i + 1
        hist = hist.at[i1].set(f)
        check = jnp.mod(i1, check_every) == 0

        def _chk(_):
            r_terms = ([d - z for d, z in zip(dx, z1n)]
                       + [xn - z2n, hx - z0n])
            z_terms = list(z1n) + [z2n, z0n]

            def dual_fn():
                s_vec = (r1 * _circ_diffs_adjoint(
                    [a - b for a, b in zip(z1n, z1_o)], scales)
                    + r2 * (z2n - z2_o) + r0 * _convT(z0n - z0_o))
                aty = (r1 * _circ_diffs_adjoint(u1n, scales) + r2 * u2n
                       + r0 * _convT(u0n))
                return s_vec, aty

            return _boyd_criterion(r_terms, z_terms, dual_fn,
                                   p_el, n_el, abstol, reltol)

        conv = lax.cond(check, _chk, lambda _: jnp.asarray(False), None)
        return new_carry, i1, hist, conv

    st0 = (init, jnp.asarray(0, jnp.int32), hist0, jnp.asarray(False))
    (x, z0, u0, z1, u1, z2, u2), k, hist, conv = lax.while_loop(
        w_cond, w_body, st0)
    out = z2 if config.positivity else x
    f_final = objective(out)
    status = jnp.where(conv, 0, 1).astype(jnp.int32)
    return DeconvolutionResult(
        out, f_final, k, k, status, hist, jnp.full_like(hist, jnp.nan),
    )
