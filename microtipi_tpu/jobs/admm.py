"""Alternative object-step engines: ADMM and FISTA (time-to-quality probes).

Beyond parity: the reference's object step is VMLMB-only behind
``deconvolver.deconv(obj)`` (``BlindDeconvJob.java:103-108``; TiPi's
``DeconvolutionJob``). VERDICT r3 asked for the one untested multi-x lever
on the user metric — seconds to a target reconstruction quality — to be
probed with solvers whose per-iteration structure exploits the circulant
geometry instead of quasi-Newton line searches:

- :func:`admm_deconvolve` — ADMM with variable splitting on the spatial
  gradient and the positivity bound. The x-update is a CLOSED-FORM
  circulant solve, ONE rfftn/irfftn pair per iteration:

      x = F^-1[ (conj(H^)d^*rho0 + rhs^) / (rho0|H^|^2 + rho1 sum|D^|^2 + rho2) ]

  the z-update is a pointwise Newton prox of the hyperbolic potential, and
  the u-updates are axpys. Boundary handling: the SPLITTING uses circular
  differences (so D diagonalizes with H in the same Fourier basis and the
  x-update stays closed-form), but the PENALTY applies the solver's
  replicate-boundary convention exactly — trailing-face components are
  masked out of the per-voxel gradient magnitude inside the prox (they are
  unpenalized, so their prox is the identity). The optimized objective is
  therefore EXACTLY ``jobs.deconv.make_objective``'s, and f_history is
  directly comparable across engines.

- :func:`fista_deconvolve` — monotone FISTA with adaptive restart on the
  EXACT solver objective: smooth part = (weighted) data term + mu*TV_eps
  (TV_eps is differentiable), prox part = the positivity projection; step
  1/L with the exact circulant Lipschitz bound
  L = max(w)*max|H^|^2 + mu*(sum_a 4/scale_a^2)/eps.

Both run under jit with zero host round-trips. By default the ADMM
engines run exactly ``config.max_iter`` iterations as one ``lax.scan``
(the fixed-budget bench/parity protocol); setting
``config.admm_abstol``/``admm_reltol`` switches them to primal/dual
residual-controlled stopping (Boyd et al. 2011 §3.3) in a bounded
``lax.while_loop`` — the ADMM analogue of the reference's run-to-
tolerance solver surface (``gatol``/``grtol``,
``PSF_Estimation.java:285-294``). Supported objectives: ADMM = Gaussian
(uniform or per-voxel weights) or Poisson data term + mu*TV +
positivity; FISTA = (weighted) Gaussian + mu*TV + positivity.
sparsity/hessian priors and padded-variable mode raise (VMLMB covers
those).

:func:`admm_deconvolve_timeseries` extends the ADMM engine to the joint
4D time-series objective (``jobs.timeseries``): the temporal TV becomes a
third split whose difference operator is circulant along t, so the
x-update stays ONE (4D) FFT pair. The distributed analogue of the 3D
engine lives in ``parallel.admm``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from microtipi_tpu.jobs.deconv import DeconvolutionConfig, DeconvolutionResult, make_objective
from microtipi_tpu.utils.arrays import pad_fft_kernel

__all__ = ["admm_deconvolve", "admm_deconvolve_multichannel",
           "admm_deconvolve_timeseries",
           "admm_deconvolve_timeseries_multichannel", "fista_deconvolve"]


def _check_config(config: DeconvolutionConfig, engine: str, weights=None,
                  allow_exact: bool = True):
    # allow_exact is retained for signature stability; every engine
    # surface now honors config.exact_fft (round 5 roll-out).
    if engine == "fista" and config.data_term != "gaussian":
        raise ValueError("fista engine supports the Gaussian data term only")
    if config.sparsity > 0 or config.hessian > 0:
        raise ValueError(
            f"{engine} engine supports the mu*TV prior only (sparsity/"
            "hessian priors: use the VMLMB engine)")
    if config.var_shape is not None:
        raise ValueError(
            f"{engine} engine does not support padded-variable mode "
            "(config.var_shape); use the VMLMB engine")


def _grad_sq_spectrum(shape, scales, dtype):
    """sum_a |D^_a|^2 / scale_a^2 on the rfftn grid: |e^{-2pi i k} - 1|^2 =
    4 sin^2(pi k / N) for the circular forward difference."""
    nz, ny, nx = shape
    sz = (1.0, 1.0, 1.0) if scales is None else tuple(float(s) for s in scales)
    kz = jnp.fft.fftfreq(nz).astype(dtype)
    ky = jnp.fft.fftfreq(ny).astype(dtype)
    kx = jnp.fft.rfftfreq(nx).astype(dtype)
    s2 = (
        (4.0 / sz[0] ** 2) * jnp.sin(jnp.pi * kz)[:, None, None] ** 2
        + (4.0 / sz[1] ** 2) * jnp.sin(jnp.pi * ky)[None, :, None] ** 2
        + (4.0 / sz[2] ** 2) * jnp.sin(jnp.pi * kx)[None, None, :] ** 2
    )
    return s2


def _circ_diffs(x, scales):
    """Circular forward differences along each axis (scaled)."""
    sz = (1.0, 1.0, 1.0) if scales is None else tuple(float(s) for s in scales)
    return [
        (jnp.roll(x, -1, axis=a) - x) / sz[a] for a in range(3)
    ]


def _circ_diffs_adjoint(gs, scales):
    """Adjoint of :func:`_circ_diffs`: D^T g = sum_a (roll(g_a,+1) - g_a)/s_a."""
    sz = (1.0, 1.0, 1.0) if scales is None else tuple(float(s) for s in scales)
    out = 0.0
    for a, g in enumerate(gs):
        out = out + (jnp.roll(g, 1, axis=a) - g) / sz[a]
    return out


def _stack_norm(terms):
    """L2 norm of a stacked list of arrays."""
    return jnp.sqrt(sum(jnp.sum(t * t) for t in terms))


def _boyd_criterion(r_terms, z_terms, dual_fn, p_el, n_el, abstol, reltol):
    """Boyd et al. 2011 §3.3 stopping pair for the stacked-splits form
    ``A x - z = 0`` (A = the stacked split operators, y = rho*u the
    unscaled duals):

        ||r||   <= sqrt(p)*abstol + reltol*||z||       (primal)
        ||s||   <= sqrt(n)*abstol + reltol*||A^T y||   (dual)

    with r the stacked primal residuals, s = sum_i rho_i A_i^T (z_i^+ -
    z_i) the dual residual in x-space, p/n the stacked-constraint and
    variable element counts. The relative primal scale uses ``||z||``
    alone instead of Boyd's ``max(||Ax||, ||z||)`` — strictly
    conservative (eps_pri can only shrink; at convergence Ax = z so the
    stop point is unchanged) and it halves the check's array passes.
    Under over-relaxation the formulas are the standard alpha=1
    expressions evaluated at the true (unrelaxed) Ax.

    ``dual_fn() -> (s_vec, aty_vec)`` is evaluated UNDER ``lax.cond`` only
    when the primal test passes: far from convergence (the common case for
    a check) only the cheap elementwise primal norms are paid — the dual
    residual's H^T applications (FFTs on data-split paths) and extra array
    passes are skipped. Measured overhead at 256^3 (BASELINE.md r5):
    13.9% eager pair at check_every=5 -> ~3% with this ordering at the
    default check_every=10."""
    fd = r_terms[0].dtype
    rpri = _stack_norm(r_terms)
    eps_pri = (jnp.sqrt(jnp.asarray(p_el, fd)) * abstol
               + reltol * _stack_norm(z_terms))
    prim_ok = rpri <= eps_pri

    def _dual(_):
        s_vec, aty_vec = dual_fn()
        sdual = _stack_norm([s_vec])
        eps_dua = (jnp.sqrt(jnp.asarray(n_el, s_vec.dtype)) * abstol
                   + reltol * _stack_norm([aty_vec]))
        return sdual <= eps_dua

    return lax.cond(prim_ok, _dual, lambda _: jnp.asarray(False), None)


def _admm_tolerances(config: DeconvolutionConfig):
    """(abstol, reltol, check_every, use_tol) from the config fields."""
    abstol = float(config.admm_abstol)
    reltol = float(config.admm_reltol)
    if abstol < 0 or reltol < 0:
        raise ValueError("admm_abstol/admm_reltol must be >= 0")
    check_every = max(int(config.admm_check_every), 1)
    return abstol, reltol, check_every, (abstol > 0.0 or reltol > 0.0)


def _hyperbolic_prox(vmag, lam, eps, newton_iters=8):
    """prox of lam*(sqrt(t^2+eps^2)-eps) on the gradient MAGNITUDE:
    argmin_s>=0  lam*sqrt(s^2+eps^2) + 0.5*(s-v)^2, v >= 0.

    Solves g(s) = s + lam*s/sqrt(s^2+eps^2) - v = 0 by Newton (g' >= 1,
    globally convergent from s0 = max(v - lam, 0) <= s*)."""
    s = jnp.maximum(vmag - lam, 0.0)
    for _ in range(newton_iters):
        r = jnp.sqrt(s * s + eps * eps)
        g = s + lam * s / r - vmag
        gp = 1.0 + lam * eps * eps / (r * r * r)
        s = jnp.maximum(s - g / gp, 0.0)
    return s


def admm_deconvolve(
    data: jax.Array,
    psf: jax.Array,
    weights: jax.Array | None = None,
    x0: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
    *,
    rho0: float | None = None,
    rho1: float | None = None,
    rho2: float | None = None,
    adaptive_rho: bool = False,
    over_relax: float | None = None,
    track_objective: bool = True,
) -> DeconvolutionResult:
    """ADMM object step (Gaussian/weighted/Poisson + mu*TV + positivity).

    Uniform-Gaussian (2 splits): min_x 0.5||Hx-d||^2 + mu*phi(M z1)
    + i_{>=0}(z2)  s.t. z1 = Dx, z2 = x, with D the circular difference
    stack and M the replicate-boundary mask (zeros on each axis' trailing
    face): phi(M Dx) equals the solver's replicate-boundary TV exactly,
    while D^T D stays circulant. x-update:
    (H^T H + rho1 D^T D + rho2 I) x = H^T d + rho1 D^T(z1-u1) + rho2
    (z2-u2) — circulant, ONE rfftn/irfftn pair. z1: pointwise hyperbolic
    prox (Newton) on the masked magnitude; z2: clamp at 0; u: dual ascent.

    Per-voxel weights or the Poisson term add a DATA split z0 = Hx whose
    prox is pointwise (weighted Gaussian: the convex combination
    (w d + rho0 v)/(w + rho0); Poisson ``(m-d) - d log(m/d)``, m = z0+b:
    the positive root of ``rho0 z^2 + z (1 + rho0 (b - v)) +
    (b - d - rho0 v b) = 0``), the x-update becomes
    (rho0 H^T H + rho1 D^T D + rho2 I) x = rho0 H^T(z0-u0) + ... — still
    circulant; 4 FFTs per iteration instead of 2.

    ``over_relax``: Boyd 2011 §3.4.3 over-relaxation — each split's
    ``Ax`` is replaced by ``alpha Ax + (1-alpha) z_old`` in the prox
    argument and the dual update. Measured at 256^3 (BASELINE.md):
    alpha = 1.8 reaches matched objective/reconstruction error in ~half
    the iterations of alpha = 1.0 at identical per-iteration cost — the
    default for standalone solves (None resolves to 1.8, or 1.0 when
    ``adaptive_rho`` is live; the BLIND loop pins 1.0 — see
    ``BlindDeconvConfig.deconv_engine``).

    ``rho1``/``rho2`` default to mu/epsilon (the TV curvature scale at the
    origin) — measured-robust across the bench problems; exposed for
    tuning. ``adaptive_rho`` turns on per-split residual balancing (Boyd
    et al. 2011 §3.4.1: double/halve a rho when its primal residual
    outweighs its dual residual 10x or vice versa, rescaling the scaled
    dual accordingly) — the circulant denominator is rebuilt elementwise
    each iteration (negligible next to the FFT pair), making the engine
    robust to badly scaled problems at the cost of determinism in rho.
    Runs ``config.max_iter`` iterations as one ``lax.scan`` — or, when
    ``config.admm_abstol``/``admm_reltol`` is set, up to ``max_iter``
    iterations with Boyd §3.3 primal/dual residual stopping checked every
    ``admm_check_every`` iterations (``result.status``: 0 = converged,
    1 = budget exhausted; ``iterations`` reports the actual count and
    ``f_history`` is NaN past it). ``track_objective`` appends the true
    (replicate-boundary) solver objective per iterate to ``f_history``
    (costs ~2 extra FFTs/iter); when off only the final f is computed.
    """
    _check_config(config, "admm", weights, allow_exact=True)
    from microtipi_tpu.jobs.deconv import resolve_exact_fft
    from microtipi_tpu.ops.convolution import fft_pair

    _rfftn, _irfftn = fft_pair(resolve_exact_fft(config))
    if over_relax is None:
        # Over-relaxation theory assumes a FIXED rho per iteration; with
        # residual balancing live the combination measured slightly worse
        # (tests), so the default backs off to 1.0 there. An explicit
        # over_relax is always honored.
        over_relax = 1.0 if adaptive_rho else 1.8
    if weights is not None:
        # Zero weight EXCLUDES the voxel whatever its value: the prox
        # computes ``weights * data`` and 0*NaN = NaN would poison the
        # split (same invariant as WeightedConvolutionCost.build).
        data = jnp.where(weights > 0, data, 0.0)
    shape = data.shape
    dtype = data.dtype
    mu, eps = float(config.mu), float(config.epsilon)
    bg = float(config.background)
    scales = config.scales
    poisson = config.data_term == "poisson"
    data_split = poisson or weights is not None
    r1 = float(rho1) if rho1 is not None else max(mu / max(eps, 1e-30), 1e-6)
    r2 = float(rho2) if rho2 is not None else r1
    if rho0 is not None:
        r0 = float(rho0)
    elif poisson:
        # Poisson curvature at the data scale: d/m^2 ~ 1/mean(m)
        r0 = 1.0 / jnp.maximum(jnp.mean(data) + bg, 1e-12)
    elif weights is not None:
        r0 = jnp.mean(weights)
    else:
        r0 = 1.0

    kernel = pad_fft_kernel(psf, shape)
    h_hat = _rfftn(kernel)
    h2 = jnp.real(h_hat * jnp.conj(h_hat))
    d_hat = _rfftn(data)
    htd_hat = jnp.conj(h_hat) * d_hat
    s2 = _grad_sq_spectrum(shape, scales, jnp.real(d_hat).dtype)

    # accurate=True: value-only tracking in residual form — same FFT count,
    # no eps*sum|x*Ax| error (measured 25%+ of f on bright 256^3 f32
    # scenes; BASELINE.md round 5).
    fg = make_objective(psf, data, weights, config, accurate=True)

    def objective(x):
        return fg(x)[0]

    if x0 is None:
        x0 = jnp.maximum(data, 0.0) if config.positivity else data
    x = x0.astype(dtype)
    f0 = objective(x)
    # Replicate-boundary masks: 0 on each axis' trailing face, 1 elsewhere
    # (ops.regularization._forward_diffs zero-pads exactly there).
    masks = []
    for a in range(3):
        m = jnp.ones(shape, dtype)
        masks.append(m.at[tuple(
            slice(-1, None) if i == a else slice(None) for i in range(3))].set(0.0))
    z1 = _circ_diffs(x, scales)
    u1 = [jnp.zeros_like(g) for g in z1]
    z2 = x
    u2 = jnp.zeros_like(x)

    def _nrm(terms):
        return jnp.sqrt(sum(jnp.sum(t * t) for t in terms))

    def _conv(x_hat):
        return _irfftn(h_hat * x_hat, s=shape).astype(dtype)

    def _data_prox(v, rr0):
        """argmin_z g(z) + rr0/2 (z - v)^2 pointwise for the data term."""
        if poisson:
            # rho z^2 + z (1 + rho (b - v)) + (b - d - rho v b) = 0, + root
            b_ = jnp.asarray(bg, dtype)
            B = 1.0 + rr0 * (b_ - v)
            C = b_ - data - rr0 * v * b_
            disc = jnp.maximum(B * B - 4.0 * rr0 * C, 0.0)
            return (-B + jnp.sqrt(disc)) / (2.0 * rr0)
        return (weights * data + rr0 * v) / (weights + rr0)

    def step_core(carry):
        x, z0, u0, z1, u1, z2, u2, rr1, rr2 = carry
        hx = None
        rhs = rr1 * _circ_diffs_adjoint(
            [z - u for z, u in zip(z1, u1)], scales) + rr2 * (z2 - u2)
        if data_split:
            den = r0 * h2 + rr1 * s2 + rr2
            x_hat = (r0 * jnp.conj(h_hat) * _rfftn(z0 - u0)
                     + _rfftn(rhs)) / den
        else:
            den = h2 + rr1 * s2 + rr2
            x_hat = (htd_hat + _rfftn(rhs)) / den
        x = _irfftn(x_hat, s=shape).astype(dtype)
        # Over-relaxation (Boyd 2011 §3.4.3): replace each split's Ax by
        # alpha*Ax + (1-alpha)*z_old in the prox argument and the dual
        # update; alpha ~ 1.6-1.8 typically ~1.5x fewer iterations at
        # zero extra cost (measured table in BASELINE.md).
        al = float(over_relax)
        if data_split:
            hx = _conv(x_hat)
            hxr = hx if al == 1.0 else al * hx + (1.0 - al) * z0
            z0 = _data_prox(hxr + u0, r0)
            u0 = u0 + hxr - z0
        # z1-update: pointwise hyperbolic prox on the MASKED gradient
        # magnitude (replicate-boundary parity); unmasked (trailing-
        # face) components are unpenalized -> identity prox.
        dx = _circ_diffs(x, scales)
        dxr = dx if al == 1.0 else [al * d + (1.0 - al) * z
                                    for d, z in zip(dx, z1)]
        v = [d + u for d, u in zip(dxr, u1)]
        vmag = jnp.sqrt(
            sum(m * t * t for m, t in zip(masks, v)) + jnp.finfo(dtype).tiny)
        s = _hyperbolic_prox(vmag, mu / rr1, eps)
        scale = s / vmag
        z1_old, z2_old = z1, z2
        z1 = [jnp.where(m > 0, scale * t, t) for m, t in zip(masks, v)]
        xr = x if al == 1.0 else al * x + (1.0 - al) * z2
        # z2-update: positivity projection
        z2 = jnp.maximum(xr + u2, 0.0) if config.positivity else xr + u2
        # dual updates
        u1 = [u + d - z for u, d, z in zip(u1, dxr, z1)]
        u2 = u2 + xr - z2
        if adaptive_rho:
            # Per-split residual balancing (Boyd 2011 §3.4.1),
            # scaled-dual form: growing rho shrinks u by the same
            # factor. rho0 stays fixed (its dual residual would cost
            # an extra FFT pair to evaluate).
            rp1 = _nrm([d - z for d, z in zip(dx, z1)])
            sd1 = rr1 * _nrm([_circ_diffs_adjoint(
                [a - b for a, b in zip(z1, z1_old)], scales)])
            fac1 = jnp.where(rp1 > 10.0 * sd1, 2.0,
                             jnp.where(sd1 > 10.0 * rp1, 0.5, 1.0))
            rr1 = rr1 * fac1
            u1 = [u / fac1 for u in u1]
            rp2 = _nrm([x - z2])
            sd2 = rr2 * _nrm([z2 - z2_old])
            fac2 = jnp.where(rp2 > 10.0 * sd2, 2.0,
                             jnp.where(sd2 > 10.0 * rp2, 0.5, 1.0))
            rr2 = rr2 * fac2
            u2 = u2 / fac2
        f = objective(z2) if track_objective else jnp.asarray(jnp.nan, dtype)
        return (x, z0, u0, z1, u1, z2, u2, rr1, rr2), f, dx, hx

    def step(carry, _):
        new_carry, f, _, _ = step_core(carry)
        return new_carry, f

    if data_split:
        z0 = _conv(_rfftn(x))
        u0 = jnp.zeros_like(x)
    else:  # zero-size placeholders keep the carry structure uniform
        z0 = jnp.zeros((0,), dtype)
        u0 = jnp.zeros((0,), dtype)
    rr1 = jnp.asarray(r1, dtype)
    rr2 = jnp.asarray(r2, dtype)
    init = (x, z0, u0, z1, u1, z2, u2, rr1, rr2)
    n = int(config.max_iter)
    abstol, reltol, check_every, use_tol = _admm_tolerances(config)
    if not use_tol:
        (x, z0, u0, z1, u1, z2, u2, rr1, rr2), fs = lax.scan(
            step, init, None, length=n)
        out = z2 if config.positivity else x  # z2 is feasible (>= 0) by construction
        f_final = objective(out)
        if track_objective:
            hist = jnp.concatenate([f0[None], fs])  # hist[i] = f after iter i
        else:
            hist = jnp.full((n + 1,), jnp.nan, dtype).at[0].set(f0)
        return DeconvolutionResult(
            out, f_final, jnp.asarray(n), jnp.asarray(n),
            jnp.asarray(0), hist, jnp.full_like(hist, jnp.nan),
        )

    # --- Boyd §3.3 residual-controlled path (admm_abstol/admm_reltol) ----
    # Same step_core — a bounded lax.while_loop that additionally checks
    # the primal/dual residual pair every check_every iterations. The
    # splits are z0 = Hx (data paths), z1 = Dx, z2 = x, so the residual
    # norms are elementwise except the two H^T applications on data-split
    # paths (2 extra FFT pairs per CHECK, amortized by check_every).
    n_el = 1.0
    for d_ in shape:
        n_el *= float(d_)
    p_el = n_el * (4.0 + (1.0 if data_split else 0.0))

    def _convT(v):
        return _irfftn(jnp.conj(h_hat) * _rfftn(v), s=shape).astype(dtype)

    hist0 = jnp.full((n + 1,), jnp.nan, jnp.asarray(f0).dtype).at[0].set(f0)

    def w_cond(st):
        _, i, _, conv = st
        return (~conv) & (i < n)

    def w_body(st):
        carry, i, hist, _ = st
        z0_o, z1_o, z2_o = carry[1], carry[3], carry[5]
        new_carry, f, dx, hx = step_core(carry)
        xn, z0n, u0n, z1n, u1n, z2n, u2n, rr1n, rr2n = new_carry
        i1 = i + 1
        hist = hist.at[i1].set(f)
        check = jnp.mod(i1, check_every) == 0

        def _chk(_):
            r_terms = [d - z for d, z in zip(dx, z1n)] + [xn - z2n]
            z_terms = list(z1n) + [z2n]
            if data_split:
                r_terms = r_terms + [hx - z0n]
                z_terms = z_terms + [z0n]

            def dual_fn():
                s_vec = (rr1n * _circ_diffs_adjoint(
                    [a - b for a, b in zip(z1n, z1_o)], scales)
                    + rr2n * (z2n - z2_o))
                aty = rr1n * _circ_diffs_adjoint(u1n, scales) + rr2n * u2n
                if data_split:
                    s_vec = s_vec + r0 * _convT(z0n - z0_o)
                    aty = aty + r0 * _convT(u0n)
                return s_vec, aty

            return _boyd_criterion(r_terms, z_terms, dual_fn,
                                   p_el, n_el, abstol, reltol)

        conv = lax.cond(check, _chk, lambda _: jnp.asarray(False), None)
        return new_carry, i1, hist, conv

    st0 = (init, jnp.asarray(0, jnp.int32), hist0, jnp.asarray(False))
    (x, z0, u0, z1, u1, z2, u2, rr1, rr2), k, hist, conv = lax.while_loop(
        w_cond, w_body, st0)
    out = z2 if config.positivity else x
    f_final = objective(out)
    status = jnp.where(conv, 0, 1).astype(jnp.int32)
    return DeconvolutionResult(
        out, f_final, k, k, status, hist, jnp.full_like(hist, jnp.nan),
    )


def fista_deconvolve(
    data: jax.Array,
    psf: jax.Array,
    weights: jax.Array | None = None,
    x0: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
    *,
    track_objective: bool = True,
) -> DeconvolutionResult:
    """Monotone FISTA with adaptive restart on the EXACT solver objective.

    Smooth part f = (weighted) Gaussian data term + mu*TV_eps (both
    differentiable); nonsmooth part g = positivity indicator, prox =
    clamp. Step size 1/L with the exact circulant Lipschitz bound
    ``L = max(w) * max|H^|^2 + mu * (sum_a 4/scale_a^2) / eps``
    (``|H^|`` exact via the kernel spectrum; the TV bound is the operator
    norm of the replicate-boundary difference stack over the hyperbolic
    curvature 1/eps). Monotonicity: if the candidate increases f, restart
    the momentum from the previous iterate (adaptive restart, O'Donoghue &
    Candes 2015).
    """
    _check_config(config, "fista", None, allow_exact=True)
    from microtipi_tpu.ops.convolution import fft_pair as _fp

    shape = data.shape
    dtype = data.dtype
    mu, eps = float(config.mu), float(config.epsilon)
    scales = config.scales

    kernel = pad_fft_kernel(psf, shape)
    from microtipi_tpu.jobs.deconv import resolve_exact_fft as _ref

    h_hat = _fp(_ref(config))[0](kernel)
    h2max = jnp.max(jnp.real(h_hat * jnp.conj(h_hat)))
    wmax = 1.0 if weights is None else jnp.max(weights)
    sz = (1.0, 1.0, 1.0) if scales is None else tuple(float(s) for s in scales)
    l_tv = mu * sum(4.0 / s**2 for s in sz) / max(eps, 1e-30)
    lip = wmax * h2max + l_tv

    # accurate: FISTA's monotone-restart test compares f VALUES — the
    # residual form costs one more FFT per evaluation but its f32 value
    # error is eps*f, not eps*sum|x*Ax| (the engine is a reference
    # implementation; correctness over speed).
    fg = make_objective(psf, data, weights, config, accurate=True)

    if x0 is None:
        x0 = jnp.maximum(data, 0.0) if config.positivity else data
    x = x0.astype(dtype)

    def prox(v):
        return jnp.maximum(v, 0.0) if config.positivity else v

    f_x, _ = fg(x)

    def step(carry, _):
        x, y, t, f_prev = carry
        f_y, g_y = fg(y)
        x_new = prox(y - g_y / lip)
        f_new, _ = fg(x_new)
        # monotone safeguard: reject an increasing step, restart momentum
        accept = f_new <= f_prev
        x_next = jnp.where(accept, x_new, x)
        f_next = jnp.where(accept, f_new, f_prev)
        t_new = jnp.where(accept, 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)),
                          jnp.asarray(1.0, t.dtype))
        beta = jnp.where(accept, (t - 1.0) / t_new, 0.0)
        y_next = x_next + beta * (x_next - x)
        f_out = f_next if track_objective else jnp.asarray(jnp.nan, f_next.dtype)
        return (x_next, y_next, t_new, f_next), f_out

    t0 = jnp.asarray(1.0, dtype)
    (x, y, t, f_fin), fs = lax.scan(
        step, (x, x, t0, f_x), None, length=int(config.max_iter))
    n = int(config.max_iter)
    hist = jnp.concatenate([jnp.asarray(f_x, fs.dtype)[None], fs]) if track_objective \
        else jnp.full((n + 1,), jnp.nan, dtype).at[0].set(f_fin)
    return DeconvolutionResult(
        x, f_fin, jnp.asarray(n), jnp.asarray(2 * n),
        jnp.asarray(0), hist, jnp.full_like(hist, jnp.nan),
    )


def admm_deconvolve_timeseries(
    data: jax.Array,
    psf: jax.Array,
    weights: jax.Array | None = None,
    x0: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
    *,
    mu_t: float = 0.0,
    epsilon_t: float | None = None,
    bleach: jax.Array | None = None,
    rho0: float | None = None,
    rho1: float | None = None,
    rho1t: float | None = None,
    rho2: float | None = None,
    over_relax: float = 1.8,
    track_objective: bool = True,
) -> DeconvolutionResult:
    """ADMM engine for the joint 4D time-series solve.

    Same objective as :func:`jobs.timeseries.deconvolve_timeseries`
    (``make_timeseries_objective`` is the shared definition): per-frame
    (weighted/Poisson) data term + mu*TV_eps per frame + mu_t*TV_eps_t
    along t + positivity. The whole 4D operator stays circulant — the
    spatial differences and the per-frame ``|H|^2`` are constant across
    frames, the temporal difference is circulant along t — so the x-update
    is ONE 4D rfftn/irfftn pair with denominator
    ``rho0 |H|^2 + rho1 sum|D_s|^2 + rho1t |D_t|^2 + rho2`` (every term
    broadcast over the axes it is constant in). Replicate-boundary parity
    uses the same masked-prox construction as the 3D engine: trailing
    faces of each frame (spatial) and the trailing FRAME (temporal) are
    unpenalized identity-prox components.

    ``bleach`` (per-frame gains in the MODEL, ``g_t H x_t``): handled in
    the DATA prox — the split variable stays ``z0 = H x`` (unscaled, so
    the x-update keeps its t-constant circulant denominator) and the
    pointwise prox absorbs ``g_t`` (Gaussian:
    ``z = (w g d + rho0 v) / (w g^2 + rho0)``). Poisson+bleach is not
    wired (use the VMLMB engine). ``rho1t`` defaults to
    ``mu_t/epsilon_t`` — the temporal analogue of the rho1 rule.
    """
    _check_config(config, "admm", weights, allow_exact=True)
    from microtipi_tpu.jobs.deconv import resolve_exact_fft as _ref
    from microtipi_tpu.ops.convolution import fft_pair as _fp
    _rfftn, _irfftn = _fp(_ref(config))
    data = jnp.asarray(data)
    if data.ndim != 4:
        raise ValueError(f"expected a (T, Nz, Ny, Nx) stack, got {data.shape}")
    poisson = config.data_term == "poisson"
    if poisson and bleach is not None:
        raise ValueError("admm timeseries: poisson+bleach is not wired; "
                         "use deconvolve_timeseries (VMLMB)")
    shape = data.shape
    vol = shape[1:]
    dtype = data.dtype
    mu, eps = float(config.mu), float(config.epsilon)
    eps_t = float(config.epsilon if epsilon_t is None else epsilon_t)
    mu_t = float(mu_t)
    bg = float(config.background)
    scales = config.scales
    if weights is not None:
        weights = jnp.asarray(weights)
        if weights.shape == vol:
            weights = weights[None]
        # Zero weight EXCLUDES the voxel (0*NaN in the prox would poison).
        data = jnp.where(weights > 0, data, 0.0)
    g4 = None
    if bleach is not None:
        bleach = jnp.asarray(bleach, dtype)
        if bleach.shape != (shape[0],):
            raise ValueError(
                f"bleach must be per-frame gains of shape ({shape[0]},), "
                f"got {bleach.shape}")
        g4 = bleach.reshape(-1, 1, 1, 1)
    data_split = poisson or weights is not None or g4 is not None
    r1 = float(rho1) if rho1 is not None else max(mu / max(eps, 1e-30), 1e-6)
    r1t = (float(rho1t) if rho1t is not None
           else max(mu_t / max(eps_t, 1e-30), 1e-6))
    r2 = float(rho2) if rho2 is not None else r1
    if rho0 is not None:
        r0 = float(rho0)
    elif poisson:
        r0 = 1.0 / jnp.maximum(jnp.mean(data) + bg, 1e-12)
    elif weights is not None:
        r0 = jnp.mean(weights)
    else:
        r0 = 1.0

    kernel = pad_fft_kernel(psf, vol)
    k_hat = _rfftn(kernel)          # 3D, broadcast [None] over t
    h2 = (jnp.real(k_hat) ** 2 + jnp.imag(k_hat) ** 2)[None]
    fdtype = jnp.real(k_hat).dtype
    s2 = _grad_sq_spectrum(vol, scales, fdtype)[None]
    ft = jnp.fft.fftfreq(shape[0]).astype(fdtype)
    st2 = (4.0 * jnp.sin(jnp.pi * ft) ** 2)[:, None, None, None]
    temporal = mu_t > 0

    from microtipi_tpu.jobs.timeseries import make_timeseries_objective

    fg = make_timeseries_objective(psf, data, weights, config, mu_t=mu_t,
                                   epsilon_t=epsilon_t, bleach=bleach,
                                   accurate=True)

    def objective(x):
        return fg(x)[0]

    def _sdiffs(x):
        sz = (1.0, 1.0, 1.0) if scales is None else tuple(float(s) for s in scales)
        return [(jnp.roll(x, -1, axis=a + 1) - x) / sz[a] for a in range(3)]

    def _sdiffs_adj(gs):
        sz = (1.0, 1.0, 1.0) if scales is None else tuple(float(s) for s in scales)
        out = 0.0
        for a, g in enumerate(gs):
            out = out + (jnp.roll(g, 1, axis=a + 1) - g) / sz[a]
        return out

    def _tdiff(x):
        return jnp.roll(x, -1, axis=0) - x

    def _tdiff_adj(g):
        return jnp.roll(g, 1, axis=0) - g

    if x0 is None:
        x0 = jnp.maximum(data, 0.0) if config.positivity else data
    x = x0.astype(dtype)
    f0 = objective(x)

    smasks = []
    for a in range(3):
        m = jnp.ones(vol, dtype)
        smasks.append(m.at[tuple(
            slice(-1, None) if i == a else slice(None)
            for i in range(3))].set(0.0)[None])
    tmask = jnp.ones((shape[0], 1, 1, 1), dtype).at[-1].set(0.0)

    den = (r0 if data_split else 1.0) * h2 + r1 * s2 + r2
    if temporal:
        den = den + r1t * st2

    def _data_prox(v, rr0):
        g = 1.0 if g4 is None else g4
        if poisson:
            b_ = jnp.asarray(bg, dtype)
            B = 1.0 + rr0 * (b_ - v)
            C = b_ - data - rr0 * v * b_
            disc = jnp.maximum(B * B - 4.0 * rr0 * C, 0.0)
            return (-B + jnp.sqrt(disc)) / (2.0 * rr0)
        w = jnp.asarray(1.0, dtype) if weights is None else weights
        return (w * g * data + rr0 * v) / (w * g * g + rr0)

    if not data_split:
        htd = _irfftn(jnp.conj(k_hat)[None]
                             * _rfftn(data, axes=(1, 2, 3)),
                             s=vol, axes=(1, 2, 3)).astype(dtype)

    def step_core(carry):
        x, z0, u0, z1, u1, zt, ut, z2, u2 = carry
        hx = None
        dt = None
        rhs = r1 * _sdiffs_adj([z - u for z, u in zip(z1, u1)]) + r2 * (z2 - u2)
        if temporal:
            rhs = rhs + r1t * _tdiff_adj(zt - ut)
        if data_split:
            x_hat = (r0 * jnp.conj(k_hat)[None] * _rfftn(z0 - u0)
                     + _rfftn(rhs)) / den
        else:
            x_hat = _rfftn(htd + rhs) / den
        x = _irfftn(x_hat, s=shape).astype(dtype)
        al = float(over_relax)  # Boyd 2011 §3.4.3; measured table BASELINE.md
        if data_split:
            hx = _irfftn(k_hat[None] * x_hat, s=shape).astype(dtype)
            hxr = hx if al == 1.0 else al * hx + (1.0 - al) * z0
            z0 = _data_prox(hxr + u0, r0)
            u0 = u0 + hxr - z0
        dx = _sdiffs(x)
        dxr = dx if al == 1.0 else [al * d + (1.0 - al) * z
                                    for d, z in zip(dx, z1)]
        v = [d + u for d, u in zip(dxr, u1)]
        vmag = jnp.sqrt(
            sum(m * t * t for m, t in zip(smasks, v)) + jnp.finfo(dtype).tiny)
        s = _hyperbolic_prox(vmag, mu / r1, eps)
        scale = s / vmag
        z1 = [jnp.where(m > 0, scale * t, t) for m, t in zip(smasks, v)]
        u1 = [u + d - z for u, d, z in zip(u1, dxr, z1)]
        if temporal:
            dt = _tdiff(x)
            dtr = dt if al == 1.0 else al * dt + (1.0 - al) * zt
            vt = dtr + ut
            vmag_t = jnp.sqrt(tmask * vt * vt + jnp.finfo(dtype).tiny)
            st = _hyperbolic_prox(vmag_t, mu_t / r1t, eps_t)
            zt = jnp.where(tmask > 0, st * jnp.sign(vt), vt)
            ut = ut + dtr - zt
        xr = x if al == 1.0 else al * x + (1.0 - al) * z2
        z2 = jnp.maximum(xr + u2, 0.0) if config.positivity else xr + u2
        u2 = u2 + xr - z2
        f = objective(z2) if track_objective else jnp.asarray(jnp.nan, dtype)
        return (x, z0, u0, z1, u1, zt, ut, z2, u2), f, dx, hx, dt

    def step(carry, _):
        new_carry, f, _, _, _ = step_core(carry)
        return new_carry, f

    if data_split:
        z0 = _irfftn(k_hat[None] * _rfftn(x, axes=(1, 2, 3)),
                            s=vol, axes=(1, 2, 3)).astype(dtype)
        u0 = jnp.zeros_like(x)
    else:
        z0 = jnp.zeros((0,), dtype)
        u0 = jnp.zeros((0,), dtype)
    z1 = _sdiffs(x)
    u1 = [jnp.zeros_like(g) for g in z1]
    if temporal:
        zt = _tdiff(x)
        ut = jnp.zeros_like(zt)
    else:
        zt = jnp.zeros((0,), dtype)
        ut = jnp.zeros((0,), dtype)
    z2 = x
    u2 = jnp.zeros_like(x)
    init = (x, z0, u0, z1, u1, zt, ut, z2, u2)
    n = int(config.max_iter)
    abstol, reltol, check_every, use_tol = _admm_tolerances(config)
    if not use_tol:
        (x, z0, u0, z1, u1, zt, ut, z2, u2), fs = lax.scan(
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

    # Boyd §3.3 residual-controlled path — see admm_deconvolve. Splits:
    # z0 = Hx (data paths), z1 = D_s x, zt = D_t x (temporal), z2 = x.
    n_el = 1.0
    for d_ in shape:
        n_el *= float(d_)
    p_el = n_el * (4.0 + (1.0 if data_split else 0.0)
                   + (1.0 if temporal else 0.0))

    def _convT(v):
        return _irfftn(jnp.conj(k_hat)[None] * _rfftn(
            v, axes=(1, 2, 3)), s=vol, axes=(1, 2, 3)).astype(dtype)

    hist0 = jnp.full((n + 1,), jnp.nan, jnp.asarray(f0).dtype).at[0].set(f0)

    def w_cond(st):
        _, i, _, conv = st
        return (~conv) & (i < n)

    def w_body(st):
        carry, i, hist, _ = st
        z0_o, z1_o, zt_o, z2_o = carry[1], carry[3], carry[5], carry[7]
        new_carry, f, dx, hx, dt = step_core(carry)
        xn, z0n, u0n, z1n, u1n, ztn, utn, z2n, u2n = new_carry
        i1 = i + 1
        hist = hist.at[i1].set(f)
        check = jnp.mod(i1, check_every) == 0

        def _chk(_):
            r_terms = [d - z for d, z in zip(dx, z1n)] + [xn - z2n]
            z_terms = list(z1n) + [z2n]
            if temporal:
                r_terms = r_terms + [dt - ztn]
                z_terms = z_terms + [ztn]
            if data_split:
                r_terms = r_terms + [hx - z0n]
                z_terms = z_terms + [z0n]

            def dual_fn():
                s_vec = (r1 * _sdiffs_adj([a - b for a, b in zip(z1n, z1_o)])
                         + r2 * (z2n - z2_o))
                aty = r1 * _sdiffs_adj(u1n) + r2 * u2n
                if temporal:
                    s_vec = s_vec + r1t * _tdiff_adj(ztn - zt_o)
                    aty = aty + r1t * _tdiff_adj(utn)
                if data_split:
                    s_vec = s_vec + r0 * _convT(z0n - z0_o)
                    aty = aty + r0 * _convT(u0n)
                return s_vec, aty

            return _boyd_criterion(r_terms, z_terms, dual_fn,
                                   p_el, n_el, abstol, reltol)

        conv = lax.cond(check, _chk, lambda _: jnp.asarray(False), None)
        return new_carry, i1, hist, conv

    st0 = (init, jnp.asarray(0, jnp.int32), hist0, jnp.asarray(False))
    (x, z0, u0, z1, u1, zt, ut, z2, u2), k, hist, conv = lax.while_loop(
        w_cond, w_body, st0)
    out = z2 if config.positivity else x
    f_final = objective(out)
    status = jnp.where(conv, 0, 1).astype(jnp.int32)
    return DeconvolutionResult(
        out, f_final, k, k, status, hist, jnp.full_like(hist, jnp.nan),
    )


def admm_deconvolve_multichannel(
    data: jax.Array,
    psfs: jax.Array,
    weights: jax.Array | None = None,
    x0: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
    *,
    coupling: str = "joint",
    mixing: jax.Array | None = None,
    rho0: float | None = None,
    rho1: float | None = None,
    rho2: float | None = None,
    over_relax: float = 1.8,
    track_objective: bool = True,
) -> DeconvolutionResult:
    """ADMM engine for the joint multi-channel solve.

    Same objective as :func:`jobs.multichannel.deconvolve_multichannel`
    (per-channel chromatic spectra + the Bresson-Chan color TV or
    per-channel TV + positivity; equivalence pinned in tests). Structure:

    - x-update: per-channel circulant solves batched over C — the data
      term never couples channels without ``mixing``, so the denominator
      is ``(rho0)|H_c|^2 + rho1 sum|D_s|^2 + rho2`` per channel, ONE
      batched 3D FFT pair.
    - color-TV prox: the coupled norm takes ONE magnitude across channels
      AND axes per voxel — the shrinkage scale is shared by all (c, a)
      components there (``coupling="separate"``: per-channel magnitude).
    - ``mixing`` (K dyes behind a (C, K) bleed-through matrix, uniform
      weights): the data split ``z0_k = H_k x_k`` makes the mixing purely
      POINTWISE — its prox solves the constant K x K system
      ``(M^T M + rho0 I) z = M^T d + rho0 v`` with a precomputed inverse,
      so unmixing costs one tiny channel einsum per iteration and the
      x-update stays per-dye circulant. Weighted or Poisson data through
      ``mixing`` is not wired (the prox stops being a constant matrix /
      closed form — use the VMLMB engine).
    """
    _check_config(config, "admm", weights, allow_exact=True)
    from microtipi_tpu.jobs.deconv import resolve_exact_fft as _ref
    from microtipi_tpu.ops.convolution import fft_pair as _fp
    _rfftn, _irfftn = _fp(_ref(config))
    data = jnp.asarray(data)
    if data.ndim != 4:
        raise ValueError(f"expected a (C, Nz, Ny, Nx) stack, got {data.shape}")
    if coupling not in ("joint", "separate"):
        raise ValueError(f"unknown coupling {coupling!r}")
    poisson = config.data_term == "poisson"
    if poisson and weights is not None:
        # Same guard as make_tsmc_objective/make_objective: silently
        # dropping the weights (the Poisson prox has no weight slot) would
        # solve a different problem than the caller asked for.
        raise ValueError("data_term='poisson' does not compose with weights")
    nc = data.shape[0]
    vol = data.shape[1:]
    dtype = data.dtype
    mu, eps = float(config.mu), float(config.epsilon)
    bg = float(config.background)
    scales = config.scales
    m = None
    nk = nc
    if mixing is not None:
        m = jnp.asarray(mixing, dtype)
        if m.ndim != 2 or m.shape[0] != nc:
            raise ValueError(
                f"mixing must be a ({nc}, K) detection-spectra matrix, got "
                f"{getattr(m, 'shape', None)}")
        nk = m.shape[1]
        if poisson or weights is not None:
            raise ValueError(
                "admm multichannel: mixing composes with the uniform "
                "Gaussian data term only (weighted/poisson unmixing: use "
                "deconvolve_multichannel)")
    psfs = jnp.asarray(psfs)
    if psfs.ndim == 3:
        psfs = psfs[None]
    kernel = jax.vmap(lambda p: pad_fft_kernel(p, vol))(psfs)
    k_hat = _rfftn(kernel, axes=(1, 2, 3))
    if k_hat.shape[0] == 1 and nk > 1:
        k_hat = jnp.broadcast_to(k_hat, (nk,) + k_hat.shape[1:])
    if weights is not None:
        weights = jnp.asarray(weights)
        if weights.ndim == 3:
            weights = weights[None]
        # Zero weight EXCLUDES the voxel (0*NaN in the prox would poison).
        data = jnp.where(weights > 0, data, 0.0)
    data_split = poisson or weights is not None or m is not None
    r1 = float(rho1) if rho1 is not None else max(mu / max(eps, 1e-30), 1e-6)
    r2 = float(rho2) if rho2 is not None else r1
    if rho0 is not None:
        r0 = float(rho0)
    elif poisson:
        r0 = 1.0 / jnp.maximum(jnp.mean(data) + bg, 1e-12)
    elif weights is not None:
        r0 = jnp.mean(weights)
    else:
        r0 = 1.0

    h2 = jnp.real(k_hat) ** 2 + jnp.imag(k_hat) ** 2
    fdtype = jnp.real(k_hat).dtype
    s2 = _grad_sq_spectrum(vol, scales, fdtype)[None]
    den = (r0 if data_split else 1.0) * h2 + r1 * s2 + r2

    def _build_mc_objective():
        from microtipi_tpu.ops.convolution import generalized_kl
        from microtipi_tpu.ops.regularization import joint_hyperbolic_tv
        from microtipi_tpu.jobs.deconv import regularization_cost

        def model(x):
            hx = _irfftn(k_hat * _rfftn(x, axes=(1, 2, 3)),
                                s=vol, axes=(1, 2, 3))
            if m is not None:
                hx = jnp.einsum("ck,kzyx->czyx", m, hx)
            return hx

        if poisson:
            def dt(x):
                return generalized_kl(model(x) + bg, jnp.maximum(data, 0.0))
        elif weights is not None:
            def dt(x):
                r = model(x) - data
                return 0.5 * jnp.sum(weights * r * r)
        else:
            def dt(x):
                r = model(x) - data
                return 0.5 * jnp.sum(r * r)

        def obj(x):
            f = dt(x)
            if coupling == "joint" and mu > 0:
                f = f + mu * joint_hyperbolic_tv(
                    x, eps, scales, axes=(-3, -2, -1), couple_axis=0)
            elif coupling == "separate":
                f = f + regularization_cost(x, config, axes=(-3, -2, -1))
            return f

        return obj

    # Equals deconvolve_multichannel's objective on the engine's supported
    # subset (equivalence pinned in tests/test_admm.py).
    objective = _build_mc_objective()

    def _sdiffs(x):
        sz = (1.0, 1.0, 1.0) if scales is None else tuple(float(s) for s in scales)
        return [(jnp.roll(x, -1, axis=a + 1) - x) / sz[a] for a in range(3)]

    def _sdiffs_adj(gs):
        sz = (1.0, 1.0, 1.0) if scales is None else tuple(float(s) for s in scales)
        out = 0.0
        for a, g in enumerate(gs):
            out = out + (jnp.roll(g, 1, axis=a + 1) - g) / sz[a]
        return out

    if x0 is None:
        if m is None:
            x0 = data
        else:
            x0 = jnp.einsum("kc,czyx->kzyx", jnp.linalg.pinv(m), data)
        if config.positivity:
            x0 = jnp.maximum(x0, 0.0)
    x = jnp.asarray(x0, dtype)
    f0 = objective(x)

    smasks = []
    for a in range(3):
        msk = jnp.ones(vol, dtype)
        smasks.append(msk.at[tuple(
            slice(-1, None) if i == a else slice(None)
            for i in range(3))].set(0.0)[None])

    if m is not None:
        # Constant K x K data-prox system (see docstring).
        mtm = m.T @ m
        prox_inv = jnp.linalg.inv(mtm + r0 * jnp.eye(nk, dtype=dtype))
        mtd = jnp.einsum("ck,czyx->kzyx", m, data)

    def _data_prox(v, rr0):
        if m is not None:
            return jnp.einsum("kj,jzyx->kzyx", prox_inv, mtd + rr0 * v)
        if poisson:
            b_ = jnp.asarray(bg, dtype)
            B = 1.0 + rr0 * (b_ - v)
            C = b_ - data - rr0 * v * b_
            disc = jnp.maximum(B * B - 4.0 * rr0 * C, 0.0)
            return (-B + jnp.sqrt(disc)) / (2.0 * rr0)
        return (weights * data + rr0 * v) / (weights + rr0)

    if not data_split:
        htd = _irfftn(jnp.conj(k_hat) * _rfftn(data, axes=(1, 2, 3)),
                             s=vol, axes=(1, 2, 3)).astype(dtype)

    def step_core(carry):
        x, z0, u0, z1, u1, z2, u2 = carry
        hx = None
        rhs = r1 * _sdiffs_adj([z - u for z, u in zip(z1, u1)]) + r2 * (z2 - u2)
        if data_split:
            x_hat = (r0 * jnp.conj(k_hat) * _rfftn(z0 - u0, axes=(1, 2, 3))
                     + _rfftn(rhs, axes=(1, 2, 3))) / den
        else:
            x_hat = _rfftn(htd + rhs, axes=(1, 2, 3)) / den
        x = _irfftn(x_hat, s=vol, axes=(1, 2, 3)).astype(dtype)
        al = float(over_relax)  # Boyd 2011 §3.4.3; measured table BASELINE.md
        if data_split:
            hx = _irfftn(k_hat * x_hat, s=vol, axes=(1, 2, 3)).astype(dtype)
            hxr = hx if al == 1.0 else al * hx + (1.0 - al) * z0
            z0 = _data_prox(hxr + u0, r0)
            u0 = u0 + hxr - z0
        dx = _sdiffs(x)
        dxr = dx if al == 1.0 else [al * d + (1.0 - al) * z
                                    for d, z in zip(dx, z1)]
        v = [d + u for d, u in zip(dxr, u1)]
        if coupling == "joint":
            # ONE magnitude across channels and axes per voxel (the coupled
            # norm); shared shrinkage scale broadcast back over (c, a).
            vmag = jnp.sqrt(
                sum(jnp.sum(msk * t * t, axis=0) for msk, t in zip(smasks, v))
                + jnp.finfo(dtype).tiny)
            s = _hyperbolic_prox(vmag, mu / r1, eps)
            scale = (s / vmag)[None]
        else:
            vmag = jnp.sqrt(
                sum(msk * t * t for msk, t in zip(smasks, v))
                + jnp.finfo(dtype).tiny)
            s = _hyperbolic_prox(vmag, mu / r1, eps)
            scale = s / vmag
        z1 = [jnp.where(msk > 0, scale * t, t) for msk, t in zip(smasks, v)]
        u1 = [u + d - z for u, d, z in zip(u1, dxr, z1)]
        xr = x if al == 1.0 else al * x + (1.0 - al) * z2
        z2 = jnp.maximum(xr + u2, 0.0) if config.positivity else xr + u2
        u2 = u2 + xr - z2
        f = objective(z2) if track_objective else jnp.asarray(jnp.nan, dtype)
        return (x, z0, u0, z1, u1, z2, u2), f, dx, hx

    def step(carry, _):
        new_carry, f, _, _ = step_core(carry)
        return new_carry, f

    if data_split:
        z0 = _irfftn(k_hat * _rfftn(x, axes=(1, 2, 3)),
                            s=vol, axes=(1, 2, 3)).astype(dtype)
        u0 = jnp.zeros_like(z0)
    else:
        z0 = jnp.zeros((0,), dtype)
        u0 = jnp.zeros((0,), dtype)
    z1 = _sdiffs(x)
    u1 = [jnp.zeros_like(g) for g in z1]
    z2 = x
    u2 = jnp.zeros_like(x)
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

    # Boyd §3.3 residual-controlled path — see admm_deconvolve. Splits:
    # z0 = Hx per dye (data paths incl. mixing), z1 = D_s x, z2 = x.
    n_el = 1.0
    for d_ in x.shape:
        n_el *= float(d_)
    p_el = n_el * (4.0 + (1.0 if data_split else 0.0))

    def _convT(v):
        return _irfftn(jnp.conj(k_hat) * _rfftn(
            v, axes=(1, 2, 3)), s=vol, axes=(1, 2, 3)).astype(dtype)

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
            r_terms = [d - z for d, z in zip(dx, z1n)] + [xn - z2n]
            z_terms = list(z1n) + [z2n]
            if data_split:
                r_terms = r_terms + [hx - z0n]
                z_terms = z_terms + [z0n]

            def dual_fn():
                s_vec = (r1 * _sdiffs_adj([a - b for a, b in zip(z1n, z1_o)])
                         + r2 * (z2n - z2_o))
                aty = r1 * _sdiffs_adj(u1n) + r2 * u2n
                if data_split:
                    s_vec = s_vec + r0 * _convT(z0n - z0_o)
                    aty = aty + r0 * _convT(u0n)
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


def admm_deconvolve_timeseries_multichannel(
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
    rho0: float | None = None,
    rho1: float | None = None,
    rho1t: float | None = None,
    rho2: float | None = None,
    over_relax: float = 1.8,
    track_objective: bool = True,
) -> DeconvolutionResult:
    """ADMM engine for the full (T, C) 5D acquisition — same objective as
    :func:`jobs.multichannel.deconvolve_timeseries_multichannel`
    (``make_tsmc_objective`` is the shared definition).

    Everything that kept the lower-dimensional engines closed-form
    composes here: per-channel spectra are t-CONSTANT so the x-update is
    one 4D rfftn/irfftn pair over (t, z, y, x) batched over the channel
    axis; the temporal TV is a third circulant split; the color-TV prox
    couples channels within each timepoint; bleach gains ``g_tk`` live in
    the data prox; and ``mixing`` (uniform-Gaussian) becomes T precomputed
    ``(K, K)`` prox inverses ``(G_t M^T M G_t + rho0 I)^-1`` — the
    unmixing+bleach composition costs one channel einsum per iteration.
    Not wired (use VMLMB): weighted or Poisson data THROUGH ``mixing``,
    Poisson+bleach, sparsity/hessian priors, padded-variable mode.
    """
    from microtipi_tpu.jobs.multichannel import make_tsmc_objective

    _check_config(config, "admm", weights, allow_exact=True)
    from microtipi_tpu.jobs.deconv import resolve_exact_fft as _ref
    from microtipi_tpu.ops.convolution import fft_pair as _fp
    _rfftn, _irfftn = _fp(_ref(config))
    poisson = config.data_term == "poisson"
    if mixing is not None and (poisson or weights is not None):
        raise ValueError(
            "admm 5D: mixing composes with the uniform Gaussian data term "
            "only (weighted/poisson unmixing: use "
            "deconvolve_timeseries_multichannel)")
    if poisson and bleach is not None:
        raise ValueError("admm 5D: poisson+bleach is not wired; use "
                         "deconvolve_timeseries_multichannel (VMLMB)")
    objective_raw, aux = make_tsmc_objective(
        psfs, data, weights, config, mu_t=mu_t, epsilon_t=epsilon_t,
        bleach=bleach, coupling=coupling, mixing=mixing, accurate=True)
    data = aux["data"]
    weights = aux["weights"]
    k_hat, m, g5, nk = aux["k_hat"], aux["m"], aux["g5"], aux["nk"]
    nt = aux["nt"]
    vol = aux["vol"]
    shape = data.shape  # (T, C, Z, Y, X)
    dtype = data.dtype
    mu, eps = float(config.mu), float(config.epsilon)
    eps_t = float(config.epsilon if epsilon_t is None else epsilon_t)
    mu_t = float(mu_t)
    bg = float(config.background)
    scales = config.scales
    data_split = poisson or weights is not None or g5 is not None or m is not None
    r1 = float(rho1) if rho1 is not None else max(mu / max(eps, 1e-30), 1e-6)
    r1t = (float(rho1t) if rho1t is not None
           else max(mu_t / max(eps_t, 1e-30), 1e-6))
    r2 = float(rho2) if rho2 is not None else r1
    if rho0 is not None:
        r0 = float(rho0)
    elif poisson:
        r0 = 1.0 / jnp.maximum(jnp.mean(data) + bg, 1e-12)
    elif weights is not None:
        r0 = jnp.mean(weights)
    else:
        r0 = 1.0

    # 4D transforms over (t, z, y, x), channels batched on axis 1; the
    # per-channel spectra are t-constant so they broadcast over t-frequency.
    tzyx = (0, 2, 3, 4)
    kc_hat = k_hat[None]  # (1, C or K, Z, Y, Xr)
    if kc_hat.shape[1] == 1 and data.ndim == 5:
        kc_hat = jnp.broadcast_to(
            kc_hat, (1, shape[1] if m is None else nk) + kc_hat.shape[2:])
    h2 = jnp.real(kc_hat) ** 2 + jnp.imag(kc_hat) ** 2
    fdtype = jnp.real(k_hat).dtype
    s2 = _grad_sq_spectrum(vol, scales, fdtype)[None, None]
    ft = jnp.fft.fftfreq(nt).astype(fdtype)
    st2 = (4.0 * jnp.sin(jnp.pi * ft) ** 2)[:, None, None, None, None]
    temporal = mu_t > 0
    den = (r0 if data_split else 1.0) * h2 + r1 * s2 + r2
    if temporal:
        den = den + r1t * st2

    def objective(x):
        return objective_raw(x)

    def _sdiffs(x):
        sz = (1.0, 1.0, 1.0) if scales is None else tuple(float(s) for s in scales)
        return [(jnp.roll(x, -1, axis=a + 2) - x) / sz[a] for a in range(3)]

    def _sdiffs_adj(gs):
        sz = (1.0, 1.0, 1.0) if scales is None else tuple(float(s) for s in scales)
        out = 0.0
        for a, g in enumerate(gs):
            out = out + (jnp.roll(g, 1, axis=a + 2) - g) / sz[a]
        return out

    if x0 is None:
        if m is None:
            x0 = data
        else:
            x0 = jnp.einsum("kc,tczyx->tkzyx", jnp.linalg.pinv(m), data)
        if config.positivity:
            x0 = jnp.maximum(x0, 0.0)
    x = jnp.asarray(x0, dtype)
    f0 = objective(x)

    smasks = []
    for a in range(3):
        msk = jnp.ones(vol, dtype)
        smasks.append(msk.at[tuple(
            slice(-1, None) if i == a else slice(None)
            for i in range(3))].set(0.0)[None, None])
    tmask = jnp.ones((nt, 1, 1, 1, 1), dtype).at[-1].set(0.0)

    g = None if g5 is None else g5  # (T, K, 1, 1, 1)
    if m is not None:
        # T precomputed (K, K) prox inverses (G_t M^T M G_t + r0 I)^-1.
        mtm = jnp.asarray(m.T @ m, dtype)
        gk = jnp.ones((nt, nk), dtype) if g is None else g[..., 0, 0, 0]
        sys_t = (gk[:, :, None] * mtm[None] * gk[:, None, :]
                 + r0 * jnp.eye(nk, dtype=dtype)[None])
        prox_inv = jnp.linalg.inv(sys_t)  # (T, K, K)
        # G_t M^T d_t, a constant: (T, K, Z, Y, X)
        rhs0 = jnp.einsum("tk,ck,tczyx->tkzyx", gk, jnp.asarray(m, dtype), data)

    def _data_prox(v, rr0):
        if m is not None:
            return jnp.einsum("tkj,tjzyx->tkzyx", prox_inv, rhs0 + rr0 * v)
        if poisson:
            b_ = jnp.asarray(bg, dtype)
            B = 1.0 + rr0 * (b_ - v)
            C = b_ - data - rr0 * v * b_
            disc = jnp.maximum(B * B - 4.0 * rr0 * C, 0.0)
            return (-B + jnp.sqrt(disc)) / (2.0 * rr0)
        gg = 1.0 if g is None else g
        w = jnp.asarray(1.0, dtype) if weights is None else weights
        return (w * gg * data + rr0 * v) / (w * gg * gg + rr0)

    if not data_split:
        htd = _irfftn(jnp.conj(k_hat) * _rfftn(data, axes=(2, 3, 4)),
                             s=vol, axes=(2, 3, 4)).astype(dtype)

    def step_core(carry):
        x, z0, u0, z1, u1, zt, ut, z2, u2 = carry
        hx = None
        dt = None
        rhs = r1 * _sdiffs_adj([z - u for z, u in zip(z1, u1)]) + r2 * (z2 - u2)
        if temporal:
            rhs = rhs + r1t * ((jnp.roll(zt - ut, 1, axis=0)) - (zt - ut))
        if data_split:
            x_hat = (r0 * jnp.conj(kc_hat) * _rfftn(z0 - u0, axes=tzyx)
                     + _rfftn(rhs, axes=tzyx)) / den
        else:
            x_hat = _rfftn(htd + rhs, axes=tzyx) / den
        x = _irfftn(x_hat, s=(nt,) + vol, axes=tzyx).astype(dtype)
        al = float(over_relax)  # Boyd 2011 §3.4.3; measured table BASELINE.md
        if data_split:
            hx = _irfftn(kc_hat * x_hat, s=(nt,) + vol,
                                axes=tzyx).astype(dtype)
            hxr = hx if al == 1.0 else al * hx + (1.0 - al) * z0
            z0 = _data_prox(hxr + u0, r0)
            u0 = u0 + hxr - z0
        dx = _sdiffs(x)
        dxr = dx if al == 1.0 else [al * d + (1.0 - al) * z
                                    for d, z in zip(dx, z1)]
        v = [d + u for d, u in zip(dxr, u1)]
        if coupling == "joint":
            vmag = jnp.sqrt(
                sum(jnp.sum(msk * t * t, axis=1) for msk, t in zip(smasks, v))
                + jnp.finfo(dtype).tiny)  # (T, Z, Y, X)
            s = _hyperbolic_prox(vmag, mu / r1, eps)
            scale = (s / vmag)[:, None]
        else:
            vmag = jnp.sqrt(
                sum(msk * t * t for msk, t in zip(smasks, v))
                + jnp.finfo(dtype).tiny)
            s = _hyperbolic_prox(vmag, mu / r1, eps)
            scale = s / vmag
        z1 = [jnp.where(msk > 0, scale * t, t) for msk, t in zip(smasks, v)]
        u1 = [u + d - z for u, d, z in zip(u1, dxr, z1)]
        if temporal:
            dt = jnp.roll(x, -1, axis=0) - x
            dtr = dt if al == 1.0 else al * dt + (1.0 - al) * zt
            vt = dtr + ut
            vmag_t = jnp.sqrt(tmask * vt * vt + jnp.finfo(dtype).tiny)
            st = _hyperbolic_prox(vmag_t, mu_t / r1t, eps_t)
            zt = jnp.where(tmask > 0, st * jnp.sign(vt), vt)
            ut = ut + dtr - zt
        xr = x if al == 1.0 else al * x + (1.0 - al) * z2
        z2 = jnp.maximum(xr + u2, 0.0) if config.positivity else xr + u2
        u2 = u2 + xr - z2
        f = objective(z2) if track_objective else jnp.asarray(jnp.nan, dtype)
        return (x, z0, u0, z1, u1, zt, ut, z2, u2), f, dx, hx, dt

    def step(carry, _):
        new_carry, f, _, _, _ = step_core(carry)
        return new_carry, f

    if data_split:
        z0 = _irfftn(k_hat * _rfftn(x, axes=(2, 3, 4)),
                            s=vol, axes=(2, 3, 4)).astype(dtype)
        u0 = jnp.zeros_like(x)
    else:
        z0 = jnp.zeros((0,), dtype)
        u0 = jnp.zeros((0,), dtype)
    z1 = _sdiffs(x)
    u1 = [jnp.zeros_like(gg) for gg in z1]
    if temporal:
        zt = jnp.roll(x, -1, axis=0) - x
        ut = jnp.zeros_like(zt)
    else:
        zt = jnp.zeros((0,), dtype)
        ut = jnp.zeros((0,), dtype)
    z2 = x
    u2 = jnp.zeros_like(x)
    init = (x, z0, u0, z1, u1, zt, ut, z2, u2)
    n = int(config.max_iter)
    abstol, reltol, check_every, use_tol = _admm_tolerances(config)
    if not use_tol:
        (x, z0, u0, z1, u1, zt, ut, z2, u2), fs = lax.scan(
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

    # Boyd §3.3 residual-controlled path — see admm_deconvolve. Splits:
    # z0 = Hx per dye (data paths), z1 = D_s x, zt = D_t x, z2 = x.
    n_el = 1.0
    for d_ in x.shape:
        n_el *= float(d_)
    p_el = n_el * (4.0 + (1.0 if data_split else 0.0)
                   + (1.0 if temporal else 0.0))

    def _convT(v):
        return _irfftn(jnp.conj(k_hat) * _rfftn(
            v, axes=(2, 3, 4)), s=vol, axes=(2, 3, 4)).astype(dtype)

    def _tadj(g):
        return jnp.roll(g, 1, axis=0) - g

    hist0 = jnp.full((n + 1,), jnp.nan, jnp.asarray(f0).dtype).at[0].set(f0)

    def w_cond(st):
        _, i, _, conv = st
        return (~conv) & (i < n)

    def w_body(st):
        carry, i, hist, _ = st
        z0_o, z1_o, zt_o, z2_o = carry[1], carry[3], carry[5], carry[7]
        new_carry, f, dx, hx, dt = step_core(carry)
        xn, z0n, u0n, z1n, u1n, ztn, utn, z2n, u2n = new_carry
        i1 = i + 1
        hist = hist.at[i1].set(f)
        check = jnp.mod(i1, check_every) == 0

        def _chk(_):
            r_terms = [d - z for d, z in zip(dx, z1n)] + [xn - z2n]
            z_terms = list(z1n) + [z2n]
            if temporal:
                r_terms = r_terms + [dt - ztn]
                z_terms = z_terms + [ztn]
            if data_split:
                r_terms = r_terms + [hx - z0n]
                z_terms = z_terms + [z0n]

            def dual_fn():
                s_vec = (r1 * _sdiffs_adj([a - b for a, b in zip(z1n, z1_o)])
                         + r2 * (z2n - z2_o))
                aty = r1 * _sdiffs_adj(u1n) + r2 * u2n
                if temporal:
                    s_vec = s_vec + r1t * _tadj(ztn - zt_o)
                    aty = aty + r1t * _tadj(utn)
                if data_split:
                    s_vec = s_vec + r0 * _convT(z0n - z0_o)
                    aty = aty + r0 * _convT(u0n)
                return s_vec, aty

            return _boyd_criterion(r_terms, z_terms, dual_fn,
                                   p_el, n_el, abstol, reltol)

        conv = lax.cond(check, _chk, lambda _: jnp.asarray(False), None)
        return new_carry, i1, hist, conv

    st0 = (init, jnp.asarray(0, jnp.int32), hist0, jnp.asarray(False))
    (x, z0, u0, z1, u1, zt, ut, z2, u2), k, hist, conv = lax.while_loop(
        w_cond, w_body, st0)
    out = z2 if config.positivity else x
    f_final = objective(out)
    status = jnp.where(conv, 0, 1).astype(jnp.int32)
    return DeconvolutionResult(
        out, f_final, k, k, status, hist, jnp.full_like(hist, jnp.nan),
    )
