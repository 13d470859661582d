"""Richardson-Lucy deconvolution (multiplicative Poisson MLE updates).

Beyond-parity capability: the reference stack's ecosystem treats RL as the
baseline deconvolver (DeconvolutionLab2 / Icy), so a switchable RL solver
belongs in a complete framework even though microTiPi itself is VMLMB-based.

    x_{k+1} = x_k / (H^T 1) * H^T( d / (H x_k + bg) )

with H the circulant PSF convolution — so ``H^T 1 = sum(psf)`` is a scalar —
and ``bg`` a constant background. Positivity is intrinsic (multiplicative
updates from a nonnegative start). Entirely on-device: 2 FFT pairs per
iteration inside one ``lax.fori_loop``.

Optional TV regularization (RL-TV, Dey et al. 2006): the denominator gains
``-mu * div(grad x / |grad x|_eps)``, implemented with the hyperbolic-TV
gradient (which equals that divergence term with the same sign convention).

Optional Biggs-Andrews vector extrapolation (``accelerate=True``; Biggs &
Andrews, Appl. Opt. 36 (1997)): the update is evaluated at the
extrapolated point ``y = x + alpha (x - x_prev)`` with
``alpha = <g, g_prev> / <g_prev, g_prev>`` clamped to [0, 1) — typically
2-3x fewer iterations to a given likelihood (pinned by a test).

Multi-view fusion (``multiview_richardson_lucy``): joint Poisson MLE over K
registered views with per-view PSFs (light-sheet fusion, Preibisch et al.
2014's simultaneous variant). EM for the joint likelihood gives

    x_{k+1} = x_k / (sum_v H_v^T 1) * sum_v H_v^T( d_v / (H_v x_k + bg) )

TPU shape: the K views go through batched FFTs (leading view axis), so a
step costs one batched forward + one batched inverse pair, not 2K
dispatches.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
from microtipi_tpu.ops.regularization import hyperbolic_tv_and_gradient

__all__ = ["richardson_lucy", "multiview_richardson_lucy", "wb_backprojector"]


def wb_backprojector(k_hat, shape, beta: float = 0.1, order: int = 10,
                     cutoff_rel: float = 1e-2):
    """Wiener-Butterworth backprojector OTF (Guo et al., Nat. Biotech 2020).

    Classic RL backprojects the ratio image with the MATCHED filter
    ``conj(OTF)``, which re-attenuates exactly the frequencies the forward
    blur already suppressed — hence hundreds of iterations. The
    Wiener-Butterworth backprojector replaces it with

        B(k) = conj(OTF) / (|OTF|^2 + beta^2)         (Wiener: inverts the
                                                       passband amplitude)
              * 1 / sqrt(1 + (rho(k))^(2*order))      (Butterworth: hard
                                                       stop at the support)

    where ``rho`` is the frequency radius normalized by the OTF's PER-AXIS
    support cutoffs (measured from the OTF itself: the largest |f_axis|
    with ``|OTF| > cutoff_rel * |OTF(0)|`` — an ellipsoid, since axial
    support is much smaller than lateral). Each iteration then advances
    like many matched-filter iterations (the paper's measured ~10x; pinned
    relatively by a test here). Normalized so ``B(0) = 1`` — the
    backprojector conserves flux and the RL denominator becomes 1.

    ``beta``: Wiener floor ~ inverse SNR; smaller = more aggressive.
    Default 0.1 — measured on a noiseless high-dynamic-range scene: 0.1
    converges monotonically (err 340 at 10 iters vs 790 for matched-RL at
    100), 0.05 plateaus early, and 0.01 oscillates into divergence (the
    near-inverse filter overshoots and the multiplicative update amplifies
    it). Returns the rfftn-layout backprojector spectrum.
    """
    otf = k_hat
    mag2 = jnp.real(otf * jnp.conj(otf))
    dc = jnp.sqrt(mag2.reshape(-1)[0])
    support = mag2 > (cutoff_rel * dc) ** 2
    freqs = [np.fft.fftfreq(n) for n in shape[:-1]] + [np.fft.rfftfreq(shape[-1])]
    tiny = jnp.asarray(np.finfo(np.float32).tiny, mag2.dtype)
    rho2 = 0.0
    for ax, f in enumerate(freqs):
        fa = jnp.asarray(np.abs(f), mag2.dtype).reshape(
            [-1 if i == ax else 1 for i in range(len(shape))])
        kc = jnp.max(jnp.where(support, fa, 0.0))
        rho2 = rho2 + (fa / jnp.maximum(kc, tiny)) ** 2
    wiener = jnp.conj(otf) / (mag2 + jnp.asarray(beta, mag2.dtype) ** 2)
    butter = 1.0 / jnp.sqrt(1.0 + rho2 ** order)
    b_hat = wiener * butter
    b0 = jnp.real(b_hat.reshape(-1)[0])
    return b_hat / jnp.maximum(b0, tiny)


def richardson_lucy(
    data: jax.Array,
    psf: jax.Array,
    iterations: int = 50,
    background: float = 0.0,
    mu: float = 0.0,
    epsilon: float = 1e-2,
    x0: jax.Array | None = None,
    accelerate: bool = False,
    backprojector: str = "matched",
    wb_beta: float = 0.1,
    stop: str = "fixed",
    stop_sigma: float | jax.Array | None = None,
    stop_tau: float = 1.0,
    return_iterations: bool = False,
):
    """RL (optionally RL-TV / Biggs-Andrews accelerated) estimate;
    ``psf`` corner-origin at data shape.

    ``backprojector="wiener-butterworth"`` swaps the matched backprojection
    filter for the Guo et al. 2020 accelerated one (:func:`wb_backprojector`,
    floor ``wb_beta``) — same fixed-point family, ~10x fewer iterations to a
    given quality (pinned by a test); composes with ``accelerate`` and TV.
    The speedup applies to SEMICONVERGENCE as well: on noisy data the best
    iterate arrives ~10x sooner (measured: ~2 iterations on a Poisson scene
    where matched-RL peaks near 20) — budget ``iterations`` accordingly, or
    add TV to soften the post-peak noise amplification.

    ``stop`` picks the iteration count automatically — RL semiconvergence
    makes it THE critical knob, and the discrepancy principle is the
    classical answer for iterative methods (Morozov applied to the iterate
    sequence: iterate while the residual still exceeds its statistical
    expectation, stop at the crossing — noise amplification is exactly what
    pushes the residual BELOW the noise floor):

    - ``"fixed"`` (default): run exactly ``iterations`` (reference-parity
      behavior; unconditionally a ``fori_loop``).
    - ``"gaussian"``: stop when ``sum (Hx+bg-d)^2 <= stop_tau * N * sigma^2``
      with sigma = ``stop_sigma`` or the blind Immerkaer-MAD estimate
      (``jobs.autotune.estimate_noise_sigma``).
    - ``"poisson"``: stop when the generalized-KL deviance
      ``2*sum(d*log(d/(Hx+bg)) + (Hx+bg) - d) <= stop_tau * N``
      (asymptotically chi-squared with N dof — RL's own likelihood).

    ``iterations`` stays the hard cap. The residual reuses the forward
    model each update already computes (zero extra FFTs). With
    ``accelerate`` the residual is measured at the extrapolated point
    ``y`` — the same point the update linearizes at. Noiseless data never
    crosses the target and runs to the cap. ``return_iterations=True``
    returns ``(x, k)`` with ``k`` the number of updates applied."""
    if psf.shape != data.shape:
        raise ValueError("richardson_lucy requires psf shape == data shape")
    if stop not in ("fixed", "gaussian", "poisson"):
        raise ValueError(f"unknown stop {stop!r}")
    from microtipi_tpu.ops.convolution import auto_exact_fft, fft_pair

    _exact = auto_exact_fft()
    _rfftn, _irfftn = fft_pair(_exact)
    k_hat = convolve_spectrum(psf, _exact)
    if backprojector == "wiener-butterworth":
        k_hat_conj = wb_backprojector(k_hat, data.shape, beta=wb_beta)
        flux = jnp.asarray(1.0, data.dtype)  # B(0) = 1 by construction
    elif backprojector == "matched":
        k_hat_conj = jnp.conj(k_hat)
        flux = jnp.sum(psf)
    else:
        raise ValueError(f"unknown backprojector {backprojector!r}")

    def forward(y):
        return convolve(y, k_hat, data.shape, _exact)

    def backward(r):
        return _irfftn(k_hat_conj * _rfftn(r), s=data.shape)

    return _rl_engine(data, forward, backward, flux, iterations, background,
                      mu, epsilon, x0, accelerate, stop, stop_sigma,
                      stop_tau, return_iterations)


def _rl_engine(data, forward, backward, flux, iterations, background, mu,
               epsilon, x0, accelerate, stop, stop_sigma, stop_tau,
               return_iterations):
    """The RL fixed-point loop over an abstract linear operator:
    ``forward(y) = H y``, ``backward(r) = B r`` (the backprojector —
    ``H^T`` matched, or a filtered variant), ``flux = B^T H 1`` (scalar for
    shift-invariant H; an array, e.g. per-z, for spatially-variant
    operators like ``jobs.depthvar.richardson_lucy_depthvar``). All the
    docstring semantics of :func:`richardson_lucy` (TV, Biggs-Andrews,
    discrepancy stopping) live here, shared by every operator."""
    if stop not in ("fixed", "gaussian", "poisson"):
        raise ValueError(f"unknown stop {stop!r}")
    d = jnp.maximum(data, 0.0)
    x = jnp.maximum(data, 1e-12) if x0 is None else jnp.maximum(x0, 1e-12)
    bg = jnp.asarray(background, data.dtype)
    tiny = jnp.asarray(jnp.finfo(data.dtype).tiny, data.dtype)
    # Data-scaled support threshold: FFT roundoff leaves slightly NEGATIVE
    # model values on empty regions; flooring those at the dtype tiny makes
    # d/model explode in f32 (observed on sparse scenes). Below eps the
    # voxel is treated as having no model support (ratio 0) — scikit-image's
    # filter_epsilon semantics with a scale-invariant default.
    eps = jnp.maximum(1e-6 * (jnp.mean(d) + bg), tiny)

    if stop == "gaussian":
        if stop_sigma is None:
            from microtipi_tpu.jobs.autotune import estimate_noise_sigma

            sig = estimate_noise_sigma(data).astype(data.dtype)
        else:
            sig = jnp.asarray(stop_sigma, data.dtype)
        target = jnp.asarray(stop_tau * data.size, data.dtype) * sig * sig
    elif stop == "poisson":
        target = jnp.asarray(stop_tau * data.size, data.dtype)
    else:
        target = None

    def discrepancy(model):
        if stop == "gaussian":
            r = model - jnp.asarray(data, model.dtype)
            return jnp.sum(r * r)
        return 2.0 * jnp.sum(
            jax.scipy.special.xlogy(d, d / jnp.maximum(model, tiny)) + model - d
        )

    def update(y):
        model = forward(y) + bg
        ratio = jnp.where(model > eps, d / jnp.maximum(model, eps), 0.0)
        back = backward(ratio)
        denom = flux
        if mu > 0:
            _, tv_grad = hyperbolic_tv_and_gradient(y, epsilon)
            denom = jnp.maximum(flux + mu * tv_grad, 0.1 * flux)
        x_new = jnp.maximum(y * back / denom, 0.0)
        disc = discrepancy(model) if target is not None else jnp.zeros((), data.dtype)
        return x_new, disc

    # The residual is evaluated on the model each update computes anyway, so
    # the crossing is detected one update late (the cheapest placement: zero
    # extra FFTs); at tau ~ 1 the single extra multiplicative step is noise-
    # level. k counts applied updates.
    k_cap = jnp.asarray(iterations, jnp.int32)
    if not accelerate:
        if target is None:  # fixed count: keep the (differentiable) fori_loop
            x_fin = lax.fori_loop(0, iterations, lambda _, x: update(x)[0], x)
            return (x_fin, k_cap) if return_iterations else x_fin

        def body(carry):
            x, k, _ = carry
            x_new, disc = update(x)
            return x_new, k + 1, disc

        def cond(carry):
            _, k, disc = carry
            return (k < iterations) & (disc > target)

        x_fin, k_fin, _ = lax.while_loop(
            cond, body, (x, jnp.zeros((), jnp.int32), jnp.full((), jnp.inf, data.dtype))
        )
        return (x_fin, k_fin) if return_iterations else x_fin

    def body(carry):
        x, x_prev, g1, g2, k, _ = carry
        # alpha_k = <g_{k-1}, g_{k-2}> / <g_{k-2}, g_{k-2}>, zero for the
        # first two iterations (no history yet); g_k = x_{k+1} - y_k is the
        # raw fixed-point step.
        num = jnp.vdot(g1, g2).real
        den = jnp.vdot(g2, g2).real
        alpha = jnp.where(
            (k >= 2) & (den > 0), jnp.clip(num / jnp.maximum(den, tiny), 0.0, 0.999), 0.0
        )
        y = jnp.maximum(x + alpha * (x - x_prev), 0.0)
        x_new, disc = update(y)
        return x_new, x, x_new - y, g1, k + 1, disc

    if target is None:
        out = lax.fori_loop(
            0, iterations,
            lambda k, c: body((c[0], c[1], c[2], c[3], k, c[4]))[:4]
            + (jnp.zeros((), data.dtype),),
            (x, x, jnp.zeros_like(x), jnp.zeros_like(x), jnp.zeros((), data.dtype)),
        )
        return (out[0], k_cap) if return_iterations else out[0]

    def cond(carry):
        k, disc = carry[4], carry[5]
        return (k < iterations) & (disc > target)

    out = lax.while_loop(
        cond, body,
        (x, x, jnp.zeros_like(x), jnp.zeros_like(x),
         jnp.zeros((), jnp.int32), jnp.full((), jnp.inf, data.dtype)),
    )
    return (out[0], out[4]) if return_iterations else out[0]


def multiview_richardson_lucy(
    views: jax.Array,
    psfs: jax.Array,
    iterations: int = 50,
    background: float = 0.0,
    x0: jax.Array | None = None,
    backprojector: str = "matched",
    wb_beta: float = 0.1,
) -> jax.Array:
    """Joint-MLE RL fusion of K registered views, shapes ``(K,) + vol``.

    Each view ``d_v`` observes the same object through its own (corner-
    origin) PSF ``h_v`` — the light-sheet multi-view setting where each
    view is sharp in a different direction and fusion recovers isotropic
    detail no single view contains (pinned by a test with complementary
    anisotropic blurs). K = 1 reduces exactly to :func:`richardson_lucy`.
    """
    if views.shape != psfs.shape or views.ndim < 2:
        raise ValueError("views and psfs must share a (K,)+volume shape")
    vol = views.shape[1:]
    axes = tuple(range(1, views.ndim))
    from microtipi_tpu.ops.convolution import auto_exact_fft, fft_pair

    _rfftn, _irfftn = fft_pair(auto_exact_fft())
    k_hat = _rfftn(psfs, axes=axes)
    if backprojector == "wiener-butterworth":
        # per-view backprojectors (each arm has its own OTF support); the
        # fused denominator is sum_v B_v(0) = K
        k_hat_conj = jnp.stack([
            wb_backprojector(k_hat[v], vol, beta=wb_beta)
            for v in range(views.shape[0])
        ])
        flux = jnp.asarray(float(views.shape[0]), views.dtype)
    elif backprojector == "matched":
        k_hat_conj = jnp.conj(k_hat)
        flux = jnp.sum(psfs)
    else:
        raise ValueError(f"unknown backprojector {backprojector!r}")
    d = jnp.maximum(views, 0.0)
    # Mean-of-views start, floored at a fraction of the mean intensity: the
    # floor removes absorbing zeros and (with the eps support-threshold
    # below) keeps the first ratios bounded in f32 even on sparse scenes;
    # measured on-chip to converge substantially faster than a flat-field
    # start (BASELINE.md multi-view row).
    x = jnp.maximum(jnp.mean(d, axis=0), 1e-3 * jnp.mean(d) + 1e-12) \
        if x0 is None else jnp.maximum(x0, 1e-12)
    bg = jnp.asarray(background, views.dtype)
    tiny = jnp.asarray(jnp.finfo(views.dtype).tiny, views.dtype)
    eps = jnp.maximum(1e-6 * (jnp.mean(d) + bg), tiny)  # see jobs.richardson_lucy

    def body(_, x):
        model = _irfftn(k_hat * _rfftn(x)[None], s=vol, axes=axes) + bg
        ratio = jnp.where(model > eps, d / jnp.maximum(model, eps), 0.0)
        back = jnp.sum(
            _irfftn(k_hat_conj * _rfftn(ratio, axes=axes), s=vol, axes=axes),
            axis=0,
        )
        return jnp.maximum(x * back / flux, 0.0)

    return lax.fori_loop(0, iterations, body, x)
