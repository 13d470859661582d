"""Object-update solver: edge-preserving regularized deconvolution.

Rebuild of the TiPi ``DeconvolutionJob`` capability the reference drives at
``microUtils/BlindDeconvJob.java:103-108`` (``updatePsf`` then ``deconv``):
minimize over the object x

    f(x) = 0.5 * sum w * ((psf (*) x) - d)^2  +  mu * TV_eps(x),   x >= 0

with VMLMB. The data term is the weighted FFT convolution
(``ops/convolution.py``), the regularizer the hyperbolic total variation
(``ops/regularization.py``), and positivity is the bound constraint the
reference's object step actually enforces (its PSF step leaves the projector
null — ``PSF_Estimation.java:168-189``).

Fully jittable: one ``lax.while_loop`` per solve, zero host round-trips.
Optional padded-variable mode suppresses periodic wraparound: the object
lives on ``var_shape >= data.shape`` and the model is cropped to the centered
data window.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from microtipi_tpu.ops.convolution import WeightedConvolutionCost
from microtipi_tpu.ops.regularization import hyperbolic_tv
from microtipi_tpu.optim.vmlmb import VMLMBResult, minimize_vmlmb
from microtipi_tpu.utils.arrays import pad_fft_kernel, pad_to_shape

__all__ = [
    "DeconvolutionConfig",
    "DeconvolutionResult",
    "deconvolve",
    "has_regularizer",
    "make_objective",
    "make_regularizer",
    "regularization_cost",
]


@dataclasses.dataclass(frozen=True)
class DeconvolutionConfig:
    """Knobs of the object step.

    Defaults mirror the reference's hard-coded numerics where they exist:
    VMLMB memory 5 (``PSF_Estimation.java:188``), ``maxeval = 2*maxiter``
    (``:272``). ``mu``/``epsilon`` weigh the hyperbolic TV; ``scales`` give
    per-axis voxel sizes (pass ``(dz, dxy, dxy)`` for anisotropic stacks).
    """

    mu: float = 0.01
    epsilon: float = 0.01
    scales: tuple[float, ...] | None = None
    #: Sparse-deconvolution priors (beyond parity; the prior pair of Zhao
    #: et al., Nat. Biotech. 2021): ``sparsity`` weighs a smoothed L1 on
    #: intensity (pulls background to exact zero — pair with positivity),
    #: ``hessian`` a hyperbolic penalty on the second-difference Hessian
    #: (continuity: the anti-staircasing complement to TV — prefer it over
    #: mu for smooth specimens). Both share ``epsilon`` as the smoothing
    #: scale and compose additively with mu*TV; 0 = off. Auto-mu
    #: (``jobs.autotune``) bisects mu only and holds these fixed.
    #: ``sparsity_epsilon`` optionally gives the L1 smoothing its own scale
    #: (None = ``epsilon``): smaller = closer to exact L1 = stronger
    #: background-flux confinement (measured: halo flux 1104 -> 876 at the
    #: same weight when dropping it from 0.5 to 0.01).
    sparsity: float = 0.0
    hessian: float = 0.0
    sparsity_epsilon: float | None = None
    positivity: bool = True
    #: Data fidelity: "gaussian" (reference semantics, weighted least
    #: squares) or "poisson" (generalized-KL deviance for photon-counting
    #: data — the objective Richardson-Lucy descends, here under VMLMB with
    #: TV and positivity; ``background`` is the known offset b in
    #: d ~ Poisson(Hx + b), recommended > 0 with positivity on).
    data_term: str = "gaussian"
    background: float = 0.0
    max_iter: int = 50
    max_eval: int | None = None
    gatol: float = 0.0
    grtol: float = 1e-3
    mem: int = 5
    var_shape: tuple[int, ...] | None = None  # padded object grid (>= data shape)
    # Pallas fused TV (one-sweep cost+grad). None = auto: on for TPU backends
    # with 3D volumes, off elsewhere. Measured on v5e at 256^3 with the
    # quadratic data term: 941 -> 1145 Mvox*iter/s (+22%). Cost partials are
    # per-plane and pairwise-summed by XLA, so accuracy matches the jnp path.
    fused_tv: bool | None = None
    # L-BFGS s/y history storage dtype. None = auto: "bfloat16" on TPU
    # backends with an f32 iterate (halves the two-loop's HBM traffic;
    # curvature scalars stay full precision — measured at 256^3 on v5e:
    # 1143 -> 1273 / 1063 -> 1215 Mvox*iter/s across two seeds with
    # equal-or-better final cost), iterate dtype elsewhere (CPU/f64
    # validation paths stay bit-identical). Explicit value forces.
    mem_dtype: str | None = None
    #: ADMM-engine convergence control (Boyd et al. 2011 §3.3): stop when
    #: the stacked primal residual ||Ax - z|| <= sqrt(p)*abstol +
    #: reltol*max(||Ax||, ||z||) AND the dual residual ||rho A^T dz|| <=
    #: sqrt(n)*abstol + reltol*||A^T y||. Both 0 (default) = the engines
    #: run exactly ``max_iter`` iterations as one ``lax.scan`` (the
    #: reference-parity fixed-budget protocol and the bench path); any
    #: tolerance > 0 switches to a bounded ``lax.while_loop`` that checks
    #: the residuals every ``admm_check_every`` iterations (amortizes the
    #: ~2-4 extra FFTs a check costs on data-split paths; measured <5%
    #: overhead at 256^3, BASELINE.md round 5). The ADMM analogue of the
    #: VMLMB ``gatol``/``grtol`` surface — these fields are ignored by the
    #: VMLMB/FISTA engines.
    admm_abstol: float = 0.0
    admm_reltol: float = 0.0
    admm_check_every: int = 20
    #: f32-exact FFTs via the highest-precision matmul-DFT
    #: (``ops.exactfft``). The XLA TPU FFT runs at bf16-grade internal
    #: precision — measured ~35% RMS error on a single 256^3 white-noise
    #: convolution, which ill-conditioned solves amplify to tens of
    #: percent of reconstruction error on extended low-contrast scenes
    #: (BASELINE.md round 5 "TPU FFT precision"; sparse/high-contrast
    #: scenes sit below the error's contrast floor, and CPU backends are
    #: exact either way). The matmul-DFT is ALSO faster on this chip:
    #: measured FFT-pair 5.6 vs 7.9 ms at 256^3 and 42 vs 110 ms at
    #: 512^3 (the MXU path the XLA FFT does not saturate), lifting the
    #: 256^3 headline solve +45% and the 512^3 solve +80%. None
    #: (default) = AUTO: exact on TPU backends, off on CPU (already
    #: exact) — wired across EVERY solver surface: the 3D single-volume
    #: solvers (deconvolve / admm_deconvolve / fista_deconvolve, incl.
    #: per-tile and the blind loop), the 4D/5D/multichannel/superres/
    #: depth-varying solvers and their ADMM engines, RL/Wiener, the PSF
    #: fits (backend auto rule), the uncertainty CG, and the sharded
    #: path's z-leg 1D transform (its rfft2 leg is measured f32-exact
    #: and keeps jnp.fft). CLI ``--exact-fft`` / ``--no-exact-fft``
    #: force.
    exact_fft: bool | None = None


class DeconvolutionResult(NamedTuple):
    x: jax.Array
    f: jax.Array
    iterations: jax.Array
    evaluations: jax.Array
    status: jax.Array
    f_history: jax.Array
    pg_history: jax.Array


def resolve_exact_fft(config: DeconvolutionConfig) -> bool:
    """The ``exact_fft`` auto rule: explicit value wins; None = exact on
    TPU backends (measured both MORE ACCURATE and FASTER there — config
    field docstring + BASELINE.md round 5), off on CPU (jnp.fft is
    already exact and faster there)."""
    if config.exact_fft is not None:
        return bool(config.exact_fft)
    from microtipi_tpu.ops.convolution import auto_exact_fft

    return auto_exact_fft()


def resolve_mem_dtype(config: DeconvolutionConfig, x0) -> jnp.dtype | None:
    """The L-BFGS history dtype for an object solve (see ``mem_dtype`` on the
    config): explicit value wins; auto = bfloat16 on TPU backends with an f32
    iterate (measured win, BASELINE.md), full precision elsewhere."""
    if config.mem_dtype is not None:
        return jnp.dtype(config.mem_dtype)
    if jax.default_backend() in ("tpu", "axon") and jnp.asarray(x0).dtype == jnp.float32:
        return jnp.bfloat16
    return None


def make_regularizer(config: DeconvolutionConfig, var_shape: tuple[int, ...]):
    """``x -> mu * TV_eps(x)`` for the configured regularizer (0 if mu == 0),
    picking the fused Pallas kernel under the same auto rule as
    :func:`make_objective`. Shared with the depth-varying solver."""
    use_fused = config.fused_tv
    if use_fused is None:
        use_fused = jax.default_backend() in ("tpu", "axon") and len(var_shape) == 3
    use_fused = use_fused and len(var_shape) == 3

    def reg(x):
        total = jnp.zeros((), x.dtype)
        if config.mu > 0:
            if use_fused:
                from microtipi_tpu.ops.pallas.hyperbolic_tv import hyperbolic_tv_value

                tv = hyperbolic_tv_value(x, config.epsilon, config.scales)
            else:
                tv = hyperbolic_tv(x, config.epsilon, config.scales)
            total = total + config.mu * tv
        total = total + _extra_priors(x, config)
        return total

    return reg


def has_regularizer(config: DeconvolutionConfig) -> bool:
    """True when any regularization weight is active."""
    return config.mu > 0 or config.sparsity > 0 or config.hessian > 0


def _extra_priors(x, config: DeconvolutionConfig, axes=None):
    """The sparse-deconvolution terms (``sparsity``/``hessian`` fields)."""
    from microtipi_tpu.ops.regularization import hyperbolic_hessian, smoothed_l1

    total = jnp.zeros((), x.dtype)
    if config.sparsity > 0:
        eps_s = (config.epsilon if config.sparsity_epsilon is None
                 else config.sparsity_epsilon)
        total = total + config.sparsity * smoothed_l1(x, eps_s)
    if config.hessian > 0:
        total = total + config.hessian * hyperbolic_hessian(
            x, config.epsilon, config.scales, axes=axes
        )
    return total


def regularization_cost(x, config: DeconvolutionConfig, axes=None):
    """mu*TV + sparsity*L1 + hessian*Hess as plain jnp (no Pallas) — the
    form the sharded objectives inline (GSPMD handles the halo exchanges of
    the finite differences; the Pallas kernel is single-device only).
    ``axes`` restricts differencing for batched stacks."""
    total = jnp.zeros((), x.dtype)
    if config.mu > 0:
        total = total + config.mu * hyperbolic_tv(
            x, config.epsilon, config.scales, axes=axes
        )
    return total + _extra_priors(x, config, axes=axes)


def make_objective(
    psf: jax.Array,
    data: jax.Array,
    weights: jax.Array | None,
    config: DeconvolutionConfig,
    accurate: bool = False,
):
    """Build the fused cost+gradient closure for the object step.

    The PSF is corner-origin (straight out of ``compute_psf``); it is embedded
    into the variable grid if padding is configured. The kernel spectrum is
    precomputed once per call — one rfftn per outer blind round, not per
    VMLMB iteration.

    ``accurate``: route the uniform-Gaussian case through the residual-form
    ``UniformConvCost`` instead of the quadratic identity. For VALUE-ONLY
    evaluation both cost the same 2 FFTs, but the quadratic form's f32
    error scales with ``eps * sum|x*(Ax)|`` — measured 25%+ of f itself on
    bright extended 256^3 scenes (BASELINE.md round 5) — while the residual
    form's scales with ``eps * f``. The ADMM engines track ``f_history``
    with ``accurate=True``; the VMLMB step keeps the quadratic fused
    value+gradient (2 vs 3 FFTs per value+grad evaluation) with the
    ``_f32_stall_continue`` cure for its known near-convergence failure.
    """
    var_shape = tuple(config.var_shape) if config.var_shape is not None else data.shape
    kernel = pad_fft_kernel(psf, var_shape)
    exact = resolve_exact_fft(config)

    # Uniform weights on the un-padded grid: circulant quadratic form — cost
    # AND gradient from one rfftn/irfftn pair (half the FFTs of the general
    # weighted path, whose residual must be formed in real space). The
    # quadratic identity cancels catastrophically at machine-limited
    # convergence (see psf_fit._fit_data_term, where f32 *fits* switch to
    # the residual form) — harmless here: the object step runs tens of
    # iterations, far from the eps*c resolution floor, and carries the
    # throughput headline.
    if config.data_term == "poisson":
        if weights is not None:
            raise ValueError(
                "data_term='poisson' models the noise itself; per-voxel "
                "Gaussian weights do not compose with it"
            )
        from microtipi_tpu.ops.convolution import PoissonConvCost

        cost = PoissonConvCost.build(kernel, data, config.background, var_shape,
                                     exact=exact)
    elif config.data_term != "gaussian":
        raise ValueError(f"unknown data_term {config.data_term!r}")
    elif weights is None and var_shape == data.shape:
        if accurate:
            from microtipi_tpu.ops.convolution import UniformConvCost

            cost = UniformConvCost.build(kernel, data, exact=exact)
        else:
            from microtipi_tpu.ops.convolution import QuadraticConvCost

            cost = QuadraticConvCost.build(kernel, data, exact=exact)
    else:
        cost = WeightedConvolutionCost.build(kernel, data, weights, var_shape,
                                             exact=exact)

    reg = make_regularizer(config, var_shape)

    def objective(x):
        f = cost.cost(x)
        if has_regularizer(config):
            f = f + reg(x)
        return f

    return jax.value_and_grad(objective)


def _f32_stall_continue(
    res: VMLMBResult,
    psf: jax.Array,
    data: jax.Array,
    config: DeconvolutionConfig,
) -> VMLMBResult:
    """Continue a LINESEARCH_FAIL-terminated f32 quadratic-path solve on the
    cancellation-free residual objective (VERDICT r4 item 2).

    The 2-FFT quadratic identity ``0.5<x,Ax> - <x,b> + c`` resolves cost
    differences only to ``eps*c`` — in f32 at 256^3 that is ~O(1), which
    stalls the Armijo test at f ~ 419 while the true optimum is ~ 415
    (BASELINE.md engine head-to-head; the same mechanism the PSF fits cured
    with ``psf_fit._fit_data_term``). The cure without a headline cost: keep
    the fast quadratic path until it STALLS, then (same jitted program,
    ``lax.cond`` — the continuation costs nothing when it does not trigger)
    restart the remaining iteration/evaluation budget on the 3-FFT
    residual-form ``UniformConvCost``, whose value resolution is
    ``eps*f`` — fine enough for Wolfe tests near the optimum. The merged
    history mixes the two evaluation forms at the splice point (they agree
    to ~eps*c, the quadratic form's own resolution).
    """
    from jax import lax

    from microtipi_tpu.ops.convolution import UniformConvCost
    from microtipi_tpu.optim.vmlmb import VMLMBStatus

    kernel = pad_fft_kernel(psf, data.shape)
    cost = UniformConvCost.build(kernel, data, exact=resolve_exact_fft(config))
    reg = make_regularizer(config, data.shape)

    def objective(x):
        f = cost.cost(x)
        if has_regularizer(config):
            f = f + reg(x)
        return f

    fun2 = jax.value_and_grad(objective)
    maxiter = int(config.max_iter)
    maxeval = int(config.max_eval) if config.max_eval is not None else 2 * maxiter

    def cont(res):
        res_b = minimize_vmlmb(
            fun2,
            res.x,
            lower=0.0 if config.positivity else None,
            mem=config.mem,
            maxiter=maxiter,
            maxiter_cap=jnp.asarray(maxiter, jnp.int32) - res.iterations,
            maxeval=jnp.asarray(maxeval, jnp.int32) - res.evaluations,
            gatol=config.gatol,
            grtol=config.grtol,
            mem_dtype=resolve_mem_dtype(config, res.x),
        )
        idx = res.iterations + jnp.arange(1, maxiter + 1)
        hist_f = res.f_history.at[idx].set(res_b.f_history[1:], mode="drop")
        hist_pg = res.pg_history.at[idx].set(res_b.pg_history[1:], mode="drop")
        return VMLMBResult(
            x=res_b.x, f=res_b.f, g=res_b.g,
            iterations=res.iterations + res_b.iterations,
            evaluations=res.evaluations + res_b.evaluations,
            status=res_b.status, f_history=hist_f, pg_history=hist_pg,
        )

    need = (
        (res.status == VMLMBStatus.LINESEARCH_FAIL)
        & (res.iterations < maxiter)
        & (res.evaluations < maxeval)
    )
    return lax.cond(need, cont, lambda r: r, res)


def deconvolve(
    data: jax.Array,
    psf: jax.Array,
    weights: jax.Array | None = None,
    x0: jax.Array | None = None,
    config: DeconvolutionConfig = DeconvolutionConfig(),
    init: str = "data",
) -> DeconvolutionResult:
    """Solve the object sub-problem.

    ``init`` picks the warm start when ``x0`` is None: ``"data"`` (the
    customary choice) or ``"wiener"`` (clamped regularized inverse — usually
    reaches a given cost in substantially fewer VMLMB iterations).

    f32 uniform-Gaussian solves that exhaust the quadratic fast path's value
    resolution (LINESEARCH_FAIL mid-budget) automatically continue on the
    residual-form objective — see :func:`_f32_stall_continue`.
    """
    var_shape = tuple(config.var_shape) if config.var_shape is not None else data.shape
    if x0 is None:
        if init == "wiener":
            from microtipi_tpu.jobs.wiener import wiener

            x0 = pad_to_shape(wiener(data, psf), var_shape)
        elif init == "data":
            x0 = pad_to_shape(data, var_shape)
        else:
            raise ValueError(f"unknown init {init!r}")
        if config.positivity:
            x0 = jnp.maximum(x0, 0.0)
    fun = make_objective(psf, data, weights, config)
    res: VMLMBResult = minimize_vmlmb(
        fun,
        x0,
        lower=0.0 if config.positivity else None,
        mem=config.mem,
        maxiter=config.max_iter,
        maxeval=config.max_eval,
        gatol=config.gatol,
        grtol=config.grtol,
        mem_dtype=resolve_mem_dtype(config, x0),
    )
    if (
        config.data_term == "gaussian"
        and weights is None
        and var_shape == data.shape
        and jnp.asarray(data).dtype == jnp.float32
    ):
        # Exactly the gate under which make_objective used the quadratic
        # fast path AND its eps*c value floor can stall an f32 search.
        res = _f32_stall_continue(res, psf, data, config)
    return DeconvolutionResult(
        res.x, res.f, res.iterations, res.evaluations, res.status, res.f_history, res.pg_history
    )
