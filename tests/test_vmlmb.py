"""Optimizer tests: More-Thuente line search + VMLMB on standard problems."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.optim.linesearch import more_thuente
from microtipi_tpu.optim.vmlmb import VMLMBStatus, minimize_vmlmb


# ---------------------------------------------------------------- line search

def _run_ls(fun, dfun, step0, **kw):
    def phi(a):
        return fun(a), dfun(a), None

    f0, df0 = fun(jnp.asarray(0.0)), dfun(jnp.asarray(0.0))
    return more_thuente(phi, jnp.asarray(step0), f0, df0, None, **kw)


def test_linesearch_quadratic():
    # phi(a) = (a-2)^2 ; minimum at 2.
    fun = lambda a: (a - 2.0) ** 2
    dfun = lambda a: 2.0 * (a - 2.0)
    res = _run_ls(fun, dfun, 1.0)
    assert int(res.status) == 0
    # Strong Wolfe with gtol=0.1 forces the step near the minimizer.
    assert abs(float(res.step) - 2.0) < 0.5
    assert float(res.f) < fun(jnp.asarray(0.0))


def test_linesearch_more_thuente_table_function():
    # Function 1 from More & Thuente (1994): phi(a) = -a/(a^2+2), minimum at
    # sqrt(2); their reported solutions sit near 1.4.
    fun = lambda a: -a / (a**2 + 2.0)
    dfun = lambda a: (a**2 - 2.0) / (a**2 + 2.0) ** 2
    res = _run_ls(fun, dfun, 0.1, ftol=1e-3, gtol=1e-1)
    assert int(res.status) == 0
    assert abs(float(res.step) - np.sqrt(2.0)) < 0.3


def test_linesearch_expands_from_tiny_step():
    fun = lambda a: (a - 100.0) ** 2
    dfun = lambda a: 2.0 * (a - 100.0)
    res = _run_ls(fun, dfun, 1e-3, max_evals=60)
    assert int(res.status) == 0
    assert float(res.f) < fun(jnp.asarray(1e-3))


# ---------------------------------------------------------------- vmlmb

def _quadratic(n=20, seed=0, kappa=50.0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.geomspace(1.0, kappa, n)
    a = q @ np.diag(eigs) @ q.T
    b = rng.standard_normal(n)
    a = jnp.asarray(a)
    b = jnp.asarray(b)

    def fun(x):
        return jax.value_and_grad(lambda z: 0.5 * z @ a @ z - b @ z)(x)

    x_star = jnp.asarray(np.linalg.solve(np.asarray(a), np.asarray(b)))
    return fun, x_star


def test_vmlmb_quadratic_converges():
    fun, x_star = _quadratic()
    res = minimize_vmlmb(fun, jnp.zeros(20), maxiter=200, maxeval=400, grtol=0.0, gatol=1e-6)
    assert int(res.status) == VMLMBStatus.CONVERGED
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_star), atol=1e-6)


def test_vmlmb_rosenbrock():
    def fun(x):
        def f(z):
            return jnp.sum(100.0 * (z[1:] - z[:-1] ** 2) ** 2 + (1.0 - z[:-1]) ** 2)
        return jax.value_and_grad(f)(x)

    x0 = jnp.asarray(np.full(8, -1.2))
    res = minimize_vmlmb(fun, x0, maxiter=500, maxeval=1200, grtol=0.0, gatol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-5)


def test_vmlmb_pytree_params():
    def fun(p):
        def f(q):
            return jnp.sum((q["a"] - 3.0) ** 2) + jnp.sum((q["b"] + 1.0) ** 4)
        return jax.value_and_grad(f)(p)

    p0 = {"a": jnp.zeros((3, 4)), "b": jnp.zeros(5)}
    res = minimize_vmlmb(fun, p0, maxiter=100, grtol=0.0, gatol=1e-10)
    np.testing.assert_allclose(np.asarray(res.x["a"]), 3.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.x["b"]), -1.0, atol=1e-2)


def test_vmlmb_bound_constrained_active_set():
    """min 0.5||x - c||^2 with x >= 0: solution is max(c, 0)."""
    c = jnp.asarray([-2.0, -0.5, 0.3, 1.7, -3.0, 4.0])

    def fun(x):
        return jax.value_and_grad(lambda z: 0.5 * jnp.sum((z - c) ** 2))(x)

    res = minimize_vmlmb(fun, jnp.ones(6), lower=0.0, maxiter=100, maxeval=300, grtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.x), np.maximum(np.asarray(c), 0.0), atol=1e-8)
    assert int(res.status) == VMLMBStatus.CONVERGED


def test_vmlmb_bounds_both_sides():
    c = jnp.asarray([-2.0, 0.5, 3.0])

    def fun(x):
        return jax.value_and_grad(lambda z: 0.5 * jnp.sum((z - c) ** 2))(x)

    res = minimize_vmlmb(fun, jnp.zeros(3), lower=0.0, upper=1.0, maxiter=60, grtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.x), [0.0, 0.5, 1.0], atol=1e-8)


def test_vmlmb_respects_maxiter_and_tracks_best():
    fun, _ = _quadratic(seed=3)
    res = minimize_vmlmb(fun, jnp.zeros(20), maxiter=3, maxeval=100, grtol=0.0)
    assert int(res.iterations) <= 3
    # best f must be the minimum of the recorded history
    hist = np.asarray(res.f_history)
    assert np.nanmin(hist) >= float(res.f) - 1e-12


def test_vmlmb_jittable():
    fun, x_star = _quadratic(seed=4)
    jitted = jax.jit(lambda x0: minimize_vmlmb(fun, x0, maxiter=150, maxeval=400, grtol=1e-10).x)
    np.testing.assert_allclose(np.asarray(jitted(jnp.zeros(20))), np.asarray(x_star), atol=1e-5)


def test_vmlmb_history_monotone_best():
    fun, _ = _quadratic(seed=5)
    res = minimize_vmlmb(fun, jnp.zeros(20), maxiter=50, grtol=1e-10)
    hist = np.asarray(res.f_history)
    valid = hist[~np.isnan(hist)]
    # L-BFGS with Wolfe line search strictly decreases f.
    assert np.all(np.diff(valid) <= 1e-12)


def test_vmlmb_matches_scipy_lbfgsb():
    """Cross-validate against an independent implementation: on smooth
    problems both solvers must reach the same minimum (values, not paths)."""
    import numpy as onp
    from scipy.optimize import minimize as sp_minimize

    fun, x_star = _quadratic(n=15, seed=7, kappa=30.0)

    def sp_fun(z):
        f, g = fun(jnp.asarray(z))
        return float(f), onp.asarray(g)

    sp = sp_minimize(sp_fun, onp.zeros(15), jac=True, method="L-BFGS-B",
                     options={"maxiter": 200, "gtol": 1e-10})
    ours = minimize_vmlmb(fun, jnp.zeros(15), maxiter=200, maxeval=500,
                          grtol=0.0, gatol=1e-8)
    np.testing.assert_allclose(np.asarray(ours.x), sp.x, atol=5e-5)
    assert abs(float(ours.f) - sp.fun) < 1e-8


def test_vmlmb_bounded_matches_scipy_lbfgsb():
    import numpy as onp
    from scipy.optimize import minimize as sp_minimize

    rng = np.random.default_rng(9)
    a = jnp.asarray(rng.standard_normal((12, 12)))
    a = a @ a.T + 12 * jnp.eye(12)
    b = jnp.asarray(rng.standard_normal(12)) * 5

    def fun(x):
        return jax.value_and_grad(lambda z: 0.5 * z @ a @ z - b @ z)(x)

    def sp_fun(z):
        f, g = fun(jnp.asarray(z))
        return float(f), onp.asarray(g)

    sp = sp_minimize(sp_fun, onp.zeros(12), jac=True, method="L-BFGS-B",
                     bounds=[(0.0, None)] * 12, options={"maxiter": 300, "gtol": 1e-12})
    ours = minimize_vmlmb(fun, jnp.zeros(12), lower=0.0, maxiter=300, maxeval=900,
                          grtol=0.0, gatol=1e-10)
    np.testing.assert_allclose(np.asarray(ours.x), sp.x, atol=1e-6)


def test_vmlmb_maxeval_best_over_all_evaluations():
    """The reference tracks best-x at every cost *evaluation* — including
    line-search trials that fail Wolfe — and stops when the eval budget is
    crossed mid-search (PSF_Estimation.java:208-216,243-254). Log every
    evaluation and assert (a) the returned f is the min over all of them and
    (b) the budget is never overshot."""
    from jax.experimental import io_callback

    logged = []

    def record(f):
        logged.append(float(f))
        return np.int32(0)

    def base(z):
        return jnp.sum(100.0 * (z[1:] - z[:-1] ** 2) ** 2 + (1.0 - z[:-1]) ** 2)

    def fun(x):
        f, g = jax.value_and_grad(base)(x)
        io_callback(record, jnp.int32(0), f, ordered=True)
        return f, g

    for maxeval in (3, 5, 8, 13):
        logged.clear()
        res = minimize_vmlmb(
            fun, jnp.asarray(np.full(6, -1.2)), maxiter=100, maxeval=maxeval, grtol=0.0
        )
        assert int(res.evaluations) <= maxeval
        assert int(res.evaluations) == len(logged)
        assert float(res.f) == pytest.approx(min(logged), abs=0.0)
        # and res.x actually evaluates to res.f
        f_at_x, _ = jax.value_and_grad(base)(res.x)
        assert float(f_at_x) == pytest.approx(float(res.f), rel=1e-12)


def test_vmlmb_bounded_maxeval_best_over_all_evaluations():
    from jax.experimental import io_callback

    logged = []

    def record(f):
        logged.append(float(f))
        return np.int32(0)

    c = jnp.asarray([-2.0, -0.5, 0.3, 1.7, -3.0, 4.0])

    def base(z):
        return 0.5 * jnp.sum((z - c) ** 2) + jnp.sum(z**4)

    def fun(x):
        f, g = jax.value_and_grad(base)(x)
        io_callback(record, jnp.int32(0), f, ordered=True)
        return f, g

    for maxeval in (2, 4, 7):
        logged.clear()
        res = minimize_vmlmb(
            fun, jnp.ones(6) * 2.0, lower=0.0, maxiter=100, maxeval=maxeval, grtol=0.0
        )
        assert int(res.evaluations) <= maxeval
        assert int(res.evaluations) == len(logged)
        assert float(res.f) == pytest.approx(min(logged), abs=0.0)


def test_vmlmb_bf16_memory_storage():
    """mem_dtype=bfloat16 stores the s/y history narrow but still converges
    to the same optimum on a well-conditioned problem (the direction loses
    ~3 digits, not correctness). Exercises both search paths."""
    c = jnp.asarray([1.0, -2.0, 0.5, 3.0], jnp.float32)

    def fun(x):
        return jax.value_and_grad(lambda z: 0.5 * jnp.sum((z - c) ** 2) + 0.1 * jnp.sum(z**4))(x)

    x0 = jnp.zeros(4, jnp.float32)
    ref = minimize_vmlmb(fun, x0, maxiter=50, maxeval=200, grtol=1e-8)
    narrow = minimize_vmlmb(fun, x0, maxiter=50, maxeval=200, grtol=1e-8,
                            mem_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(narrow.x), np.asarray(ref.x), atol=2e-3)
    assert float(narrow.f) == pytest.approx(float(ref.f), abs=1e-4)
    # bounded path too
    refb = minimize_vmlmb(fun, x0, lower=0.0, maxiter=50, maxeval=200, grtol=1e-8)
    nb = minimize_vmlmb(fun, x0, lower=0.0, maxiter=50, maxeval=200, grtol=1e-8,
                        mem_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(nb.x), np.asarray(refb.x), atol=2e-3)
    # the history buffers really are narrow (no silent upcast): re-derive via
    # the config plumb in the deconv job
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve

    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.random((4, 16, 16)), jnp.float32)
    psf = jnp.zeros((4, 16, 16), jnp.float32).at[0, 0, 0].set(1.0)
    cfg = DeconvolutionConfig(mu=0.001, epsilon=1.0, max_iter=5, mem_dtype="bfloat16")
    res = deconvolve(d, psf, config=cfg)
    assert np.isfinite(float(res.f))
