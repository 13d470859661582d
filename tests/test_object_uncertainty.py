"""Pixelwise object uncertainty (jobs/uncertainty.py): Laplace + Hutchinson.

Oracle strategy (SURVEY.md §4 — invariants + independently computed
truths, since the reference has no tests and no uncertainty surface at
all): the estimator is checked against the DENSE Hessian of the very same
objective (``jax.hessian`` -> explicit inverse -> diagonal), at sizes
where that inverse is exact; scaling invariants (weights are inverse
variances) are pinned to the exact algebra; the active-set contract is
checked against the dense free-set restriction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
from microtipi_tpu.jobs.uncertainty import laplace_objective, object_uncertainty
from microtipi_tpu.utils.arrays import unroll


def _near_delta_psf(shape, key, width=0.8):
    """A compact, well-conditioned corner-origin kernel (delta + small blur):
    keeps H = H^T W H + mu TV'' diagonally dominant so the dense-inverse
    oracle is numerically clean and the Hutchinson noise floor is low."""
    zz, yy, xx = jnp.meshgrid(*(jnp.arange(n) for n in shape), indexing="ij")
    cz, cy, cx = (n // 2 for n in shape)
    r2 = (zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2
    g = jnp.exp(-r2 / (2 * width**2))
    g = g / jnp.sum(g)
    return unroll(0.5 * g + 0.5 * (r2 == 0))  # corner-origin


def _problem(key, shape=(3, 10, 10), noise=0.02, positivity=False, mu=0.05):
    k1, k2, k3 = jax.random.split(key, 3)
    psf = _near_delta_psf(shape, k1)
    truth = jax.random.uniform(k2, shape, jnp.float64, 0.2, 1.0)
    data = jnp.fft.irfftn(jnp.fft.rfftn(truth) * jnp.fft.rfftn(psf), s=shape)
    data = data + noise * jax.random.normal(k3, shape, jnp.float64)
    cfg = DeconvolutionConfig(
        mu=mu, epsilon=0.05, positivity=positivity, max_iter=120, grtol=0.0
    )
    x_hat = deconvolve(data, psf, config=cfg).x
    return data, psf, x_hat, cfg


def _dense_sigma(data, psf, x_hat, cfg, weights=None, free=None):
    """sqrt(diag(H^{-1})) from the explicitly materialized Hessian, with the
    same active-set restriction B = M H M + (I - M)."""
    obj = laplace_objective(psf, data, weights, cfg)
    n = x_hat.size
    h = jax.hessian(lambda v: obj(v.reshape(x_hat.shape)))(x_hat.ravel())
    h = np.asarray(h).reshape(n, n)
    if free is not None:
        m = np.asarray(free).ravel()
        h = m[:, None] * h * m[None, :] + np.diag(1.0 - m)
        d = np.sqrt(np.diag(np.linalg.inv(h)))
        return (m * d).reshape(x_hat.shape)
    return np.sqrt(np.diag(np.linalg.inv(h))).reshape(x_hat.shape)


def test_diag_inverse_matches_dense_hessian():
    data, psf, x_hat, cfg = _problem(jax.random.PRNGKey(0))
    est = object_uncertainty(
        data, psf, x_hat, config=cfg, n_probes=256, cg_tol=1e-10, cg_maxiter=400
    )
    assert float(est.residual) < 1e-6  # CG actually solved the systems
    exact = _dense_sigma(data, psf, x_hat, cfg)
    rel = np.abs(np.asarray(est.sigma) - exact) / exact
    assert np.median(rel) < 0.10
    assert rel.max() < 0.5  # single-voxel Hutchinson noise, 256 probes
    # Aggregate scale is much tighter than any single voxel.
    assert np.mean(np.asarray(est.var)) == pytest.approx(
        np.mean(exact**2), rel=0.05
    )


def test_active_set_pinned_voxels_read_zero():
    # A scene that drives a block of voxels onto the positivity bound: the
    # truth is 0 in half the volume and the noise pulls the ML value
    # negative there.
    key = jax.random.PRNGKey(1)
    shape = (2, 8, 8)
    psf = _near_delta_psf(shape, key)
    truth = jnp.zeros(shape, jnp.float64).at[:, :, 4:].set(1.0)
    data = jnp.fft.irfftn(jnp.fft.rfftn(truth) * jnp.fft.rfftn(psf), s=shape)
    data = data + 0.05 * jax.random.normal(key, shape, jnp.float64)
    cfg = DeconvolutionConfig(
        mu=0.02, epsilon=0.05, positivity=True, max_iter=200, grtol=0.0
    )
    x_hat = deconvolve(data, psf, config=cfg).x
    assert float(jnp.sum(x_hat == 0.0)) > 0  # the bound is actually active
    est = object_uncertainty(
        data, psf, x_hat, config=cfg, n_probes=128, cg_tol=1e-10, cg_maxiter=400
    )
    pinned = np.asarray(x_hat) == 0.0
    assert np.all(np.asarray(est.free)[pinned] == 0.0)
    assert np.all(np.asarray(est.sigma)[pinned] == 0.0)
    # Free-set values match the dense free-set-restricted inverse.
    exact = _dense_sigma(data, psf, x_hat, cfg, free=est.free)
    sel = ~pinned
    rel = np.abs(np.asarray(est.sigma)[sel] - exact[sel]) / exact[sel]
    assert np.median(rel) < 0.15


def test_weights_are_inverse_variances():
    # Doubling every weight halves the data-term Hessian's contribution;
    # with mu = 0 the whole Hessian doubles, so var halves EXACTLY and the
    # shared-probe estimates inherit the exact ratio (CG solved tightly).
    data, psf, x_hat, _ = _problem(jax.random.PRNGKey(2), mu=0.05)
    cfg = DeconvolutionConfig(mu=0.0, positivity=False)
    w = jnp.ones_like(data)
    kw = dict(config=cfg, n_probes=4, cg_tol=1e-12, cg_maxiter=400,
              key=jax.random.PRNGKey(7))
    a = object_uncertainty(data, psf, x_hat, weights=w, **kw)
    b = object_uncertainty(data, psf, x_hat, weights=2.0 * w, **kw)
    np.testing.assert_allclose(
        np.asarray(b.var), np.asarray(a.var) / 2.0, rtol=1e-6
    )


def test_poisson_data_term_dense_oracle():
    key = jax.random.PRNGKey(3)
    shape = (2, 8, 8)
    psf = _near_delta_psf(shape, key)
    truth = jax.random.uniform(key, shape, jnp.float64, 5.0, 50.0)
    lam = jnp.fft.irfftn(jnp.fft.rfftn(truth) * jnp.fft.rfftn(psf), s=shape)
    data = jax.random.poisson(key, lam + 2.0).astype(jnp.float64)
    cfg = DeconvolutionConfig(
        data_term="poisson", background=2.0, mu=0.01, epsilon=0.05,
        positivity=False, max_iter=200, grtol=0.0,
    )
    x_hat = deconvolve(data, psf, config=cfg).x
    est = object_uncertainty(
        data, psf, x_hat, config=cfg, n_probes=256, cg_tol=1e-10, cg_maxiter=500
    )
    exact = _dense_sigma(data, psf, x_hat, cfg)
    rel = np.abs(np.asarray(est.sigma) - exact) / exact
    assert np.median(rel) < 0.12
    assert float(est.residual) < 1e-6


def test_jit_matches_eager():
    data, psf, x_hat, cfg = _problem(jax.random.PRNGKey(4))
    kw = dict(config=cfg, n_probes=4, cg_tol=1e-8, cg_maxiter=200)
    eager = object_uncertainty(data, psf, x_hat, **kw)
    jitted = jax.jit(lambda d, p, x: object_uncertainty(d, p, x, **kw))(
        data, psf, x_hat
    )
    np.testing.assert_allclose(
        np.asarray(jitted.sigma), np.asarray(eager.sigma), rtol=1e-10, atol=0
    )


@pytest.mark.parametrize(
    "data_term,weighted,extras",
    [
        ("gaussian", False, {}),                       # QuadraticConvCost fast path
        ("gaussian", True, {}),                        # WeightedConvolutionCost path
        ("gaussian", False, dict(sparsity=0.03, hessian=0.02)),
        ("gaussian", True, dict(sparsity=0.03, hessian=0.02)),
        ("poisson", False, {}),
        ("poisson", False, dict(sparsity=0.03, hessian=0.02)),
    ],
)
def test_laplace_objective_matches_solver_objective(data_term, weighted, extras):
    """laplace_objective must equal the objective the solver minimized
    (jobs.deconv.make_objective) in VALUE and GRADIENT — otherwise sigma
    measures the curvature of a different function than the MAP point's.
    Guards the two objective builders against silent divergence (e.g. a
    prior added to make_regularizer but not regularization_cost)."""
    from microtipi_tpu.jobs.deconv import make_objective

    key = jax.random.PRNGKey(11)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    shape = (3, 8, 8)
    psf = _near_delta_psf(shape, k1)
    data = jax.random.uniform(k2, shape, jnp.float64, 0.5, 2.0)
    w = (
        jax.random.uniform(k3, shape, jnp.float64, 0.5, 4.0) if weighted else None
    )
    cfg = DeconvolutionConfig(
        mu=0.05, epsilon=0.05, data_term=data_term,
        background=0.3 if data_term == "poisson" else 0.0,
        fused_tv=False, **extras,
    )
    solver_fg = make_objective(psf, data, w, cfg)
    lap = laplace_objective(psf, data, w, cfg)
    lap_fg = jax.value_and_grad(lap)
    for i in range(3):
        x = jax.random.uniform(jax.random.fold_in(k4, i), shape, jnp.float64, 0.1, 1.5)
        f_s, g_s = solver_fg(x)
        f_l, g_l = lap_fg(x)
        np.testing.assert_allclose(float(f_l), float(f_s), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(g_l), np.asarray(g_s), rtol=1e-8, atol=1e-12)


def test_preconditioned_cg_converges_much_faster():
    """The circulant preconditioner must (a) leave the converged result
    unchanged and (b) reach a far smaller residual at a tight iteration
    budget than plain CG — the Hessian is near-circulant, so M^-1 captures
    most of its spectrum."""
    data, psf, x_hat, cfg = _problem(jax.random.PRNGKey(21), positivity=True)
    kw = dict(config=cfg, n_probes=4, cg_tol=1e-12, key=jax.random.PRNGKey(3))
    full_p = object_uncertainty(data, psf, x_hat, cg_maxiter=400,
                                precondition=True, **kw)
    full_n = object_uncertainty(data, psf, x_hat, cg_maxiter=400,
                                precondition=False, **kw)
    np.testing.assert_allclose(np.asarray(full_p.sigma),
                               np.asarray(full_n.sigma), rtol=1e-6, atol=1e-10)

    tight_p = object_uncertainty(data, psf, x_hat, cg_maxiter=5,
                                 precondition=True, **kw)
    tight_n = object_uncertainty(data, psf, x_hat, cg_maxiter=5,
                                 precondition=False, **kw)
    assert float(tight_p.residual) < 0.5 * float(tight_n.residual), (
        float(tight_p.residual), float(tight_n.residual))


def test_preconditioned_poisson_and_weighted_paths():
    """Preconditioning with the Poisson curvature estimate and per-voxel
    weights must match the unpreconditioned converged answer."""
    key = jax.random.PRNGKey(22)
    data, psf, x_hat, cfg = _problem(key, positivity=False)
    w = jax.random.uniform(key, data.shape, jnp.float64, 0.5, 2.0)
    a = object_uncertainty(data, psf, x_hat, weights=w, config=cfg,
                           n_probes=4, cg_tol=1e-12, cg_maxiter=400,
                           precondition=True, key=jax.random.PRNGKey(5))
    b = object_uncertainty(data, psf, x_hat, weights=w, config=cfg,
                           n_probes=4, cg_tol=1e-12, cg_maxiter=400,
                           precondition=False, key=jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(a.sigma), np.asarray(b.sigma),
                               rtol=1e-6, atol=1e-10)

    shape = (2, 8, 8)
    psf2 = _near_delta_psf(shape, key)
    truth = jax.random.uniform(key, shape, jnp.float64, 5.0, 50.0)
    lam = jnp.fft.irfftn(jnp.fft.rfftn(truth) * jnp.fft.rfftn(psf2), s=shape,
                         axes=(0, 1, 2))
    pdata = jax.random.poisson(key, lam + 2.0).astype(jnp.float64)
    pcfg = DeconvolutionConfig(data_term="poisson", background=2.0, mu=0.01,
                               epsilon=0.05, positivity=False, max_iter=200,
                               grtol=0.0)
    px = deconvolve(pdata, psf2, config=pcfg).x
    pa = object_uncertainty(pdata, psf2, px, config=pcfg, n_probes=4,
                            cg_tol=1e-12, cg_maxiter=500, precondition=True,
                            key=jax.random.PRNGKey(6))
    pb = object_uncertainty(pdata, psf2, px, config=pcfg, n_probes=4,
                            cg_tol=1e-12, cg_maxiter=500, precondition=False,
                            key=jax.random.PRNGKey(6))
    np.testing.assert_allclose(np.asarray(pa.sigma), np.asarray(pb.sigma),
                               rtol=1e-6, atol=1e-10)
