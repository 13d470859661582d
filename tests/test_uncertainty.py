"""Gauss-Newton/Laplace error bars for PSF fits (jobs/psf_fit.py).

Beyond-parity observability (the reference exposes only cost/iteration
counters, ``PSF_Estimation.java:364-381``): ``fit_uncertainty`` /
``bead_fit_uncertainty`` report per-coefficient 1-sigma intervals. Validated
the only way error bars can be: against the Monte-Carlo scatter of repeated
fits over independent noise draws.
"""

import jax
import jax.numpy as jnp
import numpy as np

from microtipi_tpu.jobs.psf_fit import (
    PsfFitConfig,
    bead_fit_uncertainty,
    fit_psf,
    fit_psf_beads,
    fit_uncertainty,
)
from microtipi_tpu.models.microscope import DEFOCUS, PHASE, SHEET
from microtipi_tpu.models.widefield import WideFieldConfig
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

SHAPE = (12, 32, 32)
KW = dict(na=1.2, wavelength=500e-9, ni=1.33, dxy=100e-9, dz=250e-9)


def _scene(sigma, n_draws, seed=0):
    model = WideFieldConfig(shape=SHAPE, n_phase=2, radial=True,
                            dtype=jnp.float64, **KW)
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.15]))
    rng = np.random.default_rng(seed)
    obj = np.zeros(SHAPE)
    obj[3:9, 8:24, 8:24] = 50.0
    obj[6:10, 20:28, 4:12] = 80.0
    obj = jnp.asarray(obj)
    clean = convolve(obj, convolve_spectrum(model.compute_psf(true)), SHAPE)
    noises = [jnp.asarray(rng.standard_normal(SHAPE)) for _ in range(n_draws)]
    return model, true, obj, clean, noises


def test_fit_uncertainty_matches_monte_carlo():
    """Predicted per-coefficient sigma must match the empirical scatter of
    repeated fits over independent noise draws (the operational meaning of
    an error bar), and the residual-MLE sigma must recover the injected
    noise level."""
    sigma = 0.05
    model, true, obj, clean, noises = _scene(sigma, n_draws=14)
    cfg = PsfFitConfig(max_iter=30, grtol=0.0)

    fit = jax.jit(lambda d: fit_psf(model, true, PHASE, d, obj, config=cfg))
    fits = np.stack([
        np.asarray(fit(clean + sigma * n).params.phase) for n in noises
    ])
    empirical = fits.std(axis=0, ddof=1)

    unc = jax.jit(
        lambda d, p: fit_uncertainty(model, p, PHASE, d, obj)
    )(clean + sigma * noises[0], jax.tree.map(jnp.asarray, fit(clean + sigma * noises[0]).params))
    predicted = np.asarray(unc.std)

    # 14 draws put ~20% sampling error on the empirical std; factor-2 bounds
    # catch any structural error (wrong Jacobian, missing dof, bad scaling).
    assert predicted.shape == empirical.shape == (2,)
    np.testing.assert_array_less(predicted, 2.0 * empirical)
    np.testing.assert_array_less(0.5 * empirical, predicted)
    assert abs(float(unc.sigma) - sigma) < 0.2 * sigma


def test_fit_uncertainty_weighted_consistent_with_sigma():
    """Per-voxel inverse-variance weights (w = 1/sigma^2) must give the same
    covariance as the unweighted path told sigma explicitly."""
    sigma = 0.04
    model, true, obj, clean, noises = _scene(sigma, n_draws=1, seed=3)
    d = clean + sigma * noises[0]
    u_sigma = fit_uncertainty(model, true, PHASE, d, obj, sigma=sigma)
    w = jnp.full(SHAPE, 1.0 / sigma**2)
    u_w = fit_uncertainty(model, true, PHASE, d, obj, weights=w)
    np.testing.assert_allclose(np.asarray(u_w.cov), np.asarray(u_sigma.cov),
                               rtol=1e-10)
    assert float(u_w.sigma) == 1.0  # weights already carry the noise model


def test_bead_fit_uncertainty_monte_carlo():
    """Bead-calibration error bars: the profiled (amp, background) nuisances
    are marginalized, and the predicted sheet-geometry sigmas match the
    Monte-Carlo scatter of fit_psf_beads over noise draws."""
    from microtipi_tpu.models.lightsheet import LightSheetConfig

    shape = (12, 24, 24)
    model = LightSheetConfig(shape=shape, n_phase=2, radial=True,
                             sheet_na=0.15, wavelength_exc=488e-9,
                             dtype=jnp.float64, **KW)
    true = model.init_params()._replace(
        sheet=jnp.asarray([0.1e-6, 1.2 * model.waist]))
    bead_clean = 2e3 * model.compute_psf(true)
    sigma = 0.05
    rng = np.random.default_rng(1)
    draws = [bead_clean + sigma * jnp.asarray(rng.standard_normal(shape))
             for _ in range(12)]

    cfg = PsfFitConfig(max_iter=30, grtol=0.0)
    fit = jax.jit(lambda d: fit_psf_beads(
        model, d, families=(DEFOCUS, SHEET), config=cfg, subvoxel=False)[0])
    fits = np.stack([np.asarray(fit(d).params.sheet) for d in draws])
    empirical = fits.std(axis=0, ddof=1)

    unc = jax.jit(lambda d, p: bead_fit_uncertainty(
        model, p, (DEFOCUS, SHEET), d, subvoxel=False)
    )(draws[0], jax.tree.map(jnp.asarray, fit(draws[0]).params))
    predicted = np.asarray(unc.std["sheet"])

    np.testing.assert_array_less(predicted, 2.5 * empirical)
    np.testing.assert_array_less(0.4 * empirical, predicted)
    # nuisance entries come back as scalars, positive and finite
    for key in ("amp", "background"):
        v = float(unc.std[key])
        assert np.isfinite(v) and v > 0
    assert abs(float(unc.sigma) - sigma) < 0.25 * sigma
