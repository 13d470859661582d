"""Frozen golden values: convention regressions that preserve invariants
(e.g. a silent Zernike reordering or mask flip) cannot slip past these.

Golden file generated 2026-08-16 from the float64 CPU path at a fixed config
(8x32x32, NA 1.4, 561 nm, ni 1.518, dxy 80 nm, dz 200 nm, 5 phase + 3 modulus
modes, shifted defocus) — regenerate ONLY with a documented reason.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from microtipi_tpu.models.widefield import WideFieldConfig

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_widefield.npz")


def _setup():
    cfg = WideFieldConfig(
        shape=(8, 32, 32), na=1.4, wavelength=561e-9, ni=1.518,
        dxy=80e-9, dz=200e-9, n_phase=5, n_modulus=3, dtype=jnp.float64,
    )
    p = cfg.init_params()._replace(
        phase=jnp.asarray([0.3, -0.2, 0.1, 0.05, -0.15]),
        modulus=jnp.asarray([1.0, 0.1, -0.05]),
        defocus=jnp.asarray([1.518 / 561e-9, 1e4, -2e4]),
    )
    return cfg, p


def test_psf_and_pupil_match_golden():
    cfg, p = _setup()
    with np.load(GOLDEN) as z:
        np.testing.assert_allclose(np.asarray(cfg.compute_psf(p)), z["psf"], rtol=1e-12, atol=1e-20)
        rho, phi, psi, mask = (np.asarray(a) for a in cfg.compute_pupil(p))
        np.testing.assert_allclose(rho, z["rho"], rtol=1e-12, atol=1e-20)
        np.testing.assert_allclose(phi, z["phi"], rtol=1e-12, atol=1e-20)
        np.testing.assert_allclose(psi, z["psi"], rtol=1e-12, atol=1e-12)
        np.testing.assert_array_equal(mask, z["mask"])


def test_gradients_match_golden():
    cfg, p = _setup()
    g = jax.grad(lambda q: jnp.sum(cfg.compute_psf(q) ** 2))(p)
    with np.load(GOLDEN) as z:
        np.testing.assert_allclose(np.asarray(g.defocus), z["grad_defocus"], rtol=1e-10)
        np.testing.assert_allclose(np.asarray(g.phase), z["grad_phase"], rtol=1e-10)
        np.testing.assert_allclose(np.asarray(g.modulus), z["grad_modulus"], rtol=1e-10, atol=1e-22)
