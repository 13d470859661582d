"""Frozen golden values: convention regressions that preserve invariants
(e.g. a silent Zernike reordering or mask flip) cannot slip past these.

Original keys generated 2026-08-16 from the float64 CPU path at a fixed
config (8x32x32, NA 1.4, 561 nm, ni 1.518, dxy 80 nm, dz 200 nm, 5 phase +
3 modulus modes, shifted defocus). The ``*_radial`` / ``*_odd`` keys were
added 2026-08-19 and are generated from the INDEPENDENT NumPy transcription
of the reference Java in ``tests/test_forward_oracle.py`` (not from the
package), covering the radial-basis path and the odd-Nz/odd-lateral z-fold
branch. Regenerate ONLY with a documented reason.
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


def _setup_named(name):
    """Configs matching tests/test_forward_oracle.py's GEOMETRIES."""
    if name == "radial":
        cfg = WideFieldConfig(
            shape=(6, 24, 24), na=1.2, wavelength=500e-9, ni=1.33,
            dxy=100e-9, dz=250e-9, n_phase=4, n_modulus=2, radial=True,
            dtype=jnp.float64,
        )
        p = cfg.init_params()._replace(
            phase=jnp.asarray([0.25, -0.12, 0.07, 0.02]),
            modulus=jnp.asarray([1.0, -0.08]),
        )
    else:  # odd Nz + odd lateral
        cfg = WideFieldConfig(
            shape=(9, 25, 25), na=1.3, wavelength=520e-9, ni=1.47,
            dxy=90e-9, dz=180e-9, n_phase=4, n_modulus=1, dtype=jnp.float64,
        )
        p = cfg.init_params()._replace(
            phase=jnp.asarray([0.2, -0.1, 0.05, 0.08]),
            defocus=jnp.asarray([1.47 / 520e-9, 5e3, 7e3]),
        )
    return cfg, p


def test_radial_psf_matches_oracle_golden():
    """Radial-basis branch pinned against oracle-generated values."""
    cfg, p = _setup_named("radial")
    with np.load(GOLDEN) as z:
        psf = np.asarray(cfg.compute_psf(p))
        np.testing.assert_allclose(psf, z["psf_radial"], rtol=1e-12,
                                   atol=float(z["psf_radial"].max()) * 1e-13)
        rho, phi, _, mask = (np.asarray(a) for a in cfg.compute_pupil(p))
        np.testing.assert_allclose(rho, z["rho_radial"], rtol=1e-11, atol=1e-14)
        np.testing.assert_allclose(phi, z["phi_radial"], rtol=1e-11, atol=1e-13)


def test_odd_sizes_psf_matches_oracle_golden():
    """Odd-Nz z-fold + odd-lateral wrap branch pinned against oracle values."""
    cfg, p = _setup_named("odd")
    with np.load(GOLDEN) as z:
        psf = np.asarray(cfg.compute_psf(p))
        np.testing.assert_allclose(psf, z["psf_odd"], rtol=1e-12,
                                   atol=float(z["psf_odd"].max()) * 1e-13)
        rho, phi, _, mask = (np.asarray(a) for a in cfg.compute_pupil(p))
        np.testing.assert_allclose(rho, z["rho_odd"], rtol=1e-11, atol=1e-14)
        np.testing.assert_allclose(phi, z["phi_odd"], rtol=1e-11, atol=1e-13)


def test_gradients_match_golden():
    cfg, p = _setup()
    g = jax.grad(lambda q: jnp.sum(cfg.compute_psf(q) ** 2))(p)
    with np.load(GOLDEN) as z:
        np.testing.assert_allclose(np.asarray(g.defocus), z["grad_defocus"], rtol=1e-10)
        np.testing.assert_allclose(np.asarray(g.phase), z["grad_phase"], rtol=1e-10)
        np.testing.assert_allclose(np.asarray(g.modulus), z["grad_modulus"], rtol=1e-10, atol=1e-22)
