"""Zernike basis invariants (reference has no tests; these anchor to math —
SURVEY.md section 4)."""

import numpy as np
import pytest

from microtipi_tpu.ops.zernike import (
    noll_to_nm,
    orthonormalize,
    radial_coefficients,
    zernike_basis,
)
from microtipi_tpu.utils.grids import fft_dist, fft_index


def test_noll_indexing_table():
    # Standard Noll table: j -> (n, |m|).
    expected = {
        1: (0, 0), 2: (1, 1), 3: (1, 1), 4: (2, 0), 5: (2, 2), 6: (2, 2),
        7: (3, 1), 8: (3, 1), 9: (3, 3), 10: (3, 3), 11: (4, 0), 12: (4, 2),
        13: (4, 2), 14: (4, 4), 15: (4, 4),
    }
    for j, nm in expected.items():
        assert noll_to_nm(j) == nm


def test_radial_coefficients_known_polynomials():
    # R^0_2 = 2r^2 - 1 ; R^0_4 = 6r^4 - 6r^2 + 1 ; R^1_3 = 3r^3 - 2r.
    np.testing.assert_allclose(radial_coefficients(2, 0), [2.0, -1.0])
    np.testing.assert_allclose(radial_coefficients(4, 0), [6.0, -6.0, 1.0])
    np.testing.assert_allclose(radial_coefficients(3, 1), [3.0, -2.0])


def test_basis_normalization_and_support():
    z = zernike_basis(8, 64, 64, 20.0, normalize=True, radial=False)
    norms = np.sqrt((z**2).sum(axis=(1, 2)))
    np.testing.assert_allclose(norms, 1.0, rtol=1e-12)
    # Zero outside the pupil (wrapped FFT grid, strict < radius).
    outside = fft_dist(64, 64) >= 20.0
    assert np.abs(z[:, outside]).max() == 0.0


def test_radial_basis_is_azimuthally_symmetric():
    z = zernike_basis(5, 64, 64, 24.0, normalize=True, radial=True)
    # A radial mode must be a function of wrapped radius only: pixels at the
    # same wrapped radius carry the same value.
    r = fft_dist(64, 64)
    for k in range(5):
        vals = {}
        for iy in range(0, 64, 7):
            for ix in range(0, 64, 7):
                key = round(r[iy, ix], 9)
                v = z[k, iy, ix]
                if key in vals:
                    assert abs(vals[key] - v) < 1e-10
                vals[key] = v


def test_orthonormalization():
    z = zernike_basis(12, 96, 96, 30.0, normalize=True, radial=False)
    q = orthonormalize(z)
    gram = q.reshape(12, -1) @ q.reshape(12, -1).T
    np.testing.assert_allclose(gram, np.eye(12), atol=1e-10)
    # Orthonormalization must preserve the spanned subspace: each original
    # mode is representable in the new basis.
    coeffs = q.reshape(12, -1) @ z.reshape(12, -1).T
    recon = coeffs.T @ q.reshape(12, -1)
    np.testing.assert_allclose(recon, z.reshape(12, -1), atol=1e-10)


def test_fft_index_wrap_convention():
    # i > n/2 wraps negative; i == n/2 stays positive (reference convention,
    # WideFieldModel.java:232-239).
    np.testing.assert_array_equal(fft_index(6), [0, 1, 2, 3, -2, -1])
    np.testing.assert_array_equal(fft_index(5), [0, 1, 2, -2, -1])
