"""Independent forward oracle for the widefield PSF synthesis.

Everything in the ``_oracle_*`` functions below is a line-by-line plain-NumPy
transcription of the REFERENCE Java (the serial double-precision path), made
directly from ``/root/reference`` with **no package helpers** — so a shared
transcription error between ``microtipi_tpu.models.widefield`` /
``microtipi_tpu.ops.pupil`` and their tests cannot pass silently. The package
forward ``compute_psf`` must match this oracle to ~1e-12 relative on three
geometries: full basis + pupil shift, radial basis, and odd Nz (odd lateral
size too), exercising every branch of the z-fold and the index wraps.

Transcribed sources:

- ``Zernike.zernumeroNoll``            (``microUtils/Zernike.java:37-52``)
- ``Zernike.coeffRadialZCumSumLog``    (``microUtils/Zernike.java:70-90``)
- ``Zernike.zernikeArray``             (``microUtils/Zernike.java:119-288``)
- ``WideFieldModel.computeMaskPupil``  (``epifluorescence/WideFieldModel.java:1374-1406``)
- ``WideFieldModel.computeDefocus``    (``WideFieldModel.java:1452-1499``)
- ``WideFieldModel.setModulus``        (``WideFieldModel.java:1588-1610``)
- ``WideFieldModel.setPhase``          (``WideFieldModel.java:1625-1649``)
- ``WideFieldModel.computePsf`` serial double path (``WideFieldModel.java:351-393``)

Two semantics are NOT in the reference repo (TiPi is imported, not vendored)
and are therefore assumptions shared with the package, disclosed here:

- ``MathUtils.fftDist1D``/``fftAngle1D`` = wrapped FFT-grid radius/angle
  (distance ``sqrt(min(ix, Nx-ix)^2 + ...)``, angle ``atan2(ky, kx)`` on
  signed wrapped coordinates) — the only reading consistent with the mask
  and defocus wraps that ARE in the reference
  (``WideFieldModel.java:1385-1391,1460-1480``);
- ``MathUtils.gram_schmidt_orthonormalization`` = in-order Gram-Schmidt with
  L2 normalization (modified GS here; classical and modified agree to well
  under the test tolerance on this near-orthogonal basis).

Geometries are kept in the physical regime (``ni/lambda > NA/lambda + |pupil
shift|``: no evanescent pixel inside the geometric support) where the
package's always-fresh mask semantics coincide exactly with the reference's
set-time mask (the documented deliberate divergence, ``ops/pupil.py``).
"""

import jax.numpy as jnp
import numpy as np

from microtipi_tpu.models.widefield import WideFieldConfig

# ---------------------------------------------------------------------------
# Oracle: reference transcription (plain NumPy, no package helpers)
# ---------------------------------------------------------------------------


def _oracle_noll(j):
    # Zernike.java:37-52
    n1 = (np.sqrt(1 + 8 * j) - 1) / 2
    n = int(np.floor(n1))
    if n1 == n:
        n = n - 1
    k = (n + 1) * (n + 2) / 2
    m = int(n - 2 * np.floor((k - j) / 2))
    return n, m


def _oracle_radial_coeffs(n, m):
    # Zernike.java:70-90 (cumulative-log-factorial form)
    p = (n - m) // 2
    q = (n + m) // 2
    lfact = np.zeros(n + 1)
    for i in range(1, n + 1):
        lfact[i] = np.log(i)
    lfact = np.cumsum(lfact)
    r_mn = np.zeros(p + 1)
    for s in range(p + 1):
        r_mn[s] = np.exp(lfact[n - s] - lfact[s] - lfact[p - s] - lfact[q - s])
        if s % 2 == 1:
            r_mn[s] = -r_mn[s]
    return r_mn


def _oracle_zernike_array(nb, nx, ny, radius, radial):
    # Zernike.java:119-288 with normalize=true (NORMALIZED at
    # WideFieldModel.java:195). Arrays are (Ny, Nx) with x fastest — the
    # same memory order as the reference's flat `in = ix + Nx*iy`.
    ix = np.minimum(np.arange(nx), nx - np.arange(nx)).astype(np.float64)
    iy = np.minimum(np.arange(ny), ny - np.arange(ny)).astype(np.float64)
    r = np.sqrt(ix[None, :] ** 2 + iy[:, None] ** 2)  # MathUtils.fftDist1D
    sx = np.where(np.arange(nx) > nx // 2, np.arange(nx) - nx, np.arange(nx))
    sy = np.where(np.arange(ny) > ny // 2, np.arange(ny) - ny, np.arange(ny))
    theta = np.arctan2(sy[:, None].astype(np.float64),
                       sx[None, :].astype(np.float64))  # MathUtils.fftAngle1D
    inside = r < radius  # strict, Zernike.java:146

    z = np.zeros((nb, ny, nx))
    if radial:
        nmax = nb + 1  # Zernike.java:133
    else:
        nmax, _ = _oracle_noll(nb + 1)  # Zernike.java:135-137
    rp = np.zeros((nmax + 1, ny, nx))
    rp[0][inside] = 1.0  # r^0 only inside the pupil (Zernike.java:147-152)
    z[0][inside] = 1.0  # piston
    if nmax >= 1:
        rp[1][inside] = (r[inside] / radius)
    z[0] = z[0] / np.sqrt((z[0] ** 2).sum())  # Zernike.java:157-161
    for k in range(2, nmax + 1):
        rp[k] = rp[k - 1] * rp[1]  # Zernike.java:168-173,201-207

    for nz_ in range(1, nb):
        if radial:
            n, m = nz_, 0  # Zernike.java:176-178
        else:
            n, m = _oracle_noll(nz_ + 1)
        r_mn = _oracle_radial_coeffs(n, m)
        zr = np.zeros((ny, nx))
        for s in range((n - m) // 2, -1, -1):
            zr = zr + r_mn[s] * rp[n - 2 * s]
        if m == 0:
            mode = np.sqrt(n + 1) * zr
        elif (nz_ + 1) % 2 == 0:  # even Noll index -> cosine, Zernike.java:240
            mode = np.sqrt(2 * (n + 1)) * zr * np.cos(m * theta)
        else:  # odd Noll index -> sine, Zernike.java:262
            mode = np.sqrt(2 * (n + 1)) * zr * np.sin(m * theta)
        z[nz_] = mode / np.sqrt((mode ** 2).sum())
    return z


def _oracle_gram_schmidt(z):
    # MathUtils.gram_schmidt_orthonormalization (see module docstring for the
    # disclosed assumption), applied at WideFieldModel.java:196.
    k = z.shape[0]
    q = z.reshape(k, -1).astype(np.float64).copy()
    for i in range(k):
        for j in range(i):
            q[i] -= (q[j] @ q[i]) * q[j]
        q[i] /= np.linalg.norm(q[i])
    return q.reshape(z.shape)


def _oracle_mask_pupil(nx, ny, dxy, radius):
    # WideFieldModel.computeMaskPupil, WideFieldModel.java:1374-1406
    scale_x = (1 / dxy / nx) ** 2
    scale_y = (1 / dxy / ny) ** 2
    ix = np.minimum(np.arange(nx), nx - np.arange(nx)).astype(np.float64)
    iy = np.minimum(np.arange(ny), ny - np.arange(ny)).astype(np.float64)
    r2 = (ix ** 2 * scale_x)[None, :] + (iy ** 2 * scale_y)[:, None]
    return r2 < radius * radius  # strict


def _oracle_defocus(map_pupil, nx, ny, dxy, lambda_ni, delta_x, delta_y):
    # WideFieldModel.computeDefocus, WideFieldModel.java:1452-1499:
    # psi = sqrt(lambda_ni^2 - (kx-dx)^2 - (ky-dy)^2) on the geometric map;
    # q < 0 pixels are removed from maskPupil (evanescent cutoff).
    sx = np.where(np.arange(nx) > nx // 2, np.arange(nx) - nx, np.arange(nx))
    sy = np.where(np.arange(ny) > ny // 2, np.arange(ny) - ny, np.arange(ny))
    rx = (sx / (nx * dxy) - delta_x) ** 2
    ry = (sy / (ny * dxy) - delta_y) ** 2
    q = lambda_ni ** 2 - rx[None, :] - ry[:, None]
    keep = map_pupil & (q >= 0.0)
    psi = np.where(keep, np.sqrt(np.maximum(q, 0.0)), 0.0)
    return psi, keep


def _oracle_modulus(z, beta, mask):
    # WideFieldModel.setModulus, WideFieldModel.java:1588-1610:
    # rho = sum_n Z_n beta_n / ||beta||_2 on the pupil support.
    rho = np.zeros(mask.shape)
    beta_norm = 1.0 / np.linalg.norm(beta)
    for n in range(len(beta)):
        rho += np.where(mask, z[n] * beta[n] * beta_norm, 0.0)
    return rho


def _oracle_phase(z, alpha, mask, radial):
    # WideFieldModel.setPhase, WideFieldModel.java:1625-1649:
    # phi = sum_n Z_(n+1) alpha_n (radial) / Z_(n+3) alpha_n (full basis).
    off = 1 if radial else 3
    phi = np.zeros(mask.shape)
    for n in range(len(alpha)):
        phi += np.where(mask, z[n + off] * alpha[n], 0.0)
    return phi


def _oracle_compute_psf(rho, phi, psi, nz, dz):
    # WideFieldModel.computePsf serial double path, WideFieldModel.java:351-393.
    # numpy's fft2 is the same unnormalized forward transform as JTransforms'
    # complexForward; the reference applies PSFnorm = 1/(Nx*Ny*Nz) itself.
    ny, nx = rho.shape
    psf = np.zeros((nz, ny, nx))
    norm = 1.0 / (nx * ny * nz)
    for iz in range(nz):
        z = (iz - nz) if iz > nz // 2 else iz  # the z fold, :366-372
        defoc_scale = 2.0 * np.pi * z * dz
        phase_pupil = phi + defoc_scale * psi
        a = rho * np.cos(phase_pupil) + 1j * rho * np.sin(phase_pupil)
        a_hat = np.fft.fft2(a)
        psf[iz] = (a_hat.real ** 2 + a_hat.imag ** 2) * norm
    return psf


def _oracle_full(shape, na, wavelength, ni, dxy, dz, alpha, beta, shift, radial):
    """Constructor + setParam + computePsf flow of the reference."""
    nz, ny, nx = shape
    radius = na / wavelength  # WideFieldModel.java:165
    lambda_ni = ni / wavelength
    n_zern = max(len(alpha) + (1 if radial else 3), len(beta))
    z = _oracle_zernike_array(n_zern, nx, ny, radius * dxy * nx, radial)
    z = _oracle_gram_schmidt(z)  # WideFieldModel.java:194-197
    geo = _oracle_mask_pupil(nx, ny, dxy, radius)
    psi, mask = _oracle_defocus(geo, nx, ny, dxy, lambda_ni, shift[0], shift[1])
    rho = _oracle_modulus(z, beta, mask)
    phi = _oracle_phase(z, alpha, mask, radial)
    psf = _oracle_compute_psf(rho, phi, psi, nz, dz)
    return psf, rho, phi, psi, mask, z


# ---------------------------------------------------------------------------
# The comparisons
# ---------------------------------------------------------------------------

GEOMETRIES = {
    # full basis + pupil shift (the golden geometry)
    "full_shifted": dict(
        shape=(8, 32, 32), na=1.4, wavelength=561e-9, ni=1.518, dxy=80e-9,
        dz=200e-9, alpha=[0.3, -0.2, 0.1, 0.05, -0.15], beta=[1.0, 0.1, -0.05],
        shift=(1e4, -2e4), radial=False,
    ),
    # radial (m = 0) basis, no shift
    "radial": dict(
        shape=(6, 24, 24), na=1.2, wavelength=500e-9, ni=1.33, dxy=100e-9,
        dz=250e-9, alpha=[0.25, -0.12, 0.07, 0.02], beta=[1.0, -0.08],
        shift=(0.0, 0.0), radial=True,
    ),
    # odd Nz AND odd lateral size: exercises the other z-fold branch and the
    # odd-N index wraps (min(i, N-i) ties) end to end
    "odd": dict(
        shape=(9, 25, 25), na=1.3, wavelength=520e-9, ni=1.47, dxy=90e-9,
        dz=180e-9, alpha=[0.2, -0.1, 0.05, 0.08], beta=[1.0],
        shift=(5e3, 7e3), radial=False,
    ),
}


def _package_psf(g):
    cfg = WideFieldConfig(
        shape=g["shape"], na=g["na"], wavelength=g["wavelength"], ni=g["ni"],
        dxy=g["dxy"], dz=g["dz"], n_phase=len(g["alpha"]),
        n_modulus=len(g["beta"]), radial=g["radial"], dtype=jnp.float64,
    )
    p = cfg.init_params()._replace(
        phase=jnp.asarray(g["alpha"], jnp.float64),
        modulus=jnp.asarray(g["beta"], jnp.float64),
        defocus=jnp.asarray(
            [g["ni"] / g["wavelength"], g["shift"][0], g["shift"][1]], jnp.float64),
    )
    return cfg, p


def _check_geometry(name):
    g = GEOMETRIES[name]
    cfg, p = _package_psf(g)
    psf = np.asarray(cfg.compute_psf(p))
    o_psf, o_rho, o_phi, o_psi, o_mask, o_z = _oracle_full(
        g["shape"], g["na"], g["wavelength"], g["ni"], g["dxy"], g["dz"],
        np.asarray(g["alpha"]), np.asarray(g["beta"]), g["shift"], g["radial"],
    )
    # sanity: the physical-regime precondition that makes the reference's
    # set-time mask equal the package's always-fresh mask (module docstring)
    geo = _oracle_mask_pupil(g["shape"][2], g["shape"][1], g["dxy"],
                             g["na"] / g["wavelength"])
    assert (o_mask == geo).all(), "geometry leaves the physical regime"

    rho, phi, psi, mask = (np.asarray(a) for a in cfg.compute_pupil(p))
    np.testing.assert_array_equal(mask.astype(bool), o_mask)
    # basis (diagnostic: localizes a failure to the Zernike stage)
    z_pkg = cfg._static()[0]
    np.testing.assert_allclose(z_pkg, o_z, rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(rho, o_rho, rtol=1e-11, atol=1e-14)
    np.testing.assert_allclose(phi, o_phi, rtol=1e-11, atol=1e-13)
    # psi: compare on the support (the package leaves psi nonzero outside the
    # geometric mask where it is inert; the reference zeroes it)
    np.testing.assert_allclose(psi * mask, o_psi, rtol=1e-12, atol=1e-12)
    # the headline: forward PSF against the independent transcription
    np.testing.assert_allclose(psf, o_psf, rtol=1e-12, atol=o_psf.max() * 1e-13)


def test_forward_matches_reference_transcription_full_shifted():
    _check_geometry("full_shifted")


def test_forward_matches_reference_transcription_radial():
    _check_geometry("radial")


def test_forward_matches_reference_transcription_odd_sizes():
    _check_geometry("odd")


def test_oracle_psf_is_nontrivial():
    """Guard against a vacuously-passing oracle (all-zero PSF would match an
    all-zero bug): energy conservation — sum(psf) equals the pupil energy
    |A|^2 summed / (Nx*Ny*Nz) * Nz ... i.e. Parseval per plane."""
    g = GEOMETRIES["full_shifted"]
    o_psf, o_rho, *_ = _oracle_full(
        g["shape"], g["na"], g["wavelength"], g["ni"], g["dxy"], g["dz"],
        np.asarray(g["alpha"]), np.asarray(g["beta"]), g["shift"], g["radial"],
    )
    nz, ny, nx = g["shape"]
    assert o_psf.max() > 0
    # Parseval: sum |FFT2(A)|^2 = Nx*Ny * sum |A|^2; |A| = rho (unit phase)
    np.testing.assert_allclose(
        o_psf.sum(), nz * (nx * ny) * (o_rho ** 2).sum() / (nx * ny * nz),
        rtol=1e-12,
    )
