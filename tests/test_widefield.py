"""Widefield PSF model invariants + autodiff-vs-analytic Jacobian oracles.

The analytic adjoints below re-derive the reference's hand-written
``apply_J_phase`` integrand (``WideFieldModel.java:738-1021``) as a test
oracle for ``jax.grad`` through the forward synthesis (SURVEY.md section 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.models.widefield import WideFieldConfig

CFG = dict(na=1.4, wavelength=561e-9, ni=1.518, dxy=80e-9, dz=160e-9)


def make_cfg(shape=(8, 32, 32), n_phase=5, n_modulus=3, radial=False):
    return WideFieldConfig(
        shape=shape, n_phase=n_phase, n_modulus=n_modulus, radial=radial,
        dtype=jnp.float64, **CFG,
    )


def test_psf_energy_parseval():
    """sum(psf) == sum(rho^2): |FFT|^2 summed = N * |A|^2 summed (Parseval),
    and the PSFnorm 1/(Nx*Ny*Nz) folds it back (WideFieldModel.java:213)."""
    cfg = make_cfg()
    p = cfg.init_params()
    psf = cfg.compute_psf(p)
    rho, phi, psi, mask = cfg.compute_pupil(p)
    np.testing.assert_allclose(float(psf.sum()), float((rho**2).sum()), rtol=1e-12)


def test_psf_positive_and_shape():
    cfg = make_cfg()
    psf = cfg.compute_psf(cfg.init_params())
    assert psf.shape == (8, 32, 32)
    assert float(psf.min()) >= 0.0


def test_in_focus_plane_is_brightest_at_origin():
    """Unaberrated pupil, z=0 plane: PSF peaks at the corner origin (FFT
    layout) and the z=0 plane has the brightest peak."""
    cfg = make_cfg(n_phase=0)
    psf = np.asarray(cfg.compute_psf(cfg.init_params()))
    assert psf[0].argmax() == 0
    assert psf.max(axis=(1, 2)).argmax() == 0


def test_axial_symmetry_unaberrated():
    """With no phase aberration the PSF is symmetric in +z/-z: plane iz and
    plane Nz-iz match (defocus phase flips sign, modulus even)."""
    cfg = make_cfg(n_phase=0)
    psf = np.asarray(cfg.compute_psf(cfg.init_params()))
    for iz in range(1, 4):
        np.testing.assert_allclose(psf[iz], psf[8 - iz], rtol=1e-8, atol=1e-18)


def test_radial_psf_xy_symmetry():
    cfg = make_cfg(n_phase=3, radial=True)
    p = cfg.init_params()
    p = p._replace(phase=jnp.array([0.3, -0.2, 0.1], jnp.float64))
    psf = np.asarray(cfg.compute_psf(p))
    # Radial pupil -> PSF invariant under x<->y swap and axis flips.
    np.testing.assert_allclose(psf, psf.transpose(0, 2, 1), atol=1e-16)
    np.testing.assert_allclose(psf, np.roll(psf[:, ::-1, :], 1, axis=1), atol=1e-16)


def test_modulus_scale_invariance():
    """rho uses beta/||beta||: scaling beta leaves the PSF unchanged
    (WideFieldModel.java:1595-1606)."""
    cfg = make_cfg()
    p = cfg.init_params()
    p = p._replace(modulus=jnp.array([1.0, 0.2, -0.1]))
    psf1 = cfg.compute_psf(p)
    psf2 = cfg.compute_psf(p._replace(modulus=3.7 * p.modulus))
    np.testing.assert_allclose(np.asarray(psf1), np.asarray(psf2), rtol=1e-12)


def _loss(cfg, q):
    def f(params):
        return jnp.vdot(q, cfg.compute_psf(params))
    return f


def test_jacobians_match_finite_differences():
    cfg = make_cfg()
    p = cfg.init_params()
    p = p._replace(
        phase=jnp.array([0.1, -0.05, 0.2, 0.02, -0.15]),
        modulus=jnp.array([1.0, 0.1, -0.2]),
    )
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal(cfg.shape))
    f = _loss(cfg, q)
    g = jax.grad(f)(p)

    eps = 1e-6
    for fam in ("defocus", "phase", "modulus"):
        v = getattr(p, fam)
        gfam = np.asarray(getattr(g, fam))
        for k in range(v.shape[0]):
            scale = max(1.0, abs(float(v[k])))
            h = eps * scale
            vp = v.at[k].add(h)
            vm = v.at[k].add(-h)
            fd = (f(p._replace(**{fam: vp})) - f(p._replace(**{fam: vm}))) / (2 * h)
            np.testing.assert_allclose(
                gfam[k], float(fd), rtol=2e-5, atol=1e-10 * max(1.0, abs(float(fd))),
                err_msg=f"{fam}[{k}]",
            )


def test_phase_jacobian_matches_analytic_adjoint():
    """Analytic oracle for the phase family: the reference integrand is
    -2*PSFNorm * rho * (Re(Aq_hat) sin(ph) + Im(Aq_hat) cos(ph)) projected on
    the offset Zernike modes (WideFieldModel.java:797-1016), with
    Aq = conj(FFT(A)) * q transformed per plane."""
    cfg = make_cfg()
    p = cfg.init_params()._replace(
        phase=jnp.array([0.1, -0.05, 0.2, 0.02, -0.15]),
        modulus=jnp.array([1.0, 0.1, -0.2]),
    )
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal(cfg.shape))

    g_auto = jax.grad(_loss(cfg, q))(p).phase

    # Analytic: dh/dphi_pix summed over z, projected onto the phase modes.
    nz, ny, nx = cfg.shape
    rho, phi, psi, mask = cfg.compute_pupil(p)
    zern, _, zw = cfg._static()
    norm = 1.0 / (nx * ny * nz)
    defoc = 2 * np.pi * cfg.dz * np.asarray(zw)
    j_img = np.zeros((ny, nx))
    a = np.asarray(cfg.compute_pupil_field(p))
    for iz in range(nz):
        a_hat = np.fft.fft2(a[iz])
        aq = np.fft.fft2(np.conj(a_hat) * np.asarray(q)[iz])
        ph = np.asarray(phi) + defoc[iz] * np.asarray(psi)
        j_img += -2 * norm * np.asarray(rho) * (aq.real * np.sin(ph) + aq.imag * np.cos(ph))
    offset = cfg.phase_offset
    z_np = np.asarray(zern)
    g_analytic = np.array(
        [(j_img * z_np[offset + k] * np.asarray(mask)).sum() for k in range(cfg.n_phase)]
    )
    np.testing.assert_allclose(np.asarray(g_auto), g_analytic, rtol=1e-8, atol=1e-20)


def test_modulus_jacobian_exact_projection_vs_reference_diagonal():
    """The modulus gradient through rho = Z beta/||beta||.

    Exact chain rule: d rho/d beta_k = (Z_k - rho * beta_k/||beta||) / ||beta||.
    The reference's hand-written adjoint keeps only the diagonal term
    Z_k (1 - (beta_k/||beta||)^2) / ||beta|| (WideFieldModel.java:487-491) —
    an approximation. jax.grad must equal the exact form everywhere, and the
    two coincide at the canonical init beta = [1, 0, ..., 0]."""
    cfg = make_cfg(n_phase=0, n_modulus=3)
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal(cfg.shape))
    f = _loss(cfg, q)

    def analytic_exact(params):
        rho, phi, psi, mask = cfg.compute_pupil(params)
        zern, _, zw = cfg._static()
        nz, ny, nx = cfg.shape
        norm = 1.0 / (nx * ny * nz)
        defoc = 2 * np.pi * cfg.dz * np.asarray(zw)
        a = np.asarray(cfg.compute_pupil_field(params))
        j_img = np.zeros((ny, nx))
        for iz in range(nz):
            a_hat = np.fft.fft2(a[iz])
            aq = np.fft.fft2(np.conj(a_hat) * np.asarray(q)[iz])
            ph = np.asarray(phi) + defoc[iz] * np.asarray(psi)
            # dL/drho(pix) = 2*norm*(Re(aq) cos(ph) - Im(aq) sin(ph))
            j_img += 2 * norm * (aq.real * np.cos(ph) - aq.imag * np.sin(ph))
        beta = np.asarray(params.modulus)
        nb = np.linalg.norm(beta)
        z_np = np.asarray(zern) * np.asarray(mask)
        g = np.zeros(beta.shape)
        rho_np = np.asarray(rho)
        for k in range(beta.shape[0]):
            drho = (z_np[k] - rho_np * (beta[k] / nb)) / nb
            g[k] = (j_img * drho).sum()
        return g

    # Generic beta: jax.grad == exact projection.
    p = cfg.init_params()._replace(modulus=jnp.asarray([1.0, 0.4, -0.3]))
    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(p).modulus), analytic_exact(p), rtol=1e-8
    )

    # Canonical init beta = [1, 0, 0]: exact == the reference's diagonal form.
    p0 = cfg.init_params()
    g_auto = np.asarray(jax.grad(f)(p0).modulus)
    rho, phi, psi, mask = cfg.compute_pupil(p0)
    zern, _, zw = cfg._static()
    nz, ny, nx = cfg.shape
    norm = 1.0 / (nx * ny * nz)
    a = np.asarray(cfg.compute_pupil_field(p0))
    j_img = np.zeros((ny, nx))
    for iz in range(nz):
        a_hat = np.fft.fft2(a[iz])
        aq = np.fft.fft2(np.conj(a_hat) * np.asarray(q)[iz])
        ph = np.asarray(phi) + 2 * np.pi * cfg.dz * np.asarray(zw)[iz] * np.asarray(psi)
        j_img += aq.real * np.cos(ph) - aq.imag * np.sin(ph)
    beta = np.asarray(p0.modulus)
    nb = np.linalg.norm(beta)
    z_np = np.asarray(zern) * np.asarray(mask)
    g_ref_diag = np.array(
        [2 * norm * (j_img * z_np[k]).sum() * (1 - (beta[k] / nb) ** 2) / nb
         for k in range(3)]
    )
    np.testing.assert_allclose(g_auto, g_ref_diag, rtol=1e-8, atol=1e-20)


def test_defocus_jacobian_matches_analytic_adjoint():
    """Analytic oracle for the defocus family (WideFieldModel.java:1029-1369):
    per plane, tmpvar = -2*PSFNorm*rho*(Re(aq) sin(ph) + Im(aq) cos(ph)) and

        dL/d(ni/l) += tmpvar * defoc_scale_z * (ni/l)/psi
        dL/d(dx)   += tmpvar * defoc_scale_z * (kx-dx)/psi   (same for dy;
        the reference's -= at :1109-1116 pairs with its own rx convention)

    on the non-evanescent support (the mask is constant w.r.t. the
    parameters — stop_gradient semantics)."""
    cfg = make_cfg(n_phase=4, n_modulus=1)
    p = cfg.init_params()._replace(
        phase=jnp.array([0.1, -0.05, 0.2, 0.02]),
        defocus=jnp.array([cfg.ni / cfg.wavelength, 2e4, -1e4]),
    )
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal(cfg.shape))
    g_auto = np.asarray(jax.grad(_loss(cfg, q))(p).defocus)

    from microtipi_tpu.utils.grids import fft_index

    nz, ny, nx = cfg.shape
    rho, phi, psi, mask = (np.asarray(v) for v in cfg.compute_pupil(p))
    _, _, zw = cfg._static()
    norm = 1.0 / (nx * ny * nz)
    a = np.asarray(cfg.compute_pupil_field(p))
    lambda_ni, dx, dy = (float(v) for v in p.defocus)
    kx = fft_index(nx) / (nx * cfg.dxy)
    ky = fft_index(ny) / (ny * cfg.dxy)
    rx = kx[None, :] - dx
    ry = ky[:, None] - dy
    on = mask > 0
    safe_psi = np.where(on, psi, 1.0)

    g = np.zeros(3)
    for iz in range(nz):
        a_hat = np.fft.fft2(a[iz])
        aq = np.fft.fft2(np.conj(a_hat) * np.asarray(q)[iz])
        defoc = 2 * np.pi * cfg.dz * float(np.asarray(zw)[iz])
        ph = phi + defoc * psi
        tmp = -2 * norm * rho * (aq.real * np.sin(ph) + aq.imag * np.cos(ph))
        tmp = np.where(on, tmp, 0.0)
        g[0] += (tmp * defoc * lambda_ni / safe_psi).sum()
        g[1] += (tmp * defoc * rx / safe_psi).sum()
        g[2] += (tmp * defoc * ry / safe_psi).sum()

    np.testing.assert_allclose(g_auto, g, rtol=1e-8)
