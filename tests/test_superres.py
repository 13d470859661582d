"""Finer-grid deconvolution (jobs/superres.py).

Beyond parity — the reference reconstructs on the acquisition grid.
Anchors: measured sub-pixel localization (0.21 vs 0.71 fine pixels), exact
off-lattice two-point recovery at 1.5 camera pixels separation, operator
adjoint consistency, and flux conservation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
from microtipi_tpu.jobs.superres import (
    bin_volume,
    deconvolve_superres,
    upsample_volume,
)
from microtipi_tpu.models.widefield import WideFieldConfig
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

COARSE = (8, 32, 32)
F = (1, 2, 2)
FINE = (8, 64, 64)


def _models():
    kw = dict(na=1.2, wavelength=500e-9, ni=1.33, dz=300e-9, dtype=jnp.float64)
    m_fine = WideFieldConfig(shape=FINE, dxy=100e-9, **kw)
    m_coarse = WideFieldConfig(shape=COARSE, dxy=200e-9, **kw)
    return m_fine.compute_psf(m_fine.init_params()), \
        m_coarse.compute_psf(m_coarse.init_params())


def test_bin_upsample_adjointish():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(FINE))
    d = jnp.asarray(rng.random(COARSE))
    # bin(upsample(d)) == d exactly (flux split evenly)
    np.testing.assert_allclose(np.asarray(bin_volume(upsample_volume(d, F), F)),
                               np.asarray(d), rtol=1e-12)
    # <bin(x), d> == <x, broadcast(d)>: the true adjoint is replication
    lhs = float(jnp.vdot(bin_volume(x, F), d))
    rhs = float(jnp.vdot(x, upsample_volume(d, F) * (F[0] * F[1] * F[2])))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_superres_localizes_off_lattice_beads():
    """Measured: mean bead localization 0.21 fine pixels vs 0.71 for the
    coarse-grid solve on an undersampled camera (200 nm pixels at
    NA 1.2 / 500 nm — Nyquist is ~104 nm)."""
    psf_fine, psf_coarse = _models()
    rng = np.random.default_rng(0)
    obj_f = np.zeros(FINE)
    truth = [(3, 21, 33), (5, 42, 19), (4, 27, 44), (2, 37, 37)]
    for z, y, x in truth:
        obj_f[z, y, x] = 200.0
    data = bin_volume(convolve(jnp.asarray(obj_f),
                               convolve_spectrum(psf_fine), FINE), F)
    data = data + 0.01 * float(jnp.max(data)) * jnp.asarray(
        rng.standard_normal(COARSE))

    cfg = DeconvolutionConfig(mu=0.01, epsilon=0.5, max_iter=80, grtol=1e-10)
    res = jax.jit(lambda d, p: deconvolve_superres(
        d, p, factor=F, config=cfg))(data, psf_fine)
    assert res.x.shape == FINE
    x = np.asarray(res.x)
    # flux conserved within 20%
    assert abs(x.sum() - obj_f.sum()) < 0.2 * obj_f.sum()

    def centroid_err(vol, y, xx, scale):
        # local centroid in FINE units around the true position
        yc, xc = y // scale, xx // scale
        win = np.asarray(vol).sum(axis=0)[yc - 2:yc + 3, xc - 2:xc + 3]
        gy, gx = np.meshgrid(np.arange(win.shape[0]), np.arange(win.shape[1]),
                             indexing="ij")
        cy = (yc - 2) + (gy * win).sum() / win.sum()
        cx = (xc - 2) + (gx * win).sum() / win.sum()
        return np.hypot(scale * cy - y, scale * cx - xx)

    r_c = deconvolve(data, psf_coarse, config=cfg)
    errs_f, errs_c = [], []
    for z, y, xx in truth:
        e_f = centroid_err(x[max(0, z - 1):z + 2], y, xx, 1)
        assert e_f < 0.5
        errs_f.append(e_f)
        errs_c.append(centroid_err(np.asarray(r_c.x)[max(0, z - 1):z + 2],
                                   y, xx, 2))
    # the fine solve must localize clearly better than the coarse one
    # (measured 0.21 vs 0.71 mean fine pixels)
    assert np.mean(errs_f) < 0.6 * np.mean(errs_c)


def test_superres_separates_subpixel_pair():
    """Two points 3 fine pixels apart (1.5 camera pixels): the fine solve
    peaks at the EXACT true positions with a clear dip (measured 58/57
    peaks vs 18/20 valley)."""
    psf_fine, _ = _models()
    rng = np.random.default_rng(1)
    obj_f = np.zeros(FINE)
    obj_f[4, 32, 31] = 200.0
    obj_f[4, 32, 34] = 200.0
    data = bin_volume(convolve(jnp.asarray(obj_f),
                               convolve_spectrum(psf_fine), FINE), F)
    data = data + 0.01 * float(jnp.max(data)) * jnp.asarray(
        rng.standard_normal(COARSE))
    cfg = DeconvolutionConfig(mu=0.01, epsilon=0.5, max_iter=120, grtol=1e-11)
    res = deconvolve_superres(data, psf_fine, factor=F, config=cfg)
    prof = np.asarray(res.x)[4, 32]
    top2 = set(np.argsort(prof)[-2:].tolist())
    assert top2 == {31, 34}
    valley = prof[32:34].max()
    assert prof[31] > 2 * valley and prof[34] > 2 * valley


def test_superres_validation_and_poisson():
    psf_fine, _ = _models()
    rng = np.random.default_rng(2)
    data = jnp.asarray(np.abs(rng.standard_normal(COARSE)) * 10)
    with pytest.raises(ValueError, match=r"\(1, 1, 1\)"):
        deconvolve_superres(data, psf_fine, factor=(1, 1, 1))
    with pytest.raises(ValueError, match="psf_fine shape"):
        deconvolve_superres(data, psf_fine[:, :32, :32], factor=F)
    with pytest.raises(ValueError, match="var_shape"):
        deconvolve_superres(data, psf_fine, factor=F,
                            config=DeconvolutionConfig(var_shape=(8, 40, 40)))
    # poisson data term composes
    counts = jnp.asarray(rng.poisson(np.maximum(np.asarray(data), 0)) + 0.0)
    r = deconvolve_superres(counts, psf_fine, factor=F,
                            config=DeconvolutionConfig(
                                mu=0.01, max_iter=8, data_term="poisson",
                                background=0.1))
    assert r.x.shape == FINE and np.isfinite(np.asarray(r.x)).all()


def test_cli_deconv_superres(tmp_path):
    """deconv --superres: fine PSF synthesized from the model flags at
    dxy/f; output carries the fine pixel sizes."""
    import os
    import subprocess
    import sys

    from microtipi_tpu.io.tiffstack import read_pixel_size, read_stack, write_stack

    psf_fine, _ = _models()
    rng = np.random.default_rng(0)
    obj_f = np.zeros(FINE)
    obj_f[4, 31, 41] = 300.0
    obj_f[3, 17, 23] = 200.0
    data = np.array(bin_volume(convolve(
        jnp.asarray(obj_f), convolve_spectrum(psf_fine), FINE), F))
    data += 0.01 * data.max() * rng.standard_normal(COARSE)
    write_stack(tmp_path / "d.tif", data.astype(np.float32),
                dxy=200e-9, dz=300e-9)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "microtipi_tpu", "deconv", str(tmp_path / "d.tif"),
         "--out", str(tmp_path / "rec.tif"), "--superres", "1", "2", "2",
         "--na", "1.2", "--wavelength", "500e-9", "--ni", "1.33",
         "--iters", "40", "--mu", "0.01", "--epsilon", "0.5"],
        capture_output=True, text=True, env=env, cwd=tmp_path, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "deconv[superres" in r.stdout
    rec = read_stack(tmp_path / "rec.tif")
    assert rec.shape == FINE and np.isfinite(rec).all()

    # --method admm: the round-4 engine through the binning prox
    r2 = subprocess.run(
        [sys.executable, "-m", "microtipi_tpu", "deconv", str(tmp_path / "d.tif"),
         "--out", str(tmp_path / "rec_admm.tif"), "--superres", "1", "2", "2",
         "--na", "1.2", "--wavelength", "500e-9", "--ni", "1.33",
         "--iters", "40", "--mu", "0.01", "--epsilon", "0.5",
         "--method", "admm"],
        capture_output=True, text=True, env=env, cwd=tmp_path, timeout=600,
    )
    assert r2.returncode == 0, r2.stderr
    assert "deconv[superres x(1, 2, 2) admm]" in r2.stdout
    rec_a = read_stack(tmp_path / "rec_admm.tif")
    assert rec_a.shape == FINE and np.isfinite(rec_a).all()
    # fine pixel size in the metadata
    dxy, dz = read_pixel_size(tmp_path / "rec.tif")
    assert dxy == pytest.approx(100e-9, rel=1e-3)
    # the bright bead localizes at its true fine position
    z, y, x = np.unravel_index(np.argmax(rec), FINE)
    assert (z, y, x) == (4, 31, 41)

    # measured-PSF path: a COARSE --psf is band-limited-upsampled in place
    _, psf_coarse = _models()
    write_stack(tmp_path / "pc.tif", np.asarray(psf_coarse))
    r = subprocess.run(
        [sys.executable, "-m", "microtipi_tpu", "deconv", str(tmp_path / "d.tif"),
         "--out", str(tmp_path / "rec2.tif"), "--superres", "1", "2", "2",
         "--psf", str(tmp_path / "pc.tif"), "--iters", "15", "--mu", "0.01"],
        capture_output=True, text=True, env=env, cwd=tmp_path, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "upsampling the coarse --psf" in r.stdout
    rec2 = read_stack(tmp_path / "rec2.tif")
    assert rec2.shape == FINE and np.isfinite(rec2).all()


def test_upsample_psf_matches_model_when_adequately_sampled():
    """Band-limited Fourier upsampling of an adequately sampled PSF equals
    the model synthesized at the fine pitch to machine precision (the OTF
    lives below the coarse Nyquist)."""
    from microtipi_tpu.jobs.superres import upsample_psf

    kw = dict(na=0.8, wavelength=500e-9, ni=1.33, dz=400e-9, dtype=jnp.float64)
    mc = WideFieldConfig(shape=(8, 32, 32), dxy=150e-9, **kw)
    mf = WideFieldConfig(shape=(8, 64, 64), dxy=75e-9, **kw)
    pc = mc.compute_psf(mc.init_params())
    pf = np.asarray(mf.compute_psf(mf.init_params()))
    up = np.asarray(jax.jit(lambda p: upsample_psf(p, (1, 2, 2)))(pc))
    # directly comparable: the model's flux convention (sum invariant to
    # refinement) is exactly what the zero-pad interpolation produces
    assert np.linalg.norm(up - pf) / np.linalg.norm(pf) < 1e-10
    # flux preserved and nonnegative
    up2 = np.asarray(upsample_psf(pc, (2, 2, 2)))
    assert up2.min() >= 0.0
    # axial x2 rides at the edge of the coarse axial band: the clamped
    # sinc ringing adds ~2e-6 relative mass — still flux-preserving
    assert abs(up2.sum() - float(pc.sum())) < 1e-5 * float(pc.sum())
    # odd sizes work too (no Nyquist split needed)
    pc_odd = mc.compute_psf(mc.init_params())[:7, :31, :31]
    up_odd = np.asarray(upsample_psf(pc_odd, (1, 2, 2)))
    assert up_odd.shape == (7, 62, 62) and np.isfinite(up_odd).all()
