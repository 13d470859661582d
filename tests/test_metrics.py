"""FSC resolution and Strehl-ratio metrics (ops/metrics.py).

Beyond-parity observability; the reference computes no quality metrics
(SURVEY.md section 5-e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
from microtipi_tpu.ops.metrics import (
    fourier_shell_correlation,
    fsc_resolution,
    strehl_ratio,
)


def test_fsc_identical_volumes_is_one():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((16, 32, 32)))
    freqs, fsc = jax.jit(fourier_shell_correlation)(a, a)
    np.testing.assert_allclose(np.asarray(fsc), 1.0, atol=1e-10)
    assert freqs.shape == fsc.shape


def test_fsc_independent_noise_is_near_zero():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((16, 32, 32)))
    b = jnp.asarray(rng.standard_normal((16, 32, 32)))
    _, fsc = fourier_shell_correlation(a, b)
    # shells hold hundreds of coefficients: correlation ~ 1/sqrt(n) << 0.3
    assert np.abs(np.asarray(fsc)[1:]).max() < 0.3


def test_fsc_resolution_tracks_blur():
    """Two independently-noised observations of the same scene: more blur ->
    coarser FSC resolution; an unblurred pair resolves to ~Nyquist."""
    shape = (16, 48, 48)
    rng = np.random.default_rng(2)
    obj = jnp.asarray(rng.random(shape))

    def gaussian_kernel(sigma):
        z, y, x = [np.fft.fftfreq(n) * n for n in shape]
        r2 = (z[:, None, None] ** 2 + y[None, :, None] ** 2
              + x[None, None, :] ** 2)
        k = np.exp(-r2 / (2 * sigma**2))
        return jnp.asarray(k / k.sum())

    res = {}
    for sigma in (0.7, 2.0):
        blurred = convolve(obj, convolve_spectrum(gaussian_kernel(sigma)), shape)
        pair = [blurred + 0.05 * jnp.asarray(rng.standard_normal(shape))
                for _ in range(2)]
        freqs, fsc = fourier_shell_correlation(*pair)
        res[sigma] = fsc_resolution(freqs, fsc)
    assert res[2.0] > 2.0 * res[0.7]  # heavier blur -> coarser resolution

    # noiseless identical pair: never crosses -> sampling-limited answer
    freqs, fsc = fourier_shell_correlation(obj, obj)
    assert fsc_resolution(freqs, fsc) == pytest.approx(1.0 / float(freqs[-1]))


def test_fsc_physical_spacing():
    """With spacing given, frequencies are cycles/m and the resolution is
    physical; anisotropic voxels clip shells at the smallest Nyquist."""
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((8, 32, 32)))
    freqs, fsc = fourier_shell_correlation(
        a, a, spacing=(400e-9, 100e-9, 100e-9))
    # z Nyquist = 1/(2*400nm) = 1.25e6 < lateral 5e6 -> shell range capped there
    assert float(freqs[-1]) < 1.25e6
    r = fsc_resolution(freqs, fsc)
    assert r >= 800e-9  # cannot resolve beyond twice the coarsest sampling


def test_strehl_ratio_unaberrated_is_one_and_decreases():
    from microtipi_tpu.models.widefield import WideFieldConfig

    m = WideFieldConfig(shape=(12, 32, 32), na=1.2, wavelength=500e-9,
                        ni=1.33, dxy=100e-9, dz=250e-9, n_phase=3,
                        radial=True, dtype=jnp.float64)
    p0 = m.init_params()
    assert float(jax.jit(lambda p: strehl_ratio(m, p))(p0)) == pytest.approx(1.0)
    s_small = float(strehl_ratio(m, p0._replace(phase=jnp.asarray([0.3, 0.0, 0.0]))))
    s_large = float(strehl_ratio(m, p0._replace(phase=jnp.asarray([0.9, 0.4, -0.3]))))
    assert s_large < s_small < 1.0


def test_strehl_marechal_approximation():
    """For small aberrations S ~ exp(-var(phi)) over the pupil (Marechal).
    The Zernike modes carry unit SUM of squares over the grid (reference
    parity, ``Zernike.java:154-161``), so a coefficient vector alpha gives
    pupil phase variance sum(alpha^2)/N_pupil."""
    from microtipi_tpu.models.widefield import WideFieldConfig

    # full (non-radial) basis, defocus mode zeroed: pure defocus has TRUE
    # Strehl ~ 1 (refocusing is not an aberration, and strehl_ratio's
    # max-over-volume peak deliberately refocuses), so Marechal is tested
    # on astigmatism modes the focus cannot absorb.
    m = WideFieldConfig(shape=(12, 32, 32), na=1.2, wavelength=500e-9,
                        ni=1.33, dxy=100e-9, dz=250e-9, n_phase=3,
                        radial=False, dtype=jnp.float64)
    n_pupil = float(m._static()[1].sum())
    alpha = np.sqrt(n_pupil) * np.asarray([0.0, 0.25, -0.15])  # var ~ 0.085
    s = float(strehl_ratio(m, m.init_params()._replace(phase=jnp.asarray(alpha))))
    expected = np.exp(-np.sum(alpha**2) / n_pupil)
    assert abs(s - expected) < 0.05


def test_strehl_generic_over_families():
    """strehl_ratio only needs the PsfModel protocol: a confocal (unit-sum
    normalized) model grades aberrations the same direction as widefield."""
    from microtipi_tpu.models.confocal import ConfocalConfig

    m = ConfocalConfig(shape=(8, 32, 32), na=1.2, wavelength=520e-9,
                       wavelength_exc=488e-9, ni=1.33, dxy=100e-9, dz=250e-9,
                       n_phase=3, radial=False, dtype=jnp.float64)
    p0 = m.init_params()
    assert float(strehl_ratio(m, p0)) == pytest.approx(1.0)
    # astigmatism sized to ~0.5 rad^2 pupil variance (the modes carry unit
    # grid sum-of-squares; see the Marechal test)
    scale = float(np.sqrt(m._static()[1].sum()))
    aber = p0._replace(phase=scale * jnp.asarray([0.0, 0.5, -0.2]))
    assert float(strehl_ratio(m, aber)) < 0.9


def test_cli_fsc(tmp_path):
    """fsc CLI: physical resolution from two noised observations, JSON
    report, optional registration."""
    import json
    import subprocess
    import sys
    import os

    from microtipi_tpu.io.tiffstack import write_stack

    shape = (8, 32, 32)
    rng = np.random.default_rng(4)
    obj = rng.random(shape)
    z, y, x = [np.fft.fftfreq(n) * n for n in shape]
    k = np.exp(-(z[:, None, None]**2 + y[None, :, None]**2
                 + x[None, None, :]**2) / (2 * 1.2**2))
    blurred = np.fft.irfftn(np.fft.rfftn(obj) * np.fft.rfftn(k / k.sum()),
                            s=shape)
    for name in ("a", "b"):
        write_stack(tmp_path / f"{name}.tif",
                    (blurred + 0.02 * rng.standard_normal(shape)).astype(np.float32),
                    dxy=100e-9, dz=250e-9)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "microtipi_tpu", "fsc",
         str(tmp_path / "a.tif"), str(tmp_path / "b.tif"),
         "--report", str(tmp_path / "fsc.json")],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "FSC resolution:" in r.stdout
    doc = json.loads((tmp_path / "fsc.json").read_text())
    # blur sigma 1.2 voxels at 100 nm: resolution in the few-hundred-nm range,
    # strictly coarser than 2*dxy Nyquist
    assert 200e-9 < doc["resolution_m"] < 2e-6
    assert len(doc["fsc"]) == len(doc["freqs_per_m"])


def test_checkerboard_split_and_single_image_fsc():
    """checkerboard halves carry independent noise of the same scene; FSC at
    the decimated spacing tracks blur like the two-acquisition estimate."""
    from microtipi_tpu.ops.metrics import checkerboard_split

    shape = (8, 64, 64)
    rng = np.random.default_rng(7)
    obj = rng.random(shape)
    z, y, x = [np.fft.fftfreq(n) * n for n in shape]
    k = np.exp(-(z[:, None, None]**2 + y[None, :, None]**2
                 + x[None, None, :]**2) / (2 * 1.5**2))
    blurred = np.fft.irfftn(np.fft.rfftn(obj) * np.fft.rfftn(k / k.sum()), s=shape)
    noisy = jnp.asarray(blurred + 0.03 * rng.standard_normal(shape))
    a, b = checkerboard_split(noisy)
    assert a.shape == b.shape == (8, 32, 32)
    freqs, fsc = fourier_shell_correlation(
        a, b, spacing=(250e-9, 200e-9, 200e-9))  # dxy 100nm -> 200 decimated
    res = fsc_resolution(freqs, fsc)
    # two independent acquisitions of the same scene, for comparison
    noisy2 = jnp.asarray(blurred + 0.03 * rng.standard_normal(shape))
    f2, c2 = fourier_shell_correlation(
        noisy, noisy2, spacing=(250e-9, 100e-9, 100e-9))
    res2 = fsc_resolution(f2, c2)
    # same blur, same noise level: estimates agree within ~2x
    assert 0.5 < res / res2 < 2.0


def test_cli_fsc_split(tmp_path):
    import json
    import os
    import subprocess
    import sys

    from microtipi_tpu.io.tiffstack import write_stack

    shape = (8, 64, 64)
    rng = np.random.default_rng(8)
    obj = rng.random(shape)
    z, y, x = [np.fft.fftfreq(n) * n for n in shape]
    k = np.exp(-(z[:, None, None]**2 + y[None, :, None]**2
                 + x[None, None, :]**2) / (2 * 1.5**2))
    blurred = np.fft.irfftn(np.fft.rfftn(obj) * np.fft.rfftn(k / k.sum()), s=shape)
    write_stack(tmp_path / "v.tif",
                (blurred + 0.03 * rng.standard_normal(shape)).astype(np.float32),
                dxy=100e-9, dz=250e-9)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "microtipi_tpu", "fsc", str(tmp_path / "v.tif"),
         "--split", "--report", str(tmp_path / "f.json")],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "single-image FSC" in r.stdout and "FSC resolution:" in r.stdout
    doc = json.loads((tmp_path / "f.json").read_text())
    assert 200e-9 < doc["resolution_m"] < 5e-6


def test_strehl_from_pupil_map_matches_parametric_and_sees_defects():
    """strehl_ratio_from_pupil grades explicit pupil maps: equals the
    parametric Strehl when the map IS the Zernike phase, and degrades when
    a localized (non-Zernike) defect is added."""
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.metrics import strehl_ratio, strehl_ratio_from_pupil

    model = WideFieldConfig(shape=(8, 32, 32), na=1.2, wavelength=500e-9,
                            ni=1.33, dxy=100e-9, dz=250e-9, n_phase=3,
                            radial=True, dtype=jnp.float64)
    params = model.init_params()._replace(phase=jnp.asarray([0.3, -0.2, 0.1]))
    _, phi, _, mask = model.compute_pupil(params)
    s_param = float(strehl_ratio(model, params))
    s_map = float(strehl_ratio_from_pupil(model, phi))
    np.testing.assert_allclose(s_map, s_param, rtol=1e-10)

    yy, xx = np.meshgrid(np.fft.fftfreq(32) * 32, np.fft.fftfreq(32) * 32,
                         indexing="ij")
    defect = 1.0 * np.exp(-(((yy - 2) / 1.5) ** 2 + ((xx - 2) / 1.5) ** 2))
    s_defect = float(strehl_ratio_from_pupil(model, phi + jnp.asarray(defect) * mask))
    assert s_defect < s_map < 1.0
