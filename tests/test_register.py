"""Phase-correlation registration + Fourier shift invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.ops.register import fourier_shift, register_translation


def _smooth_volume(shape, seed=0):
    """Band-limited random volume (so fractional Fourier shifts are exact)."""
    rng = np.random.default_rng(seed)
    spec = np.fft.rfftn(rng.standard_normal(shape))
    kz = np.fft.fftfreq(shape[0])[:, None, None]
    ky = np.fft.fftfreq(shape[1])[None, :, None]
    kx = np.fft.rfftfreq(shape[2])[None, None, :]
    spec *= np.exp(-40.0 * (kz**2 + ky**2 + kx**2))
    return jnp.asarray(np.fft.irfftn(spec, s=shape, axes=(0, 1, 2)))


def test_integer_shift_recovered_exactly():
    a = _smooth_volume((12, 24, 24))
    b = jnp.roll(a, (-3, 5, -7), axis=(0, 1, 2))
    # b = a rolled by s; the ALIGNING shift is -s (fourier_shift(b, t) == a).
    t = np.asarray(register_translation(a, b, subvoxel=False))
    np.testing.assert_array_equal(t, [3.0, -5.0, 7.0])
    np.testing.assert_allclose(
        np.asarray(fourier_shift(b, jnp.asarray(t))), np.asarray(a), atol=1e-10
    )


def test_subvoxel_shift_recovered():
    a = _smooth_volume((16, 32, 32), 1)
    true = jnp.asarray([1.3, -2.6, 0.4])
    b = fourier_shift(a, -true)  # displace b by -t so that shifting by t restores
    t = np.asarray(register_translation(a, b))
    np.testing.assert_allclose(t, np.asarray(true), atol=0.15)


def test_fourier_shift_inverts_registration():
    a = _smooth_volume((16, 32, 32), 2)
    b = fourier_shift(a, [-0.8, 2.2, -1.1])
    t = register_translation(a, b)
    b_aligned = fourier_shift(b, t)
    err = float(jnp.linalg.norm(b_aligned - a) / jnp.linalg.norm(a))
    assert err < 0.02


def test_register_then_fuse_pipeline():
    """Misaligned second view: registering before fusion recovers the
    fusion advantage; fusing unregistered views is worse."""
    from microtipi_tpu.jobs.richardson_lucy import multiview_richardson_lucy
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (16, 16, 16)
    rng = np.random.default_rng(3)

    def line_kernel(axis, length=7):
        k = np.zeros(shape)
        for i in range(-(length // 2), length // 2 + 1):
            j = [0, 0, 0]
            j[axis] = i % shape[axis]
            k[tuple(j)] = 1.0
        return jnp.asarray(k / k.sum())

    ka, kb = line_kernel(0), line_kernel(2)
    obj = np.zeros(shape)
    obj[rng.integers(3, 13, 10), rng.integers(3, 13, 10), rng.integers(3, 13, 10)] = 60.0
    obj = jnp.asarray(obj)
    va = convolve(obj, convolve_spectrum(ka), shape)
    vb = convolve(obj, convolve_spectrum(kb), shape)
    vb_shifted = fourier_shift(vb, [-2.0, 1.0, -3.0])  # stage drift

    # Blur-match before registering (different per-view PSFs bias the raw
    # phase correlation along the blur axes — register.py docstring).
    t = register_translation(
        convolve(va, convolve_spectrum(kb), shape),
        convolve(vb_shifted, convolve_spectrum(ka), shape),
    )
    np.testing.assert_allclose(np.asarray(t), [2.0, -1.0, 3.0], atol=0.2)
    vb_reg = fourier_shift(vb_shifted, t)
    psfs = jnp.stack([ka, kb])

    fused_reg = multiview_richardson_lucy(
        jnp.stack([va, jnp.maximum(vb_reg, 0.0)]), psfs, iterations=40)
    fused_raw = multiview_richardson_lucy(
        jnp.stack([va, jnp.maximum(vb_shifted, 0.0)]), psfs, iterations=40)

    def err(x):
        return float(jnp.linalg.norm(x - obj) / jnp.linalg.norm(obj))

    assert err(fused_reg) < err(fused_raw)


def test_jittable():
    a = _smooth_volume((8, 16, 16), 4)
    b = jnp.roll(a, (1, -2, 3), axis=(0, 1, 2))
    t = jax.jit(register_translation)(a, b)
    assert np.isfinite(np.asarray(t)).all()


def test_register_timeseries_recovers_drift():
    """Cumulative pairwise registration undoes a known linear+jitter drift."""
    from microtipi_tpu.ops.register import fourier_shift, register_timeseries

    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.random((8, 24, 24)))
    # smooth it (drift estimation on band-limited content)
    f = jnp.fft.rfftn(base)
    fz = np.fft.fftfreq(8)[:, None, None]
    fy = np.fft.fftfreq(24)[None, :, None]
    fx = np.fft.rfftfreq(24)[None, None, :]
    base = jnp.fft.irfftn(f * jnp.asarray((fz**2 + fy**2 + fx**2) < 0.09),
                          s=base.shape)
    drift = np.cumsum(rng.uniform(-1.2, 1.2, size=(5, 3)), axis=0)
    drift[:, 0] *= 0.3  # smaller axial drift
    frames = [base] + [fourier_shift(base, -jnp.asarray(d)) for d in drift]
    series = jnp.stack(frames)

    registered, shifts = jax.jit(register_timeseries)(series)
    got = np.asarray(shifts)[1:]
    np.testing.assert_allclose(got, drift, atol=0.15)
    # registered frames all match frame 0
    for t in range(1, 6):
        err = float(jnp.linalg.norm(registered[t] - series[0])
                    / jnp.linalg.norm(series[0]))
        assert err < 0.05, (t, err)


def test_register_timeseries_validation():
    from microtipi_tpu.ops.register import register_timeseries

    with pytest.raises(ValueError, match="series"):
        register_timeseries(jnp.zeros((1, 8, 8, 8)))


def test_xcorr_beats_phase_on_blurred_frames():
    """Drift between PSF-blurred noisy frames: normalized phase correlation
    is contaminated by the empty out-of-OTF bins (every bin normalized to
    unit modulus votes, including pure-noise ones); matched-filter xcorr
    weights bins by their energy. Measured here: ~0.5 vox vs ~0.1 vox —
    the same mechanism as the bead-patch registration dead end
    (psf_fit.average_beads docstring)."""
    from microtipi_tpu.models.widefield import WideFieldConfig

    shape = (8, 64, 64)
    m = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                        dxy=100e-9, dz=300e-9, dtype=jnp.float64)
    h = m.compute_psf(m.init_params())
    rng = np.random.default_rng(0)
    obj = np.zeros(shape)
    for _ in range(8):
        z, y, x = rng.integers(1, 7), rng.integers(8, 56), rng.integers(8, 56)
        obj[z, y - 4:y + 4, x] = rng.uniform(40, 80)
        obj[z, y, x - 4:x + 4] = rng.uniform(40, 80)
    obj = jnp.asarray(obj)
    t_true = jnp.asarray([0.4, -1.3, 0.7])

    def frame(x, key):
        d = jnp.fft.irfftn(jnp.fft.rfftn(h) * jnp.fft.rfftn(x), s=shape)
        return d + 0.01 * jnp.max(d) * jax.random.normal(key, shape, d.dtype)

    a = frame(obj, jax.random.PRNGKey(1))
    b = frame(fourier_shift(obj, -t_true), jax.random.PRNGKey(2))
    err_phase = float(jnp.linalg.norm(
        register_translation(a, b, method="phase") - t_true))
    err_xcorr = float(jnp.linalg.norm(
        register_translation(a, b, method="xcorr") - t_true))
    assert err_xcorr < 0.2, err_xcorr
    assert err_xcorr < 0.5 * err_phase, (err_xcorr, err_phase)
