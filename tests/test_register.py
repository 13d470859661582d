"""Phase-correlation registration + Fourier shift invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from microtipi_tpu.ops.register import fourier_shift, register_translation


def _smooth_volume(shape, seed=0):
    """Band-limited random volume (so fractional Fourier shifts are exact)."""
    rng = np.random.default_rng(seed)
    spec = np.fft.rfftn(rng.standard_normal(shape))
    kz = np.fft.fftfreq(shape[0])[:, None, None]
    ky = np.fft.fftfreq(shape[1])[None, :, None]
    kx = np.fft.rfftfreq(shape[2])[None, None, :]
    spec *= np.exp(-40.0 * (kz**2 + ky**2 + kx**2))
    return jnp.asarray(np.fft.irfftn(spec, s=shape))


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
