"""Property-style randomized tests over shapes/configs (fixed seeds).

Catches convention bugs that only appear off the happy path: odd sizes,
minimum mode counts, radial/full bases, f32/f64, tiny volumes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
from microtipi_tpu.models.widefield import WideFieldConfig
from microtipi_tpu.ops.convolution import WeightedConvolutionCost, convolve, convolve_spectrum
from microtipi_tpu.ops.regularization import hyperbolic_tv_and_gradient

KW = dict(na=1.25, wavelength=520e-9, ni=1.4, dxy=110e-9, dz=240e-9)

CASES = [
    # (shape, n_phase, n_modulus, radial, dtype)
    ((4, 16, 16), 0, 1, False, jnp.float64),
    ((5, 16, 16), 1, 1, True, jnp.float64),
    ((7, 24, 24), 3, 2, False, jnp.float32),
    ((6, 18, 18), 2, 4, True, jnp.float32),
    ((3, 32, 32), 8, 1, False, jnp.float64),
]


@pytest.mark.parametrize("shape,n_phase,n_modulus,radial,dtype", CASES)
def test_psf_model_fuzz(shape, n_phase, n_modulus, radial, dtype):
    cfg = WideFieldConfig(shape=shape, n_phase=n_phase, n_modulus=n_modulus,
                          radial=radial, dtype=dtype, **KW)
    rng = np.random.default_rng(hash(shape) % 2**31)
    p = cfg.init_params()
    if n_phase:
        p = p._replace(phase=jnp.asarray(0.3 * rng.standard_normal(n_phase), dtype))
    if n_modulus > 1:
        beta = np.zeros(n_modulus)
        beta[0] = 1.0
        beta[1:] = 0.2 * rng.standard_normal(n_modulus - 1)
        p = p._replace(modulus=jnp.asarray(beta, dtype))

    psf = cfg.compute_psf(p)
    assert psf.shape == shape and psf.dtype == dtype
    arr = np.asarray(psf)
    assert np.isfinite(arr).all() and arr.min() >= 0
    # Parseval energy identity holds for every configuration.
    rho = cfg.compute_pupil(p)[0]
    np.testing.assert_allclose(arr.sum(), float((rho**2).sum()),
                               rtol=1e-4 if dtype == jnp.float32 else 1e-10)
    # Gradients exist and are finite for every family with coefficients.
    g = jax.grad(lambda q: jnp.sum(cfg.compute_psf(q) ** 2))(p)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.parametrize("shape", [(3, 5, 7), (4, 6, 6), (2, 9, 4), (8, 8, 8)])
def test_convolution_adjoint_fuzz(shape):
    rng = np.random.default_rng(sum(shape))
    k = jnp.asarray(rng.standard_normal(shape))
    v = jnp.asarray(rng.standard_normal(shape))
    q = jnp.asarray(rng.standard_normal(shape))
    cost = WeightedConvolutionCost(convolve_spectrum(k), jnp.zeros(shape), None, shape)
    hv = cost.model(v)
    _, vjp = jax.vjp(cost.model, jnp.zeros_like(v))
    htq = vjp(q)[0]
    np.testing.assert_allclose(float(jnp.vdot(hv, q)), float(jnp.vdot(v, htq)), rtol=1e-10)


@pytest.mark.parametrize("shape", [(5,), (4, 6), (3, 5, 7), (2, 3, 4, 5)])
def test_tv_gradient_fuzz_any_rank(shape):
    rng = np.random.default_rng(len(shape))
    x = jnp.asarray(rng.standard_normal(shape))
    f, g = hyperbolic_tv_and_gradient(x, 0.1)
    v = jnp.asarray(rng.standard_normal(shape))
    eps = 1e-6
    from microtipi_tpu.ops.regularization import hyperbolic_tv

    fd = (hyperbolic_tv(x + eps * v, 0.1) - hyperbolic_tv(x - eps * v, 0.1)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, v)), float(fd), rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_deconvolve_random_kernels_stay_finite(seed):
    """Sign-indefinite random kernels (worst case for the quadratic form):
    the solver must stay finite and decrease the cost."""
    shape = (4, 12, 12)
    rng = np.random.default_rng(seed)
    k = jnp.asarray(rng.standard_normal(shape))
    d = jnp.asarray(rng.standard_normal(shape))
    res = deconvolve(d, k, config=DeconvolutionConfig(mu=0.01, epsilon=1.0, max_iter=10, grtol=0.0))
    hist = np.asarray(res.f_history)
    valid = hist[~np.isnan(hist)]
    assert np.isfinite(valid).all()
    assert valid[-1] <= valid[0] + 1e-9


@pytest.mark.parametrize("vol", [(5, 24, 24), (9, 16, 16), (11, 40, 40), (13, 8, 8)])
def test_sharded_padded_deconv_fuzz_odd_shapes(vol):
    """Random mesh-odd volumes: the sharded zero-weight padded mode must
    equal the dense crop-operator mode for every shape (both axes padded)."""
    from microtipi_tpu.parallel.deconv import sharded_deconvolve
    from microtipi_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(batch=1, z=8)

    def up(v, m=8):
        return v + (-v) % m

    var = (up(vol[0]), up(vol[1]), vol[2])
    rng = np.random.default_rng(hash(vol) % 2**31)
    data = jnp.asarray(rng.random(vol))
    psf = jnp.zeros(vol).at[0, 0, 0].set(0.5).at[0, 1, 0].set(0.3).at[1, 0, 1].set(0.2)
    cfg = DeconvolutionConfig(mu=0.003, epsilon=1.0, max_iter=6, grtol=0.0, var_shape=var)
    ref = deconvolve(data, psf, config=cfg)
    got = sharded_deconvolve(data, psf, mesh, config=cfg)
    np.testing.assert_allclose(float(got.f), float(ref.f), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x), atol=1e-7)


FAMILY_CASES = [
    # (family kind, shape, n_phase, radial, dtype)
    ("confocal", (4, 16, 16), 2, True, jnp.float64),
    ("confocal", (5, 24, 24), 3, False, jnp.float32),
    ("2p", (6, 18, 18), 0, True, jnp.float64),
    ("2p", (3, 16, 16), 4, False, jnp.float32),
    ("vectorial", (4, 20, 20), 2, True, jnp.float64),
    ("vectorial", (5, 16, 16), 3, False, jnp.float32),
    ("gl", (4, 24, 24), 2, True, jnp.float64),
    ("sted", (4, 16, 16), 2, True, jnp.float64),
    ("sted", (5, 24, 24), 3, False, jnp.float32),
    ("4pi", (8, 16, 16), 2, True, jnp.float64),
    ("4pi-c", (6, 20, 20), 3, False, jnp.float32),
    ("ism", (4, 16, 16), 2, True, jnp.float64),
    ("ism", (5, 20, 20), 0, False, jnp.float32),
    ("lattice-sheet", (8, 16, 16), 2, True, jnp.float64),
    ("bessel-sheet", (6, 20, 20), 0, True, jnp.float32),
]


@pytest.mark.parametrize("kind,shape,n_phase,radial,dtype", FAMILY_CASES)
def test_model_family_fuzz(kind, shape, n_phase, radial, dtype):
    """Every beyond-parity family: valid normalized PSF + finite gradients
    across random shapes/bases/dtypes."""
    from microtipi_tpu.models.confocal import ConfocalConfig, TwoPhotonConfig
    from microtipi_tpu.models.fourpi import FourPiConfig
    from microtipi_tpu.models.gibson_lanni import GibsonLanniConfig
    from microtipi_tpu.models.ism import ISMConfig
    from microtipi_tpu.models.lightsheet import StructuredSheetConfig
    from microtipi_tpu.models.sted import STEDConfig
    from microtipi_tpu.models.vectorial import VectorialConfig

    common = dict(shape=shape, n_phase=n_phase, radial=radial, dtype=dtype, **KW)
    cfg = {
        "confocal": lambda: ConfocalConfig(wavelength_exc=488e-9, pinhole=180e-9, **common),
        "2p": lambda: TwoPhotonConfig(**common),
        "vectorial": lambda: VectorialConfig(**common),
        "gl": lambda: GibsonLanniConfig(ns=1.36, depth=3e-6, **common),
        "sted": lambda: STEDConfig(wavelength_exc=488e-9, pinhole=120e-9,
                                   wavelength_dep=660e-9, saturation=8.0,
                                   **common),
        "4pi": lambda: FourPiConfig(wavelength_exc=488e-9, cavity_phase=0.3,
                                    **common),
        "4pi-c": lambda: FourPiConfig(fourpi_type="C",
                                      wavelength_exc=488e-9, **common),
        "ism": lambda: ISMConfig(wavelength_exc=488e-9, rings=1,
                                 element_pitch=2 * KW["dxy"], **common),
        "lattice-sheet": lambda: StructuredSheetConfig(
            sheet_mode="lattice", lattice_ky=(0.0, 0.5),
            wavelength_exc=488e-9, **common),
        "bessel-sheet": lambda: StructuredSheetConfig(
            sheet_mode="bessel", wavelength_exc=488e-9, **common),
    }[kind]()
    rng = np.random.default_rng(abs(hash((kind,) + shape)) % 2**31)
    p = cfg.init_params()
    if n_phase:
        p = p._replace(phase=jnp.asarray(0.3 * rng.standard_normal(n_phase), dtype))
    psf = cfg.compute_psf(p)
    assert psf.shape == shape and psf.dtype == dtype
    arr = np.asarray(psf)
    assert np.isfinite(arr).all()
    if kind == "ism":
        # the reassigned-sum PSF rings slightly negative by design (the
        # subvoxel Fourier shifts; models/ism.py compute_psf docstring)
        assert arr.min() >= -0.02 * arr.max()
    else:
        assert arr.min() >= 0
    if kind != "gl":  # unit-sum families
        np.testing.assert_allclose(arr.sum(), 1.0,
                                   rtol=1e-5 if dtype == jnp.float32 else 1e-12)
    g = jax.grad(lambda q: jnp.sum(cfg.compute_psf(q) ** 2))(p)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.parametrize("shape,k,dtype", [
    ((5, 12, 12), 1, jnp.float64),
    ((7, 16, 16), 2, jnp.float32),
    ((6, 18, 18), 3, jnp.float64),
    ((11, 12, 12), 5, jnp.float64),
])
def test_depthconv_fuzz(shape, k, dtype):
    """Depth-varying operator invariants across odd shapes/anchor counts:
    partition of unity, K=1 == plain convolution, adjoint identity."""
    from microtipi_tpu.ops.depthconv import (
        DepthVaryingConvCost, depth_varying_convolve, depth_weights,
    )

    rng = np.random.default_rng(k * 1000 + shape[0])
    zw = depth_weights(shape[0], np.sort(rng.uniform(0, shape[0] - 1, k)) if k > 1
                       else [shape[0] / 2])
    np.testing.assert_allclose(zw.sum(axis=0), 1.0, atol=1e-12)

    kernels = jnp.asarray(rng.random((k,) + shape), dtype)
    x = jnp.asarray(rng.standard_normal(shape), dtype)
    y = jnp.asarray(rng.standard_normal(shape), dtype)
    k_hat = jnp.fft.rfftn(kernels, axes=(1, 2, 3))
    zwj = jnp.asarray(zw, dtype)

    fwd = lambda v: depth_varying_convolve(v, k_hat, zwj, shape)
    hx = fwd(x)
    _, vjp = jax.vjp(fwd, x)
    (hty,) = vjp(y)
    tol = 1e-3 if dtype == jnp.float32 else 1e-10
    np.testing.assert_allclose(float(jnp.vdot(hx, y)), float(jnp.vdot(x, hty)),
                               rtol=tol)

    if k == 1:
        ref = convolve(x, convolve_spectrum(kernels[0]), shape)
        np.testing.assert_allclose(np.asarray(hx), np.asarray(ref), rtol=tol)

    cost = DepthVaryingConvCost.build(kernels, jnp.abs(x))
    f, g = jax.value_and_grad(cost.cost)(jnp.abs(y))
    assert np.isfinite(float(f)) and np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("shape,dtype", [
    ((16, 16), jnp.float32),
    ((3, 12, 20), jnp.float64),
    ((4, 16, 16), jnp.float32),
    ((8, 33, 17), jnp.float64),
    ((1, 64, 64), jnp.float32),
])
def test_estimators_fuzz_finite(shape, dtype):
    """The self-configuration estimators must return FINITE values on any
    valid input shape/dtype — small inputs, odd sizes, flat fields, single
    planes (the auto-gain small-input NaN was caught in review)."""
    from microtipi_tpu.jobs.autotune import estimate_noise_sigma
    from microtipi_tpu.weights.updaters import (
        InverseVarianceWeights, estimate_gain_readout)

    import zlib

    rng = np.random.default_rng(
        zlib.crc32(f"{shape}-{jnp.dtype(dtype).name}".encode()))
    for scale in (1.0, 1e4):
        d = jnp.asarray(scale * (50 + 5 * rng.standard_normal(shape)), dtype)
        sig = estimate_noise_sigma(d)
        assert np.isfinite(float(sig)) and float(sig) >= 0
        g, rv = estimate_gain_readout(d)
        assert np.isfinite(float(g)) and np.isfinite(float(rv))
        w = InverseVarianceWeights(gain=float(g), readout_variance=float(rv)
                                   ).from_data(d)
        assert bool(jnp.isfinite(w).all())
    # constant input: degenerate but not NaN
    flat = jnp.full(shape, 7.0, dtype)
    assert np.isfinite(float(estimate_noise_sigma(flat)))
    g, rv = estimate_gain_readout(flat)
    assert np.isfinite(float(g)) and np.isfinite(float(rv))


@pytest.mark.parametrize("shape", [(4, 16, 16), (7, 24, 24), (6, 18, 30)])
def test_empirical_psf_fuzz(shape):
    """empirical_psf: unit sum, nonnegative, finite for any bead position."""
    from microtipi_tpu.jobs.psf_fit import empirical_psf

    import zlib

    rng = np.random.default_rng(zlib.crc32(str(shape).encode()))
    d = 10.0 + rng.standard_normal(shape)
    z, y, x = (rng.integers(0, s) for s in shape)
    d[z, y, x] = 500.0
    h = empirical_psf(jnp.asarray(d))
    assert np.isfinite(np.asarray(h)).all()
    assert float(h.min()) >= 0.0
    assert float(h.sum()) == pytest.approx(1.0, rel=1e-6)


@pytest.mark.parametrize("shape,k", [
    ((5, 12, 12), 2), ((8, 16, 16), 3), ((11, 12, 12), 4),
])
def test_rl_depthvar_adjoint_and_sensitivity_fuzz(shape, k):
    """richardson_lucy_depthvar's hand-written backprojection equals the
    autodiff adjoint of its forward, and its per-z sensitivity map equals
    H^T 1 — across odd shapes and anchor counts."""
    from microtipi_tpu.ops.depthconv import depth_varying_convolve, depth_weights

    rng = np.random.default_rng(shape[0] * 100 + k)
    anchors = np.sort(rng.uniform(0, shape[0] - 1, k))
    kernels = jnp.asarray(rng.random((k,) + shape))
    zw = jnp.asarray(depth_weights(shape[0], anchors))
    h_hat = jnp.fft.rfftn(kernels, axes=(1, 2, 3))

    # the exact implementation from richardson_lucy_depthvar
    def backward(r):
        backs = jnp.fft.irfftn(jnp.conj(h_hat) * jnp.fft.rfftn(r)[None],
                               s=shape, axes=(1, 2, 3))
        return jnp.sum(zw[:, :, None, None] * backs, axis=0)

    flux = jnp.sum(zw * jnp.sum(kernels, axis=(1, 2, 3))[:, None],
                   axis=0)[:, None, None]

    fwd = lambda v: depth_varying_convolve(v, h_hat, zw, shape)
    y = jnp.asarray(rng.standard_normal(shape))
    _, vjp = jax.vjp(fwd, jnp.zeros(shape))
    (hty,) = vjp(y)
    np.testing.assert_allclose(np.asarray(backward(y)), np.asarray(hty),
                               rtol=1e-9, atol=1e-12)
    # H^T 1: the per-z sensitivity the RL denominator divides by
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(flux), shape),
        np.asarray(backward(jnp.ones(shape))), rtol=1e-8, atol=1e-10)
