"""Precision policy: float32 (the TPU path) vs float64 (validation path).

BASELINE.md's fidelity target (<=1e-5 relative vs double semantics) is
checked between our own f32 and f64 paths on CPU — the reference Java stack
is not executable here, and our f64 path reproduces its double semantics
(same math, same conventions; see SURVEY.md section 4).
"""

import jax.numpy as jnp
import numpy as np

from microtipi_tpu.models.widefield import WideFieldConfig
from microtipi_tpu.ops.convolution import WeightedConvolutionCost

KW = dict(shape=(16, 64, 64), na=1.4, wavelength=561e-9, ni=1.518, dxy=80e-9, dz=200e-9,
          n_phase=6, n_modulus=3)


def _params(cfg):
    p = cfg.init_params()
    return p._replace(
        phase=jnp.asarray([0.3, -0.2, 0.1, 0.05, -0.15, 0.2], cfg.dtype),
        modulus=jnp.asarray([1.0, 0.1, -0.05], cfg.dtype),
    )


def test_psf_f32_matches_f64_normwise():
    c64 = WideFieldConfig(dtype=jnp.float64, **KW)
    c32 = WideFieldConfig(dtype=jnp.float32, **KW)
    p64 = c64.compute_psf(_params(c64))
    p32 = c32.compute_psf(_params(c32))
    rel = float(jnp.linalg.norm(p32.astype(jnp.float64) - p64) / jnp.linalg.norm(p64))
    assert rel < 1e-5, rel


def test_cost_and_gradient_f32_vs_f64():
    c64 = WideFieldConfig(dtype=jnp.float64, **KW)
    c32 = WideFieldConfig(dtype=jnp.float32, **KW)
    rng = np.random.default_rng(0)
    obj64 = jnp.asarray(rng.random(KW["shape"]))
    data64 = jnp.asarray(rng.random(KW["shape"]))

    cost64 = WeightedConvolutionCost.build(obj64, data64)
    cost32 = WeightedConvolutionCost.build(
        obj64.astype(jnp.float32), data64.astype(jnp.float32)
    )
    psf64 = c64.compute_psf(_params(c64))
    psf32 = c32.compute_psf(_params(c32))
    f64, g64 = cost64.cost_and_gradient(psf64)
    f32, g32 = cost32.cost_and_gradient(psf32)
    assert abs(float(f32) - float(f64)) / abs(float(f64)) < 1e-4
    rel = float(jnp.linalg.norm(g32.astype(jnp.float64) - g64) / jnp.linalg.norm(g64))
    assert rel < 1e-4, rel
