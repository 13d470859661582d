"""Finer-grid deconvolution on an undersampled camera, end to end.

The scenario the feature exists for: the camera pixel (200 nm) is ~2x
above the optical Nyquist (NA 1.2 at 500 nm -> ~104 nm), so structure the
OPTICS resolve is aliased by the DETECTOR. The fine-grid solve puts the
object on a 2x lateral lattice with the camera binning inside the forward
model and recovers sub-pixel positions the coarse solve must quantize.

Walks both PSF routes (docs/TUNING.md):
1. model route — the pupil model synthesized directly at the fine pitch;
2. measured route — a bead acquisition distilled with ``empirical_psf``
   and band-limited-upsampled with ``upsample_psf`` (exact only because
   the bead PSF here is adequately sampled axially/laterally by its own
   acquisition; see the aliasing caveat in the docstring).

    PYTHONPATH=. python examples/superres_example.py

Works on TPU (float32) and CPU.
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

if jax.default_backend() in ("tpu", "axon"):
    # Cache only on the TPU backend: the XLA:CPU executable
    # serialization segfaults intermittently on some hosts (CLAUDE.md).
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
if jax.default_backend() not in ("tpu", "axon"):
    jax.config.update("jax_enable_x64", True)

from microtipi_tpu import (
    DeconvolutionConfig,
    WideFieldConfig,
    bin_volume,
    convolve,
    convolve_spectrum,
    deconvolve,
    deconvolve_superres,
    empirical_psf,
    upsample_psf,
)

# MICROTIPI_EXAMPLE_TINY=1: CI smoke budgets (tests/test_examples.py);
# quality assertions are skipped there.
TINY = bool(os.environ.get("MICROTIPI_EXAMPLE_TINY"))
DTYPE = jnp.float32 if jax.default_backend() in ("tpu", "axon") else jnp.float64
COARSE = (4, 24, 24) if TINY else (8, 48, 48)
F = (1, 2, 2)
FINE = (COARSE[0], 2 * COARSE[1], 2 * COARSE[2])
KW = dict(na=1.2, wavelength=500e-9, ni=1.33, dz=300e-9, dtype=DTYPE)
M_FINE = WideFieldConfig(shape=FINE, dxy=100e-9, **KW)      # optics at 100 nm
M_COARSE = WideFieldConfig(shape=COARSE, dxy=200e-9, **KW)  # camera at 200 nm

# ---- acquire: off-lattice beads through the 2x-undersampling camera -----
rng = np.random.default_rng(0)
truth = ([(1, 15, 25), (2, 31, 13), (2, 21, 33)] if TINY else
         [(3, 31, 49), (5, 62, 27), (4, 41, 66), (2, 55, 55)])
obj_fine = np.zeros(FINE, np.float64)
for z, y, x in truth:
    obj_fine[z, y, x] = 300.0


@jax.jit
def acquire(o, n):
    h = M_FINE.compute_psf(M_FINE.init_params())
    clean = bin_volume(convolve(o, convolve_spectrum(h), FINE), F)
    return clean + 0.01 * jnp.max(clean) * n, h


data, psf_fine_model = acquire(jnp.asarray(obj_fine, DTYPE),
                               jnp.asarray(rng.standard_normal(COARSE), DTYPE))
print(f"acquired {COARSE} (camera 200 nm, optics Nyquist ~104 nm: 2x undersampled)")

cfg = DeconvolutionConfig(mu=0.01, epsilon=0.5, max_iter=8 if TINY else 60,
                          grtol=1e-9)


def localization_err(x, scale):
    """Mean bead-centroid error in FINE pixels (100 nm units)."""
    errs = []
    x = np.asarray(x)
    for z, y, xx in truth:
        yc, xc = y // scale, xx // scale
        win = x[max(0, z - 1):z + 2].sum(axis=0)[yc - 2:yc + 3, xc - 2:xc + 3]
        gy, gx = np.meshgrid(np.arange(win.shape[0]), np.arange(win.shape[1]),
                             indexing="ij")
        cy = (yc - 2) + (gy * win).sum() / win.sum()
        cx = (xc - 2) + (gx * win).sum() / win.sum()
        errs.append(np.hypot(scale * cy - y, scale * cx - xx))
    return float(np.mean(errs))


# ---- route 0 (baseline): ordinary solve on the camera grid --------------
t0 = time.time()
res_c = jax.jit(lambda d: deconvolve(
    d, M_COARSE.compute_psf(M_COARSE.init_params()), config=cfg))(data)
err_c = localization_err(res_c.x, 2)
print(f"coarse-grid solve: localization {err_c:.2f} fine px "
      f"({err_c*100:.0f} nm), {time.time()-t0:.1f}s")

# ---- route 1: model-synthesized fine PSF --------------------------------
t0 = time.time()
res_m = jax.jit(lambda d, h: deconvolve_superres(
    d, h, factor=F, config=cfg))(data, psf_fine_model)
err_m = localization_err(res_m.x, 1)
print(f"superres (model fine PSF): localization {err_m:.2f} fine px "
      f"({err_m*100:.0f} nm), {time.time()-t0:.1f}s")

# ---- route 2: measured bead -> empirical_psf -> upsample_psf ------------
# NOTE the bead is acquired at the FINE pitch here purely to make its own
# sampling adequate; a real coarse-pitch bead must satisfy the aliasing
# caveat in upsample_psf's docstring. We degrade it with noise+background
# and an off-center position like a real acquisition.


@jax.jit
def acquire_bead(n):
    h = M_COARSE.compute_psf(M_COARSE.init_params())
    return 2e5 * jnp.roll(h, (1, 5, -3), axis=(0, 1, 2)) + 50.0 + 5.0 * n


bead = acquire_bead(jnp.asarray(rng.standard_normal(COARSE), DTYPE))
t0 = time.time()
res_e = jax.jit(lambda d, b: deconvolve_superres(
    d, upsample_psf(empirical_psf(b), F), factor=F, config=cfg))(data, bead)
err_e = localization_err(res_e.x, 1)
print(f"superres (measured bead -> empirical_psf -> upsample): localization "
      f"{err_e:.2f} fine px ({err_e*100:.0f} nm), {time.time()-t0:.1f}s")

assert TINY or err_m < 0.6 * err_c, "superres localization regression"
assert TINY or err_e < 0.9 * err_c, "measured-PSF route regression"
print("superres example OK")
