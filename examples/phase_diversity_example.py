"""Phase-diversity calibration: estimate the pupil with NO bead and NO prior.

The scenario the feature exists for (docs/TUNING.md, BASELINE.md
phase-diversity table): nothing on the slide but the sample itself, yet
the pupil must be calibrated. Take TWO exposures of the same scene with a
KNOWN camera defocus step between them; the unknown object is profiled
out of the joint likelihood in closed form per Fourier mode
(Gonsalves/Paxman — ``jobs/diversity.py``), leaving a clean estimation
problem for the pupil phase. Every fully-blind single-image route is a
measured dead end (BASELINE.md); this is the instrument-side way out.

Pipeline walked here:
1. simulate the diversity pair (same object, +-delta defocus channels);
2. ``fit_psf_diversity`` — one VMLMB run on the profiled metric;
3. free multi-frame Wiener restoration (``diversity_object_estimate``);
4. the production composition: a regularized ``deconvolve`` with the
   PSF synthesized from the fitted parameters.

    PYTHONPATH=. python examples/phase_diversity_example.py

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
    PsfFitConfig,
    WideFieldConfig,
    convolve,
    convolve_spectrum,
    deconvolve,
    defocus_diversity,
    diversity_object_estimate,
    diversity_psfs,
    fit_psf_diversity,
)

# MICROTIPI_EXAMPLE_TINY=1: CI smoke budgets (tests/test_examples.py);
# quality assertions are skipped there.
TINY = bool(os.environ.get("MICROTIPI_EXAMPLE_TINY"))
DTYPE = jnp.float32 if jax.default_backend() in ("tpu", "axon") else jnp.float64
SHAPE = (1, 32, 32) if TINY else (1, 128, 128)
ITERS = 10 if TINY else 60

model = WideFieldConfig(shape=SHAPE, na=1.4, wavelength=500e-9, ni=1.518,
                        dxy=80e-9, dz=120e-9, n_phase=3, radial=True,
                        dtype=DTYPE)
alpha_true = jnp.asarray([0.3, -0.2, 0.1], DTYPE)
truth = model.init_params()._replace(phase=alpha_true)

# ---- acquire: one unknown scene, two exposures at known defocus ----------
# The scene needs broadband detail (BASELINE.md: a smooth scene costs ~2-3x
# in recovery error — aberration information lives at mid/high frequencies).
rng = np.random.default_rng(0)
scene = jnp.asarray(rng.uniform(0.1, 1.1, SHAPE), DTYPE)
DELTAS = [-2e-7, 2e-7]  # meters of camera travel; ~0.37 waves P-V each
phases = defocus_diversity(model, DELTAS)


@jax.jit
def acquire(x, key):
    hs = diversity_psfs(model, truth, jnp.asarray(phases, DTYPE))
    data = jnp.stack([convolve(x, convolve_spectrum(hs[d]), SHAPE)
                      for d in range(len(DELTAS))])
    noise = 0.002 * jnp.max(data) * jax.random.normal(key, data.shape, DTYPE)
    return data + noise


data = acquire(scene, jax.random.PRNGKey(1))

# ---- calibrate: the object is profiled out in closed form ----------------
t0 = time.time()
fit = jax.jit(lambda d: fit_psf_diversity(
    model, d, phases, gamma=1e-3,
    config=PsfFitConfig(max_iter=ITERS)))(data)
alpha = np.asarray(fit.params.phase)
print(f"diversity fit: {int(fit.iterations)} iters, "
      f"{time.time()-t0:.1f}s (incl. compile)")
print(f"  true phase   {np.asarray(alpha_true).round(4)}")
print(f"  fitted phase {alpha.round(4)}  "
      f"(L2 err {np.linalg.norm(alpha - np.asarray(alpha_true)):.4f})")

# ---- restore: free Wiener object, then the regularized solve -------------
xhat = jax.jit(lambda d, p: diversity_object_estimate(
    model, p, d, phases, gamma=1e-3))(data, fit.params)


@jax.jit
def regularized(d, p):
    h = model.compute_psf(p)
    return deconvolve(d, h, config=DeconvolutionConfig(
        mu=1e-3, max_iter=ITERS)).x


xreg = regularized(data[0], fit.params)


def rel(a, b):
    a = a - jnp.mean(a)
    b = b - jnp.mean(b)
    return float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))


e_raw = rel(data[0], scene)
e_wiener = rel(xhat, scene)
e_reg = rel(xreg, scene)
# On this deliberately broadband (noise-like) validation scene the
# multi-frame Wiener profile wins — TV favors piecewise-smooth structure.
# On real (sparse/edged) specimens the regularized solve is the
# production path; the diversity fit itself is scene-agnostic.
print(f"object error vs truth: raw {e_raw:.3f} -> Wiener {e_wiener:.3f} "
      f"-> regularized (TV) {e_reg:.3f}")
if not TINY:
    assert np.linalg.norm(alpha - np.asarray(alpha_true)) < 0.1
    assert e_wiener < e_raw
print("phase-diversity example OK")
