"""The full production pipeline on synthetic data, end to end.

Chains the framework's acquisition-to-report tools exactly the way a real
deployment would, with no real microscope required:

1. ``simulate``-equivalent: filament phantom, aberrated widefield blur,
   mixed Poisson-Gaussian camera noise (``utils.phantoms``);
2. preprocessing: dark/flat-field correction + hot-pixel removal
   (``ops.preprocess``);
3. bead calibration with error bars (``fit_psf_beads`` +
   ``bead_fit_uncertainty``) and a Strehl grade of the fitted optics;
4. bead-anchored blind deconvolution — the measured-best recipe
   (``blind_deconvolve(..., bead_data=...)``, BASELINE.md);
5. resolution report: single-image FSC of the acquisition
   (``ops.metrics``).

    PYTHONPATH=. python examples/pipeline_example.py

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
    BlindDeconvConfig,
    DeconvolutionConfig,
    PHASE,
    WideFieldConfig,
    bead_fit_uncertainty,
    blind_deconvolve,
    checkerboard_split,
    convolve,
    convolve_spectrum,
    fit_psf_beads,
    flat_field_correct,
    fourier_shell_correlation,
    fsc_resolution,
    remove_hot_pixels,
    strehl_ratio,
)
from microtipi_tpu.jobs.psf_fit import PsfFitConfig
from microtipi_tpu.utils.arrays import roll
from microtipi_tpu.utils.phantoms import apply_camera, filaments_phantom

# MICROTIPI_EXAMPLE_TINY=1: CI smoke budgets (tests/test_examples.py);
# the quality assertion is skipped there.
TINY = bool(os.environ.get("MICROTIPI_EXAMPLE_TINY"))
DTYPE = jnp.float32 if jax.default_backend() in ("tpu", "axon") else jnp.float64
SHAPE = (8, 32, 32) if TINY else (16, 64, 64)
MODEL = WideFieldConfig(shape=SHAPE, na=1.2, wavelength=520e-9, ni=1.33,
                        dxy=100e-9, dz=300e-9, n_phase=3, radial=True,
                        dtype=DTYPE)
TRUE = MODEL.init_params()._replace(phase=jnp.asarray([0.35, -0.2, 0.1], DTYPE))

# ---- 1. acquire (phantom -> blur -> camera) -----------------------------
obj = jnp.asarray(filaments_phantom(SHAPE, n=6, seed=1), DTYPE)
gain_map = jnp.asarray((0.7 + 0.6 * np.linspace(0, 1, SHAPE[2]))[None, None, :]
                       * np.ones(SHAPE), DTYPE)


@jax.jit  # the pupil synthesis is complex math: keep it jitted (CLAUDE.md)
def acquire(o):
    h = MODEL.compute_psf(TRUE)
    return convolve(o, convolve_spectrum(h), SHAPE) * gain_map, roll(4e3 * h)


clean_scaled, bead_clean = acquire(obj)
acq = apply_camera(np.asarray(clean_scaled), photons_at_max=2e4,
                   gain=2.0, readout_sigma=1.5, offset=100.0, seed=2)
acq[SHAPE[0] // 2, 10, SHAPE[2] - 14] = 6e4  # a hot pixel
# a BRIGHT bead: the anchor needs peak SNR >~100 (docs/TUNING.md) — at 4e3
# photons the anchor is measured to pull only weakly against a high-SNR
# sample, at 4e5 it pins the loop to the calibration
bead_acq = apply_camera(np.asarray(bead_clean), photons_at_max=4e5,
                        gain=2.0, readout_sigma=1.5, offset=100.0, seed=3)
print(f"acquired {SHAPE} filament scene + bead stack "
      f"(range {acq.min():.0f}-{acq.max():.0f} ADU)")

# ---- 2. preprocess ------------------------------------------------------
dark = 100.0 * jnp.ones(SHAPE[1:], DTYPE)
bright = 200.0 * gain_map[0] + 100.0


@jax.jit
def preprocess(v):
    v = flat_field_correct(v, bright, dark)
    return remove_hot_pixels(v, 5.0)


data = preprocess(jnp.asarray(acq, DTYPE))
bead = jnp.asarray(bead_acq, DTYPE) - 100.0  # offset only (beads: flat field)
hz, hx = SHAPE[0] // 2, SHAPE[2] - 14
print(f"preprocessed: hot pixel {float(jnp.asarray(acq)[hz, 10, hx]):.0f} -> "
      f"{float(data[hz, 10, hx]):.1f} ADU")

# ---- 2b. camera self-calibration (no data sheet needed) ----------------
# Photon-transfer gain/readout from the RAW acquisition (pre flat-field:
# the correction rescales noise per-pixel) and the blind noise sigma of
# the working data — the constants every later weighting/auto-mu step
# would otherwise need typed in (docs/TUNING.md).
from microtipi_tpu import estimate_gain_readout, estimate_noise_sigma

g_est, rv_est = jax.jit(estimate_gain_readout)(jnp.asarray(acq, DTYPE) - 100.0)
sig_est = float(jax.jit(estimate_noise_sigma)(data))
print(f"camera self-calibration: gain {float(g_est):.2f} e-/ADU "
      f"(true 2.0 — sharp filaments + the flat-field gradient bias the "
      f"single-shot estimate ~30%, fine for weighting), readout var "
      f"{float(rv_est):.2f} ADU^2 (shot-noise dominated here); "
      f"working-data noise sigma {sig_est:.2f} ADU")

# ---- 3. calibrate with error bars --------------------------------------
t0 = time.time()
fit, amp = jax.jit(lambda b: fit_psf_beads(
    MODEL, b, families=(PHASE,), config=PsfFitConfig(max_iter=5 if TINY else 40, grtol=0.0)
))(bead)
unc = jax.jit(lambda b, p: bead_fit_uncertainty(MODEL, p, (PHASE,), b))(
    bead, jax.tree.map(jnp.asarray, fit.params))
phase = np.asarray(fit.params.phase)
std = np.asarray(unc.std["phase"])
print(f"calibrated phase: {np.round(phase, 3)} +- {np.round(std, 3)} "
      f"(true {np.asarray(TRUE.phase)}) in {time.time()-t0:.1f}s")
print(f"Strehl of the fitted optics: "
      f"{float(jax.jit(lambda p: strehl_ratio(MODEL, p))(fit.params)):.3f}")

# ---- 4. bead-anchored blind solve --------------------------------------
cfg = BlindDeconvConfig.recommended(
    loops=2 if TINY else 3, families=(PHASE,),
    psf_max_iter=(3 if TINY else 10,),
    deconv=DeconvolutionConfig(mu=2e-3, epsilon=1.0,
                               max_iter=4 if TINY else 20, grtol=0.0))
t0 = time.time()
res = jax.jit(lambda d, b: blind_deconvolve(d, MODEL, config=cfg, bead_data=b)
              )(data, bead)
err_blind = float(jnp.linalg.norm(res.params.phase - TRUE.phase))
print(f"blind solve: {time.time()-t0:.1f}s, final phase error {err_blind:.3f}")

# ---- 5. resolution report ----------------------------------------------
# Single-image FSC is valid on the RAW acquisition (checkerboard halves
# carry independent noise). After deconvolution the halves share the
# solver, so their noise is correlated — post-solve resolution needs two
# half-data solves fed to `fsc a b` instead.
a, b = checkerboard_split(data)
freqs, fsc = jax.jit(lambda a, b: fourier_shell_correlation(
    a, b, spacing=(MODEL.dz, 2 * MODEL.dxy, 2 * MODEL.dxy)))(a, b)
r = fsc_resolution(np.asarray(freqs), np.asarray(fsc))
print(f"single-image FSC resolution (raw acquisition): {r*1e9:.0f} nm")

assert TINY or err_blind < 0.05, "pipeline quality regression"
print("pipeline OK")
