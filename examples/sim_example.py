"""Structured-illumination microscopy (SIM), end to end.

The scenario the feature exists for (docs/TUNING.md SIM section): nine
raw images (3 pattern angles x 3 phases) of a scene whose structure sits
BEYOND the widefield diffraction limit; band separation + recombination
recovers it at up to 2x lateral resolution. The walk:

1. simulate the raw SIM stack (pattern near the OTF cutoff, realistic
   phase/frequency calibration errors + noise);
2. self-calibrate the pattern from the data alone
   (``estimate_sim_pattern`` — phase-coherence maximization, measured
   0.004 bins / 0.012 rad in BASELINE.md);
3. reconstruct (``reconstruct_sim``) and compare against the widefield
   image: a point pair below the Rayleigh limit splits.

    PYTHONPATH=. python examples/sim_example.py

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
    WideFieldConfig,
    estimate_sim_pattern,
    reconstruct_sim,
    simulate_sim,
)

TINY = bool(os.environ.get("MICROTIPI_EXAMPLE_TINY"))
N = 48 if TINY else 128
DXY = 80e-9

model = WideFieldConfig(shape=(1, N, N), na=1.4, wavelength=500e-9,
                        ni=1.518, dxy=DXY, dz=120e-9, dtype=jnp.float64
                        if jax.default_backend() not in ("tpu", "axon")
                        else jnp.float32)
# PSF under jit, fetched as REAL; the OTF is built on the host and passed
# into jit as an ARGUMENT — a complex closure constant would be folded
# through a device->host transfer, which the axon TPU rejects (CLAUDE.md)
h_np = np.asarray(jax.jit(lambda: model.compute_psf(
    model.init_params())[0])())
h_np = h_np / h_np.sum()
otf_np = np.fft.fft2(h_np.astype(np.complex128))
otf = jnp.asarray(otf_np, jnp.complex128
                  if model.dtype == jnp.float64 else jnp.complex64)

# ---- scene: a sub-Rayleigh point pair + context -------------------------
rng = np.random.default_rng(0)
x = np.zeros((N, N))
for _ in range(6 if TINY else 16):
    x[rng.integers(6, N - 6), rng.integers(6, N - 6)] = rng.uniform(40, 90)
c = N // 2
x[c, c - 1] = 100.0
x[c, c + 1] = 100.0  # 160 nm apart; Rayleigh at NA 1.4/500 nm is 218 nm
x = jnp.asarray(x)

# ---- acquire: 3 angles x 3 phases, miscalibrated pattern ----------------
cutoff = 2 * model.na / model.wavelength * DXY
k = 0.8 * cutoff
nominal_k = np.stack([[k * np.sin(t), k * np.cos(t)]
                      for t in np.pi / 3 * np.arange(3)])
nominal_ph = np.tile(2 * np.pi / 3 * np.arange(3), (3, 1))
true_k = nominal_k + rng.uniform(-0.3, 0.3, nominal_k.shape) / N
true_ph = nominal_ph + rng.uniform(-0.4, 0.4, (3, 1))
acquire = jax.jit(lambda xx, o: simulate_sim(xx, o, true_k, true_ph,
                                             modulation=0.85))
data = acquire(x, otf)
data = data + 0.005 * float(jnp.max(data)) * jnp.asarray(
    rng.standard_normal(data.shape), data.dtype)

# ---- self-calibrate + reconstruct ---------------------------------------
# the estimator is host-NumPy by design (axon platform rules: no eager
# dispatch, no complex device fetches) — hand it host arrays
t0 = time.time()
est_k, est_ph = estimate_sim_pattern(np.asarray(data, np.float64), otf_np,
                                     nominal_k, nominal_ph,
                                     modulation=0.85)
print(f"pattern self-calibration: {time.time()-t0:.1f}s; frequency error "
      f"{np.abs(est_k-true_k).max()*N:.3f} bins, phase error "
      f"{np.abs(np.angle(np.exp(1j*(est_ph-true_ph)))).max():.3f} rad")

t0 = time.time()
rec = jax.jit(lambda d, o: reconstruct_sim(
    d, o, est_k, est_ph, modulation=0.85, wiener=5e-3).x)(data, otf)
rec = np.asarray(rec)
print(f"reconstructed {N}x{N} -> {2*N}x{2*N} in {time.time()-t0:.1f}s "
      f"(incl. compile)")

wf = np.fft.ifft2(np.fft.fft2(np.asarray(x, np.float64)) * otf_np).real


def valley_peak(img, scale):
    row = img[c * scale]
    pk = (row[(c - 1) * scale] + row[(c + 1) * scale]) / 2
    return row[c * scale] / max(pk, 1e-12)


vp_wf = valley_peak(wf, 1)
vp_sim = valley_peak(rec, 2)
print(f"160 nm pair valley/peak: widefield {vp_wf:.2f} (merged) -> "
      f"SIM {vp_sim:.2f} (lower = resolved)")
if not TINY:
    assert vp_wf > 0.9 and vp_sim < 0.6
print("SIM example OK")
