"""End-to-end blind widefield deconvolution example.

Synthesizes a ground-truth scene, blurs it with an aberrated PSF, corrupts it
with mixed Poisson-Gaussian noise, then recovers object + pupil phase with the
single-program blind loop. Works on TPU (float32) and CPU.

    PYTHONPATH=. python examples/blind_deconv_example.py [out.tif]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

if jax.default_backend() in ("tpu", "axon"):
    # Cache only on the TPU backend: the XLA:CPU executable
    # serialization segfaults intermittently on some hosts (CLAUDE.md).
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

# MICROTIPI_EXAMPLE_TINY=1 shrinks shapes/budgets so the CI smoke test
# (tests/test_examples.py) can execute every example in seconds on CPU.
TINY = bool(os.environ.get("MICROTIPI_EXAMPLE_TINY"))

from microtipi_tpu import (
    BlindDeconvConfig,
    DeconvolutionConfig,
    InverseVarianceWeights,
    PsfFitConfig,
    WideFieldConfig,
    blind_deconvolve,
    convolve,
    convolve_spectrum,
    DEFOCUS,
    PHASE,
)

SHAPE = (8, 32, 32) if TINY else (32, 128, 128)

model = WideFieldConfig(
    shape=SHAPE, na=1.4, wavelength=561e-9, ni=1.518, dxy=80e-9, dz=200e-9,
    n_phase=8, n_modulus=1,
)
truth = model.init_params()._replace(
    phase=jnp.asarray([0.4, -0.2, 0.3, 0.1, -0.1, 0.2, 0.0, -0.3], jnp.float32)
)

# --- synthetic specimen: beads + a smooth structure ------------------------
rng = np.random.default_rng(0)
obj = np.zeros(SHAPE, np.float32)
idx = rng.integers(0, np.array(SHAPE), size=(40, 3))
obj[idx[:, 0], idx[:, 1], idx[:, 2]] = rng.uniform(200, 500, 40)
zz, yy, xx = np.meshgrid(*[np.arange(s) for s in SHAPE], indexing="ij")
obj += 60 * np.exp(-(((zz - 16) / 5) ** 2 + ((yy - 64) / 18) ** 2 + ((xx - 64) / 18) ** 2))
obj = jnp.asarray(obj)
noise = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)


@jax.jit
def make_data(obj, noise):
    psf = model.compute_psf(truth)
    blurred = convolve(obj, convolve_spectrum(psf), SHAPE)
    return blurred + jnp.sqrt(jnp.maximum(blurred, 0.0) + 4.0) * 0.5 * noise


data = make_data(obj, noise)
weights = InverseVarianceWeights(gain=4.0, readout_variance=1.0).from_data(data)

config = BlindDeconvConfig(
    loops=2 if TINY else 4,
    families=(DEFOCUS, PHASE),
    psf_max_iter=(3, 4) if TINY else (10, 25),
    deconv=DeconvolutionConfig(mu=0.01, epsilon=5.0, max_iter=5 if TINY else 40),
    fit=PsfFitConfig(),
    joint_fit=True,     # one VMLMB over defocus+phase per round (stabilizes coupled families)
    init="wiener",      # regularized-inverse warm start (~2x fewer early object iterations)
    # Object-prior annealing: strong TV early stops the object absorbing the
    # aberration (measured -31% phase error; docs/TUNING.md). One-flag
    # alternative: BlindDeconvConfig.recommended(...).
    mu_schedule=(0.16, 0.01) if TINY else (0.64, 0.16, 0.04, 0.01),
)

run = jax.jit(lambda d, w: blind_deconvolve(d, model, weights=w, config=config))
t0 = time.time()
res = run(data, weights)
err = float(jnp.linalg.norm(res.obj - obj) / jnp.linalg.norm(data - obj))
psf_true = model.compute_psf(truth)
psf_err = float(jnp.linalg.norm(res.psf - psf_true) / jnp.linalg.norm(psf_true))
print(f"solve (incl. compile on first call): {time.time() - t0:.1f}s")
print(f"object error vs raw data: {err:.3f} (lower is better, 1.0 = no gain)")
print("object-step cost per round:", np.asarray(res.deconv_f))
# Compare PSFs, not raw coefficients: Z4/defocus share a gauge with an
# object z-shift, so coefficient vectors are not directly comparable. Honest
# expectation (measured, BASELINE.md): at this NA/noise the pupil phase
# perturbs the volume-L2 of the PSF by only a few percent, blind phase
# estimates contract toward the truth slowly, and the restoration gain comes
# mostly from the object step — the reference's algorithm shares this
# landscape. tests/ + BASELINE.md quantify the regimes where phase IS
# recovered (low noise, low mode count, TV annealing).
print(f"PSF relative L2 error after blind fit: {psf_err:.3f}")
print("estimated pupil phase:", np.round(np.asarray(res.params.phase), 3))
print("true pupil phase:     ", np.asarray(truth.phase))

if len(sys.argv) > 1:
    from microtipi_tpu.io.tiffstack import write_stack

    write_stack(sys.argv[1], np.asarray(res.obj))
    print("wrote", sys.argv[1])
