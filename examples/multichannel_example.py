"""Joint multi-channel (chromatic) deconvolution, end to end.

The scenario the feature exists for: a two-color acquisition of ONE
specimen — both labels decorate the same cell structures, but the red
channel is photon-starved (dim fluorophore, short exposure) and each
channel has its own PSF because the pupil radius NA/lambda scales with the
emission wavelength (``WideFieldModel.java:165-166``). The joint solve
couples the channels through the color-TV prior
(``joint_hyperbolic_tv``): ONE hyperbolic norm across channels per voxel,
so edge LOCATIONS are shared while per-channel intensities stay free —
the dim channel borrows structure from the bright one.

Measured guidance (BASELINE.md): tune mu 3-10x LARGER than per-channel TV
(shared edges are cheap under the coupled norm, so the same mu
regularizes less); at its own best mu the joint prior beats separate TV
on the dim channel by 15-36% in this regime.

    PYTHONPATH=. python examples/multichannel_example.py

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
    convolve,
    convolve_spectrum,
    deconvolve_multichannel,
)

# MICROTIPI_EXAMPLE_TINY=1: CI smoke budgets (tests/test_examples.py);
# quality assertions are skipped there.
TINY = bool(os.environ.get("MICROTIPI_EXAMPLE_TINY"))
DTYPE = jnp.float32 if jax.default_backend() in ("tpu", "axon") else jnp.float64
VOL = (6, 24, 24) if TINY else (16, 64, 64)
KW = dict(shape=VOL, na=1.3, ni=1.518, dxy=100e-9, dz=250e-9,
          n_phase=0, radial=True, dtype=DTYPE)

# ---- chromatic optics: one PSF per emission line -------------------------
LAMBDAS = (488e-9, 647e-9)  # green bright, red dim
models = [WideFieldConfig(wavelength=lam, **KW) for lam in LAMBDAS]
# jit the synthesis: eager dispatch remote-compiles per op on the axon
# runtime and was observed to poison later fetches (CLAUDE.md rules).
psfs = jnp.stack([jax.jit(m.compute_psf)(m.init_params()) for m in models])

# ---- specimen: both labels share the SAME structures, red is 10x dimmer --
rng = np.random.default_rng(0)
obj = np.zeros(VOL)
sl = (slice(2, 4), slice(6, 18), slice(6, 18)) if TINY else \
     (slice(4, 10), slice(16, 44), slice(16, 44))
obj[sl] = 50.0
if not TINY:
    obj[10:14, 44:58, 8:24] = 80.0
objs = jnp.asarray(np.stack([obj, 0.1 * obj]), DTYPE)
data = jax.vmap(lambda o, p: convolve(o, convolve_spectrum(p), VOL))(objs, psfs)
data = data + jnp.asarray(
    0.5 * rng.standard_normal(data.shape), DTYPE)  # heavy noise for the dim ch.

# ---- solve: joint color-TV vs per-channel TV ------------------------------
# mu values are each variant's own tuned weight (the fair comparison);
# the joint prior wants the larger one.
run = jax.jit(lambda d, p, coupling, mu: deconvolve_multichannel(
    d, p,
    config=DeconvolutionConfig(mu=mu, epsilon=1.0,
                               max_iter=8 if TINY else 50, grtol=0.0),
    coupling=coupling).x, static_argnums=(2, 3))
t0 = time.time()
x_joint = np.asarray(run(data, psfs, "joint", 0.1))
x_sep = np.asarray(run(data, psfs, "separate", 0.01))
print(f"two solves (C=2 x {VOL}): {time.time()-t0:.1f}s incl. compile")

def err(x, c):
    t = np.asarray(objs[c])
    return float(np.linalg.norm(x[c] - t) / np.linalg.norm(t))

print(f"bright channel rel-L2: joint {err(x_joint, 0):.3f}  "
      f"separate {err(x_sep, 0):.3f}")
print(f"dim channel rel-L2:    joint {err(x_joint, 1):.3f}  "
      f"separate {err(x_sep, 1):.3f}")
assert TINY or err(x_joint, 1) < err(x_sep, 1), \
    "joint coupling should win on the shared-structure dim channel"

# ---- act 2: spectral crosstalk (joint unmixing) ---------------------------
# Strong bleed-through between the detection channels: recovering the DYE
# volumes through the mixing matrix jointly with deconvolution keeps the
# correct (M^T M)-metric likelihood; the classical pinv unmixing amplifies
# noise along the ill-conditioned spectral direction (BASELINE.md: joint
# -28% error at cond(M^T M) ~ 121). M comes from dye tables or
# single-stain controls (``mixing_from_controls``).
M = jnp.asarray([[0.55, 0.45], [0.45, 0.55]], DTYPE)  # strongly overlapping
clean = jax.vmap(lambda o, p: convolve(o, convolve_spectrum(p), VOL))(objs, psfs)
mixed = jnp.einsum("ck,kzyx->czyx", M, clean) + jnp.asarray(
    0.2 * rng.standard_normal(clean.shape), DTYPE)

run_mix = jax.jit(lambda d, p, m: deconvolve_multichannel(
    d, p, mixing=m,
    config=DeconvolutionConfig(mu=1e-2, epsilon=1.0,
                               max_iter=8 if TINY else 50, grtol=0.0),
    coupling="separate").x)
t0 = time.time()
x_unmix = np.asarray(run_mix(mixed, psfs, M))
print(f"joint unmix-deconv solve: {time.time()-t0:.1f}s incl. compile")
# baseline: classical unmix-then-deconvolve at the same prior
unm = jnp.einsum("kc,czyx->kzyx", jnp.linalg.pinv(M), mixed)
x_seq = np.asarray(run(unm, psfs, "separate", 0.1))
print(f"dye 0 rel-L2: joint-unmix {err(x_unmix, 0):.3f}  "
      f"pinv-then-deconv {err(x_seq, 0):.3f}")
print(f"dye 1 rel-L2: joint-unmix {err(x_unmix, 1):.3f}  "
      f"pinv-then-deconv {err(x_seq, 1):.3f}")
assert TINY or err(x_unmix, 0) < err(x_seq, 0), \
    "joint unmixing should win under strong crosstalk"
print("ok")
