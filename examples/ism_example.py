"""ISM / Airyscan reconstruction, end to end.

The scenario the feature exists for (docs/TUNING.md ISM section): a
confocal with a hex detector array records K element images per scan
position; each element sees the excitation spot times a displaced
detection PSF, so naive summing (= open pinhole) wastes the resolution
the array measured. The pipeline walked here:

1. simulate the K raw element images of a filament phantom (one batched
   forward model through ``ISMConfig.compute_psfs``);
2. pixel reassignment (``ism_reassign``) — the classical ISM image, with
   the matching PSF from ``ISMConfig.compute_psf`` (identity pinned by
   tests);
3. "Airyscan joint deconvolution" = reassignment + regularized solve;
4. the joint multi-element Poisson MLE alternative
   (``ism_richardson_lucy``) — exact per-element physics (BASELINE.md:
   wins only on photon-limited data, at K times the cost).

    PYTHONPATH=. python examples/ism_example.py

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
    ISMConfig,
    deconvolve,
    ism_reassign,
    ism_richardson_lucy,
)

TINY = bool(os.environ.get("MICROTIPI_EXAMPLE_TINY"))
DTYPE = jnp.float32 if jax.default_backend() in ("tpu", "axon") else jnp.float64
SHAPE = (4, 24, 24) if TINY else (8, 48, 48)
RINGS = 1 if TINY else 2
ITERS = 8 if TINY else 60

model = ISMConfig(shape=SHAPE, na=1.2, wavelength=520e-9,
                  wavelength_exc=488e-9, ni=1.33, dxy=60e-9, dz=250e-9,
                  element_pitch=1.5 * 60e-9, rings=RINGS, dtype=DTYPE)
params = model.init_params()
print(f"detector array: {model.n_elements} elements "
      f"({RINGS} hex rings, pitch {model.element_pitch*1e9:.0f} nm)")

# ---- phantom + acquisition ----------------------------------------------
rng = np.random.default_rng(0)
obj = np.zeros(SHAPE)
for _ in range(3 if TINY else 6):
    z = rng.integers(1, SHAPE[0] - 1)
    y, x = rng.integers(6, SHAPE[1] - 6, size=2)
    obj[z, y - 3:y + 3, x] = rng.uniform(30, 60)
    obj[z, y, x - 3:x + 3] = rng.uniform(30, 60)
cz, cy = SHAPE[0] // 2, SHAPE[1] // 2
obj[cz, cy, cy - 2] = 80.0
obj[cz, cy, cy + 2] = 80.0  # a 240 nm pair, unresolved by the raw sum
obj = jnp.asarray(obj, DTYPE)


@jax.jit
def acquire(x, key):
    hk = model.compute_psfs(params)
    data = jnp.fft.irfftn(
        jnp.fft.rfftn(hk, axes=(1, 2, 3)) * jnp.fft.rfftn(x)[None],
        s=SHAPE, axes=(1, 2, 3))
    noise = 0.01 * jnp.max(data) * jax.random.normal(key, data.shape, DTYPE)
    return jnp.maximum(data + noise, 0.0)


data = acquire(obj, jax.random.PRNGKey(1))

# ---- the three reconstructions ------------------------------------------
t0 = time.time()


@jax.jit
def routes(d):
    raw = jnp.sum(d, axis=0)                       # open pinhole
    re = jnp.maximum(ism_reassign(model, d), 0.0)  # ISM image
    h_ism = model.compute_psf(params)
    dec = deconvolve(re, h_ism, config=DeconvolutionConfig(
        mu=0.005, max_iter=ITERS)).x               # Airyscan-style joint deconv
    joint = ism_richardson_lucy(model, params, d, iterations=ITERS)
    return raw, re, dec, joint


raw, re, dec, joint = routes(data)


def err(a):
    a = jnp.maximum(a, 0.0) * jnp.sum(obj) / jnp.maximum(jnp.sum(a), 1e-12)
    return float(jnp.linalg.norm(a - obj) / jnp.linalg.norm(obj))


e = {k: err(v) for k, v in
     [("raw sum", raw), ("reassigned", re), ("reassign+deconv", dec),
      (f"joint MLE RL{ITERS}", joint)]}
print(f"reconstructed in {time.time()-t0:.1f}s (incl. compile)")
for k, v in e.items():
    print(f"  error vs truth, {k}: {v:.3f}")


def pair_contrast(a):
    a = np.asarray(a)
    pk = (a[cz, cy, cy - 2] + a[cz, cy, cy + 2]) / 2
    return float(a[cz, cy, cy] / max(pk, 1e-9))


print(f"240 nm pair valley/peak: raw {pair_contrast(raw):.2f} -> "
      f"reassigned {pair_contrast(re):.2f} -> "
      f"deconvolved {pair_contrast(dec):.2f} (lower = resolved)")
if not TINY:
    assert e["reassign+deconv"] < e["reassigned"] < e["raw sum"]
    assert pair_contrast(dec) < 0.3 < pair_contrast(raw)
print("ISM example OK")
