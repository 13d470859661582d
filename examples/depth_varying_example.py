"""Depth-varying deconvolution: when one PSF is a lie.

Imaging deep into a refractive-index-mismatched sample (ns != ni) makes the
PSF depth-dependent — the Gibson-Lanni spherical aberration grows linearly
with depth (``models/gibson_lanni.py``), so a single shift-invariant PSF is
wrong at most planes of a thick stack. This example:

1. simulates a thick specimen under the depth-varying blur
   ``H x = sum_k h_k (*) (w_k ⊙ x)`` (K anchor PSFs blended along z,
   ``ops/depthconv.py``);
2. deconvolves it three ways — with the (mismatched) top-of-stack PSF, with
   the best single compromise PSF (mid-stack), and with the depth-varying
   operator — and reports the recovery error of each;
3. shows the whole depth-varying solve is one jitted program (anchor
   synthesis is a single vmapped/batched-FFT call).

    PYTHONPATH=. python examples/depth_varying_example.py

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

from microtipi_tpu import DeconvolutionConfig, GibsonLanniConfig, deconvolve
from microtipi_tpu.jobs.depthvar import deconvolve_depthvar, depth_anchor_psfs
from microtipi_tpu.ops.depthconv import depth_varying_convolve, depth_weights

# MICROTIPI_EXAMPLE_TINY=1: CI smoke shapes/budgets (tests/test_examples.py);
# quality assertions are skipped there (they need the full budgets).
TINY = bool(os.environ.get("MICROTIPI_EXAMPLE_TINY"))
SHAPE = (16, 48, 48) if TINY else (32, 128, 128)
DTYPE = jnp.float32 if jax.default_backend() in ("tpu", "axon") else jnp.float64
K = 3 if TINY else 4  # anchor PSFs

model = GibsonLanniConfig(
    shape=SHAPE, na=1.3, wavelength=520e-9, ni=1.518, dxy=100e-9, dz=300e-9,
    n_phase=0, n_modulus=1, ns=1.36, depth=0.0, dtype=DTYPE,
)
anchors = np.linspace(0.0, SHAPE[0] - 1.0, K)

# Specimen: extended structures (blocks) through the whole depth range —
# what TV-regularized deconvolution actually recovers (puncta under TV
# barely move the L2 metric).
rng = np.random.default_rng(0)
obj = np.zeros(SHAPE, np.float64)
for _ in range(40):
    z = rng.integers(1, SHAPE[0] - 4)
    y, x = rng.integers(6, SHAPE[1] - 14), rng.integers(6, SHAPE[2] - 14)
    obj[z:z + 3, y:y + 8, x:x + 8] = rng.uniform(50, 250)
obj = jnp.asarray(obj, DTYPE)
noise = jnp.asarray(rng.standard_normal(SHAPE), DTYPE)

cfg = DeconvolutionConfig(mu=1e-3, epsilon=1.0, max_iter=5 if TINY else 25,
                          grtol=0.0)


@jax.jit
def run(obj, noise):
    params = model.init_params()
    stack = depth_anchor_psfs(model, params, anchors)  # one batched synthesis
    zw = jnp.asarray(depth_weights(SHAPE[0], anchors), DTYPE)
    k_hat = jnp.fft.rfftn(stack, axes=(1, 2, 3))
    data = depth_varying_convolve(obj, k_hat, zw, SHAPE)
    data = data + 0.005 * jnp.max(data) * noise

    res_dv = deconvolve_depthvar(data, stack, anchors, config=cfg)
    res_top = deconvolve(data, stack[0], config=cfg)   # top-of-stack PSF
    res_mid = deconvolve(data, stack[K // 2], config=cfg)  # compromise PSF

    def rel(x):
        return jnp.linalg.norm(x - obj) / jnp.linalg.norm(obj)

    return rel(data), rel(res_top.x), rel(res_mid.x), rel(res_dv.x), res_dv.f


t0 = time.perf_counter()
out = run(obj, noise)
vals = [float(v) for v in out]  # fetch = sync on the axon runtime
print(f"first call (incl. compile): {time.perf_counter() - t0:.1f} s")
t0 = time.perf_counter()
vals = [float(v) for v in run(obj, noise)]
print(f"steady: {time.perf_counter() - t0:.2f} s "
      f"(3 x {cfg.max_iter}-iter solves at {SHAPE}, K={K})")

raw, top, mid, dv, f = vals
print(f"\nrelative recovery error vs ground truth (lower is better):")
print(f"  raw data                      {raw:.4f}")
print(f"  single PSF (top of stack)     {top:.4f}")
print(f"  single PSF (mid compromise)   {mid:.4f}")
print(f"  depth-varying (K={K} anchors)  {dv:.4f}")
assert TINY or dv < mid < top or dv < top, "depth-aware solve should win"

# ---------------------------------------------------------------------------
# Act 2 — where does ns come from? A depth LADDER: beads at known z positions.
#
# Estimating the sample index blind from the sample alone is a measured dead
# end (the object absorbs the depth aberration — BASELINE.md), but beads at
# K >= 2 KNOWN depths pin ns through the slope of spherical aberration vs
# depth (``jobs/depthvar.calibrate_depth``; CLI ``fitpsf --depth-ladder``).
# ---------------------------------------------------------------------------
from microtipi_tpu.jobs.depthvar import calibrate_depth
from microtipi_tpu.jobs.psf_fit import PsfFitConfig
from microtipi_tpu.models.microscope import DEPTH

BEAD_SHAPE = (SHAPE[0], 32, 32)
bead_model = GibsonLanniConfig(
    shape=BEAD_SHAPE, na=1.3, wavelength=520e-9, ni=1.518, dxy=100e-9,
    dz=300e-9, n_phase=0, n_modulus=1, ns=1.36, depth=0.0, dtype=DTYPE,
)
ladder_z = np.array([0.0, (SHAPE[0] - 1) / 2.0, SHAPE[0] - 1.0])
p_truth = bead_model.init_params()  # carries the TRUE ns=1.36


@jax.jit
def make_ladder(noise_rungs):
    def one(zj, nz):
        h = bead_model.compute_psf(
            p_truth._replace(depth=p_truth.depth.at[1].set(zj * bead_model.dz)))
        return 2e4 * h + 20.0 + 3.0 * nz
    return jnp.stack([one(z, noise_rungs[j]) for j, z in enumerate(ladder_z)])


beads = make_ladder(jnp.asarray(
    rng.standard_normal((3,) + BEAD_SHAPE), DTYPE))

# Start from the WRONG index (1.45) — a typical "mounting medium datasheet
# said so" guess — and let the ladder pull it back.
p_wrong = p_truth._replace(
    depth=jnp.asarray([1.45 / bead_model.wavelength, 0.0], DTYPE))
fit, zshifts = jax.jit(lambda b: calibrate_depth(
    bead_model, b, ladder_z, families=(DEPTH,), params0=p_wrong,
    config=PsfFitConfig(max_iter=8 if TINY else 50, grtol=0.0)))(beads)
ns_fit = float(fit.params.depth[0]) * bead_model.wavelength
print(f"\ndepth ladder ({ladder_z.size} rungs, init ns=1.45): "
      f"calibrated ns = {ns_fit:.4f} (truth 1.36)")
assert TINY or abs(ns_fit - 1.36) < 0.01, "ladder should recover ns"

# Re-solve the SAMPLE with anchors synthesized from the calibrated ns — the
# production workflow (``deconv --depthvar K --params-json ladder.json``).
cal_params = model.init_params()._replace(
    depth=jnp.asarray(np.asarray(fit.params.depth), DTYPE))


@jax.jit
def resolve(obj, noise):
    true_stack = depth_anchor_psfs(model, model.init_params(), anchors)
    zw = jnp.asarray(depth_weights(SHAPE[0], anchors), DTYPE)
    data = depth_varying_convolve(obj, jnp.fft.rfftn(true_stack, axes=(1, 2, 3)),
                                  zw, SHAPE)
    data = data + 0.005 * jnp.max(data) * noise
    cal_stack = depth_anchor_psfs(model, cal_params, anchors,
                                  depth0=cal_params.depth[1])
    res = deconvolve_depthvar(data, cal_stack, anchors, config=cfg)
    return jnp.linalg.norm(res.x - obj) / jnp.linalg.norm(obj)


err_cal = float(resolve(obj, noise))
print(f"calibrated-anchor solve error {err_cal:.4f} "
      f"(oracle anchors gave {dv:.4f})")
assert TINY or err_cal < mid, \
    "calibrated depth-varying solve should beat the best single PSF"
