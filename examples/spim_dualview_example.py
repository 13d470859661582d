"""Dual-view SPIM pipeline: bead calibration -> registration -> joint fusion.

The end-to-end light-sheet workflow the new ``LightSheetConfig`` family
exists for (the reference models epifluorescence only,
``epifluorescence/WideFieldModel.java``; SPIM is the ecosystem workload its
blind-deconvolution machinery gets applied to):

1. each arm's PSF is calibrated from a bead stack with
   ``fit_psf_beads((DEFOCUS, SHEET))`` — the profiled-amplitude bead
   objective recovers the detection defocus AND the excitation-sheet
   geometry (offset z0, waist w0) per view;
2. the second view (acquired through the orthogonal arm, already rotated
   into the common frame as SPIM pipelines do) is registered by subvoxel
   phase correlation and aligned with an exact Fourier shift;
3. the views are fused by joint-MLE Richardson-Lucy with the *calibrated*
   per-view PSFs — each view is sharp along a different axis, and the
   fusion recovers near-isotropic detail no single view contains.

    PYTHONPATH=. python examples/spim_dualview_example.py

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
    DEFOCUS,
    LightSheetConfig,
    PsfFitConfig,
    convolve,
    convolve_spectrum,
)
from microtipi_tpu.jobs.psf_fit import fit_psf_beads
from microtipi_tpu.jobs.richardson_lucy import multiview_richardson_lucy
from microtipi_tpu.models.microscope import SHEET
from microtipi_tpu.ops.register import fourier_shift, register_translation

# MICROTIPI_EXAMPLE_TINY=1: CI smoke budgets (tests/test_examples.py).
TINY = bool(os.environ.get("MICROTIPI_EXAMPLE_TINY"))
SHAPE = (16, 16, 16) if TINY else (32, 32, 32)  # cubic: orthogonal view transposes onto the grid
DTYPE = jnp.float32 if jax.default_backend() in ("tpu", "axon") else jnp.float64
MODEL = LightSheetConfig(
    shape=SHAPE, na=0.8, wavelength=520e-9, ni=1.33, dxy=200e-9, dz=200e-9,
    sheet_na=0.15, wavelength_exc=488e-9, n_phase=2, radial=True, dtype=DTYPE,
)

# Per-arm ground truth: each arm has its own small aberration and its own
# sheet misalignment (what a real instrument needs calibrated per view).
TRUE = {
    "view A": MODEL.init_params()._replace(
        phase=jnp.asarray([0.2, -0.1], DTYPE),
        sheet=jnp.asarray([0.15e-6, 1.3 * MODEL.waist], DTYPE)),
    "view B": MODEL.init_params()._replace(
        phase=jnp.asarray([-0.15, 0.1], DTYPE),
        sheet=jnp.asarray([-0.1e-6, 1.15 * MODEL.waist], DTYPE)),
}

rng = np.random.default_rng(0)
obj = np.zeros(SHAPE, np.float32)
pts = rng.integers(4, SHAPE[0] - 6, size=(30, 3))
obj[pts[:, 0], pts[:, 1], pts[:, 2]] = rng.uniform(150, 300, 30)
c0, c1 = SHAPE[0] * 3 // 8, SHAPE[0] * 5 // 8
obj[c0:c1, c0:c1, c0:c1] += 50.0
obj = jnp.asarray(obj, DTYPE)
TRUE_SHIFT = (0.0, 1.6, -2.3)  # view B's mechanical offset (voxels)


def orthogonal(h):
    """Rotate a PSF into the common frame for the second arm (detection and
    sheet axes swapped: z <-> y). Corner-origin survives transposition."""
    return jnp.transpose(h, (1, 0, 2))


# ---- 1. bead calibration per view --------------------------------------
@jax.jit
def calibrate():
    out = {}
    for name, true_p in TRUE.items():
        bead = 4e3 * MODEL.compute_psf(true_p)
        res, _amp = fit_psf_beads(
            MODEL, bead, families=(DEFOCUS, SHEET),
            config=PsfFitConfig(max_iter=5 if TINY else 40, grtol=0.0),
        )
        out[name] = res.params
    return out


t0 = time.time()
fitted = calibrate()
for name, p in fitted.items():
    z0, w0 = np.asarray(p.sheet)
    tz0, tw0 = np.asarray(TRUE[name].sheet)
    print(f"{name}: fitted sheet z0 {z0 * 1e9:7.1f} nm (true {tz0 * 1e9:7.1f}), "
          f"w0 {w0 * 1e9:7.1f} nm (true {tw0 * 1e9:7.1f})")
print(f"calibration: {time.time() - t0:.1f}s\n")

# ---- 2. acquire + register ---------------------------------------------
@jax.jit
def acquire(obj):
    h_a = MODEL.compute_psf(TRUE["view A"])
    h_b = orthogonal(MODEL.compute_psf(TRUE["view B"]))
    view_a = convolve(obj, convolve_spectrum(h_a), SHAPE)
    view_b = convolve(obj, convolve_spectrum(h_b), SHAPE)
    view_b = fourier_shift(view_b, jnp.asarray(TRUE_SHIFT, DTYPE))
    return view_a, view_b


view_a, view_b = acquire(obj)


@jax.jit
def register(view_a, view_b):
    # Blur-match first (ops/register.py docstring): the views carry
    # DIFFERENT PSFs, so raw phase correlation is biased along the blur
    # axes (measured ~0.5 voxel here). Cross-blurring with the *calibrated*
    # PSFs makes both sides psf_a*psf_b*object and the estimate exact.
    h_a = MODEL.compute_psf(fitted["view A"])
    h_b = orthogonal(MODEL.compute_psf(fitted["view B"]))
    a_m = convolve(view_a, convolve_spectrum(h_b), SHAPE)
    b_m = convolve(view_b, convolve_spectrum(h_a), SHAPE)
    return register_translation(a_m, b_m)


shift = register(view_a, view_b)
print(f"registered shift: {np.round(np.asarray(shift), 2)} (true {tuple(-s for s in TRUE_SHIFT)})")
view_b_reg = jax.jit(fourier_shift)(view_b, shift)

# ---- 3. fuse with the CALIBRATED per-view PSFs -------------------------
@jax.jit
def fuse(view_a, view_b_reg):
    h_a = MODEL.compute_psf(fitted["view A"])
    h_b = orthogonal(MODEL.compute_psf(fitted["view B"]))
    views = jnp.stack([view_a, view_b_reg])
    psfs = jnp.stack([h_a / jnp.sum(h_a), h_b / jnp.sum(h_b)])
    return multiview_richardson_lucy(views, psfs,
                                     iterations=8 if TINY else 60)


fused = fuse(view_a, view_b_reg)
_ = float(jnp.sum(fused))
t0 = time.time()
fused = fuse(view_a, view_b_reg)
err = float(jnp.linalg.norm(fused - obj) / jnp.linalg.norm(obj))
steady = time.time() - t0
for name, v in [("view A", view_a), ("view B", view_b_reg)]:
    e = float(jnp.linalg.norm(v - obj) / jnp.linalg.norm(obj))
    print(f"{name:8s} rel L2 vs truth: {e:.3f}")
print(f"fused    rel L2 vs truth: {err:.3f}  ({steady:.2f}s steady)")
assert TINY or err < min(
    float(jnp.linalg.norm(view_a - obj) / jnp.linalg.norm(obj)),
    float(jnp.linalg.norm(view_b_reg - obj) / jnp.linalg.norm(obj)),
), "fusion must beat both raw views"
print("dual-view SPIM pipeline OK")
