"""Bead-anchored calibration workflow, end to end on synthetic data.

The measured-best pipeline when a bead slide is available (BASELINE.md
bead-anchored table: phase L2 0.0052 vs 0.0197 trusting the calibration vs
1.33 free blind):

1. image a bead field on the same optics as the sample;
2. average the beads (`average_beads` — ~sqrt(K) SNR; detection,
   cross-correlation registration, matched-filter amplitude matching);
3. EITHER fit a calibration once (`fit_psf_beads`) and deconvolve with it,
   OR — better — keep the averaged bead stack in the blind loop as a
   structural anchor (`blind_deconvolve(..., bead_data=...)`): every PSF
   fit then jointly explains the sample and the bead measurement, so the
   pupil cannot drift into the object-absorbed basin and the sample data
   can still correct the calibration's own error.

CLI equivalent:

    python -m microtipi_tpu fitpsf beads.tif --n-beads 8 --params-out cal.json
    python -m microtipi_tpu blind data.tif --out obj.tif --bead beads.tif \\
        --recipe quality

Runs on CPU (x64) in ~2 minutes; see sharded_timelapse_example.py for the
mesh versions of the same calls.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS_OVERRIDE", "cpu"))
jax.config.update("jax_enable_x64", True)

import dataclasses

import numpy as np
import jax.numpy as jnp

from microtipi_tpu import (
    BlindDeconvConfig,
    DeconvolutionConfig,
    WideFieldConfig,
    average_beads,
    blind_deconvolve,
    fit_psf_beads,
)
from microtipi_tpu.jobs.psf_fit import PsfFitConfig
from microtipi_tpu.models.microscope import PHASE
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
from microtipi_tpu.utils.arrays import roll


TINY = bool(os.environ.get("MICROTIPI_EXAMPLE_TINY"))


def main():
    dt = jnp.float64
    shape = (16, 64, 64)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=4, radial=True, dtype=dt)
    rng = np.random.default_rng(0)

    # --- ground truth: an aberrated system and a busy sample ---------------
    true = model.init_params()._replace(
        phase=jnp.asarray([0.25, -0.15, 0.1, 0.05], dt))
    obj = np.zeros(shape)
    for _ in range(12):
        z, y, x = rng.integers(0, 16), rng.integers(6, 58), rng.integers(6, 58)
        obj[z, y, x] = rng.uniform(50, 120)
    obj = jnp.asarray(obj, dt)
    data = convolve(obj, convolve_spectrum(model.compute_psf(true)), shape)
    data = data + 0.01 * float(jnp.max(data)) * jnp.asarray(
        rng.standard_normal(shape), dt)

    # --- 1+2: a bead field on the same optics, averaged --------------------
    bead_patch = (8, 32, 32)
    bead_model = dataclasses.replace(model, shape=bead_patch)
    bead_img = np.asarray(roll(bead_model.compute_psf(true)))
    field = np.zeros((8, 128, 128))
    for (y, x) in [(24, 24), (24, 90), (64, 50), (100, 30), (100, 100)]:
        field[:, y - 16:y + 16, x - 16:x + 16] += rng.uniform(3e4, 6e4) * bead_img
    field = field + 20.0 + 0.3 * rng.standard_normal(field.shape)
    bead, used = average_beads(field, n_beads=8, patch=bead_patch)
    print(f"averaged {used} beads")

    # --- 3a: point-estimate calibration (for reference) ---------------------
    cal, amp = fit_psf_beads(
        bead_model, jnp.asarray(bead), (PHASE,),
        config=PsfFitConfig(max_iter=8 if TINY else 60, grtol=0.0))
    err_cal = float(jnp.linalg.norm(cal.params.phase - true.phase))
    print(f"fit_psf_beads calibration: phase L2 error {err_cal:.4f}")

    # --- 3b: bead-ANCHORED blind solve (the measured-best pipeline) ---------
    cfg = BlindDeconvConfig.recommended(
        loops=2 if TINY else 6, families=(PHASE,),
        psf_max_iter=(3 if TINY else 10,),
        deconv=DeconvolutionConfig(mu=1e-3, epsilon=1.0,
                                   max_iter=4 if TINY else 12, grtol=0.0),
    )
    res = jax.jit(
        lambda d, b: blind_deconvolve(d, model, config=cfg, bead_data=b)
    )(data, jnp.asarray(bead))
    err_anchored = float(jnp.linalg.norm(res.params.phase - true.phase))
    err_obj = float(jnp.linalg.norm(res.obj - obj) / jnp.linalg.norm(obj))
    print(f"bead-anchored blind:       phase L2 error {err_anchored:.4f} "
          f"(object rel err {err_obj:.3f})")
    print("anchored refit improves on trusting the calibration:",
          err_anchored < err_cal)


if __name__ == "__main__":
    main()
