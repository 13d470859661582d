#!/usr/bin/env python
"""North-star benchmark: 256^3 BLIND widefield deconvolution on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

BASELINE.json's north star names *blind* deconvolution ("... >=50x throughput
over CPU-Java on a 256^3 blind widefield deconvolution on one v5e chip at
matched convergence"); ``bench.py`` measures the non-blind object step (the
hot kernel), this script measures the full alternating loop: 5 rounds of
(20-iter TV+positivity VMLMB object update, then a JOINT defocus+phase PSF
fit) as ONE jitted device dispatch (``jobs.blind.blind_deconvolve``; loop
semantics ``BlindDeconvJob.java:97-138``; the joint fit is the framework's
recommended recipe — it both prevents the sequential coordinate-descent's
defocus degradation, BASELINE.md, and halves the fit share of the wall:
measured +25% blind throughput at equal object iterations and
equal-within-1% final cost).

Throughput counts object-step VMLMB iterations (the dominant cost; the PSF
fits ride along, making the figure conservative):
value = voxels * total_object_iterations / wall_seconds (Mvox*iter/s).

Baseline: same workload on this host's CPU via JAX at reduced iteration
counts (throughput is per-iteration so it transfers) — measured 2026-08-16
with /tmp-probe archived in BASELINE.md. See bench.py's docstring for why
the CPU-JAX figure stands in for CPU-Java.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from microtipi_tpu.jobs.blind import BlindDeconvConfig, blind_deconvolve
from microtipi_tpu.jobs.deconv import DeconvolutionConfig
from microtipi_tpu.jobs.psf_fit import PsfFitConfig
from microtipi_tpu.models.microscope import DEFOCUS, PHASE
from microtipi_tpu.models.widefield import WideFieldConfig
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

SHAPE = (256, 256, 256)
LOOPS = 5
OBJ_ITERS = 20
# Measured 2026-08-19 on this host with the SAME code revision AND the same
# joint-fit recipe (36.2 s for 7 object iterations at 256^3, 2-loop/5-iter
# probe; per-iteration throughput transfers; the previous sequential-recipe
# stand-in was 2.56). Both sides benefit from optimizer improvements — the
# stand-in is re-measured whenever the solver or recipe changes. The bf16
# L-BFGS-history lever is TPU-auto only (the CPU path keeps f32 history by
# design), so it does not move the stand-in. See BASELINE.md.
CPU_BASELINE_MVOX_ITER_S = 3.25


def main():
    model = WideFieldConfig(
        shape=SHAPE, na=1.4, wavelength=561e-9, ni=1.518, dxy=80e-9, dz=200e-9,
        n_phase=6, n_modulus=1,
    )
    rng = np.random.default_rng(0)
    obj = jnp.asarray(rng.random(SHAPE, dtype=np.float32) * (rng.random(SHAPE) > 0.999) * 300)
    noise = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)

    @jax.jit
    def make_data(obj, noise):
        true = model.init_params()._replace(
            phase=jnp.asarray([0.15, -0.1, 0.08, 0.0, 0.05, 0.0], jnp.float32)
        )
        psf = model.compute_psf(true)
        d = convolve(obj, convolve_spectrum(psf), SHAPE)
        return d + 0.01 * d.max() * noise

    data = make_data(obj, noise)

    cfg = BlindDeconvConfig(
        loops=LOOPS, families=(DEFOCUS, PHASE), psf_max_iter=(5, 5),
        joint_fit=True,  # recommended recipe; +25% measured (BASELINE.md)
        deconv=DeconvolutionConfig(
            mu=0.01, epsilon=1.0, max_iter=OBJ_ITERS, grtol=0.0, gatol=0.0
        ),
        fit=PsfFitConfig(grtol=0.0),
    )
    run = jax.jit(lambda d: blind_deconvolve(d, model, config=cfg))
    # NOTE: timing fetches a scalar result — on the axon runtime
    # block_until_ready does not actually synchronize, a D2H fetch does.
    res = run(data)
    _ = float(res.deconv_f[-1])  # compile + warm
    best = float("inf")
    best_res = None
    for _i in range(3):
        t0 = time.perf_counter()
        res = run(data)
        _ = float(res.deconv_f[-1])
        dt = time.perf_counter() - t0
        if dt < best:
            best, best_res = dt, res

    iters = int(np.asarray(best_res.deconv_iters).sum())
    if not np.isfinite(np.asarray(best_res.deconv_f)).all():
        raise SystemExit("non-finite blind cost")
    value = float(np.prod(SHAPE)) * iters / best / 1e6

    out = {
        "metric": "blind_deconv_throughput_256cubed",
        "value": round(value, 1),
        "unit": "Mvox*obj_iter/s",
    }
    if CPU_BASELINE_MVOX_ITER_S:
        out["vs_baseline"] = round(value / CPU_BASELINE_MVOX_ITER_S, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
