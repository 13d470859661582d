#!/usr/bin/env python
"""Headline benchmark: 256^3 widefield deconvolution throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.json configs 1-3 core): VMLMB object update at 256^3 —
weighted FFT-convolution data term + fused hyperbolic-TV + positivity — with
the PSF synthesized from the widefield pupil model. Throughput counts
optimizer iterations: value = voxels * iterations / wall_seconds (Mvox*iter/s).

Baseline: the reference publishes no numbers (BASELINE.md) and its Java
dependency closure (TiPi, JTransforms) is not vendored here, so the recorded
stand-in baseline is this same workload on this host's CPU via JAX
(measured 2026-08-16: 5 iters in 27.2 s => 3.08 Mvox*iter/s, 0.184 iters/s;
/tmp reproduction script archived in BASELINE.md). The north-star 50x target
is against CPU Java, which historical TiPi benchmarks place at or below the
JAX-CPU figure (same FFT-bound algorithm, JTransforms vs XLA:CPU FFT), so
vs_baseline >= 50 on this scale is the goal line either way.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
from microtipi_tpu.models.widefield import WideFieldConfig
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

SHAPE = (256, 256, 256)
ITERS = 20
CPU_BASELINE_MVOX_ITER_S = 3.08  # measured stand-in, see module docstring


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
        psf = model.compute_psf(model.init_params())
        d = convolve(obj, convolve_spectrum(psf), SHAPE)
        return d + 0.01 * d.max() * noise, psf

    data, psf = make_data(obj, noise)

    cfg = DeconvolutionConfig(mu=0.01, epsilon=1.0, max_iter=ITERS, grtol=0.0, gatol=0.0)
    run = jax.jit(lambda d, p: deconvolve(d, p, config=cfg))
    # NOTE: timing fetches a scalar result — on the axon runtime
    # block_until_ready does not actually synchronize, a D2H fetch does.
    res = run(data, psf)
    _ = float(res.f)  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = run(data, psf)
        _ = float(res.f)
        best = min(best, time.perf_counter() - t0)

    # Count the iterations actually performed (an early Wolfe stop on some
    # runtime/toolchain combination must degrade the number, not kill the run).
    iters = int(res.iterations)
    if not bool(jnp.isfinite(res.f)):
        raise SystemExit("non-finite final cost")
    value = float(np.prod(SHAPE)) * iters / best / 1e6

    print(json.dumps({
        "metric": "deconv_throughput_256cubed",
        "value": round(value, 1),
        "unit": "Mvox*iter/s",
        "vs_baseline": round(value / CPU_BASELINE_MVOX_ITER_S, 1),
    }))


if __name__ == "__main__":
    main()
