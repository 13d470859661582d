#!/usr/bin/env python
"""Headline benchmark: 256^3 widefield deconvolution throughput on one chip.

Prints ONE JSON line carrying BOTH headline figures:

  {"metric": "deconv_throughput_256cubed", "value": ..., "unit": "Mvox*iter/s",
   "value_median": ..., "value_spread": [lo, hi], "reps": N,
   "vs_baseline": ..., "blind_value": ..., "blind_unit": "Mvox*obj_iter/s",
   "blind_value_spread": [lo, hi], "blind_vs_baseline": ...,
   "baseline_source": "measured"|"frozen", ...}

``value``/``blind_value`` are MEDIANS over ``reps`` steady post-compile
repetitions (the shared chip shows ~40% contention spread — BASELINE.md —
so single draws are unreadable; the spread is published alongside).

`value` is the non-blind object step (the hot kernel, BASELINE.json configs
1-3 core): VMLMB object update at 256^3 — weighted FFT-convolution data term
+ fused hyperbolic-TV + positivity — with the PSF synthesized from the
widefield pupil model. `blind_value` is the NORTH STAR (BASELINE.json:
"... >=50x throughput over CPU-Java on a 256^3 blind widefield deconvolution
on one v5e chip at matched convergence"): 5 rounds of (20-iter object update,
then a joint defocus+phase PSF fit) as ONE jitted dispatch
(``jobs.blind.blind_deconvolve``; loop semantics per the reference
``BlindDeconvJob.java:97-138``). Throughput counts object-step VMLMB
iterations: value = voxels * iterations / wall_seconds (Mvox*iter/s).

Baseline: the reference publishes no numbers (BASELINE.md) and its Java
dependency closure (TiPi, JTransforms) is not vendored here, so the baseline
is this same workload on this host's CPU via JAX. By default the bench
RE-MEASURES that stand-in in a same-session subprocess (JAX_PLATFORMS=cpu,
reduced iteration counts — throughput is per-iteration so it transfers) and
derives vs_baseline from the measurement; the frozen constants below
(measured 2026-08-16/19, probe scripts archived in BASELINE.md) are the
fallback when the probe fails or MICROTIPI_BENCH_SKIP_PROBE=1. The
north-star 50x target is against CPU Java, which historical TiPi benchmarks
place at or below the JAX-CPU figure (same FFT-bound algorithm, JTransforms
vs XLA:CPU FFT), so vs_baseline >= 50 on this scale is the goal line either
way.

Usage:
  bench.py                    # full: TPU measures + CPU probes, one JSON line
  bench.py --cpu-probe deconv # internal: reduced CPU probe (prints one JSON)
  bench.py --cpu-probe blind  # internal: reduced blind CPU probe
"""

import json
import os
import subprocess
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from microtipi_tpu.jobs.blind import BlindDeconvConfig, blind_deconvolve
from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
from microtipi_tpu.jobs.psf_fit import PsfFitConfig
from microtipi_tpu.models.microscope import DEFOCUS, PHASE
from microtipi_tpu.models.widefield import WideFieldConfig
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

SHAPE = (256, 256, 256)
ITERS = 20
BLIND_LOOPS = 5
BLIND_OBJ_ITERS = 20

# Frozen fallback stand-ins (same workloads on this host's CPU via JAX;
# measured 2026-08-16 (deconv: 5 iters in 27.2 s) and 2026-08-19 (blind,
# same joint-fit recipe: 36.2 s for 7 object iterations). Used only when the
# same-session probe is skipped or fails; the probe re-measures both.
CPU_BASELINE_MVOX_ITER_S = 3.08
CPU_BASELINE_BLIND_MVOX_ITER_S = 3.25


def _model():
    return WideFieldConfig(
        shape=SHAPE, na=1.4, wavelength=561e-9, ni=1.518, dxy=80e-9, dz=200e-9,
        n_phase=6, n_modulus=1,
    )


def _object_and_noise():
    rng = np.random.default_rng(0)
    obj = jnp.asarray(
        rng.random(SHAPE, dtype=np.float32) * (rng.random(SHAPE) > 0.999) * 300
    )
    noise = jnp.asarray(rng.standard_normal(SHAPE), jnp.float32)
    return obj, noise


def measure_deconv(iters=ITERS, repeats=5):
    """Non-blind object step. Returns the per-repetition list of Mvox*iter/s
    (one entry per steady post-compile run; see :func:`stats`)."""
    model = _model()
    obj, noise = _object_and_noise()

    @jax.jit
    def make_data(obj, noise):
        psf = model.compute_psf(model.init_params())
        d = convolve(obj, convolve_spectrum(psf), SHAPE)
        return d + 0.01 * d.max() * noise, psf

    data, psf = make_data(obj, noise)

    cfg = DeconvolutionConfig(mu=0.01, epsilon=1.0, max_iter=iters, grtol=0.0, gatol=0.0)
    run = jax.jit(lambda d, p: deconvolve(d, p, config=cfg))
    # NOTE: timing fetches a scalar result — on the axon runtime
    # block_until_ready does not actually synchronize, a D2H fetch does.
    res = run(data, psf)
    _ = float(res.f)  # compile + warm
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = run(data, psf)
        _ = float(res.f)
        walls.append(time.perf_counter() - t0)

    # Count the iterations actually performed (an early Wolfe stop on some
    # runtime/toolchain combination must degrade the number, not kill the run).
    n = int(res.iterations)
    if not bool(jnp.isfinite(res.f)):
        raise SystemExit("non-finite final cost")
    return [float(np.prod(SHAPE)) * n / w / 1e6 for w in walls]


def measure_deconv_admm(iters=ITERS, repeats=5):
    """Informational lane: the adopted round-4 ADMM engine on the IDENTICAL
    workload/iteration count (jobs/admm.py; BASELINE.md engine
    head-to-head — at 20 iterations it reaches a LOWER objective than any
    measured VMLMB budget, so Mvox*iter/s at equal iters understates its
    real seconds-to-quality advantage). The headline stays VMLMB (the
    reference-parity protocol); this key documents the engine's throughput
    in the same driver artifact."""
    from microtipi_tpu.jobs.admm import admm_deconvolve

    model = _model()
    obj, noise = _object_and_noise()

    @jax.jit
    def make_data(obj, noise):
        psf = model.compute_psf(model.init_params())
        d = convolve(obj, convolve_spectrum(psf), SHAPE)
        return d + 0.01 * d.max() * noise, psf

    data, psf = make_data(obj, noise)
    cfg = DeconvolutionConfig(mu=0.01, epsilon=1.0, max_iter=iters,
                              grtol=0.0, gatol=0.0)
    run = jax.jit(lambda d, p: admm_deconvolve(d, p, config=cfg,
                                               track_objective=False))
    res = run(data, psf)
    _ = float(res.f)
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = run(data, psf)
        _ = float(res.f)
        walls.append(time.perf_counter() - t0)
    if not bool(jnp.isfinite(res.f)):
        raise SystemExit("non-finite admm final cost")
    return [float(np.prod(SHAPE)) * iters / w / 1e6 for w in walls]


def measure_blind(loops=BLIND_LOOPS, obj_iters=BLIND_OBJ_ITERS, psf_iters=5, repeats=5):
    """North-star blind loop (``BlindDeconvJob.java:97-138`` semantics).

    5 rounds of (TV+positivity VMLMB object update, then a JOINT
    defocus+phase PSF fit) as ONE jitted device dispatch. The joint fit is
    the framework's recommended recipe — it both prevents the sequential
    coordinate-descent's defocus degradation (BASELINE.md) and halves the
    fit share of the wall: measured +25% blind throughput at equal object
    iterations and equal-within-1% final cost. Throughput counts object-step
    iterations (the dominant cost; the PSF fits ride along, making the
    figure conservative). Returns the per-repetition list of Mvox*obj_iter/s.
    """
    model = _model()
    obj, noise = _object_and_noise()

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
        loops=loops, families=(DEFOCUS, PHASE), psf_max_iter=(psf_iters, psf_iters),
        joint_fit=True,  # recommended recipe; +25% measured (BASELINE.md)
        deconv=DeconvolutionConfig(
            mu=0.01, epsilon=1.0, max_iter=obj_iters, grtol=0.0, gatol=0.0
        ),
        fit=PsfFitConfig(grtol=0.0),
    )
    run = jax.jit(lambda d: blind_deconvolve(d, model, config=cfg))
    res = run(data)
    _ = float(res.deconv_f[-1])  # compile + warm
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = run(data)
        _ = float(res.deconv_f[-1])
        walls.append(time.perf_counter() - t0)

    n = int(np.asarray(res.deconv_iters).sum())
    if not np.isfinite(np.asarray(res.deconv_f)).all():
        raise SystemExit("non-finite blind cost")
    return [float(np.prod(SHAPE)) * n / w / 1e6 for w in walls]


def measure_blind_admm(loops=BLIND_LOOPS, obj_iters=BLIND_OBJ_ITERS,
                       psf_iters=5, repeats=5):
    """Informational lane: the RECOMMENDED production recipe on the
    north-star workload — annealed mu_schedule + joint fit + ADMM object
    engine (``BlindDeconvConfig.recommended(deconv_engine="admm")``;
    BASELINE.md "ADMM engine inside the blind loop": measured 870-894
    Mvox*obj_iter/s on-chip vs ~507 for the constant-mu VMLMB protocol).
    The headline ``blind_value`` stays the VMLMB/constant-mu protocol (its
    CPU stand-in ratio and fixed budget define the north-star continuity);
    this key records what the framework actually delivers (VERDICT r4
    item 3). Same iteration counting: object iterations only.
    """
    model = _model()
    obj, noise = _object_and_noise()

    @jax.jit
    def make_data(obj, noise):
        true = model.init_params()._replace(
            phase=jnp.asarray([0.15, -0.1, 0.08, 0.0, 0.05, 0.0], jnp.float32)
        )
        psf = model.compute_psf(true)
        d = convolve(obj, convolve_spectrum(psf), SHAPE)
        return d + 0.01 * d.max() * noise

    data = make_data(obj, noise)

    cfg = BlindDeconvConfig.recommended(
        loops=loops, families=(DEFOCUS, PHASE),
        psf_max_iter=(psf_iters, psf_iters),
        deconv_engine="admm",
        deconv=DeconvolutionConfig(
            mu=0.01, epsilon=1.0, max_iter=obj_iters, grtol=0.0, gatol=0.0
        ),
        fit=PsfFitConfig(grtol=0.0),
    )
    run = jax.jit(lambda d: blind_deconvolve(d, model, config=cfg))
    res = run(data)
    _ = float(res.deconv_f[-1])
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = run(data)
        _ = float(res.deconv_f[-1])
        walls.append(time.perf_counter() - t0)
    n = int(np.asarray(res.deconv_iters).sum())
    if not np.isfinite(np.asarray(res.deconv_f)).all():
        raise SystemExit("non-finite blind admm cost")
    return [float(np.prod(SHAPE)) * n / w / 1e6 for w in walls]


def stats(values):
    """(median, lo, hi, reps) of a per-repetition throughput list.

    The shared chip shows ~40% run-to-run spread from contention
    (BASELINE.md); a single draw is unreadable at the ±10% level, so the
    JSON line carries the median as the headline plus the spread
    (VERDICT r3 item 5). BASELINE.md quotes medians henceforth.
    """
    v = sorted(values)
    return float(np.median(v)), v[0], v[-1], len(v)


def _run_cpu_probe(kind, timeout=1500):
    """Re-measure the CPU stand-in in a subprocess. Returns Mvox*iter/s or None."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-probe", kind],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
        line = out.stdout.strip().splitlines()[-1]
        return float(json.loads(line)["mvox_iter_s"])
    except Exception:
        return None


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if argv[:1] == ["--cpu-probe"]:
        # Reduced-iteration same-host CPU measurement (throughput is
        # per-iteration, so the figure transfers to the full counts).
        # The axon sitecustomize selects its backend regardless of the
        # JAX_PLATFORMS env var, so force the CPU platform via config BEFORE
        # any backend touch and verify — a probe that silently lands on the
        # chip would report vs_baseline ~1 (observed 2026-08-19).
        jax.config.update("jax_platforms", "cpu")
        # No persistent cache for the CPU probe: the XLA:CPU executable
        # serialization segfaults intermittently on some hosts (rc=139;
        # see CLAUDE.md) — a crashed probe would silently fall back to the
        # frozen constant.
        jax.config.update("jax_compilation_cache_dir", None)
        if jax.devices()[0].platform != "cpu":
            raise SystemExit(f"cpu probe landed on {jax.devices()[0].platform}")
        kind = argv[1]
        if kind == "deconv":
            v = measure_deconv(iters=5, repeats=1)  # the 2026-08-16 protocol
        else:
            v = measure_blind(loops=2, obj_iters=5, psf_iters=2, repeats=1)
        print(json.dumps({"mvox_iter_s": round(v[0], 3)}))
        return

    value, lo, hi, reps = stats(measure_deconv())
    blind_value, blo, bhi, _ = stats(measure_blind())
    try:
        admm_value, alo, ahi, _ = stats(measure_deconv_admm())
        admm_extra = {"admm_value": round(admm_value, 1),
                      "admm_value_spread": [round(alo, 1), round(ahi, 1)],
                      "admm_unit": "Mvox*iter/s (same workload/iters; "
                                   "reaches a lower objective — BASELINE.md)"}
    except SystemExit:
        raise
    except Exception:
        admm_extra = {}  # informational lane must not kill the headline
    try:
        bav, balo, bahi, _ = stats(measure_blind_admm())
        admm_extra.update({
            "blind_admm_value": round(bav, 1),
            "blind_admm_value_spread": [round(balo, 1), round(bahi, 1)],
            "blind_admm_unit": "Mvox*obj_iter/s (recommended recipe: "
                               "annealed + joint fit + admm engine — "
                               "BASELINE.md)"})
    except SystemExit:
        raise
    except Exception:
        pass  # informational lane must not kill the headline

    base, blind_base, source = (
        CPU_BASELINE_MVOX_ITER_S, CPU_BASELINE_BLIND_MVOX_ITER_S, "frozen",
    )
    out_extra = {}
    if not os.environ.get("MICROTIPI_BENCH_SKIP_PROBE"):
        p = _run_cpu_probe("deconv")
        pb = _run_cpu_probe("blind")
        if p and pb:
            base, blind_base, source = p, pb, "measured"
            out_extra = {
                "cpu_probe_mvox_iter_s": round(p, 2),
                "cpu_probe_blind_mvox_iter_s": round(pb, 2),
            }

    print(json.dumps({
        "metric": "deconv_throughput_256cubed",
        "value": round(value, 1),
        "value_median": round(value, 1),
        "value_spread": [round(lo, 1), round(hi, 1)],
        "reps": reps,
        "unit": "Mvox*iter/s",
        "vs_baseline": round(value / base, 1),
        "blind_metric": "blind_deconv_throughput_256cubed",
        "blind_value": round(blind_value, 1),
        "blind_value_spread": [round(blo, 1), round(bhi, 1)],
        "blind_unit": "Mvox*obj_iter/s",
        "blind_vs_baseline": round(blind_value / blind_base, 1),
        "baseline_source": source,
        **admm_extra,
        **out_extra,
    }))


if __name__ == "__main__":
    main()
