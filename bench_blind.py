#!/usr/bin/env python
"""North-star benchmark: 256^3 BLIND widefield deconvolution on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Standalone entry for the blind figure only; the workload lives in
``bench.measure_blind`` (loop semantics ``BlindDeconvJob.java:97-138``) and
``bench.py`` now also folds this figure into its own JSON line as
``blind_value`` so the driver captures it. Pass ``--baseline`` to re-measure
the CPU stand-in in a same-session subprocess instead of using the frozen
constant (see bench.py's docstring for why CPU-JAX stands in for CPU-Java).
"""

import json
import sys

import bench


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    value, lo, hi, reps = bench.stats(bench.measure_blind())
    base, source = bench.CPU_BASELINE_BLIND_MVOX_ITER_S, "frozen"
    if "--baseline" in argv:
        p = bench._run_cpu_probe("blind")
        if p:
            base, source = p, "measured"
    extra = {}
    try:
        # The recommended-recipe lane (annealed + joint + admm engine) —
        # mirrors bench.py's blind_admm_value (VERDICT r4 item 3).
        bav, balo, bahi, _ = bench.stats(bench.measure_blind_admm())
        extra = {"blind_admm_value": round(bav, 1),
                 "blind_admm_value_spread": [round(balo, 1), round(bahi, 1)],
                 "blind_admm_unit": "Mvox*obj_iter/s (recommended recipe)"}
    except SystemExit:
        raise
    except Exception:
        pass  # informational lane must not kill the headline
    print(json.dumps({
        "metric": "blind_deconv_throughput_256cubed",
        "value": round(value, 1),
        "value_median": round(value, 1),
        "value_spread": [round(lo, 1), round(hi, 1)],
        "reps": reps,
        "unit": "Mvox*obj_iter/s",
        "vs_baseline": round(value / base, 1),
        "baseline_source": source,
        **extra,
    }))


if __name__ == "__main__":
    main()
