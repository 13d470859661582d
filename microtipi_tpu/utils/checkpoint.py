"""Step-level checkpoint/resume for long blind-deconvolution runs.

The reference has no persistence at all — its closest affordance is the
in-memory restore-best-x (``PSF_Estimation.java:208-216,254``) (SURVEY.md
section 5-d). Here every outer round's state (object estimate + PSF parameter
pytree + round counter) can be serialized, so a preempted multi-hour run
resumes instead of restarting — table stakes for production TPU jobs.

Plain ``.npz`` by design: the state is a handful of dense arrays; orbax would
add a dependency for zero benefit at this scale. The pytree structure is
stored as a flattened name->array mapping.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax

from microtipi_tpu.models.widefield import WideFieldParams

__all__ = ["save_state", "load_state"]


def save_state(path: str, obj: Any, params: WideFieldParams, round_index: int, **extra) -> None:
    """Atomically write a blind-deconv checkpoint (object, params, round)."""
    payload = {
        "obj": np.asarray(obj),
        "params.defocus": np.asarray(params.defocus),
        "params.phase": np.asarray(params.phase),
        "params.modulus": np.asarray(params.modulus),
        "round_index": np.asarray(round_index),
    }
    for k, v in extra.items():
        payload[f"extra.{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_state(path: str):
    """Returns ``(obj, params, round_index, extra_dict)``."""
    with np.load(path) as z:
        obj = z["obj"]
        params = WideFieldParams(
            jax.numpy.asarray(z["params.defocus"]),
            jax.numpy.asarray(z["params.phase"]),
            jax.numpy.asarray(z["params.modulus"]),
        )
        round_index = int(z["round_index"])
        extra = {k[len("extra."):]: z[k] for k in z.files if k.startswith("extra.")}
    return jax.numpy.asarray(obj), params, round_index, extra
