"""Microscope PSF model abstraction and parameter-family tags.

Equivalent of the reference's ``microscopy/MicroscopeModel.java`` (abstract
base holding voxel sizes, dims, and per-family parameter spaces) and the
DEFOCUS/PHASE/MODULUS family indices
(``epifluorescence/WideFieldModel.java:113-123``).

The reference dispatches on Java vector-space *identity*
(``WideFieldModel.java:398-422``); here parameter families are just named
fields of a params pytree and the family tag selects a field. Models are pure
functions ``compute_psf(config, params) -> psf`` — the reference's
``PState``/``freeMem`` recompute-guard cache (``MicroscopeModel.java:42``,
``WideFieldModel.java:1969-1974``) is unnecessary under ``jax.jit``.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import jax

__all__ = [
    "DEFOCUS", "PHASE", "MODULUS", "DEPTH", "SHEET", "STED", "CAVITY",
    "PARAMETER_FLAGS", "FAMILY_NAMES", "PsfModel",
]

#: Parameter-family indices, same values as the reference
#: (``WideFieldModel.java:113-123``).
DEFOCUS = 0
PHASE = 1
MODULUS = 2
#: extension family (Gibson-Lanni depth aberration; not in the reference).
DEPTH = 3
#: extension family (light-sheet excitation geometry; not in the reference).
SHEET = 4
#: extension family (STED depletion saturation factor; not in the reference).
STED = 5
#: extension family (4Pi interferometric cavity phase; not in the reference).
CAVITY = 6
PARAMETER_FLAGS = (DEFOCUS, PHASE, MODULUS)
FAMILY_NAMES = {
    DEFOCUS: "defocus",
    PHASE: "phase",
    MODULUS: "modulus",
    DEPTH: "depth",
    SHEET: "sheet",
    STED: "sted",
    CAVITY: "cavity",
}


@runtime_checkable
class PsfModel(Protocol):
    """Protocol every PSF model config satisfies.

    ``compute_psf`` must be jit-traceable and differentiable w.r.t. ``params``
    — autodiff through it replaces the reference's ~940 lines of hand-written
    ``apply_J_*`` Jacobians (``WideFieldModel.java:429-1369``).
    """

    shape: tuple[int, int, int]  # (Nz, Ny, Nx)

    def init_params(self):  # -> params pytree
        ...

    def compute_psf(self, params) -> jax.Array:
        ...
