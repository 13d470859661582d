"""PSF model zoo: one protocol, six microscopes.

Synthesizes the same specimen imaged by widefield, Gibson-Lanni (at depth),
confocal, two-photon, vectorial (Richards-Wolf) and light-sheet (SPIM)
optics, then recovers the
injected pupil-phase aberration with the *same* PSF-fit machinery — the
point being that every model family satisfies the one ``PsfModel`` protocol,
so the whole solver stack (object-as-kernel data term, VMLMB, autodiff
Jacobians) is family-agnostic.

The fit here uses the true object (the identifiability-clean sub-problem the
reference's ``PSF_Estimation`` solves inside the blind loop); for the full
alternating blind loop and its measured quality recipe see
``blind_deconv_example.py`` and docs/TUNING.md.

    PYTHONPATH=. python examples/model_zoo_example.py

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
    jax.config.update("jax_enable_x64", True)  # CPU validation: real float64

from microtipi_tpu import (
    ConfocalConfig,
    FourPiConfig,
    GibsonLanniConfig,
    ISMConfig,
    LightSheetConfig,
    PsfFitConfig,
    StructuredSheetConfig,
    TwoPhotonConfig,
    VectorialConfig,
    WideFieldConfig,
    convolve,
    convolve_spectrum,
    fit_psf,
    PHASE,
)

# MICROTIPI_EXAMPLE_TINY=1: CI smoke shapes/budgets (tests/test_examples.py).
TINY = bool(os.environ.get("MICROTIPI_EXAMPLE_TINY"))
SHAPE = (8, 32, 32) if TINY else (16, 64, 64)
# f64 on the CPU validation backend (near-exact recovery), f32 on TPU (the
# production dtype; close recovery — f32 fits use the residual-form data
# term to avoid the quadratic identity's catastrophic cancellation, see
# jobs/psf_fit.py::_fit_data_term).
DTYPE = jnp.float32 if jax.default_backend() in ("tpu", "axon") else jnp.float64
KW = dict(shape=SHAPE, na=1.3, wavelength=520e-9, ni=1.518, dxy=90e-9,
          dz=220e-9, n_phase=3, n_modulus=1, dtype=DTYPE)

MODELS = {
    "widefield": WideFieldConfig(**KW),
    "gibson-lanni": GibsonLanniConfig(ns=1.38, depth=4e-6, **KW),
    "confocal": ConfocalConfig(wavelength_exc=488e-9, pinhole=150e-9, **KW),
    "two-photon": TwoPhotonConfig(**KW),
    "vectorial": VectorialConfig(**KW),
    "light-sheet": LightSheetConfig(sheet_na=0.12, wavelength_exc=488e-9, **KW),
    "lattice-sheet": StructuredSheetConfig(
        sheet_mode="lattice", lattice_ky=(0.0, 0.5), sheet_na_min=0.4,
        sheet_na_max=0.55, wavelength_exc=488e-9, **KW),
    "ism": ISMConfig(element_pitch=2 * KW["dxy"], rings=1,
                     wavelength_exc=488e-9, **KW),
    "4pi": FourPiConfig(wavelength_exc=488e-9, **KW),
}

TRUE_PHASE = jnp.asarray([0.3, -0.2, 0.1], DTYPE)

rng = np.random.default_rng(0)
obj = np.zeros(SHAPE, np.float32)
idx = rng.integers(0, np.array(SHAPE), size=(25, 3))
obj[idx[:, 0], idx[:, 1], idx[:, 2]] = rng.uniform(100, 300, 25)
obj[SHAPE[0] // 3: 2 * SHAPE[0] // 3,
    SHAPE[1] // 3: 2 * SHAPE[1] // 3,
    SHAPE[2] // 3: 2 * SHAPE[2] // 3] += 40.0
obj = jnp.asarray(obj, DTYPE)
noise = jnp.asarray(rng.standard_normal(SHAPE), DTYPE)

print(f"{'model':14s} {'steady':>8s}  {'recovered phase':32s} (true {np.asarray(TRUE_PHASE)})")
for name, model in MODELS.items():
    truth = model.init_params()._replace(phase=TRUE_PHASE)

    @jax.jit
    def make_data(obj, noise, model=model, truth=truth):
        psf = model.compute_psf(truth)
        d = convolve(obj, convolve_spectrum(psf), SHAPE)
        return d + 0.002 * d.max() * noise

    data = make_data(obj, noise)
    run = jax.jit(
        lambda d, model=model: fit_psf(
            model, model.init_params(), PHASE, d, obj, config=PsfFitConfig(max_iter=6 if TINY else 120, grtol=1e-7)
        )
    )
    res = run(data)
    _ = float(res.f)  # compile + warm
    t0 = time.time()
    res = run(data)
    alpha = np.asarray(res.params.phase)
    steady = time.time() - t0
    err = float(np.linalg.norm(alpha - np.asarray(TRUE_PHASE)))
    print(f"{name:14s} {steady:7.2f}s  {np.round(alpha, 3)!s:32s} L2 err {err:.3g}")
