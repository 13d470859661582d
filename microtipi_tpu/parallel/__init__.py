"""Mesh-sharded execution: distributed FFT, sharded solvers."""
from microtipi_tpu.parallel.admm import sharded_admm_deconvolve
from microtipi_tpu.parallel.blind import sharded_blind_deconvolve
from microtipi_tpu.parallel.deconv import make_sharded_objective, sharded_deconvolve
from microtipi_tpu.parallel.fft import (
    sharded_convolve,
    sharded_irfftn,
    sharded_rfftn,
    sharded_spectrum,
)
from microtipi_tpu.parallel.mesh import BATCH_AXIS, Z_AXIS, make_mesh, volume_sharding
from microtipi_tpu.parallel.psf_fit import sharded_fit_psf

__all__ = [
    "make_mesh", "volume_sharding", "BATCH_AXIS", "Z_AXIS",
    "sharded_rfftn", "sharded_irfftn", "sharded_spectrum", "sharded_convolve",
    "make_sharded_objective", "sharded_deconvolve", "sharded_fit_psf",
    "sharded_blind_deconvolve", "sharded_admm_deconvolve",
]
