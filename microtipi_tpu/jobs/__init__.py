"""Solvers and orchestration: object updates, PSF fits, blind loops."""
from microtipi_tpu.jobs.batch import batched_blind_deconvolve, batched_deconvolve
from microtipi_tpu.jobs.blind import BlindDeconvConfig, BlindDeconvResult, blind_deconvolve
from microtipi_tpu.jobs.deconv import DeconvolutionConfig, DeconvolutionResult, deconvolve
from microtipi_tpu.jobs.depthvar import deconvolve_depthvar, depth_anchor_psfs
from microtipi_tpu.jobs.multichannel import deconvolve_multichannel, deconvolve_timeseries_multichannel, mixing_from_controls
from microtipi_tpu.jobs.psf_fit import PsfFitConfig, PsfFitResult, average_beads, bead_anchor_term, center_bead_stack, fit_psf, fit_psf_joint
from microtipi_tpu.jobs.richardson_lucy import multiview_richardson_lucy, richardson_lucy
from microtipi_tpu.jobs.tiled import tiled_deconvolve
from microtipi_tpu.jobs.wiener import wiener

__all__ = [
    "BlindDeconvConfig", "BlindDeconvResult", "blind_deconvolve",
    "DeconvolutionConfig", "DeconvolutionResult", "deconvolve",
    "PsfFitConfig", "PsfFitResult", "average_beads", "bead_anchor_term", "center_bead_stack", "fit_psf", "fit_psf_joint",
    "batched_deconvolve", "batched_blind_deconvolve",
    "deconvolve_depthvar", "depth_anchor_psfs", "deconvolve_multichannel", "deconvolve_timeseries_multichannel", "mixing_from_controls",
    "multiview_richardson_lucy", "richardson_lucy", "tiled_deconvolve", "wiener",
]
