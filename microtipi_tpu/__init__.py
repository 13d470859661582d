"""microtipi_tpu — TPU-native microscopy blind-deconvolution framework.

A from-scratch JAX/XLA rebuild of the capability surface of
jplumail/microTiPi (pure-Java, ``/root/reference``) and the TiPi substrate it
stands on: parameterized wide-field PSF synthesis (Zernike pupil modulus/phase
+ physical defocus), FFT-domain weighted convolution costs, VMLMB
bound-constrained quasi-Newton, hyperbolic-TV-regularized object updates, and
the alternating object/PSF blind-deconvolution loop — all expressed as pure
functions that fuse into single jitted TPU programs.

Two API levels:

- functional (TPU-first): ``WideFieldConfig`` + ``jobs.blind_deconvolve`` /
  ``jobs.deconvolve`` / ``jobs.fit_psf`` — fully jittable, shardable;
- stateful (reference-parity): ``api.WideFieldModel`` / ``api.PSF_Estimation``
  / ``api.DeconvolutionJob`` / ``api.BlindDeconvJob``.
"""

from microtipi_tpu.models.microscope import CAVITY, DEFOCUS, DEPTH, MODULUS, PARAMETER_FLAGS, PHASE, SHEET, STED
from microtipi_tpu.models.widefield import WideFieldConfig, WideFieldParams
from microtipi_tpu.models.gibson_lanni import GibsonLanniConfig, GibsonLanniParams
from microtipi_tpu.models.confocal import ConfocalConfig, TwoPhotonConfig
from microtipi_tpu.models.lightsheet import (
    LightSheetConfig, LightSheetParams, StructuredSheetConfig)
from microtipi_tpu.models.fourpi import FourPiConfig, FourPiParams
from microtipi_tpu.models.ism import ISMConfig, hex_offsets
from microtipi_tpu.models.sted import STEDConfig, STEDParams
from microtipi_tpu.models.vectorial import VectorialConfig
from microtipi_tpu.jobs.admm import (
    admm_deconvolve,
    admm_deconvolve_multichannel,
    admm_deconvolve_timeseries,
    admm_deconvolve_timeseries_multichannel,
    fista_deconvolve,
)
from microtipi_tpu.jobs.autotune import AutoMuResult, deconvolve_auto_mu, estimate_noise_sigma
from microtipi_tpu.jobs.phase_retrieval import (
    PupilRetrievalResult, project_phase, remove_position_gauges, retrieve_pupil)
from microtipi_tpu.jobs.blind import BlindDeconvConfig, BlindDeconvResult, blind_deconvolve
from microtipi_tpu.jobs.sim import (
    SIMReconstruction, estimate_sim_pattern, reconstruct_sim,
    separate_bands, simulate_sim)
from microtipi_tpu.jobs.ism import (
    ism_element_gains, ism_reassign, ism_richardson_lucy)
from microtipi_tpu.jobs.diversity import (
    defocus_diversity, diversity_fit_uncertainty, diversity_object_estimate,
    diversity_psfs, fit_psf_diversity, zernike_diversity)
from microtipi_tpu.jobs.deconv import DeconvolutionConfig, DeconvolutionResult, deconvolve
from microtipi_tpu.jobs.depthvar import deconvolve_depthvar, depth_anchor_psfs
from microtipi_tpu.jobs.superres import (
    admm_deconvolve_superres, bin_volume, deconvolve_superres,
    upsample_psf, upsample_volume)
from microtipi_tpu.jobs.timeseries import deconvolve_timeseries
from microtipi_tpu.jobs.multichannel import (
    deconvolve_multichannel, deconvolve_timeseries_multichannel,
    mixing_from_controls)
from microtipi_tpu.jobs.psf_fit import (
    FitUncertainty, PsfFitConfig, PsfFitResult, average_beads, bead_anchor_term,
    bead_fit_uncertainty, calibrate_field, center_bead_stack, detect_beads,
    empirical_psf, fit_psf, fit_psf_beads, fit_psf_joint, fit_uncertainty,
)
from microtipi_tpu.jobs.richardson_lucy import (
    multiview_richardson_lucy,
    richardson_lucy,
    wb_backprojector,
)
from microtipi_tpu.jobs.tiled import field_psf, tiled_deconvolve
from microtipi_tpu.jobs.uncertainty import ObjectUncertainty, object_uncertainty
from microtipi_tpu.jobs.wiener import wiener
from microtipi_tpu.ops.geometry import deskew
from microtipi_tpu.ops.preprocess import (
    destripe,
    estimate_bleach,
    flat_field_correct,
    remove_hot_pixels,
    rolling_ball_background,
    subtract_background,
)
from microtipi_tpu.ops.metrics import (
    checkerboard_split,
    fourier_shell_correlation,
    fsc_resolution,
    strehl_ratio,
    strehl_ratio_from_pupil,
)
from microtipi_tpu.ops.convolution import (
    PoissonConvCost,
    WeightedConvolutionCost,
    convolve,
    convolve_spectrum,
)
from microtipi_tpu.ops.register import fourier_shift, register_timeseries, register_translation
from microtipi_tpu.ops.regularization import (
    hyperbolic_hessian, hyperbolic_tv, hyperbolic_tv_and_gradient,
    joint_hyperbolic_tv, smoothed_l1)
from microtipi_tpu.optim.vmlmb import VMLMBResult, VMLMBStatus, minimize_vmlmb
from microtipi_tpu.weights.updaters import InverseVarianceWeights, estimate_gain_readout

__version__ = "0.1.0"

__all__ = [
    "DEFOCUS", "PHASE", "MODULUS", "DEPTH", "SHEET", "STED", "CAVITY", "PARAMETER_FLAGS",
    "WideFieldConfig", "WideFieldParams",
    "GibsonLanniConfig", "GibsonLanniParams",
    "ConfocalConfig", "TwoPhotonConfig", "VectorialConfig", "STEDConfig", "STEDParams",
    "SIMReconstruction", "estimate_sim_pattern", "reconstruct_sim",
    "separate_bands", "simulate_sim",
    "ISMConfig", "hex_offsets", "ism_element_gains", "ism_reassign",
    "ism_richardson_lucy",
    "FourPiConfig", "FourPiParams",
    "LightSheetConfig", "LightSheetParams", "StructuredSheetConfig",
    "BlindDeconvConfig", "BlindDeconvResult", "blind_deconvolve",
    "DeconvolutionConfig", "DeconvolutionResult", "deconvolve",
    "admm_deconvolve", "admm_deconvolve_multichannel",
    "admm_deconvolve_timeseries",
    "admm_deconvolve_timeseries_multichannel", "fista_deconvolve",
    "AutoMuResult", "deconvolve_auto_mu", "estimate_noise_sigma",
    "PupilRetrievalResult", "project_phase", "remove_position_gauges", "retrieve_pupil",
    "defocus_diversity", "diversity_fit_uncertainty",
    "diversity_object_estimate", "diversity_psfs",
    "fit_psf_diversity", "zernike_diversity",
    "deconvolve_depthvar", "depth_anchor_psfs", "deconvolve_timeseries",
    "deconvolve_multichannel", "deconvolve_timeseries_multichannel",
    "mixing_from_controls",
    "admm_deconvolve_superres", "bin_volume", "deconvolve_superres",
    "upsample_psf", "upsample_volume",
    "PsfFitConfig", "PsfFitResult", "average_beads", "bead_anchor_term", "center_bead_stack",
    "empirical_psf", "fit_psf", "fit_psf_beads", "fit_psf_joint",
    "FitUncertainty", "fit_uncertainty", "bead_fit_uncertainty",
    "ObjectUncertainty", "object_uncertainty",
    "calibrate_field", "detect_beads",
    "multiview_richardson_lucy", "richardson_lucy", "wb_backprojector", "field_psf", "tiled_deconvolve", "wiener",
    "PoissonConvCost", "WeightedConvolutionCost", "convolve", "convolve_spectrum",
    "fourier_shift", "register_timeseries", "register_translation",
    "checkerboard_split", "fourier_shell_correlation", "fsc_resolution", "strehl_ratio", "strehl_ratio_from_pupil",
    "destripe",
    "estimate_bleach",
    "flat_field_correct", "remove_hot_pixels", "rolling_ball_background", "subtract_background",
    "deskew",
    "hyperbolic_hessian", "hyperbolic_tv", "hyperbolic_tv_and_gradient",
    "joint_hyperbolic_tv", "smoothed_l1",
    "VMLMBResult", "VMLMBStatus", "minimize_vmlmb",
    "InverseVarianceWeights", "estimate_gain_readout",
    "__version__",
]
