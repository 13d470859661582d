"""PSF model families."""
from microtipi_tpu.models.confocal import ConfocalConfig, TwoPhotonConfig
from microtipi_tpu.models.gibson_lanni import GibsonLanniConfig, GibsonLanniParams
from microtipi_tpu.models.fourpi import FourPiConfig, FourPiParams
from microtipi_tpu.models.ism import ISMConfig, hex_offsets
from microtipi_tpu.models.lightsheet import (
    LightSheetConfig, LightSheetParams, StructuredSheetConfig)
from microtipi_tpu.models.vectorial import VectorialConfig
from microtipi_tpu.models.microscope import (
    CAVITY,
    DEFOCUS,
    DEPTH,
    FAMILY_NAMES,
    MODULUS,
    PARAMETER_FLAGS,
    PHASE,
    SHEET,
    PsfModel,
)
from microtipi_tpu.models.widefield import WideFieldConfig, WideFieldParams

__all__ = [
    "WideFieldConfig", "WideFieldParams",
    "GibsonLanniConfig", "GibsonLanniParams",
    "ISMConfig", "hex_offsets", "StructuredSheetConfig",
    "FourPiConfig", "FourPiParams", "CAVITY",
    "ConfocalConfig", "TwoPhotonConfig", "VectorialConfig",
    "LightSheetConfig", "LightSheetParams",
    "PsfModel", "DEFOCUS", "PHASE", "MODULUS", "DEPTH", "SHEET",
    "PARAMETER_FLAGS", "FAMILY_NAMES",
]
