"""Command-line interface: ``python -m microtipi_tpu <command>``.

The reference ships no CLI (SURVEY.md §1: GUI plugins sat above it); a
production framework needs one. Four commands over the TIFF IO layer:

  info    print stack geometry
  psf     synthesize a PSF to a TIFF stack (any model family)
  fitpsf  calibrate PSF parameters from a bead stack
  deconv  non-blind deconvolution (known PSF)
  blind   blind deconvolution (PSF parameters estimated)

All compute paths are single jitted programs; volumes are float32.

Implementation lives in the ``microtipi_tpu.cli`` package (one module per
subcommand; this file is the ``python -m`` entry shim). The re-exports
below keep historical import sites (tests, downstream scripts) working.
"""

from microtipi_tpu.cli import main
from microtipi_tpu.cli.shared import (  # noqa: F401  (import-site back-compat)
    _build_preprocess,
    _deconv_config,
)

if __name__ == "__main__":
    main()
