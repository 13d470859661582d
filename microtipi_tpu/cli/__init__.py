"""CLI package: ``python -m microtipi_tpu`` (see ``parser.main``).

The former 3,800-line ``__main__.py`` monolith, split one-module-per-
concern (VERDICT r3 item 6; both recorded monolith-shaped bug classes —
the in-process compile-cache poisoning and the hand-copied family-dict
drift — were direct costs of the single file):

- ``shared``   command-agnostic plumbing: arg groups, IO, model builders
- ``basic``    doctor / info / psf
- ``deconv``   the non-blind solve (+ ``deconv_modes`` for the variants)
- ``blind``    the alternating blind loop and its variants
- ``fitpsf``   bead / depth-ladder / phase-diversity calibration
- ``tools``    simulate, register, deskew, fsc, fuse, ism, sim, watch
- ``parser``   the argparse tree and ``main()``

Pure refactor: the --help surface is snapshot-pinned
(``tests/test_cli_help_snapshot.py``) and ``microtipi_tpu.__main__``
re-exports the public entry point unchanged.
"""

from microtipi_tpu.cli.parser import main

__all__ = ["main"]
