"""Command-line interface: ``python -m microtipi_tpu <command>``.

The reference ships no CLI (SURVEY.md §1: GUI plugins sat above it); a
production framework needs one. Four commands over the TIFF IO layer:

  info    print stack geometry
  psf     synthesize a PSF to a TIFF stack (any model family)
  fitpsf  calibrate PSF parameters from a bead stack
  deconv  non-blind deconvolution (known PSF)
  blind   blind deconvolution (PSF parameters estimated)

All compute paths are single jitted programs; volumes are float32.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _comma_floats(s: str) -> list[float]:
    """Comma-separated float list CLI type. Used where values are often
    negative: argparse's negative-number heuristic does not recognize
    scientific notation (``-2e-7`` parses as an option string), so these
    flags take one ``=``-joined comma list instead of nargs."""
    try:
        return [float(v) for v in s.split(",") if v.strip() != ""]
    except ValueError:
        raise argparse.ArgumentTypeError(f"not a comma-separated float list: {s!r}")


def _family_map(*names):
    """Family-name -> flag map derived from the live registry (one source
    of truth; five hand-copied dicts drifted — the CAVITY family reached
    some commands a commit late). No args = every registered family."""
    from microtipi_tpu.models.microscope import FAMILY_NAMES

    inv = {v: k for k, v in FAMILY_NAMES.items()}
    return {n: inv[n] for n in (names or inv)}


def _model_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("optics")
    g.add_argument("--model",
                   choices=["widefield", "gl", "confocal", "2p", "vectorial",
                            "lightsheet", "sted", "4pi"],
                   default="widefield",
                   help="PSF model family: widefield (reference parity), "
                        "gl (Gibson-Lanni depth aberration), confocal, "
                        "2p (two-photon), vectorial (Richards-Wolf high-NA), "
                        "lightsheet (SPIM: widefield detection x Gaussian "
                        "sheet; --sheet-mode for Bessel/lattice), 4pi "
                        "(two-objective interferometric, --fourpi-type A|C)")
    g.add_argument("--ns", type=float, default=1.38,
                   help="[gl] sample refractive index")
    g.add_argument("--depth", type=float, default=0.0,
                   help="[gl] nominal imaging depth [m]")
    g.add_argument("--wavelength-exc", type=float, default=0.0,
                   help="[confocal/lightsheet] excitation wavelength [m] "
                        "(0 = same as emission)")
    g.add_argument("--pinhole", type=float, default=0.0,
                   help="[confocal] object-space pinhole radius [m] (0 = ideal)")
    g.add_argument("--wavelength-dep", type=float, default=0.0,
                   help="[sted] depletion wavelength [m] (0 = emission)")
    g.add_argument("--depletion", choices=["donut", "bottle"], default="donut",
                   help="[sted] depletion mask: lateral vortex donut or "
                        "axial pi-disk bottle beam")
    g.add_argument("--fourpi-type", choices=["A", "C"], default="A",
                   help="[4pi] interference on excitation only (A) or both "
                        "arms (C)")
    g.add_argument("--cavity-phase", type=float, default=0.0,
                   help="[4pi] initial cavity phase [rad] (fittable: "
                        "--families cavity)")
    g.add_argument("--saturation", type=float, default=0.0,
                   help="[sted] saturation factor zeta = I_peak/I_sat "
                        "(fittable via --families sted)")
    g.add_argument("--sheet-na", type=float, default=0.1,
                   help="[lightsheet] illumination NA of the sheet-forming "
                        "optics (sets the default waist)")
    g.add_argument("--sheet-mode", choices=["gaussian", "bessel", "lattice"],
                   default="gaussian",
                   help="[lightsheet] excitation sheet type: gaussian "
                        "(cylindrical focus), bessel (dithered annulus), "
                        "lattice (dithered beam lattice) — the latter two "
                        "use --sheet-na-min/--sheet-na-max")
    g.add_argument("--sheet-na-min", type=float, default=0.4,
                   help="[bessel/lattice] illumination annulus inner NA")
    g.add_argument("--sheet-na-max", type=float, default=0.55,
                   help="[bessel/lattice] illumination annulus outer NA")
    g.add_argument("--lattice-ky", type=_comma_floats, default=[0.0],
                   metavar="U1,U2,..",
                   help="[lattice] beam positions as ky/k fractions on the "
                        "ring (each u spawns the symmetric spot set)")
    g.add_argument("--no-sheet-divergence", action="store_true",
                   help="[lightsheet] ideal uniform sheet (drop the "
                        "Gaussian-beam waist growth across the FOV)")
    g.add_argument("--na", type=float, default=1.4, help="numerical aperture")
    g.add_argument("--wavelength", type=float, default=None,
                   help="emission wavelength [m] (default: the OME channel's "
                        "EmissionWavelength from the input, else 561e-9)")
    g.add_argument("--ni", type=float, default=1.518, help="immersion refractive index")
    g.add_argument("--dxy", type=float, default=None,
                   help="lateral pixel size [m] (default: input TIFF metadata, else 80e-9)")
    g.add_argument("--dz", type=float, default=None,
                   help="axial step [m] (default: input TIFF metadata, else 200e-9)")
    g.add_argument("--n-phase", type=int, default=8, help="Zernike phase modes")
    g.add_argument("--n-modulus", type=int, default=1, help="Zernike modulus modes")
    g.add_argument("--radial", action="store_true", help="radially symmetric pupil")


def _hyperstack_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("hyperstack input")
    g.add_argument("--channel", type=int, default=0,
                   help="channel index for OME hyperstack inputs (default 0)")
    g.add_argument("--timepoint", type=int, default=0,
                   help="timepoint index for OME hyperstack inputs (default 0)")
    g.add_argument("--well", default=None,
                   help="well path (e.g. A/1) for NGFF plate inputs; omit to "
                        "fan out over every well/field (deconv/blind)")
    g.add_argument("--field", type=int, default=0,
                   help="field index within --well for plate inputs (default 0)")


def _deconv_args(p: argparse.ArgumentParser, methods=("vmlmb", "rl")):
    g = p.add_argument_group("object step")
    g.add_argument("--mu", type=float, default=0.01, help="TV weight")
    g.add_argument("--auto-mu", action="store_true",
                   help="pick the TV weight by the Morozov discrepancy "
                        "principle (jobs/autotune.py) instead of --mu; noise "
                        "sigma is estimated from the data unless --noise-sigma")
    g.add_argument("--noise-sigma", type=float, default=None,
                   help="[auto-mu] known Gaussian noise sigma (default: "
                        "Immerkaer-MAD estimate from the data)")
    g.add_argument("--tau", type=float, default=1.0,
                   help="[auto-mu] Morozov safety factor on the discrepancy "
                        "target (>=1; larger regularizes more)")
    g.add_argument("--epsilon", type=float, default=1.0, help="TV edge threshold")
    g.add_argument("--sparsity", type=float, default=0.0,
                   help="smoothed-L1 intensity prior weight (sparse "
                        "deconvolution; confines background halo flux)")
    g.add_argument("--sparsity-epsilon", type=float, default=None,
                   help="L1 smoothing scale (default: --epsilon; smaller = "
                        "closer to exact L1)")
    g.add_argument("--hessian", type=float, default=0.0,
                   help="Hessian continuity prior weight (anti-staircasing "
                        "complement to --mu for smooth specimens)")
    g.add_argument("--iters", type=int, default=50, help="VMLMB iterations")
    g.add_argument("--grtol", type=float, default=None,
                   help="VMLMB relative gradient tolerance (default: the "
                        "solver's 1e-3; 0 disables, running --iters out)")
    g.add_argument("--gatol", type=float, default=None,
                   help="VMLMB absolute gradient tolerance (default 0)")
    g.add_argument("--no-positivity", action="store_true")
    g.add_argument("--pad", type=int, default=0, help="pad object grid by this many voxels per side")
    g.add_argument("--gain", type=float, default=0.0, help="camera gain e-/ADU for variance weights (0 = uniform)")
    g.add_argument("--readout", type=float, default=1.0, help="readout variance [ADU^2]")
    g.add_argument("--auto-gain", action="store_true",
                   help="estimate camera gain + readout variance from the "
                        "data by single-shot photon transfer "
                        "(weights/updaters.py) and use variance weights")
    g.add_argument("--method", choices=list(methods), default="vmlmb",
                   help="object solver: VMLMB+TV (default), Richardson-Lucy, or "
                        "(watch only) blind / blind-once (calibrate on first file)")
    g.add_argument("--rl-accelerate", action="store_true",
                   help="[rl] Biggs-Andrews vector extrapolation (~2-3x fewer "
                        "iterations to a given likelihood)")
    g.add_argument("--rl-backprojector", choices=["matched", "wb"],
                   default="matched",
                   help="[rl] wb = Wiener-Butterworth backprojector (Guo 2020; "
                        "~10x fewer iterations, semiconvergence arrives "
                        "equally sooner on noisy data)")
    g.add_argument("--rl-stop", choices=["fixed", "gaussian", "poisson"],
                   default="fixed",
                   help="[rl] discrepancy-principle early stopping: halt when "
                        "the residual hits its noise expectation (--iters "
                        "becomes the cap; gaussian uses --noise-sigma or a "
                        "blind estimate, --tau scales the target)")
    g.add_argument("--data-term", choices=["gaussian", "poisson"], default="gaussian",
                   help="data fidelity: gaussian least squares (reference semantics) "
                        "or poisson generalized-KL deviance (photon-counting data)")
    g.add_argument("--background", type=float, default=0.0,
                   help="[poisson] known background offset b in d ~ Poisson(Hx + b)")


def _resolve_geometry(args, stack_path=None, log=print):
    """Fill missing --dxy/--dz from the input TIFF's pixel-size metadata
    (OME-XML / ImageJ / resolution tags via the native reader), falling back
    to the historical defaults."""
    meta_dxy = meta_dz = None
    if stack_path is not None and (args.dxy is None or args.dz is None):
        if _is_plate(stack_path):

            def read_pixel_size(p):  # first plate image carries the scale
                from microtipi_tpu.io.plate import (
                    list_plate_images, read_plate_image)

                well, field = list_plate_images(p)[0]
                _, meta = read_plate_image(p, well, field)
                return meta["dxy"], meta["dz"]

        elif _is_zarr(stack_path):
            from microtipi_tpu.io.zarrstack import read_pixel_size
        elif str(stack_path).lower().endswith((".ome", ".xml")):

            def read_pixel_size(p):  # companion document: sizes in the XML
                from microtipi_tpu.io.ome import parse_ome

                with open(p, "r", encoding="utf-8") as fh:
                    meta = parse_ome(fh.read())
                return meta["dxy"], meta["dz"]

        else:
            from microtipi_tpu.io.tiffstack import read_pixel_size

        try:
            meta_dxy, meta_dz = read_pixel_size(stack_path)
        except Exception:
            pass
    if args.dxy is None:
        args.dxy = meta_dxy or 80e-9
        log(f"dxy = {args.dxy*1e9:.4g} nm ({'metadata' if meta_dxy else 'default'})")
    if args.dz is None:
        args.dz = meta_dz or 200e-9
        log(f"dz = {args.dz*1e9:.4g} nm ({'metadata' if meta_dz else 'default'})")
    if getattr(args, "wavelength", 0) is None:
        # An OME channel EmissionWavelength (set by _read_input_volume) wins
        # before we ever get here; this is the terminal fallback.
        args.wavelength = 561e-9
        log("wavelength = 561 nm (default)")


def _preprocess_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("preprocessing")
    g.add_argument("--flat", default=None, metavar="STACK",
                   help="flat-field reference (uniform slide); corrects "
                        "illumination/gain before solving")
    g.add_argument("--dark", default=None, metavar="STACK",
                   help="dark (camera offset) frame, subtracted first")
    g.add_argument("--hot-pixels", type=float, default=0.0, metavar="SIGMA",
                   help="replace impulsive outliers beyond SIGMA robust "
                        "sigmas with the local 3x3 median (0 = off; 5 is a "
                        "good default)")
    g.add_argument("--subtract-background", type=int, default=0, metavar="R",
                   help="rolling-ball background subtraction with radius R "
                        "pixels (0 = off)")
    g.add_argument("--destripe", choices=["x", "y"], default=None,
                   help="suppress illumination stripes running along this "
                        "in-plane axis (light-sheet shadowing; Fourier "
                        "notch, Muench et al. 2009 core) before solving")
    g.add_argument("--destripe-sigma", type=float, default=2.0, metavar="B",
                   help="[--destripe] notch half-width in frequency bins "
                        "along the stripe axis (how bent a stripe may be)")
    g.add_argument("--destripe-protect", type=float, default=4.0, metavar="B",
                   help="[--destripe] transverse low-frequency protect "
                        "radius in bins (real large-scale structure and DC "
                        "pass through untouched)")


def _build_preprocess(args):
    """Preprocessing callable (or None) from the --flat/--dark/--hot-pixels/
    --destripe/--subtract-background flags; applied to every input volume
    right after decode (``ops.preprocess``). Dark/flat first, then impulse
    removal, then stripe suppression, then background — the order the
    physics composes in."""
    flat = getattr(args, "flat", None)
    dark = getattr(args, "dark", None)
    hot = float(getattr(args, "hot_pixels", 0.0) or 0.0)
    bg = int(getattr(args, "subtract_background", 0) or 0)
    stripe_axis = getattr(args, "destripe", None)
    if not (flat or dark or hot or bg or stripe_axis):
        return None
    import numpy as np
    import jax
    import jax.numpy as jnp
    from microtipi_tpu.io.tiffstack import read_stack
    from microtipi_tpu.ops import preprocess as pp

    bright_c = jnp.asarray(read_stack(flat)) if flat else None
    dark_c = jnp.asarray(read_stack(dark)) if dark else None

    def inner(v):
        v = jnp.asarray(v, jnp.float32)
        if bright_c is not None:
            v = pp.flat_field_correct(v, bright_c, dark_c)
        elif dark_c is not None:
            v = v - dark_c
        if hot:
            v = pp.remove_hot_pixels(v, hot)
        if stripe_axis:
            v = pp.destripe(v, axis=-1 if stripe_axis == "x" else -2,
                            sigma=args.destripe_sigma,
                            protect=args.destripe_protect)
        if bg:
            v = pp.subtract_background(v, bg)
        return v

    jfn = jax.jit(inner)
    return lambda vol: np.asarray(jfn(np.ascontiguousarray(vol)))


def _read_input_volume(args, path, log=print):
    """Read one (Nz, Ny, Nx) volume and apply any preprocessing flags.

    OME hyperstacks (SizeC/SizeT > 1) are sliced at ``--timepoint``/
    ``--channel``; when the selected channel carries an OME
    ``EmissionWavelength`` and ``--wavelength`` was not given, the model
    wavelength is auto-filled from it (per-channel optics, ROADMAP io
    breadth)."""
    import numpy as np

    vol = _read_raw_volume(args, path, log=log)
    pre = _build_preprocess(args)
    if pre is not None:
        vol = pre(vol)
        log("preprocessed input (ops.preprocess)")
    # Non-finite voxels (dead pixels, file corruption) poison FFT-based
    # solves globally; weighted paths exclude them via validity_mask, but
    # RL/Poisson and unweighted solves have no mask — zero them here with
    # a warning (the weighted paths then see 0 at zero weight, identical).
    vol = np.asarray(vol)
    bad = ~np.isfinite(vol)
    if bad.any():
        log(f"[input] {path}: zeroed {int(bad.sum())} non-finite voxel(s) "
            "(dead pixels / corruption; --gain adds statistical exclusion)")
        vol = np.where(bad, 0.0, vol).astype(vol.dtype)
    return vol


def _read_raw_volume(args, path, log=print):
    import numpy as np

    if _is_h5(path):
        from microtipi_tpu.io.hdf5stack import read_bdv, read_h5

        try:
            return read_bdv(path)  # BigDataViewer layout first
        except Exception:
            return read_h5(path)
    if _is_plate(path):
        from microtipi_tpu.io.plate import read_plate_image

        well = getattr(args, "well", None)
        if not well:
            sys.exit("input is an NGFF plate: select one image with "
                     "--well ROW/COL (and --field N), or run deconv/blind "
                     "without --well to process every well")
        arr, meta = read_plate_image(path, well, getattr(args, "field", 0))
    elif _is_zarr(path):
        from microtipi_tpu.io.zarrstack import read_ngff_hyperstack

        arr, meta = read_ngff_hyperstack(path)
    else:
        try:
            from microtipi_tpu.io.ome import read_ome_hyperstack

            arr, meta = read_ome_hyperstack(path)
        except Exception:
            from microtipi_tpu.io.tiffstack import read_stack

            return read_stack(path)
    nt, nc = arr.shape[:2]
    t = int(getattr(args, "timepoint", 0) or 0)
    c = int(getattr(args, "channel", 0) or 0)
    if not (0 <= t < nt and 0 <= c < nc):
        sys.exit(f"--timepoint {t} / --channel {c} out of range (T={nt}, C={nc})")
    if nt > 1 or nc > 1:
        log(f"hyperstack T={nt} C={nc}: processing t={t} c={c} "
            "(select with --timepoint/--channel)")
    channels = meta.get("channels") or []
    if getattr(args, "wavelength", 0) is None and c < len(channels):
        em = channels[c].get("emission_wavelength")
        if em:
            args.wavelength = em
            log(f"wavelength = {em*1e9:.4g} nm (OME channel {c} emission)")
    return np.ascontiguousarray(arr[t, c])


def _build_model(args, shape):
    common = dict(
        shape=shape, na=args.na, wavelength=args.wavelength, ni=args.ni,
        dxy=args.dxy, dz=args.dz, n_phase=args.n_phase, n_modulus=args.n_modulus,
        radial=args.radial,
    )
    kind = getattr(args, "model", "widefield")
    if kind == "gl":
        from microtipi_tpu.models.gibson_lanni import GibsonLanniConfig

        return GibsonLanniConfig(ns=args.ns, depth=args.depth, **common)
    if kind == "confocal":
        from microtipi_tpu.models.confocal import ConfocalConfig

        return ConfocalConfig(
            wavelength_exc=args.wavelength_exc, pinhole=args.pinhole, **common
        )
    if kind == "2p":
        from microtipi_tpu.models.confocal import TwoPhotonConfig

        return TwoPhotonConfig(**common)
    if kind == "vectorial":
        from microtipi_tpu.models.vectorial import VectorialConfig

        return VectorialConfig(**common)
    if kind == "lightsheet":
        if getattr(args, "sheet_mode", "gaussian") != "gaussian":
            from microtipi_tpu.models.lightsheet import StructuredSheetConfig

            return StructuredSheetConfig(
                sheet_mode=args.sheet_mode,
                sheet_na_min=args.sheet_na_min,
                sheet_na_max=args.sheet_na_max,
                lattice_ky=tuple(args.lattice_ky),
                wavelength_exc=args.wavelength_exc, **common
            )
        from microtipi_tpu.models.lightsheet import LightSheetConfig

        return LightSheetConfig(
            sheet_na=args.sheet_na, wavelength_exc=args.wavelength_exc,
            divergence=not args.no_sheet_divergence, **common
        )
    if kind == "4pi":
        from microtipi_tpu.models.fourpi import FourPiConfig

        return FourPiConfig(
            fourpi_type=args.fourpi_type, cavity_phase=args.cavity_phase,
            wavelength_exc=args.wavelength_exc, pinhole=args.pinhole,
            **common
        )
    if kind == "sted":
        from microtipi_tpu.models.sted import STEDConfig

        return STEDConfig(
            wavelength_exc=args.wavelength_exc, pinhole=args.pinhole,
            wavelength_dep=args.wavelength_dep, depletion=args.depletion,
            saturation=args.saturation, **common
        )
    from microtipi_tpu.models.widefield import WideFieldConfig

    return WideFieldConfig(**common)


def _deconv_config(args, shape):
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig

    var_shape = None
    if args.pad:
        var_shape = tuple(s + 2 * args.pad for s in shape)
    tol = {}
    if getattr(args, "grtol", None) is not None:
        tol["grtol"] = args.grtol
    if getattr(args, "gatol", None) is not None:
        tol["gatol"] = args.gatol
    return DeconvolutionConfig(
        mu=args.mu, epsilon=args.epsilon, max_iter=args.iters,
        positivity=not args.no_positivity, var_shape=var_shape,
        data_term=getattr(args, "data_term", "gaussian"),
        background=getattr(args, "background", 0.0),
        sparsity=getattr(args, "sparsity", 0.0),
        hessian=getattr(args, "hessian", 0.0),
        sparsity_epsilon=getattr(args, "sparsity_epsilon", None),
        **tol,
    )


def _is_h5(path) -> bool:
    import os

    return os.path.splitext(str(path))[1].lower() in (".h5", ".hdf5", ".ims")


def _is_zarr(path) -> bool:
    from microtipi_tpu.io.zarrstack import is_zarr

    return is_zarr(path)


def _is_plate(path) -> bool:
    from microtipi_tpu.io.plate import is_plate

    return is_plate(path)


def _write_out(args, path, volume, dxy=None, dz=None):
    """Write an output volume: HDF5/zarr by extension, OME-TIFF when --ome
    is set, plain multi-page TIFF otherwise."""
    if _is_h5(path):
        from microtipi_tpu.io.hdf5stack import write_h5

        write_h5(path, volume)
    elif str(path).rstrip("/").lower().endswith(".zarr"):
        from microtipi_tpu.io.zarrstack import write_ngff_hyperstack

        write_ngff_hyperstack(path, volume, dxy=dxy, dz=dz,
                              levels=getattr(args, "zarr_levels", 1))
    elif getattr(args, "ome", False):
        from microtipi_tpu.io.ome import write_ome_stack

        write_ome_stack(path, volume, dxy=dxy, dz=dz)
    else:
        from microtipi_tpu.io.tiffstack import write_stack

        write_stack(path, volume, dxy=dxy, dz=dz)


def _weights(args, data):
    """Inverse-variance weights from --gain/--readout or --auto-gain.

    ``data`` is a device array on every path except ``--tile``, which keeps
    the (possibly beyond-HBM) volume host-side — there the weights are built
    host-side too (a NumPy mirror of ``InverseVarianceWeights.from_data``)
    and --auto-gain probes the scalar camera constants on a central crop, so
    the volume never round-trips the device."""
    import numpy as np

    auto = getattr(args, "auto_gain", False)
    if not auto and args.gain <= 0:
        return None
    host = isinstance(data, np.ndarray)
    gain, rv = args.gain, args.readout
    if auto:
        import jax
        import jax.numpy as jnp

        from microtipi_tpu.weights.updaters import estimate_gain_readout

        probe = data
        if host:
            crop = tuple(min(n, c) for n, c in zip(data.shape, (64, 512, 512)))
            sl = tuple(slice((n - c) // 2, (n - c) // 2 + c)
                       for n, c in zip(data.shape, crop))
            probe = jnp.asarray(np.ascontiguousarray(data[sl]))
        gain, rv = jax.jit(estimate_gain_readout)(probe)
        gain, rv = float(gain), float(rv)
        print(f"auto-gain: gain={gain:.4g} e-/ADU, readout variance={rv:.4g} ADU^2"
              + (" (central-crop probe)" if host else ""))
    if host:
        dt = (data.dtype if np.issubdtype(data.dtype, np.floating)
              else np.dtype(np.float32))
        d = np.asarray(data, dt)
        var = np.asarray(rv, dt) + (np.maximum(d, 0.0) / gain if gain > 0 else 0.0)
        w = (1.0 / np.maximum(var, np.finfo(dt).tiny)).astype(dt)
        return w * np.isfinite(d).astype(dt)
    from microtipi_tpu.weights.updaters import InverseVarianceWeights

    return InverseVarianceWeights(gain=gain, readout_variance=rv).from_data(data)


def cmd_doctor(args):
    """Deployment self-check: backend, jitted solve, platform quirks.

    The axon-attached TPU runtime has sharp edges (CLAUDE.md): eager
    dispatch remote-compiles per op, complex device->host transfers are
    UNIMPLEMENTED and poison the process, block_until_ready does not
    synchronize. This probes each one non-destructively and reports what
    THIS runtime actually does, plus a tiny end-to-end solve timing.
    """
    import time as _time

    import numpy as np
    import jax
    import jax.numpy as jnp

    print(f"jax {jax.__version__}; backend: {jax.default_backend()}; "
          f"devices: {[str(d) for d in jax.devices()]}")
    print(f"x64 enabled: {jax.config.jax_enable_x64}")
    cache = jax.config.jax_compilation_cache_dir
    cache_msg = cache or ("DISABLED (first FFT compile will be slow; "
                          "set jax_compilation_cache_dir)")
    print(f"compile cache: {cache_msg}")

    # Complex transfer quirk — probed in a SUBPROCESS: on the axon runtime a
    # failed complex fetch poisons the whole process (later real uploads
    # start failing UNIMPLEMENTED too — observed while writing this), so it
    # must never run in the process that continues the checks.
    import subprocess

    probe = ("import numpy, jax, jax.numpy as jnp; "
             "numpy.asarray(jax.jit(lambda: jnp.fft.rfft(jnp.arange(8.0)))())")
    try:
        r = subprocess.run([sys.executable, "-c", probe], capture_output=True,
                           text=True, timeout=300)
    except subprocess.TimeoutExpired:
        print("complex device->host transfer: probe TIMED OUT after 300 s "
              "(likely a cold remote FFT compile) - rerun doctor once the "
              "compile cache is warm")
        r = None
    if r is None:
        pass
    elif r.returncode == 0:
        print("complex device->host transfer: OK")
    elif "UNIMPLEMENTED" in (r.stderr or ""):
        print("complex device->host transfer: UNIMPLEMENTED (and poisons the "
              "process!) - fetch jnp.real/jnp.imag separately (the library "
              "getters do), never np.asarray a complex device array")
    else:
        tail = (r.stderr or "").strip().splitlines()[-1:]
        print("complex device->host transfer: probe FAILED for another "
              f"reason ({tail[0] if tail else 'no stderr'}) - not the "
              "UNIMPLEMENTED quirk; investigate separately")

    # end-to-end tiny solve, jitted, timed by scalar fetch
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (8, 64, 64)
    m = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                        dxy=100e-9, dz=300e-9, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    obj = jnp.asarray(np.abs(rng.standard_normal(shape)).astype(np.float32) * 20)
    noise = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    @jax.jit
    def solve(o, n):
        psf = m.compute_psf(m.init_params())
        d = convolve(o, convolve_spectrum(psf), shape) + 0.5 * n
        return deconvolve(d, psf, config=DeconvolutionConfig(
            mu=0.01, epsilon=1.0, max_iter=10, grtol=0.0)).f

    t0 = _time.perf_counter()
    f = float(solve(obj, noise))
    t_compile = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    f = float(solve(obj, noise))
    t_steady = _time.perf_counter() - t0
    ok = np.isfinite(f)
    print(f"jitted solve (8x64x64, 10 iters): compile+run {t_compile:.1f}s, "
          f"steady {t_steady*1000:.0f} ms, cost finite: {ok}")

    # does block_until_ready actually synchronize here? (compare against
    # the scalar-fetch timing — a large ratio means it does not)
    t0 = _time.perf_counter()
    jax.block_until_ready(solve(obj, noise))
    t_bur = _time.perf_counter() - t0
    if t_bur < 0.5 * t_steady:
        print(f"block_until_ready: does NOT synchronize on this runtime "
              f"({t_bur*1000:.0f} ms vs {t_steady*1000:.0f} ms scalar fetch) "
              "- time by fetching a scalar")
    else:
        print(f"block_until_ready: synchronizes ({t_bur*1000:.0f} ms)")

    # virtual-mesh availability (sharding tests / dryruns)
    n = jax.device_count()
    print(f"device count: {n} "
          + ("(multi-chip sharding available)" if n > 1 else
             "(single chip; sharded paths validate on a virtual CPU mesh — "
             "see __graft_entry__.dryrun_multichip)"))
    print("doctor: OK" if ok else "doctor: PROBLEMS FOUND")
    if not ok:
        sys.exit(1)


def cmd_info(args):
    from microtipi_tpu.io.tiffstack import read_pixel_size, stack_info

    if _is_plate(args.stack):
        from microtipi_tpu.io.plate import plate_info

        print(plate_info(args.stack))
        return
    if _is_zarr(args.stack):
        from microtipi_tpu.io.zarrstack import zarr_info

        print(zarr_info(args.stack))
        return
    if str(args.stack).lower().endswith((".ome", ".xml")):
        from microtipi_tpu.io.ome import parse_ome

        with open(args.stack, "r", encoding="utf-8") as fh:
            meta = parse_ome(fh.read())
        nz, ny, nx = meta["shape"]
        files = sorted({td["filename"] for td in meta["tiff_data"] if td["filename"]})
        print(f"{args.stack}: OME companion set, Z={nz} Y={ny} X={nx} "
              f"C={meta['size_c']} T={meta['size_t']}, {len(files)} files")
        for f in files:
            print(f"  {f}")
        return
    if _is_h5(args.stack):
        from microtipi_tpu.io.hdf5stack import bdv_info, list_datasets

        try:
            res, shapes = bdv_info(args.stack)
            print(f"{args.stack}: BigDataViewer pyramid, {len(shapes)} levels")
            for lvl, (shape, r) in enumerate(zip(shapes, res)):
                print(f"  level {lvl}: Nz={shape[0]} Ny={shape[1]} Nx={shape[2]} "
                      f"(downsampling {tuple(r)})")
        except Exception:
            for name in list_datasets(args.stack):
                print(f"{args.stack}: dataset {name!r}")
        return
    nz, ny, nx = stack_info(args.stack)
    line = f"{args.stack}: Nz={nz} Ny={ny} Nx={nx} ({nz*ny*nx/1e6:.1f} Mvox)"
    dxy, dz = read_pixel_size(args.stack)
    if dxy:
        line += f" dxy={dxy*1e9:.4g}nm"
    if dz:
        line += f" dz={dz*1e9:.4g}nm"
    try:
        from microtipi_tpu.io.ome import read_ome

        meta = read_ome(args.stack)
    except Exception:
        meta = None
    if meta and (meta["size_c"] > 1 or meta["size_t"] > 1):
        line += f" [OME hyperstack: Z={meta['shape'][0]} C={meta['size_c']} T={meta['size_t']}]"
    print(line)
    if meta:
        for i, ch in enumerate(meta.get("channels") or []):
            em = ch.get("emission_wavelength")
            bits = [f"channel {i}"]
            if ch.get("name"):
                bits.append(ch["name"])
            if em:
                bits.append(f"emission {em*1e9:.4g} nm")
            print("  " + ": ".join(bits))


def cmd_psf(args):
    import numpy as np
    import jax.numpy as jnp
    from microtipi_tpu.io.tiffstack import write_stack
    from microtipi_tpu.utils.arrays import roll
    import jax

    shape = tuple(args.shape)
    _resolve_geometry(args)  # no input stack: fall back to defaults
    model = _build_model(args, shape)
    params = model.init_params()
    if args.phase:
        if len(args.phase) != args.n_phase:
            sys.exit(f"--phase needs {args.n_phase} coefficients")
        params = params._replace(phase=jnp.asarray(args.phase, jnp.float32))
    psf = jax.jit(model.compute_psf)(params)
    if args.centered:
        psf = roll(psf)
    _write_out(args, args.out, np.asarray(psf), dxy=args.dxy, dz=args.dz)
    print(f"wrote {args.out} (sum={float(psf.sum()):.4g})")


def _load_params_json(model, path):
    """Model params from a ``fitpsf --params-out`` JSON (unknown keys and
    metadata fields are ignored; listed families replace the defaults)."""
    import json

    import jax.numpy as jnp

    params = model.init_params()
    with open(path) as fh:
        doc = json.load(fh)
    for name in params._fields:
        if name in doc:
            params = params._replace(**{name: jnp.asarray(doc[name], model.dtype)})
    return params


def _load_pupil_maps(args, model, paths):
    """Load K ``fitpsf --retrieve-map`` npz files and return (phis, rhos,
    defocus) stacks on the SAMPLE model's pupil grid — resampling each map
    from its bead-crop frequency grid when the geometry differs
    (``jobs/phase_retrieval.resample_pupil_map``)."""
    import numpy as np
    import jax
    from microtipi_tpu.jobs.phase_retrieval import resample_pupil_map

    # jit (static geometry) so the eager CLI path is one dispatch per map,
    # not one remote compile per gather op (platform rule: CLAUDE.md).
    resample = jax.jit(resample_pupil_map, static_argnums=(1, 2, 3))
    ny_d, nx_d = model.shape[1], model.shape[2]
    nominal_defocus = np.asarray(model.init_params().defocus)
    phis, rhos, defoc = [], [], []
    for path in paths:
        with np.load(path) as z:
            if "phi" not in z.files:
                sys.exit(f"{path}: not a fitpsf --retrieve-map npz (no 'phi')")
            phi = np.asarray(z["phi"])
            mask = np.asarray(z["mask"]) if "mask" in z.files else None
            rho = np.asarray(z["rho"]) if "rho" in z.files else None
            src_dxy = float(z["dxy"]) if "dxy" in z.files else args.dxy
            d = np.asarray(z["defocus"]) if "defocus" in z.files \
                else nominal_defocus
        if phi.shape != (ny_d, nx_d) or abs(src_dxy - args.dxy) > 1e-15:
            phi = resample(phi, src_dxy, (ny_d, nx_d), args.dxy, mask=mask)
            if rho is not None:
                rho = resample(rho, src_dxy, (ny_d, nx_d), args.dxy, mask=mask)
        phis.append(np.asarray(phi))
        rhos.append(None if rho is None else np.asarray(rho))
        defoc.append(d)
    have_rho = [r is not None for r in rhos]
    if any(have_rho) and not all(have_rho):
        sys.exit("--depthvar-maps: maps mix --retrieve-modulus and "
                 "phase-only retrievals; re-run fitpsf consistently "
                 "(the nominal flat modulus cannot be spliced per-anchor)")
    return (np.stack(phis),
            np.stack(rhos) if all(have_rho) else None,
            np.stack(defoc))


def _depthvar_anchor_array(args, k, nz, sort=True):
    """K anchor depths from --depthvar-anchors (validated) or evenly spaced
    over the stack. Sorted ascending (depth_weights requires it) unless the
    caller must keep user order to pair anchors with per-anchor inputs
    (the --depthvar-maps path, which argsorts maps and depths together)."""
    import numpy as np

    if getattr(args, "depthvar_anchors", None):
        anchors = np.asarray(args.depthvar_anchors, np.float64)
        if anchors.size != k:
            sys.exit(f"--depthvar-anchors needs {k} depths "
                     f"(one per anchor), got {anchors.size}")
        if np.unique(anchors).size != anchors.size:
            sys.exit("--depthvar-anchors must be distinct depths")
        return np.sort(anchors) if sort else anchors
    return np.linspace(0.0, nz - 1.0, k)


def _cmd_deconv_depthvar(args, data):
    """deconv --depthvar K / --depthvar-maps NPZ...: depth-varying solve
    with K anchor PSFs blended along z — synthesized from Gibson-Lanni
    parameters (--params-json, the parametric route) or from measured
    retrieved pupil maps (fitpsf --retrieve-map outputs, one per
    calibration depth)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from microtipi_tpu.jobs.depthvar import (
        deconvolve_depthvar, depth_anchor_psfs, depth_anchor_psfs_from_maps)

    maps = getattr(args, "depthvar_maps", None)
    if maps and getattr(args, "depthvar", 0):
        sys.exit("--depthvar K and --depthvar-maps are alternative anchor "
                 "routes; pass one")
    if getattr(args, "mesh", None):
        sys.exit("--depthvar is single-device for now (no --mesh)")
    _resolve_geometry(args, args.data)
    k = len(maps) if maps else args.depthvar
    # maps: keep user order here — depths pair with the map files and are
    # argsorted together below.
    anchors = _depthvar_anchor_array(args, k, data.shape[0],
                                     sort=not maps)
    cfg = _deconv_config(args, data.shape)
    w = _weights(args, data)
    t0 = time.time()

    rl = args.method == "rl"
    if rl and w is not None:
        sys.exit("--method rl is Poisson-MLE; it does not take weights "
                 "(drop --gain/--auto-gain or use the VMLMB path)")

    def solve(d, psfs, wt):
        if rl:
            from microtipi_tpu.jobs.depthvar import richardson_lucy_depthvar

            x, iters = richardson_lucy_depthvar(
                d, psfs, anchors, iterations=args.iters, mu=cfg.mu,
                epsilon=cfg.epsilon, accelerate=args.rl_accelerate,
                stop=args.rl_stop, stop_sigma=args.noise_sigma,
                stop_tau=args.tau, return_iterations=True)
            return x, iters, jnp.zeros((), d.dtype)
        res = deconvolve_depthvar(d, psfs, anchors, weights=wt, config=cfg)
        return res.x, res.iterations, res.f

    if maps:
        if getattr(args, "model", "widefield") != "widefield":
            sys.exit("--depthvar-maps synthesizes through the scalar pupil "
                     "(--model widefield)")
        model = _build_model(args, data.shape)
        phis, rhos, defoc = _load_pupil_maps(args, model, maps)
        order = np.argsort(anchors, kind="stable")
        anchors = anchors[order]
        phis, defoc = phis[order], defoc[order]
        rhos = None if rhos is None else rhos[order]
        label = f"depthvar maps K={k}"

        run = jax.jit(lambda d, w, ph, df, *rh: solve(
            d, depth_anchor_psfs_from_maps(model, ph, rh[0] if rh else None,
                                           df), w))
        out = run(data, w, phis, defoc) if rhos is None \
            else run(data, w, phis, defoc, rhos)
    else:
        if getattr(args, "model", "gl") != "gl":
            sys.exit("--depthvar requires --model gl "
                     "(anchors vary the DEPTH family)")
        model = _build_model(args, data.shape)
        params = _load_params_json(model, args.params_json) if args.params_json \
            else model.init_params()
        label = f"depthvar K={k}"

        @jax.jit
        def run(d, w):
            # depth0 = the calibrated depth of plane z=0 (a ladder fit's d0),
            # NOT the model's nominal --depth.
            psfs = depth_anchor_psfs(model, params, anchors,
                                     depth0=params.depth[1])
            return solve(d, psfs, w)

        out = run(data, w)
    x, iters, f = out
    tail = f"{'' if rl else f'cost {float(f):.6g}, '}"
    print(f"deconv[{label}{' rl' if rl else ''}]: {int(iters)} iters, "
          f"{tail}{time.time()-t0:.1f}s (incl. compile)")
    _write_out(args, args.out, np.asarray(x), dxy=args.dxy, dz=args.dz)
    print("wrote", args.out)


def _plate_fan_out(args, solve_one, label):
    """Shared plate batch path: solve every well/field, write an output
    plate mirroring the input layout (and zarr format). ``solve_one`` maps
    one (Nz, Ny, Nx) numpy volume -> one output volume."""
    import numpy as np

    from microtipi_tpu.io import zarr3
    from microtipi_tpu.io.plate import (
        list_plate_images, read_plate_image, write_plate)

    if not str(args.out).rstrip("/").lower().endswith(".zarr"):
        sys.exit("plate outputs are NGFF plates; --out must end in .zarr")
    images = list_plate_images(args.data)
    fmt = 3 if zarr3.is_zarr3_group(args.data) else 2
    t, c = int(args.timepoint or 0), int(args.channel or 0)
    out_wells = {}
    t0 = time.time()
    for well, field in images:
        arr, _meta = read_plate_image(args.data, well, field)
        nt, nc = arr.shape[:2]
        if not (0 <= t < nt and 0 <= c < nc):
            sys.exit(f"--timepoint {t} / --channel {c} out of range "
                     f"(well {well}: T={nt}, C={nc})")
        out = solve_one(np.ascontiguousarray(arr[t, c]))
        out_wells.setdefault(well, []).append(np.asarray(out))
        print(f"{label}: well {well} field {field} done "
              f"({time.time()-t0:.1f}s elapsed)")
    write_plate(args.out, out_wells, dxy=args.dxy, dz=args.dz,
                zarr_format=fmt, levels=getattr(args, "zarr_levels", 1))
    print("wrote", args.out, f"({len(images)} images, zarr v{fmt})")


def _cmd_deconv_plate(args):
    """deconv on a plate input without --well: every well/field gets its
    own solve (one compile per distinct shape), results re-enter as an
    output plate."""
    import jax
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack
    from microtipi_tpu.jobs.deconv import deconvolve
    from microtipi_tpu.utils.arrays import unroll

    if getattr(args, "mesh", None) or getattr(args, "tile", None) \
            or getattr(args, "depthvar_maps", None):
        sys.exit("plate fan-out composes per-image dispatches; "
                 "drop --mesh/--tile/--depthvar-maps (or select one --well)")
    dv = getattr(args, "depthvar", 0)
    if dv:
        # Depth-varying plate fan-out (thick HCS samples: organoids,
        # spheroids): anchors synthesized per well shape from one
        # calibration — the parametric (--params-json) route only.
        if args.model != "gl":
            sys.exit("plate --depthvar requires --model gl")
        if getattr(args, "auto_mu", False):
            sys.exit("--auto-mu does not compose with --depthvar yet")
        if args.method == "rl" and (args.gain > 0
                                    or getattr(args, "auto_gain", False)):
            sys.exit("--method rl is Poisson-MLE; it does not take weights "
                     "(drop --gain/--auto-gain or use the VMLMB path)")
        psf = None
    elif not args.psf:
        sys.exit("--psf is required for plate deconv")
    if getattr(args, "auto_mu", False) and args.method == "rl":
        sys.exit("--auto-mu does not apply to --method rl (use --rl-stop)")
    _resolve_geometry(args, args.data, log=lambda *a: None)
    if not dv:
        psf = jnp.asarray(read_stack(args.psf))
        if args.psf_centered:
            psf = unroll(psf)
    runs = {}

    def solve_one(vol):
        if dv:
            return _solve_one_depthvar(vol)
        return _solve_one_fixed(vol)

    def _solve_one_depthvar(vol):
        import numpy as np

        from microtipi_tpu.jobs.depthvar import (
            deconvolve_depthvar, depth_anchor_psfs, richardson_lucy_depthvar)

        vol = jnp.asarray(vol)
        if vol.shape not in runs:
            model = _build_model(args, vol.shape)
            params = (_load_params_json(model, args.params_json)
                      if args.params_json else model.init_params())
            anchors = _depthvar_anchor_array(args, dv, vol.shape[0])
            if args.method == "rl":
                runs[vol.shape] = jax.jit(
                    lambda d, m=model, p=params, a=anchors:
                    richardson_lucy_depthvar(
                        d, depth_anchor_psfs(m, p, a, depth0=p.depth[1]), a,
                        iterations=args.iters, mu=args.mu,
                        epsilon=args.epsilon, accelerate=args.rl_accelerate,
                        stop=args.rl_stop, stop_sigma=args.noise_sigma,
                        stop_tau=args.tau))
            else:
                cfg = _deconv_config(args, vol.shape)
                runs[vol.shape] = jax.jit(
                    lambda d, w, m=model, p=params, a=anchors, cfg=cfg:
                    deconvolve_depthvar(
                        d, depth_anchor_psfs(m, p, a, depth0=p.depth[1]), a,
                        weights=w, config=cfg).x)
        if args.method == "rl":
            return runs[vol.shape](vol)
        return runs[vol.shape](vol, _weights(args, vol))

    def _solve_one_fixed(vol):
        vol = jnp.asarray(vol)
        if getattr(args, "auto_mu", False) and args.method != "rl":
            # Calibrate-once across the plate (the serving watch semantics):
            # the first well's discrepancy bisection sets mu, later wells
            # reuse it on the cheap fixed-mu solver.
            from microtipi_tpu.jobs.autotune import deconvolve_auto_mu

            w = _weights(args, vol)
            auto = jax.jit(lambda d, p, w: deconvolve_auto_mu(
                d, p, weights=w, config=_deconv_config(args, vol.shape),
                sigma=args.noise_sigma, tau=args.tau))(vol, psf, w)
            args.mu = float(auto.mu)
            args.auto_mu = False
            print(f"auto-mu (first plate image): mu={args.mu:.4g}")
            return auto.result.x
        if vol.shape not in runs:
            if args.method == "rl":
                from microtipi_tpu.jobs.richardson_lucy import richardson_lucy

                runs[vol.shape] = jax.jit(lambda d, p: richardson_lucy(
                    d, p, iterations=args.iters, mu=args.mu,
                    epsilon=args.epsilon, accelerate=args.rl_accelerate,
                    stop=args.rl_stop, stop_sigma=args.noise_sigma,
                    stop_tau=args.tau))
            else:
                cfg = _deconv_config(args, vol.shape)
                runs[vol.shape] = jax.jit(
                    lambda d, p, w, cfg=cfg: deconvolve(
                        d, p, weights=w, config=cfg))
        if args.method == "rl":
            return runs[vol.shape](vol, psf)
        res = runs[vol.shape](vol, psf, _weights(args, vol))
        return res.x

    _plate_fan_out(args, solve_one, "deconv")


def _read_hyperstack(args, errprefix):
    """Read a (T, C, Z, Y, X) hyperstack (OME-TIFF or OME-NGFF zarr) or exit
    with a one-line error — shared by every joint 4D/5D solve command."""
    try:
        if _is_zarr(args.data):
            from microtipi_tpu.io.zarrstack import read_ngff_hyperstack
            return read_ngff_hyperstack(args.data)
        from microtipi_tpu.io.ome import read_ome_hyperstack
        return read_ome_hyperstack(args.data)
    except Exception as e:
        sys.exit(f"{errprefix} needs a (T, C, Z, Y, X) hyperstack input: {e}")


def _prep_hyperstack(args, arr):
    """Shared preprocessing flags + non-finite fencing for every (Z, Y, X)
    volume of a (T, C, Z, Y, X) hyperstack — the hyperstack-input analogue
    of ``_read_input_volume``'s tail (without it, --destripe/--flat/... were
    silently ignored on the joint 4D/5D paths, and one NaN voxel poisons
    every FFT-based cost)."""
    import numpy as np

    arr = np.ascontiguousarray(arr)
    pre = _build_preprocess(args)
    if pre is not None:
        out = np.empty(arr.shape, np.float32)
        for t in range(arr.shape[0]):
            for c in range(arr.shape[1]):
                out[t, c] = pre(arr[t, c])
        arr = out
        print("preprocessed input (ops.preprocess)")
    bad = ~np.isfinite(arr)
    if bad.any():
        print(f"[input] {args.data}: zeroed {int(bad.sum())} non-finite "
              "voxel(s) (dead pixels / corruption; --gain adds statistical "
              "exclusion)")
        arr = np.where(bad, 0.0, arr).astype(arr.dtype)
    return arr


def _write_hyperstack(args, out):
    """Write a (T, C, Z, Y, X) result next to the input's container format."""
    if str(args.out).lower().endswith(".zarr"):
        from microtipi_tpu.io.zarrstack import write_ngff_hyperstack
        write_ngff_hyperstack(args.out, out, dxy=args.dxy, dz=args.dz,
                              levels=getattr(args, "zarr_levels", 1))
    else:
        from microtipi_tpu.io.ome import write_ome_hyperstack
        write_ome_hyperstack(args.out, out, dxy=args.dxy, dz=args.dz)
    print("wrote", args.out)


def _cmd_deconv_timeseries(args):
    """deconv --mu-t: joint 4D solve over ALL timepoints of a hyperstack
    with the temporal TV prior (jobs/timeseries.py)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack
    from microtipi_tpu.jobs.timeseries import deconvolve_timeseries
    from microtipi_tpu.utils.arrays import unroll

    if getattr(args, "mesh", None) or getattr(args, "tile", None) \
            or getattr(args, "depthvar", 0) or getattr(args, "depthvar_maps", None) \
            or getattr(args, "auto_mu", False):
        sys.exit("--mu-t is the joint 4D time-series solve; drop "
                 "--mesh/--tile/--depthvar/--auto-mu")
    if not args.psf:
        sys.exit("--psf is required for --mu-t")
    arr, _meta = _read_hyperstack(args, "--mu-t")
    nt, nc = arr.shape[:2]
    if nt < 2:
        sys.exit(f"--mu-t couples timepoints; input has SizeT={nt}")
    c = min(args.channel, nc - 1)
    series = jnp.asarray(_prep_hyperstack(args, arr[:, c][:, None])[:, 0])
    _resolve_geometry(args, args.data, log=lambda *a: None)
    psf = jnp.asarray(read_stack(args.psf))
    if args.psf_centered:
        psf = unroll(psf)
    if getattr(args, "register_t", False):
        from microtipi_tpu.ops.register import register_timeseries

        series, shifts = jax.jit(register_timeseries)(series)
        print("drift correction (voxels, cumulative):",
              np.round(np.asarray(shifts), 2).tolist())
    bleach = None
    if getattr(args, "bleach_correct", False):
        from microtipi_tpu.ops.preprocess import estimate_bleach

        bleach = jax.jit(estimate_bleach)(series)
        print("bleach gains (relative to frame 0):",
              np.round(np.asarray(bleach), 3).tolist())
    cfg = _deconv_config(args, series.shape[1:])
    w = None
    if getattr(args, "auto_gain", False) or args.gain > 0:
        from microtipi_tpu.weights.updaters import InverseVarianceWeights
        gain, rv = args.gain, args.readout
        if getattr(args, "auto_gain", False):
            from microtipi_tpu.weights.updaters import estimate_gain_readout
            g_est, rv_est = jax.jit(estimate_gain_readout)(series[0])
            gain, rv = float(g_est), float(rv_est)
            print(f"auto-gain (frame 0): gain={gain:.4g}, readout var={rv:.4g}")
        w = InverseVarianceWeights(gain=gain, readout_variance=rv).from_data(series)
    run = jax.jit(lambda d, p, w, g: deconvolve_timeseries(
        d, p, weights=w, config=cfg, mu_t=args.mu_t,
        epsilon_t=args.epsilon_t, bleach=g))
    t0 = time.time()
    res = run(series, psf, w, bleach)
    f = float(res.f)
    print(f"deconv[timeseries T={nt}]: {int(res.iterations)} iters, "
          f"cost {f:.6g}, {time.time()-t0:.1f}s (incl. compile)")
    _write_hyperstack(args, np.asarray(res.x)[:, None])  # (T, 1, Z, Y, X)


# Flags the joint multi-channel solves reject instead of silently ignoring
# (shared by the 4D and 5D commands so the lists cannot drift).
_MC_EXCLUSIVE_FLAGS = (
    ("mesh", "--mesh"), ("tile", "--tile"), ("depthvar", "--depthvar"),
    ("depthvar_maps", "--depthvar-maps"), ("superres", "--superres"),
    ("auto_mu", "--auto-mu"),
)


def _parse_mixing(spec, nc):
    """--mixing SPEC -> (nc, K) NumPy bleed-through matrix. SPEC is a JSON
    file (list of rows), a CSV file, or inline rows 'a,b;c,d'."""
    import json
    import os

    import numpy as np

    try:
        if os.path.exists(spec):
            if spec.lower().endswith(".json"):
                with open(spec) as fh:
                    m = np.asarray(json.load(fh), np.float64)
            else:
                m = np.loadtxt(spec, delimiter=",", ndmin=2)
        else:
            m = np.asarray([[float(v) for v in row.split(",")]
                            for row in spec.split(";")], np.float64)
    except SystemExit:
        raise
    except Exception as e:
        sys.exit(f"--mixing: could not parse {spec!r}: {e}")
    if m.ndim != 2 or m.shape[0] != nc:
        sys.exit(f"--mixing must be a ({nc}, K) matrix (one row per detected "
                 f"channel of the input); got shape {getattr(m, 'shape', None)}")
    return m


def _resolve_channel_psfs(args, meta, nc, vol, explicit_wl=None):
    """One PSF per channel (or per dye, with --mixing) for the joint
    multi-channel solves: from ``--psf`` (a C-channel hyperstack, or one
    volume broadcast) or synthesized from the model flags at each OME
    channel's EmissionWavelength (chromatic optics — NA/lambda and
    ni/lambda scale with emission, WideFieldModel.java:165-166). Returns
    (C,) + vol or one volume. ``explicit_wl`` is --wavelength captured
    BEFORE ``_resolve_geometry`` defaults it (561 nm) — without the
    capture, channels lacking OME emission metadata would silently all get
    the same default-wavelength PSF instead of the intended hard error."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack
    from microtipi_tpu.utils.arrays import unroll

    if args.psf:
        try:
            from microtipi_tpu.io.ome import read_ome_hyperstack
            parr, _pm = read_ome_hyperstack(args.psf)
            psfs = np.ascontiguousarray(parr[0])  # (Cp, Z, Y, X)
            if psfs.shape[0] == 1:
                psfs = psfs[0]
            elif psfs.shape[0] != nc:
                sys.exit(f"--psf has {psfs.shape[0]} channels, expected {nc} "
                         "(the data's channels, or K dyes with --mixing)")
        except SystemExit:
            raise
        except Exception:
            psfs = read_stack(args.psf)  # one volume, broadcast
        psfs = jnp.asarray(psfs)
        if args.psf_centered:
            psfs = unroll(psfs) if psfs.ndim == 3 else jax.vmap(unroll)(psfs)
        return psfs
    # Synthesize one PSF per channel at its emission wavelength.
    channels = meta.get("channels") or []
    lams = []
    for c in range(nc):
        em = channels[c].get("emission_wavelength") if c < len(channels) else None
        em = em or explicit_wl
        if not em:
            sys.exit(f"channel {c} has no OME EmissionWavelength and no "
                     "--wavelength was given; pass --psf or --wavelength")
        lams.append(float(em))
    print("per-channel emission wavelengths [nm]:",
          [round(l * 1e9, 1) for l in lams])
    if args.wavelength is None:
        args.wavelength = lams[0]  # _build_model requires a value
    psf_list = []
    for lam in lams:
        saved = args.wavelength
        args.wavelength = lam
        model = _build_model(args, vol)
        args.wavelength = saved
        # jit: eager synthesis remote-compiles per op on the axon runtime.
        psf_list.append(jax.jit(model.compute_psf)(model.init_params()))
    return jnp.stack(psf_list)


def _cmd_deconv_multichannel(args):
    """deconv --all-channels: joint solve over every channel of a hyperstack
    at --timepoint, each channel with its OWN PSF (jobs/multichannel.py).
    PSFs come from --psf (a C-channel hyperstack, or one volume broadcast)
    or are synthesized from the model flags at each OME channel's emission
    wavelength — the chromatic-optics path (NA/lambda and ni/lambda both
    scale with emission, WideFieldModel.java:165-166)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack
    from microtipi_tpu.jobs.multichannel import deconvolve_multichannel
    from microtipi_tpu.utils.arrays import unroll

    for flag, name in _MC_EXCLUSIVE_FLAGS:
        if getattr(args, flag, None):
            sys.exit(f"--all-channels does not compose with {name}; run "
                     "per-channel solves instead")
    if args.method != "vmlmb":
        sys.exit("--all-channels couples channels through the VMLMB prior; "
                 "--method rl has no coupled form (run rl per channel)")
    arr, meta = _read_hyperstack(args, "--all-channels")
    nt, nc = arr.shape[:2]
    if nc < 2:
        sys.exit(f"--all-channels couples channels; input has SizeC={nc}")
    t = int(getattr(args, "timepoint", 0) or 0)
    if not (0 <= t < nt):
        sys.exit(f"--timepoint {t} out of range (T={nt})")
    stack = jnp.asarray(_prep_hyperstack(args, arr[t][None])[0])  # (C, Z, Y, X)
    vol = stack.shape[1:]
    explicit_wl = args.wavelength  # capture before _resolve_geometry defaults it
    _resolve_geometry(args, args.data, log=lambda *a: None)

    mix = _parse_mixing(args.mixing, nc) if getattr(args, "mixing", None) else None
    nk = mix.shape[1] if mix is not None else nc
    psfs = _resolve_channel_psfs(args, meta, nk, vol, explicit_wl)
    cfg = _deconv_config(args, vol)
    w = None
    if getattr(args, "auto_gain", False) or args.gain > 0:
        from microtipi_tpu.weights.updaters import InverseVarianceWeights
        if getattr(args, "auto_gain", False):
            from microtipi_tpu.weights.updaters import estimate_gain_readout
            est = jax.jit(estimate_gain_readout)  # one trace for all channels
            ws = []
            for c in range(nc):  # camera constants are per channel/camera
                g_est, rv_est = est(stack[c])
                print(f"auto-gain (channel {c}): gain={float(g_est):.4g}, "
                      f"readout var={float(rv_est):.4g}")
                iv = InverseVarianceWeights(
                    gain=float(g_est), readout_variance=float(rv_est))
                ws.append(jax.jit(iv.from_data)(stack[c]))  # jit: axon rules
            w = jnp.stack(ws)
        else:
            iv = InverseVarianceWeights(
                gain=args.gain, readout_variance=args.readout)
            w = jax.jit(iv.from_data)(stack)

    coupling = getattr(args, "coupling", "joint")
    run = jax.jit(lambda d, p, w: deconvolve_multichannel(
        d, p, weights=w, config=cfg, coupling=coupling, mixing=mix))
    t0 = time.time()
    res = run(stack, psfs, w)
    unmix_tag = f" -> K={nk} dyes" if mix is not None else ""
    print(f"deconv[channels C={nc}{unmix_tag}, {coupling}]: "
          f"{int(res.iterations)} iters, "
          f"cost {float(res.f):.6g}, {time.time()-t0:.1f}s (incl. compile)")
    _write_hyperstack(args, np.asarray(res.x)[None])  # (1, C or K, Z, Y, X)


def _cmd_deconv_timeseries_multichannel(args):
    """deconv --mu-t --all-channels: the full (T, C) acquisition in ONE
    solve (jobs/multichannel.deconvolve_timeseries_multichannel) — color TV
    couples channels within each timepoint, temporal TV couples timepoints
    per channel, per-channel chromatic PSFs throughout. --register-t
    estimates drift on the BRIGHTEST channel and applies it to all
    (channels share the stage); --bleach-correct estimates per-channel
    fading (fluorophores fade at their own rates)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from microtipi_tpu.jobs.multichannel import deconvolve_timeseries_multichannel

    for flag, name in _MC_EXCLUSIVE_FLAGS:
        if getattr(args, flag, None):
            sys.exit(f"--mu-t --all-channels does not compose with {name}")
    if args.method != "vmlmb":
        sys.exit("--mu-t --all-channels couples through the VMLMB priors; "
                 "--method rl has no coupled form")
    arr, meta = _read_hyperstack(args, "--mu-t --all-channels")
    nt, nc = arr.shape[:2]
    if nt < 2:
        sys.exit(f"--mu-t couples timepoints; input has SizeT={nt}")
    if nc < 2:
        sys.exit(f"--all-channels couples channels; input has SizeC={nc}")
    mix = _parse_mixing(args.mixing, nc) if getattr(args, "mixing", None) else None
    nk = mix.shape[1] if mix is not None else nc
    if mix is not None and getattr(args, "bleach_correct", False):
        sys.exit("--bleach-correct does not compose with --mixing: the CLI "
                 "estimator reads per-DETECTED-channel flux, but gains under "
                 "unmixing are per DYE — estimate them on unmixed/control "
                 "data and pass bleach= via the API")
    block = jnp.asarray(_prep_hyperstack(args, arr))  # (T, C, Z, Y, X)
    vol = block.shape[2:]
    explicit_wl = args.wavelength  # capture before _resolve_geometry defaults it
    _resolve_geometry(args, args.data, log=lambda *a: None)
    psfs = _resolve_channel_psfs(args, meta, nk, vol, explicit_wl)

    if getattr(args, "register_t", False):
        from microtipi_tpu.ops.register import fourier_shift, register_timeseries

        # Drift is the STAGE's, shared by every channel: estimate on the
        # brightest channel (best SNR for the matched filter), apply the
        # same per-timepoint shift to all channels. Host-side reduction —
        # an eager device sum would remote-compile on the axon runtime.
        ref_c = int(np.argmax([float(np.sum(arr[:, c], dtype=np.float64))
                               for c in range(nc)]))

        @jax.jit
        def _register(b):
            _, shifts = register_timeseries(b[:, ref_c])
            return jax.vmap(  # over t
                lambda frames, s: jax.vmap(lambda v: fourier_shift(v, s))(frames)
            )(b, shifts), shifts

        block, shifts = _register(block)
        print(f"drift correction (voxels, cumulative; estimated on channel "
              f"{ref_c}):", np.round(np.asarray(shifts), 2).tolist())

    bleach = None
    if getattr(args, "bleach_correct", False):
        from microtipi_tpu.ops.preprocess import estimate_bleach

        # (T, C): each fluorophore fades at its own rate.
        bleach = jax.jit(jax.vmap(estimate_bleach, in_axes=1, out_axes=1))(block)
        print("bleach gains (relative to frame 0, per channel):",
              np.round(np.asarray(bleach), 3).tolist())

    cfg = _deconv_config(args, vol)
    w = None
    if getattr(args, "auto_gain", False) or args.gain > 0:
        from microtipi_tpu.weights.updaters import InverseVarianceWeights
        if getattr(args, "auto_gain", False):
            from microtipi_tpu.weights.updaters import estimate_gain_readout
            est = jax.jit(estimate_gain_readout)  # one trace for all channels
            ws = []
            for c in range(nc):  # camera constants are per channel/camera
                g_est, rv_est = est(block[0, c])
                print(f"auto-gain (channel {c}, frame 0): "
                      f"gain={float(g_est):.4g}, "
                      f"readout var={float(rv_est):.4g}")
                iv = InverseVarianceWeights(
                    gain=float(g_est), readout_variance=float(rv_est))
                ws.append(jax.jit(iv.from_data)(block[:, c]))  # (T,) + vol
            w = jnp.stack(ws, axis=1)  # (T, C) + vol
        else:
            iv = InverseVarianceWeights(
                gain=args.gain, readout_variance=args.readout)
            w = jax.jit(iv.from_data)(block)
    coupling = getattr(args, "coupling", "joint")
    run = jax.jit(lambda d, p, w, g: deconvolve_timeseries_multichannel(
        d, p, weights=w, config=cfg, mu_t=args.mu_t, epsilon_t=args.epsilon_t,
        bleach=g, coupling=coupling, mixing=mix))
    t0 = time.time()
    res = run(block, psfs, w, bleach)
    unmix_tag = f" -> K={nk} dyes" if mix is not None else ""
    print(f"deconv[timeseries T={nt} x channels C={nc}{unmix_tag}, "
          f"{coupling}]: {int(res.iterations)} iters, cost {float(res.f):.6g}, "
          f"{time.time()-t0:.1f}s (incl. compile)")
    _write_hyperstack(args, np.asarray(res.x))  # (T, C or K, Z, Y, X)


def _cmd_deconv_superres(args, data):
    """deconv --superres FZ FY FX: solve on a finer object grid
    (jobs/superres.py). The fine PSF comes from --psf (already at the fine
    pitch/shape) or is synthesized from the model flags at dxy/f, dz/f."""
    import argparse

    import numpy as np
    import jax
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack
    from microtipi_tpu.jobs.superres import deconvolve_superres
    from microtipi_tpu.utils.arrays import unroll

    if getattr(args, "mesh", None) or getattr(args, "tile", None) \
            or getattr(args, "depthvar", 0) or getattr(args, "depthvar_maps", None) \
            or getattr(args, "auto_mu", False) \
            or args.method == "rl" or getattr(args, "pad", 0):
        sys.exit("--superres is a single-chip fine-grid VMLMB solve; drop "
                 "--mesh/--tile/--depthvar/--auto-mu/--method rl/--pad")
    f = tuple(int(v) for v in args.superres)
    fine_shape = tuple(fi * s for fi, s in zip(f, data.shape))
    needs_upsample = False
    if args.psf:
        psf_fine = jnp.asarray(read_stack(args.psf))
        if args.psf_centered:
            psf_fine = unroll(psf_fine)
        needs_upsample = psf_fine.shape == tuple(data.shape)
        if needs_upsample:
            # Measured coarse-grid PSF (e.g. fitpsf --empirical-out):
            # band-limited Fourier upsampling — exact when the PSF
            # measurement itself was adequately sampled (see
            # jobs.superres.upsample_psf for the aliasing caveat). The
            # upsampling runs INSIDE the solve jit below: a separate jitted
            # FFT program would double the cold-start remote compile.
            print(f"upsampling the coarse --psf to the fine grid {fine_shape} "
                  "(band-limited; only valid if the PSF measurement was "
                  "adequately sampled)")
        if not needs_upsample and psf_fine.shape != fine_shape:
            sys.exit(f"--superres {f}: --psf must be sampled at the FINE "
                     f"grid {fine_shape} or the data grid {tuple(data.shape)} "
                     f"(got {psf_fine.shape}); or drop --psf to synthesize "
                     "from the model flags)")
    else:
        sub = argparse.Namespace(**vars(args))
        sub.dxy = args.dxy / f[2]
        sub.dz = args.dz / f[0]
        if f[1] != f[2]:
            sys.exit("--superres needs equal y/x factors (square pixels)")
        model = _build_model(sub, fine_shape)
        params = (_load_params_json(model, args.params_json)
                  if args.params_json else model.init_params())
        psf_fine = jax.jit(model.compute_psf)(params)
    cfg = _deconv_config(args, data.shape)
    w = _weights(args, data)
    up = args.psf and needs_upsample

    def _solve(d, p, w):
        if up:
            from microtipi_tpu.jobs.superres import upsample_psf

            p = upsample_psf(p, f)
        return deconvolve_superres(d, p, factor=f, weights=w, config=cfg)

    run = jax.jit(_solve)
    t0 = time.time()
    res = run(data, psf_fine, w)
    fval = float(res.f)
    wall = time.time() - t0
    print(f"deconv[superres x{f}]: {int(res.iterations)} iters, cost "
          f"{fval:.6g}, {wall:.1f}s (incl. compile); fine grid "
          f"{fine_shape}")
    _write_out(args, args.out, np.asarray(res.x),
               dxy=(args.dxy / f[2] if args.dxy else None),
               dz=(args.dz / f[0] if args.dz else None))
    print("wrote", args.out)
    if args.report:
        import json

        it = int(res.iterations)
        with open(args.report, "w") as fh:
            json.dump({
                "cost": fval, "iterations": it,
                "evaluations": int(res.evaluations), "status": int(res.status),
                "wall_seconds": round(wall, 3), "superres_factor": list(f),
                "f_history": np.asarray(res.f_history)[:it + 1].tolist(),
                "pg_history": np.asarray(res.pg_history)[:it + 1].tolist(),
            }, fh, indent=1)
        print("wrote", args.report)


def cmd_deconv(args):
    import numpy as np
    import jax
    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.jobs.deconv import deconvolve
    from microtipi_tpu.utils.arrays import unroll
    import jax.numpy as jnp

    if getattr(args, "mixing", None) and not getattr(args, "all_channels", False):
        sys.exit("--mixing is the joint unmixing solve over all channels; "
                 "it requires --all-channels")
    if getattr(args, "uncertainty", 0):
        # Laplace curvature of the single-volume VMLMB objective only —
        # fail NOW rather than silently ignoring the flag on other paths.
        for flag, name in (("mu_t", "--mu-t"), ("all_channels", "--all-channels"),
                           ("tile", "--tile"), ("mesh", "--mesh"),
                           ("superres", "--superres"), ("depthvar", "--depthvar"),
                           ("depthvar_maps", "--depthvar-maps")):
            if getattr(args, flag, None):
                sys.exit(f"--uncertainty does not compose with {name}; run it "
                         "on the plain single-volume solve (crop a region of "
                         "interest if the full problem needs those paths)")
        if _is_plate(args.data) and not getattr(args, "well", None):
            sys.exit("--uncertainty does not compose with the whole-plate "
                     "fan-out; pick one well (--well)")
        if args.method != "vmlmb":
            sys.exit("--uncertainty is the Laplace curvature of the VMLMB "
                     "objective at its solution; --method rl has no such "
                     "objective (its TV weight enters as a prior filter)")
    if getattr(args, "mu_t", None) is not None:
        if getattr(args, "superres", None):
            sys.exit("--mu-t and --superres do not compose yet; run the "
                     "fine-grid solve per timepoint or drop --superres")
        if getattr(args, "all_channels", False):
            _cmd_deconv_timeseries_multichannel(args)
            return
        _cmd_deconv_timeseries(args)
        return
    for flag, name in (("bleach_correct", "--bleach-correct"),
                       ("register_t", "--register-t")):
        if getattr(args, flag, False):
            sys.exit(f"{name} only applies to the time-series solver; "
                     "pass --mu-t to enable it (it would otherwise be "
                     "silently ignored)")
    if getattr(args, "all_channels", False):
        _cmd_deconv_multichannel(args)
        return
    if _is_plate(args.data) and not getattr(args, "well", None):
        _cmd_deconv_plate(args)
        return
    # --tile streams host-side tiles through the chip: keep the volume in
    # host memory (a beyond-HBM volume cannot live on device whole, and on
    # tunnel-attached deployments the full-volume round trip is a measured
    # multi-minute tax at design scale — BASELINE.md round 3). Every other
    # path wants the device array.
    data = _read_input_volume(args, args.data)
    if not getattr(args, "tile", None) or getattr(args, "superres", None):
        data = jnp.asarray(data)
    depthvar_tiled = bool(getattr(args, "depthvar", 0)) and bool(getattr(args, "tile", None))
    if getattr(args, "depthvar_maps", None) and getattr(args, "tile", None):
        sys.exit("--depthvar-maps does not compose with --tile; use the "
                 "parametric route (--depthvar K --params-json) for tiled "
                 "space-variant solves")
    if (getattr(args, "depthvar", 0) or getattr(args, "depthvar_maps", None)) \
            and not depthvar_tiled:
        _cmd_deconv_depthvar(args, data)
        return
    if getattr(args, "superres", None):
        _resolve_geometry(args, args.data, log=lambda *a: None)
        _cmd_deconv_superres(args, data)
        return
    field_json = getattr(args, "field_json", None)
    if not args.psf and not field_json and not depthvar_tiled:
        sys.exit("--psf is required (or --depthvar K / --depthvar-maps / "
                 "--tile with --field-json)")
    # No model is built on the plain path, but the output metadata should
    # still inherit the input's pixel sizes (TIFF tags / NGFF scale
    # transform).
    _resolve_geometry(args, args.data, log=lambda *a: None)
    depthvar_zs = None
    if field_json or depthvar_tiled:
        # Field-varying tiled solve: each JSON is a fitpsf --params-out
        # file with an added "position": [y, x] (field voxels) entry.
        # With --depthvar K on top: the FULLY space-variant composition
        # (lateral IDW x axial anchor blend, jobs.tiled.field_depthvar_psf).
        import json

        from microtipi_tpu.jobs.tiled import field_depthvar_psf, field_psf

        if not getattr(args, "tile", None):
            sys.exit("--field-json is the per-tile PSF source; it requires --tile")
        if args.psf:
            sys.exit("--field-json/--depthvar and --psf are exclusive under --tile")
        if depthvar_tiled and args.model != "gl":
            sys.exit("--tile --depthvar requires --model gl "
                     "(anchors vary the DEPTH family)")
        # Clamp the tile to the volume FIRST (tiled_deconvolve clamps the
        # same way): the per-tile model and the depthvar tile-z anchors must
        # see the clamped extent, or field_depthvar_psf mis-derives the tile
        # z-start from an oversized model grid.
        args.tile = [min(t, n) for t, n in zip(args.tile, data.shape)]
        model = _build_model(args, tuple(args.tile))
        anchors = []
        for path in field_json or ():
            with open(path) as fh:
                doc = json.load(fh)
            docs = doc["anchors"] if "anchors" in doc else [doc]  # fitpsf --field-out
            for entry in docs:
                if "position" not in entry:
                    sys.exit(f"{path}: add a \"position\": [y, x] entry "
                             "(field coordinates of the calibration, in voxels)")
                params = model.init_params()
                for name in params._fields:
                    if name in entry:
                        params = params._replace(
                            **{name: jnp.asarray(entry[name], model.dtype)})
                anchors.append(
                    (tuple(float(v) for v in entry["position"]), params))
        if depthvar_tiled and not anchors:
            # One calibration (e.g. a depth ladder), laterally constant:
            # the single-anchor degenerate IDW mix.
            params = (_load_params_json(model, args.params_json)
                      if args.params_json else model.init_params())
            anchors = [((0.0, 0.0), params)]
        if depthvar_tiled:
            depthvar_zs = _depthvar_anchor_array(
                args, args.depthvar, args.tile[0])
            psf = field_depthvar_psf(model, anchors, depthvar_zs)
        else:
            psf = field_psf(model, anchors)
    else:
        psf = jnp.asarray(read_stack(args.psf))
        if args.psf_centered:
            psf = unroll(psf)
    if getattr(args, "auto_mu", False) and (
            args.method == "rl" or getattr(args, "tile", None)):
        # Must precede the rl/tile branches: both return before the solve.
        sys.exit("--auto-mu selects the VMLMB TV weight; it does not apply "
                 "to --method rl (use --rl-stop) or --tile (tiles share one "
                 "mu — run auto-mu on a representative crop first)")
    if args.method == "rl" and not getattr(args, "tile", None):
        from microtipi_tpu.jobs.richardson_lucy import richardson_lucy

        bp = {"matched": "matched", "wb": "wiener-butterworth"}[args.rl_backprojector]
        run = jax.jit(lambda d, p: richardson_lucy(
            d, p, iterations=args.iters, mu=args.mu, epsilon=args.epsilon,
            accelerate=args.rl_accelerate, backprojector=bp,
            stop=args.rl_stop, stop_sigma=args.noise_sigma, stop_tau=args.tau,
            return_iterations=True))
        t0 = time.time()
        x, iters_used = run(data, psf)
        iters_used = int(iters_used)  # scalar fetch = sync on this runtime
        tag = ("" if args.rl_stop == "fixed"
               else f" ({args.rl_stop} discrepancy stop, cap {args.iters})")
        print(f"rl: {iters_used} iters{tag}, {time.time()-t0:.1f}s (incl. compile)")
        _write_out(args, args.out, np.asarray(x), dxy=getattr(args, "dxy", None), dz=getattr(args, "dz", None))
        print("wrote", args.out)
        return
    cfg = _deconv_config(args, data.shape)
    w = _weights(args, data)

    if getattr(args, "tile", None):
        from microtipi_tpu.jobs.tiled import tiled_deconvolve

        if getattr(args, "mesh", None):
            sys.exit("--tile streams tiles through one chip; drop --mesh")
        overlap = args.overlap
        if isinstance(overlap, list):
            if len(overlap) == 1:
                overlap = overlap[0]
            elif len(overlap) == 3:
                overlap = tuple(overlap)
            else:
                sys.exit("--overlap takes one value or three (OZ OY OX)")
        t0 = time.time()
        x = tiled_deconvolve(
            np.asarray(data), psf, weights=w, tile=tuple(args.tile),
            overlap=overlap, config=cfg, method=args.method,
            rl_iterations=args.iters, max_batch=args.tile_batch,
            depthvar_anchors=depthvar_zs,
        )
        tag = f" depthvar K={args.depthvar}" if depthvar_zs is not None else ""
        print(f"deconv[tiled {tuple(args.tile)}+{overlap}{tag}]: "
              f"{time.time()-t0:.1f}s (incl. compile)")
        _write_out(args, args.out, x, dxy=args.dxy, dz=args.dz)
        print("wrote", args.out)
        return

    if getattr(args, "auto_mu", False) and getattr(args, "mesh", None):
        sys.exit("--auto-mu runs on one chip; drop --mesh")
    mesh = _make_mesh(args)
    if getattr(args, "auto_mu", False):
        from microtipi_tpu.jobs.autotune import deconvolve_auto_mu

        run = jax.jit(lambda d, p, w: deconvolve_auto_mu(
            d, p, weights=w, config=cfg, sigma=args.noise_sigma, tau=args.tau))
        t0 = time.time()
        auto = run(data, psf, w)
        res = auto.result
        print(f"auto-mu: mu={float(auto.mu):.4g} "
              f"(discrepancy {float(auto.discrepancy):.4g} "
              f"/ target {float(auto.target):.4g}"
              + ("" if np.isnan(float(auto.sigma))
                 else f", sigma={float(auto.sigma):.4g}") + ")")
    elif mesh is not None:
        from microtipi_tpu.parallel.deconv import sharded_deconvolve

        run = jax.jit(lambda d, p, w: sharded_deconvolve(d, p, mesh, weights=w, config=cfg))
        t0 = time.time()
        res = run(data, psf, w)
    else:
        run = jax.jit(lambda d, p, w: deconvolve(d, p, weights=w, config=cfg))
        t0 = time.time()
        res = run(data, psf, w)
    f = float(res.f)
    wall = time.time() - t0
    print(f"deconv: {int(res.iterations)} iters, cost {f:.6g}, {wall:.1f}s (incl. compile)")
    _write_out(args, args.out, np.asarray(res.x), dxy=getattr(args, "dxy", None), dz=getattr(args, "dz", None))
    print("wrote", args.out)
    if args.report:
        import json

        it = int(res.iterations)
        with open(args.report, "w") as fh:
            json.dump({
                "cost": f, "iterations": it, "evaluations": int(res.evaluations),
                "status": int(res.status), "wall_seconds": round(wall, 3),
                "f_history": np.asarray(res.f_history)[:it + 1].tolist(),
                "pg_history": np.asarray(res.pg_history)[:it + 1].tolist(),
            }, fh, indent=1)
        print("wrote", args.report)
    if getattr(args, "uncertainty", 0):
        ucfg = cfg
        if getattr(args, "auto_mu", False):
            # The curvature must be taken at the mu the solve actually used.
            import dataclasses

            ucfg = dataclasses.replace(cfg, mu=float(auto.mu))
        _emit_object_uncertainty(args, data, psf, res.x, w, ucfg)


def _emit_object_uncertainty(args, data, psf, x, w, ucfg):
    """Shared --uncertainty tail of the deconv/blind commands: jitted
    Laplace sigma (jobs/uncertainty.py) written next to --out as *_std."""
    import os

    import jax
    import numpy as np

    from microtipi_tpu.jobs.uncertainty import object_uncertainty

    k, seed = args.uncertainty, args.uncertainty_seed
    cg_maxiter = getattr(args, "uncertainty_cg_maxiter", 100)
    t0 = time.time()
    if w is None:
        run_u = jax.jit(lambda d, p, x_: object_uncertainty(
            d, p, x_, config=ucfg, n_probes=k, cg_maxiter=cg_maxiter,
            key=jax.random.PRNGKey(seed)))
        est = run_u(data, psf, x)
    else:
        run_u = jax.jit(lambda d, p, x_, w_: object_uncertainty(
            d, p, x_, weights=w_, config=ucfg, n_probes=k,
            cg_maxiter=cg_maxiter, key=jax.random.PRNGKey(seed)))
        est = run_u(data, psf, x, w)
    sigma = np.asarray(est.sigma)
    med = float(np.median(sigma[sigma > 0])) if (sigma > 0).any() else 0.0
    std_path = getattr(args, "uncertainty_out", None)
    if not std_path:
        stem, ext = os.path.splitext(str(args.out))
        std_path = stem + "_std" + ext
    resid = float(est.residual)
    print(f"uncertainty: {k} probes, cg residual {resid:.2e}, "
          f"median sigma {med:.4g}, {time.time()-t0:.1f}s (incl. compile)")
    if resid > 1e-2:
        # docs/TUNING.md: a CG residual that is not << 1 means the H u = z
        # solves did not converge and sigma measures the wrong curvature.
        print(f"WARNING: CG residual {resid:.2e} is not << 1 -- the sigma "
              f"volume is unreliable; raise --uncertainty-cg-maxiter "
              f"(currently {cg_maxiter})")
    _write_out(args, std_path, sigma,
               dxy=getattr(args, "dxy", None), dz=getattr(args, "dz", None))
    print("wrote", std_path)


def _make_mesh(args):
    """(mesh, run_sharded) from --mesh BATCH Z; None when single-device."""
    if not getattr(args, "mesh", None):
        return None
    from microtipi_tpu.parallel.mesh import make_mesh

    batch, z = args.mesh
    return make_mesh(batch=batch, z=z)


def _blind_config(args, data_shape):
    from microtipi_tpu.jobs.blind import BlindDeconvConfig
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig
    fam_map = _family_map()
    if "depth" in args.families and args.model != "gl":
        sys.exit("--families depth requires --model gl (the DEPTH family lives on the Gibson-Lanni model)")
    if "sheet" in args.families and args.model != "lightsheet":
        sys.exit("--families sheet requires --model lightsheet (the SHEET family is the excitation-sheet geometry)")
    if "sted" in args.families and args.model != "sted":
        sys.exit("--families sted requires --model sted (the STED family is the depletion saturation factor)")
    if "cavity" in args.families and args.model != "4pi":
        sys.exit("--families cavity requires --model 4pi (the CAVITY family is the interferometric arm phase)")
    families = tuple(fam_map[f] for f in args.families)
    kw = dict(
        loops=args.loops,
        families=families,
        psf_max_iter=tuple(args.psf_iters for _ in families),
        deconv=_deconv_config(args, data_shape),
        fit=PsfFitConfig(),
        phase_schedule=tuple(args.phase_schedule) if args.phase_schedule else None,
        mu_schedule=tuple(args.mu_schedule) if args.mu_schedule else None,
        joint_fit=args.joint_fit,
        phase_freeze_head=1 if args.pin_z4 else 0,
        init="wiener" if args.wiener_init else "data",
        phase_prior_weight=args.phase_prior,
        bead_weight=getattr(args, "bead_weight", 1.0),
    )
    if args.recipe == "quality":
        # One flag for the measured-best recipe (BlindDeconvConfig.recommended):
        # joint fit + wiener warm start + TV annealing; pin-Z4 stays the
        # user's explicit --pin-z4 call (it assumes the true Z4 is ~0).
        kw["joint_fit"] = True
        kw["init"] = "wiener"
        kw["phase_schedule"] = None  # joint_fit excludes it
        if kw["mu_schedule"] is None and args.mu > 0:
            kw["mu_schedule"] = tuple(
                args.mu * max(1.0, 64.0 / 4.0**i) for i in range(args.loops)
            )
    return BlindDeconvConfig(**kw)


def _cmd_blind_all_channels(args):
    """blind --all-channels: every channel of an OME hyperstack gets its own
    blind solve with its own model wavelength (different emission =>
    different PSF); results re-enter as one multi-channel OME-TIFF."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from microtipi_tpu.io.ome import read_ome_hyperstack, write_ome_hyperstack
    from microtipi_tpu.jobs.blind import blind_deconvolve

    if getattr(args, "mesh", None) or args.checkpoint:
        sys.exit("--all-channels composes per-channel dispatches; drop --mesh/--checkpoint")
    arr, meta = read_ome_hyperstack(args.data)
    nt, nc = arr.shape[:2]
    t = int(args.timepoint or 0)
    if not 0 <= t < nt:
        sys.exit(f"--timepoint {t} out of range (T={nt})")
    explicit_wl = args.wavelength  # capture before _resolve_geometry defaults it
    _resolve_geometry(args, args.data, log=lambda *a: None)
    channels = meta.get("channels") or []
    objs, wls = [], []
    for c in range(nc):
        wl = explicit_wl
        if wl is None:
            em = channels[c].get("emission_wavelength") if c < len(channels) else None
            wl = em or 561e-9
        args.wavelength = wl
        model = _build_model(args, arr.shape[2:])
        cfg = _blind_config(args, arr.shape[2:])
        p0 = _load_params_json(model, args.params_json) if args.params_json else None
        run = jax.jit(lambda d, model=model, cfg=cfg, p0=p0: blind_deconvolve(
            d, model, params0=p0, config=cfg))
        t0 = time.time()
        res = run(jnp.asarray(arr[t, c]))
        df = np.asarray(res.deconv_f)
        print(f"channel {c}: wavelength {wl*1e9:.4g} nm, {args.loops} rounds in "
              f"{time.time()-t0:.1f}s, object cost {df[0]:.6g} -> {df[-1]:.6g}")
        objs.append(np.asarray(res.obj))
        wls.append(wl)
    args.wavelength = explicit_wl
    write_ome_hyperstack(
        args.out, np.stack(objs)[None], dxy=args.dxy, dz=args.dz,
        channel_names=[ch.get("name") for ch in channels[:nc]] if channels else None,
        emission_wavelengths=wls,
    )
    print("wrote", args.out, f"({nc}-channel OME hyperstack)")


def _cmd_blind_plate(args):
    """blind on a plate input without --well: every well/field gets its own
    blind solve (shared optics: one model/config per shape, a --bead anchor
    applies to all wells); results re-enter as an output plate."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from microtipi_tpu.jobs.blind import blind_deconvolve

    if getattr(args, "mesh", None) or args.checkpoint:
        sys.exit("plate fan-out composes per-image dispatches; drop "
                 "--mesh/--checkpoint (or select one --well)")
    _resolve_geometry(args, args.data, log=lambda *a: None)
    bead = None
    if args.bead:
        bead = np.asarray(_read_input_volume(args, args.bead))
        if getattr(args, "bead_n", 1) > 1:
            from microtipi_tpu.jobs.psf_fit import average_beads

            bead, used = average_beads(bead, n_beads=args.bead_n)
            print(f"averaged {used} beads for the anchor -> patch {bead.shape}")
        bead = jnp.asarray(bead)
    runs = {}

    def solve_one(vol):
        vol = jnp.asarray(vol)
        if vol.shape not in runs:
            model = _build_model(args, vol.shape)
            cfg = _blind_config(args, vol.shape)
            p0 = (_load_params_json(model, args.params_json)
                  if args.params_json else None)
            runs[vol.shape] = jax.jit(
                lambda d, w, b, model=model, cfg=cfg, p0=p0: blind_deconvolve(
                    d, model, params0=p0, weights=w, config=cfg, bead_data=b))
        res = runs[vol.shape](vol, _weights(args, vol), bead)
        df = np.asarray(res.deconv_f)
        print(f"  object cost {df[0]:.6g} -> {df[-1]:.6g}")
        return res.obj

    _plate_fan_out(args, solve_one, "blind")


def _cmd_blind_depthvar(args):
    """blind --depthvar K: the blind alternation with the shift-invariant
    forward model replaced by the depth-varying anchor blend end to end
    (jobs/depthvar.blind_deconvolve_depthvar). Composes with --params-json
    (calibrated pupil/ns start), --bead (structural anchor on every fit),
    --phase-prior, --recipe quality, and the schedules; the PSF written by
    --psf-out is the (K, Nz, Ny, Nx) anchor stack, one file per anchor."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from microtipi_tpu.jobs.depthvar import blind_deconvolve_depthvar

    if args.model != "gl":
        sys.exit("blind --depthvar requires --model gl (the anchor stack "
                 "varies the DEPTH family; calibrate ns with "
                 "fitpsf --depth-ladder or fit it with --families ... depth)")
    if args.checkpoint or getattr(args, "all_channels", False) \
            or getattr(args, "auto_mu", False):
        sys.exit("blind --depthvar runs without checkpoints for now; "
                 "drop --checkpoint/--all-channels/--auto-mu")
    if _is_plate(args.data) and not getattr(args, "well", None):
        sys.exit("blind --depthvar solves one volume; select a plate image "
                 "with --well ROW/COL (per-well depth-varying blind fan-out "
                 "is not wired; deconv PLATE --depthvar fans out non-blind)")
    data = jnp.asarray(_read_input_volume(args, args.data))
    _resolve_geometry(args, args.data)
    model = _build_model(args, data.shape)
    params0 = _load_params_json(model, args.params_json) if args.params_json else None
    w = _weights(args, data)
    cfg = _blind_config(args, data.shape)
    anchors = _depthvar_anchor_array(args, args.depthvar, data.shape[0])
    bead = None
    if args.bead:
        bead = np.asarray(_read_input_volume(args, args.bead))
        if getattr(args, "bead_n", 1) > 1:
            from microtipi_tpu.jobs.psf_fit import average_beads

            bead, used = average_beads(bead, n_beads=args.bead_n)
            print(f"averaged {used} beads for the anchor -> patch {bead.shape}")
        bead = jnp.asarray(bead)
    t0 = time.time()
    mesh = _make_mesh(args)
    if mesh is not None:
        from microtipi_tpu.parallel.deconv import crop_trailing
        from microtipi_tpu.parallel.depthvar import sharded_blind_deconvolve_depthvar

        run = jax.jit(lambda d, w, b: sharded_blind_deconvolve_depthvar(
            d, model, mesh, anchors, params0=params0, weights=w, config=cfg,
            bead_data=b))
        res = run(data, w, bead)
        if res.obj.shape != data.shape:  # mesh-odd shapes auto-pad
            res = res._replace(obj=crop_trailing(res.obj, data.shape))
    else:
        run = jax.jit(lambda d, w, b: blind_deconvolve_depthvar(
            d, model, anchors, params0=params0, weights=w, config=cfg,
            bead_data=b))
        res = run(data, w, bead)
    df = np.asarray(res.deconv_f)
    wall = time.time() - t0
    tag = f" mesh {tuple(args.mesh)}" if mesh is not None else ""
    print(f"blind[depthvar K={args.depthvar}{tag}]: {args.loops} rounds in "
          f"{wall:.1f}s (incl. compile); object cost {df[0]:.6g} -> {df[-1]:.6g}")
    print("defocus:", np.asarray(res.params.defocus))
    if model.n_phase:
        print("phase:", np.round(np.asarray(res.params.phase), 4))
    ns = float(res.params.depth[0]) * args.wavelength
    print(f"depth family: ns={ns:.4f}, z0 offset={float(res.params.depth[1]):.4g} m"
          + ("" if "depth" in args.families else " (held at the start values)"))
    _write_out(args, args.out, np.asarray(res.obj), dxy=args.dxy, dz=args.dz)
    print("wrote", args.out)
    if args.psf_out:
        import os

        root, ext = os.path.splitext(args.psf_out)
        for i in range(res.psf.shape[0]):
            path = f"{root}_a{i}{ext}"
            _write_out(args, path, np.asarray(res.psf[i]), dxy=args.dxy, dz=args.dz)
            print("wrote", path)
    if args.params_out:
        import json

        doc = {"model": args.model, "dxy": args.dxy, "dz": args.dz}
        for name in res.params._fields:
            doc[name] = np.asarray(getattr(res.params, name)).tolist()
        with open(args.params_out, "w") as fh:
            json.dump(doc, fh, indent=1)
        print("wrote", args.params_out)
    if args.report:
        import json

        with open(args.report, "w") as fh:
            json.dump({
                "rounds": args.loops, "wall_seconds": round(wall, 3),
                "anchors": np.asarray(anchors).tolist(),
                "deconv_f": np.asarray(res.deconv_f).tolist(),
                "fit_f": np.asarray(res.fit_f).tolist(),
                "deconv_iters": np.asarray(res.deconv_iters).tolist(),
                "defocus": np.asarray(res.params.defocus).tolist(),
                "phase": np.asarray(res.params.phase).tolist(),
                "modulus": np.asarray(res.params.modulus).tolist(),
                "depth": np.asarray(res.params.depth).tolist(),
            }, fh, indent=1)
        print("wrote", args.report)


def cmd_blind(args):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from microtipi_tpu.jobs.blind import blind_deconvolve

    if getattr(args, "uncertainty", 0):
        # Single-volume single-device tail only — fail fast, don't ignore.
        for flag, name in (("depthvar", "--depthvar"),
                           ("all_channels", "--all-channels"),
                           ("mesh", "--mesh")):
            if getattr(args, flag, None):
                sys.exit(f"--uncertainty does not compose with {name}; run "
                         "it on the plain single-volume blind solve")
        if _is_plate(args.data) and not getattr(args, "well", None):
            sys.exit("--uncertainty does not compose with the whole-plate "
                     "fan-out; pick one well (--well)")
    if getattr(args, "depthvar", 0):
        _cmd_blind_depthvar(args)
        return
    if getattr(args, "auto_mu", False) and (
            (_is_plate(args.data) and not getattr(args, "well", None))
            or getattr(args, "all_channels", False)):
        sys.exit("blind --auto-mu calibrates one volume; pick a --well / "
                 "single channel (or use deconv --auto-mu per file)")
    if _is_plate(args.data) and not getattr(args, "well", None):
        _cmd_blind_plate(args)
        return
    if getattr(args, "all_channels", False):
        if args.bead:
            sys.exit("--bead is not supported with --all-channels: each "
                     "channel's PSF lives at its own emission wavelength and "
                     "needs its own bead stack")
        _cmd_blind_all_channels(args)
        return
    data = jnp.asarray(_read_input_volume(args, args.data))
    _resolve_geometry(args, args.data)
    model = _build_model(args, data.shape)
    params0 = _load_params_json(model, args.params_json) if args.params_json else None
    w = _weights(args, data)
    if getattr(args, "auto_mu", False):
        # Calibrate the BASE TV weight by the discrepancy bisection against
        # the nominal (or --params-json) PSF before the loop; the quality
        # recipe's mu_schedule derives from args.mu, so annealing rescales
        # with it. An explicit --mu-schedule stays absolute.
        from microtipi_tpu.jobs.autotune import deconvolve_auto_mu

        nominal = model.init_params() if params0 is None else params0
        run0 = jax.jit(lambda d, p, wt: deconvolve_auto_mu(
            d, model.compute_psf(p), weights=wt,
            config=_deconv_config(args, data.shape),
            sigma=args.noise_sigma, tau=args.tau))
        auto = run0(data, nominal, w)
        args.mu = float(auto.mu)
        print(f"auto-mu (nominal PSF): mu={args.mu:.4g} "
              f"(discrepancy {float(auto.discrepancy):.4g} "
              f"/ target {float(auto.target):.4g})")
    cfg = _blind_config(args, data.shape)
    bead = None
    if args.bead:
        bead = np.asarray(_read_input_volume(args, args.bead))
        if getattr(args, "bead_n", 1) > 1:
            from microtipi_tpu.jobs.psf_fit import average_beads

            bead, used = average_beads(bead, n_beads=args.bead_n)
            print(f"averaged {used} beads for the anchor -> patch {bead.shape}")
        bead = jnp.asarray(bead)
    t0 = time.time()
    mesh = _make_mesh(args)
    if mesh is not None:
        if args.checkpoint:
            sys.exit("--checkpoint is not supported together with --mesh yet")
        from microtipi_tpu.parallel.blind import sharded_blind_deconvolve

        run = jax.jit(lambda d, w, b: sharded_blind_deconvolve(
            d, model, mesh, params0=params0, weights=w, config=cfg, bead_data=b))
        res = run(data, w, bead)
        df = np.asarray(res.deconv_f)
    elif args.checkpoint:
        # Host-driven rounds with atomic npz checkpoints: a preempted run
        # resumes with --resume instead of restarting (utils.checkpoint).
        import dataclasses
        import os

        from microtipi_tpu.utils.checkpoint import load_state, save_state

        # The calibration prior must stay anchored at the ORIGINAL
        # calibration (the --params-json load) across the per-round
        # dispatches and resumes, not each round's drifting params0
        # (jobs/blind.py phase_anchor note).
        anchor0 = ((params0 if params0 is not None else model.init_params()).phase
                   if args.phase_prior > 0 else None)
        x0, start = None, 0
        if args.resume and os.path.exists(args.checkpoint):
            x0, params0, start, _ = load_state(args.checkpoint)
            print(f"resumed {args.checkpoint} at round {start}")
        mid_cfg = dataclasses.replace(cfg, loops=1, skip_last_fit=False)
        last_cfg = dataclasses.replace(cfg, loops=1, skip_last_fit=True)
        run1 = jax.jit(
            lambda d, w, x0, p0, c, b, a: blind_deconvolve(
                d, model, params0=p0, x0=x0, weights=w, config=c, bead_data=b,
                phase_anchor=a,
            ),
            static_argnums=4,
        )
        res = None
        for i in range(start, args.loops):
            c = last_cfg if i == args.loops - 1 else mid_cfg
            res = run1(data, w, x0, params0, c, bead, anchor0)
            x0, params0 = res.obj, res.params
            save_state(args.checkpoint, np.asarray(res.obj), res.params, i + 1)
            print(f"round {i+1}/{args.loops}: object cost "
                  f"{float(res.deconv_f[0]):.6g} (checkpointed)")
        if res is None:
            sys.exit("nothing to do: checkpoint is already at the final round")
        df = np.asarray(res.deconv_f)[-1:]
    else:
        run = jax.jit(lambda d, w, b: blind_deconvolve(
            d, model, params0=params0, weights=w, config=cfg, bead_data=b))
        res = run(data, w, bead)
        df = np.asarray(res.deconv_f)
    wall = time.time() - t0
    print(f"blind: {args.loops} rounds in {wall:.1f}s (incl. compile); "
          f"object cost {df[0]:.6g} -> {df[-1]:.6g}")
    if args.report:
        import json

        with open(args.report, "w") as fh:
            json.dump({
                "rounds": args.loops, "wall_seconds": round(wall, 3),
                "deconv_f": np.asarray(res.deconv_f).tolist(),
                "fit_f": np.asarray(res.fit_f).tolist(),
                "deconv_iters": np.asarray(res.deconv_iters).tolist(),
                "defocus": np.asarray(res.params.defocus).tolist(),
                "phase": np.asarray(res.params.phase).tolist(),
                "modulus": np.asarray(res.params.modulus).tolist(),
            }, fh, indent=1)
        print("wrote", args.report)
    print("defocus:", np.asarray(res.params.defocus))
    if model.n_phase:
        print("phase:", np.round(np.asarray(res.params.phase), 4))
    print("modulus:", np.round(np.asarray(res.params.modulus), 4))
    _write_out(args, args.out, np.asarray(res.obj), dxy=args.dxy, dz=args.dz)
    print("wrote", args.out)
    if args.psf_out:
        _write_out(args, args.psf_out, np.asarray(res.psf), dxy=args.dxy, dz=args.dz)
        print("wrote", args.psf_out)
    if args.params_out:
        import json

        doc = {"model": args.model, "dxy": args.dxy, "dz": args.dz}
        for name in res.params._fields:
            doc[name] = np.asarray(getattr(res.params, name)).tolist()
        with open(args.params_out, "w") as fh:
            json.dump(doc, fh, indent=1)
        print("wrote", args.params_out)
    if getattr(args, "uncertainty", 0):
        # Curvature at the mu the FINAL object round used (mu_schedule
        # annealing decays to the base mu; an explicit schedule may not).
        ucfg = cfg.deconv
        if cfg.mu_schedule:
            import dataclasses

            ucfg = dataclasses.replace(ucfg, mu=float(cfg.mu_schedule[-1]))
        _emit_object_uncertainty(args, data, res.psf, res.obj, w, ucfg)


def _cmd_fitpsf_ladder(args, stacks):
    """fitpsf S1..SK --depth-ladder Z1..ZK: depth-ladder calibration of the
    Gibson-Lanni DEPTH family (jobs/depthvar.calibrate_depth) — beads at K
    known depths pin the sample index ns through the slope of the spherical
    aberration vs depth. Feeds deconv/blind --depthvar via --params-out."""
    import json

    import numpy as np
    import jax
    import jax.numpy as jnp
    from microtipi_tpu.jobs.depthvar import calibrate_depth
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig
    from microtipi_tpu.models.microscope import DEFOCUS, DEPTH, MODULUS, PHASE
    from microtipi_tpu.utils.arrays import roll

    if args.model != "gl":
        sys.exit("--depth-ladder requires --model gl (it calibrates the "
                 "DEPTH family of the Gibson-Lanni model)")
    for flag in ("empirical_out", "field_out", "retrieve_map"):
        if getattr(args, flag, None):
            sys.exit(f"--depth-ladder does not compose with --{flag.replace('_', '-')}")
    ladder_z = np.asarray(args.depth_ladder, np.float64)
    if len(stacks) != ladder_z.size:
        sys.exit(f"--depth-ladder needs one bead stack per depth: got "
                 f"{len(stacks)} stacks for {ladder_z.size} depths")
    _resolve_geometry(args, stacks[0])
    beads = []
    for path in stacks:
        b = np.asarray(_read_input_volume(args, path))
        if args.n_beads > 1:
            from microtipi_tpu.jobs.psf_fit import average_beads

            patch = tuple(args.bead_patch) if args.bead_patch else None
            b, used = average_beads(b, n_beads=args.n_beads, patch=patch)
            print(f"{path}: averaged {used} beads -> patch {b.shape}")
        beads.append(b)
    if len({b.shape for b in beads}) != 1:
        sys.exit(f"ladder bead stacks must share one shape, got "
                 f"{[b.shape for b in beads]} (use --n-beads/--bead-patch "
                 f"to crop a common patch)")
    beads = jnp.asarray(np.stack(beads))
    model = _build_model(args, tuple(beads.shape[1:]))
    params0 = _load_params_json(model, args.params_json) if args.params_json else None

    fam_map = _family_map("defocus", "phase", "modulus", "depth")
    fams = list(args.families)
    if any(f not in fam_map for f in fams):
        sys.exit("--depth-ladder fits defocus/phase/modulus/depth families")
    if "depth" not in fams:
        fams.append("depth")
        print("(DEPTH family added to --families: it is what the ladder "
              "calibrates)")
    families = tuple(fam_map[f] for f in fams)

    run = jax.jit(lambda b: calibrate_depth(
        model, b, ladder_z, families=families, params0=params0,
        config=PsfFitConfig(max_iter=args.iters, grtol=0.0),
        phase_freeze_head=1 if args.pin_z4 else 0,
    ))
    t0 = time.time()
    fit, zshifts = run(beads)
    ns = float(fit.params.depth[0]) * args.wavelength
    print(f"depth ladder ({ladder_z.size} rungs): {int(fit.iterations)} iters, "
          f"cost {float(fit.f):.6g}, {time.time()-t0:.1f}s (incl. compile)")
    print(f"ns = {ns:.4f}, z0 depth offset = {float(fit.params.depth[1]):.4g} m")
    print("per-rung axial origins (voxels):",
          np.round(np.asarray(zshifts), 3))
    params = {name: np.asarray(getattr(fit.params, name)).tolist()
              for name in fit.params._fields}
    std = None
    if args.uncertainty:
        from microtipi_tpu.jobs.depthvar import ladder_fit_uncertainty

        unc = jax.jit(lambda b, p, z: ladder_fit_uncertainty(
            model, p, families, b, ladder_z, z))(beads, fit.params, zshifts)
        std = {k: (np.asarray(v).tolist() if np.ndim(v) else float(v))
               for k, v in unc.std.items()}
        dns = float(np.asarray(unc.std["depth"])[0]) * args.wavelength
        print(f"ns 1-sigma: +- {dns:.4g} (GN/Laplace at the ladder fit; "
              f"noise sigma {float(unc.sigma):.4g})")
    for name, vals in params.items():
        line = f"{name}: {np.round(np.asarray(vals), 5)}"
        if std is not None and name in std:
            line += f"  +- {np.round(np.asarray(std[name]), 5)}"
        print(line)
    if args.params_out:
        out = {"cost": float(fit.f), "model": args.model,
               "dxy": args.dxy, "dz": args.dz, "ns_fit": ns,
               "ladder_z": ladder_z.tolist(),
               "zshifts": np.asarray(zshifts).tolist(), **params}
        if std is not None:
            out["std"] = std
            out["ns_std"] = float(np.asarray(std["depth"])[0]) * args.wavelength
        with open(args.params_out, "w") as fh:
            json.dump(out, fh, indent=1)
        print("wrote", args.params_out)
    if args.out:
        h = jax.jit(model.compute_psf)(fit.params)
        if args.centered:
            h = roll(h)
        _write_out(args, args.out, np.asarray(h), dxy=args.dxy, dz=args.dz)
        print(f"wrote {args.out} (fitted PSF at the calibration origin)")


def _cmd_fitpsf_diversity(args, stacks):
    """fitpsf S1..SD --diversity-dz DZ1..DZD: phase-diversity calibration
    from D acquisitions of one unknown EXTENDED scene at known diversity
    phases (jobs/diversity.fit_psf_diversity) — the no-bead identifiability
    lever (the object is profiled out in closed form)."""
    import json

    import numpy as np
    import jax
    import jax.numpy as jnp
    from microtipi_tpu.jobs.diversity import (
        defocus_diversity, diversity_object_estimate, fit_psf_diversity,
        zernike_diversity)
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig
    from microtipi_tpu.models.microscope import DEFOCUS, MODULUS, PHASE
    from microtipi_tpu.utils.arrays import roll

    if args.model != "widefield":
        sys.exit("--diversity-* needs the scalar pupil synthesis "
                 "(--model widefield)")
    for flag in ("empirical_out", "field_out", "retrieve_map", "depth_ladder"):
        if getattr(args, flag, None):
            sys.exit(f"--diversity-* does not compose with "
                     f"--{flag.replace('_', '-')}")
    if args.diversity_dz is not None and args.diversity_astig is not None:
        sys.exit("pick one of --diversity-dz / --diversity-astig")
    divs = (args.diversity_dz if args.diversity_dz is not None
            else args.diversity_astig)
    if len(stacks) != len(divs):
        sys.exit(f"--diversity needs one stack per diversity value: got "
                 f"{len(stacks)} stacks for {len(divs)} values")
    if len(stacks) < 2:
        sys.exit("phase diversity needs >= 2 acquisitions (a single image "
                 "is the non-identifiable blind case — BASELINE.md)")
    # read BEFORE resolving geometry: _read_input_volume autofills
    # wavelength/dxy/dz from OME metadata only while they are still None
    vols = [np.asarray(_read_input_volume(args, p)) for p in stacks]
    _resolve_geometry(args, stacks[0])
    if len({v.shape for v in vols}) != 1:
        sys.exit(f"diversity stacks must share one shape, got "
                 f"{[v.shape for v in vols]}")
    data = jnp.asarray(np.stack(vols))
    model = _build_model(args, tuple(data.shape[1:]))
    if args.diversity_astig is not None:
        if args.radial:
            sys.exit("--diversity-astig needs the full basis (drop --radial:"
                     " a radial pupil cannot express astigmatism)")
        coeffs = np.zeros((len(divs), 2))
        coeffs[:, 1] = divs  # full-basis phase mode 1 = Z5 astigmatism
        phases = zernike_diversity(model, coeffs)
    else:
        phases = defocus_diversity(model, divs)

    fam_map = _family_map("defocus", "phase", "modulus")
    if any(f not in fam_map for f in args.families):
        sys.exit("--diversity-* fits the defocus/phase/modulus families")
    families = tuple(fam_map[f] for f in args.families)
    params0 = _load_params_json(model, args.params_json) if args.params_json else None

    run = jax.jit(lambda d: fit_psf_diversity(
        model, d, phases, families=families, params0=params0,
        gamma=args.diversity_gamma,
        config=PsfFitConfig(max_iter=args.iters, grtol=0.0),
        phase_freeze_head=1 if args.pin_z4 else None,  # None = auto (3D pins Z4)
    ))
    t0 = time.time()
    res = run(data)
    print(f"diversity fit ({len(divs)} channels): {int(res.iterations)} "
          f"iters, metric {float(res.f):.6g}, {time.time()-t0:.1f}s "
          f"(incl. compile)")
    params = {name: np.asarray(getattr(res.params, name)).tolist()
              for name in res.params._fields}
    std = None
    if args.uncertainty:
        from microtipi_tpu.jobs.diversity import diversity_fit_uncertainty

        unc = jax.jit(lambda d, p: diversity_fit_uncertainty(
            model, p, families, d, phases, gamma=args.diversity_gamma,
            phase_freeze_head=1 if args.pin_z4 else None,  # match the fit
        ))(data, res.params)
        std = {k: np.asarray(v).tolist() for k, v in unc.std.items()}
        print(f"noise sigma (profiled-residual MLE): {float(unc.sigma):.4g}"
              f" (in-basin error bars; NaN = held-fixed gauge mode; "
              f"BASELINE.md caveat)")
    for name, vals in params.items():
        line = f"{name}: {np.round(np.asarray(vals), 5)}"
        if std is not None and name in std:
            line += f"  +- {np.round(np.asarray(std[name]), 5)}"
        print(line)
    if args.params_out:
        out = {"cost": float(res.f), "model": args.model,
               "dxy": args.dxy, "dz": args.dz,
               "diversity": list(divs),
               "diversity_kind": ("astig" if args.diversity_astig is not None
                                  else "defocus"), **params}
        if std is not None:
            out["std"] = std
        with open(args.params_out, "w") as fh:
            json.dump(out, fh, indent=1)
        print("wrote", args.params_out)
    if args.object_out:
        xhat = np.asarray(jax.jit(lambda d, p: diversity_object_estimate(
            model, p, d, phases, gamma=args.diversity_gamma))(data, res.params))
        _write_out(args, args.object_out, xhat, dxy=args.dxy, dz=args.dz)
        print(f"wrote {args.object_out} (profiled multi-frame Wiener object;"
              f" use deconv --params-json for a regularized solve)")
    if args.out:
        psf = np.asarray(jax.jit(model.compute_psf)(res.params))
        if args.centered:
            psf = np.asarray(roll(jnp.asarray(psf)))
        _write_out(args, args.out, psf, dxy=args.dxy, dz=args.dz)
        print("wrote", args.out)


def cmd_fitpsf(args):
    import json

    import numpy as np
    import jax
    import jax.numpy as jnp
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig, fit_psf_beads
    from microtipi_tpu.models.microscope import (
        CAVITY, DEFOCUS, DEPTH, MODULUS, PHASE, SHEET, STED)
    from microtipi_tpu.utils.arrays import roll

    stacks = args.stack if isinstance(args.stack, list) else [args.stack]
    if getattr(args, "depth_ladder", None):
        _cmd_fitpsf_ladder(args, stacks)
        return
    if (getattr(args, "diversity_dz", None) is not None
            or getattr(args, "diversity_astig", None) is not None):
        _cmd_fitpsf_diversity(args, stacks)
        return
    if len(stacks) > 1:
        sys.exit("several bead stacks only make sense with --depth-ladder "
                 "Z1..ZK or --diversity-dz DZ1..DZD (one stack per known "
                 "depth / diversity)")
    args.stack = stacks[0]
    data = jnp.asarray(_read_input_volume(args, args.stack))
    _resolve_geometry(args, args.stack)
    if args.empirical_out:
        # Model-free path: distill the measurement itself into a PSF
        # (center + clamp + unit-sum; see jobs.psf_fit.empirical_psf for
        # the measured recipe incl. why tails must NOT be thresholded).
        from microtipi_tpu.jobs.psf_fit import empirical_psf
        from microtipi_tpu.utils.arrays import roll as _roll

        patch = tuple(args.bead_patch) if args.bead_patch else None
        if args.n_beads > 1:
            # averaging is host-side detection/registration; the centering
            # tail must still be jitted (eager dispatch remote-compiles
            # per op on the axon runtime — CLAUDE.md platform rules)
            from microtipi_tpu.jobs.psf_fit import average_beads

            avg, used = average_beads(np.asarray(data), n_beads=args.n_beads,
                                      patch=patch)
            print(f"averaged {used} beads -> patch {avg.shape}")
            data = jnp.asarray(avg)
        h = np.asarray(jax.jit(empirical_psf)(data))
        if args.centered:
            h = np.asarray(_roll(jnp.asarray(h)))
        _write_out(args, args.empirical_out, h, dxy=args.dxy, dz=args.dz)
        print(f"wrote {args.empirical_out} (empirical PSF, "
              f"{'centered' if args.centered else 'corner-origin'}, unit sum)")
        return
    fam_map = _family_map()
    if "depth" in args.families and args.model != "gl":
        sys.exit("--families depth requires --model gl")
    if "sheet" in args.families and args.model != "lightsheet":
        sys.exit("--families sheet requires --model lightsheet")
    if "sted" in args.families and args.model != "sted":
        sys.exit("--families sted requires --model sted")
    if "cavity" in args.families and args.model != "4pi":
        sys.exit("--families cavity requires --model 4pi")
    families = tuple(fam_map[f] for f in args.families)

    if args.field_out:
        # Field-varying calibration: one fit per detected bead -> anchors
        # JSON for deconv --field-json (jobs.psf_fit.calibrate_field).
        from microtipi_tpu.jobs.psf_fit import calibrate_field

        patch = tuple(args.bead_patch) if args.bead_patch else \
            (int(data.shape[0]), 32, 32)
        model = _build_model(args, patch)
        anchors, fits = calibrate_field(
            model, np.asarray(data), families=families, n_beads=args.n_beads,
            config=PsfFitConfig(max_iter=args.iters, grtol=0.0),
            phase_freeze_head=1 if args.pin_z4 else 0,
        )
        entries = []
        for ((y, x), params), res in zip(anchors, fits):
            entry = {"position": [y, x], "cost": float(res.f)}
            entry.update({name: np.asarray(getattr(params, name)).tolist()
                          for name in params._fields})
            entries.append(entry)
            print(f"bead @ (y={y:.0f}, x={x:.0f}): cost {float(res.f):.4g}, "
                  f"{int(res.iterations)} iters")
        with open(args.field_out, "w") as fh:
            json.dump({"model": args.model, "dxy": args.dxy, "dz": args.dz,
                       "patch": list(patch), "anchors": entries}, fh, indent=1)
        print(f"wrote {args.field_out} ({len(entries)} anchors)")
        return

    if args.n_beads > 1:
        from microtipi_tpu.jobs.psf_fit import average_beads

        patch = tuple(args.bead_patch) if args.bead_patch else None
        avg, used = average_beads(np.asarray(data), n_beads=args.n_beads, patch=patch)
        print(f"averaged {used} beads -> patch {avg.shape} (~{used**0.5:.1f}x SNR)")
        data = jnp.asarray(avg)
    model = _build_model(args, data.shape)

    run = jax.jit(
        lambda d: fit_psf_beads(
            model, d, families,
            config=PsfFitConfig(max_iter=args.iters, grtol=0.0),
            phase_freeze_head=1 if args.pin_z4 else 0,
        )
    )
    t0 = time.time()
    res, amp = run(data)
    f = float(res.f)
    print(f"fitpsf: {int(res.iterations)} iters, cost {f:.6g}, bead amplitude "
          f"{float(amp):.4g}, {time.time()-t0:.1f}s (incl. compile)")
    params = {
        name: np.asarray(getattr(res.params, name)).tolist()
        for name in res.params._fields
    }
    std = None
    if args.uncertainty:
        from microtipi_tpu.jobs.psf_fit import bead_fit_uncertainty

        unc = jax.jit(
            lambda d, p: bead_fit_uncertainty(model, p, families, d)
        )(data, res.params)
        std = {k: (np.asarray(v).tolist() if np.ndim(v) else float(v))
               for k, v in unc.std.items()}
        print(f"noise sigma (residual MLE): {float(unc.sigma):.4g}")
    for name, vals in params.items():
        line = f"{name}: {np.round(np.asarray(vals), 5)}"
        if std is not None and name in std:
            line += f"  +- {np.round(np.asarray(std[name]), 5)}"
        print(line)
    if args.params_out:
        out = {"cost": f, "amplitude": float(amp), "model": args.model,
               "dxy": args.dxy, "dz": args.dz, **params}
        if std is not None:
            out["std"] = std
        with open(args.params_out, "w") as fh:
            json.dump(out, fh, indent=1)
        print("wrote", args.params_out)
    psf_out = None
    if args.retrieve_map and args.model != "widefield":
        sys.exit("--retrieve-map needs the scalar pupil synthesis "
                 "(--model widefield)")
    if args.retrieve_map:
        # Nonparametric pupil retrieval on top of the parametric fit
        # (jobs/phase_retrieval.py): GS + VMLMB over pixelwise maps,
        # warm-started/anchored at the fitted parameters.
        from microtipi_tpu.jobs.phase_retrieval import (
            project_phase, retrieve_pupil)

        t0 = time.time()
        ret = jax.jit(lambda d: retrieve_pupil(
            model, d, params0=res.params, fit_modulus=args.retrieve_modulus,
            config=PsfFitConfig(max_iter=args.iters * 3, grtol=0.0),
        ))(data)
        coefs = np.asarray(jax.jit(lambda p, m: project_phase(
            model, p, m))(ret.phi, ret.mask))
        from microtipi_tpu.ops.metrics import strehl_ratio_from_pupil

        s = float(jax.jit(lambda p, r: strehl_ratio_from_pupil(
            model, p, rho=r))(ret.phi, ret.rho))
        print(f"retrieve-map: cost {float(ret.f):.6g}, "
              f"{int(ret.iterations)} iters, {time.time()-t0:.1f}s; "
              f"Strehl {s:.3f}; Zernike projection {np.round(coefs, 4)}")
        save = {"phi": np.asarray(ret.phi), "mask": np.asarray(ret.mask),
                "zernike_projection": coefs,
                "defocus": np.asarray(res.params.defocus),
                "dxy": args.dxy, "dz": args.dz}
        if ret.rho is not None:
            save["rho"] = np.asarray(ret.rho)
        np.savez(args.retrieve_map, **save)
        print("wrote", args.retrieve_map)
        psf_out = np.asarray(ret.psf)
    if args.out:
        psf = psf_out if psf_out is not None else \
            np.asarray(jax.jit(model.compute_psf)(res.params))
        if args.centered:
            psf = np.asarray(roll(jnp.asarray(psf)))
        _write_out(args, args.out, psf, dxy=args.dxy, dz=args.dz)
        print("wrote", args.out)


def cmd_simulate(args):
    """Synthesize a realistic acquisition: phantom -> PSF blur -> camera noise."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
    from microtipi_tpu.utils import phantoms

    shape = tuple(args.shape)
    _resolve_geometry(args)
    gen = {
        "beads": lambda: phantoms.beads_phantom(shape, n=args.n, seed=args.seed),
        "filaments": lambda: phantoms.filaments_phantom(shape, n=args.n, seed=args.seed),
        "shells": lambda: phantoms.shells_phantom(shape, n=args.n, seed=args.seed),
    }[args.phantom]
    obj = gen()
    model = _build_model(args, shape)
    params = model.init_params()
    if args.params_json:
        params = _load_params_json(model, args.params_json)
    if args.phase:
        params = params._replace(phase=jnp.asarray(args.phase, model.dtype))

    dv = getattr(args, "depthvar", 0)
    if dv:
        if args.model != "gl":
            sys.exit("simulate --depthvar requires --model gl")
        from microtipi_tpu.jobs.depthvar import depth_anchor_psfs
        from microtipi_tpu.ops.depthconv import depth_varying_convolve, depth_weights

        anchors = _depthvar_anchor_array(args, dv, shape[0])
        zw = depth_weights(shape[0], anchors)

        @jax.jit
        def blur(o, p):
            psfs = depth_anchor_psfs(model, p, anchors, depth0=p.depth[1])
            return depth_varying_convolve(
                o, jnp.fft.rfftn(psfs, axes=(1, 2, 3)),
                jnp.asarray(zw, model.dtype), shape)
    else:

        @jax.jit
        def blur(o, p):
            return convolve(o, convolve_spectrum(model.compute_psf(p)), shape)

    clean = np.asarray(blur(jnp.asarray(obj), params))
    noisy = phantoms.apply_camera(
        clean, photons_at_max=args.photons, gain=args.gain_sim,
        readout_sigma=args.readout_sim, offset=args.offset, seed=args.seed)
    _write_out(args, args.out, noisy, dxy=args.dxy, dz=args.dz)
    print(f"wrote {args.out} ({args.phantom}, {shape}, ~{args.photons:.3g} "
          f"photons at peak; deconvolve with --gain {args.gain_sim} "
          f"--readout {args.readout_sim**2:.3g})")
    if args.truth:
        _write_out(args, args.truth, obj, dxy=args.dxy, dz=args.dz)
        print("wrote", args.truth)
    if args.psf_out:
        psf = np.asarray(jax.jit(model.compute_psf)(params))
        _write_out(args, args.psf_out, psf, dxy=args.dxy, dz=args.dz)
        print("wrote", args.psf_out)


def cmd_register(args):
    """Align volumes by subvoxel phase correlation + exact Fourier shift.

    Two modes: ``register ref.tif mov.tif --out aligned.tif`` writes the
    moving volume aligned to the reference (optionally blur-matched with
    ``--psf-ref/--psf-mov`` when the two were imaged through different
    optics — ops/register.py docstring); ``register stack.ome.tif
    --align-channels --out aligned.ome.tif`` registers every channel of a
    hyperstack to ``--to-channel`` (chromatic-shift correction), writing
    the full corrected hyperstack.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp
    from microtipi_tpu.ops.register import fourier_shift, register_translation

    if args.align_channels:
        from microtipi_tpu.io.ome import read_ome_hyperstack, write_ome_hyperstack

        arr, meta = read_ome_hyperstack(args.ref)
        nt, nc = arr.shape[:2]
        if nc < 2:
            sys.exit(f"--align-channels: input has C={nc}")
        if not 0 <= args.to_channel < nc:
            sys.exit(f"--to-channel {args.to_channel} out of range (C={nc})")
        reg = jax.jit(lambda a, b: fourier_shift(b, register_translation(a, b)))
        out = np.array(arr)
        for c in range(nc):
            if c == args.to_channel:
                continue
            # one chromatic shift per channel, measured at timepoint 0 and
            # applied to every timepoint (the offset is an optics property)
            t_ref = jnp.asarray(arr[0, args.to_channel])
            shift = register_translation(t_ref, jnp.asarray(arr[0, c]))
            print(f"channel {c} -> {args.to_channel}: shift "
                  f"{np.round(np.asarray(shift), 3)} voxels")
            sh = jax.jit(fourier_shift)
            for t in range(nt):
                out[t, c] = np.asarray(sh(jnp.asarray(arr[t, c]), shift))
        write_ome_hyperstack(args.out, out, dxy=meta.get("dxy"), dz=meta.get("dz"))
        print("wrote", args.out)
        return

    if not args.mov:
        sys.exit("two-volume mode needs REF MOV (or use --align-channels)")
    a = jnp.asarray(_read_input_volume(args, args.ref))
    b = jnp.asarray(_read_input_volume(args, args.mov))
    if a.shape != b.shape:
        sys.exit(f"volume shapes differ: {tuple(a.shape)} vs {tuple(b.shape)}")
    _resolve_geometry(args, args.ref, log=lambda *a: None)
    if args.psf_ref or args.psf_mov:
        from microtipi_tpu.io.tiffstack import read_stack
        from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

        if not (args.psf_ref and args.psf_mov):
            sys.exit("--psf-ref and --psf-mov go together (blur matching)")
        ha = jnp.asarray(read_stack(args.psf_ref))
        hb = jnp.asarray(read_stack(args.psf_mov))

        @jax.jit
        def estimate(a, b):
            am = convolve(a, convolve_spectrum(hb), a.shape)
            bm = convolve(b, convolve_spectrum(ha), b.shape)
            return register_translation(am, bm)

        shift = estimate(a, b)
    else:
        shift = register_translation(a, b)
    print(f"shift: {np.round(np.asarray(shift), 3)} voxels")
    aligned = np.asarray(jax.jit(fourier_shift)(b, shift))
    _write_out(args, args.out, aligned, dxy=args.dxy, dz=args.dz)
    print("wrote", args.out)


def cmd_deskew(args):
    """Deskew a stage-scanned light-sheet stack onto an orthogonal grid."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from microtipi_tpu.ops.geometry import deskew, deskew_geometry

    data = jnp.asarray(_read_input_volume(args, args.stack))
    _resolve_geometry(args, args.stack)
    run = jax.jit(lambda v: deskew(v, args.angle, args.dz, args.dxy,
                                   invert=args.invert)[0])
    t0 = time.time()
    out = np.asarray(run(data))
    _, _, dz_new = deskew_geometry(data.shape, args.angle, args.dz, args.dxy)
    print(f"deskew: {tuple(data.shape)} -> {out.shape}, angle {args.angle} deg, "
          f"dz {args.dz*1e9:.4g} -> {dz_new*1e9:.4g} nm, "
          f"{time.time()-t0:.1f}s (incl. compile)")
    _write_out(args, args.out, out, dxy=args.dxy, dz=dz_new)
    print("wrote", args.out)


def cmd_fsc(args):
    """Fourier Shell Correlation resolution of two registered volumes."""
    import json

    import numpy as np
    import jax
    import jax.numpy as jnp
    from microtipi_tpu.ops.metrics import fourier_shell_correlation, fsc_resolution

    if args.split:
        from microtipi_tpu.ops.metrics import checkerboard_split

        if args.b is not None:
            sys.exit("--split is single-volume mode; drop the second input")
        _resolve_geometry(args, args.a)
        a, b = checkerboard_split(jnp.asarray(_read_input_volume(args, args.a)))
        args.dxy *= 2  # decimated lateral pitch
        print("single-image FSC (checkerboard split): resolution bounded at "
              f"{4 * args.dxy / 2 * 1e9:.0f} nm (2x-decimated Nyquist); "
              "prefer two acquisitions when the answer is near that bound")
    else:
        if args.b is None:
            sys.exit("fsc needs two volumes (or one with --split)")
        a = jnp.asarray(_read_input_volume(args, args.a))
        b = jnp.asarray(_read_input_volume(args, args.b))
        if a.shape != b.shape:
            sys.exit(f"volume shapes differ: {tuple(a.shape)} vs {tuple(b.shape)}")
        _resolve_geometry(args, args.a)
    if args.register:
        from microtipi_tpu.ops.register import fourier_shift, register_translation

        t = register_translation(a, b)
        b = jax.jit(fourier_shift)(b, t)
        print(f"registered shift: {np.round(np.asarray(t), 3)}")
    spacing = (args.dz, args.dxy, args.dxy)
    freqs, fsc = jax.jit(
        lambda a, b: fourier_shell_correlation(a, b, spacing=spacing)
    )(a, b)
    res = fsc_resolution(freqs, fsc, threshold=args.threshold)
    crossed = bool((np.asarray(fsc)[1:] < args.threshold).any())
    print(f"FSC resolution: {res*1e9:.1f} nm "
          f"(threshold {args.threshold}"
          f"{'' if crossed else '; never crossed - sampling-limited'})")
    if args.report:
        with open(args.report, "w") as fh:
            json.dump({
                "resolution_m": float(res),
                "threshold": args.threshold,
                "sampling_limited": not crossed,
                "freqs_per_m": np.asarray(freqs).tolist(),
                "fsc": np.asarray(fsc).tolist(),
            }, fh, indent=1)
        print("wrote", args.report)


def cmd_fuse(args):
    """Multi-view RL fusion: K registered views, K PSFs, one estimate."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from microtipi_tpu.jobs.richardson_lucy import multiview_richardson_lucy
    from microtipi_tpu.io.tiffstack import read_stack
    from microtipi_tpu.utils.arrays import unroll

    if len(args.views) != len(args.psf):
        sys.exit(f"{len(args.views)} views but {len(args.psf)} PSFs — need one PSF per view")
    views = jnp.stack([jnp.asarray(read_stack(p)) for p in args.views])
    psfs = jnp.stack([jnp.asarray(read_stack(p)) for p in args.psf])
    if args.psf_centered:
        psfs = jax.vmap(unroll)(psfs)
    if psfs.shape != views.shape:
        sys.exit(f"view stack {views.shape[1:]} vs PSF stack {psfs.shape[1:]} shape mismatch")
    if args.register and len(args.views) > 1:
        from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
        from microtipi_tpu.ops.register import fourier_shift, register_translation

        @jax.jit
        def reg_one(v0, p0, v, p):
            # Blur-match so phase correlation sees one transfer function
            # (ops/register.py docstring).
            a = convolve(v0, convolve_spectrum(p), v0.shape)
            b = convolve(v, convolve_spectrum(p0), v0.shape)
            t = register_translation(a, b)
            return t, jnp.maximum(fourier_shift(v, t), 0.0)

        regd = [views[0]]
        for k in range(1, views.shape[0]):
            t, vk = reg_one(views[0], psfs[0], views[k], psfs[k])
            print(f"view {k}: shift {np.round(np.asarray(t), 2).tolist()} voxels")
            regd.append(vk)
        views = jnp.stack(regd)
    bp = {"matched": "matched", "wb": "wiener-butterworth"}[args.rl_backprojector]
    run = jax.jit(lambda v, p: multiview_richardson_lucy(
        v, p, iterations=args.iters, background=args.background,
        backprojector=bp))
    t0 = time.time()
    x = run(views, psfs)
    x.block_until_ready()
    print(f"fuse: {len(args.views)} views, {args.iters} RL iterations, "
          f"{time.time()-t0:.1f}s (incl. compile)")
    _write_out(args, args.out, np.asarray(x), dxy=getattr(args, "dxy", None), dz=getattr(args, "dz", None))
    print("wrote", args.out)


def cmd_ism(args):
    """ISM / Airyscan reconstruction: pixel reassignment or joint MLE over
    the detector-array element images (models/ism.py, jobs/ism.py)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from microtipi_tpu.jobs.ism import ism_reassign, ism_richardson_lucy
    from microtipi_tpu.models.ism import ISMConfig
    from microtipi_tpu.utils.arrays import roll

    if args.model != "widefield":
        sys.exit("ism builds its own detector-array model from the scalar "
                 "pupil; --model is not supported here")
    k = 1 + 3 * args.rings * (args.rings + 1)
    if len(args.data) == 1:
        vol = np.asarray(_read_input_volume(args, args.data[0]))
        if vol.shape[0] % k:
            sys.exit(f"{args.data[0]}: {vol.shape[0]} planes does not split "
                     f"into {k} element volumes (--rings {args.rings}); "
                     "planes must be element-major (element 0's z stack "
                     "first, center-out hex order)")
        data = vol.reshape(k, vol.shape[0] // k, *vol.shape[1:])
    else:
        if len(args.data) != k:
            sys.exit(f"need 1 interleaved stack or {k} element stacks "
                     f"(--rings {args.rings}), got {len(args.data)}")
        vols = [np.asarray(_read_input_volume(args, p)) for p in args.data]
        if len({v.shape for v in vols}) != 1:
            sys.exit(f"element stacks must share one shape, got "
                     f"{[v.shape for v in vols]}")
        data = np.stack(vols)
    _resolve_geometry(args, args.data[0])  # after reads: metadata autofill
    # --element-radius is the ISM name; fall back to _model_args' --pinhole
    # (same physical quantity) instead of silently discarding it
    element_r = args.element_radius if args.element_radius else args.pinhole
    model = ISMConfig(
        shape=tuple(data.shape[1:]), na=args.na, wavelength=args.wavelength,
        wavelength_exc=args.wavelength_exc, ni=args.ni, dxy=args.dxy,
        dz=args.dz, n_phase=args.n_phase, n_modulus=args.n_modulus,
        radial=args.radial, element_pitch=args.pitch, rings=args.rings,
        pinhole=element_r, reassign_factor=args.reassign_factor,
    )
    params = (_load_params_json(model, args.params_json)
              if args.params_json else model.init_params())
    data = jnp.asarray(data, model.dtype)
    gains = None
    if args.auto_gains:
        from microtipi_tpu.jobs.ism import ism_element_gains

        gains = jax.jit(lambda d, p: ism_element_gains(
            model, p, d, background=args.background))(data, params)
        print("element gains (relative, mean 1):",
              np.round(np.asarray(gains), 4).tolist())
    t0 = time.time()
    if args.method == "reassign":
        x = jax.jit(lambda d, g: ism_reassign(model, d, gains=g))(data, gains)
        what = f"pixel reassignment (s={model.reassign_factor})"
    else:
        bp = {"matched": "matched", "wb": "wiener-butterworth"}[args.rl_backprojector]
        x = jax.jit(lambda d, p, g: ism_richardson_lucy(
            model, p, d, iterations=args.iters, background=args.background,
            backprojector=bp, gains=g))(data, params, gains)
        what = f"joint MLE over {k} elements, {args.iters} RL iterations"
    x = np.asarray(x)
    print(f"ism: {what}, {time.time()-t0:.1f}s (incl. compile)")
    _write_out(args, args.out, x, dxy=args.dxy, dz=args.dz)
    print("wrote", args.out)
    if args.psf_out:
        h = np.asarray(jax.jit(model.compute_psf)(params))
        if args.centered:
            h = np.asarray(roll(jnp.asarray(h)))
        _write_out(args, args.psf_out, h, dxy=args.dxy, dz=args.dz)
        print(f"wrote {args.psf_out} (reassigned-sum ISM PSF — feed to "
              f"deconv --psf for Airyscan-style joint deconvolution)")


def _cmd_sim3d(args, vol, a_n, p_n):
    """3-beam 3D-SIM reconstruction (jobs/sim.py::reconstruct_sim3d):
    five-order band separation per angle, axial +-1 bands inside the
    order OTFs, generalized Wiener on the extended 3D grid."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from microtipi_tpu.jobs.sim import reconstruct_sim3d

    if p_n < 5:
        sys.exit("3D-SIM needs --phase-count >= 5 (five illumination orders)")
    if getattr(args, "refine", False):
        sys.exit("--refine is 2D-only for now; pass calibrated "
                 "--pattern-period/--pattern-phase0 for 3D-SIM")
    if vol.shape[0] % (a_n * p_n):
        sys.exit(f"{args.data}: {vol.shape[0]} planes not divisible by "
                 f"angles*phases = {a_n * p_n} (angle-major, phase-minor, "
                 "z-innermost order expected)")
    nz = vol.shape[0] // (a_n * p_n)
    ny, nx = vol.shape[1:]
    data = jnp.asarray(vol.reshape(a_n, p_n, nz, ny, nx), jnp.float64)

    from microtipi_tpu.io.tiffstack import read_stack

    if args.psf:
        h = np.asarray(read_stack(args.psf), np.float64)
        if h.shape != (nz, ny, nx):
            sys.exit(f"--psf must be the 3D detection PSF {(nz, ny, nx)}, "
                     f"got {h.shape}")
        if args.psf_centered:
            h = np.fft.ifftshift(h)
    else:
        model = _build_model(args, (nz, ny, nx))
        h = np.asarray(jax.jit(model.compute_psf)(model.init_params()))
    h = jnp.asarray(h / h.sum())

    if len(args.pattern_angle_deg) != a_n:
        sys.exit(f"--pattern-angle-deg needs {a_n} angles")
    k_mag = args.dxy / args.pattern_period
    a_k = np.stack([[k_mag * np.sin(np.deg2rad(t)),
                     k_mag * np.cos(np.deg2rad(t))]
                    for t in args.pattern_angle_deg])
    ph = np.tile(2 * np.pi / p_n * np.arange(p_n), (a_n, 1))
    if args.pattern_phase0:
        if len(args.pattern_phase0) != a_n:
            sys.exit(f"--pattern-phase0 needs {a_n} offsets")
        ph = ph + np.asarray(args.pattern_phase0)[:, None]
    q = args.dz / args.axial_period  # cycles per z-plane

    t0 = time.time()
    up_z = not args.no_axial_upsample
    rec = jax.jit(lambda d, hh: reconstruct_sim3d(
        d, hh, a_k, ph, q=q, psi=args.axial_phase, m1=args.m1, m2=args.m2,
        wiener=args.wiener, upsample_z=up_z).x)(data, h)
    out = np.asarray(rec)
    print(f"sim[3d]: {a_n} angles x {p_n} phases x {nz} planes -> "
          f"{out.shape[0]}x{out.shape[1]}x{out.shape[2]} "
          f"(q = {q:.3f} cyc/plane), {time.time()-t0:.1f}s (incl. compile)")
    _write_out(args, args.out, out, dxy=args.dxy / 2,
               dz=args.dz / 2 if up_z else args.dz)
    print("wrote", args.out)


def cmd_sim(args):
    """Structured-illumination reconstruction (jobs/sim.py): band
    separation + generalized-Wiener recombination on a 2x grid, with
    optional data-driven pattern self-calibration."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from microtipi_tpu.jobs.sim import estimate_sim_pattern, reconstruct_sim

    vol = np.asarray(_read_input_volume(args, args.data))
    _resolve_geometry(args, args.data)
    a_n, p_n = args.angles, args.phase_count
    if getattr(args, "axial_period", None) is not None:
        _cmd_sim3d(args, vol, a_n, p_n)
        return
    if vol.shape[0] != a_n * p_n:
        sys.exit(f"{args.data}: {vol.shape[0]} planes != angles*phases = "
                 f"{a_n * p_n} (angle-major plane order expected)")
    data = jnp.asarray(vol.reshape(a_n, p_n, *vol.shape[1:]), jnp.float64)

    # 2D PSF/OTF: supplied file or the pupil model at Nz=1
    from microtipi_tpu.io.tiffstack import read_stack

    if args.psf:
        h = np.asarray(read_stack(args.psf), np.float64)
        h = h[0] if h.ndim == 3 else h
        if args.psf_centered:
            h = np.fft.ifftshift(h)
    else:
        model = _build_model(args, (1,) + vol.shape[1:])
        h = np.asarray(jax.jit(model.compute_psf)(model.init_params()))[0]
    h = h / h.sum()
    otf_np = np.fft.fft2(h.astype(np.complex128))
    otf = jnp.asarray(otf_np)

    # pattern geometry: period [m] + angles [deg] -> cycles/pixel
    if len(args.pattern_angle_deg) != a_n:
        sys.exit(f"--pattern-angle-deg needs {a_n} angles")
    if args.pattern_phase0 is not None and len(args.pattern_phase0) != a_n:
        sys.exit(f"--pattern-phase0 needs {a_n} offsets (one per angle)")
    k_mag = args.dxy / args.pattern_period
    a_k = np.stack([[k_mag * np.sin(np.deg2rad(t)),
                     k_mag * np.cos(np.deg2rad(t))]
                    for t in args.pattern_angle_deg])
    ph = np.tile(2 * np.pi / p_n * np.arange(p_n), (a_n, 1))
    if args.pattern_phase0:
        ph = ph + np.asarray(args.pattern_phase0)[:, None]

    if args.refine:
        # host-NumPy estimator by design (hundreds of small eager FFTs
        # and complex scalar reads — both forbidden on the axon TPU)
        t0 = time.time()
        a_k, ph = estimate_sim_pattern(vol.reshape(a_n, p_n, *vol.shape[1:]),
                                       otf_np, a_k, ph,
                                       modulation=args.modulation)
        print(f"pattern self-calibration ({time.time()-t0:.1f}s):")
        for a in range(a_n):
            period = args.dxy / float(np.hypot(*a_k[a]))
            print(f"  angle {a}: period {period*1e9:.2f} nm, "
                  f"phase0 {ph[a, 0]:+.3f} rad")
    t0 = time.time()
    # otf is a jit ARGUMENT: a complex closure constant would be
    # constant-folded through a device->host transfer at trace time —
    # UNIMPLEMENTED and process-poisoning on the axon TPU (CLAUDE.md)
    rec = jax.jit(lambda d, o: reconstruct_sim(
        d, o, a_k, ph, modulation=args.modulation,
        wiener=args.wiener).x)(data, otf)
    print(f"sim: {a_n} angles x {p_n} phases -> "
          f"{rec.shape[0]}x{rec.shape[1]} (2x grid), "
          f"{time.time()-t0:.1f}s (incl. compile)")
    out = np.asarray(rec)[None]  # (1, 2Ny, 2Nx) volume convention
    _write_out(args, args.out, out, dxy=args.dxy / 2, dz=args.dz)
    print("wrote", args.out)


def cmd_watch(args):
    from microtipi_tpu.serve import watch

    from microtipi_tpu.jobs.deconv import DeconvolutionConfig

    cfg = DeconvolutionConfig(mu=args.mu, epsilon=args.epsilon, max_iter=args.iters,
                              positivity=not args.no_positivity)
    model_factory = blind_cfg = depthvar_params = None
    if args.method in ("blind", "blind-once"):
        from microtipi_tpu.jobs.blind import BlindDeconvConfig
        from microtipi_tpu.models.microscope import (
            CAVITY, DEFOCUS, DEPTH, MODULUS, PHASE, SHEET, STED)

        _resolve_geometry(args)  # no single input stack: flags or defaults
        fam_map = _family_map()
        if "cavity" in args.families and args.model != "4pi":
            sys.exit("--families cavity requires --model 4pi")
        families = tuple(fam_map[f] for f in args.families)
        kw = dict(loops=args.loops, families=families,
                  psf_max_iter=tuple(args.psf_iters for _ in families), deconv=cfg)
        blind_cfg = (BlindDeconvConfig.recommended(**kw) if args.recipe == "quality"
                     else BlindDeconvConfig(**kw))
        model_factory = lambda shape: _build_model(args, shape)
        if getattr(args, "depthvar", 0):
            sys.exit("watch --depthvar rides the vmlmb path")
    elif getattr(args, "depthvar", 0):
        if args.model != "gl":
            sys.exit("watch --depthvar requires --model gl")
        _resolve_geometry(args)
        model_factory = lambda shape: _build_model(args, shape)
        if args.params_json:
            # Parameters live on the pupil, not the grid: load against a
            # nominal-shape model, serve at every arriving shape.
            depthvar_params = _load_params_json(
                model_factory((8, 32, 32)), args.params_json)
    elif not args.psf:
        sys.exit("--psf is required for method vmlmb/rl")
    devices = None
    if args.devices:
        import jax

        devices = jax.devices()[: args.devices]
        if len(devices) < args.devices:
            sys.exit(f"--devices {args.devices}: only {len(devices)} present")
    watch(args.indir, args.outdir, args.psf, config=cfg, method=args.method,
          rl_iterations=args.iters, poll_seconds=args.poll,
          max_files=args.max_files, metrics_path=args.metrics,
          metrics_port=args.metrics_port,
          model_factory=model_factory, blind_config=blind_cfg,
          channel=args.channel, timepoint=args.timepoint, devices=devices,
          bead_path=args.bead, bead_n=args.bead_n,
          priority_patterns=args.priority, zarr_levels=args.zarr_levels,
          preprocess=_build_preprocess(args),
          auto_mu=args.auto_mu, auto_mu_tau=args.tau,
          auto_mu_sigma=args.noise_sigma, auto_gain=args.auto_gain,
          depthvar_k=getattr(args, "depthvar", 0),
          depthvar_params=depthvar_params)


def _enable_compile_cache(cmd=None):
    """Turn on JAX's persistent compilation cache for every compute command.

    On the axon/TPU runtime a first FFT-heavy compile is remote and takes
    minutes; without a disk cache EVERY CLI invocation pays it again (each
    run is a fresh process — measured: the second `deconv --tile` run at
    128x512x512 was no faster than the first, BASELINE.md). Respects an
    explicit ``JAX_COMPILATION_CACHE_DIR``/config value; opt out with
    ``MICROTIPI_NO_COMPILE_CACHE=1``; relocate with ``MICROTIPI_CACHE_DIR``.
    """
    if os.environ.get("MICROTIPI_NO_COMPILE_CACHE"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # user already configured one (env var or config)
    d = os.environ.get("MICROTIPI_CACHE_DIR")
    if not d:
        if cmd in ("info",):
            # IO-only command: deciding the backend-gated default would
            # call jax.default_backend(), which initializes the backend —
            # an expensive remote handshake on tunnel-attached deployments
            # that pure TIFF-metadata printing should never pay.
            return
        if jax.default_backend() not in ("tpu", "axon"):
            # Default the cache ON only for the TPU backend: the XLA:CPU
            # executable (de)serialization segfaults intermittently on
            # some hosts (rc=139 — CLAUDE.md; observed via the in-process
            # main() test path, which had enabled the cache for the whole
            # pytest process). CPU runs stay uncached unless explicitly
            # pointed at a dir (MICROTIPI_CACHE_DIR /
            # JAX_COMPILATION_CACHE_DIR = opt-in).
            return
        d = os.path.join(
            os.path.expanduser("~"), ".cache", "microtipi_tpu", "jax_cache")
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
    except OSError:
        pass  # unwritable home (sandboxed deploys): run uncached


def main(argv=None):
    ap = argparse.ArgumentParser(prog="microtipi_tpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("doctor", help="deployment self-check: backend, jitted "
                                      "solve timing, platform quirks")
    p.set_defaults(fn=cmd_doctor)

    p = sub.add_parser("info", help="print TIFF stack geometry")
    p.add_argument("stack")
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("psf", help="synthesize a widefield PSF stack")
    p.add_argument("out")
    p.add_argument("--shape", type=int, nargs=3, required=True, metavar=("NZ", "NY", "NX"))
    p.add_argument("--phase", type=float, nargs="*", default=[], help="Zernike phase coefficients")
    p.add_argument("--centered", action="store_true", help="write centered layout instead of FFT layout")
    p.add_argument("--ome", action="store_true",
                   help="write outputs as OME-TIFF (OME-XML geometry in the description)")
    p.add_argument("--zarr-levels", type=int, default=1, metavar="L",
                   help="[.zarr outputs] write an L-level 2x mean-downsampled "
                        "NGFF multiscale pyramid (viewers stream from it)")
    _model_args(p)
    p.set_defaults(fn=cmd_psf)

    p = sub.add_parser("fitpsf", help="calibrate PSF parameters from a bead stack")
    p.add_argument("stack", nargs="+",
                   help="bead (point-source) TIFF stack; several (one per "
                        "known depth) with --depth-ladder")
    p.add_argument("--depth-ladder", type=float, nargs="+", default=None,
                   metavar="Z",
                   help="depth-ladder calibration: the K bead stacks were "
                        "acquired at these K KNOWN z positions (data-grid "
                        "voxels, e.g. stage offsets / dz); jointly fits the "
                        "Gibson-Lanni DEPTH family (sample index ns + z=0 "
                        "depth offset) — requires --model gl. Beads at >=2 "
                        "depths pin ns (a single depth cannot; fully-blind "
                        "ns is a measured dead end, BASELINE.md)")
    p.add_argument("--params-json", default=None,
                   help="[--depth-ladder] start from calibrated parameters "
                        "(fitpsf --params-out JSON): the pre-calibrated-pupil "
                        "DEPTH-only ladder is the measured noise-robust "
                        "workflow (TUNING.md)")
    p.add_argument("--out", default=None, help="write the fitted PSF stack here")
    p.add_argument("--params-out", default=None, help="write fitted parameters as JSON")
    p.add_argument("--centered", action="store_true",
                   help="write the fitted PSF in centered layout")
    p.add_argument("--ome", action="store_true",
                   help="write outputs as OME-TIFF (OME-XML geometry in the description)")
    p.add_argument("--zarr-levels", type=int, default=1, metavar="L",
                   help="[.zarr outputs] write an L-level 2x mean-downsampled "
                        "NGFF multiscale pyramid (viewers stream from it)")
    p.add_argument("--iters", type=int, default=60, help="joint-fit VMLMB iterations")
    p.add_argument("--n-beads", type=int, default=1,
                   help="detect and average up to N beads before fitting "
                        "(~sqrt(N) SNR; beads clipping the patch edge are skipped)")
    p.add_argument("--bead-patch", type=int, nargs=3, default=None,
                   metavar=("PZ", "PY", "PX"),
                   help="[--n-beads] averaged patch shape (default: full z, 32x32)")
    p.add_argument("--pin-z4", action="store_true",
                   help="freeze the first phase mode during the fit")
    p.add_argument("--uncertainty", action="store_true",
                   help="report 1-sigma error bars per coefficient "
                        "(Gauss-Newton/Laplace at the fit; adds a 'std' "
                        "object to --params-out)")
    p.add_argument("--field-out", default=None, metavar="JSON",
                   help="field-varying calibration: fit each of --n-beads "
                        "detected beads individually and write position-"
                        "tagged anchors for deconv --field-json")
    p.add_argument("--retrieve-map", default=None, metavar="NPZ",
                   help="nonparametric pupil retrieval on top of the "
                        "parametric fit (GS + gradient, pixelwise phase "
                        "map): writes phi/mask/zernike_projection; --out "
                        "then carries the retrieved-pupil PSF. Needs a "
                        "BRIGHT bead (SNR in the thousands)")
    p.add_argument("--retrieve-modulus", action="store_true",
                   help="[--retrieve-map] also free the pupil modulus map")
    p.add_argument("--empirical-out", default=None, metavar="FILE",
                   help="model-free: distill the bead measurement itself "
                        "into a deconvolution-ready PSF (center + clamp + "
                        "unit-sum; honors --n-beads averaging) and exit — "
                        "no parametric fit")
    p.add_argument("--diversity-dz", type=_comma_floats, default=None,
                   metavar="DZ1,DZ2,..",
                   help="phase-diversity calibration from EXTENDED scenes "
                        "(no bead needed): the K inputs are the SAME unknown "
                        "object acquired at these K KNOWN camera/stage "
                        "defocus offsets (meters, comma-separated; write "
                        "--diversity-dz=-2e-7,2e-7 — the '=' keeps argparse "
                        "from eating the leading minus); the object is "
                        "profiled out in closed form (jobs/diversity). "
                        "Volumetric (Nz>1) fits pin Z4 automatically (the "
                        "axial gauge)")
    p.add_argument("--diversity-astig", type=_comma_floats, default=None,
                   metavar="A1,A2,..",
                   help="like --diversity-dz but with KNOWN astigmatism "
                        "diversity of A radians (Z5) per stack — the "
                        "deformable-mirror / cylindrical-lens variant "
                        "(full basis only, drop --radial)")
    p.add_argument("--diversity-gamma", type=float, default=1e-3,
                   help="[--diversity-*] object-spectrum damping (raise "
                        "with noise; ~1e-8 for noiseless validation)")
    p.add_argument("--object-out", default=None, metavar="FILE",
                   help="[--diversity-*] also write the profiled multi-"
                        "frame Wiener object estimate")
    p.add_argument("--families", nargs="+", default=["defocus", "phase"],
                   choices=["defocus", "phase", "modulus", "depth", "sheet", "sted",
                            "cavity"])
    _preprocess_args(p)
    _model_args(p)
    _hyperstack_args(p)
    p.set_defaults(fn=cmd_fitpsf)

    p = sub.add_parser("deconv", help="non-blind deconvolution")
    p.add_argument("data")
    p.add_argument("--psf", default=None, help="PSF stack (required unless --depthvar)")
    p.add_argument("--psf-centered", action="store_true", help="PSF file is centered; unroll it")
    p.add_argument("--out", required=True)
    p.add_argument("--mu-t", type=float, default=None, metavar="W",
                   help="joint 4D time-series solve over ALL timepoints of a "
                        "hyperstack input, coupled by temporal TV at this "
                        "weight (measured ~11%% better recovery than "
                        "per-frame at heavy noise; step events preserved)")
    p.add_argument("--epsilon-t", type=float, default=None,
                   help="[--mu-t] temporal edge threshold in intensity units "
                        "(default: --epsilon); changes above it count as "
                        "real events, not noise")
    p.add_argument("--register-t", action="store_true",
                   help="[--mu-t] drift-correct the timepoints first "
                        "(cumulative pairwise subvoxel matched-filter "
                        "cross-correlation; uncorrected drift turns the "
                        "temporal prior into motion blur)")
    p.add_argument("--bleach-correct", action="store_true",
                   help="[--mu-t] estimate per-frame photobleaching gains "
                        "from background-corrected frame flux and fold them "
                        "into the forward model (g_t * H x_t) — uncorrected "
                        "fading reads as real change to the temporal prior "
                        "and gets smeared across frames")
    p.add_argument("--all-channels", action="store_true",
                   help="joint multi-channel solve over ALL channels of a "
                        "hyperstack input (at --timepoint; with --mu-t the "
                        "full T x C acquisition in one 5D solve), each "
                        "channel with its own PSF: --psf may hold C "
                        "channels, or per-channel PSFs are synthesized from "
                        "the model flags at each OME channel's emission "
                        "wavelength (chromatic optics)")
    p.add_argument("--coupling", choices=["joint", "separate"],
                   default="joint",
                   help="[--all-channels] channel prior: 'joint' couples "
                        "edge LOCATIONS across channels (color TV — a dim "
                        "channel borrows structure from a bright one; "
                        "intensities stay free), 'separate' keeps "
                        "per-channel TV in one batched solve")
    p.add_argument("--mixing", default=None, metavar="SPEC",
                   help="[--all-channels] joint spectral unmixing: the "
                        "(C_det, K) bleed-through matrix — a JSON/CSV file "
                        "or inline rows 'a,b;c,d' (row c = detected channel "
                        "c's per-dye fractions; columns from dye tables or "
                        "single-stain controls, see mixing_from_controls). "
                        "The solve recovers the K DYE volumes jointly with "
                        "deconvolution; --psf / synthesized PSFs then "
                        "describe the dyes, not the detected channels")
    p.add_argument("--superres", type=int, nargs=3, default=None,
                   metavar=("FZ", "FY", "FX"),
                   help="solve on an FZxFYxFX finer object grid (sub-pixel "
                        "localization; dealiases undersampled cameras). The "
                        "fine PSF is synthesized from the model flags at "
                        "dxy/FX, dz/FZ (use --params-json for calibrated "
                        "optics) or supplied via --psf at the fine grid")
    p.add_argument("--depthvar", type=int, default=0, metavar="K",
                   help="depth-varying solve with K Gibson-Lanni anchor PSFs "
                        "blended along z (requires --model gl; PSF parameters "
                        "from --params-json). With --tile: FULLY space-variant "
                        "solve — per-tile anchor stacks at each tile's "
                        "absolute depth, laterally interpolated from "
                        "--field-json calibrations (K anchors span the TILE z)")
    p.add_argument("--depthvar-maps", nargs="+", default=None, metavar="NPZ",
                   help="depth-varying solve with MEASURED anchors: one "
                        "fitpsf --retrieve-map npz per calibration depth "
                        "(resampled onto the sample pupil grid; anchor PSFs "
                        "synthesized through the scalar pupil, --model "
                        "widefield). Pair with --depthvar-anchors for the "
                        "bead depths")
    p.add_argument("--depthvar-anchors", type=float, nargs="+", default=None,
                   metavar="Z",
                   help="anchor depths as (fractional) z indices of the data "
                        "grid, one per anchor (default: evenly spaced over "
                        "the stack)")
    p.add_argument("--params-json", default=None,
                   help="fitpsf --params-out JSON with the calibrated PSF parameters")
    p.add_argument("--tile", type=int, nargs=3, default=None, metavar=("TZ", "TY", "TX"),
                   help="tiled (out-of-core) solve: stream overlapping tiles of this "
                        "shape through the chip (volumes larger than HBM)")
    p.add_argument("--overlap", type=int, nargs="+", default=16,
                   metavar="O",
                   help="tile halo in voxels (>= PSF half-width; discarded "
                        "on blend): one value for all axes or three (OZ OY "
                        "OX — e.g. '0 24 24' when a single tile spans z)")
    p.add_argument("--tile-batch", type=int, default=8,
                   help="tiles solved per batched dispatch")
    p.add_argument("--field-json", nargs="+", default=None, metavar="JSON",
                   help="[--tile] field-varying PSF from scattered calibrations: "
                        "fitpsf --params-out JSONs, each with an added "
                        "\"position\": [y, x] entry (field voxels); tiles solve "
                        "with the locally interpolated model PSF")
    p.add_argument("--report", default=None,
                   help="write a JSON solve report (cost/grad-norm history, counters)")
    p.add_argument("--uncertainty", type=int, default=0, metavar="K",
                   help="after the solve, estimate the pixelwise Laplace "
                        "posterior std of the restored object with K "
                        "Hutchinson probes (CG over Hessian-vector "
                        "products, ~K*100 extra FFT pairs; voxels pinned "
                        "by positivity read exactly 0) and write it next "
                        "to --out with an _std suffix. Units are data "
                        "units under inverse-variance weights "
                        "(--gain/--auto-gain) or the Poisson term; "
                        "noise-sigma units otherwise")
    p.add_argument("--uncertainty-out", default=None,
                   help="[--uncertainty] path for the std volume "
                        "(default: --out with _std before the extension)")
    p.add_argument("--uncertainty-seed", type=int, default=0,
                   help="[--uncertainty] Rademacher probe RNG seed")
    p.add_argument("--uncertainty-cg-maxiter", type=int, default=100,
                   help="[--uncertainty] CG iteration cap per Hutchinson "
                        "probe solve; raise when the printed CG residual "
                        "is not << 1 (ill-conditioned problems, small mu)")
    p.add_argument("--mesh", type=int, nargs=2, default=None, metavar=("BATCH", "Z"),
                   help="run sharded on a (batch, z) device mesh (needs BATCH*Z devices)")
    p.add_argument("--ome", action="store_true",
                   help="write outputs as OME-TIFF (OME-XML geometry in the description)")
    p.add_argument("--zarr-levels", type=int, default=1, metavar="L",
                   help="[.zarr outputs] write an L-level 2x mean-downsampled "
                        "NGFF multiscale pyramid (viewers stream from it)")
    _preprocess_args(p)
    _model_args(p)  # used by --depthvar (anchor PSF synthesis); inert otherwise
    _deconv_args(p)
    _hyperstack_args(p)
    p.set_defaults(fn=cmd_deconv)

    p = sub.add_parser("blind", help="blind deconvolution")
    p.add_argument("data")
    p.add_argument("--out", required=True)
    p.add_argument("--psf-out", default=None)
    p.add_argument("--params-out", default=None,
                   help="write the fitted PSF parameters as JSON (feeds "
                        "deconv --params-json, e.g. for a depth-varying re-solve)")
    p.add_argument("--report", default=None,
                   help="write a JSON solve report (per-round costs, fitted parameters)")
    p.add_argument("--uncertainty", type=int, default=0, metavar="K",
                   help="after the final round, estimate the pixelwise "
                        "Laplace posterior std of the restored object at "
                        "the FITTED PSF (K Hutchinson probes + CG; see "
                        "deconv --uncertainty) and write it next to --out "
                        "with an _std suffix. Local curvature only: PSF-"
                        "basin ambiguity of blind solves is NOT included "
                        "(fitpsf --uncertainty covers the parameter side)")
    p.add_argument("--uncertainty-out", default=None,
                   help="[--uncertainty] path for the std volume "
                        "(default: --out with _std before the extension)")
    p.add_argument("--uncertainty-seed", type=int, default=0,
                   help="[--uncertainty] Rademacher probe RNG seed")
    p.add_argument("--uncertainty-cg-maxiter", type=int, default=100,
                   help="[--uncertainty] CG iteration cap per Hutchinson "
                        "probe solve; raise when the printed CG residual "
                        "is not << 1 (ill-conditioned problems, small mu)")
    p.add_argument("--params-json", default=None,
                   help="start from calibrated PSF parameters (fitpsf/blind "
                        "--params-out JSON) instead of the unaberrated pupil — "
                        "the bead-calibration-anchored blind workflow")
    p.add_argument("--phase-prior", type=float, default=0.0,
                   help="calibration-prior weight on the phase fit (use with "
                        "--params-json; ~1e-2 measured best — BASELINE.md: "
                        "improves on both free refitting and trusting the "
                        "calibration)")
    p.add_argument("--bead", default=None, metavar="STACK",
                   help="bead (point-source) stack on the same optics: the "
                        "structural calibration anchor — the bead measurement "
                        "joins every PSF fit as an auxiliary data term "
                        "(measured: pins phase at the truth where free and "
                        "prior-anchored fits drift, BASELINE.md)")
    p.add_argument("--bead-weight", type=float, default=1.0,
                   help="bead-term weight in natural intensity units (1.0 = "
                        "joint MLE at equal noise; sigma_sample^2/sigma_bead^2 "
                        "otherwise)")
    p.add_argument("--bead-n", type=int, default=1,
                   help="[--bead] average up to N detected beads into the "
                        "anchor patch first (~sqrt(N) SNR)")
    p.add_argument("--all-channels", action="store_true",
                   help="blind-solve EVERY channel of an OME hyperstack, each "
                        "with its own emission wavelength; writes one "
                        "multi-channel OME-TIFF")
    p.add_argument("--ome", action="store_true",
                   help="write outputs as OME-TIFF (OME-XML geometry in the description)")
    p.add_argument("--zarr-levels", type=int, default=1, metavar="L",
                   help="[.zarr outputs] write an L-level 2x mean-downsampled "
                        "NGFF multiscale pyramid (viewers stream from it)")
    p.add_argument("--loops", type=int, default=5)
    p.add_argument("--psf-iters", type=int, default=20)
    p.add_argument("--phase-schedule", type=int, nargs="*", default=None,
                   help="active phase modes per round (graduated optimization)")
    p.add_argument("--mu-schedule", type=float, nargs="*", default=None,
                   help="per-round TV weight (object-prior annealing: strong early, relax late)")
    p.add_argument("--pin-z4", action="store_true",
                   help="freeze the first phase mode (Z4, gauge-degenerate with object z-shift)")
    p.add_argument("--joint-fit", action="store_true",
                   help="fit all families jointly per round (one VMLMB run)")
    p.add_argument("--wiener-init", action="store_true",
                   help="round-1 object warm start from the regularized inverse")
    p.add_argument("--mesh", type=int, nargs=2, default=None, metavar=("BATCH", "Z"),
                   help="run on a (batch, z) device mesh (sharded loop; needs "
                        "BATCH*Z devices; odd Nz/Ny auto-pad)")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint path: run host-driven rounds, saving state after each")
    p.add_argument("--resume", action="store_true",
                   help="resume from --checkpoint if it exists")
    p.add_argument("--recipe", choices=["parity", "quality"], default="parity",
                   help="'quality' switches on the measured-best recipe in one flag "
                        "(joint fit + pin-Z4 + wiener init); 'parity' (default) keeps "
                        "the reference's sequential per-family semantics")
    p.add_argument("--depthvar", type=int, default=0, metavar="K",
                   help="blind solve under the DEPTH-VARYING forward model: "
                        "K Gibson-Lanni anchor PSFs blended along z, "
                        "re-synthesized from the fitted parameters every "
                        "round (requires --model gl; start from a "
                        "fitpsf --depth-ladder calibration via --params-json "
                        "— fully-blind ns is a measured dead end, BASELINE.md)")
    p.add_argument("--depthvar-anchors", type=float, nargs="+", default=None,
                   metavar="Z",
                   help="[--depthvar] anchor depths as (fractional) z indices "
                        "of the data grid (default: evenly spaced)")
    p.add_argument("--families", nargs="+", default=["defocus", "phase"],
                   choices=["defocus", "phase", "modulus", "depth", "sheet", "sted",
                            "cavity"])
    _preprocess_args(p)
    _model_args(p)
    _deconv_args(p)
    _hyperstack_args(p)
    p.set_defaults(fn=cmd_blind)

    p = sub.add_parser("simulate", help="synthesize a phantom acquisition (blur + camera noise)")
    p.add_argument("out", help="output acquisition stack")
    p.add_argument("--shape", type=int, nargs=3, required=True, metavar=("NZ", "NY", "NX"))
    p.add_argument("--phantom", choices=["beads", "filaments", "shells"],
                   default="beads")
    p.add_argument("--n", type=int, default=20, help="number of structures")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--phase", type=float, nargs="*", default=None,
                   help="inject Zernike phase aberration coefficients")
    p.add_argument("--params-json", default=None,
                   help="synthesize through a fitpsf calibration instead")
    p.add_argument("--photons", type=float, default=1e4,
                   help="expected photons at the brightest voxel")
    p.add_argument("--gain-sim", type=float, default=2.0, help="camera gain e-/ADU")
    p.add_argument("--readout-sim", type=float, default=1.5, help="readout sigma [ADU]")
    p.add_argument("--offset", type=float, default=100.0, help="camera offset [ADU]")
    p.add_argument("--truth", default=None, help="also write the ground-truth object")
    p.add_argument("--psf-out", default=None, help="also write the blurring PSF")
    p.add_argument("--depthvar", type=int, default=0, metavar="K",
                   help="blur with the DEPTH-VARYING operator (K Gibson-"
                        "Lanni anchors; --model gl) — phantoms for testing "
                        "deconv/blind --depthvar workflows")
    p.add_argument("--depthvar-anchors", type=float, nargs="+", default=None,
                   metavar="Z", help="[--depthvar] anchor z indices")
    p.add_argument("--ome", action="store_true",
                   help="write outputs as OME-TIFF (OME-XML geometry in the description)")
    p.add_argument("--zarr-levels", type=int, default=1, metavar="L",
                   help="[.zarr outputs] L-level NGFF multiscale pyramid")
    _model_args(p)
    p.set_defaults(fn=cmd_simulate)

    p = sub.add_parser("register", help="subvoxel volume / channel registration")
    p.add_argument("ref", help="reference volume (or hyperstack with --align-channels)")
    p.add_argument("mov", nargs="?", default=None, help="moving volume to align to ref")
    p.add_argument("--out", required=True)
    p.add_argument("--align-channels", action="store_true",
                   help="chromatic-shift mode: register every channel of the "
                        "input hyperstack to --to-channel, write the full stack")
    p.add_argument("--to-channel", type=int, default=0,
                   help="[--align-channels] reference channel (default 0)")
    p.add_argument("--psf-ref", default=None,
                   help="reference PSF for blur-matched registration of "
                        "differently-blurred volumes")
    p.add_argument("--psf-mov", default=None, help="moving volume's PSF")
    p.add_argument("--dxy", type=float, default=None)
    p.add_argument("--dz", type=float, default=None)
    p.add_argument("--ome", action="store_true",
                   help="write outputs as OME-TIFF (OME-XML geometry in the description)")
    p.add_argument("--zarr-levels", type=int, default=1, metavar="L",
                   help="[.zarr outputs] L-level NGFF multiscale pyramid")
    _hyperstack_args(p)
    _preprocess_args(p)
    p.set_defaults(fn=cmd_register)

    p = sub.add_parser("deskew", help="deskew a stage-scanned light-sheet stack")
    p.add_argument("stack", help="raw (sheared) stage-scan stack")
    p.add_argument("--out", required=True)
    p.add_argument("--angle", type=float, required=True,
                   help="detection-axis-to-scan angle in degrees "
                        "(31.8 lattice, 45 diSPIM)")
    p.add_argument("--invert", action="store_true",
                   help="flip the shear direction (reverse stage scan)")
    p.add_argument("--dxy", type=float, default=None,
                   help="lateral pixel size [m] (default: input metadata)")
    p.add_argument("--dz", type=float, default=None,
                   help="stage step between frames [m] (default: input metadata)")
    p.add_argument("--ome", action="store_true",
                   help="write outputs as OME-TIFF (OME-XML geometry in the description)")
    p.add_argument("--zarr-levels", type=int, default=1, metavar="L",
                   help="[.zarr outputs] L-level NGFF multiscale pyramid")
    _hyperstack_args(p)
    _preprocess_args(p)
    p.set_defaults(fn=cmd_deskew)

    p = sub.add_parser("fsc", help="Fourier Shell Correlation resolution of two volumes")
    p.add_argument("a", help="first volume (e.g. odd-frame or first acquisition)")
    p.add_argument("b", nargs="?", default=None,
                   help="second, independently-noised volume of the same scene")
    p.add_argument("--split", action="store_true",
                   help="single-volume mode: checkerboard-decimate one "
                        "acquisition into two quasi-independent halves "
                        "(Koho 2019 single-image FRC; lateral resolution "
                        "bounded at the decimated Nyquist)")
    p.add_argument("--threshold", type=float, default=0.143,
                   help="FSC crossing threshold (0.143 for independent noise)")
    p.add_argument("--register", action="store_true",
                   help="subvoxel phase-correlation alignment of b to a first")
    p.add_argument("--report", default=None, metavar="JSON",
                   help="write the full FSC curve + resolution as JSON")
    p.add_argument("--dxy", type=float, default=None,
                   help="lateral pixel size [m] (default: input metadata)")
    p.add_argument("--dz", type=float, default=None,
                   help="axial step [m] (default: input metadata)")
    _hyperstack_args(p)
    p.set_defaults(fn=cmd_fsc)

    p = sub.add_parser("fuse", help="multi-view RL fusion (light-sheet: K registered views, K PSFs)")
    p.add_argument("views", nargs="+", help="registered view stacks (same grid)")
    p.add_argument("--psf", nargs="+", required=True, help="one corner-origin PSF per view")
    p.add_argument("--psf-centered", action="store_true", help="PSF files are centered; unroll them")
    p.add_argument("--out", required=True)
    p.add_argument("--iters", type=int, default=50, help="RL iterations")
    p.add_argument("--background", type=float, default=0.0)
    p.add_argument("--rl-backprojector", choices=["matched", "wb"],
                   default="matched",
                   help="wb = Wiener-Butterworth backprojector (Guo 2020; "
                        "~10x fewer iterations)")
    p.add_argument("--register", action="store_true",
                   help="register views 1..K-1 to view 0 first (blur-matched "
                        "subvoxel phase correlation + Fourier shift)")
    p.add_argument("--ome", action="store_true",
                   help="write output as OME-TIFF")
    p.set_defaults(fn=cmd_fuse)

    p = sub.add_parser(
        "ism", help="ISM/Airyscan: reconstruct detector-array confocal data")
    p.add_argument("data", nargs="+",
                   help="element images: ONE element-major interleaved stack "
                        "(K*Nz planes, element 0's z stack first) or K "
                        "stacks, center-out hex order (ISMConfig.offsets())")
    p.add_argument("--out", required=True)
    p.add_argument("--pitch", type=float, required=True,
                   help="element spacing projected to object space [m] "
                        "(physical pitch / total magnification)")
    p.add_argument("--rings", type=int, default=2,
                   help="hex rings around the center element "
                        "(K = 1 + 3r(r+1): 7/19/37 for 1/2/3)")
    p.add_argument("--element-radius", type=float, default=0.0,
                   help="element aperture radius in object space [m] "
                        "(0 = point elements)")
    p.add_argument("--reassign-factor", type=float, default=0.5,
                   help="pixel-reassignment scale s (0.5 = matched widths; "
                        "slightly less with a large Stokes shift)")
    p.add_argument("--method", choices=["reassign", "rl"], default="reassign",
                   help="reassign = classical pixel reassignment (then "
                        "deconvolve with --psf-out); rl = joint Poisson MLE "
                        "over the raw element images (exact per-element "
                        "physics)")
    p.add_argument("--iters", type=int, default=50, help="[rl] iterations")
    p.add_argument("--background", type=float, default=0.0)
    p.add_argument("--rl-backprojector", choices=["matched", "wb"],
                   default="matched")
    p.add_argument("--params-json", default=None,
                   help="calibrated pupil parameters (fitpsf --params-out)")
    p.add_argument("--auto-gains", action="store_true",
                   help="self-calibrate relative element gains from the "
                        "data's per-element totals vs the model's light "
                        "shares (every element sees the same object) and "
                        "correct both methods")
    p.add_argument("--psf-out", default=None,
                   help="also write the reassigned-sum ISM PSF")
    p.add_argument("--centered", action="store_true",
                   help="[--psf-out] write the PSF in centered layout")
    p.add_argument("--ome", action="store_true", help="write OME-TIFF")
    _preprocess_args(p)
    _model_args(p)
    _hyperstack_args(p)
    p.set_defaults(fn=cmd_ism)

    p = sub.add_parser(
        "sim", help="structured-illumination (SIM) reconstruction, 2x lateral")
    p.add_argument("data",
                   help="raw SIM images: angles*phases 2D planes, "
                        "angle-major order")
    p.add_argument("--out", required=True)
    p.add_argument("--angles", type=int, default=3)
    p.add_argument("--phase-count", type=int, default=3,
                   help="pattern phase steps per angle (>= 3)")
    p.add_argument("--pattern-period", type=float, required=True,
                   help="illumination pattern period in meters "
                        "(object space)")
    p.add_argument("--pattern-angle-deg", type=_comma_floats,
                   default=[0.0, 60.0, 120.0], metavar="A1,A2,..",
                   help="pattern orientations in degrees, one per angle")
    p.add_argument("--pattern-phase0", type=_comma_floats, default=None,
                   metavar="P1,P2,..",
                   help="per-angle phase offsets in radians (default 0; "
                        "the steps are 2pi/phase-count; --refine "
                        "self-calibrates offsets AND frequencies)")
    p.add_argument("--refine", action="store_true",
                   help="data-driven pattern self-calibration (phase-"
                        "coherence maximization; measured 0.004-bin / "
                        "0.012-rad on test scenes — BASELINE.md)")
    p.add_argument("--modulation", type=float, default=1.0,
                   help="pattern modulation depth m")
    p.add_argument("--wiener", type=float, default=1e-2,
                   help="generalized-Wiener damping (raise with noise)")
    p.add_argument("--psf", default=None,
                   help="2D PSF image (default: the pupil model at the "
                        "camera grid from the model flags); with "
                        "--axial-period: 3D PSF stack / 3D pupil model")
    p.add_argument("--psf-centered", action="store_true")
    p.add_argument("--axial-period", type=float, default=None, metavar="M",
                   help="3D-SIM (3-beam): axial pattern period in meters; "
                        "input becomes angles*phases VOLUMES of --nz planes "
                        "each (angle-major, phase-minor, z-innermost), "
                        "phase-count >= 5; adds 2x axial resolution and "
                        "fills the missing cone")
    p.add_argument("--axial-phase", type=float, default=0.0, metavar="RAD",
                   help="[3D-SIM] axial pattern phase at the focal plane")
    p.add_argument("--m1", type=float, default=1.0,
                   help="[3D-SIM] modulation depth of the +-1 (axial) orders")
    p.add_argument("--m2", type=float, default=1.0,
                   help="[3D-SIM] modulation depth of the +-2 orders")
    p.add_argument("--no-axial-upsample", action="store_true",
                   help="[3D-SIM] keep the axial grid (saves memory when "
                        "kz_max + q fits under the axial Nyquist)")
    p.add_argument("--ome", action="store_true", help="write OME-TIFF")
    _preprocess_args(p)
    _model_args(p)
    _hyperstack_args(p)
    p.set_defaults(fn=cmd_sim)

    p = sub.add_parser("watch", help="serve: watch a directory, deconvolve arriving stacks")
    p.add_argument("indir")
    p.add_argument("outdir")
    p.add_argument("--psf", default=None,
                   help="PSF stack (required for vmlmb/rl; blind methods fit it)")
    p.add_argument("--poll", type=float, default=2.0)
    p.add_argument("--max-files", type=int, default=None, help="stop after N files (default: run forever)")
    p.add_argument("--metrics", default=None,
                   help="path of an atomically-updated JSON metrics snapshot")
    p.add_argument("--devices", type=int, default=0,
                   help="serving scale-out: dispatch files round-robin over "
                        "the first N jax devices (0 = single-device loop)")
    p.add_argument("--bead", default=None, metavar="STACK",
                   help="[blind-once] calibrate the pupil at startup from this "
                        "bead stack instead of blind-solving the first file")
    p.add_argument("--bead-n", type=int, default=1,
                   help="[--bead] average up to N detected beads first")
    p.add_argument("--metrics-port", type=int, default=None,
                   help="serve the metrics snapshot at http://127.0.0.1:PORT/metrics")
    p.add_argument("--priority", action="append", default=None, metavar="GLOB",
                   help="process files matching this fnmatch pattern first "
                        "(repeatable; earlier flags outrank later ones)")
    p.add_argument("--zarr-levels", type=int, default=1, metavar="L",
                   help="[.zarr outputs] L-level NGFF multiscale pyramid")
    p.add_argument("--loops", type=int, default=5, help="[blind methods] blind rounds")
    p.add_argument("--psf-iters", type=int, default=20, help="[blind methods] fit iterations per family")
    p.add_argument("--families", nargs="+", default=["defocus", "phase"],
                   choices=["defocus", "phase", "modulus", "depth", "sheet", "sted",
                            "cavity"])
    p.add_argument("--recipe", choices=["parity", "quality"], default="quality",
                   help="[blind methods] quality = recommended() recipe (default for serving)")
    p.add_argument("--depthvar", type=int, default=0, metavar="K",
                   help="serve with the DEPTH-VARYING solver: K Gibson-Lanni "
                        "anchor PSFs synthesized at each file's shape from "
                        "--model gl + --params-json (a fitpsf --depth-ladder "
                        "calibration) — thick index-mismatched samples")
    p.add_argument("--params-json", default=None,
                   help="[--depthvar] calibrated PSF parameters "
                        "(fitpsf --params-out / --depth-ladder JSON)")
    _preprocess_args(p)
    _model_args(p)
    _deconv_args(p, methods=("vmlmb", "rl", "blind", "blind-once"))
    _hyperstack_args(p)
    p.set_defaults(fn=cmd_watch)

    args = ap.parse_args(argv)
    _enable_compile_cache(args.cmd)
    args.fn(args)


if __name__ == "__main__":
    main()
