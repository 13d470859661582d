"""Auxiliary subcommands: ``simulate``, ``register``, ``deskew``, ``fsc``,
``fuse``, ``ism``, ``sim`` (structured illumination) and ``watch`` (the
serving loop). Split out of ``__main__.py`` (pure refactor)."""

from __future__ import annotations

import sys
import time

from microtipi_tpu.cli.shared import (
    _build_model,
    _build_preprocess,
    _depthvar_anchor_array,
    _family_map,
    _load_params_json,
    _read_input_volume,
    _resolve_geometry,
    _write_out,
)

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

        from microtipi_tpu.ops.convolution import auto_exact_fft, fft_pair

        _exact = auto_exact_fft()

        @jax.jit
        def blur(o, p):
            psfs = depth_anchor_psfs(model, p, anchors, depth0=p.depth[1])
            return depth_varying_convolve(
                o, fft_pair(_exact)[0](psfs, axes=(1, 2, 3)),
                jnp.asarray(zw, model.dtype), shape, _exact)
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
