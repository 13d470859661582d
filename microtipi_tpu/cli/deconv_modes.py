"""Non-blind deconvolution mode variants behind ``deconv``: depth-varying,
HCS plate fan-out, time-series, multichannel (joint + unmixing), 5D
timeseries-multichannel, and super-resolution upsampling. Split out of
``__main__.py`` (pure refactor)."""

from __future__ import annotations

import sys
import time

from microtipi_tpu.cli.shared import (
    _build_model,
    _deconv_config,
    _depthvar_anchor_array,
    _load_params_json,
    _load_pupil_maps,
    _plate_fan_out,
    _prep_hyperstack,
    _read_hyperstack,
    _resolve_geometry,
    _weights,
    _write_hyperstack,
    _write_out,
)

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
    if args.method == "admm":
        # The round-4 engine on the joint 4D objective (same
        # make_timeseries_objective; fixed --iters). Poisson+bleach is the
        # one combination it does not take (jobs/admm.py).
        from microtipi_tpu.jobs.admm import admm_deconvolve_timeseries

        solver = lambda d, p, w, g: admm_deconvolve_timeseries(
            d, p, weights=w, config=cfg, mu_t=args.mu_t,
            epsilon_t=args.epsilon_t, bleach=g, track_objective=False)
    elif args.method != "vmlmb":
        sys.exit(f"--mu-t takes --method vmlmb or admm, not {args.method} "
                 "(rl has no coupled temporal form)")
    else:
        solver = lambda d, p, w, g: deconvolve_timeseries(
            d, p, weights=w, config=cfg, mu_t=args.mu_t,
            epsilon_t=args.epsilon_t, bleach=g)
    run = jax.jit(solver)
    t0 = time.time()
    res = run(series, psf, w, bleach)
    f = float(res.f)
    print(f"deconv[timeseries T={nt} {args.method}]: {int(res.iterations)} "
          f"iters, cost {f:.6g}, {time.time()-t0:.1f}s (incl. compile)")
    _write_hyperstack(args, np.asarray(res.x)[:, None])  # (T, 1, Z, Y, X)


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
    if args.method not in ("vmlmb", "admm"):
        sys.exit("--all-channels takes --method vmlmb or admm "
                 "(rl has no coupled form; run rl per channel)")
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
    if args.method == "admm":
        # The round-4 engine on the same coupled objective (jobs/admm.py:
        # mixing = constant KxK data prox; weighted/poisson unmixing stays
        # on vmlmb and the engine says so itself).
        from microtipi_tpu.jobs.admm import admm_deconvolve_multichannel

        solver = lambda d, p, w: admm_deconvolve_multichannel(
            d, p, weights=w, config=cfg, coupling=coupling, mixing=mix,
            track_objective=False)
    else:
        solver = lambda d, p, w: deconvolve_multichannel(
            d, p, weights=w, config=cfg, coupling=coupling, mixing=mix)
    run = jax.jit(solver)
    t0 = time.time()
    res = run(stack, psfs, w)
    unmix_tag = f" -> K={nk} dyes" if mix is not None else ""
    print(f"deconv[channels C={nc}{unmix_tag}, {coupling} {args.method}]: "
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
    if args.method not in ("vmlmb", "admm"):
        sys.exit("--mu-t --all-channels takes --method vmlmb or admm "
                 "(rl has no coupled form)")
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
    if args.method == "admm":
        # The round-4 engine on the full 5D objective; its unsupported
        # combinations (weighted/poisson unmixing, poisson+bleach) raise
        # with actionable messages (jobs/admm.py).
        from microtipi_tpu.jobs.admm import admm_deconvolve_timeseries_multichannel

        solver = lambda d, p, w, g: admm_deconvolve_timeseries_multichannel(
            d, p, weights=w, config=cfg, mu_t=args.mu_t,
            epsilon_t=args.epsilon_t, bleach=g, coupling=coupling,
            mixing=mix, track_objective=False)
    else:
        solver = lambda d, p, w, g: deconvolve_timeseries_multichannel(
            d, p, weights=w, config=cfg, mu_t=args.mu_t,
            epsilon_t=args.epsilon_t, bleach=g, coupling=coupling, mixing=mix)
    run = jax.jit(solver)
    t0 = time.time()
    res = run(block, psfs, w, bleach)
    unmix_tag = f" -> K={nk} dyes" if mix is not None else ""
    print(f"deconv[timeseries T={nt} x channels C={nc}{unmix_tag}, "
          f"{coupling} {args.method}]: {int(res.iterations)} iters, "
          f"cost {float(res.f):.6g}, {time.time()-t0:.1f}s (incl. compile)")
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
            or args.method not in ("vmlmb", "admm") or getattr(args, "pad", 0):
        sys.exit("--superres is a single-chip fine-grid solve (vmlmb/admm); "
                 "drop --mesh/--tile/--depthvar/--auto-mu/--method rl|fista/"
                 "--pad")
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
        if args.method == "admm":
            from microtipi_tpu.jobs.superres import admm_deconvolve_superres

            return admm_deconvolve_superres(d, p, factor=f, weights=w,
                                            config=cfg, track_objective=False)
        return deconvolve_superres(d, p, factor=f, weights=w, config=cfg)

    run = jax.jit(_solve)
    t0 = time.time()
    res = run(data, psf_fine, w)
    fval = float(res.f)
    wall = time.time() - t0
    print(f"deconv[superres x{f} {args.method}]: {int(res.iterations)} iters, cost "
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
