"""`doctor`, `info` and `psf` subcommands (platform self-check, stack
metadata, PSF synthesis). Split out of ``__main__.py`` (pure refactor)."""

from __future__ import annotations

import sys

from microtipi_tpu.cli.shared import (
    _build_model,
    _is_h5,
    _is_plate,
    _is_zarr,
    _resolve_geometry,
    _write_out,
)

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
