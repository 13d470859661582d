"""Directory-watching batch service: continuous deconvolution of arriving stacks.

Production serving mode (nothing like it exists in the reference — its
ecosystem ran interactively inside Icy): watch an input directory for new
TIFF stacks, deconvolve each with a fixed PSF/config, write results to an
output directory, and keep going. Host IO (native parallel TIFF decode via
the prefetcher) overlaps device compute; the solver is compiled once per
volume geometry and reused across files.

Failure semantics: files are claimed only once their size is stable across
scans; a file that errors is retried (it may have been a partial write whose
size happened to look stable) and only given up on after ``max_retries``
attempts *at the same size* — a file that grows after a failure is treated as
new. Outputs are written atomically (tmp + rename) so downstream watchers
never see partial volumes. A vanishing input between scan and claim is
skipped, never fatal.

Pipelining: host decode of the next ready stack overlaps device compute of
the current one (a small thread pool feeds decoded volumes ahead of the
solver), and the solver donates its input buffer (``donate_argnums``) so XLA
reuses the upload allocation across files. Observability: ``metrics_path``
atomically maintains a JSON snapshot (counts, wall/compute seconds,
throughput) after every scan, and ``metrics_port`` serves the same snapshot
over HTTP (``GET /metrics``) from a daemon thread.

Idle waiting uses Linux inotify when available (wake immediately on
directory changes instead of sleeping out the poll interval); the poll scan
remains the source of truth — inotify only shortcuts the sleep — so the
service behaves identically, just with lower latency, and degrades cleanly
to pure polling on other platforms.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import json
import os
import select
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

__all__ = ["watch"]

# ---- inotify-backed idle wait (Linux; falls back to plain sleep) -----------

_IN_EVENTS = 0x00000100 | 0x00000008 | 0x00000080 | 0x00000040  # CREATE|CLOSE_WRITE|MOVED_TO|MOVED_FROM


class _DirWaiter:
    """Sleep until the directory changes or ``timeout`` elapses.

    The caller's scan loop is unchanged — this only decides how long the
    idle sleep lasts. One instance per watch() call; close() releases the fd.
    """

    def __init__(self, path: Path):
        self._fd = None
        try:
            libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6", use_errno=True)
            fd = libc.inotify_init1(os.O_NONBLOCK)
            if fd < 0:
                return
            wd = libc.inotify_add_watch(fd, str(path).encode(), _IN_EVENTS)
            if wd < 0:
                os.close(fd)
                return
            self._fd = fd
        except Exception:
            self._fd = None  # any libc/platform oddity -> polling fallback

    def wait(self, timeout: float) -> None:
        if self._fd is None:
            time.sleep(timeout)
            return
        r, _, _ = select.select([self._fd], [], [], timeout)
        if r:
            try:  # drain the queue; events only end the sleep early
                os.read(self._fd, 65536)
            except OSError:
                pass

    def close(self) -> None:
        if self._fd is not None:
            os.close(self._fd)
            self._fd = None


def _serve_metrics(port: int, snapshot):
    """Tiny HTTP endpoint: GET /metrics -> the JSON snapshot. Returns the
    server (daemon-threaded); caller shuts it down."""
    import http.server
    import threading

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.rstrip("/") not in ("", "/metrics"):
                self.send_error(404)
                return
            body = json.dumps(snapshot()).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet: service logs go through `log`
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def _tree_size(p: Path) -> int:
    """Total byte size of a directory store (zarr chunk files + metadata)."""
    total = 0
    for root, _dirs, files in os.walk(p):
        for f in files:
            try:
                total += os.stat(os.path.join(root, f)).st_size
            except OSError:
                pass
    return total


def _stable_files(indir: Path, seen: dict, exts=(".tif", ".tiff")) -> list[Path]:
    """Entries whose size is unchanged since the previous scan.

    ``.zarr`` directory stores count too: their "size" is the recursive
    byte total, so a store still being chunk-written is held back exactly
    like a TIFF still being streamed."""
    ready = []
    for p in sorted(indir.iterdir()):
        try:
            if p.suffix.lower() == ".zarr" and p.is_dir():
                size = _tree_size(p)
            elif p.suffix.lower() in exts and p.is_file():
                size = p.stat().st_size
            else:
                continue
        except OSError:
            continue  # vanished or unreadable between iterdir and stat
        prev = seen.get(p.name)
        seen[p.name] = size
        if prev == size and size > 0:
            ready.append(p)
    return ready


def watch(
    indir: str | os.PathLike,
    outdir: str | os.PathLike,
    psf_path: str | os.PathLike | None = None,
    config=None,
    method: str = "vmlmb",
    rl_iterations: int = 50,
    poll_seconds: float = 2.0,
    max_files: int | None = None,
    max_retries: int = 3,
    log=print,
    metrics_path: str | os.PathLike | None = None,
    prefetch: int = 2,
    metrics_port: int | None = None,
    model_factory=None,
    blind_config=None,
    channel: int = 0,
    timepoint: int = 0,
    devices=None,
    bead_path: str | os.PathLike | None = None,
    bead_n: int = 1,
    priority_patterns=None,
    zarr_levels: int = 1,
    preprocess=None,
    auto_mu: bool = False,
    auto_mu_tau: float = 1.0,
    auto_mu_sigma: float | None = None,
    auto_gain: bool = False,
    depthvar_k: int = 0,
    depthvar_params=None,
):
    """Run the service loop. ``max_files`` bounds the run (None = forever).

    Returns the list of processed output paths (useful under ``max_files``).
    ``metrics_path`` maintains an atomic JSON metrics snapshot; ``prefetch``
    sizes the decode thread pool that overlaps host IO with device compute;
    ``metrics_port`` additionally serves the snapshot at
    ``http://127.0.0.1:<port>/metrics``.

    ``devices``: serving scale-out. Pass a list of jax devices (e.g.
    ``jax.devices()``) and each stable file is dispatched to one of them
    round-robin, a worker thread per device — independent volumes are
    embarrassingly parallel, so N chips give ~N-fold throughput without any
    cross-device communication (the TPU-native analog of running N serving
    processes; device execution releases the GIL, so threads suffice).
    ``blind-once`` calibrates on the first file alone before fanning out, so
    every device serves the same calibrated pupil. The metrics snapshot
    gains a ``per_device`` file count. Default (None / one device): the
    single-device loop, unchanged.

    Methods: ``vmlmb``/``rl`` deconvolve every file with the fixed PSF from
    ``psf_path``. ``blind`` runs the full blind loop per file. ``blind-once``
    is the production calibration story: the FIRST file is blind-solved, the
    fitted pupil parameters are kept (and logged), and every later file gets
    the fast fixed-PSF solve with the calibrated PSF — parameters transfer
    across volume shapes because they live on the pupil, not the grid.
    ``method``: "vmlmb" (default), "rl", "admm" (the round-4
    seconds-to-quality engine — ``config.max_iter`` iterations per file,
    same TV objective, BASELINE.md engine head-to-head;
    ``config.admm_abstol``/``admm_reltol`` switch it to Boyd §3.3
    residual-controlled stopping with ``max_iter`` as the cap), or the
    blind variants below.
    Blind methods take ``model_factory(shape) -> PsfModel config`` (and an
    optional ``blind_config``) instead of ``psf_path``.

    ``bead_path`` (with ``method="blind-once"``): the production
    calibration story when a bead slide exists — calibrate the pupil ONCE
    at startup from the bead stack (``fit_psf_beads``; ``bead_n > 1``
    averages that many detected beads first) and serve every file on the
    fast fixed-PSF path. No sample file is burned on a blind solve, and
    the calibration comes from a point source instead of an unknown
    object (measured stronger — BASELINE.md bead tables).

    ``auto_gain`` (``method="vmlmb"`` only): single-shot photon-transfer
    camera calibration on the FIRST file (``estimate_gain_readout``); every
    solve then uses inverse-variance weights built in-graph from its own
    data with the calibrated constants. Composes with ``auto_mu`` (the
    discrepancy target becomes the positive-weight count).

    ``depthvar_k`` (``method="vmlmb"`` only): serve every file with the
    DEPTH-VARYING solver (``jobs/depthvar.deconvolve_depthvar``) — K anchor
    PSFs synthesized in-graph at each file's shape from
    ``model_factory(shape)`` (a Gibson-Lanni config) and ``depthvar_params``
    (a ladder calibration, ``fitpsf --depth-ladder``; None = the model's
    nominal parameters). The thick-index-mismatched-sample serving story:
    one calibration, depth-correct solves forever after. Costs ~(K+2)/2 of
    a fixed-PSF solve (BASELINE.md measured points).

    ``auto_mu`` (``method="vmlmb"`` only): the FIRST file's solve selects
    the TV weight by the Morozov discrepancy principle
    (``jobs/autotune.py``; safety factor ``auto_mu_tau``) and every later
    file reuses the calibrated mu on the cheap fixed-mu solver — the mu
    analog of ``blind-once``. Under device fan-out the loop serializes
    until the calibration lands so all workers share one mu.

    OME hyperstack inputs (SizeC/SizeT > 1) are sliced at
    ``channel``/``timepoint`` — without this a multi-channel file's pages
    would all be misread as z-planes. Plain TIFFs are unaffected (and skip
    the OME parse via a cheap description sniff).

    NGFF plate stores (``.zarr`` directories with plate metadata) are
    batches: every well/field runs through the per-shape solver and the
    output is a plate mirroring the input layout (and zarr format), swapped
    in atomically like any other directory store.

    ``priority_patterns``: list of ``fnmatch`` filename patterns. Within a
    scan, ready files matching an earlier pattern are processed first
    (non-matching files last; name order breaks ties). Lets urgent drops
    (e.g. ``live-*``) jump a deep backlog without a separate queue.
    """
    import jax
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig, deconvolve
    from microtipi_tpu.jobs.richardson_lucy import richardson_lucy
    from microtipi_tpu.utils.arrays import pad_fft_kernel

    blind = method in ("blind", "blind-once")
    if blind and model_factory is None:
        raise ValueError(f"method {method!r} needs model_factory(shape) -> model config")
    if depthvar_k:
        if method != "vmlmb":
            raise ValueError("depthvar_k rides the fixed-parameter VMLMB "
                             f"path; method {method!r} does not take it")
        if model_factory is None:
            raise ValueError("depthvar_k needs model_factory(shape) -> "
                             "Gibson-Lanni config (anchors vary its DEPTH family)")
        if auto_mu:
            raise ValueError("auto_mu does not take the depth-varying path "
                             "yet; calibrate mu offline (deconv --auto-mu)")
    if not blind and not depthvar_k and psf_path is None:
        raise ValueError(f"method {method!r} needs psf_path")
    if auto_mu and method != "vmlmb":
        raise ValueError("auto_mu calibrates the fixed-PSF VMLMB path; "
                         f"method {method!r} does not take it")
    if auto_gain and method != "vmlmb":
        raise ValueError("auto_gain builds variance weights for the VMLMB "
                         f"path; method {method!r} does not take it")

    indir, outdir = Path(indir), Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    psf = jnp.asarray(read_stack(psf_path)) if psf_path is not None else None
    config = config or DeconvolutionConfig()

    solvers: dict[tuple, object] = {}
    solvers_lock = threading.Lock()
    calib = {"params": None}  # blind-once: fitted pupil parameters
    mu_calib = {"mu": None}   # auto_mu: mu from the first file's bisection
    gain_calib = {"gr": None}  # auto_gain: (gain, readout var) from file 1

    def _weights_of(d):
        # Per-file inverse-variance weights from the ONE-time photon-transfer
        # calibration (constants baked into the jitted solver; the weights
        # themselves are computed in-graph from each file's own data).
        if not auto_gain:
            return None
        from microtipi_tpu.weights.updaters import InverseVarianceWeights

        g, rv = gain_calib["gr"]
        return InverseVarianceWeights(gain=g, readout_variance=rv).from_data(d)

    if bead_path is not None:
        if method != "blind-once":
            raise ValueError("bead_path requires method='blind-once'")

    def solver_for(shape):
        # Kernel embedding happens INSIDE the jit: eager dispatch is
        # pathological on remote TPU runtimes (CLAUDE.md platform rules).
        # The lock covers concurrent device workers racing the first build
        # of a shape's solver (jit execution itself is thread-safe).
        calibrated = blind and calib["params"] is not None
        mu_done = auto_mu and mu_calib["mu"] is not None
        key = (shape, calibrated, mu_done)
        with solvers_lock:
            return _solver_for_locked(key, shape, calibrated)

    def _solver_for_locked(key, shape, calibrated):
        if key not in solvers:
            # donate_argnums=0: the uploaded data buffer is dead after the
            # solve (output has the same shape/dtype), so XLA reuses it —
            # one less HBM allocation per file in steady state.
            if blind and not calibrated:
                from microtipi_tpu.jobs.blind import BlindDeconvConfig, blind_deconvolve

                model = model_factory(shape)
                bcfg = blind_config or BlindDeconvConfig()

                def run(d, model=model, bcfg=bcfg):
                    # Files arrive float32; the model's dtype governs the solve.
                    res = blind_deconvolve(d.astype(model.dtype), model, config=bcfg)
                    return res.obj, res.params

                solvers[key] = jax.jit(run, donate_argnums=0)
            elif blind:
                # blind-once, calibrated: fixed-PSF fast path with the pupil
                # synthesized at this shape from the fitted parameters.
                model = model_factory(shape)
                params = calib["params"]

                def run(d, model=model, params=params):
                    kern = model.compute_psf(params)
                    return deconvolve(d.astype(model.dtype), kern, config=config).x

                solvers[key] = jax.jit(run, donate_argnums=0)
            elif method == "rl":

                def run(d, psf=psf):
                    kern = pad_fft_kernel(psf, d.shape)
                    return richardson_lucy(
                        d, kern, iterations=rl_iterations, mu=config.mu, epsilon=config.epsilon
                    )

                solvers[key] = jax.jit(run, donate_argnums=0)
            elif method == "admm":
                # Serving wants throughput: the ADMM engine reaches matched
                # reconstruction quality ~5x faster than VMLMB at scale
                # (BASELINE.md round-4 engine head-to-head). config.max_iter
                # iterations per file; config.admm_abstol/admm_reltol make
                # that a cap with Boyd §3.3 residual stopping underneath.
                from microtipi_tpu.jobs.admm import admm_deconvolve

                def run(d, psf=psf):
                    kern = pad_fft_kernel(psf, d.shape)
                    return admm_deconvolve(d, kern, weights=_weights_of(d),
                                           config=config,
                                           track_objective=False).x

                solvers[key] = jax.jit(run, donate_argnums=0)
            elif depthvar_k:
                # Depth-varying serving: anchors synthesized in-graph at this
                # shape from the calibrated parameters (ladder or nominal).
                from microtipi_tpu.jobs.depthvar import (
                    deconvolve_depthvar, depth_anchor_psfs)

                model = model_factory(shape)
                params = (depthvar_params if depthvar_params is not None
                          else model.init_params())
                if not hasattr(params, "depth"):
                    raise ValueError("depthvar_k needs a model with a DEPTH "
                                     "family (models/gibson_lanni.py)")
                anchors = np.linspace(0.0, shape[0] - 1.0, depthvar_k)

                def run(d, model=model, params=params, anchors=anchors):
                    psfs = depth_anchor_psfs(model, params, anchors,
                                             depth0=params.depth[1])
                    return deconvolve_depthvar(
                        d.astype(model.dtype), psfs, anchors,
                        weights=_weights_of(d), config=config).x

                solvers[key] = jax.jit(run, donate_argnums=0)
            elif auto_mu and mu_calib["mu"] is None:
                # First file calibrates mu by the discrepancy bisection
                # (jobs/autotune.py); later files reuse it on the cheap
                # fixed-mu solver. The fan-out loop serializes until the
                # calibration lands (same gate as blind-once).
                from microtipi_tpu.jobs.autotune import deconvolve_auto_mu

                def run(d, psf=psf):
                    kern = pad_fft_kernel(psf, d.shape)
                    res = deconvolve_auto_mu(d, kern, weights=_weights_of(d),
                                             config=config,
                                             sigma=auto_mu_sigma,
                                             tau=auto_mu_tau)
                    return res.result.x, res.mu, res.sigma

                solvers[key] = jax.jit(run, donate_argnums=0)
            else:
                cfg = config
                if auto_mu:
                    import dataclasses

                    cfg = dataclasses.replace(config, mu=mu_calib["mu"])

                def run(d, psf=psf, cfg=cfg):
                    kern = pad_fft_kernel(psf, d.shape)
                    return deconvolve(d, kern, weights=_weights_of(d),
                                      config=cfg).x

                solvers[key] = jax.jit(run, donate_argnums=0)
        return solvers[key]

    def solve(data):
        """One file -> the output volume (handles the blind state machine)."""
        if auto_gain and gain_calib["gr"] is None:
            from microtipi_tpu.weights.updaters import estimate_gain_readout

            g, rv = jax.jit(estimate_gain_readout)(data)
            gain_calib["gr"] = (float(g), float(rv))
            log(f"[watch] calibrated camera from first file: gain="
                f"{float(g):.4g} e-/ADU, readout var {float(rv):.4g} ADU^2 "
                "(single-shot photon transfer)")
        out = solver_for(data.shape)(data)
        if blind and calib["params"] is None:
            obj, params = out
            if method == "blind-once":
                calib["params"] = jax.tree.map(np.asarray, params)
                log(f"[watch] calibrated pupil from first file: "
                    f"{ {k: np.round(np.asarray(v), 5).tolist() for k, v in calib['params']._asdict().items()} }")
            return obj
        if blind and isinstance(out, tuple):
            return out[0]
        if auto_mu and isinstance(out, tuple):
            x, mu, sigma = out
            if mu_calib["mu"] is None:
                mu_calib["mu"] = float(mu)
                sig = float(sigma)
                sig_txt = ("weighted target" if sig != sig  # nan: weights set
                           else f"noise sigma {sig:.4g}")
                log(f"[watch] calibrated mu={float(mu):.4g} from first file "
                    f"({sig_txt}); later files use the fixed-mu solver")
            return x
        return out

    def _prep(v):
        # input preprocessing (flat/dark/hot-pixels/background), applied to
        # every decoded volume including the bead calibration stack
        return v if preprocess is None else np.asarray(preprocess(v))

    def _slice_tc(arr, name):
        nt, nc = arr.shape[:2]
        if nt == 1 and nc == 1:
            return _prep(np.ascontiguousarray(arr[0, 0]))
        t, c = min(timepoint, nt - 1), min(channel, nc - 1)
        log(f"[watch] {name}: hyperstack T={nt} C={nc}, using t={t} c={c}")
        return _prep(np.ascontiguousarray(arr[t, c]))

    def _decode(p):
        if str(p).lower().endswith(".zarr"):
            from microtipi_tpu.io.plate import (
                is_plate, list_plate_images, read_plate_image)
            from microtipi_tpu.io.zarrstack import read_ngff_hyperstack

            if is_plate(p):
                # A dropped plate is a batch: decode every well/field; the
                # solve loop fans them through the per-shape solver and the
                # output mirrors the plate layout.
                items = {}
                for well, field in list_plate_images(p):
                    arr, _meta = read_plate_image(p, well, field)
                    items[(well, field)] = _slice_tc(
                        arr, f"{Path(p).name}:{well}/{field}")
                return ("plate", items)
            arr, _meta = read_ngff_hyperstack(p)
        else:
            try:
                from microtipi_tpu.io.ome import read_ome_hyperstack

                arr, _meta = read_ome_hyperstack(p)
            except Exception:
                return _prep(read_stack(p))
        return _slice_tc(arr, Path(p).name)

    if bead_path is not None:
        # Startup bead calibration: the same hyperstack/zarr-aware decode as
        # sample files (a multi-channel bead slide read as raw pages would
        # silently fit a garbage pupil), and the run's own family/budget/
        # pin-Z4 settings from blind_config so --bead produces the same
        # pupil parameterization the first-file path would.
        from microtipi_tpu.jobs.psf_fit import average_beads, fit_psf_beads
        from microtipi_tpu.models.microscope import DEPTH

        bead = np.asarray(_decode(Path(bead_path)))
        if bead_n > 1:
            bead, used = average_beads(bead, n_beads=bead_n)
            log(f"[watch] averaged {used} beads from {bead_path}")
        bcfg = blind_config
        fit_kw = {}
        if bcfg is not None:
            fit_kw = dict(
                families=tuple(f for f in bcfg.families if f != DEPTH),
                config=bcfg.fit,
                phase_freeze_head=bcfg.phase_freeze_head,
            )
        bead_model = model_factory(bead.shape)
        fit_res, _amp = jax.jit(
            lambda b: fit_psf_beads(bead_model, b, **fit_kw)
        )(jnp.asarray(bead, bead_model.dtype))
        calib["params"] = jax.tree.map(np.asarray, fit_res.params)
        log(f"[watch] calibrated pupil from bead stack {bead_path}: "
            f"{ {k: np.round(np.asarray(v), 5).tolist() for k, v in calib['params']._asdict().items()} }")

    seen: dict[str, int] = {}
    done: set[tuple[str, int]] = set()  # (name, size): re-process if it grows
    attempts: dict[tuple[str, int], int] = {}
    processed: list[Path] = []
    stats = {
        "started_at": time.time(), "processed": 0, "failed_attempts": 0,
        "compute_seconds": 0.0, "voxels": 0, "scans": 0,
    }

    def write_metrics():
        if metrics_path is None:
            return
        snap = dict(stats)
        wall = max(time.time() - snap.pop("started_at"), 1e-9)
        snap["uptime_seconds"] = round(wall, 3)
        snap["mvox_per_second"] = round(snap["voxels"] / wall / 1e6, 6)
        tmp = str(metrics_path) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, str(metrics_path))

    pool = ThreadPoolExecutor(max_workers=max(1, prefetch))
    waiter = _DirWaiter(indir)
    http_srv = None
    if metrics_port is not None:

        def snapshot():
            snap = dict(stats)
            wall = max(time.time() - snap.pop("started_at"), 1e-9)
            snap["uptime_seconds"] = round(wall, 3)
            snap["mvox_per_second"] = round(snap["voxels"] / wall / 1e6, 6)
            return snap

        http_srv = _serve_metrics(metrics_port, snapshot)
        log(f"[watch] metrics at http://127.0.0.1:{http_srv.server_address[1]}/metrics")
    state_lock = threading.Lock()

    def _write_output(out, x, plate_wells=None, zarr_format=2):
        if plate_wells is not None or out.suffix.lower() == ".zarr":
            # Directory store: build aside, then swap atomically
            # (readers never see a half-written store).
            import shutil

            from microtipi_tpu.io.plate import write_plate
            from microtipi_tpu.io.zarrstack import write_ngff_hyperstack

            tmp = out.with_suffix(out.suffix + ".tmp")
            if tmp.exists():
                shutil.rmtree(tmp)
            if plate_wells is not None:
                write_plate(tmp, plate_wells, zarr_format=zarr_format,
                            levels=zarr_levels)
            else:
                write_ngff_hyperstack(tmp, x, levels=zarr_levels)
            if out.exists():
                shutil.rmtree(out)
            os.replace(tmp, out)
        else:
            tmp = out.with_suffix(out.suffix + ".tmp")
            write_stack(tmp, x)
            os.replace(tmp, out)

    def _process_one(p, size, data_fut, device=None):
        key = (p.name, size)
        try:
            t0 = time.time()
            data = data_fut.result()
            if isinstance(data, tuple) and data[0] == "plate":
                from microtipi_tpu.io import zarr3

                out_wells, nvox = {}, 0
                for (well, field), vol in data[1].items():
                    d = (jnp.asarray(vol) if device is None
                         else jax.device_put(vol, device))
                    x = np.asarray(solve(d))
                    out_wells.setdefault(well, []).append(x)
                    nvox += int(x.size)
                shape = (len(data[1]), "plate-images")
                out = outdir / p.name
                _write_output(out, None, plate_wells=out_wells,
                              zarr_format=3 if zarr3.is_zarr3_group(p) else 2)
                dt = time.time() - t0
                with state_lock:
                    done.add(key)
                    processed.append(out)
                    stats["processed"] += 1
                    stats["compute_seconds"] += dt
                    stats["voxels"] += nvox
                    if device is not None:
                        per = stats.setdefault("per_device", {})
                        per[str(device)] = per.get(str(device), 0) + 1
                log(f"[watch] {p.name}: plate ({len(data[1])} images) done "
                    f"in {dt:.2f}s -> {out}")
                return
            data = jnp.asarray(data) if device is None else jax.device_put(data, device)
            shape = data.shape
            x = np.asarray(solve(data))
            out = outdir / p.name
            _write_output(out, x)
            dt = time.time() - t0
            with state_lock:
                done.add(key)
                processed.append(out)
                stats["processed"] += 1
                stats["compute_seconds"] += dt
                stats["voxels"] += int(np.prod(shape))
                if device is not None:
                    per = stats.setdefault("per_device", {})
                    per[str(device)] = per.get(str(device), 0) + 1
            tag = f" [{device}]" if device is not None else ""
            log(f"[watch] {p.name}: {shape} done in {dt:.2f}s -> {out}{tag}")
        except Exception as e:  # keep serving; retry (bounded) next scan
            with state_lock:
                attempts[key] = attempts.get(key, 0) + 1
                n_att = attempts[key]
                stats["failed_attempts"] += 1
            log(
                f"[watch] {p.name}: FAILED attempt {n_att}/{max_retries} "
                f"({type(e).__name__}: {e})"
            )

    fan_out = devices is not None and len(devices) > 1
    solver_pool = ThreadPoolExecutor(max_workers=len(devices)) if fan_out else None
    try:
        while max_files is None or len(processed) < max_files:
            ready = [
                p for p in _stable_files(indir, seen)
                if (p.name, seen[p.name]) not in done
                and attempts.get((p.name, seen[p.name]), 0) < max_retries
            ]
            if priority_patterns:
                import fnmatch

                def _rank(p):
                    for i, pat in enumerate(priority_patterns):
                        if fnmatch.fnmatch(p.name, pat):
                            return i
                    return len(priority_patterns)

                ready.sort(key=_rank)  # stable: name order within a rank
            stats["scans"] += 1
            if not ready:
                write_metrics()
                waiter.wait(poll_seconds)
                continue
            if max_files is not None:
                ready = ready[: max_files - len(processed)]
            # Decode ahead: file i+1 parses on host threads while the device
            # solves file i.
            futs = [(p, seen[p.name], pool.submit(_decode, p)) for p in ready]
            if solver_pool is not None:
                # blind-once: calibrate on ONE file before fanning out so
                # every device serves the same pupil. Keep serializing while
                # uncalibrated — if the first candidate FAILS (corrupt file),
                # fanning out anyway would blind-solve on every worker and
                # race the calib write. method='blind' has no shared
                # calibration and fans out immediately.
                while ((method == "blind-once" and calib["params"] is None)
                       or (auto_mu and mu_calib["mu"] is None)
                       or (auto_gain and gain_calib["gr"] is None)) and futs:
                    p, size, fut = futs[0]
                    _process_one(p, size, fut, devices[0])
                    futs = futs[1:]
                tasks = [
                    solver_pool.submit(_process_one, p, size, fut, devices[i % len(devices)])
                    for i, (p, size, fut) in enumerate(futs)
                ]
                for t in tasks:
                    t.result()
            else:
                dev0 = devices[0] if devices else None
                for p, size, fut in futs:
                    _process_one(p, size, fut, dev0)
            write_metrics()
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
        if solver_pool is not None:
            solver_pool.shutdown(wait=False, cancel_futures=True)
        waiter.close()
        if http_srv is not None:
            http_srv.shutdown()
    return processed
