"""Directory-watching service loop."""

import numpy as np
import jax.numpy as jnp
import pytest

from microtipi_tpu.io.tiffstack import read_stack, write_stack
from microtipi_tpu.jobs.deconv import DeconvolutionConfig
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
from microtipi_tpu.serve import watch


def test_watch_processes_files_and_survives_bad_input(tmp_path):
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    shape = (4, 16, 16)
    psf = np.zeros(shape, np.float32)
    psf[0, 0, 0] = 0.6
    psf[0, 0, 1] = 0.4
    write_stack(tmp_path / "psf.tif", psf)

    rng = np.random.default_rng(0)
    objs = []
    for i in range(3):
        o = np.abs(rng.standard_normal(shape)).astype(np.float32) * 10
        d = convolve(jnp.asarray(o), convolve_spectrum(jnp.asarray(psf)), shape)
        write_stack(indir / f"t{i}.tif", np.asarray(d))
        objs.append(o)
    (indir / "broken.tif").write_bytes(b"not a tiff at all")

    logs = []
    out = watch(indir, outdir, tmp_path / "psf.tif",
                config=DeconvolutionConfig(mu=0.001, epsilon=1.0, max_iter=8),
                poll_seconds=0.05, max_files=3, log=logs.append)
    assert len(out) == 3
    assert sorted(p.name for p in out) == ["t0.tif", "t1.tif", "t2.tif"]
    for i, o in enumerate(objs):
        rec = read_stack(outdir / f"t{i}.tif")
        assert rec.shape == shape and np.isfinite(rec).all()
    # the broken file was logged as failed, not fatal
    assert any("broken.tif" in m and "FAILED" in m for m in logs)


def _mini_scene(tmp_path, shape=(4, 16, 16)):
    psf = np.zeros(shape, np.float32)
    psf[0, 0, 0] = 0.6
    psf[0, 0, 1] = 0.4
    write_stack(tmp_path / "psf.tif", psf)
    rng = np.random.default_rng(1)
    o = np.abs(rng.standard_normal(shape)).astype(np.float32) * 10
    d = np.asarray(convolve(jnp.asarray(o), convolve_spectrum(jnp.asarray(psf)), shape))
    return psf, d


def test_watch_grows_after_failure_is_reclaimed(tmp_path):
    """serve.py failure semantics: a file that fails and then GROWS is
    treated as new (fresh retry budget) — the partial-write-then-finished
    scenario."""
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    psf, d = _mini_scene(tmp_path)

    # A corrupt file that looks size-stable: claimed, fails.
    (indir / "a.tif").write_bytes(b"garbage that is not a tiff")

    state = {"replaced": False}

    def log(msg):
        if "FAILED" in msg and not state["replaced"]:
            # Simulate the writer finishing: replace with a valid, LARGER stack.
            state["replaced"] = True
            write_stack(indir / "a.tif", d)

    out = watch(indir, outdir, tmp_path / "psf.tif",
                config=DeconvolutionConfig(mu=0.001, epsilon=1.0, max_iter=5),
                poll_seconds=0.02, max_files=1, max_retries=1, log=log)
    assert len(out) == 1 and out[0].name == "a.tif"
    assert state["replaced"]
    rec = read_stack(outdir / "a.tif")
    assert rec.shape == d.shape and np.isfinite(rec).all()


def test_watch_retries_bounded_at_same_size(tmp_path):
    """A persistently corrupt file is attempted at most max_retries times at
    one size, then ignored while the service keeps going."""
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    psf, d = _mini_scene(tmp_path)
    (indir / "0broken.tif").write_bytes(b"still not a tiff")

    fails = []
    state = {"released": False}

    def log(msg):
        if "FAILED" in msg:
            fails.append(msg)
        # After the retry budget is spent, give the loop an exit path.
        if len(fails) >= 2 and not state["released"]:
            state["released"] = True
            write_stack(indir / "zz.tif", d)

    out = watch(indir, outdir, tmp_path / "psf.tif",
                config=DeconvolutionConfig(mu=0.001, epsilon=1.0, max_iter=5),
                poll_seconds=0.02, max_files=1, max_retries=2, log=log)
    assert len(out) == 1 and out[0].name == "zz.tif"
    # exactly max_retries attempts on the corrupt file, despite extra scans
    # while zz.tif was stabilizing
    assert len([m for m in fails if "0broken.tif" in m]) == 2


def test_watch_rl_method(tmp_path):
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    psf, d = _mini_scene(tmp_path)
    write_stack(indir / "t.tif", d)
    out = watch(indir, outdir, tmp_path / "psf.tif", method="rl", rl_iterations=5,
                poll_seconds=0.02, max_files=1, log=lambda m: None)
    assert len(out) == 1
    rec = read_stack(outdir / "t.tif")
    assert rec.shape == d.shape and np.isfinite(rec).all() and (rec >= 0).all()


def test_watch_admm_method(tmp_path):
    """watch --method admm: the round-4 throughput engine serves files
    (fixed config.max_iter iterations, same TV objective as vmlmb)."""
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    psf, d = _mini_scene(tmp_path)
    write_stack(indir / "t.tif", d)
    out = watch(indir, outdir, tmp_path / "psf.tif", method="admm",
                config=DeconvolutionConfig(mu=0.001, epsilon=1.0, max_iter=8),
                poll_seconds=0.02, max_files=1, log=lambda m: None)
    assert len(out) == 1
    rec = read_stack(outdir / "t.tif")
    assert rec.shape == d.shape and np.isfinite(rec).all() and (rec >= 0).all()


def test_watch_metrics_snapshot(tmp_path):
    import json

    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    psf, d = _mini_scene(tmp_path)
    write_stack(indir / "a.tif", d)
    write_stack(indir / "b.tif", d * 1.5)
    (indir / "0bad.tif").write_bytes(b"nope")  # sorts first: attempted before max_files hits
    metrics = tmp_path / "metrics.json"
    out = watch(indir, outdir, tmp_path / "psf.tif",
                config=DeconvolutionConfig(mu=0.001, epsilon=1.0, max_iter=4),
                poll_seconds=0.02, max_files=2, log=lambda m: None,
                metrics_path=metrics)
    assert len(out) == 2
    snap = json.loads(metrics.read_text())
    assert snap["processed"] == 2
    assert snap["failed_attempts"] >= 1  # 0bad.tif
    assert snap["voxels"] == 2 * int(np.prod(d.shape))
    assert snap["mvox_per_second"] > 0 and snap["uptime_seconds"] > 0


def test_dir_waiter_wakes_on_change(tmp_path):
    """inotify-backed idle wait returns early when the directory changes and
    times out otherwise (falls back to plain sleep where inotify is absent)."""
    import threading
    import time

    from microtipi_tpu.serve import _DirWaiter

    w = _DirWaiter(tmp_path)
    try:
        # no change: waits out (close to) the timeout
        t0 = time.time()
        w.wait(0.25)
        assert time.time() - t0 >= 0.2

        if w._fd is None:
            pytest.skip("inotify unavailable; polling fallback already exercised")

        def touch():
            time.sleep(0.05)
            (tmp_path / "new.tif").write_bytes(b"x")

        threading.Thread(target=touch).start()
        t0 = time.time()
        w.wait(5.0)
        assert time.time() - t0 < 2.0  # woke on the event, not the timeout
    finally:
        w.close()


def test_watch_metrics_http_endpoint(tmp_path):
    """GET /metrics serves the live snapshot while the service runs."""
    import json
    import urllib.error
    import urllib.request

    from microtipi_tpu.serve import _serve_metrics

    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    psf, d = _mini_scene(tmp_path)
    write_stack(indir / "a.tif", d)

    # endpoint unit: port 0 auto-assigns; snapshot callable is live
    state = {"processed": 0}
    srv = _serve_metrics(0, lambda: state)
    try:
        port = srv.server_address[1]
        got = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=5).read())
        assert got == {"processed": 0}
        state["processed"] = 3
        got = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=5).read())
        assert got["processed"] == 3
        # unknown path -> 404
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=5)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()

    # integration: watch() with metrics_port spins the endpoint up and down
    logs = []
    out = watch(indir, outdir, tmp_path / "psf.tif",
                config=DeconvolutionConfig(mu=0.001, epsilon=1.0, max_iter=4),
                poll_seconds=0.02, max_files=1, log=logs.append, metrics_port=0)
    assert len(out) == 1
    assert any("metrics at http" in m for m in logs)


def _blind_scene(indir, n_files=2, shape=(8, 16, 16), seed=2):
    """Aberrated synthetic stacks sharing one pupil, plus the model factory."""
    from microtipi_tpu.models.widefield import WideFieldConfig

    def factory(shp):
        return WideFieldConfig(shape=shp, na=1.2, wavelength=520e-9, ni=1.33,
                               dxy=100e-9, dz=250e-9, n_phase=2, radial=True,
                               dtype=jnp.float64)

    model = factory(shape)
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.15]))
    psf = model.compute_psf(true)
    rng = np.random.default_rng(seed)
    for i in range(n_files):
        o = np.abs(rng.standard_normal(shape)) * 10
        d = convolve(jnp.asarray(o), convolve_spectrum(psf), shape)
        write_stack(indir / f"b{i}.tif", np.asarray(d, np.float32))
    return factory


def test_watch_blind_once_calibrates_then_fast_path(tmp_path):
    """blind-once: first file runs the blind loop and logs the calibrated
    pupil; later files reuse the fitted parameters on the fixed-PSF path."""
    from microtipi_tpu.jobs.blind import BlindDeconvConfig

    indir, outdir = tmp_path / "in", tmp_path / "out"
    indir.mkdir()
    factory = _blind_scene(indir, n_files=2)
    bcfg = BlindDeconvConfig(
        loops=2, families=(0, 1), psf_max_iter=(3, 3),
        deconv=DeconvolutionConfig(mu=1e-3, epsilon=1.0, max_iter=5, grtol=0.0),
    )
    logs = []
    out = watch(indir, outdir, None, method="blind-once",
                model_factory=factory, blind_config=bcfg,
                config=DeconvolutionConfig(mu=1e-3, epsilon=1.0, max_iter=5),
                poll_seconds=0.05, max_files=2, log=logs.append)
    assert len(out) == 2
    assert any("calibrated pupil" in m for m in logs)
    for i in range(2):
        rec = read_stack(outdir / f"b{i}.tif")
        assert np.isfinite(rec).all()


def test_watch_blind_every_file(tmp_path):
    from microtipi_tpu.jobs.blind import BlindDeconvConfig

    indir, outdir = tmp_path / "in", tmp_path / "out"
    indir.mkdir()
    factory = _blind_scene(indir, n_files=2, seed=3)
    bcfg = BlindDeconvConfig(
        loops=2, families=(0, 1), psf_max_iter=(2, 2),
        deconv=DeconvolutionConfig(mu=1e-3, epsilon=1.0, max_iter=4, grtol=0.0),
    )
    logs = []
    out = watch(indir, outdir, None, method="blind",
                model_factory=factory, blind_config=bcfg,
                poll_seconds=0.05, max_files=2, log=logs.append)
    assert len(out) == 2
    assert not any("calibrated pupil" in m for m in logs)  # no state capture


def test_watch_blind_requires_model_factory(tmp_path):
    with pytest.raises(ValueError, match="model_factory"):
        watch(tmp_path, tmp_path / "o", None, method="blind", max_files=0)


def test_watch_fixed_psf_requires_path(tmp_path):
    with pytest.raises(ValueError, match="psf_path"):
        watch(tmp_path, tmp_path / "o", None, method="vmlmb", max_files=0)


def test_watch_depthvar_serves_with_calibrated_params(tmp_path):
    """watch(depthvar_k=K): each file solved by the depth-varying operator
    with anchors synthesized at its shape from the (ladder-)calibrated
    parameters — and two different shapes share the one calibration."""
    from microtipi_tpu.models.gibson_lanni import GibsonLanniConfig

    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()

    def factory(shape):
        return GibsonLanniConfig(
            shape=shape, na=1.2, wavelength=500e-9, ni=1.518, dxy=100e-9,
            dz=300e-9, n_phase=0, ns=1.36, depth=0.0, dtype=jnp.float32)

    params = factory((4, 16, 16)).init_params()._replace(
        depth=jnp.asarray([1.37 / 500e-9, 0.0], jnp.float32))
    rng = np.random.default_rng(7)
    shapes = [(4, 16, 16), (8, 16, 16)]
    for i, shape in enumerate(shapes):
        d = np.abs(rng.standard_normal(shape)).astype(np.float32) * 10
        write_stack(indir / f"s{i}.tif", d)

    out = watch(indir, outdir, None, method="vmlmb",
                config=DeconvolutionConfig(mu=1e-3, epsilon=1.0, max_iter=4),
                poll_seconds=0.05, max_files=2, model_factory=factory,
                depthvar_k=2, depthvar_params=params)
    assert len(out) == 2
    for i, shape in enumerate(shapes):
        rec = read_stack(outdir / f"s{i}.tif")
        assert rec.shape == shape and np.isfinite(rec).all()
        assert (rec >= 0).all()  # positivity rode through


def test_watch_depthvar_validation(tmp_path):
    with pytest.raises(ValueError, match="model_factory"):
        watch(tmp_path, tmp_path / "o", None, method="vmlmb", max_files=0,
              depthvar_k=2)
    with pytest.raises(ValueError, match="VMLMB"):
        watch(tmp_path, tmp_path / "o", None, method="rl", max_files=0,
              depthvar_k=2, model_factory=lambda s: None)
    with pytest.raises(ValueError, match="auto_mu"):
        watch(tmp_path, tmp_path / "o", None, method="vmlmb", max_files=0,
              depthvar_k=2, model_factory=lambda s: None, auto_mu=True)


def test_watch_slices_hyperstack_channel(tmp_path):
    """A multi-channel OME input is sliced at the requested channel instead
    of being misread as a deep z-stack."""
    from microtipi_tpu.io.ome import write_ome_hyperstack

    indir, outdir = tmp_path / "in", tmp_path / "out"
    indir.mkdir()
    shape = (4, 16, 16)
    psf = np.zeros(shape, np.float32)
    psf[0, 0, 0] = 1.0
    write_stack(tmp_path / "psf.tif", psf)
    rng = np.random.default_rng(0)
    chans = np.stack([rng.random(shape).astype(np.float32) * (c + 1) for c in range(2)])
    write_ome_hyperstack(indir / "mc.ome.tif", chans[None])

    logs = []
    out = watch(indir, outdir, tmp_path / "psf.tif",
                config=DeconvolutionConfig(mu=0.0, max_iter=2),
                poll_seconds=0.05, max_files=1, log=logs.append, channel=1)
    assert len(out) == 1
    assert any("hyperstack T=1 C=2, using t=0 c=1" in m for m in logs)
    rec = read_stack(outdir / "mc.ome.tif")
    assert rec.shape == shape  # one channel volume, not 8 pages
    # Delta PSF, no regularization: solve ~ identity; result matches channel 1.
    np.testing.assert_allclose(rec, chans[1], rtol=1e-3, atol=1e-3)


def test_watch_zarr_store_in_and_out(tmp_path):
    """A .zarr directory store is picked up once its recursive size is
    stable, sliced like a hyperstack, and the result lands as an atomic
    NGFF store next to the TIFF outputs."""
    from microtipi_tpu.io.zarrstack import read_ngff_hyperstack, write_ngff_hyperstack

    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    psf, d = _mini_scene(tmp_path)
    write_ngff_hyperstack(indir / "v.zarr", d, dxy=100e-9, dz=250e-9)

    logs = []
    out = watch(indir, outdir, tmp_path / "psf.tif",
                config=DeconvolutionConfig(mu=0.001, epsilon=1.0, max_iter=6),
                poll_seconds=0.05, max_files=1, log=logs.append,
                zarr_levels=2)
    assert [p.name for p in out] == ["v.zarr"]
    rec, _meta = read_ngff_hyperstack(outdir / "v.zarr")
    assert rec.shape == (1, 1, *d.shape)
    assert np.isfinite(rec).all()
    assert not (outdir / "v.zarr.tmp").exists()
    # zarr_levels wrote the viewer pyramid into the served store
    import json

    attrs = json.loads((outdir / "v.zarr" / ".zattrs").read_text())
    assert [ds["path"] for ds in attrs["multiscales"][0]["datasets"]] == ["0", "1"]


def test_watch_multi_device_fan_out(tmp_path):
    """devices=: files round-robin across the virtual mesh's devices, all
    outputs land, and the per_device metric shows more than one device."""
    import json

    import jax

    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    psf, _ = _mini_scene(tmp_path)
    rng = np.random.default_rng(2)
    shape = psf.shape
    for i in range(6):
        o = np.abs(rng.standard_normal(shape)).astype(np.float32) * 10
        d = np.asarray(convolve(jnp.asarray(o), convolve_spectrum(jnp.asarray(psf)), shape))
        write_stack(indir / f"v{i}.tif", d)

    devices = jax.devices()[:4]
    logs = []
    out = watch(indir, outdir, tmp_path / "psf.tif",
                config=DeconvolutionConfig(mu=0.001, epsilon=1.0, max_iter=6),
                poll_seconds=0.05, max_files=6, log=logs.append,
                metrics_path=tmp_path / "m.json", devices=devices)
    assert len(out) == 6
    for i in range(6):
        rec = read_stack(outdir / f"v{i}.tif")
        assert rec.shape == shape and np.isfinite(rec).all()
    snap = json.loads((tmp_path / "m.json").read_text())
    per = snap["per_device"]
    assert sum(per.values()) == 6
    assert len(per) > 1  # genuinely fanned out


def test_watch_blind_once_calibrates_before_fan_out(tmp_path):
    """blind-once + devices: the first file calibrates alone; later files
    are served with the calibrated fixed-PSF path on every device."""
    import jax

    from microtipi_tpu.jobs.blind import BlindDeconvConfig
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig as DC
    from microtipi_tpu.jobs.psf_fit import PsfFitConfig
    from microtipi_tpu.models.microscope import PHASE
    from microtipi_tpu.models.widefield import WideFieldConfig

    shape = (4, 16, 16)
    model_cfg = dict(na=1.2, wavelength=500e-9, ni=1.33, dxy=100e-9, dz=250e-9,
                     n_phase=2, radial=True, dtype=jnp.float32)
    true = WideFieldConfig(shape=shape, **model_cfg).init_params()._replace(
        phase=jnp.asarray([0.25, -0.1], jnp.float32))

    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    rng = np.random.default_rng(3)
    m = WideFieldConfig(shape=shape, **model_cfg)
    psf = m.compute_psf(true)
    for i in range(4):
        o = np.abs(rng.standard_normal(shape)).astype(np.float32) * 10
        d = np.asarray(convolve(jnp.asarray(o), convolve_spectrum(psf), shape))
        write_stack(indir / f"s{i}.tif", d)

    bcfg = BlindDeconvConfig(
        loops=2, families=(PHASE,), psf_max_iter=(4,),
        deconv=DC(mu=1e-3, epsilon=1.0, max_iter=4, grtol=0.0),
        fit=PsfFitConfig(max_iter=4), joint_fit=True,
    )
    logs = []
    out = watch(indir, outdir, None, method="blind-once",
                config=DC(mu=1e-3, epsilon=1.0, max_iter=4),
                model_factory=lambda s: WideFieldConfig(shape=s, **model_cfg),
                blind_config=bcfg, poll_seconds=0.05, max_files=4,
                log=logs.append, devices=jax.devices()[:2])
    assert len(out) == 4
    assert any("calibrated pupil" in m_ for m_ in logs)


def test_watch_blind_once_bead_calibration(tmp_path):
    """bead_path: the pupil calibrates from the bead stack at startup; every
    sample file takes the fixed-PSF fast path with the fitted parameters."""
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig as DC
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.utils.arrays import roll

    shape = (6, 24, 24)
    model_cfg = dict(na=1.2, wavelength=500e-9, ni=1.33, dxy=100e-9, dz=250e-9,
                     n_phase=2, radial=True, dtype=jnp.float32)
    m = WideFieldConfig(shape=shape, **model_cfg)
    true = m.init_params()._replace(phase=jnp.asarray([0.3, -0.15], jnp.float32))
    psf = m.compute_psf(true)
    write_stack(tmp_path / "beads.tif",
                np.asarray(600.0 * roll(psf) + 2.0, np.float32))

    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    rng = np.random.default_rng(5)
    for i in range(2):
        o = np.abs(rng.standard_normal(shape)).astype(np.float32) * 10
        d = np.asarray(convolve(jnp.asarray(o), convolve_spectrum(psf), shape))
        write_stack(indir / f"s{i}.tif", d)

    logs = []
    out = watch(indir, outdir, None, method="blind-once",
                config=DC(mu=1e-3, epsilon=1.0, max_iter=5),
                model_factory=lambda s: WideFieldConfig(shape=s, **model_cfg),
                poll_seconds=0.05, max_files=2, log=logs.append,
                bead_path=tmp_path / "beads.tif")
    assert len(out) == 2
    cal_msgs = [m_ for m_ in logs if "calibrated pupil from bead stack" in m_]
    assert len(cal_msgs) == 1
    # the fitted phase (logged) is near the truth the bead carries
    import re

    nums = re.findall(r"'phase': \[([-0-9.e]+), ([-0-9.e]+)\]", cal_msgs[0])
    assert nums, cal_msgs[0]
    got = [float(v) for v in nums[0]]
    np.testing.assert_allclose(got, [0.3, -0.15], atol=3e-2)


def test_watch_plate_store_fans_out_wells(tmp_path):
    """A dropped NGFF plate is a batch: every well/field is solved and the
    output is a plate mirroring the input layout and zarr format."""
    from microtipi_tpu.io.plate import is_plate, read_plate_image, write_plate

    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    psf, d = _mini_scene(tmp_path)
    wells = {"A/1": [d], "B/2": [d * 0.5]}
    write_plate(indir / "p.zarr", wells, dxy=100e-9, dz=250e-9,
                zarr_format=3, compressor="zstd")

    logs = []
    out = watch(indir, outdir, tmp_path / "psf.tif",
                config=DeconvolutionConfig(mu=0.001, epsilon=1.0, max_iter=5),
                poll_seconds=0.05, max_files=1, log=logs.append)
    assert len(out) == 1 and out[0].name == "p.zarr"
    assert is_plate(outdir / "p.zarr")
    for wp in wells:
        rec, _meta = read_plate_image(outdir / "p.zarr", wp, 0)
        assert rec.shape == (1, 1, *d.shape)
        assert np.isfinite(rec).all()
    # output preserved the v3 format
    assert (outdir / "p.zarr" / "zarr.json").exists()
    assert any("plate (2 images)" in m for m in logs)


def test_watch_priority_patterns_order_within_scan(tmp_path):
    """--priority globs: matching files are processed before the backlog,
    earlier patterns first, name order within a rank."""
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    psf, d = _mini_scene(tmp_path)
    for name in ("b_bulk.tif", "a_bulk.tif", "live_2.tif", "urgent_1.tif",
                 "live_1.tif"):
        write_stack(indir / name, d)

    out = watch(indir, outdir, tmp_path / "psf.tif",
                config=DeconvolutionConfig(mu=0.001, epsilon=1.0, max_iter=3),
                poll_seconds=0.05, max_files=5,
                priority_patterns=["urgent_*", "live_*"], log=lambda *a: None)
    names = [p.name for p in out]
    assert names == ["urgent_1.tif", "live_1.tif", "live_2.tif",
                     "a_bulk.tif", "b_bulk.tif"]


def test_watch_auto_mu_calibrates_once_then_fixed(tmp_path):
    """auto_mu = the mu analog of blind-once: the first file's solve runs
    the discrepancy bisection (jobs/autotune.py), later files reuse the
    calibrated mu on the fixed-mu solver (one calibration log line)."""
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    shape = (4, 16, 16)
    psf, d = _mini_scene(tmp_path, shape)
    rng = np.random.default_rng(2)
    for i in range(3):
        write_stack(indir / f"t{i}.tif",
                    d + 0.05 * rng.standard_normal(shape).astype(np.float32))

    logs = []
    out = watch(indir, outdir, tmp_path / "psf.tif",
                config=DeconvolutionConfig(mu=0.5, epsilon=1.0, max_iter=8),
                poll_seconds=0.05, max_files=3, log=logs.append,
                auto_mu=True)
    assert len(out) == 3
    cal = [m for m in logs if "calibrated mu=" in m]
    assert len(cal) == 1 and "noise sigma" in cal[0]
    for i in range(3):
        rec = read_stack(outdir / f"t{i}.tif")
        assert rec.shape == shape and np.isfinite(rec).all()


def test_watch_auto_mu_rejects_other_methods(tmp_path):
    with pytest.raises(ValueError, match="auto_mu"):
        watch(tmp_path, tmp_path / "o", tmp_path / "psf.tif",
              method="rl", auto_mu=True)


def test_watch_auto_gain_calibrates_once_and_composes_with_auto_mu(tmp_path):
    """auto_gain: single-shot photon transfer on the first file, variance
    weights in-graph thereafter; composes with auto_mu (whose target
    becomes the positive-weight count)."""
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    shape = (4, 24, 24)
    psf = np.zeros(shape, np.float32)
    psf[0, 0, 0] = 0.6
    psf[0, 0, 1] = 0.4
    write_stack(tmp_path / "psf.tif", psf)
    rng = np.random.default_rng(4)
    o = np.abs(rng.standard_normal(shape)).astype(np.float32) * 200
    d = np.asarray(convolve(jnp.asarray(o), convolve_spectrum(jnp.asarray(psf)), shape))
    for i in range(2):
        noisy = rng.poisson(np.maximum(d, 0) * 2.0) / 2.0 \
            + rng.normal(0, 1.0, shape)
        write_stack(indir / f"t{i}.tif", noisy.astype(np.float32))

    logs = []
    out = watch(indir, outdir, tmp_path / "psf.tif",
                config=DeconvolutionConfig(mu=0.01, epsilon=1.0, max_iter=6),
                poll_seconds=0.05, max_files=2, log=logs.append,
                auto_mu=True, auto_gain=True)
    assert len(out) == 2
    assert sum("calibrated camera from first file" in m for m in logs) == 1
    assert sum("calibrated mu=" in m for m in logs) == 1
    for i in range(2):
        rec = read_stack(outdir / f"t{i}.tif")
        assert rec.shape == shape and np.isfinite(rec).all()

    with pytest.raises(ValueError, match="auto_gain"):
        watch(tmp_path, tmp_path / "o", tmp_path / "psf.tif",
              method="rl", auto_gain=True)
