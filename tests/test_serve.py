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
