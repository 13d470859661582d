"""CLI smoke tests (subprocess, CPU backend)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable, "-m", "microtipi_tpu", *args],
        capture_output=True, text=True, env=env, cwd=cwd, timeout=600,
    )


def test_cli_enables_persistent_compile_cache(tmp_path):
    """On the TPU backend every CLI command turns on JAX's disk compilation
    cache by default (axon remote compiles are minutes); on CPU the default
    stays OFF (the XLA:CPU executable serialization segfaults on some hosts
    — CLAUDE.md) but an explicit MICROTIPI_CACHE_DIR is an opt-in that
    enables it anywhere. MICROTIPI_NO_COMPILE_CACHE opts out; an explicit
    JAX_COMPILATION_CACHE_DIR wins."""
    from microtipi_tpu.io.tiffstack import write_stack

    write_stack(tmp_path / "d.tif", np.zeros((4, 16, 16), np.float32))

    def run(extra_env):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO
        env.update(extra_env)
        return subprocess.run(
            [sys.executable, "-m", "microtipi_tpu", "info", "d.tif"],
            capture_output=True, text=True, env=env, cwd=tmp_path, timeout=600,
        )

    r = run({"MICROTIPI_CACHE_DIR": str(tmp_path / "c1")})
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "c1").is_dir()

    r = run({"MICROTIPI_CACHE_DIR": str(tmp_path / "c2"),
             "MICROTIPI_NO_COMPILE_CACHE": "1"})
    assert r.returncode == 0, r.stderr
    assert not (tmp_path / "c2").exists()

    r = run({"MICROTIPI_CACHE_DIR": str(tmp_path / "c3"),
             "JAX_COMPILATION_CACHE_DIR": str(tmp_path / "c4")})
    assert r.returncode == 0, r.stderr
    assert not (tmp_path / "c3").exists()

    # no explicit dir + CPU backend: the default cache stays OFF even for
    # a compute command (`info` skips the decision entirely — it must not
    # initialize a backend just to print TIFF metadata)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env["HOME"] = str(tmp_path / "h")
    r = subprocess.run(
        [sys.executable, "-m", "microtipi_tpu", "psf", "p.tif",
         "--shape", "3", "8", "8", "--wavelength", "500e-9"],
        capture_output=True, text=True, env=env, cwd=tmp_path, timeout=600)
    assert r.returncode == 0, r.stderr
    assert not (tmp_path / "h" / ".cache" / "microtipi_tpu").exists()


def test_cli_psf_info_deconv_roundtrip(tmp_path):
    r = _run(
        ["psf", str(tmp_path / "psf.tif"), "--shape", "8", "32", "32",
         "--n-phase", "3", "--phase", "0.3", "-0.2", "0.1"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr

    r = _run(["info", str(tmp_path / "psf.tif")], tmp_path)
    assert r.returncode == 0 and "Nz=8 Ny=32 Nx=32" in r.stdout

    # blur the PSF against itself as a trivial dataset and deconvolve
    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
    import jax.numpy as jnp

    psf = jnp.asarray(read_stack(tmp_path / "psf.tif"))
    obj = np.zeros((8, 32, 32), np.float32)
    obj[3:5, 10:22, 10:22] = 50.0
    data = convolve(jnp.asarray(obj), convolve_spectrum(psf), (8, 32, 32))
    write_stack(tmp_path / "data.tif", np.asarray(data))

    r = _run(
        ["deconv", str(tmp_path / "data.tif"), "--psf", str(tmp_path / "psf.tif"),
         "--out", str(tmp_path / "rec.tif"), "--iters", "10", "--mu", "0.005"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "wrote" in r.stdout
    rec = read_stack(tmp_path / "rec.tif")
    assert rec.shape == (8, 32, 32) and np.isfinite(rec).all()


def test_cli_bad_family_rejected(tmp_path):
    r = _run(["blind", "x.tif", "--out", "y.tif", "--families", "bogus"], tmp_path)
    assert r.returncode != 0
    assert "invalid choice" in r.stderr


def test_blind_cli_quality_recipe(tmp_path):
    """--recipe quality runs the one-flag recommended recipe."""
    import jax.numpy as jnp
    from microtipi_tpu.__main__ import main
    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (8, 32, 32)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=3, radial=True)
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.15, 0.1]))
    rng = np.random.default_rng(0)
    obj = np.abs(rng.standard_normal(shape)).astype(np.float32) * 20
    d = convolve(jnp.asarray(obj), convolve_spectrum(model.compute_psf(true)), shape)
    write_stack(tmp_path / "d.tif", np.asarray(d), dxy=100e-9, dz=250e-9)
    main(["blind", str(tmp_path / "d.tif"), "--out", str(tmp_path / "o.tif"),
          "--recipe", "quality", "--loops", "2", "--iters", "5", "--psf-iters", "4",
          "--na", "1.2", "--wavelength", "500e-9", "--ni", "1.33",
          "--n-phase", "3", "--radial"])
    rec = read_stack(tmp_path / "o.tif")
    assert rec.shape == shape and np.isfinite(rec).all()


def test_recommended_config_classmethod():
    from microtipi_tpu.jobs.blind import BlindDeconvConfig

    cfg = BlindDeconvConfig.recommended(loops=3)
    assert cfg.joint_fit and cfg.init == "wiener"
    assert cfg.phase_freeze_head == 0  # pin-Z4 is an assumption, opt-in
    assert cfg.loops == 3
    # annealing schedule: strong early, base mu late
    assert cfg.mu_schedule is not None and len(cfg.mu_schedule) == 3
    assert cfg.mu_schedule[0] > cfg.mu_schedule[-1] >= cfg.deconv.mu
    pinned = BlindDeconvConfig.recommended(loops=2, pin_z4=True)
    assert pinned.phase_freeze_head == 1


def test_blind_cli_checkpoint_resume(tmp_path):
    """Checkpointed host-driven rounds resume mid-run and finish identically
    structured output."""
    import jax.numpy as jnp
    from microtipi_tpu.__main__ import main
    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
    from microtipi_tpu.utils.checkpoint import load_state

    shape = (8, 32, 32)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=3, radial=True)
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.15, 0.1]))
    rng = np.random.default_rng(1)
    obj = np.abs(rng.standard_normal(shape)).astype(np.float32) * 20
    d = convolve(jnp.asarray(obj), convolve_spectrum(model.compute_psf(true)), shape)
    # Stamp the geometry so the CLI resolves dxy/dz from metadata and its
    # model matches the hand-built one below.
    write_stack(tmp_path / "d.tif", np.asarray(d), dxy=100e-9, dz=250e-9)
    ckpt = str(tmp_path / "state.npz")
    base = ["blind", str(tmp_path / "d.tif"), "--out", str(tmp_path / "o.tif"),
            "--loops", "3", "--iters", "4", "--psf-iters", "3",
            "--na", "1.2", "--wavelength", "500e-9", "--ni", "1.33",
            "--n-phase", "3", "--radial", "--checkpoint", ckpt]
    main(base)
    _, params_full, rnd, _ = load_state(ckpt)
    assert rnd == 3
    full_phase = np.asarray(params_full.phase)

    # Simulate preemption: rewind the checkpoint to after round 1, resume.
    import jax
    from microtipi_tpu.utils.checkpoint import save_state
    from microtipi_tpu.jobs.blind import BlindDeconvConfig, blind_deconvolve
    from microtipi_tpu.jobs.deconv import DeconvolutionConfig
    from microtipi_tpu.models.microscope import DEFOCUS, PHASE
    import dataclasses
    cfg1 = BlindDeconvConfig(
        loops=1, families=(DEFOCUS, PHASE), psf_max_iter=(3, 3),
        deconv=DeconvolutionConfig(mu=0.01, epsilon=1.0, max_iter=4),
        skip_last_fit=False,
    )
    r1 = blind_deconvolve(jnp.asarray(read_stack(tmp_path / "d.tif")), model, config=cfg1)
    save_state(ckpt, np.asarray(r1.obj), r1.params, 1)
    main(base + ["--resume"])
    _, params_resumed, rnd2, _ = load_state(ckpt)
    assert rnd2 == 3
    # f32: the fused 3-round program and the per-round dispatches partition
    # differently, so agreement is to accumulated round-off, not bitwise.
    np.testing.assert_allclose(np.asarray(params_resumed.phase), full_phase, atol=1e-3)


def test_blind_cli_mesh(tmp_path):
    """--mesh runs the sharded loop (on the 8-device virtual CPU mesh here)."""
    import jax.numpy as jnp
    from microtipi_tpu.__main__ import main
    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (8, 32, 32)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=3, radial=True)
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.15, 0.1]))
    rng = np.random.default_rng(2)
    obj = np.abs(rng.standard_normal(shape)).astype(np.float32) * 20
    d = convolve(jnp.asarray(obj), convolve_spectrum(model.compute_psf(true)), shape)
    write_stack(tmp_path / "d.tif", np.asarray(d), dxy=100e-9, dz=250e-9)
    main(["blind", str(tmp_path / "d.tif"), "--out", str(tmp_path / "o.tif"),
          "--mesh", "1", "8", "--loops", "2", "--iters", "4", "--psf-iters", "3",
          "--na", "1.2", "--wavelength", "500e-9", "--ni", "1.33",
          "--n-phase", "3", "--radial"])
    rec = read_stack(tmp_path / "o.tif")
    assert rec.shape == shape and np.isfinite(rec).all()


def test_deconv_cli_mesh(tmp_path):
    import jax.numpy as jnp
    from microtipi_tpu.__main__ import main
    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (8, 32, 32)
    rng = np.random.default_rng(3)
    obj = np.abs(rng.standard_normal(shape)).astype(np.float32) * 10
    psf = np.zeros(shape, np.float32)
    psf[0, 0, 0] = 0.7
    psf[1, 0, 0] = 0.3
    d = convolve(jnp.asarray(obj), convolve_spectrum(jnp.asarray(psf)), shape)
    write_stack(tmp_path / "d.tif", np.asarray(d))
    write_stack(tmp_path / "p.tif", psf)
    main(["deconv", str(tmp_path / "d.tif"), "--psf", str(tmp_path / "p.tif"),
          "--out", str(tmp_path / "o.tif"), "--mesh", "1", "8", "--iters", "5"])
    rec = read_stack(tmp_path / "o.tif")
    assert rec.shape == shape and np.isfinite(rec).all()


def test_cli_psf_model_families(tmp_path):
    """--model selects the PSF family; every family synthesizes a valid stack."""
    from microtipi_tpu.io.tiffstack import read_stack

    outs = {}
    for model, extra in [
        ("widefield", []),
        ("gl", ["--ns", "1.33", "--depth", "5e-6"]),
        ("confocal", ["--wavelength-exc", "488e-9", "--pinhole", "150e-9"]),
        ("2p", ["--wavelength", "900e-9"]),
        ("vectorial", []),
        ("lightsheet", ["--sheet-na", "0.15", "--wavelength-exc", "488e-9"]),
    ]:
        out = tmp_path / f"{model}.tif"
        r = _run(
            ["psf", str(out), "--shape", "4", "16", "16", "--model", model,
             "--n-phase", "3", *extra],
            tmp_path,
        )
        assert r.returncode == 0, r.stderr
        v = read_stack(out)
        assert v.shape == (4, 16, 16) and np.isfinite(v).all() and v.min() >= 0
        outs[model] = v
    # the families genuinely differ
    assert np.abs(outs["widefield"] - outs["gl"]).max() > 1e-9
    assert np.abs(outs["widefield"] / outs["widefield"].sum()
                  - outs["confocal"]).max() > 1e-9


def test_cli_blind_gl_depth_family(tmp_path):
    """blind --model gl --families depth drives the DEPTH fit end to end."""
    r = _run(
        ["psf", str(tmp_path / "psf.tif"), "--shape", "4", "16", "16",
         "--model", "gl", "--depth", "3e-6", "--n-phase", "0"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    # data = that psf itself blurred onto a random object is overkill here;
    # the smoke check is that the depth family wires through the blind loop
    rng = np.random.default_rng(0)
    from microtipi_tpu.io.tiffstack import write_stack

    write_stack(tmp_path / "data.tif", rng.random((4, 16, 16)).astype(np.float32))
    r = _run(
        ["blind", str(tmp_path / "data.tif"), "--out", str(tmp_path / "out.tif"),
         "--model", "gl", "--families", "defocus", "depth", "--loops", "2",
         "--iters", "3", "--psf-iters", "2", "--n-phase", "0"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "out.tif").exists()


def test_cli_depth_family_needs_gl_model(tmp_path):
    from microtipi_tpu.io.tiffstack import write_stack

    write_stack(tmp_path / "d.tif", np.ones((2, 8, 8), np.float32))
    r = _run(
        ["blind", str(tmp_path / "d.tif"), "--out", str(tmp_path / "o.tif"),
         "--families", "depth"],
        tmp_path,
    )
    assert r.returncode != 0
    assert "requires --model gl" in r.stderr + r.stdout


def test_cli_fitpsf_recovers_bead_parameters(tmp_path):
    """fitpsf on a synthetic bead stack recovers the injected phase and
    writes params JSON + fitted PSF."""
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.utils.arrays import roll

    shape = (12, 32, 32)
    model = WideFieldConfig(shape=shape, na=1.3, wavelength=520e-9, ni=1.518,
                            dxy=90e-9, dz=220e-9, n_phase=3, dtype=jnp.float64)
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.2, 0.15]))
    # a bead at the center of a centered stack = the rolled PSF, scaled
    bead = 800.0 * np.asarray(roll(model.compute_psf(true)), np.float32)
    rng = np.random.default_rng(0)
    bead = bead + 0.5 + 0.002 * bead.max() * rng.standard_normal(shape).astype(np.float32)
    write_stack(tmp_path / "beads.tif", bead, dxy=90e-9, dz=220e-9)

    r = _run(
        ["fitpsf", str(tmp_path / "beads.tif"), "--out", str(tmp_path / "psf.tif"),
         "--params-out", str(tmp_path / "params.json"), "--n-phase", "3",
         "--na", "1.3", "--wavelength", "520e-9", "--families", "phase",
         "--iters", "80"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    params = json.loads((tmp_path / "params.json").read_text())
    assert params["dxy"] == pytest.approx(90e-9)  # geometry from metadata
    np.testing.assert_allclose(params["phase"], [0.3, -0.2, 0.15], atol=0.06)
    psf = read_stack(tmp_path / "psf.tif")
    assert psf.shape == shape and np.isfinite(psf).all()


def test_cli_deconv_depthvar_with_params_json(tmp_path):
    """fitpsf params JSON -> deconv --depthvar: the calibrated-parameter
    depth-varying workflow end to end (GL anchors, K=2)."""
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.models.gibson_lanni import GibsonLanniConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (8, 24, 24)
    model = GibsonLanniConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.518,
                              dxy=100e-9, dz=250e-9, ns=1.36, dtype=jnp.float32)
    psf = model.compute_psf(model.init_params())
    rng = np.random.default_rng(0)
    obj = (rng.random(shape) > 0.99) * rng.random(shape) * 100
    data = np.asarray(convolve(jnp.asarray(obj, jnp.float32),
                               convolve_spectrum(psf), shape))
    write_stack(tmp_path / "d.tif", data, dxy=100e-9, dz=250e-9)
    params = {"defocus": [1.518 / 500e-9, 0.0, 0.0], "phase": [], "modulus": [1.0],
              "depth": [1.36 / 500e-9, 0.0]}
    (tmp_path / "p.json").write_text(json.dumps(params))

    r = _run(
        ["deconv", "d.tif", "--out", "o.tif", "--depthvar", "2", "--model", "gl",
         "--params-json", "p.json", "--ns", "1.36", "--na", "1.2",
         "--wavelength", "500e-9", "--n-phase", "0",
         "--iters", "3", "--mu", "1e-3"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "depthvar K=2" in r.stdout
    out = read_stack(tmp_path / "o.tif")
    assert out.shape == shape and np.isfinite(out).all()


def test_cli_deconv_depthvar_honors_calibrated_z0_offset(tmp_path):
    """The ladder-fitted depth offset d0 in --params-json must change the
    anchor synthesis (regression: depth0 silently fell back to --depth)."""
    from microtipi_tpu.io.tiffstack import read_stack, write_stack

    shape = (8, 20, 20)
    rng = np.random.default_rng(14)
    write_stack(tmp_path / "d.tif",
                np.abs(rng.standard_normal(shape)).astype(np.float32) * 10,
                dxy=100e-9, dz=300e-9)
    base = {"defocus": [1.518 / 500e-9, 0.0, 0.0], "phase": [],
            "modulus": [1.0]}
    (tmp_path / "p0.json").write_text(json.dumps(
        {**base, "depth": [1.36 / 500e-9, 0.0]}))
    (tmp_path / "p5.json").write_text(json.dumps(
        {**base, "depth": [1.36 / 500e-9, 5 * 300e-9]}))
    argv = ["deconv", "d.tif", "--depthvar", "2", "--model", "gl",
            "--ns", "1.36", "--na", "1.2", "--wavelength", "500e-9",
            "--n-phase", "0", "--iters", "4", "--mu", "1e-3"]
    r0 = _run(argv + ["--out", "o0.tif", "--params-json", "p0.json"], tmp_path)
    r5 = _run(argv + ["--out", "o5.tif", "--params-json", "p5.json"], tmp_path)
    assert r0.returncode == 0, r0.stderr
    assert r5.returncode == 0, r5.stderr
    o0 = read_stack(tmp_path / "o0.tif")
    o5 = read_stack(tmp_path / "o5.tif")
    # 5 planes of extra depth = ~a wave of extra SA: the solves must differ
    assert not np.allclose(o0, o5), "calibrated d0 was ignored"


def test_cli_depthvar_requires_gl(tmp_path):
    from microtipi_tpu.io.tiffstack import write_stack

    write_stack(tmp_path / "d.tif", np.zeros((4, 16, 16), np.float32))
    r = _run(["deconv", "d.tif", "--out", "o.tif", "--depthvar", "2"], tmp_path)
    assert r.returncode != 0
    assert "--model gl" in (r.stdout + r.stderr)


def test_cli_depth_ladder_to_blind_depthvar(tmp_path):
    """fitpsf --depth-ladder (K bead stacks at known z) -> blind --depthvar
    --params-json: the calibrated depth-varying blind workflow end to end."""
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.jobs.depthvar import depth_anchor_psfs
    from microtipi_tpu.models.gibson_lanni import GibsonLanniConfig
    from microtipi_tpu.ops.depthconv import depth_weights, depth_varying_convolve

    shape = (8, 20, 20)
    model = GibsonLanniConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.518,
                              dxy=100e-9, dz=300e-9, n_phase=0, ns=1.36,
                              dtype=jnp.float32)
    p_true = model.init_params()
    ladder_z = [0.0, 7.0]
    rng = np.random.default_rng(5)
    names = []
    for zj in ladder_z:
        h = model.compute_psf(p_true._replace(
            depth=p_true.depth.at[1].set(zj * model.dz)))
        b = 1e4 * np.asarray(h) + 5.0 + rng.standard_normal(shape)
        name = f"bead_z{zj:g}.tif"
        write_stack(tmp_path / name, b.astype(np.float32))
        names.append(name)

    r = _run(
        ["fitpsf", *names, "--depth-ladder", "0", "7", "--model", "gl",
         "--ns", "1.43", "--na", "1.2", "--wavelength", "500e-9",
         "--dxy", "100e-9", "--dz", "300e-9", "--n-phase", "0",
         "--families", "depth", "--iters", "25",
         "--params-out", "ladder.json"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    doc = json.loads((tmp_path / "ladder.json").read_text())
    assert abs(doc["ns_fit"] - 1.36) < 0.02, doc["ns_fit"]
    assert len(doc["zshifts"]) == 2

    anchors = np.array([0.0, 7.0])
    stack = depth_anchor_psfs(model, p_true, anchors, depth0=0.0)
    zw = jnp.asarray(depth_weights(shape[0], anchors), jnp.float32)
    obj = (rng.random(shape) > 0.98) * rng.random(shape) * 100
    data = np.asarray(depth_varying_convolve(
        jnp.asarray(obj, jnp.float32),
        jnp.fft.rfftn(stack, axes=(1, 2, 3)), zw, shape))
    write_stack(tmp_path / "d.tif", data, dxy=100e-9, dz=300e-9)
    r = _run(
        ["blind", "d.tif", "--out", "o.tif", "--depthvar", "2",
         "--model", "gl", "--params-json", "ladder.json",
         "--ns", "1.43", "--na", "1.2", "--wavelength", "500e-9",
         "--dxy", "100e-9", "--dz", "300e-9", "--n-phase", "0",
         "--families", "defocus", "--loops", "2", "--iters", "3",
         "--psf-iters", "2", "--mu", "1e-3",
         "--psf-out", "p.tif", "--params-out", "bp.json"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "blind[depthvar K=2]" in r.stdout
    # the ladder ns rode in through --params-json
    bp = json.loads((tmp_path / "bp.json").read_text())
    assert abs(bp["depth"][0] * 500e-9 - doc["ns_fit"]) < 1e-6
    out = read_stack(tmp_path / "o.tif")
    assert out.shape == shape and np.isfinite(out).all()
    # one PSF file per anchor
    assert (tmp_path / "p_a0.tif").exists() and (tmp_path / "p_a1.tif").exists()


def test_cli_tiled_depthvar_space_variant(tmp_path):
    """deconv --tile --depthvar K --params-json: the fully space-variant
    solve (lateral tiles x absolute-depth anchor stacks) end to end."""
    from microtipi_tpu.io.tiffstack import read_stack, write_stack

    shape = (8, 32, 32)
    rng = np.random.default_rng(9)
    write_stack(tmp_path / "d.tif",
                np.abs(rng.standard_normal(shape)).astype(np.float32) * 10,
                dxy=100e-9, dz=300e-9)
    params = {"defocus": [1.518 / 500e-9, 0.0, 0.0], "phase": [],
              "modulus": [1.0], "depth": [1.36 / 500e-9, 0.0]}
    (tmp_path / "p.json").write_text(json.dumps(params))
    r = _run(
        ["deconv", "d.tif", "--out", "o.tif", "--tile", "8", "24", "24",
         "--overlap", "4", "--depthvar", "2", "--model", "gl",
         "--params-json", "p.json", "--ns", "1.36", "--na", "1.2",
         "--wavelength", "500e-9", "--n-phase", "0",
         "--iters", "3", "--mu", "1e-3"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "depthvar K=2" in r.stdout
    out = read_stack(tmp_path / "o.tif")
    assert out.shape == shape and np.isfinite(out).all()


def test_cli_nonfinite_input_voxels_zeroed_with_warning(tmp_path):
    """A TIFF with NaN/Inf voxels (dead pixels, corruption) must solve to a
    finite result with a warning, not silently return a NaN volume."""
    from microtipi_tpu.io.tiffstack import read_stack, write_stack

    shape = (4, 16, 16)
    rng = np.random.default_rng(15)
    d = np.abs(rng.standard_normal(shape)).astype(np.float32) * 10
    d[1, 2, 3] = np.nan
    d[2, 3, 4] = np.inf
    write_stack(tmp_path / "d.tif", d)
    psf = np.zeros(shape, np.float32)
    psf[0, 0, 0] = 0.6
    psf[0, 0, 1] = 0.4
    write_stack(tmp_path / "p.tif", psf)
    r = _run(["deconv", "d.tif", "--psf", "p.tif", "--out", "o.tif",
              "--iters", "4", "--mu", "1e-3"], tmp_path)
    assert r.returncode == 0, r.stderr
    assert "non-finite voxel" in r.stdout
    out = read_stack(tmp_path / "o.tif")
    assert np.isfinite(out).all()
    # the RL path (no weights) survives too
    r = _run(["deconv", "d.tif", "--psf", "p.tif", "--out", "orl.tif",
              "--method", "rl", "--iters", "4"], tmp_path)
    assert r.returncode == 0, r.stderr
    assert np.isfinite(read_stack(tmp_path / "orl.tif")).all()


def test_cli_multiple_stacks_need_depth_ladder(tmp_path):
    from microtipi_tpu.io.tiffstack import write_stack

    write_stack(tmp_path / "a.tif", np.zeros((4, 16, 16), np.float32))
    write_stack(tmp_path / "b.tif", np.zeros((4, 16, 16), np.float32))
    r = _run(["fitpsf", "a.tif", "b.tif"], tmp_path)
    assert r.returncode != 0
    assert "--depth-ladder" in (r.stdout + r.stderr)


def test_cli_deconv_requires_psf_or_depthvar(tmp_path):
    from microtipi_tpu.io.tiffstack import write_stack

    write_stack(tmp_path / "d.tif", np.zeros((4, 16, 16), np.float32))
    r = _run(["deconv", "d.tif", "--out", "o.tif"], tmp_path)
    assert r.returncode != 0
    assert "--psf is required" in (r.stdout + r.stderr)


def test_cli_deconv_tiled(tmp_path):
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (8, 40, 40)
    rng = np.random.default_rng(0)
    psf = np.zeros(shape, np.float32)
    psf[:2, :2, :2] = rng.random((2, 2, 2))
    psf /= psf.sum()
    obj = (rng.random(shape) > 0.99) * rng.random(shape) * 100
    data = np.asarray(convolve(jnp.asarray(obj, jnp.float32),
                               convolve_spectrum(jnp.asarray(psf)), shape))
    write_stack(tmp_path / "d.tif", data)
    write_stack(tmp_path / "psf.tif", psf)
    r = _run(
        ["deconv", "d.tif", "--psf", "psf.tif", "--out", "o.tif",
         "--tile", "8", "24", "24", "--overlap", "0", "6", "6",
         "--tile-batch", "2", "--iters", "4", "--mu", "1e-3"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "tiled (8, 24, 24)+(0, 6, 6)" in r.stdout
    out = read_stack(tmp_path / "o.tif")
    assert out.shape == shape and np.isfinite(out).all()

    # per-axis overlap takes exactly one or three values
    r = _run(
        ["deconv", "d.tif", "--psf", "psf.tif", "--out", "o2.tif",
         "--tile", "8", "24", "24", "--overlap", "6", "6",
         "--iters", "2", "--mu", "1e-3"],
        tmp_path,
    )
    assert r.returncode != 0
    assert "one value or three" in (r.stdout + r.stderr)

    # --gain weights stay host-side on the --tile path (round-3 review fix:
    # a full-volume device weights array defeats the host-side streaming)
    r = _run(
        ["deconv", "d.tif", "--psf", "psf.tif", "--out", "og.tif",
         "--tile", "8", "24", "24", "--overlap", "0", "6", "6",
         "--gain", "2.0", "--readout", "1.0", "--iters", "3", "--mu", "1e-3"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    outg = read_stack(tmp_path / "og.tif")
    assert outg.shape == shape and np.isfinite(outg).all()

    # --auto-mu is rejected instead of silently ignored (the guard must
    # run BEFORE the tile branch returns — round-3 review fix)
    r = _run(
        ["deconv", "d.tif", "--psf", "psf.tif", "--out", "x.tif",
         "--tile", "8", "24", "24", "--auto-mu", "--iters", "2"],
        tmp_path,
    )
    assert r.returncode != 0
    assert "auto-mu" in (r.stdout + r.stderr)


def test_cli_deconv_all_channels(tmp_path):
    """deconv --all-channels: joint chromatic solve over a 2-channel OME
    hyperstack — per-channel PSFs synthesized at each channel's OME
    emission wavelength, output a (1, C, Z, Y, X) hyperstack."""
    import jax
    import jax.numpy as jnp

    from microtipi_tpu.io.ome import read_ome_hyperstack, write_ome_hyperstack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    vol = (6, 24, 24)
    kw = dict(shape=vol, na=1.3, ni=1.518, dxy=100e-9, dz=250e-9,
              n_phase=0, radial=True, dtype=jnp.float32)
    lams = (488e-9, 647e-9)
    psfs = [WideFieldConfig(wavelength=l, **kw) for l in lams]
    psfs = [m.compute_psf(m.init_params()) for m in psfs]
    rng = np.random.default_rng(0)
    obj = np.zeros(vol, np.float32)
    obj[2:4, 6:18, 6:18] = 80.0
    data = np.stack([
        np.asarray(convolve(jnp.asarray(obj * s), convolve_spectrum(p), vol))
        for s, p in zip((1.0, 0.3), psfs)
    ])
    write_ome_hyperstack(tmp_path / "d.ome.tif", data[None],
                         dxy=100e-9, dz=250e-9,
                         emission_wavelengths=list(lams))

    r = _run(
        ["deconv", "d.ome.tif", "--all-channels", "--out", "o.ome.tif",
         "--na", "1.3", "--ni", "1.518", "--radial",
         "--mu", "1e-3", "--iters", "5"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "per-channel emission wavelengths [nm]: [488.0, 647.0]" in r.stdout
    assert "deconv[channels C=2, joint vmlmb]" in r.stdout
    out, _meta = read_ome_hyperstack(tmp_path / "o.ome.tif")
    assert out.shape == (1, 2) + vol and np.isfinite(out).all()

    # --method admm: the round-4 engine on the same coupled objective
    r = _run(
        ["deconv", "d.ome.tif", "--all-channels", "--out", "oa.ome.tif",
         "--na", "1.3", "--ni", "1.518", "--radial",
         "--mu", "1e-3", "--iters", "5", "--method", "admm"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "deconv[channels C=2, joint admm]" in r.stdout
    out_a, _ = read_ome_hyperstack(tmp_path / "oa.ome.tif")
    assert out_a.shape == (1, 2) + vol and np.isfinite(out_a).all()

    # --mixing: joint spectral unmixing of a crosstalk acquisition; the
    # output holds the K dye volumes
    mixed = np.einsum("ck,kzyx->czyx",
                      np.array([[0.85, 0.25], [0.15, 0.75]], np.float32), data)
    write_ome_hyperstack(tmp_path / "dm.ome.tif", mixed[None],
                         dxy=100e-9, dz=250e-9,
                         emission_wavelengths=list(lams))
    r = _run(
        ["deconv", "dm.ome.tif", "--all-channels", "--out", "om.ome.tif",
         "--mixing", "0.85,0.25;0.15,0.75",
         "--na", "1.3", "--ni", "1.518", "--radial",
         "--mu", "1e-3", "--iters", "5"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "deconv[channels C=2 -> K=2 dyes, joint vmlmb]" in r.stdout
    outm, _ = read_ome_hyperstack(tmp_path / "om.ome.tif")
    assert outm.shape == (1, 2) + vol and np.isfinite(outm).all()
    # dye 1 was 0.3x dim; the unmixed dye volumes must be closer to the
    # per-channel solve of the UNMIXED data than the mixed input is
    assert float(np.abs(outm[0] - out[0]).mean()) < float(
        np.abs(mixed - out[0]).mean())

    # shape and flag validation
    r = _run(["deconv", "dm.ome.tif", "--all-channels", "--out", "x.ome.tif",
              "--mixing", "0.85,0.25", "--na", "1.3", "--ni", "1.518",
              "--radial", "--iters", "2"], tmp_path)
    assert r.returncode != 0 and "--mixing" in (r.stdout + r.stderr)

    # channels without OME EmissionWavelength and no --wavelength must be
    # a hard error, not a silent shared default-wavelength PSF (round-3
    # review fix: _resolve_geometry's 561 nm default made this unreachable)
    write_ome_hyperstack(tmp_path / "nowl.ome.tif", data[None],
                         dxy=100e-9, dz=250e-9)
    r = _run(["deconv", "nowl.ome.tif", "--all-channels", "--out",
              "x2.ome.tif", "--na", "1.3", "--ni", "1.518", "--radial",
              "--iters", "2"], tmp_path)
    assert r.returncode != 0
    assert "EmissionWavelength" in (r.stdout + r.stderr)
    r = _run(["deconv", "dm.ome.tif", "--out", "x.ome.tif",
              "--mixing", "0.85,0.25;0.15,0.75", "--iters", "2",
              "--psf", "unused.tif"], tmp_path)
    assert r.returncode != 0 and "--all-channels" in (r.stdout + r.stderr)

    # one broadcast PSF from a file + separate coupling
    from microtipi_tpu.io.tiffstack import write_stack

    write_stack(tmp_path / "psf.tif", np.asarray(psfs[0]))
    r = _run(
        ["deconv", "d.ome.tif", "--all-channels", "--coupling", "separate",
         "--psf", "psf.tif", "--out", "o2.ome.tif",
         "--mu", "1e-3", "--iters", "3"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "deconv[channels C=2, separate vmlmb]" in r.stdout

    # single-channel input is an error, not a silent one-channel solve
    write_ome_hyperstack(tmp_path / "one.ome.tif", data[None, :1],
                         dxy=100e-9, dz=250e-9)
    r = _run(["deconv", "one.ome.tif", "--all-channels", "--psf", "psf.tif",
              "--out", "o3.ome.tif"], tmp_path)
    assert r.returncode != 0 and "SizeC=1" in (r.stdout + r.stderr)


def test_cli_deconv_timeseries_all_channels(tmp_path):
    """deconv --mu-t --all-channels: the full (T, C) 5D joint solve —
    chromatic PSFs, drift estimated on the brightest channel, per-channel
    bleach gains, (T, C, Z, Y, X) hyperstack out."""
    import jax
    import jax.numpy as jnp

    from microtipi_tpu.io.ome import read_ome_hyperstack, write_ome_hyperstack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    vol = (6, 24, 24)
    kw = dict(shape=vol, na=1.3, ni=1.518, dxy=100e-9, dz=250e-9,
              n_phase=0, radial=True, dtype=jnp.float32)
    lams = (488e-9, 647e-9)
    psfs = [WideFieldConfig(wavelength=l, **kw) for l in lams]
    psfs = [m.compute_psf(m.init_params()) for m in psfs]
    obj = np.zeros(vol, np.float32)
    obj[2:4, 6:18, 6:18] = 80.0
    frames = []
    for t, fade in enumerate((1.0, 0.85, 0.7)):
        frames.append(np.stack([
            fade * np.asarray(convolve(jnp.asarray(obj * s),
                                       convolve_spectrum(p), vol))
            for s, p in zip((1.0, 0.3), psfs)
        ]))
    block = np.stack(frames)  # (T=3, C=2) + vol
    write_ome_hyperstack(tmp_path / "d.ome.tif", block,
                         dxy=100e-9, dz=250e-9,
                         emission_wavelengths=list(lams))

    r = _run(
        ["deconv", "d.ome.tif", "--all-channels", "--mu-t", "0.1",
         "--register-t", "--bleach-correct", "--out", "o.ome.tif",
         "--na", "1.3", "--ni", "1.518", "--radial",
         "--mu", "1e-3", "--iters", "4"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "bleach gains (relative to frame 0, per channel):" in r.stdout
    assert "deconv[timeseries T=3 x channels C=2, joint vmlmb]" in r.stdout
    out, _meta = read_ome_hyperstack(tmp_path / "o.ome.tif")
    assert out.shape == block.shape and np.isfinite(out).all()

    # --method admm: the round-4 engine on the full 5D objective
    # (bleach composes via the data prox)
    r = _run(
        ["deconv", "d.ome.tif", "--all-channels", "--mu-t", "0.1",
         "--register-t", "--bleach-correct", "--out", "oa.ome.tif",
         "--na", "1.3", "--ni", "1.518", "--radial",
         "--mu", "1e-3", "--iters", "4", "--method", "admm"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "deconv[timeseries T=3 x channels C=2, joint admm]" in r.stdout
    out_a, _ = read_ome_hyperstack(tmp_path / "oa.ome.tif")
    assert out_a.shape == block.shape and np.isfinite(out_a).all()

    # --gain/--readout build inverse-variance weights on the 5D path too
    # (round-3 review fix: they were silently ignored)
    r = _run(
        ["deconv", "d.ome.tif", "--all-channels", "--mu-t", "0.1",
         "--gain", "2.0", "--readout", "1.0", "--out", "ow.ome.tif",
         "--na", "1.3", "--ni", "1.518", "--radial",
         "--mu", "1e-3", "--iters", "3"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    outw, _ = read_ome_hyperstack(tmp_path / "ow.ome.tif")
    assert outw.shape == block.shape and np.isfinite(outw).all()
    # a different noise model must change the solution
    assert not np.allclose(outw, out)

    # --mixing composes with the 5D solve (dye volumes out; bleach-correct
    # is rejected under unmixing — gains are per dye)
    r = _run(
        ["deconv", "d.ome.tif", "--all-channels", "--mu-t", "0.1",
         "--mixing", "0.9,0.1;0.1,0.9", "--out", "od.ome.tif",
         "--na", "1.3", "--ni", "1.518", "--radial",
         "--mu", "1e-3", "--iters", "3"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "C=2 -> K=2 dyes" in r.stdout
    outd, _ = read_ome_hyperstack(tmp_path / "od.ome.tif")
    assert outd.shape == block.shape and np.isfinite(outd).all()
    r = _run(
        ["deconv", "d.ome.tif", "--all-channels", "--mu-t", "0.1",
         "--mixing", "0.9,0.1;0.1,0.9", "--bleach-correct",
         "--out", "x.ome.tif", "--na", "1.3", "--ni", "1.518", "--radial",
         "--iters", "2"],
        tmp_path,
    )
    assert r.returncode != 0
    assert "--bleach-correct" in (r.stdout + r.stderr)


def test_cli_h5_roundtrip(tmp_path):
    """deconv reads an HDF5 input and writes an HDF5 output by extension."""
    import jax.numpy as jnp

    pytest.importorskip("h5py")
    from microtipi_tpu.io.hdf5stack import read_h5, write_h5
    from microtipi_tpu.io.tiffstack import write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (6, 24, 24)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.518,
                            dxy=100e-9, dz=200e-9, dtype=jnp.float32)
    psf = model.compute_psf(model.init_params())
    rng = np.random.default_rng(0)
    obj = rng.random(shape).astype(np.float32) * 50
    data = np.asarray(convolve(jnp.asarray(obj), convolve_spectrum(psf), shape))
    write_h5(tmp_path / "d.h5", data)
    write_stack(tmp_path / "psf.tif", np.asarray(psf))
    r = _run(["deconv", "d.h5", "--psf", "psf.tif", "--out", "o.h5",
              "--iters", "3", "--mu", "1e-3"], tmp_path)
    assert r.returncode == 0, r.stderr
    out = read_h5(tmp_path / "o.h5")
    assert out.shape == shape and np.isfinite(out).all()


def test_cli_info_bdv(tmp_path):
    pytest.importorskip("h5py")
    from microtipi_tpu.io.hdf5stack import write_bdv

    write_bdv(tmp_path / "v.h5", np.zeros((8, 32, 32), np.float32), levels=2)
    r = _run(["info", "v.h5"], tmp_path)
    assert r.returncode == 0, r.stderr
    assert "BigDataViewer pyramid" in r.stdout and "level 1" in r.stdout


def test_cli_deconv_report_json(tmp_path):
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig

    shape = (4, 16, 16)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.518,
                            dxy=100e-9, dz=200e-9, dtype=jnp.float32)
    psf = np.asarray(model.compute_psf(model.init_params()))
    write_stack(tmp_path / "d.tif", np.abs(np.random.default_rng(0).standard_normal(shape)).astype(np.float32))
    write_stack(tmp_path / "psf.tif", psf)
    r = _run(["deconv", "d.tif", "--psf", "psf.tif", "--out", "o.tif",
              "--iters", "3", "--report", "rep.json"], tmp_path)
    assert r.returncode == 0, r.stderr
    rep = json.loads((tmp_path / "rep.json").read_text())
    assert rep["iterations"] >= 1
    assert len(rep["f_history"]) == rep["iterations"] + 1
    assert rep["f_history"][-1] <= rep["f_history"][0]


def test_cli_fuse_multiview(tmp_path):
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (8, 16, 16)
    rng = np.random.default_rng(0)

    def line_kernel(axis, length=5):
        k = np.zeros(shape, np.float32)
        for i in range(-(length // 2), length // 2 + 1):
            j = [0, 0, 0]
            j[axis] = i % shape[axis]
            k[tuple(j)] = 1.0
        return k / k.sum()

    ks = [line_kernel(0), line_kernel(2)]
    obj = np.zeros(shape, np.float32)
    obj[rng.integers(2, 6, 8), rng.integers(2, 14, 8), rng.integers(2, 14, 8)] = 50.0
    for i, k in enumerate(ks):
        v = np.asarray(convolve(jnp.asarray(obj), convolve_spectrum(jnp.asarray(k)), shape))
        write_stack(tmp_path / f"v{i}.tif", v)
        write_stack(tmp_path / f"k{i}.tif", k)
    r = _run(["fuse", "v0.tif", "v1.tif", "--psf", "k0.tif", "k1.tif",
              "--out", "fused.tif", "--iters", "20"], tmp_path)
    assert r.returncode == 0, r.stderr
    out = read_stack(tmp_path / "fused.tif")
    assert out.shape == shape and np.isfinite(out).all() and out.min() >= 0

    r2 = _run(["fuse", "v0.tif", "--psf", "k0.tif", "k1.tif",
               "--out", "x.tif"], tmp_path)
    assert r2.returncode != 0 and "one PSF per view" in (r2.stdout + r2.stderr)


def test_cli_fuse_with_registration(tmp_path):
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
    from microtipi_tpu.ops.register import fourier_shift

    shape = (8, 16, 16)
    rng = np.random.default_rng(1)

    def line_kernel(axis, length=5):
        k = np.zeros(shape, np.float32)
        for i in range(-(length // 2), length // 2 + 1):
            j = [0, 0, 0]
            j[axis] = i % shape[axis]
            k[tuple(j)] = 1.0
        return k / k.sum()

    ks = [line_kernel(0), line_kernel(2)]
    obj = np.zeros(shape, np.float32)
    obj[rng.integers(2, 6, 8), rng.integers(2, 14, 8), rng.integers(2, 14, 8)] = 50.0
    views = [np.asarray(convolve(jnp.asarray(obj), convolve_spectrum(jnp.asarray(k)), shape))
             for k in ks]
    views[1] = np.asarray(fourier_shift(jnp.asarray(views[1]), [1.0, -2.0, 2.0]))
    for i in range(2):
        write_stack(tmp_path / f"v{i}.tif", views[i])
        write_stack(tmp_path / f"k{i}.tif", ks[i])
    r = _run(["fuse", "v0.tif", "v1.tif", "--psf", "k0.tif", "k1.tif",
              "--out", "fused.tif", "--iters", "20", "--register"], tmp_path)
    assert r.returncode == 0, r.stderr
    assert "view 1: shift" in r.stdout
    # The printed shift undoes the injected [1, -2, 2] displacement.
    import re as _re

    m = _re.search(r"view 1: shift \[([-0-9., ]+)\]", r.stdout)
    t = [float(v) for v in m.group(1).split(",")]
    np.testing.assert_allclose(t, [-1.0, 2.0, -2.0], atol=0.3)
    out = read_stack(tmp_path / "fused.tif")
    assert np.isfinite(out).all()


def test_cli_blind_params_json_anchor(tmp_path):
    """blind --params-json starts the loop from calibrated parameters."""
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (8, 16, 16)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=2, radial=True,
                            dtype=jnp.float32)
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.15], jnp.float32))
    psf = model.compute_psf(true)
    rng = np.random.default_rng(0)
    obj = np.abs(rng.standard_normal(shape)).astype(np.float32) * 10
    data = np.asarray(convolve(jnp.asarray(obj), convolve_spectrum(psf), shape))
    write_stack(tmp_path / "d.tif", data)
    calib = {"defocus": [1.33 / 500e-9, 0.0, 0.0], "phase": [0.3, -0.15],
             "modulus": [1.0]}
    (tmp_path / "calib.json").write_text(json.dumps(calib))

    # Zero fit budget: the solve must USE the anchored parameters as-is.
    r = _run(["blind", "d.tif", "--out", "o.tif", "--params-json", "calib.json",
              "--params-out", "fitted.json",
              "--loops", "1", "--iters", "4", "--psf-iters", "0",
              "--n-phase", "2", "--radial", "--na", "1.2", "--ni", "1.33",
              "--wavelength", "500e-9", "--dxy", "100e-9", "--dz", "250e-9"],
             tmp_path)
    assert r.returncode == 0, r.stderr
    fitted = json.loads((tmp_path / "fitted.json").read_text())
    np.testing.assert_allclose(fitted["phase"], [0.3, -0.15], atol=1e-6)


def test_cli_blind_bead_anchor(tmp_path):
    """blind --bead: the bead stack's structural anchor pins the fitted
    phase at the truth it carries."""
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
    from microtipi_tpu.utils.arrays import roll

    shape = (8, 16, 16)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=2, radial=True,
                            dtype=jnp.float32)
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.15], jnp.float32))
    psf = model.compute_psf(true)
    rng = np.random.default_rng(0)
    obj = np.abs(rng.standard_normal(shape)).astype(np.float32) * 10
    data = np.asarray(convolve(jnp.asarray(obj), convolve_spectrum(psf), shape))
    write_stack(tmp_path / "d.tif", data)
    bead = np.asarray(500.0 * roll(psf) + 2.0, np.float32)
    write_stack(tmp_path / "bead.tif", bead)

    r = _run(["blind", "d.tif", "--out", "o.tif", "--bead", "bead.tif",
              "--bead-weight", "1e4", "--params-out", "fitted.json",
              "--loops", "2", "--iters", "4", "--psf-iters", "6", "--joint-fit",
              "--n-phase", "2", "--radial", "--na", "1.2", "--ni", "1.33",
              "--wavelength", "500e-9", "--dxy", "100e-9", "--dz", "250e-9"],
             tmp_path)
    assert r.returncode == 0, r.stderr
    fitted = json.loads((tmp_path / "fitted.json").read_text())
    np.testing.assert_allclose(fitted["phase"], [0.3, -0.15], atol=3e-2)


def test_cli_fitpsf_n_beads(tmp_path):
    """fitpsf --n-beads averages the detected beads before the fit."""
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.utils.arrays import roll

    patch = (6, 24, 24)
    model = WideFieldConfig(shape=patch, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=2, radial=True,
                            dtype=jnp.float32)
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.15], jnp.float32))
    h = np.asarray(roll(model.compute_psf(true)))
    rng = np.random.default_rng(0)
    stack = np.zeros((6, 96, 96), np.float32)
    for (y, x) in [(24, 24), (24, 70), (70, 40)]:
        stack[:, y - 12:y + 12, x - 12:x + 12] += rng.uniform(5000, 9000) * h
    stack += 3.0 + 0.5 * rng.standard_normal(stack.shape).astype(np.float32)
    write_stack(tmp_path / "beads.tif", stack)

    r = _run(["fitpsf", "beads.tif", "--params-out", "cal.json",
              "--n-beads", "4", "--bead-patch", "6", "24", "24",
              "--families", "phase", "--iters", "40",
              "--n-phase", "2", "--radial", "--na", "1.2", "--ni", "1.33",
              "--wavelength", "500e-9", "--dxy", "100e-9", "--dz", "250e-9"],
             tmp_path)
    assert r.returncode == 0, r.stderr
    assert "averaged 3 beads" in r.stdout
    cal = json.loads((tmp_path / "cal.json").read_text())
    np.testing.assert_allclose(cal["phase"], [0.3, -0.15], atol=0.08)


def test_cli_fitpsf_uncertainty_and_sheet_family(tmp_path):
    """fitpsf --uncertainty reports error bars (std in the JSON), and the
    lightsheet SHEET family round-trips through --params-out (every params
    field is exported generically, not a hard-coded subset)."""
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import write_stack
    from microtipi_tpu.models.lightsheet import LightSheetConfig
    from microtipi_tpu.utils.arrays import roll

    shape = (12, 24, 24)
    model = LightSheetConfig(shape=shape, na=0.8, wavelength=520e-9, ni=1.33,
                             dxy=150e-9, dz=400e-9, sheet_na=0.15,
                             wavelength_exc=488e-9, n_phase=2, radial=True,
                             dtype=jnp.float32)
    true = model.init_params()._replace(
        sheet=jnp.asarray([0.1e-6, 1.2 * model.waist], jnp.float32))
    bead = 2e3 * np.asarray(roll(model.compute_psf(true)), np.float32)
    rng = np.random.default_rng(0)
    bead = bead + 0.02 * bead.max() * rng.standard_normal(shape).astype(np.float32)
    write_stack(tmp_path / "beads.tif", bead, dxy=150e-9, dz=400e-9)

    r = _run(
        ["fitpsf", str(tmp_path / "beads.tif"),
         "--params-out", str(tmp_path / "params.json"),
         "--model", "lightsheet", "--sheet-na", "0.15",
         "--wavelength-exc", "488e-9", "--na", "0.8", "--wavelength", "520e-9",
         "--ni", "1.33", "--n-phase", "2", "--radial",
         "--families", "defocus", "sheet", "--iters", "40", "--uncertainty"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    doc = json.loads((tmp_path / "params.json").read_text())
    assert "sheet" in doc, "SHEET family must be exported"
    np.testing.assert_allclose(doc["sheet"][1], 1.2 * model.waist, rtol=0.1)
    assert "std" in doc and "sheet" in doc["std"]
    stds = np.asarray(doc["std"]["sheet"])
    assert stds.shape == (2,) and (stds > 0).all() and np.isfinite(stds).all()
    # error bars are small next to the fitted values (bright bead)
    assert stds[1] < 0.1 * abs(doc["sheet"][1])
    assert "+-" in r.stdout and "sigma" in r.stdout


def test_cli_deconv_field_varying_tiled(tmp_path):
    """deconv --tile --field-json: per-tile PSFs interpolated from scattered
    calibration JSONs (fitpsf output + a position entry)."""
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    vol = (6, 24, 48)
    tile = (6, 24, 24)
    model = WideFieldConfig(shape=tile, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=2, radial=True,
                            dtype=jnp.float32)
    p0 = model.init_params()
    rng = np.random.default_rng(0)
    obj = np.zeros(vol, np.float32)
    obj[1:5, 4:20, 4:20] = 50.0
    obj[2:5, 6:18, 28:44] = 80.0
    data = np.zeros(vol, np.float32)
    phases = {12.0: [0.2, -0.1], 36.0: [0.9, -0.4]}
    for i, (x, ph) in enumerate(phases.items()):
        h = model.compute_psf(p0._replace(phase=jnp.asarray(ph, jnp.float32)))
        strip = jnp.asarray(obj[:, :, 24*i:24*(i+1)])
        data[:, :, 24*i:24*(i+1)] = np.asarray(
            convolve(strip, convolve_spectrum(h), tile))
    write_stack(tmp_path / "d.tif", data, dxy=100e-9, dz=250e-9)
    for i, (x, ph) in enumerate(phases.items()):
        (tmp_path / f"cal{i}.json").write_text(json.dumps(
            {"position": [12.0, x], "phase": ph, "model": "widefield"}))

    r = _run(
        ["deconv", str(tmp_path / "d.tif"), "--out", str(tmp_path / "o.tif"),
         "--tile", "6", "24", "24", "--overlap", "0",
         "--field-json", str(tmp_path / "cal0.json"), str(tmp_path / "cal1.json"),
         "--na", "1.2", "--wavelength", "500e-9", "--ni", "1.33",
         "--n-phase", "2", "--radial", "--iters", "20", "--mu", "2e-3"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    rec = read_stack(tmp_path / "o.tif")
    assert rec.shape == vol and np.isfinite(rec).all()
    # the aberrated right half must deconvolve with its local PSF: better
    # than the raw data by a clear margin
    err_rec = np.linalg.norm(rec[:, :, 24:] - obj[:, :, 24:])
    err_raw = np.linalg.norm(data[:, :, 24:] - obj[:, :, 24:])
    assert err_rec < 0.8 * err_raw

    # position entry missing -> helpful failure
    (tmp_path / "bad.json").write_text(json.dumps({"phase": [0.1, 0.0]}))
    r = _run(
        ["deconv", str(tmp_path / "d.tif"), "--out", str(tmp_path / "o2.tif"),
         "--tile", "6", "24", "24", "--field-json", str(tmp_path / "bad.json"),
         "--na", "1.2", "--wavelength", "500e-9", "--ni", "1.33",
         "--n-phase", "2", "--radial"],
        tmp_path,
    )
    assert r.returncode != 0 and "position" in (r.stderr + r.stdout)


def test_cli_field_calibration_to_field_deconv(tmp_path):
    """The full field-varying workflow: fitpsf --field-out detects beads
    across the slide, fits each into a position-tagged anchor, and deconv
    --tile --field-json consumes the combined anchors file directly."""
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
    from microtipi_tpu.utils.arrays import roll

    patch = (6, 24, 24)
    vol = (6, 48, 96)
    model = WideFieldConfig(shape=patch, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=2, radial=True,
                            dtype=jnp.float32)
    p0 = model.init_params()
    phases = {24.0: [0.3, -0.1], 72.0: [-0.15, 0.2]}
    slide = np.zeros(vol, np.float32)
    for x0, ph in phases.items():
        bead = 3000.0 * np.asarray(roll(model.compute_psf(
            p0._replace(phase=jnp.asarray(ph, jnp.float32)))), np.float32)
        slide[:, 12:36, int(x0) - 12:int(x0) + 12] += bead
    slide += 1.0
    write_stack(tmp_path / "slide.tif", slide, dxy=100e-9, dz=250e-9)

    r = _run(
        ["fitpsf", str(tmp_path / "slide.tif"), "--field-out",
         str(tmp_path / "anchors.json"), "--n-beads", "2",
         "--bead-patch", "6", "24", "24",
         "--na", "1.2", "--wavelength", "500e-9", "--ni", "1.33",
         "--n-phase", "2", "--radial", "--families", "phase", "--iters", "30"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    doc = json.loads((tmp_path / "anchors.json").read_text())
    assert len(doc["anchors"]) == 2
    for entry in doc["anchors"]:
        true_x = min(phases, key=lambda t: abs(t - entry["position"][1]))
        np.testing.assert_allclose(entry["phase"], phases[true_x], atol=0.06)

    # consume the anchors in a field-varying tiled solve
    data = np.zeros(vol, np.float32)
    obj = np.zeros(vol, np.float32)
    obj[1:5, 10:38, 6:90] = 40.0
    tile = (6, 48, 48)
    model_t = WideFieldConfig(shape=tile, na=1.2, wavelength=500e-9, ni=1.33,
                              dxy=100e-9, dz=250e-9, n_phase=2, radial=True,
                              dtype=jnp.float32)
    for i, ph in enumerate(phases.values()):
        h = model_t.compute_psf(model_t.init_params()._replace(
            phase=jnp.asarray(ph, jnp.float32)))
        s = jnp.asarray(obj[:, :, 48*i:48*(i+1)])
        data[:, :, 48*i:48*(i+1)] = np.asarray(convolve(s, convolve_spectrum(h), tile))
    write_stack(tmp_path / "d.tif", data, dxy=100e-9, dz=250e-9)
    r = _run(
        ["deconv", str(tmp_path / "d.tif"), "--out", str(tmp_path / "o.tif"),
         "--tile", "6", "48", "48", "--overlap", "0",
         "--field-json", str(tmp_path / "anchors.json"),
         "--na", "1.2", "--wavelength", "500e-9", "--ni", "1.33",
         "--n-phase", "2", "--radial", "--iters", "15", "--mu", "2e-3"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    rec = read_stack(tmp_path / "o.tif")
    assert rec.shape == vol and np.isfinite(rec).all()
    assert np.linalg.norm(rec - obj) < 0.9 * np.linalg.norm(data - obj)


def test_cli_deconv_auto_mu(tmp_path):
    """--auto-mu selects the TV weight by discrepancy (jobs/autotune.py);
    beyond parity — the reference takes mu as given (BlindDeconvJob.java:80-88)."""
    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
    import jax.numpy as jnp

    shape = (8, 32, 32)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, dtype=jnp.float32)
    psf = model.compute_psf(model.init_params())
    rng = np.random.default_rng(0)
    obj = np.zeros(shape, np.float32)
    obj[3:5, 10:22, 10:22] = 50.0
    data = np.array(convolve(jnp.asarray(obj), convolve_spectrum(psf), shape))
    data += (0.02 * data.max()) * rng.standard_normal(shape).astype(np.float32)
    write_stack(tmp_path / "data.tif", data)
    write_stack(tmp_path / "psf.tif", np.asarray(psf))

    r = _run(
        ["deconv", str(tmp_path / "data.tif"), "--psf", str(tmp_path / "psf.tif"),
         "--out", str(tmp_path / "rec.tif"), "--iters", "15", "--auto-mu",
         "--report", str(tmp_path / "rep.json")],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "auto-mu: mu=" in r.stdout and "sigma=" in r.stdout
    rec = read_stack(tmp_path / "rec.tif")
    assert rec.shape == shape and np.isfinite(rec).all()
    rep = json.loads((tmp_path / "rep.json").read_text())
    assert rep["iterations"] > 0

    # --auto-mu and --mesh are exclusive (auto-mu bisects on one chip)
    r = _run(
        ["deconv", str(tmp_path / "data.tif"), "--psf", str(tmp_path / "psf.tif"),
         "--out", str(tmp_path / "x.tif"), "--auto-mu", "--mesh", "1", "2"],
        tmp_path,
    )
    assert r.returncode != 0 and "auto-mu" in (r.stderr + r.stdout)


def test_cli_deconv_auto_gain(tmp_path):
    """--auto-gain estimates camera constants by single-shot photon transfer
    and switches on variance weights (weights/updaters.py)."""
    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
    import jax.numpy as jnp

    shape = (6, 48, 48)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, dtype=jnp.float32)
    psf = model.compute_psf(model.init_params())
    rng = np.random.default_rng(1)
    obj = np.zeros(shape, np.float32)
    obj[2:4, 12:36, 12:36] = 400.0
    blurred = np.array(convolve(jnp.asarray(obj), convolve_spectrum(psf), shape))
    gain = 2.0
    data = (rng.poisson(np.maximum(blurred, 0) * gain) / gain
            + rng.normal(0, 2.0, shape)).astype(np.float32)
    write_stack(tmp_path / "data.tif", data)
    write_stack(tmp_path / "psf.tif", np.asarray(psf))

    r = _run(
        ["deconv", str(tmp_path / "data.tif"), "--psf", str(tmp_path / "psf.tif"),
         "--out", str(tmp_path / "rec.tif"), "--iters", "10", "--auto-gain"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "auto-gain: gain=" in r.stdout
    rec = read_stack(tmp_path / "rec.tif")
    assert rec.shape == shape and np.isfinite(rec).all()


def test_cli_rl_discrepancy_stop(tmp_path):
    """--rl-stop gaussian self-selects the RL iteration count (semiconvergence);
    --iters becomes the cap."""
    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
    import jax.numpy as jnp

    shape = (6, 32, 32)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, dtype=jnp.float32)
    psf = model.compute_psf(model.init_params())
    rng = np.random.default_rng(0)
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    obj = (150 * np.exp(-(((zz - 3) / 1.5) ** 2 + ((yy - 16) / 6) ** 2
                          + ((xx - 16) / 6) ** 2))).astype(np.float32)
    blurred = np.array(convolve(jnp.asarray(obj), convolve_spectrum(psf), shape))
    data = blurred + (0.1 * blurred.max()) * rng.standard_normal(shape).astype(np.float32)
    write_stack(tmp_path / "data.tif", data)
    write_stack(tmp_path / "psf.tif", np.asarray(psf))

    r = _run(
        ["deconv", str(tmp_path / "data.tif"), "--psf", str(tmp_path / "psf.tif"),
         "--out", str(tmp_path / "rec.tif"), "--method", "rl", "--iters", "120",
         "--rl-stop", "gaussian"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "gaussian discrepancy stop, cap 120" in r.stdout
    # the printed count is the actual stop, below the cap
    import re
    k = int(re.search(r"rl: (\d+) iters", r.stdout).group(1))
    assert 0 < k < 120
    rec = read_stack(tmp_path / "rec.tif")
    assert rec.shape == shape and np.isfinite(rec).all()


def test_cli_blind_auto_mu(tmp_path):
    """blind --auto-mu calibrates the base TV weight against the nominal
    PSF before the loop (the quality recipe's annealing schedule rescales
    with it)."""
    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
    import jax.numpy as jnp

    shape = (8, 32, 32)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=3, radial=True)
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.15, 0.1]))
    rng = np.random.default_rng(3)
    obj = np.abs(rng.standard_normal(shape)).astype(np.float32) * 20
    d = np.array(convolve(jnp.asarray(obj),
                          convolve_spectrum(model.compute_psf(true)), shape))
    d += (0.02 * d.max()) * rng.standard_normal(shape).astype(np.float32)
    write_stack(tmp_path / "d.tif", d, dxy=100e-9, dz=250e-9)

    r = _run(
        ["blind", str(tmp_path / "d.tif"), "--out", str(tmp_path / "o.tif"),
         "--auto-mu", "--loops", "2", "--iters", "5", "--psf-iters", "4",
         "--na", "1.2", "--wavelength", "500e-9", "--ni", "1.33",
         "--n-phase", "3", "--radial"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "auto-mu (nominal PSF): mu=" in r.stdout
    rec = read_stack(tmp_path / "o.tif")
    assert rec.shape == shape and np.isfinite(rec).all()

    # plate/all-channels fan-outs reject the flag instead of ignoring it
    r = _run(
        ["blind", str(tmp_path / "d.tif"), "--out", str(tmp_path / "x.tif"),
         "--auto-mu", "--all-channels",
         "--na", "1.2", "--wavelength", "500e-9", "--ni", "1.33"],
        tmp_path,
    )
    assert r.returncode != 0 and "auto-mu" in (r.stderr + r.stdout)


def test_cli_fitpsf_retrieve_map(tmp_path):
    """fitpsf --retrieve-map: nonparametric pupil retrieval on top of the
    parametric calibration (jobs/phase_retrieval.py)."""
    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    import jax.numpy as jnp

    shape = (8, 32, 32)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=3, radial=True,
                            dtype=jnp.float32)
    true = model.init_params()._replace(phase=jnp.asarray([0.35, -0.2, 0.1]))
    psf = model.compute_psf(true)
    rng = np.random.default_rng(0)
    bead = 1e6 * np.asarray(psf) + 5.0 + 2.0 * rng.standard_normal(shape).astype(np.float32)
    write_stack(tmp_path / "bead.tif", bead.astype(np.float32))

    r = _run(
        ["fitpsf", str(tmp_path / "bead.tif"), "--out", str(tmp_path / "psf.tif"),
         "--retrieve-map", str(tmp_path / "pupil.npz"),
         "--na", "1.2", "--wavelength", "500e-9", "--ni", "1.33",
         "--n-phase", "3", "--radial", "--iters", "30"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "retrieve-map: cost" in r.stdout
    saved = np.load(tmp_path / "pupil.npz")
    assert saved["phi"].shape == (32, 32) and np.isfinite(saved["phi"]).all()
    assert saved["mask"].sum() > 0
    assert saved["zernike_projection"].shape == (3,)
    out = read_stack(tmp_path / "psf.tif")
    assert out.shape == shape and np.isfinite(out).all()

    # non-widefield models are rejected (no scalar pupil synthesis)
    r = _run(
        ["fitpsf", str(tmp_path / "bead.tif"), "--retrieve-map",
         str(tmp_path / "x.npz"), "--model", "gl",
         "--na", "1.2", "--wavelength", "500e-9", "--ni", "1.33"],
        tmp_path,
    )
    assert r.returncode != 0 and "retrieve-map" in (r.stderr + r.stdout)


def test_cli_fitpsf_empirical_out(tmp_path):
    """fitpsf --empirical-out: model-free measured-PSF distillation
    (center + clamp + unit-sum, psf_fit.empirical_psf)."""
    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    import jax.numpy as jnp

    shape = (8, 32, 32)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, dtype=jnp.float32)
    psf = model.compute_psf(model.init_params())
    rng = np.random.default_rng(0)
    bead = 1e5 * np.asarray(psf) + 20.0 + 2.0 * rng.standard_normal(shape)
    bead = np.roll(bead, (1, 4, -2), axis=(0, 1, 2)).astype(np.float32)
    write_stack(tmp_path / "bead.tif", bead)

    r = _run(
        ["fitpsf", str(tmp_path / "bead.tif"),
         "--empirical-out", str(tmp_path / "psf.tif")],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "empirical PSF" in r.stdout
    h = read_stack(tmp_path / "psf.tif")
    assert h.shape == shape and h.min() >= 0.0
    assert abs(h.sum() - 1.0) < 1e-4
    # centered: the peak moved back to the corner
    assert np.unravel_index(np.argmax(h), shape)[1:] == (0, 0)


def test_cli_doctor(tmp_path):
    """doctor: deployment self-check runs green on the CPU backend."""
    r = _run(["doctor"], tmp_path)
    assert r.returncode == 0, r.stderr
    assert "doctor: OK" in r.stdout
    assert "jitted solve" in r.stdout
    assert "complex device->host transfer" in r.stdout


def test_cli_deconv_depthvar_maps(tmp_path):
    """deconv --depthvar-maps: measured-calibration depth-varying route —
    fitpsf --retrieve-map style npzs (one on a DIFFERENT bead-crop grid, so
    the pupil-map resampler runs) anchor the solve."""
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (8, 32, 32)
    common = dict(na=1.2, wavelength=500e-9, ni=1.33, dxy=100e-9, dz=250e-9,
                  n_phase=3, radial=True, dtype=jnp.float32)
    model = WideFieldConfig(shape=shape, **common)
    p0 = model.init_params()
    psf = model.compute_psf(p0)
    rng = np.random.default_rng(0)
    obj = (rng.random(shape) > 0.99) * rng.random(shape) * 100
    data = np.asarray(convolve(jnp.asarray(obj, jnp.float32),
                               convolve_spectrum(psf), shape))
    write_stack(tmp_path / "d.tif", data, dxy=100e-9, dz=250e-9)

    # map A on a 24x24 bead-crop grid (resampled by the loader), aberrated
    crop = WideFieldConfig(shape=(8, 24, 24), **common)
    pc = crop.init_params()._replace(phase=jnp.asarray([0.3, -0.2, 0.1]))
    _, phi_a, _, mask_a = crop.compute_pupil(pc)
    np.savez(tmp_path / "a.npz", phi=np.asarray(phi_a),
             mask=np.asarray(mask_a), dxy=100e-9,
             defocus=np.asarray(pc.defocus))
    # map B on the sample grid, unaberrated
    _, phi_b, _, mask_b = model.compute_pupil(p0)
    np.savez(tmp_path / "b.npz", phi=np.asarray(phi_b),
             mask=np.asarray(mask_b), dxy=100e-9,
             defocus=np.asarray(p0.defocus))

    # anchors deliberately unsorted: the CLI pairs-and-sorts (a=7, b=0)
    r = _run(
        ["deconv", "d.tif", "--out", "o.tif",
         "--depthvar-maps", "a.npz", "b.npz", "--depthvar-anchors", "7", "0",
         "--na", "1.2", "--wavelength", "500e-9", "--ni", "1.33",
         "--n-phase", "3", "--radial", "--iters", "3", "--mu", "1e-3"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "depthvar maps K=2" in r.stdout
    out = read_stack(tmp_path / "o.tif")
    assert out.shape == shape and np.isfinite(out).all()

    # guard rails (cheap: all exit before any solve)
    r = _run(["deconv", "d.tif", "--out", "o.tif", "--depthvar", "2",
              "--depthvar-maps", "a.npz", "b.npz"], tmp_path)
    assert r.returncode != 0 and "alternative anchor routes" in (r.stdout + r.stderr)
    r = _run(["deconv", "d.tif", "--out", "o.tif",
              "--depthvar-maps", "a.npz", "b.npz",
              "--depthvar-anchors", "0"], tmp_path)
    assert r.returncode != 0 and "needs 2 depths" in (r.stdout + r.stderr)
    r = _run(["deconv", "d.tif", "--out", "o.tif", "--model", "gl",
              "--depthvar-maps", "a.npz", "b.npz"], tmp_path)
    assert r.returncode != 0 and "scalar pupil" in (r.stdout + r.stderr)


def test_cli_fitpsf_phase_diversity(tmp_path):
    """fitpsf A.tif B.tif --diversity-dz: no-bead pupil calibration from two
    defocus-diverse images of one unknown extended scene (jobs/diversity)."""
    import jax
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.jobs.diversity import defocus_diversity, diversity_psfs
    from microtipi_tpu.models.widefield import WideFieldConfig

    shape = (1, 32, 32)
    model = WideFieldConfig(shape=shape, na=1.4, wavelength=500e-9, ni=1.518,
                            dxy=80e-9, dz=120e-9, n_phase=2, radial=True,
                            dtype=jnp.float64)
    true = model.init_params()._replace(phase=jnp.asarray([0.3, -0.2]))
    deltas = [-2e-7, 2e-7]
    phases = defocus_diversity(model, deltas)
    hs = diversity_psfs(model, true, jnp.asarray(phases))
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0.1, 1.1, shape).astype(np.float64))
    for d, name in enumerate(("a.tif", "b.tif")):
        img = jnp.fft.irfftn(jnp.fft.rfftn(hs[d]) * jnp.fft.rfftn(x), s=shape)
        write_stack(tmp_path / name, np.asarray(img, np.float32),
                    dxy=80e-9, dz=120e-9)

    r = _run(
        ["fitpsf", "a.tif", "b.tif", "--diversity-dz=-2e-7,2e-7",
         "--diversity-gamma", "1e-7", "--n-phase", "2", "--radial",
         "--na", "1.4", "--wavelength", "500e-9", "--families", "phase",
         "--iters", "60", "--params-out", "params.json", "--uncertainty",
         "--object-out", "obj.tif", "--out", "psf.tif"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    params = json.loads((tmp_path / "params.json").read_text())
    np.testing.assert_allclose(params["phase"], [0.3, -0.2], atol=0.05)
    assert params["diversity_kind"] == "defocus"
    assert len(params["std"]["phase"]) == 2  # --uncertainty error bars
    obj = read_stack(tmp_path / "obj.tif")
    assert obj.shape == shape and np.isfinite(obj).all()
    psf = read_stack(tmp_path / "psf.tif")
    assert psf.shape == shape and np.isfinite(psf).all()


def test_cli_fitpsf_diversity_validation(tmp_path):
    from microtipi_tpu.io.tiffstack import write_stack

    write_stack(tmp_path / "a.tif", np.zeros((1, 16, 16), np.float32),
                dxy=80e-9, dz=120e-9)
    # one stack is the non-identifiable blind case
    r = _run(["fitpsf", "a.tif", "--diversity-dz", "0.0"], tmp_path)
    assert r.returncode != 0
    assert ">= 2 acquisitions" in (r.stdout + r.stderr)
    # count mismatch
    r = _run(["fitpsf", "a.tif", "--diversity-dz=-2e-7,2e-7"], tmp_path)
    assert r.returncode != 0
    assert "one stack per diversity value" in (r.stdout + r.stderr)
    # astig diversity needs the full basis
    write_stack(tmp_path / "b.tif", np.zeros((1, 16, 16), np.float32),
                dxy=80e-9, dz=120e-9)
    r = _run(["fitpsf", "a.tif", "b.tif", "--diversity-astig=-1,1",
              "--radial"], tmp_path)
    assert r.returncode != 0
    assert "full basis" in (r.stdout + r.stderr)


def test_cli_ism_reassign_and_rl(tmp_path):
    """ism: interleaved element-major stack -> reassigned volume + ISM PSF,
    and the joint-MLE route."""
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.models.ism import ISMConfig

    shape = (4, 16, 16)
    m = ISMConfig(shape=shape, na=1.2, wavelength=520e-9,
                  wavelength_exc=488e-9, ni=1.33, dxy=60e-9, dz=200e-9,
                  element_pitch=2 * 60e-9, rings=1, dtype=jnp.float64)
    p = m.init_params()
    hk = m.compute_psfs(p)
    obj = np.zeros(shape)
    obj[2, 8, 8] = 50.0
    obj[1, 4, 11] = 30.0
    data = np.stack([
        np.asarray(jnp.fft.irfftn(jnp.fft.rfftn(hk[k]) * jnp.fft.rfftn(jnp.asarray(obj)),
                                  s=shape))
        for k in range(m.n_elements)])
    write_stack(tmp_path / "ism.tif",
                data.reshape(-1, *shape[1:]).astype(np.float32),
                dxy=60e-9, dz=200e-9)

    base = ["ism", "ism.tif", "--pitch", "1.2e-7", "--rings", "1",
            "--na", "1.2", "--wavelength", "520e-9",
            "--wavelength-exc", "488e-9", "--ni", "1.33"]
    r = _run([*base, "--out", "re.tif", "--psf-out", "psf.tif"], tmp_path)
    assert r.returncode == 0, r.stderr
    re_vol = read_stack(tmp_path / "re.tif")
    assert re_vol.shape == shape and np.isfinite(re_vol).all()
    psf = read_stack(tmp_path / "psf.tif")
    assert psf.shape == shape and np.isfinite(psf).all()

    r = _run([*base, "--out", "rl.tif", "--method", "rl", "--iters", "10"],
             tmp_path)
    assert r.returncode == 0, r.stderr
    rl_vol = read_stack(tmp_path / "rl.tif")
    assert rl_vol.shape == shape and np.isfinite(rl_vol).all()

    # plane-count validation
    write_stack(tmp_path / "bad.tif", np.zeros((9, 16, 16), np.float32),
                dxy=60e-9, dz=200e-9)
    r = _run(["ism", "bad.tif", "--pitch", "1.2e-7", "--rings", "1",
              "--out", "x.tif"], tmp_path)
    assert r.returncode != 0
    assert "does not split" in (r.stdout + r.stderr)


def test_cli_psf_structured_sheet(tmp_path):
    """psf --model lightsheet --sheet-mode bessel/lattice synthesizes
    structured-sheet PSFs (StructuredSheetConfig via the model flags)."""
    from microtipi_tpu.io.tiffstack import read_stack

    r = _run(["psf", "bessel.tif", "--shape", "16", "24", "24",
              "--model", "lightsheet", "--sheet-mode", "bessel",
              "--sheet-na-min", "0.35", "--sheet-na-max", "0.5",
              "--dxy", "100e-9", "--dz", "200e-9"], tmp_path)
    assert r.returncode == 0, r.stderr
    h = read_stack(tmp_path / "bessel.tif")
    assert h.shape == (16, 24, 24) and np.isfinite(h).all() and h.min() >= 0

    r = _run(["psf", "lat.tif", "--shape", "16", "24", "24",
              "--model", "lightsheet", "--sheet-mode", "lattice",
              "--lattice-ky", "0.0,0.5", "--dxy", "100e-9",
              "--dz", "200e-9"], tmp_path)
    assert r.returncode == 0, r.stderr
    h2 = read_stack(tmp_path / "lat.tif")
    assert h2.shape == (16, 24, 24) and np.isfinite(h2).all()
    assert not np.allclose(h, h2)  # different sheets, different PSFs


def test_cli_psf_4pi_and_cavity_family_guard(tmp_path):
    from microtipi_tpu.io.tiffstack import read_stack

    r = _run(["psf", "fourpi.tif", "--shape", "32", "24", "24",
              "--model", "4pi", "--fourpi-type", "C",
              "--dxy", "80e-9", "--dz", "40e-9"], tmp_path)
    assert r.returncode == 0, r.stderr
    h = read_stack(tmp_path / "fourpi.tif")
    assert h.shape == (32, 24, 24) and np.isfinite(h).all()
    # axial fringes exist (the 4Pi signature): on-axis profile has a deep
    # minimum between strong maxima near focus
    prof = h[:, 0, 0]
    assert prof.min() < 0.2 * prof.max()

    from microtipi_tpu.io.tiffstack import write_stack

    write_stack(tmp_path / "x.tif", np.ones((4, 16, 16), np.float32),
                dxy=80e-9, dz=200e-9)
    r = _run(["blind", "x.tif", "--out", "y.tif", "--families", "cavity"],
             tmp_path)
    assert r.returncode != 0
    assert "requires --model 4pi" in (r.stdout + r.stderr)


def test_cli_sim_reconstruction(tmp_path):
    """sim: raw angle-major SIM planes -> 2x-grid reconstruction with
    pattern self-calibration."""
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.jobs.sim import simulate_sim
    from microtipi_tpu.models.widefield import WideFieldConfig

    ny = nx = 48
    dxy = 80e-9
    m = WideFieldConfig(shape=(1, ny, nx), na=1.4, wavelength=500e-9,
                        ni=1.518, dxy=dxy, dz=120e-9, dtype=jnp.float64)
    h = m.compute_psf(m.init_params())[0]
    otf = jnp.fft.fft2((h / jnp.sum(h)).astype(jnp.complex128))
    rng = np.random.default_rng(0)
    x = np.zeros((ny, nx))
    for _ in range(10):
        x[rng.integers(6, 42), rng.integers(6, 42)] = rng.uniform(40, 90)
    period = 220e-9
    k_mag = dxy / period
    a_k = np.stack([[k_mag * np.sin(np.deg2rad(t)),
                     k_mag * np.cos(np.deg2rad(t))] for t in (0, 60, 120)])
    ph = np.tile(2 * np.pi / 3 * np.arange(3), (3, 1)) + 0.15
    data = simulate_sim(jnp.asarray(x), otf, a_k, ph, modulation=0.85)
    write_stack(tmp_path / "sim.tif",
                np.asarray(data).reshape(-1, ny, nx).astype(np.float32),
                dxy=dxy, dz=120e-9)

    r = _run(["sim", "sim.tif", "--out", "rec.tif",
              "--pattern-period", "220e-9", "--refine",
              "--modulation", "0.85", "--wiener", "1e-3",
              "--na", "1.4", "--wavelength", "500e-9"], tmp_path)
    assert r.returncode == 0, r.stderr
    assert "pattern self-calibration" in r.stdout
    rec = read_stack(tmp_path / "rec.tif")
    assert rec.shape == (1, 2 * ny, 2 * nx) and np.isfinite(rec).all()

    # plane-count validation
    r = _run(["sim", "sim.tif", "--out", "x.tif", "--angles", "4",
              "--pattern-period", "220e-9",
              "--pattern-angle-deg", "0,45,90,135"], tmp_path)
    assert r.returncode != 0
    assert "angle-major" in (r.stdout + r.stderr)


def test_cli_sim3d_reconstruction(tmp_path):
    """sim --axial-period: 3-beam 3D-SIM volumes -> extended 3D grid."""
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.jobs.sim import simulate_sim3d
    from microtipi_tpu.models.widefield import WideFieldConfig

    nz, ny, nx = 12, 24, 24
    dxy, dz = 80e-9, 150e-9
    na, wl, ni = 1.2, 500e-9, 1.33
    m = WideFieldConfig(shape=(nz, ny, nx), na=na, wavelength=wl, ni=ni,
                        dxy=dxy, dz=dz, dtype=jnp.float64)
    h = m.compute_psf(m.init_params())
    h = h / jnp.sum(h)
    rng = np.random.default_rng(0)
    x = np.zeros((nz, ny, nx))
    for _ in range(8):
        x[rng.integers(2, 10), rng.integers(4, 20), rng.integers(4, 20)] = \
            rng.uniform(40, 90)
    period = dxy / (na / wl * dxy)  # beams at the pupil edge: p = NA/lambda
    k_mag = dxy / period
    a_k = np.stack([[k_mag * np.sin(np.deg2rad(t)),
                     k_mag * np.cos(np.deg2rad(t))] for t in (0, 60, 120)])
    ph = np.tile(2 * np.pi / 5 * np.arange(5), (3, 1))
    cos_t = np.sqrt(1 - (na / ni) ** 2)
    axial_period = wl / (ni * (1 - cos_t))
    q = dz / axial_period
    data = simulate_sim3d(jnp.asarray(x), h, a_k, ph, q=q)
    write_stack(tmp_path / "sim3d.tif",
                np.asarray(data).reshape(-1, ny, nx).astype(np.float32),
                dxy=dxy, dz=dz)

    r = _run(["sim", "sim3d.tif", "--out", "rec.tif", "--phase-count", "5",
              "--pattern-period", str(period), "--axial-period",
              str(axial_period), "--wiener", "1e-3", "--na", str(na),
              "--wavelength", str(wl), "--ni", str(ni), "--dz", str(dz)],
             tmp_path)
    assert r.returncode == 0, r.stderr
    assert "sim[3d]" in r.stdout
    rec = read_stack(tmp_path / "rec.tif")
    assert rec.shape == (2 * nz, 2 * ny, 2 * nx) and np.isfinite(rec).all()

    # guards: phase count and divisibility
    r = _run(["sim", "sim3d.tif", "--out", "x.tif",
              "--pattern-period", str(period),
              "--axial-period", str(axial_period)], tmp_path)
    assert r.returncode != 0 and "--phase-count >= 5" in (r.stdout + r.stderr)
    r = _run(["sim", "sim3d.tif", "--out", "x.tif", "--phase-count", "7",
              "--angles", "2", "--pattern-angle-deg", "0,90",
              "--pattern-period", str(period),
              "--axial-period", str(axial_period)], tmp_path)
    assert r.returncode != 0 and "not divisible" in (r.stdout + r.stderr)


def test_deconv_config_tolerance_flags():
    """--grtol/--gatol reach DeconvolutionConfig; unset (None) keeps solver
    defaults (grtol 1e-3 / gatol 0) so existing invocations are unchanged."""
    import argparse

    from microtipi_tpu.__main__ import _deconv_config

    base = dict(mu=0.01, epsilon=1.0, iters=5, no_positivity=False, pad=0)
    a = argparse.Namespace(**base, grtol=0.0, gatol=0.0)
    cfg = _deconv_config(a, (4, 16, 16))
    assert cfg.grtol == 0.0 and cfg.gatol == 0.0
    a2 = argparse.Namespace(**base, grtol=None, gatol=None)
    cfg2 = _deconv_config(a2, (4, 16, 16))
    assert cfg2.grtol == 1e-3 and cfg2.gatol == 0.0


def test_cli_deconv_uncertainty(tmp_path):
    """deconv --uncertainty K writes the Laplace sigma volume next to --out;
    incompatible paths are rejected up front instead of silently ignoring
    the flag (jobs/uncertainty.py)."""
    from microtipi_tpu.io.tiffstack import read_stack, write_stack

    rng = np.random.default_rng(5)
    shape = (4, 16, 16)
    psf = np.zeros(shape, np.float32)
    psf[0, 0, 0] = 0.7  # corner-origin near-delta: well-conditioned Hessian
    psf[0, 0, 1] = psf[0, 1, 0] = psf[1, 0, 0] = 0.1
    obj = np.abs(rng.standard_normal(shape)).astype(np.float32) + 0.2
    data = np.real(np.fft.ifftn(np.fft.fftn(obj) * np.fft.fftn(psf))).astype(np.float32)
    write_stack(tmp_path / "d.tif", data)
    write_stack(tmp_path / "p.tif", psf)

    r = _run(
        ["deconv", str(tmp_path / "d.tif"), "--psf", str(tmp_path / "p.tif"),
         "--out", str(tmp_path / "rec.tif"), "--iters", "30", "--mu", "0.01",
         "--uncertainty", "4"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "uncertainty: 4 probes" in r.stdout
    sigma = read_stack(tmp_path / "rec_std.tif")
    assert sigma.shape == shape and np.isfinite(sigma).all()
    rec = read_stack(tmp_path / "rec.tif")
    # pinned voxels read exactly 0; free voxels are >= 0 (a low-probe
    # Hutchinson estimate may clip individual voxels to 0) and not all 0
    assert (sigma[rec == 0] == 0).all()
    assert (sigma >= 0).all() and sigma.max() > 0

    # explicit output path
    r = _run(
        ["deconv", str(tmp_path / "d.tif"), "--psf", str(tmp_path / "p.tif"),
         "--out", str(tmp_path / "rec2.tif"), "--iters", "5",
         "--uncertainty", "2", "--uncertainty-out", str(tmp_path / "s.tif")],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "s.tif").exists()

    # --method admm composes (same objective, same MAP — the gate only
    # rejects engines that solve a DIFFERENT objective, like rl)
    r = _run(
        ["deconv", str(tmp_path / "d.tif"), "--psf", str(tmp_path / "p.tif"),
         "--out", str(tmp_path / "rec3.tif"), "--iters", "40",
         "--mu", "0.01", "--method", "admm", "--uncertainty", "2"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "rec3_std.tif").exists()

    # guards fail fast (before any solve)
    r = _run(
        ["deconv", str(tmp_path / "d.tif"), "--psf", str(tmp_path / "p.tif"),
         "--out", str(tmp_path / "x.tif"), "--uncertainty", "2",
         "--tile", "4", "16", "16"],
        tmp_path,
    )
    assert r.returncode != 0 and "--tile" in (r.stdout + r.stderr)
    r = _run(
        ["deconv", str(tmp_path / "d.tif"), "--psf", str(tmp_path / "p.tif"),
         "--out", str(tmp_path / "x.tif"), "--uncertainty", "2",
         "--method", "rl"],
        tmp_path,
    )
    assert r.returncode != 0 and "rl" in (r.stdout + r.stderr)


def test_cli_blind_uncertainty(tmp_path):
    """blind --uncertainty K writes the Laplace sigma at the FITTED PSF."""
    import jax.numpy as jnp
    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum

    shape = (8, 32, 32)
    model = WideFieldConfig(shape=shape, na=1.2, wavelength=500e-9, ni=1.33,
                            dxy=100e-9, dz=250e-9, n_phase=3, radial=True)
    true = model.init_params()._replace(phase=jnp.asarray([0.2, -0.1, 0.05]))
    rng = np.random.default_rng(3)
    obj = np.abs(rng.standard_normal(shape)).astype(np.float32) * 20
    d = convolve(jnp.asarray(obj), convolve_spectrum(model.compute_psf(true)), shape)
    write_stack(tmp_path / "d.tif", np.asarray(d))

    r = _run(
        ["blind", str(tmp_path / "d.tif"), "--out", str(tmp_path / "rec.tif"),
         "--model", "widefield", "--na", "1.2", "--wavelength", "500e-9",
         "--ni", "1.33", "--dxy", "100e-9", "--dz", "250e-9",
         "--n-phase", "3", "--radial", "--loops", "2", "--iters", "10",
         "--psf-iters", "3", "--uncertainty", "2"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    assert "uncertainty: 2 probes" in r.stdout
    sigma = read_stack(tmp_path / "rec_std.tif")
    assert sigma.shape == shape and np.isfinite(sigma).all() and (sigma >= 0).all()
    assert sigma.max() > 0

    # non-composing paths fail fast
    r = _run(
        ["blind", str(tmp_path / "d.tif"), "--out", str(tmp_path / "x.tif"),
         "--uncertainty", "2", "--mesh", "1", "2"],
        tmp_path,
    )
    assert r.returncode != 0 and "--mesh" in (r.stdout + r.stderr)


def test_cli_deconv_method_admm_fista(tmp_path):
    """deconv --method admm / fista (jobs/admm.py engines): both must beat
    the raw data against the truth and write a finite volume; admm must
    fail fast on non-composing flags."""
    from microtipi_tpu.io.tiffstack import read_stack, write_stack

    shape = (6, 24, 24)
    rng = np.random.default_rng(11)
    obj = np.zeros(shape, np.float32)
    obj[1:5, 6:18, 6:18] = rng.uniform(0.5, 2.0, (4, 12, 12)).astype(np.float32)
    psf = np.zeros(shape, np.float32)
    psf[0, 0, 0] = 0.4
    for dz, dy, dx in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                       (0, 0, 1), (0, 0, -1)):
        psf[dz % shape[0], dy % shape[1], dx % shape[2]] = 0.6 / 6
    data = np.fft.irfftn(np.fft.rfftn(obj) * np.fft.rfftn(psf), s=shape,
                         axes=(0, 1, 2)).astype(np.float32)
    write_stack(tmp_path / "d.tif", data)
    write_stack(tmp_path / "p.tif", psf)

    err_data = np.linalg.norm(data - obj)
    for method in ("admm", "fista"):
        r = _run(
            ["deconv", "d.tif", "--psf", "p.tif", "--out", f"{method}.tif",
             "--method", method, "--iters", "40", "--mu", "1e-3"],
            tmp_path,
        )
        assert r.returncode == 0, r.stderr
        x = read_stack(tmp_path / f"{method}.tif")
        assert np.isfinite(x).all() and x.min() >= 0
        assert np.linalg.norm(x - obj) < err_data

    # admm composes with --tile (each tile is a plain circulant solve);
    # fista does not
    r = _run(
        ["deconv", "d.tif", "--psf", "p.tif", "--out", "tadmm.tif",
         "--method", "admm", "--iters", "20", "--mu", "1e-3",
         "--tile", "6", "16", "16", "--overlap", "0", "4", "4"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    xt = read_stack(tmp_path / "tadmm.tif")
    assert np.isfinite(xt).all() and np.linalg.norm(xt - obj) < err_data
    r = _run(
        ["deconv", "d.tif", "--psf", "p.tif", "--out", "x.tif",
         "--method", "fista", "--tile", "6", "16", "16"],
        tmp_path,
    )
    assert r.returncode != 0 and "--tile" in (r.stdout + r.stderr)
    r = _run(
        ["deconv", "d.tif", "--psf", "p.tif", "--out", "x.tif",
         "--method", "fista", "--data-term", "poisson"],
        tmp_path,
    )
    assert r.returncode != 0 and "Gaussian" in (r.stdout + r.stderr)
    # weighted admm (the z0 = Hx data split) works end to end
    r = _run(
        ["deconv", "d.tif", "--psf", "p.tif", "--out", "wadmm.tif",
         "--method", "admm", "--iters", "30", "--mu", "1e-3", "--gain", "2.0"],
        tmp_path,
    )
    assert r.returncode == 0, r.stderr
    x = read_stack(tmp_path / "wadmm.tif")
    assert np.isfinite(x).all() and np.linalg.norm(x - obj) < err_data


def test_cli_blind_tiled(tmp_path):
    """blind --tile: the out-of-core loop end to end (tiled object steps +
    streamed PSF-fit statistics + f64 CPU fits), with params/psf outputs."""
    import jax.numpy as jnp

    from microtipi_tpu.io.tiffstack import read_stack, write_stack
    from microtipi_tpu.models.widefield import WideFieldConfig
    from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
    from microtipi_tpu.utils.arrays import pad_fft_kernel

    vol = (8, 48, 48)
    support = (4, 16, 16)
    m = WideFieldConfig(shape=support, na=1.2, wavelength=500e-9, ni=1.33,
                        dxy=100e-9, dz=250e-9, n_phase=3, n_modulus=1,
                        dtype=jnp.float64)
    rng = np.random.default_rng(0)
    obj = np.zeros(vol)
    for _ in range(15):
        z, y, x = rng.integers(0, 6), rng.integers(4, 40), rng.integers(4, 40)
        obj[z:z + 2, y:y + 3, x:x + 3] = rng.uniform(30, 100)
    true = m.init_params()._replace(phase=jnp.asarray([0.3, -0.2, 0.1]))
    kern = pad_fft_kernel(m.compute_psf(true), vol)
    data = np.asarray(convolve(jnp.asarray(obj), convolve_spectrum(kern), vol))
    write_stack(tmp_path / "d.tif", (data + 0.01 * rng.standard_normal(vol)
                                     ).astype(np.float32))

    r = _run([
        "blind", "d.tif", "--out", "o.tif", "--psf-out", "p.tif",
        "--params-out", "params.json", "--report", "rep.json",
        "--tile", "8", "32", "32", "--overlap", "0", "8", "8",
        "--psf-support", "4", "16", "16",
        "--na", "1.2", "--wavelength", "500e-9", "--ni", "1.33",
        "--dxy", "100e-9", "--dz", "250e-9", "--n-phase", "3",
        "--families", "phase", "--loops", "2", "--psf-iters", "5",
        "--joint-fit", "--iters", "8", "--mu", "0.01",
    ], tmp_path)
    assert r.returncode == 0, r.stderr + r.stdout
    out = read_stack(tmp_path / "o.tif")
    assert out.shape == vol and np.isfinite(out).all()
    psf = read_stack(tmp_path / "p.tif")
    assert psf.shape == support
    doc = json.loads((tmp_path / "params.json").read_text())
    assert len(doc["phase"]) == 3
    rep = json.loads((tmp_path / "rep.json").read_text())
    assert rep["psf_support"] == [4, 16, 16]

    # guard: weighted out-of-core fits are rejected with a clear message
    r2 = _run(["blind", "d.tif", "--out", "o2.tif", "--tile", "8", "32", "32",
               "--gain", "2.0"], tmp_path)
    assert r2.returncode != 0
    assert "uniform-weights only" in (r2.stderr + r2.stdout)
