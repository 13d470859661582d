"""Out-of-core BLIND deconvolution: tile-streamed PSF-fit statistics.

VERDICT r4 item 5. ``jobs.tiled`` already solves beyond-HBM volumes
non-blind; the missing piece was the PSF *fit* — the blind loop's
``fitPSF`` step (``BlindDeconvJob.java:97-138``) evaluates the
object-as-kernel data term ``0.5 ||obj (*) h(theta) - d||^2``
(``PSF_Estimation.java:147-150``) over the FULL volume, which cannot live
in HBM at 2048^2-class scale.

The key structure: with UNIFORM weights that data term is a QUADRATIC in
the PSF ``h``, and when ``h`` has compact support ``psf_shape`` (the same
assumption overlap-discard tiling already makes for the object step), the
quadratic reduces EXACTLY to small-grid sufficient statistics::

    f(h) = 0.5 <h, A h> - <b, h> + c
    A h  = (R_obj (*) h)        restricted to the support
    R_obj[l] = sum_i obj[i] obj[i+l]   (circular autocorr, lags |l| < h)
    b[s]     = sum_i d[i]  obj[i-s]    (circular correlation, |s| <= h/2)
    c        = 0.5 sum_i d[i]^2

``R_obj``/``b``/``c`` are computed in ONE streamed pass over the volume
(overlap-save tiles with halo ``psf_shape``, batched FFT correlations on
device, f64 host accumulation) — after which every fit EVALUATION costs
only (2*psf_shape)-grid FFTs. The theta-fit itself then runs in f64 on the
host CPU backend (``jax.enable_x64()`` + ``jax.default_device``): the
quadratic identity's ``eps*c`` value-resolution floor — the documented f32
fit stall (``jobs/psf_fit.py::_fit_data_term``) — is fatal here because
``c`` sums the WHOLE out-of-core volume, and no residual form exists
without re-streaming per evaluation. The fit is ~40 parameters on a tiny
grid; f64 CPU costs nothing.

Exactness contract (pinned by tests/test_tiled_blind.py): the streamed
objective equals the DENSE circulant objective with the support-limited
PSF ``pad_fft_kernel(model(psf_shape).compute_psf(theta), volume_shape)``
— the same truncated-support approximation the tiled object step makes.
Requires ``2*psf_shape <= volume_shape`` per axis.

``blind_deconvolve_tiled`` composes this with ``jobs.tiled``'s object step
into the full alternating loop for beyond-HBM volumes (host-driven rounds:
reference loop semantics — skip-last-fit ``BlindDeconvJob.java:116``,
per-family budgets, ``mu_schedule`` annealing, joint fits).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from microtipi_tpu.jobs.deconv import DeconvolutionConfig
from microtipi_tpu.jobs.psf_fit import PsfFitConfig, fit_families_with_cost
from microtipi_tpu.models.microscope import FAMILY_NAMES
from microtipi_tpu.utils.arrays import pad_fft_kernel

__all__ = ["FitStats", "blind_deconvolve_tiled", "make_streamed_fit_cost",
           "streamed_fit_stats"]


class FitStats:
    """Sufficient statistics of the uniform-weight PSF-fit data term.

    ``rho``: (2h) grid, circular object autocorrelation at lags |l| < h
    (corner-origin: lag l at index l mod 2h), f64.
    ``b``: (2h) grid, correlation of data with object at the kernel-support
    displacements, f64. ``c``: 0.5*sum(data^2). ``g_shape``: the (2h) grid.
    """

    def __init__(self, rho, b, c, g_shape, psf_shape, volume_shape):
        self.rho = rho
        self.b = b
        self.c = float(c)
        self.g_shape = tuple(g_shape)
        self.psf_shape = tuple(psf_shape)
        self.volume_shape = tuple(volume_shape)


def _block_starts(n: int, c: int):
    """Start positions of size-``c`` core blocks covering [0, n): stride c,
    last block flush-shifted (its leading overlap is masked out by the
    caller so every voxel is counted exactly once)."""
    if c >= n:
        return [0], c
    starts = list(range(0, n - c + 1, c))
    if starts[-1] + c < n:
        starts.append(n - c)
    return starts, c


def streamed_fit_stats(
    obj,
    data,
    psf_shape: tuple[int, int, int],
    tile: tuple[int, int, int] | None = None,
    max_batch: int = 8,
) -> FitStats:
    """One streamed pass over (obj, data) -> :class:`FitStats`.

    ``obj``/``data``: host NumPy arrays at the full volume shape (never
    resident on device whole). ``tile``: core block size streamed per lane
    (defaults to min(volume, 128) per axis); each lane computes its block's
    correlation contributions with an FFT at ``tile + 2*psf_shape`` and the
    host accumulates in f64. Total device traffic: ~3x the volume (obj core
    + obj halo + data core), once per call.
    """
    obj = np.asarray(obj)
    data = np.asarray(data)
    if obj.shape != data.shape:
        raise ValueError(f"obj {obj.shape} != data {data.shape}")
    shape = data.shape
    h = tuple(int(v) for v in psf_shape)
    if any(2 * hv > n for hv, n in zip(h, shape)):
        raise ValueError(
            f"streamed fit needs 2*psf_shape <= volume shape per axis "
            f"(psf {h}, volume {shape}) — the support-limited quadratic "
            "wraps otherwise; shrink psf_shape")
    if tile is None:
        tile = tuple(min(n, 128) for n in shape)
    core = tuple(min(int(t), n) for t, n in zip(tile, shape))
    ext = tuple(c + 2 * hv for c, hv in zip(core, h))

    axes_starts = [_block_starts(n, c)[0] for n, c in zip(shape, core)]
    blocks = []
    for sz in axes_starts[0]:
        for sy in axes_starts[1]:
            for sx in axes_starts[2]:
                blocks.append((sz, sy, sx))

    # Per-axis double-count masks: a flush-shifted last block overlaps the
    # previous block's core by (prev_end - start); zero that leading part.
    def _mask_len(axis, s):
        starts = axes_starts[axis]
        i = starts.index(s)
        if i == 0:
            return 0
        prev_end = starts[i - 1] + core[axis]
        return max(0, prev_end - s)

    @jax.jit
    def stats_kernel(core_obj, core_data, ext_obj):
        # (B,)+core and (B,)+ext; embed cores at offset h in the ext grid.
        b_ = core_obj.shape[0]
        pc_o = jnp.zeros((b_,) + ext, core_obj.dtype).at[
            :, h[0]:h[0] + core[0], h[1]:h[1] + core[1],
            h[2]:h[2] + core[2]].set(core_obj)
        pc_d = jnp.zeros((b_,) + ext, core_data.dtype).at[
            :, h[0]:h[0] + core[0], h[1]:h[1] + core[1],
            h[2]:h[2] + core[2]].set(core_data)
        ax = (1, 2, 3)
        f_ext = jnp.fft.rfftn(ext_obj, axes=ax)
        r = jnp.fft.irfftn(jnp.conj(jnp.fft.rfftn(pc_o, axes=ax)) * f_ext,
                           s=ext, axes=ax)
        bb = jnp.fft.irfftn(jnp.conj(jnp.fft.rfftn(pc_d, axes=ax)) * f_ext,
                            s=ext, axes=ax)
        cc = 0.5 * jnp.sum(core_data * core_data)
        return r.sum(axis=0), bb.sum(axis=0), cc

    r_acc = np.zeros(ext, np.float64)
    b_acc = np.zeros(ext, np.float64)
    c_acc = 0.0
    for i0 in range(0, len(blocks), max_batch):
        chunk = blocks[i0:i0 + max_batch]
        cos, cds, exs = [], [], []
        for s in chunk:
            sl = tuple(slice(sv, sv + cv) for sv, cv in zip(s, core))
            co = obj[sl].copy()
            cd = data[sl].copy()
            for ax_i in range(3):
                m = _mask_len(ax_i, s[ax_i])
                if m:
                    idx = tuple(slice(0, m) if j == ax_i else slice(None)
                                for j in range(3))
                    co[idx] = 0
                    cd[idx] = 0
            wrapped = np.ix_(*[
                (np.arange(sv - hv, sv + cv + hv)) % n
                for sv, cv, hv, n in zip(s, core, h, shape)
            ])
            cos.append(co)
            cds.append(cd)
            exs.append(obj[wrapped])
        r, bb, cc = stats_kernel(jnp.asarray(np.stack(cos)),
                                 jnp.asarray(np.stack(cds)),
                                 jnp.asarray(np.stack(exs)))
        r_acc += np.asarray(r, np.float64)
        b_acc += np.asarray(bb, np.float64)
        c_acc += float(cc)

    # Extract lags from the ext-grid correlations onto the (2h) grid.
    g_shape = tuple(2 * hv for hv in h)
    rho = np.zeros(g_shape, np.float64)
    bg = np.zeros(g_shape, np.float64)
    # R: lags l in (-h, h); R[l] = r_acc[l mod ext]; place at l mod 2h.
    lag_ranges = [np.r_[0:hv, -hv + 1:0] for hv in h]
    for lz in lag_ranges[0]:
        for ly in lag_ranges[1]:
            for lx in lag_ranges[2]:
                rho[lz % g_shape[0], ly % g_shape[1], lx % g_shape[2]] = \
                    r_acc[lz % ext[0], ly % ext[1], lx % ext[2]]
    # b: displacements s in the kernel support [-h//2, h - h//2);
    # b[s] = b_acc[(-s) mod ext]; place at s mod 2h.
    disp_ranges = [np.r_[0:hv - hv // 2, -(hv // 2):0] for hv in h]
    for sz in disp_ranges[0]:
        for sy in disp_ranges[1]:
            for sx in disp_ranges[2]:
                bg[sz % g_shape[0], sy % g_shape[1], sx % g_shape[2]] = \
                    b_acc[(-sz) % ext[0], (-sy) % ext[1], (-sx) % ext[2]]
    return FitStats(rho, bg, c_acc, g_shape, h, shape)


def make_streamed_fit_cost(stats: FitStats, model):
    """``cost(params)`` closure over the streamed statistics, for
    :func:`psf_fit.fit_families_with_cost`. Must run under f64 (see module
    docstring); :func:`fit_psf_streamed` sets that up."""
    g_shape = stats.g_shape
    rho = jnp.asarray(stats.rho)
    b = jnp.asarray(stats.b)
    c = jnp.asarray(stats.c)
    rho_hat = jnp.fft.rfftn(rho)

    def cost(params):
        psf = model.compute_psf(params)
        hg = pad_fft_kernel(psf, g_shape).astype(rho.dtype)
        ah = jnp.fft.irfftn(rho_hat * jnp.fft.rfftn(hg), s=g_shape)
        return 0.5 * jnp.vdot(hg, ah) - jnp.vdot(b, hg) + c

    return cost


def fit_psf_streamed(
    model,
    params,
    families,
    stats: FitStats,
    config: PsfFitConfig = PsfFitConfig(),
    joint: bool = True,
    **fit_kw,
):
    """Fit PSF parameters against streamed statistics, f64 on the host CPU.

    ``model`` must be at ``stats.psf_shape`` with ``dtype float64`` (the
    caller rebuilds it; :func:`blind_deconvolve_tiled` does). ``families``:
    flags (DEFOCUS/PHASE/...) fitted jointly (default — the measured
    recommended recipe) or sequentially.
    """
    names = tuple(FAMILY_NAMES[f] for f in families)
    with jax.enable_x64():
        with jax.default_device(jax.devices("cpu")[0]):
            cost = make_streamed_fit_cost(stats, model)
            params64 = jax.tree.map(
                lambda a: jnp.asarray(np.asarray(a), jnp.float64), params)
            if joint or len(names) == 1:
                res = fit_families_with_cost(cost, params64, names, config,
                                             **fit_kw)
            else:
                res = None
                for n in names:
                    res = fit_families_with_cost(
                        cost, params64, (n,), config, **fit_kw)
                    params64 = res.params
            # materialize on host inside the x64 context (f64 leaves would
            # otherwise downcast surprisingly at first use outside)
            out_params = jax.tree.map(
                lambda a: np.asarray(a, np.float64), res.params)
            f = float(res.f)
            its = int(res.iterations)
    return out_params, f, its


def blind_deconvolve_tiled(
    data,
    model,
    config,
    params0=None,
    tile: tuple[int, int, int] | None = None,
    overlap: tuple[int, int, int] | int = 16,
    max_batch: int = 4,
    stats_tile: tuple[int, int, int] | None = None,
    log=None,
):
    """Blind deconvolution of a beyond-HBM volume (host-driven rounds).

    ``data``: host NumPy volume. ``model``: a PSF model config at
    ``psf_shape`` (its grid is the PSF support; lateral dims square, and
    ``2*psf_shape <= data.shape`` per axis — see module docstring).
    ``config``: :class:`jobs.blind.BlindDeconvConfig` — loops, families,
    budgets, ``mu_schedule``, ``joint_fit``, ``deconv_engine`` ("vmlmb" or
    "admm" per tile), skip-last-fit semantics all honored
    (``BlindDeconvJob.java:97-138``). Uniform weights only (the quadratic
    sufficient-statistics reduction needs them; weighted out-of-core fits
    would need a streamed pass per evaluation).

    Per round: tiled object step (``jobs.tiled.tiled_deconvolve``, PSF
    synthesized at ``psf_shape`` from the current parameters) -> one
    streamed statistics pass -> f64 CPU parameter fit. Returns
    ``(obj, params, psf, deconv_f_per_round, fit_f_per_round)`` with
    ``obj`` a host NumPy volume.
    """
    from microtipi_tpu.jobs.tiled import tiled_deconvolve

    data = np.asarray(data)
    psf_shape = tuple(model.shape)
    params = model.init_params() if params0 is None else params0
    model64 = dataclasses.replace(model, dtype=jnp.float64)
    compute_psf = jax.jit(model.compute_psf)

    n_rounds = int(config.loops)
    mu_sched = config.mu_schedule
    deconv_f = []
    fit_f = []
    obj = None
    for i in range(n_rounds):
        cfg = config.deconv
        if mu_sched is not None:
            cfg = dataclasses.replace(cfg, mu=float(mu_sched[i]))
        params_f32 = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), model.dtype), params)
        psf = np.asarray(compute_psf(params_f32))
        method = "admm" if config.deconv_engine == "admm" else "vmlmb"
        obj = tiled_deconvolve(
            data, psf, tile=tile, overlap=overlap, config=cfg,
            method=method, max_batch=max_batch,
        )
        deconv_f.append(np.nan)  # per-tile costs are not globally summable
        if log:
            log(f"round {i + 1}/{n_rounds}: object step done "
                f"(mu={cfg.mu:.4g}, engine={method})")
        if i >= n_rounds - 1 and config.skip_last_fit:
            fit_f.append(np.nan)
            break
        stats = streamed_fit_stats(obj, data, psf_shape, tile=stats_tile)
        families = tuple(config.families)
        budgets = tuple(config.psf_max_iter)
        fit_cfg = config.fit
        if config.joint_fit:
            fcfg = dataclasses.replace(fit_cfg, max_iter=max(budgets),
                                       max_eval=2 * max(budgets))
            params, f, its = fit_psf_streamed(
                model64, params, families, stats, fcfg, joint=True,
                phase_freeze_head=config.phase_freeze_head)
        else:
            f = np.nan
            for fam, budget in zip(families, budgets):
                if budget <= 0:
                    continue
                fcfg = dataclasses.replace(fit_cfg, max_iter=int(budget),
                                           max_eval=2 * int(budget))
                params, f, its = fit_psf_streamed(
                    model64, params, (fam,), stats, fcfg,
                    phase_freeze_head=config.phase_freeze_head)
        fit_f.append(f)
        if log:
            log(f"round {i + 1}/{n_rounds}: fit f={f:.6g}")
    params_f32 = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a), model.dtype), params)
    psf = np.asarray(compute_psf(params_f32))
    return obj, params, psf, np.asarray(deconv_f), np.asarray(fit_f)
