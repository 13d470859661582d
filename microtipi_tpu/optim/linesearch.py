"""More-Thuente line search satisfying the strong Wolfe conditions.

Functional JAX recast of the classic MINPACK ``dcsrch``/``dcstep`` algorithm
(More & Thuente 1994), which is what TiPi's ``MoreThuenteLineSearch`` wraps.
The reference builds it with ``(sftol, sgtol, sxtol) = (0.05, 0.1, 1e-17)``
(``microscopy/PSF_Estimation.java:186``) — those are the defaults here.

The reference drives its optimizer by *reverse communication* (the caller is
asked to produce f/g between calls, ``PSF_Estimation.java:199-251``). Under
``jax.jit`` that inverts: the objective is a traceable closure ``phi`` passed
in, and the whole search is one ``lax.while_loop`` with exactly one objective
evaluation per trip.

``phi(alpha) -> (f, df, aux)`` where ``df`` is the directional derivative at
``alpha`` and ``aux`` is any pytree to carry (typically the full gradient, so
the optimizer does not recompute it at the accepted point).

Status codes: 0 = converged (strong Wolfe), 1 = xtol/interval warning
(best point returned), 2 = evaluation budget exhausted.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["more_thuente", "LineSearchResult"]

_XTRAPL = 1.1
_XTRAPU = 4.0


def _dcstep(stx, fx, dx, sty, fy, dy, stp, fp, dp, brackt, stpmin, stpmax):
    """One trial-step update of the MINPACK dcstep interpolation.

    All-scalar, branch-free: the four interpolation cases are computed and
    selected with ``where`` (unselected branches may contain NaN/inf, which
    ``where`` discards).
    """
    one = jnp.asarray(1.0, stp.dtype)

    def safe_div(p, q):
        return jnp.where(q != 0, p / jnp.where(q != 0, q, one), jnp.zeros_like(p))

    sgnd = dp * jnp.sign(dx)

    # --- case 1: higher function value -> minimum bracketed -----------------
    theta1 = 3.0 * safe_div(fx - fp, stp - stx) + dx + dp
    s1 = jnp.maximum(jnp.abs(theta1), jnp.maximum(jnp.abs(dx), jnp.abs(dp)))
    g1 = s1 * jnp.sqrt(jnp.maximum((safe_div(theta1, s1)) ** 2 - safe_div(dx, s1) * safe_div(dp, s1), 0.0))
    g1 = jnp.where(stp < stx, -g1, g1)
    p1 = (g1 - dx) + theta1
    q1 = ((g1 - dx) + g1) + dp
    stpc1 = stx + safe_div(p1, q1) * (stp - stx)
    stpq1 = stx + safe_div(dx, safe_div(fx - fp, stp - stx) + dx) / 2.0 * (stp - stx)
    stpf1 = jnp.where(
        jnp.abs(stpc1 - stx) < jnp.abs(stpq1 - stx), stpc1, stpc1 + (stpq1 - stpc1) / 2.0
    )

    # --- case 2: lower value, derivatives of opposite sign ------------------
    theta2 = theta1
    s2 = s1
    g2 = s2 * jnp.sqrt(jnp.maximum((safe_div(theta2, s2)) ** 2 - safe_div(dx, s2) * safe_div(dp, s2), 0.0))
    g2 = jnp.where(stp > stx, -g2, g2)
    p2 = (g2 - dp) + theta2
    q2 = ((g2 - dp) + g2) + dx
    stpc2 = stp + safe_div(p2, q2) * (stx - stp)
    stpq2 = stp + safe_div(dp, dp - dx) * (stx - stp)
    stpf2 = jnp.where(jnp.abs(stpc2 - stp) > jnp.abs(stpq2 - stp), stpc2, stpq2)

    # --- case 3: lower value, same sign, decreasing derivative magnitude ----
    theta3 = theta1
    s3 = s1
    g3 = s3 * jnp.sqrt(jnp.maximum((safe_div(theta3, s3)) ** 2 - safe_div(dx, s3) * safe_div(dp, s3), 0.0))
    g3 = jnp.where(stp > stx, -g3, g3)
    p3 = (g3 - dp) + theta3
    q3 = (g3 + (dx - dp)) + g3
    r3 = safe_div(p3, q3)
    stpc3 = jnp.where(
        (r3 < 0.0) & (g3 != 0.0),
        stp + r3 * (stx - stp),
        jnp.where(stp > stx, stpmax, stpmin),
    )
    stpq3 = stp + safe_div(dp, dp - dx) * (stx - stp)
    stpf3_brackt = jnp.where(jnp.abs(stpc3 - stp) < jnp.abs(stpq3 - stp), stpc3, stpq3)
    stpf3_brackt = jnp.where(
        stp > stx,
        jnp.minimum(stp + 0.66 * (sty - stp), stpf3_brackt),
        jnp.maximum(stp + 0.66 * (sty - stp), stpf3_brackt),
    )
    stpf3_free = jnp.where(jnp.abs(stpc3 - stp) > jnp.abs(stpq3 - stp), stpc3, stpq3)
    stpf3_free = jnp.clip(stpf3_free, stpmin, stpmax)
    stpf3 = jnp.where(brackt, stpf3_brackt, stpf3_free)

    # --- case 4: lower value, same sign, non-decreasing magnitude -----------
    theta4 = 3.0 * safe_div(fp - fy, sty - stp) + dy + dp
    s4 = jnp.maximum(jnp.abs(theta4), jnp.maximum(jnp.abs(dy), jnp.abs(dp)))
    g4 = s4 * jnp.sqrt(jnp.maximum((safe_div(theta4, s4)) ** 2 - safe_div(dy, s4) * safe_div(dp, s4), 0.0))
    g4 = jnp.where(stp > sty, -g4, g4)
    p4 = (g4 - dp) + theta4
    q4 = ((g4 - dp) + g4) + dy
    stpc4 = stp + safe_div(p4, q4) * (sty - stp)
    stpf4 = jnp.where(brackt, stpc4, jnp.where(stp > stx, stpmax, stpmin))

    case1 = fp > fx
    case2 = (~case1) & (sgnd < 0.0)
    case3 = (~case1) & (~case2) & (jnp.abs(dp) < jnp.abs(dx))
    stpf = jnp.where(case1, stpf1, jnp.where(case2, stpf2, jnp.where(case3, stpf3, stpf4)))

    # Uniform interval update.
    sty_n = jnp.where(case1, stp, jnp.where(sgnd < 0.0, stx, sty))
    fy_n = jnp.where(case1, fp, jnp.where(sgnd < 0.0, fx, fy))
    dy_n = jnp.where(case1, dp, jnp.where(sgnd < 0.0, dx, dy))
    stx_n = jnp.where(case1, stx, stp)
    fx_n = jnp.where(case1, fx, fp)
    dx_n = jnp.where(case1, dx, dp)
    brackt_n = brackt | case1 | case2

    return stx_n, fx_n, dx_n, sty_n, fy_n, dy_n, stpf, brackt_n


class LineSearchResult(NamedTuple):
    step: jax.Array
    f: jax.Array
    df: jax.Array
    aux: Any
    evals: jax.Array
    status: jax.Array  # 0 converged, 1 warning (best point), 2 eval budget
    # Best *trial* seen across every evaluation, Wolfe-accepted or not — the
    # reference tracks best-x at every cost evaluation inside its
    # reverse-communication loop (PSF_Estimation.java:208-216), so a
    # maxeval-truncated fit can still return a strictly better point than the
    # last accepted iterate.
    best_step: jax.Array = None
    best_f: jax.Array = None


def more_thuente(
    phi: Callable[[jax.Array], tuple[jax.Array, jax.Array, Any]],
    step0: jax.Array,
    f0: jax.Array,
    df0: jax.Array,
    aux0: Any,
    ftol: float = 0.05,
    gtol: float = 0.1,
    xtol: float = 1e-17,
    step_min: float = 1e-20,
    step_max: float = 1e20,
    max_evals: int = 20,
) -> LineSearchResult:
    """Find a step satisfying ``f(a) <= f0 + ftol*a*df0`` and
    ``|f'(a)| <= gtol*|df0|`` along a descent direction (``df0 < 0``)."""
    dtype = f0.dtype
    step0 = jnp.asarray(step0, dtype)
    stpmin = jnp.asarray(step_min, dtype)
    stpmax = jnp.asarray(step_max, dtype)
    gtest = ftol * df0
    width0 = stpmax - stpmin

    # First trial evaluation at step0.
    f_t, df_t, aux_t = phi(step0)

    state = dict(
        stp=step0, f=f_t, df=df_t, aux=aux_t,
        stx=jnp.zeros((), dtype), fx=f0, dx=df0,
        sty=jnp.zeros((), dtype), fy=f0, dy=df0,
        brackt=jnp.asarray(False),
        stage1=jnp.asarray(True),
        width=width0, width1=2.0 * width0,
        stmin=jnp.zeros((), dtype), stmax=step0 + _XTRAPU * step0,
        evals=jnp.asarray(1, jnp.int32),
        done=jnp.asarray(False),
        status=jnp.asarray(2, jnp.int32),
        best_step=step0, best_f=f_t,
    )

    def cond(s):
        return ~s["done"]

    def body(s):
        stp, f, df = s["stp"], s["f"], s["df"]
        ftest = f0 + stp * gtest
        stage1 = s["stage1"] & ~((f <= ftest) & (df >= 0.0))

        converged = (f <= ftest) & (jnp.abs(df) <= gtol * (-df0))
        warn = (
            (s["brackt"] & ((stp <= s["stmin"]) | (stp >= s["stmax"])))
            | (s["brackt"] & (s["stmax"] - s["stmin"] <= xtol * s["stmax"]))
            | ((stp == stpmax) & (f <= ftest) & (df <= gtest))
            | ((stp == stpmin) & ((f > ftest) | (df >= gtest)))
        )
        done_now = converged | warn | (s["evals"] >= max_evals)
        status = jnp.where(converged, 0, jnp.where(warn, 1, 2)).astype(jnp.int32)

        # Modified-function trick while in stage 1 above the ftest line.
        use_mod = stage1 & (f <= s["fx"]) & (f > ftest)
        fm = jnp.where(use_mod, f - stp * gtest, f)
        fxm = jnp.where(use_mod, s["fx"] - s["stx"] * gtest, s["fx"])
        fym = jnp.where(use_mod, s["fy"] - s["sty"] * gtest, s["fy"])
        dm = jnp.where(use_mod, df - gtest, df)
        dxm = jnp.where(use_mod, s["dx"] - gtest, s["dx"])
        dym = jnp.where(use_mod, s["dy"] - gtest, s["dy"])

        stx_n, fx_n, dx_n, sty_n, fy_n, dy_n, stp_n, brackt_n = _dcstep(
            s["stx"], fxm, dxm, s["sty"], fym, dym, stp, fm, dm,
            s["brackt"], s["stmin"], s["stmax"],
        )

        fx_n = jnp.where(use_mod, fx_n + stx_n * gtest, fx_n)
        fy_n = jnp.where(use_mod, fy_n + sty_n * gtest, fy_n)
        dx_n = jnp.where(use_mod, dx_n + gtest, dx_n)
        dy_n = jnp.where(use_mod, dy_n + gtest, dy_n)

        # Force the interval width to shrink.
        shrink = brackt_n & (jnp.abs(sty_n - stx_n) >= 0.66 * s["width1"])
        stp_n = jnp.where(shrink, stx_n + 0.5 * (sty_n - stx_n), stp_n)
        width1_n = jnp.where(brackt_n, s["width"], s["width1"])
        width_n = jnp.where(brackt_n, jnp.abs(sty_n - stx_n), s["width"])

        stmin_n = jnp.where(brackt_n, jnp.minimum(stx_n, sty_n), stp_n + _XTRAPL * (stp_n - stx_n))
        stmax_n = jnp.where(brackt_n, jnp.maximum(stx_n, sty_n), stp_n + _XTRAPU * (stp_n - stx_n))
        stp_n = jnp.clip(stp_n, stpmin, stpmax)

        # If no further progress is possible, evaluate at the best point.
        stuck = brackt_n & ((stp_n <= stmin_n) | (stp_n >= stmax_n) | (stmax_n - stmin_n <= xtol * stmax_n))
        stp_n = jnp.where(stuck, stx_n, stp_n)

        # One new evaluation (skipped on exit by keeping old values).
        def evaluate(_):
            return phi(stp_n)

        def keep(_):
            return f, df, s["aux"]

        f_n, df_n, aux_n = lax.cond(done_now, keep, evaluate, None)
        evals_n = s["evals"] + jnp.where(done_now, 0, 1).astype(jnp.int32)

        better = (~done_now) & (f_n < s["best_f"])
        return dict(
            stp=jnp.where(done_now, stp, stp_n), f=f_n, df=df_n, aux=aux_n,
            stx=stx_n, fx=fx_n, dx=dx_n, sty=sty_n, fy=fy_n, dy=dy_n,
            brackt=brackt_n, stage1=stage1,
            width=width_n, width1=width1_n,
            stmin=stmin_n, stmax=stmax_n,
            evals=evals_n, done=done_now, status=status,
            best_step=jnp.where(better, stp_n, s["best_step"]),
            best_f=jnp.where(better, f_n, s["best_f"]),
        )

    out = lax.while_loop(cond, body, state)
    return LineSearchResult(
        out["stp"], out["f"], out["df"], out["aux"], out["evals"], out["status"],
        out["best_step"], out["best_f"],
    )
