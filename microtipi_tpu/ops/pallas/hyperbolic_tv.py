"""Fused Pallas TPU kernel: hyperbolic-TV cost *and* gradient in one pass.

Every VMLMB evaluation needs both f and grad f. XLA's autodiff of the jnp
reference (``ops.regularization``) runs a forward pass (3 shifted diffs +
sqrt) and a separate backward pass (re-reads the diffs, scatters three shifted
terms) — several full sweeps of HBM for a purely bandwidth-bound op. This
kernel computes both in a single sweep.

Math (forward differences, per-axis scale s_a, D(v) = sqrt(sum_a d_a(v)^2 + eps^2)):

    cost    = sum_v (D(v) - eps)
    w_a(v)  = d_a(v) / (s_a * D(v))
    grad(u) = sum_a (w_a(u - e_a) - w_a(u))

Plane decomposition: grad at plane iz needs d/D on planes iz-1 (for the
incoming w_z term) and iz (everything else), which in turn touch x planes
iz-1, iz, iz+1. The grid runs over z with three input views of x whose index
maps are the clamped iz-1 / iz / iz+1 planes — three streaming reads of x and
one write of grad, no intermediate arrays. Per-plane cost partials land in a
(Nz,) output and are summed by XLA.

Wrapped in ``jax.custom_vjp`` so ``jax.value_and_grad`` over an objective
containing this TV runs the kernel exactly once per evaluation: the gradient
is a forward-pass byproduct; the backward rule is a single scale.

Exactness: matches ``ops.regularization.hyperbolic_tv`` to float32 round-off
(tested in tests/test_pallas_tv.py); the CPU/interpret path keeps tests
runnable without a TPU.

vmap: JAX's default pallas batching of this kernel crashes Mosaic (batched
squeezed-plane/SMEM BlockSpecs — observed on-chip driving the tiled
solver), so ``_tv_pallas`` carries a ``custom_vmap`` rule routing vmapped
traces to a batched kernel on a FLATTENED (B*Nz,) grid over a reshaped
(B*Nz, Ny, Nx) view — blocks stay rank-3 (the earlier (B, Nz)-grid variant
with rank-4 blocks moved at half the streaming rate and lost to the jnp TV,
8.9 vs 5.2 ms at 8x32x128x128; BASELINE.md). Measured on-chip 2026-08-19:
the flat-grid kernel beats the vmapped jnp TV 1.32x at 4x64x256x256
(3.12 vs 4.12 ms/eval) and ties at 8x32x128x128 (2.49 vs 2.51 — 128-wide
rows underutilize the lanes), so batched/tiled solvers now use the standard
fused_tv auto rule (fused on TPU) instead of forcing the jnp path. One
level of vmap only (a second level would hit default pallas batching of the
flat kernel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["hyperbolic_tv_fused", "hyperbolic_tv_value"]


def _shift_minus(a: jax.Array, axis: int) -> jax.Array:
    """a(u - e_axis) with zero fill at the leading face (2D plane ops)."""
    pad = [(0, 0), (0, 0)]
    pad[axis] = (1, 0)
    sl = [slice(None), slice(None)]
    sl[axis] = slice(0, a.shape[axis])
    return jnp.pad(a, pad)[tuple(sl)]


def _plane_dw(x0, x1, inv_sz, inv_sy, inv_sx, eps, is_last_z):
    """Per-plane diffs d_a, denominator D and weights w_a for plane x0,
    with x1 the next plane (d_z masked on the last plane)."""
    dz = (x1 - x0) * inv_sz
    dz = jnp.where(is_last_z, 0.0, dz)
    # Replicate-pad construction: the trailing-face difference is x-x = 0
    # by itself, so no masking (and no Mosaic-unfriendly scatter) is needed.
    dy = (jnp.concatenate([x0[1:, :], x0[-1:, :]], axis=0) - x0) * inv_sy
    dx = (jnp.concatenate([x0[:, 1:], x0[:, -1:]], axis=1) - x0) * inv_sx
    denom = jnp.sqrt(dz * dz + dy * dy + dx * dx + eps * eps)
    inv_d = 1.0 / denom
    return denom, dz * inv_d * inv_sz, dy * inv_d * inv_sy, dx * inv_d * inv_sx


def _tv_kernel(xm_ref, x0_ref, xp_ref, grad_ref, cost_ref, *, inv_scales, eps, nz):
    iz = pl.program_id(0)
    inv_sz, inv_sy, inv_sx = inv_scales
    x0 = x0_ref[0]
    xp = xp_ref[0]
    xm = xm_ref[0]
    is_last = iz == nz - 1
    is_first = iz == 0

    denom, wz, wy, wx = _plane_dw(x0, xp, inv_sz, inv_sy, inv_sx, eps, is_last)
    # Incoming z-term: w_z of the previous plane (recomputed from xm, x0).
    _, wz_prev, _, _ = _plane_dw(xm, x0, inv_sz, inv_sy, inv_sx, eps, False)
    wz_prev = jnp.where(is_first, jnp.zeros_like(wz_prev), wz_prev)

    grad = (
        wz_prev - wz
        + _shift_minus(wy, 0) - wy
        + _shift_minus(wx, 1) - wx
    )
    grad_ref[0] = grad

    # Per-plane cost partial: each grid step owns its own slot of the (Nz,)
    # SMEM buffer (Mosaic requires rank-1 blocks to span the array, so the
    # whole buffer is mapped and indexed by iz; the grid is sequential per
    # core so the writes are race-free). The final reduction happens outside
    # the kernel as an XLA pairwise sum — sequentially accumulating Nz
    # plane-sums in one f32 cell loses ~3-4 digits at 512^3 and made the
    # Wolfe test twitchy near convergence.
    cost_ref[iz] = jnp.sum(denom - eps, dtype=jnp.float32)


def _tv_kernel_blocked(xm_ref, x0_ref, xp_ref, grad_ref, cost_ref, *,
                       inv_scales, eps, nz, kp):
    """K-planes-per-step variant (kp = K): the per-plane grid reads every x
    plane THREE times (the iz-1 / iz / iz+1 views); here a step owns K
    planes and the halo is two single-plane edge views, so the read
    amplification drops from 3x to (K+2)/K and Mosaic gets a longer
    pipeline per step. The w_z chain is reused across the in-block planes
    (each plane's incoming z-term is the previous plane's outgoing one),
    so the edge recomputation happens once per BLOCK instead of once per
    plane. Same math as :func:`_tv_kernel` to f32 round-off."""
    kb = pl.program_id(0)
    inv_sz, inv_sy, inv_sx = inv_scales
    z0 = kb * kp

    # Incoming w_z for the block's first plane, from the edge plane before.
    _, wz_in, _, _ = _plane_dw(xm_ref[0], x0_ref[0], inv_sz, inv_sy, inv_sx,
                               eps, False)
    wz_in = jnp.where(z0 == 0, jnp.zeros_like(wz_in), wz_in)

    cost = jnp.zeros((), jnp.float32)
    for j in range(kp):  # static unroll: 2D plane math throughout
        x0 = x0_ref[j]
        xn = x0_ref[j + 1] if j + 1 < kp else xp_ref[0]
        denom, wz, wy, wx = _plane_dw(x0, xn, inv_sz, inv_sy, inv_sx, eps,
                                      z0 + j == nz - 1)
        grad_ref[j] = (
            wz_in - wz
            + _shift_minus(wy, 0) - wy
            + _shift_minus(wx, 1) - wx
        )
        cost = cost + jnp.sum(denom - eps, dtype=jnp.float32)
        wz_in = wz
    cost_ref[kb] = cost


def _tv_pallas_impl(x: jax.Array, epsilon: float, scales, interpret: bool):
    nz, ny, nx = x.shape
    inv_scales = tuple(1.0 / s for s in (scales or (1.0, 1.0, 1.0)))
    eps = float(epsilon)

    kp = next((k for k in (8, 4, 2) if nz % k == 0 and nz > k), None)
    if kp is not None:
        kernel = partial(_tv_kernel_blocked, inv_scales=inv_scales, eps=eps,
                         nz=nz, kp=kp)
        nb = nz // kp
        edge = lambda f: pl.BlockSpec((1, ny, nx), f, memory_space=pltpu.VMEM)
        grad, cost_partials = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                # plane before the block / the K planes / plane after
                edge(lambda k: (jnp.maximum(k * kp - 1, 0), 0, 0)),
                pl.BlockSpec((kp, ny, nx), lambda k: (k, 0, 0),
                             memory_space=pltpu.VMEM),
                edge(lambda k: (jnp.minimum(k * kp + kp, nz - 1), 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((kp, ny, nx), lambda k: (k, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb,), lambda k: (0,), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(x.shape, x.dtype),
                jax.ShapeDtypeStruct((nb,), jnp.float32),
            ],
            interpret=interpret,
        )(x, x, x)
        return jnp.sum(cost_partials).astype(x.dtype), grad

    kernel = partial(_tv_kernel, inv_scales=inv_scales, eps=eps, nz=nz)
    plane = lambda f: pl.BlockSpec((1, ny, nx), f, memory_space=pltpu.VMEM)
    grad, cost_partials = pl.pallas_call(
        kernel,
        grid=(nz,),
        in_specs=[
            plane(lambda k: (jnp.maximum(k - 1, 0), 0, 0)),  # x[iz-1] (clamped)
            plane(lambda k: (k, 0, 0)),                      # x[iz]
            plane(lambda k: (jnp.minimum(k + 1, nz - 1), 0, 0)),  # x[iz+1] (clamped)
        ],
        out_specs=[
            pl.BlockSpec((1, ny, nx), lambda k: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nz,), lambda k: (0,), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((nz,), jnp.float32),
        ],
        interpret=interpret,
    )(x, x, x)
    return jnp.sum(cost_partials).astype(x.dtype), grad


def _tv_kernel_flat(xm_ref, x0_ref, xp_ref, grad_ref, cost_ref, *, inv_scales, eps, nz):
    """Batched variant on a FLATTENED (B*Nz,) grid over a (B*Nz, Ny, Nx)
    view: blocks stay rank-3 like the single-volume kernel (4D blocks were
    measured at ~half the streaming rate on this toolchain — BASELINE.md),
    and the volume boundaries come back via div/rem index arithmetic."""
    k = pl.program_id(0)
    iz = jax.lax.rem(k, jnp.asarray(nz, k.dtype))
    inv_sz, inv_sy, inv_sx = inv_scales
    x0 = x0_ref[0]
    xp = xp_ref[0]
    xm = xm_ref[0]
    is_last = iz == nz - 1
    is_first = iz == 0

    denom, wz, wy, wx = _plane_dw(x0, xp, inv_sz, inv_sy, inv_sx, eps, is_last)
    _, wz_prev, _, _ = _plane_dw(xm, x0, inv_sz, inv_sy, inv_sx, eps, False)
    wz_prev = jnp.where(is_first, jnp.zeros_like(wz_prev), wz_prev)

    grad_ref[0] = (
        wz_prev - wz
        + _shift_minus(wy, 0) - wy
        + _shift_minus(wx, 1) - wx
    )
    cost_ref[k] = jnp.sum(denom - eps, dtype=jnp.float32)


def _tv_pallas_batched(x: jax.Array, epsilon: float, scales, interpret: bool):
    """(per-volume cost (B,), grad (B, Nz, Ny, Nx)) for a batched stack —
    the vmap routing target (see ``_tv_pallas``)."""
    b, nz, ny, nx = x.shape
    inv_scales = tuple(1.0 / s for s in (scales or (1.0, 1.0, 1.0)))
    eps = float(epsilon)
    xf = x.reshape(b * nz, ny, nx)

    # Clamped within-volume neighbor planes on the flat axis: plane k = (ib,
    # iz) reads ib*nz + clamp(iz +- 1) — never a neighboring volume's plane.
    def _prev(k):
        n = jnp.asarray(nz, k.dtype)
        ib, iz = jax.lax.div(k, n), jax.lax.rem(k, n)
        return (ib * n + jnp.maximum(iz - 1, 0), 0, 0)

    def _next(k):
        n = jnp.asarray(nz, k.dtype)
        ib, iz = jax.lax.div(k, n), jax.lax.rem(k, n)
        return (ib * n + jnp.minimum(iz + 1, n - 1), 0, 0)

    kernel = partial(_tv_kernel_flat, inv_scales=inv_scales, eps=eps, nz=nz)
    plane = lambda f: pl.BlockSpec((1, ny, nx), f, memory_space=pltpu.VMEM)
    grad, cost_partials = pl.pallas_call(
        kernel,
        grid=(b * nz,),
        in_specs=[plane(_prev), plane(lambda k: (k, 0, 0)), plane(_next)],
        out_specs=[
            pl.BlockSpec((1, ny, nx), lambda k: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b * nz,), lambda k: (0,), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xf.shape, x.dtype),
            jax.ShapeDtypeStruct((b * nz,), jnp.float32),
        ],
        interpret=interpret,
    )(xf, xf, xf)
    cost = jnp.sum(cost_partials.reshape(b, nz), axis=1).astype(x.dtype)
    return cost, grad.reshape(x.shape)


def _tv_pallas(x: jax.Array, epsilon: float, scales, interpret: bool):
    """Single-volume fused TV with a custom vmap rule: a vmapped trace
    routes to the (B, Nz)-grid batched kernel instead of JAX's default
    pallas batching, whose squeezed-plane/SMEM BlockSpecs Mosaic rejects
    on TPU. One level of vmap only (a second level would re-batch the
    batched kernel)."""

    @jax.custom_batching.custom_vmap
    def call(x):
        return _tv_pallas_impl(x, epsilon, scales, interpret)

    @call.def_vmap
    def _rule(axis_size, in_batched, bx):  # noqa: ANN001 - jax protocol
        if not in_batched[0]:
            return _tv_pallas_impl(bx, epsilon, scales, interpret), (False, False)
        cost, grad = _tv_pallas_batched(bx, epsilon, scales, interpret)
        return (cost, grad), (True, True)

    return call(x)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def hyperbolic_tv_value(x, epsilon: float, scales=None, interpret: bool = False):
    """Differentiable hyperbolic-TV cost backed by the fused kernel.

    Drop-in for ``ops.regularization.hyperbolic_tv`` on 3D volumes; under
    ``jax.value_and_grad`` the kernel runs once and the gradient is reused.
    """
    return _tv_pallas(x, epsilon, scales, interpret)[0]


def _tv_fwd(x, epsilon, scales, interpret):
    cost, grad = _tv_pallas(x, epsilon, scales, interpret)
    return cost, grad


def _tv_bwd(epsilon, scales, interpret, grad, g):
    return (g * grad,)


hyperbolic_tv_value.defvjp(_tv_fwd, _tv_bwd)


def hyperbolic_tv_fused(x, epsilon: float, scales=None, interpret: bool = False):
    """(cost, gradient) from one kernel sweep — the fused primitive itself."""
    return _tv_pallas(x, epsilon, scales, interpret)
