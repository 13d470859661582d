"""Small pytree linear-algebra helpers used by the optimizer.

The reference relies on TiPi's typed vector spaces (``DoubleShapedVector``
etc.) for dot products, norms and axpy; here parameters are arbitrary JAX
pytrees and these helpers provide the same vocabulary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["tdot", "tnorm", "tmax_abs", "taxpy", "tscale", "tsub", "tadd", "tzeros", "twhere"]


def tdot(a, b) -> jax.Array:
    """Sum of elementwise products over all leaves (in f32/f64 of the leaves)."""
    leaves = jax.tree.leaves(jax.tree.map(lambda x, y: jnp.vdot(x, y), a, b))
    return sum(leaves[1:], leaves[0]) if leaves else jnp.asarray(0.0)


def tnorm(a) -> jax.Array:
    return jnp.sqrt(tdot(a, a))


def tmax_abs(a) -> jax.Array:
    leaves = [jnp.max(jnp.abs(x)) if x.size else jnp.asarray(0.0, x.dtype) for x in jax.tree.leaves(a)]
    out = leaves[0]
    for l in leaves[1:]:
        out = jnp.maximum(out, l)
    return out


def taxpy(alpha, x, y):
    """alpha * x + y."""
    return jax.tree.map(lambda xi, yi: alpha * xi + yi, x, y)


def tscale(alpha, x):
    return jax.tree.map(lambda xi: alpha * xi, x)


def tsub(a, b):
    return jax.tree.map(jnp.subtract, a, b)


def tadd(a, b):
    return jax.tree.map(jnp.add, a, b)


def tzeros(a):
    return jax.tree.map(jnp.zeros_like, a)


def twhere(pred, a, b):
    """Elementwise select between two same-structure trees (pred is a tree)."""
    return jax.tree.map(jnp.where, pred, a, b)
