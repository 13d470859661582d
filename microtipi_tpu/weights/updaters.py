"""Statistical data-weight models (inverse noise variance).

Rebuild of the TiPi ``WeightUpdater`` surface the reference plumbs through
``BlindDeconvJob`` (``microUtils/BlindDeconvJob.java:58,109-111``): after each
object update, weights are re-estimated from the *current model* (the
convolved object) and fed to the next PSF fit. The pre-deconv update is
deliberately disabled in the reference (commented out at ``:105-107``) and is
likewise not performed here.

Noise model: mixed Poisson-Gaussian detection,

    var_i = max(model_i, 0) / gain  +  readout_variance

so ``w_i = 1 / var_i``, with ``w_i = 0`` for saturated or non-finite data
(zero weight = excluded voxel, the TiPi convention).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["InverseVarianceWeights", "validity_mask"]


def validity_mask(data: jax.Array, saturation: float | None = None) -> jax.Array:
    """1.0 where a voxel is usable, 0.0 where dead/saturated/non-finite."""
    ok = jnp.isfinite(data)
    if saturation is not None:
        ok = ok & (data < saturation)
    return ok.astype(data.dtype)


@dataclasses.dataclass(frozen=True)
class InverseVarianceWeights:
    """Callable weight model; ``gain`` in photo-electrons per count,
    ``readout_variance`` in counts^2. ``gain <= 0`` disables the shot-noise
    term (pure Gaussian noise)."""

    gain: float = 1.0
    readout_variance: float = 1.0
    saturation: float | None = None

    def from_data(self, data: jax.Array) -> jax.Array:
        """Initial weights, using the data itself as the variance predictor."""
        return self._weights(data, data)

    def update(self, model: jax.Array, data: jax.Array) -> jax.Array:
        """Re-estimated weights from the current model prediction H*x —
        what ``wghtUpdt.update(deconvolver)`` computes from
        ``deconvolver.getModel()`` (``BlindDeconvJob.java:109-111``)."""
        return self._weights(model, data)

    def _weights(self, predictor: jax.Array, data: jax.Array) -> jax.Array:
        var = jnp.asarray(self.readout_variance, data.dtype)
        if self.gain > 0:
            var = var + jnp.maximum(predictor, 0.0) / self.gain
        w = 1.0 / jnp.maximum(var, jnp.finfo(data.dtype).tiny)
        return w * validity_mask(data, self.saturation)
