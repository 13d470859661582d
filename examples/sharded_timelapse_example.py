"""Mesh-sharded batched blind deconvolution (BASELINE config 5 shape).

Runs on any device set — demo uses the 8-device virtual CPU mesh so it works
without a TPU pod:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        PYTHONPATH=. python examples/sharded_timelapse_example.py

On a real v5e-8, drop the env vars: the same code lays the (batch, z) mesh
over the pod's ICI.
"""

import numpy as np
import jax
import jax.numpy as jnp

from microtipi_tpu import BlindDeconvConfig, DeconvolutionConfig, WideFieldConfig
from microtipi_tpu.models.microscope import PHASE
from microtipi_tpu.ops.convolution import convolve, convolve_spectrum
from microtipi_tpu.parallel.blind import sharded_blind_deconvolve
from microtipi_tpu.parallel.mesh import make_mesh, volume_sharding

B, VOL = 2, (16, 32, 32)  # scale to (e.g.) 4 x 512^3 on a real pod
mesh = make_mesh(batch=2, z=jax.device_count() // 2)
print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))

model = WideFieldConfig(shape=VOL, na=1.2, wavelength=520e-9, ni=1.33,
                        dxy=100e-9, dz=250e-9, n_phase=3, radial=True)
true = model.init_params()._replace(phase=jnp.asarray([0.4, -0.2, 0.1]))

rng = np.random.default_rng(0)
objs = np.zeros((B,) + VOL, np.float32)
for b in range(B):
    objs[b, 4 + b : 10 + b, 8:24, 8:24] = 60.0
objs = jnp.asarray(objs)
psf = model.compute_psf(true)
frames = jax.vmap(lambda o: convolve(o, convolve_spectrum(psf), VOL))(objs)
frames = frames + 0.01 * jnp.asarray(rng.standard_normal(frames.shape), jnp.float32)

# Shard: batch over 'batch', z over 'z'; one PSF jointly fitted on all frames.
frames = jax.device_put(frames, volume_sharding(mesh, batched=True))
cfg = BlindDeconvConfig(loops=3, families=(PHASE,), psf_max_iter=(10,),
                        deconv=DeconvolutionConfig(mu=0.002, epsilon=1.0, max_iter=15))
res = jax.jit(lambda d: sharded_blind_deconvolve(d, model, mesh, config=cfg))(frames)

print("object cost per round:", np.asarray(res.deconv_f))
print("jointly fitted phase:", np.round(np.asarray(res.params.phase), 3),
      " (true:", np.asarray(true.phase), ")")
err = float(jnp.linalg.norm(res.obj - objs) / jnp.linalg.norm(frames - objs))
print(f"object error ratio vs raw frames: {err:.3f}")
