"""cdc_compression_tpu — TPU-native conditional-diffusion image codec framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
buggyyang/CDC_compression ("Lossy Image Compression with Conditional
Diffusion Models", arXiv 2209.06950):

* analysis/synthesis transforms with a Ballé-2018-style hyperprior
  (``models.compressor``),
* a conditional U-Net denoiser (``models.unet``),
* an on-device DDIM/DDPM diffusion engine driven by ``lax.scan``
  (``diffusion.gaussian``),
* real range-coded bitstreams via a C++ rANS coder (``entropy``),
* optax/orbax training with EMA + bf16 (``train``),
* data/tile parallelism over a ``jax.sharding.Mesh`` (``parallel``).

Everything is NHWC, statically shaped, and jit-compilable; the sampling
loop runs fully on device with no per-step host sync.
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
