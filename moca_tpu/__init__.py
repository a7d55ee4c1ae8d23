"""moca_tpu — a TPU-native (JAX/Flax/Pallas) rebuild of the MoCA-Video framework.

MoCA-Video is a training-free video semantic-mixing pipeline built on the
VideoCrafter2 latent video diffusion model: a frozen T2V diffusion model, a
FIFO-Diffusion diagonal-denoising queue for arbitrary-length videos, and a
per-step latent-manipulation stage (mask-guided injection + momentum-based
semantic correction + noise blending).

This package is a from-scratch TPU-first implementation:
  * all compute paths are jit-compiled JAX (Flax models, lax.scan samplers),
  * the FIFO diagonal queue is a device-resident ring buffer; the 2n
    denoising windows per step are batched into a single U-Net call and
    sharded over the device mesh (the reference runs them as sequential
    CUDA calls / one process per GPU),
  * attention hot paths have Pallas TPU kernels with an XLA fallback,
  * randomness is explicit `jax.random` key threading (documented layout),
  * host-side IO (video encode/decode, latent cache) lives outside jit.

Reference behavior parity is tracked against ZhangT-tech/MoCA-Video (file:line
citations in docstrings). Deliberate divergences are listed in DECISIONS.md.
"""

__version__ = "0.1.0"

from moca_tpu import schedule, freeinit  # noqa: F401
