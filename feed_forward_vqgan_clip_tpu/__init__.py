"""feed_forward_vqgan_clip_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of mehdidc/feed_forward_vqgan_clip.

The system amortizes VQGAN-CLIP: a feed-forward "mapper" network maps a CLIP text
embedding (optionally concatenated with noise) to a VQGAN latent grid; the frozen VQGAN
decoder renders it to RGB, and training minimizes the squared spherical distance between
CLIP embeddings of augmented crops of the render and the prompt embedding
(reference: /root/reference/main.py:1-3, 711-835).

Design notes (TPU-first, not a port):
  * All compute lives in jittable pure functions over parameter pytrees; frozen models
    (CLIP, VQGAN, VGG, flow prior) are non-trained pytrees closed over by one train step.
  * Image tensors are NHWC (TPU-native layout); converters handle the reference's NCHW.
  * Distribution is single-controller JAX: a `jax.sharding.Mesh` with a `data` axis
    (parity with the reference's pure Horovod data-parallelism, main.py:626-629) and an
    optional `model` axis for tensor-sharding large mappers, with XLA collectives over ICI.
  * Randomness is explicit `jax.random` keys threaded through cutouts/augmentations.
"""

__version__ = "0.1.0"

from feed_forward_vqgan_clip_tpu.registry import (  # noqa: F401
    CLIP_DIM,
    CLIP_MEAN,
    CLIP_SIZE,
    CLIP_STD,
)
