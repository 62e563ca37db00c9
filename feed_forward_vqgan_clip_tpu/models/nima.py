"""NIMA (Neural IMage Assessment) quality scorer.

TPU-native replacement for the reference's optional pyiqa quality filter in the
webdataset encoder (/root/reference/main.py:308-312, 348-354): NIMA predicts a
10-bin aesthetic score distribution; the mean opinion score (MOS)
sum_i (i+1) p_i gates samples against `image_quality_threshold`.

Backbone deviation (documented in README): pyiqa's default `nima` metric runs
an InceptionResNetV2 backbone (AVA-trained); here the head sits on the in-repo
InceptionV3 feature extractor (models/inception.py) — same 10-way
softmax head and MOS reduction, and `convert_nima` accepts any torch state
dict in the torchvision-NIMA layout ({base_model|features}.* backbone +
{classifier|head}.{N}.weight/bias 10-way linear), so an InceptionV3-based NIMA
checkpoint loads directly. Inputs are [0,1] RGB NHWC; ImageNet normalization
happens inside (pyiqa does the same internally — the reference therefore
de-normalizes CLIP batches before scoring, main.py:349).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.models.inception import InceptionV3Features

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class NIMA(nn.Module):
    """InceptionV3 trunk -> 10-way softmax -> mean opinion score (B,)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32).reshape(1, 1, 1, 3)
        std = jnp.asarray(IMAGENET_STD, jnp.float32).reshape(1, 1, 1, 3)
        h = ((x - mean) / std).astype(self.dtype)
        feats = InceptionV3Features(dtype=self.dtype, name="backbone")(h)
        logits = nn.Dense(10, dtype=jnp.float32, name="classifier")(
            feats.astype(jnp.float32)
        )
        p = jax.nn.softmax(logits, axis=-1)
        bins = jnp.arange(1, 11, dtype=jnp.float32)
        return jnp.sum(p * bins, axis=-1)


def make_nima_fn(weights_path: str = None, dtype=jnp.float32):
    """Jitted [0,1]-RGB-NHWC -> MOS scorer; random head without weights."""
    model = NIMA(dtype=dtype)
    if weights_path:
        from feed_forward_vqgan_clip_tpu.io.torch_import import (
            convert_nima,
            load_torch_state_dict,
        )

        params = convert_nima(load_torch_state_dict(weights_path))
    else:
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
    return jax.jit(lambda x: model.apply(params, x))
