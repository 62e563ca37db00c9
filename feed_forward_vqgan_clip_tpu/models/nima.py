"""NIMA (Neural IMage Assessment) quality scorer.

TPU-native replacement for the reference's optional pyiqa quality filter in the
webdataset encoder (/root/reference/main.py:308-312, 348-354): NIMA predicts a
10-bin aesthetic score distribution; the mean opinion score (MOS)
sum_i (i+1) p_i gates samples against `image_quality_threshold`.

Two trunks:
  * "inception_resnet_v2" — pyiqa's STOCK `nima` backbone (Cadene/timm port,
    models/inception_resnet.py), so the released AVA-trained checkpoint
    converts directly (io/torch_import.convert_nima auto-detects the trunk
    from the state-dict key grammar). Normalization follows the inception
    convention the timm trunk is trained with (mean = std = 0.5 -> [-1, 1]).
  * "inception_v3" — the lightweight in-repo alternative on the FID feature
    trunk (ImageNet mean/std), kept from round 2.

Inputs are [0,1] RGB NHWC; normalization happens inside (pyiqa does the same
internally — the reference therefore de-normalizes CLIP batches before
scoring, main.py:349).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
INCEPTION_MEAN = (0.5, 0.5, 0.5)
INCEPTION_STD = (0.5, 0.5, 0.5)


class NIMA(nn.Module):
    """Feature trunk -> 10-way softmax -> mean opinion score (B,)."""

    backbone: str = "inception_resnet_v2"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.backbone == "inception_resnet_v2":
            from feed_forward_vqgan_clip_tpu.models.inception_resnet import (
                InceptionResNetV2Features,
            )

            mean, std = INCEPTION_MEAN, INCEPTION_STD
            trunk = InceptionResNetV2Features(dtype=self.dtype, name="backbone")
        elif self.backbone == "inception_v3":
            from feed_forward_vqgan_clip_tpu.models.inception import (
                InceptionV3Features,
            )

            mean, std = IMAGENET_MEAN, IMAGENET_STD
            trunk = InceptionV3Features(dtype=self.dtype, name="backbone")
        else:
            raise ValueError(f"unknown NIMA backbone {self.backbone!r}")
        m = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, 3)
        s = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, 3)
        h = ((x - m) / s).astype(self.dtype)
        feats = trunk(h)
        logits = nn.Dense(10, dtype=jnp.float32, name="classifier")(
            feats.astype(jnp.float32)
        )
        p = jax.nn.softmax(logits, axis=-1)
        bins = jnp.arange(1, 11, dtype=jnp.float32)
        return jnp.sum(p * bins, axis=-1)


def detect_nima_backbone(sd) -> str:
    """Trunk from a torch NIMA state dict's key grammar (see convert_nima)."""
    for k in sd:
        base = k
        for prefix in ("module.", "base_model.", "backbone.", "features.", "model."):
            if base.startswith(prefix):
                base = base[len(prefix):]
        if base.startswith("conv2d_1a."):
            return "inception_resnet_v2"
        if base.startswith("Conv2d_1a_3x3."):
            return "inception_v3"
    return "inception_resnet_v2"


def make_nima_fn(weights_path: str = None, dtype=jnp.float32, backbone: str = None):
    """Jitted [0,1]-RGB-NHWC -> MOS scorer. The trunk is auto-detected from the
    checkpoint when weights are given; random head without weights (smoke)."""
    if weights_path:
        from feed_forward_vqgan_clip_tpu.io.torch_import import (
            convert_nima,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(weights_path)
        backbone = backbone or detect_nima_backbone(sd)
        model = NIMA(backbone=backbone, dtype=dtype)
        params = convert_nima(sd)
    else:
        model = NIMA(backbone=backbone or "inception_resnet_v2", dtype=dtype)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
    return jax.jit(lambda x: model.apply(params, x))
