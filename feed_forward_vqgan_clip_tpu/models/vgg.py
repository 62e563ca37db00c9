"""VGG16 conv-feature extractor for the diversity loss.

The reference's diversity term runs `lpips.net(x)` — the raw VGG16 feature slices
(relu1_2, relu2_2, relu3_3, relu4_3, relu5_3), NOT the full LPIPS distance
(/root/reference/main.py:776-791). This module reproduces exactly those 5 slices
in flax NHWC; io/torch_import.convert_vgg16 maps both torchvision ('features.N')
and taming-LPIPS ('net.sliceK.N') checkpoints onto it.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# torchvision vgg16.features conv indices, grouped by LPIPS slice
VGG16_SLICES = (
    (0, 2),  # -> relu1_2
    (5, 7),  # -> relu2_2
    (10, 12, 14),  # -> relu3_3
    (17, 19, 21),  # -> relu4_3
    (24, 26, 28),  # -> relu5_3
)
VGG16_CHANNELS = {
    0: 64, 2: 64, 5: 128, 7: 128, 10: 256, 12: 256, 14: 256,
    17: 512, 19: 512, 21: 512, 24: 512, 26: 512, 28: 512,
}


class VGG16Features(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) -> list of 5 NHWC feature maps (relu1_2 .. relu5_3)."""
        outs = []
        h = x.astype(self.dtype)
        for si, conv_ids in enumerate(VGG16_SLICES):
            if si > 0:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            for ci in conv_ids:
                h = nn.Conv(
                    VGG16_CHANNELS[ci], (3, 3), padding=1, dtype=self.dtype,
                    name=f"conv_{ci}",
                )(h)
                h = nn.relu(h)
            outs.append(h)
        return outs
