"""InceptionV3 pool3 feature extractor for FID (flax, NHWC).

Replaces piq's InceptionV3 feature extractor (/root/reference/main.py:1148-1152,
1220-1224): torchvision inception_v3 topology up to the 2048-d global-average
pool, BasicConv2d = conv(no bias) + BN(eps=1e-3) + relu, frozen inference mode.
`convert_inception` (io/torch_import.py) maps both torchvision and the standard
FID-port checkpoints (same key names) onto it.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.models.clip_resnet import FrozenBatchNorm


class BasicConv2d(nn.Module):
    out_ch: int
    kernel: Sequence[int] = (3, 3)
    stride: int = 1
    padding: Any = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        h = nn.Conv(
            self.out_ch, tuple(self.kernel), strides=self.stride, padding=pad,
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        h = FrozenBatchNormEps3(self.out_ch, self.dtype, name="bn")(h)
        return nn.relu(h)


class FrozenBatchNormEps3(FrozenBatchNorm):
    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        inv = (scale / jnp.sqrt(var + 1e-3)).astype(self.dtype)
        return x * inv + (bias - mean * scale / jnp.sqrt(var + 1e-3)).astype(self.dtype)


def _avgpool3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


def _maxpool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, dtype=self.dtype, name="branch5x5_2")(b5)
        bd = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype, name="branch3x3dbl_3")(bd)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=self.dtype, name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b5, bd, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, dtype=self.dtype, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, dtype=self.dtype, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype, name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, dtype=self.dtype, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype, name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype, name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, dtype=self.dtype, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype, name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype, name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype, name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype, name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """x: (B, H, W, 3) in [0, 1] -> (B, 2048) pool3 features. Input is resized to
    299 and scaled to [-1, 1] like the standard FID pipeline."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import jax

        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        h = (x * 2.0 - 1.0).astype(self.dtype)
        h = BasicConv2d(32, (3, 3), stride=2, dtype=self.dtype, name="Conv2d_1a_3x3")(h)
        h = BasicConv2d(32, (3, 3), dtype=self.dtype, name="Conv2d_2a_3x3")(h)
        h = BasicConv2d(64, (3, 3), padding=1, dtype=self.dtype, name="Conv2d_2b_3x3")(h)
        h = _maxpool3s2(h)
        h = BasicConv2d(80, (1, 1), dtype=self.dtype, name="Conv2d_3b_1x1")(h)
        h = BasicConv2d(192, (3, 3), dtype=self.dtype, name="Conv2d_4a_3x3")(h)
        h = _maxpool3s2(h)
        h = InceptionA(32, self.dtype, name="Mixed_5b")(h)
        h = InceptionA(64, self.dtype, name="Mixed_5c")(h)
        h = InceptionA(64, self.dtype, name="Mixed_5d")(h)
        h = InceptionB(self.dtype, name="Mixed_6a")(h)
        h = InceptionC(128, self.dtype, name="Mixed_6b")(h)
        h = InceptionC(160, self.dtype, name="Mixed_6c")(h)
        h = InceptionC(160, self.dtype, name="Mixed_6d")(h)
        h = InceptionC(192, self.dtype, name="Mixed_6e")(h)
        h = InceptionD(self.dtype, name="Mixed_7a")(h)
        h = InceptionE(self.dtype, name="Mixed_7b")(h)
        h = InceptionE(self.dtype, name="Mixed_7c")(h)
        return h.mean(axis=(1, 2)).astype(jnp.float32)  # (B, 2048)


def make_inception_fn(weights_path: str = None, dtype=jnp.bfloat16):
    """Build a jitted (B,H,W,3)->(B,2048) feature fn; converts torch weights when
    a path is given, else random init with a loud warning (FID values then
    meaningless — smoke only)."""
    import logging

    import jax

    model = InceptionV3Features(dtype=dtype)
    if weights_path:
        from feed_forward_vqgan_clip_tpu.io.torch_import import (
            convert_inception,
            load_torch_state_dict,
        )

        params = convert_inception(load_torch_state_dict(weights_path))
    else:
        logging.getLogger(__name__).warning(
            "No InceptionV3 weights — random init; FID values are meaningless "
            "(pass weights_path with torchvision/FID-port weights)."
        )
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
    return jax.jit(lambda x: model.apply(params, x))
