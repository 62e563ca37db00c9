"""CLIP ModifiedResNet image tower + paired text transformer (flax, NHWC).

Covers the reference's RN backbones (`load_clip_model` dispatch, /root/reference/
main.py:1308-1333) and the ml-jku CLOOB RN50/RN50x4 models (cloob.py:13-167,
which reimplement exactly this architecture). Public OpenAI CLIP design:
3-conv stem with blur-free avgpool antialiasing, Bottlenecks whose stride lives
in an avgpool before conv3, and a query-is-mean AttentionPool2d head.

Frozen-model use only: BatchNorm always runs in inference mode off the
checkpoint's running statistics.
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.models.clip_vit import TextTransformer


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm over NHWC channels (running stats as params)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        inv = (scale / jnp.sqrt(var + 1e-5)).astype(self.dtype)
        return x * inv + (bias - mean * scale / jnp.sqrt(var + 1e-5)).astype(self.dtype)


def _avg_pool(x, k):
    return nn.avg_pool(x, (k, k), strides=(k, k))


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        in_ch = x.shape[-1]
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(FrozenBatchNorm(self.planes, self.dtype, name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.relu(FrozenBatchNorm(self.planes, self.dtype, name="bn2")(h))
        if self.stride > 1:
            h = _avg_pool(h, self.stride)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(h)
        h = FrozenBatchNorm(out_ch, self.dtype, name="bn3")(h)
        if self.stride > 1 or in_ch != out_ch:
            sc = _avg_pool(x, self.stride) if self.stride > 1 else x
            sc = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="downsample_conv")(sc)
            sc = FrozenBatchNorm(out_ch, self.dtype, name="downsample_bn")(sc)
        else:
            sc = x
        return nn.relu(h + sc)


class AttentionPool2d(nn.Module):
    """Mean-query attention pooling: query = the mean token; q/k/v/c projections."""

    heads: int
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean_tok = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # (B, HW+1, C)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(c ** -0.5),
            (h * w + 1, c), jnp.float32,
        )
        tokens = tokens + pos.astype(self.dtype)
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(tokens[:, :1])
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(tokens)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(tokens)
        dh = c // self.heads
        q = q.reshape(b, 1, self.heads, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, self.heads, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, self.heads, dh).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (dh ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, c)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(out)


class ModifiedResNet(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    embed_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.width
        h = x.astype(self.dtype)
        h = nn.Conv(w // 2, (3, 3), strides=2, padding=1, use_bias=False, dtype=self.dtype, name="conv1")(h)
        h = nn.relu(FrozenBatchNorm(w // 2, self.dtype, name="bn1")(h))
        h = nn.Conv(w // 2, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.relu(FrozenBatchNorm(w // 2, self.dtype, name="bn2")(h))
        h = nn.Conv(w, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv3")(h)
        h = nn.relu(FrozenBatchNorm(w, self.dtype, name="bn3")(h))
        h = _avg_pool(h, 2)
        for li, (n_blocks, stride) in enumerate(zip(self.layers, (1, 2, 2, 2))):
            planes = w * (2 ** li)
            for bi in range(n_blocks):
                h = Bottleneck(
                    planes, stride if bi == 0 else 1, self.dtype,
                    name=f"layer{li + 1}_{bi}",
                )(h)
        heads = self.width * 32 // 64
        return AttentionPool2d(heads, self.embed_dim, self.dtype, name="attnpool")(
            h
        ).astype(jnp.float32)


class CLIPResNet(nn.Module):
    """ModifiedResNet visual + CLIP text transformer, the perceptor surface."""

    image_size: int = 224
    vision_layers: Sequence[int] = (3, 4, 6, 3)
    vision_width: int = 64
    embed_dim: int = 1024
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    vocab_size: int = 49408
    context_length: int = 77
    act: str = "quick_gelu"  # open_clip non-quickgelu RN tags use exact gelu
    dtype: Any = jnp.float32

    def setup(self):
        self.visual = ModifiedResNet(
            layers=self.vision_layers, width=self.vision_width,
            embed_dim=self.embed_dim, dtype=self.dtype,
        )
        self.text = TextTransformer(
            context_length=self.context_length, vocab_size=self.vocab_size,
            width=self.text_width, layers=self.text_layers, heads=self.text_heads,
            embed_dim=self.embed_dim, act=self.act, dtype=self.dtype,
        )
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(4.6052), (), jnp.float32
        )

    def encode_image(self, x):
        return self.visual(x)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, tokens, images):
        return self.encode_text(tokens), self.encode_image(images)


def load_clip_resnet(
    name: str,
    path: Optional[str] = None,
    dtype=jnp.float32,
    act: str = "quick_gelu",
    display_name: Optional[str] = None,
    arch_config: Optional[dict] = None,
):
    """Build an RN-family perceptor; convert torch weights when a path is given.

    `name` is the arch key into CLIP_RESNET_CONFIGS ('RN50', ...). `display_name`
    overrides the reported Perceptor.name (used for 'openclip/RN50/<tag>' routes,
    reference main.py:1323-1329). `arch_config` bypasses the registry (used with
    state-dict-sniffed configs for archs outside the table).
    """
    import logging

    from feed_forward_vqgan_clip_tpu.models.perceptor import Perceptor
    from feed_forward_vqgan_clip_tpu.registry import (
        CLIP_DIM,
        CLIP_RESNET_CONFIGS,
        CLIP_SIZE,
    )

    cfg = arch_config if arch_config is not None else CLIP_RESNET_CONFIGS[name]
    module = CLIPResNet(
        image_size=cfg["image_size"], vision_layers=tuple(cfg["vision_layers"]),
        vision_width=cfg["vision_width"], embed_dim=cfg["embed_dim"],
        text_width=cfg["text_width"], text_layers=cfg["text_layers"],
        text_heads=cfg["text_heads"], vocab_size=cfg["vocab_size"],
        context_length=cfg["context_length"], act=act, dtype=dtype,
    )
    params = None
    if path:
        from feed_forward_vqgan_clip_tpu.io.torch_import import (
            convert_clip_resnet,
            load_torch_state_dict,
        )

        params = convert_clip_resnet(load_torch_state_dict(path))
    if params is None:
        logging.getLogger(__name__).warning(
            "No weights for CLIP %s — random init (smoke/bench only).", name
        )
        params = jax.jit(module.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg["context_length"]), jnp.int32),
            jnp.zeros((1, cfg["image_size"], cfg["image_size"], 3), jnp.float32),
        )
    report = display_name or name
    return Perceptor(
        module=module, params=params, name=report,
        size=CLIP_SIZE.get(report, cfg["image_size"]),
        dim=CLIP_DIM.get(report, cfg["embed_dim"]),
    )
