"""CLIP ViT text+image encoders in flax (TPU-native NHWC).

Provides the `encode_text` / `encode_image` / `logit_scale` surface the reference's
perceptor exposes (/root/reference/main.py:733, 799, 700); architecture follows the
public OpenAI CLIP ViT family (configs in registry.CLIP_VIT_CONFIGS) and the
OpenCLIP ViT-B/32 variants (gelu instead of quick_gelu for non-quickgelu tags,
main.py:1323-1329).

TPU design notes:
  * images are NHWC, already CLIP-normalized by the caller (the reference also
    normalizes outside the encoder, main.py:797);
  * attention is exact softmax over <=257 tokens (50 for B/32) — fused XLA dots,
    f32 softmax, bf16 matmuls under the compute dtype;
  * the causal text mask is additive -inf, built statically.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNorm(nn.Module):
    """LayerNorm(eps=1e-5) with f32 statistics (fp16-safe, like CLIP's LayerNorm)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return h.astype(self.dtype)


class MHSA(nn.Module):
    """Multi-head self-attention matching torch.nn.MultiheadAttention semantics."""

    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b, t, d = x.shape
        dh = d // self.heads
        q = nn.Dense(d, dtype=self.dtype, name="q")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v")(x)
        q = q.reshape(b, t, self.heads, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, self.heads, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, self.heads, dh).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (dh ** -0.5)
        if mask is not None:
            attn = attn + mask.astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return nn.Dense(d, dtype=self.dtype, name="out")(out)


class ResidualAttentionBlock(nn.Module):
    heads: int
    act: str = "quick_gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        d = x.shape[-1]
        act = quick_gelu if self.act == "quick_gelu" else nn.gelu
        h = LayerNorm(self.dtype, name="ln_1")(x)
        x = x + MHSA(self.heads, self.dtype, name="attn")(h, mask)
        h = LayerNorm(self.dtype, name="ln_2")(x)
        h = nn.Dense(d * 4, dtype=self.dtype, name="c_fc")(h)
        h = act(h) if self.act == "quick_gelu" else nn.gelu(h, approximate=False)
        h = nn.Dense(d, dtype=self.dtype, name="c_proj")(h)
        return x + h


class Transformer(nn.Module):
    layers: int
    heads: int
    act: str = "quick_gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.heads, self.act, self.dtype, name=f"resblock_{i}"
            )(x, mask)
        return x


class PatchEmbed(nn.Module):
    """Stride-p patchify as reshape+matmul instead of nn.Conv.

    Identical math and parameter layout (HWIO `kernel`, path `conv1/kernel`)
    to the non-overlapping nn.Conv the reference's conv1 is — but a 3-channel
    stride-32 conv and especially its input-gradient lower pathologically on
    TPU (~21 ms of a 35.6 ms CLIP fwd+bwd at train shapes, see
    BENCH_NOTES.md); the matmul form is a (B*49, 3072) @ (3072, 768) MXU op
    with a transpose, forward and backward."""

    width: int
    patch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        p = self.patch
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, c, self.width),
            jnp.float32,
        )
        xp = (
            x.reshape(b, hh // p, p, ww // p, p, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, (hh // p) * (ww // p), p * p * c)
        )
        return xp @ k.reshape(p * p * c, self.width).astype(x.dtype)


class VisionTransformer(nn.Module):
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512
    act: str = "quick_gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) CLIP-normalized -> (B, embed_dim)."""
        b = x.shape[0]
        h = PatchEmbed(self.width, self.patch_size, self.dtype, name="conv1")(
            x.astype(self.dtype)
        )  # (B, grid*grid, width)

        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.width,), jnp.float32
        )
        n_tok = h.shape[1] + 1
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (n_tok, self.width),
            jnp.float32,
        )
        h = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.width)), h], axis=1
        )
        h = h + pos.astype(self.dtype)
        h = LayerNorm(self.dtype, name="ln_pre")(h)
        h = Transformer(self.layers, self.heads, self.act, self.dtype, name="transformer")(h)
        h = LayerNorm(self.dtype, name="ln_post")(h[:, 0, :])
        proj = self.param(
            "proj",
            nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim),
            jnp.float32,
        )
        return (h @ proj.astype(self.dtype)).astype(jnp.float32)


class TextTransformer(nn.Module):
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512
    act: str = "quick_gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        """tokens: int32 (B, 77) -> (B, embed_dim). EOT pooling at argmax(tokens)."""
        emb = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
            jnp.float32,
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
            jnp.float32,
        )
        h = jnp.take(emb, tokens, axis=0).astype(self.dtype)
        h = h + pos.astype(self.dtype)
        t = tokens.shape[1]
        mask = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
        h = Transformer(self.layers, self.heads, self.act, self.dtype, name="transformer")(
            h, mask
        )
        h = LayerNorm(self.dtype, name="ln_final")(h)
        # EOT token has the highest id in the sequence (clip's x[arange, argmax])
        eot_idx = jnp.argmax(tokens, axis=-1)
        pooled = h[jnp.arange(h.shape[0]), eot_idx]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim),
            jnp.float32,
        )
        return (pooled @ proj.astype(self.dtype)).astype(jnp.float32)


class CLIP(nn.Module):
    """Paired encoders + logit_scale, the reference's perceptor surface."""

    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    embed_dim: int = 512
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    vocab_size: int = 49408
    context_length: int = 77
    act: str = "quick_gelu"
    dtype: Any = jnp.float32

    def setup(self):
        self.visual = VisionTransformer(
            image_size=self.image_size,
            patch_size=self.patch_size,
            width=self.vision_width,
            layers=self.vision_layers,
            heads=self.vision_heads,
            embed_dim=self.embed_dim,
            act=self.act,
            dtype=self.dtype,
        )
        self.text = TextTransformer(
            context_length=self.context_length,
            vocab_size=self.vocab_size,
            width=self.text_width,
            layers=self.text_layers,
            heads=self.text_heads,
            embed_dim=self.embed_dim,
            act=self.act,
            dtype=self.dtype,
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


def openclip_vit_canonical(arch: str) -> str:
    """open_clip dashed ViT arch name -> OpenAI slashed form (ViT-B-32 -> ViT-B/32)."""
    import re

    m = re.fullmatch(r"ViT-([A-Za-z]+)-(\d+)", arch)
    return f"ViT-{m.group(1)}/{m.group(2)}" if m else arch


def make_clip_from_config(cfg: dict, act: str = "quick_gelu", dtype=jnp.float32) -> CLIP:
    """Build a CLIP ViT from a CLIP_VIT_CONFIGS-schema dict (registry entry or
    a state-dict-sniffed config, io/torch_import.sniff_clip_arch)."""
    return CLIP(
        image_size=cfg["image_size"],
        patch_size=cfg["patch_size"],
        vision_width=cfg["vision_width"],
        vision_layers=cfg["vision_layers"],
        vision_heads=cfg["vision_heads"],
        embed_dim=cfg["embed_dim"],
        text_width=cfg["text_width"],
        text_layers=cfg["text_layers"],
        text_heads=cfg["text_heads"],
        vocab_size=cfg["vocab_size"],
        context_length=cfg["context_length"],
        act=act,
        dtype=dtype,
    )


def make_clip(name: str, dtype=jnp.float32) -> CLIP:
    """Build a CLIP ViT from a backbone name ('ViT-B/32', 'openclip/ViT-B-32/...')."""
    from feed_forward_vqgan_clip_tpu.registry import CLIP_VIT_CONFIGS

    act = "quick_gelu"
    arch = name
    if name.startswith("openclip/"):
        _, arch, _tag = name.split("/", 2)
        act = "quick_gelu" if arch.endswith("-quickgelu") else "gelu"
        arch = openclip_vit_canonical(arch.replace("-quickgelu", ""))
    if arch not in CLIP_VIT_CONFIGS:
        raise ValueError(
            f"unknown CLIP ViT arch {arch!r} (from {name!r}); known archs: "
            f"{sorted(CLIP_VIT_CONFIGS)}. For archs outside this table, pass "
            "clip_model_path — the architecture is then sniffed from the "
            "checkpoint's shapes (load_perceptor)."
        )
    return make_clip_from_config(CLIP_VIT_CONFIGS[arch], act=act, dtype=dtype)
