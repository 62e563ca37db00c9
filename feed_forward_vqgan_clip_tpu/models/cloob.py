"""CLOOB perceptor backends.

Two families, matching `load_clip_model`'s dispatch (/root/reference/main.py:1308-1322):

  * cloob_rn50 / cloob_rn50x4 — the ml-jku checkpoints (cloob.py:658-681): CLIP
    architecture (ModifiedResNet visual + text transformer) with a 'module.'-prefixed
    state dict and logit_inv_tau. Reuses CLIPResNet; io/torch_import normalizes the
    naming.

  * cloob_laion_400m_vit_b_16_{16,32}_epochs — the crowsonkb models
    (cloob_crowsonkb.py:92-183): a pre-LN ViT-B/16 image tower + text transformer
    with token-0 pooling and in-encoder L2 normalization. Upstream checkpoints are
    NATIVE JAX/Haiku pickles ({'params': (image_tree, text_tree)},
    cloob_crowsonkb.py:284-289) — this framework loads them directly, no torch
    detour.
"""

import logging
import pickle
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)

CROWSON_CONFIGS = {
    # public cloob-training config json values
    "cloob_laion_400m_vit_b_16_16_epochs": dict(
        d_embed=512, image_layers=12, image_d_model=768, image_heads=12,
        image_size=224, patch_size=16, text_layers=12, text_d_model=512,
        text_heads=8, text_size=77, vocab_size=49408,
    ),
    "cloob_laion_400m_vit_b_16_32_epochs": dict(
        d_embed=512, image_layers=12, image_d_model=768, image_heads=12,
        image_size=224, patch_size=16, text_layers=12, text_d_model=512,
        text_heads=8, text_size=77, vocab_size=49408,
    ),
}


class PreLNBlock(nn.Module):
    """crowsonkb block: x + attn(LN(x)); x + ff(LN(x)) — norms INSIDE sublayers."""

    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None):
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="attn_norm")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        q = nn.Dense(d, dtype=self.dtype, name="query")(h)
        k = nn.Dense(d, dtype=self.dtype, name="key")(h)
        v = nn.Dense(d, dtype=self.dtype, name="value")(h)
        b, t, _ = x.shape
        dh = d // self.heads
        q = q.reshape(b, t, self.heads, dh)
        k = k.reshape(b, t, self.heads, dh)
        v = v.reshape(b, t, self.heads, dh)
        logits = jnp.einsum("bthd,bmhd->bhtm", q, k) / (dh ** 0.5)
        if padding_mask is not None:
            # mask applied on the QUERY axis exactly like upstream
            # (cloob_crowsonkb.py:55-57)
            logits = jnp.where(
                padding_mask[:, None, :, None], logits, jnp.asarray(-1e30, logits.dtype)
            )
        weights = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(self.dtype)
        attn = jnp.einsum("bhtm,bmhd->bthd", weights, v).reshape(b, t, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="out")(attn)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ff_norm")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        h = nn.Dense(d * 4, dtype=self.dtype, name="linear_0")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, dtype=self.dtype, name="linear_1")(h)
        return x + h


class CrowsonTextEncoder(nn.Module):
    d_embed: int
    layers: int
    d_model: int
    seq_len: int
    heads: int
    vocab_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        eot = self.vocab_size - 1
        eot_mask = tokens == eot
        padding_mask = (jnp.cumsum(eot_mask, axis=-1) == 0) | eot_mask
        emb = self.param(
            "embed", nn.initializers.normal(0.02), (self.vocab_size, self.d_model),
            jnp.float32,
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(1.0), (self.seq_len, self.d_model),
            jnp.float32,
        )
        h = jnp.take(emb, tokens, axis=0).astype(self.dtype) + pos.astype(self.dtype)
        for i in range(self.layers):
            h = PreLNBlock(self.heads, self.dtype, name=f"layer_{i}")(h, padding_mask)
        h = nn.Dense(self.d_embed, dtype=self.dtype, name="proj")(h[:, 0])
        h = h.astype(jnp.float32)
        return h / jnp.linalg.norm(h, axis=-1, keepdims=True)


class CrowsonViTImageEncoder(nn.Module):
    d_embed: int
    layers: int
    d_model: int
    heads: int
    patch_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        h = nn.Conv(
            self.d_model, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), use_bias=False,
            dtype=self.dtype, name="embed",
        )(x.astype(self.dtype))
        h = h.reshape(b, -1, self.d_model)
        cls = self.param(
            "class_embed", nn.initializers.normal(self.d_model ** -0.5),
            (self.d_model,), jnp.float32,
        )
        h = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.d_model)), h], axis=1
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(1.0),
            (h.shape[1], self.d_model), jnp.float32,
        )
        h = h + pos.astype(self.dtype)
        for i in range(self.layers):
            h = PreLNBlock(self.heads, self.dtype, name=f"layer_{i}")(h)
        h = nn.Dense(self.d_embed, dtype=self.dtype, name="proj")(h[:, 0])
        h = h.astype(jnp.float32)
        return h / jnp.linalg.norm(h, axis=-1, keepdims=True)


class CrowsonCLOOB(nn.Module):
    d_embed: int = 512
    image_layers: int = 12
    image_d_model: int = 768
    image_heads: int = 12
    image_size: int = 224
    patch_size: int = 16
    text_layers: int = 12
    text_d_model: int = 512
    text_heads: int = 8
    text_size: int = 77
    vocab_size: int = 49408
    dtype: Any = jnp.float32

    def setup(self):
        self.image_encoder = CrowsonViTImageEncoder(
            d_embed=self.d_embed, layers=self.image_layers,
            d_model=self.image_d_model, heads=self.image_heads,
            patch_size=self.patch_size, dtype=self.dtype,
        )
        self.text_encoder = CrowsonTextEncoder(
            d_embed=self.d_embed, layers=self.text_layers,
            d_model=self.text_d_model, seq_len=self.text_size,
            heads=self.text_heads, vocab_size=self.vocab_size, dtype=self.dtype,
        )
        # CLOOB has no CLIP logit_scale; expose a fixed exp-scale of 100 for the
        # Perceptor surface (only eval scoring reads it)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(4.6052), (), jnp.float32
        )

    def encode_image(self, x):
        return self.image_encoder(x)

    def encode_text(self, tokens):
        return self.text_encoder(tokens)

    def __call__(self, tokens, images):
        return self.encode_text(tokens), self.encode_image(images)


def _haiku_block(tree: dict, base: str, i: int) -> dict:
    """Map one haiku layer subtree to a PreLNBlock param dict
    (naming from the upstream converters, cloob_crowsonkb.py:190-281)."""
    g = lambda name: {k2: np.asarray(v) for k2, v in tree[f"{base}/layer_{i}/{name}"].items()}
    attn_ln = g("self_attention/layer_norm")
    q = g("self_attention/multi_head_attention/query")
    k = g("self_attention/multi_head_attention/key")
    v = g("self_attention/multi_head_attention/value")
    o = g("self_attention/multi_head_attention/linear")
    ff_ln = g("feed_forward/layer_norm")
    l0 = g("feed_forward/linear_0")
    l1 = g("feed_forward/linear_1")
    d = lambda t: {"kernel": t["w"], "bias": t["b"]}  # haiku w is already (in, out)
    return {
        "attn_norm": {"scale": attn_ln["scale"], "bias": attn_ln["offset"]},
        "query": d(q), "key": d(k), "value": d(v), "out": d(o),
        "ff_norm": {"scale": ff_ln["scale"], "bias": ff_ln["offset"]},
        "linear_0": d(l0), "linear_1": d(l1),
    }


def convert_crowson_pickle(path: str, cfg: dict) -> dict:
    """Native haiku pickle {'params': (image_tree, text_tree)} -> flax params."""
    with open(path, "rb") as fd:
        payload = pickle.load(fd)
    img_tree, txt_tree = payload["params"]
    img_tree = {k: v for k, v in img_tree.items()}
    txt_tree = {k: v for k, v in txt_tree.items()}

    ib = "vi_t_image_encoder"
    image = {
        "class_embed": np.asarray(img_tree[ib]["class_embed"]),
        "embed": {"kernel": np.asarray(img_tree[f"{ib}/embed"]["w"])},
        "pos_embed": np.asarray(img_tree[f"{ib}/pos_embed"]["w"]),
        "proj": {
            "kernel": np.asarray(img_tree[f"{ib}/proj"]["w"]),
            "bias": np.asarray(img_tree[f"{ib}/proj"]["b"]),
        },
    }
    for i in range(cfg["image_layers"]):
        image[f"layer_{i}"] = _haiku_block(img_tree, ib, i)

    tb = "text_encoder"
    text = {
        "embed": np.asarray(txt_tree[f"{tb}/embed"]["embeddings"]),
        "pos_embed": np.asarray(txt_tree[f"{tb}/pos_embed"]["w"]),
        "proj": {
            "kernel": np.asarray(txt_tree[f"{tb}/proj"]["w"]),
            "bias": np.asarray(txt_tree[f"{tb}/proj"]["b"]),
        },
    }
    for i in range(cfg["text_layers"]):
        text[f"layer_{i}"] = _haiku_block(txt_tree, tb, i)

    return {
        "params": {
            "image_encoder": image,
            "text_encoder": text,
            "logit_scale": np.float32(4.6052),
        }
    }


def load_cloob(name: str, path: Optional[str] = None, dtype=jnp.float32):
    from feed_forward_vqgan_clip_tpu.models.perceptor import Perceptor
    from feed_forward_vqgan_clip_tpu.registry import CLIP_DIM, CLIP_SIZE

    if name in ("cloob_rn50", "cloob_rn50x4"):
        from feed_forward_vqgan_clip_tpu.models.clip_resnet import load_clip_resnet

        rn_name = {"cloob_rn50": "RN50", "cloob_rn50x4": "RN50x4"}[name]
        p = load_clip_resnet(rn_name, path, dtype=dtype)
        return p._replace(name=name, size=CLIP_SIZE[name], dim=CLIP_DIM[name])

    if name in CROWSON_CONFIGS:
        cfg = CROWSON_CONFIGS[name]
        module = CrowsonCLOOB(**cfg, dtype=dtype)
        if path:
            params = convert_crowson_pickle(path, cfg)
        else:
            log.warning("No weights for CLOOB %s — random init (smoke/bench only).", name)
            params = jax.jit(module.init)(
                jax.random.PRNGKey(0),
                jnp.zeros((1, cfg["text_size"]), jnp.int32),
                jnp.zeros((1, cfg["image_size"], cfg["image_size"], 3), jnp.float32),
            )
        return Perceptor(
            module=module, params=params, name=name,
            size=CLIP_SIZE.get(name, 224), dim=CLIP_DIM.get(name, cfg["d_embed"]),
        )
    raise ValueError(f"unknown CLOOB model {name!r}")
