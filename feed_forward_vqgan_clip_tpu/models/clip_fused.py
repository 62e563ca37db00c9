"""Fused-dispatch CLIP ViT image encoder for the train loss.

`make_clip_image_apply(module)` returns `(variables, images) -> embeddings`
computing the SAME function as `module.apply(..., method=module.encode_image)`
(models/clip_vit.py, the reference's `perceptor.encode_image(x)` at
main.py:799) but routing every transformer block's MLP sublayer through the
weight-resident Pallas kernel `ops/pallas/mlp_ln.fused_mlp_ln` on TPU. The
attention sublayers, patchify, LN-pre/post and projection stay jnp (XLA
already runs the big attention matmuls well; the MLP half carried the HBM
round-trip of the (rows, 4D) hidden and the separate LN/GELU VPU passes —
BENCH_NOTES.md round 5).

Falls back to the stock module path on CPU, for non-CLIP perceptors (RN /
CLOOB towers), and for shapes the kernel does not support — so callers can
use it unconditionally. Numerical parity between the two paths is pinned by
tests/test_fused_clip.py (fwd + grads).

MEASURED SLOWER at train shapes (64x224px crops, v5e, round 5,
benchmarks/clip_fused_timing.py): fwd+bwd 18.8 ms vs 15.0 XLA (fwd-only 9.0
vs 8.3). XLA's backward of this tower is already tight (~6.6 ms) and the
kernel adds (B,T,D)<->(rows,D) relayouts at every block boundary plus an
unskewed serial bwd body; the mixer recipe does not transfer because the ViT
MLP's hidden is 5x smaller relative to its matmul work. Default therefore
OFF (opt in with FFVC_FUSED_CLIP=1) — kept as an A/B-able experiment and for
the parity-pinned kernel itself, which wins where rows/D are mixer-like.
"""

import logging
import os

import jax
import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.models.clip_vit import CLIP
from feed_forward_vqgan_clip_tpu.ops.pallas.mlp_ln import (
    fused_mlp_ln,
    mlp_ln_supported,
)

log = logging.getLogger(__name__)


def _layer_norm(x, p, dtype):
    """nn.LayerNorm(eps=1e-5) numerics with f32 stats (clip_vit.LayerNorm)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    return (h * p["scale"] + p["bias"]).astype(dtype)


def _dense(x, p, dtype):
    return jnp.dot(x.astype(dtype), p["kernel"].astype(dtype)) + p["bias"].astype(dtype)


def _mhsa(x, p, heads, dtype):
    """clip_vit.MHSA numerics on raw params (q/k/v/out Dense subtrees)."""
    b, t, d = x.shape
    dh = d // heads
    q = _dense(x, p["q"], dtype).reshape(b, t, heads, dh).transpose(0, 2, 1, 3)
    k = _dense(x, p["k"], dtype).reshape(b, t, heads, dh).transpose(0, 2, 1, 3)
    v = _dense(x, p["v"], dtype).reshape(b, t, heads, dh).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (dh ** -0.5)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    return _dense(out.transpose(0, 2, 1, 3).reshape(b, t, d), p["out"], dtype)


def encode_image_fused(module: CLIP, variables, x, *, interpret=False):
    """Vision tower forward with fused MLP sublayers. x: (B, H, W, 3)
    CLIP-normalized NHWC; returns (B, embed_dim) f32, like encode_image."""
    vp = variables["params"]["visual"]
    dt = module.dtype
    b, hh, ww, c = x.shape
    pp = module.patch_size

    # patchify (clip_vit.PatchEmbed: reshape + matmul, conv1/kernel HWIO)
    k = vp["conv1"]["kernel"]
    xp = (
        x.astype(dt)
        .reshape(b, hh // pp, pp, ww // pp, pp, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, (hh // pp) * (ww // pp), pp * pp * c)
    )
    h = xp @ k.reshape(pp * pp * c, module.vision_width).astype(dt)

    cls = vp["class_embedding"].astype(dt)
    h = jnp.concatenate(
        [jnp.broadcast_to(cls, (b, 1, module.vision_width)), h], axis=1
    )
    h = h + vp["positional_embedding"].astype(dt)
    h = _layer_norm(h, vp["ln_pre"]["LayerNorm_0"], dt)

    t = h.shape[1]
    d = module.vision_width
    for i in range(module.vision_layers):
        bp = vp["transformer"][f"resblock_{i}"]
        hn = _layer_norm(h, bp["ln_1"]["LayerNorm_0"], dt)
        h = h + _mhsa(hn, bp["attn"], module.vision_heads, dt)
        mlp_p = {
            "ln": bp["ln_2"]["LayerNorm_0"],
            "fc1": bp["c_fc"],
            "fc2": bp["c_proj"],
        }
        h = fused_mlp_ln(
            h.reshape(b * t, d), mlp_p, module.act, dt, interpret
        ).reshape(b, t, d)

    h = _layer_norm(h[:, 0, :], vp["ln_post"]["LayerNorm_0"], dt)
    proj = vp["proj"].astype(dt)
    return (h @ proj).astype(jnp.float32)


def clip_fused_supported(module, b, hh) -> bool:
    if not isinstance(module, CLIP):
        return False
    t = (hh // module.patch_size) ** 2 + 1
    return mlp_ln_supported(b * t, module.vision_width, module.vision_width * 4)


def make_clip_image_apply(module, *, fused=None, interpret=False):
    """(variables, images) -> embeddings dispatcher for the train loss.

    fused=None resolves OFF (the XLA module path measured faster at train
    shapes — module docstring); FFVC_FUSED_CLIP=1 opts into the Pallas path
    on TPU, =0 forces it off even when the caller passed fused=True."""
    env = os.environ.get("FFVC_FUSED_CLIP", "")
    if env in ("0", "false"):
        fused = False
    elif env in ("1", "true"):
        fused = None  # auto: Pallas on TPU, module path on CPU
        try:
            fused = jax.default_backend() not in ("cpu",)
        except Exception:  # pragma: no cover
            fused = False
    elif fused is None:
        fused = False

    def apply(variables, x):
        if fused and clip_fused_supported(module, x.shape[0], x.shape[1]):
            return encode_image_fused(module, variables, x, interpret=interpret)
        return module.apply(variables, x, method=module.encode_image)

    return apply
