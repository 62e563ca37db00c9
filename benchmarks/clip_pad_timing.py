"""TPU drive: does padding the CLIP ViT-B/32 image tower's 50-token sequence
to 64 tokens (exactly-masked attention keys) recover layout time?

Hypothesis: T=50 is sublane-hostile — (B,50,768) pads to 56 rows per tile and
every (B,T,D)<->(B*T,D) flatten is a physical relayout; T=64 makes them free.
Padded tokens are masked out of attention with additive -inf for every query,
so real-token outputs are IDENTICAL math (softmax over the same key set); the
cls pooling reads token 0. Measures fwd+bwd (input grads, frozen params) on
the train-shape crop batch (64, 224, 224, 3).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend())

import flax.linen as nn  # noqa: E402

from feed_forward_vqgan_clip_tpu.models import clip_vit as cv  # noqa: E402

B = int(_os.environ.get("FFVC_PAD_BATCH", "64"))
dtype = jnp.bfloat16
K = 10


class PaddedVisionTransformer(nn.Module):
    """cv.VisionTransformer with the token dim padded 50 -> 64 after the
    pos-embedding add; attention sees an additive -inf mask on padded keys."""

    pad_to: int = 64
    dtype: any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        width, patch, layers, heads, embed_dim = 768, 32, 12, 12, 512
        b = x.shape[0]
        h = cv.PatchEmbed(width, patch, self.dtype, name="conv1")(x.astype(self.dtype))
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (width,), jnp.float32
        )
        n_tok = h.shape[1] + 1
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (n_tok, width),
            jnp.float32,
        )
        h = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, width)), h], axis=1
        )
        h = h + pos.astype(self.dtype)
        tp = self.pad_to
        h = jnp.pad(h, ((0, 0), (0, tp - n_tok), (0, 0)))
        mask = jnp.where(
            jnp.arange(tp) >= n_tok, -jnp.inf, 0.0
        ).astype(jnp.float32)[None, None, None, :]  # (1,1,1,T) over keys
        h = cv.LayerNorm(self.dtype, name="ln_pre")(h)
        h = cv.Transformer(layers, heads, "quick_gelu", self.dtype, name="transformer")(
            h, mask
        )
        h = cv.LayerNorm(self.dtype, name="ln_post")(h[:, 0, :])
        proj = self.param(
            "proj", nn.initializers.normal(width ** -0.5), (width, embed_dim),
            jnp.float32,
        )
        return (h @ proj.astype(self.dtype)).astype(jnp.float32)


def timed(name, mod, params, x):
    def chain(p, xx):
        def body(carry, _):
            def loss(img):
                e = mod.apply(p, img)
                return jnp.float32((e.astype(jnp.float32) ** 2).sum())

            v, g = jax.value_and_grad(loss)(xx + carry.astype(xx.dtype))
            return v * 1e-12 + jnp.float32(jnp.sum(g)) * 1e-12, None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return total

    jf = jax.jit(chain)
    float(jf(params, x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jf(params, x))
        ts.append(time.perf_counter() - t0)
    print(f"{name:24s}: {min(ts)/K*1e3:7.2f} ms fwd+bwd (B={B})", flush=True)


x = jax.random.normal(jax.random.PRNGKey(0), (B, 224, 224, 3), dtype)

base = cv.VisionTransformer(dtype=dtype)
pb = jax.jit(base.init)(jax.random.PRNGKey(1), jnp.zeros((1, 224, 224, 3), dtype))
timed("baseline T=50", base, pb, x)

pad = PaddedVisionTransformer(dtype=dtype)
pp = jax.jit(pad.init)(jax.random.PRNGKey(1), jnp.zeros((1, 224, 224, 3), dtype))
timed("padded  T=64", pad, pp, x)

# numerical check: same params -> same embedding (pad path reuses identical
# param names, so the baseline params load directly)
e0 = jax.jit(base.apply)(pb, x[:4])
e1 = jax.jit(pad.apply)(pb, x[:4])
import numpy as np  # noqa: E402

print("max |pad - base| =", float(np.max(np.abs(np.asarray(e0) - np.asarray(e1)))))
print("OK")
