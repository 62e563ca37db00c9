"""TPU drive: isolate the non-warp train-step base (mapper / decoder / CLIP
fwd+bwd) with chained value_and_grad timings at train shapes."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend())

from feed_forward_vqgan_clip_tpu.models.mappers import build_mapper
from feed_forward_vqgan_clip_tpu.models.perceptor import load_perceptor
from feed_forward_vqgan_clip_tpu.models.vqgan import make_vqgan
from feed_forward_vqgan_clip_tpu.config import make_config
from feed_forward_vqgan_clip_tpu.registry import VQGAN_CONFIGS

bs, cutn = 8, 8
dtype = jnp.bfloat16
cfg = make_config(
    clip_model="ViT-B/32", model_type="mlp_mixer", dim=1024, depth=32,
    dropout=0, vq_image_size=16, noise_dim=0, batch_size=bs, cutn=cutn,
    compute_dtype="bfloat16",
)
perceptor = load_perceptor("ViT-B/32", dtype=dtype)
vq = make_vqgan(VQGAN_CONFIGS["vqgan_imagenet_f16_16384"], dtype=dtype)
vq_params = jax.jit(vq.init)(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 256)))
mapper = build_mapper(dict(cfg), vq_channels=256, dtype=dtype)
mparams = jax.jit(mapper.init)(jax.random.PRNGKey(1), jnp.zeros((1, 512)))

K = 10


def timed(name, f, *args):
    jf = jax.jit(f)
    float(jf(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(jf(*args)); ts.append(time.perf_counter() - t0)
    print(f"{name:28s}: {min(ts)/K*1e3:7.1f} ms")


emb = jax.random.normal(jax.random.PRNGKey(2), (bs, 512), dtype)


def mapper_chain(p, e):
    def body(carry, _):
        def loss(pp):
            z = mapper.apply(pp, e + carry.astype(e.dtype))
            return jnp.float32((z.astype(jnp.float32) ** 2).sum())
        v, g = jax.value_and_grad(loss)(p)
        # consume the grads: an unused g lets XLA DCE the entire backward
        return v * 1e-12 + jnp.float32(sum(jnp.sum(x) for x in jax.tree.leaves(g))) * 1e-12, None
    total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
    return total


timed("mapper fwd+bwd (B=8)", mapper_chain, mparams, emb)

z0 = jax.random.normal(jax.random.PRNGKey(3), (bs, 16, 16, 256), dtype)


def dec_chain(p, z):
    def body(carry, _):
        def loss(zz):
            img = vq.apply(p, zz + carry.astype(zz.dtype))
            return jnp.float32((img.astype(jnp.float32) ** 2).sum())
        v, g = jax.value_and_grad(loss)(z)
        return v * 1e-12 + jnp.float32(g.sum()) * 1e-12, None
    total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
    return total


timed("vqgan decode fwd+bwd (B=8)", dec_chain, vq_params, z0)

crops = jax.random.normal(jax.random.PRNGKey(4), (bs * cutn, 224, 224, 3), dtype)


def clip_chain(p, x):
    # params as ARGUMENTS, not closure constants: captured pytrees are baked
    # into the HLO as literals and blow the remote-compile request size
    def body(carry, _):
        def loss(xx):
            e = perceptor.module.apply(p, xx + carry.astype(xx.dtype),
                                       method=perceptor.module.encode_image)
            return jnp.float32((e.astype(jnp.float32) ** 2).sum())
        v, g = jax.value_and_grad(loss)(x)
        return v * 1e-12 + jnp.float32(g.sum()) * 1e-12, None
    total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
    return total


timed("CLIP encode fwd+bwd (64 crops)", clip_chain, perceptor.params, crops)
print("OK")
