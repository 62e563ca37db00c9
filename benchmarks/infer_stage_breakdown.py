"""TPU drive: per-stage device time of the flagship B=64 inference pipeline.

Each stage is timed with the same in-jit lax.scan chain bench.py uses (the
axon tunnel's dispatch/readback overhead stays out; block_until_ready is a
no-op through the tunnel). Like bench.py, the scan consumes a DISTINCT input
per iteration — a loop-invariant body would be legal for XLA's LICM to hoist,
which would time an empty loop. Stages share shapes with the full pipeline so
the numbers add up to the end-to-end figure.

Env: B (batch, default 64), STAGES (comma list: text,mapper,synth; default all).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

from feed_forward_vqgan_clip_tpu.config import make_config
from feed_forward_vqgan_clip_tpu.models.mappers import build_mapper
from feed_forward_vqgan_clip_tpu.models.mappers.fused import make_mapper_apply
from feed_forward_vqgan_clip_tpu.models.perceptor import load_perceptor
from feed_forward_vqgan_clip_tpu.models.vqgan import latent_bounds, make_vqgan, synth
from feed_forward_vqgan_clip_tpu.ops.grad_ops import clamp_with_grad
from feed_forward_vqgan_clip_tpu.registry import VQGAN_CONFIGS

B = int(_os.environ.get("B", 64))
STAGES = _os.environ.get("STAGES", "text,mapper,synth").split(",")
K = 30
dtype = jnp.bfloat16
cfg = make_config(clip_model="ViT-B/32", model_type="mlp_mixer", dim=1024,
                  depth=32, dropout=0, vq_image_size=16, noise_dim=0)
perceptor = load_perceptor("ViT-B/32", dtype=dtype)
vq = make_vqgan(VQGAN_CONFIGS["vqgan_imagenet_f16_16384"], dtype=dtype)
mapper = build_mapper(dict(cfg), vq_channels=256, dtype=dtype)
k = jax.random.PRNGKey(0)
mp = jax.jit(mapper.init)(k, jnp.zeros((1, 512), jnp.float32))
vp = jax.jit(vq.init)(k, jnp.zeros((1, 16, 16, 256), jnp.float32))
cp = perceptor.params
mapper_apply = make_mapper_apply(mapper)
lo, hi = latent_bounds(vp)


def timed(name, fn, stack, params):
    """stack: (K, ...) — one distinct input per scan step (defeats LICM).
    params are threaded as jit ARGUMENTS: closing over GB-scale weights embeds
    them as HLO constants, which the axon remote-compile tunnel rejects
    (HTTP 413)."""
    @functools.partial(jax.jit, static_argnums=(2,))
    def chain(xs, pr, kk):
        def body(c, x):
            out = fn(x, pr)
            return c + jnp.mean(out.astype(jnp.float32)), ()
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), xs, length=kk)
        return tot

    float(chain(stack, params, K))
    t = min(_t(chain, stack, params) for _ in range(3))
    print(f"{name:28s}: {t/K*1e3:7.2f} ms/batch", flush=True)
    return t / K


def _t(chain, xs, params):
    t0 = time.perf_counter(); float(chain(xs, params, K)); return time.perf_counter() - t0


rng = np.random.default_rng(0)
if "text" in STAGES:
    toks = np.zeros((K, B, 77), np.int32)
    toks[:, :, 0] = 49406
    toks[:, :, 1] = rng.integers(300, 40000, size=(K, B))
    toks[:, :, 2] = 49407
    timed("text_encode", lambda t, pr: perceptor.module.apply(
        pr, t, method=perceptor.module.encode_text), jnp.asarray(toks), cp)
if "mapper" in STAGES:
    h_txt = jnp.asarray(rng.normal(size=(K, B, 512)), jnp.float32)
    timed("mapper(fused)", lambda h, pr: mapper_apply(pr, h), h_txt, mp)
if "synth" in STAGES:
    z_lat = jnp.asarray(rng.normal(size=(K, B, 16, 16, 256)) * 0.5, jnp.float32)
    timed("clamp+synth(=vq+decoder)",
          lambda z, pr: synth(vq, pr, clamp_with_grad(z, lo, hi)), z_lat, vp)
