"""TPU drive: fwd+bwd device time of the cutout/augment stage alone at train
shapes (B=8 decoded 256px images -> 64 augmented 224px crops), by aug subset.
Sizes the pool/Ji/Er/noise share of the train step next to the warps without
compiling full train steps (benchmarks/train_step_breakdown.py compiles four
of those and blows the tunnel budget)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

from feed_forward_vqgan_clip_tpu.ops.cutouts import MakeCutouts

bs = 8
dtype = jnp.bfloat16
imgs = jax.random.uniform(jax.random.PRNGKey(0), (bs, 256, 256, 3), dtype)
K = 20

for name, augs, noise in (
    ("default Af,Pe,Ji,Er", None, 0.1),
    ("Af,Pe only (no noise)", ["Af", "Pe"], 0.0),
    ("Ji,Er only (no noise)", ["Ji", "Er"], 0.0),
    ("pool+tile only (Cc noop-ish, no noise)", ["Cc"], 0.0),
):
    mc = MakeCutouts(cut_size=224, cutn=8, pool_size=224, augs=augs,
                     noise_fac=noise)

    def stage(x, key):
        def loss(xx):
            out = mc(key, xx)
            return jnp.float32((out.astype(jnp.float32) ** 2).sum())
        v, g = jax.value_and_grad(loss)(x)
        return v * 1e-12 + jnp.float32(g.astype(jnp.float32).sum()) * 1e-12

    @jax.jit
    def chain(x, k0):
        def body(carry, i):
            return carry + stage(x + carry.astype(x.dtype),
                                 jax.random.fold_in(k0, i)), ()
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return tot

    k0 = jax.random.PRNGKey(1)
    float(chain(imgs, k0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(chain(imgs, k0)); ts.append(time.perf_counter() - t0)
    print(f"{name:40s}: {min(ts)/K*1e3:7.2f} ms fwd+bwd", flush=True)
print("OK")
