"""TPU drive: fused-MLP CLIP image encode vs the XLA module path, fwd+bwd at
train shapes (64 crops of 224px, ViT-B/32 bf16)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend())

from feed_forward_vqgan_clip_tpu.models.clip_fused import encode_image_fused
from feed_forward_vqgan_clip_tpu.models.perceptor import load_perceptor

dtype = jnp.bfloat16
perceptor = load_perceptor("ViT-B/32", dtype=dtype)
crops = jax.random.normal(jax.random.PRNGKey(4), (64, 224, 224, 3), dtype)
K = 10


def timed(name, f, *args):
    jf = jax.jit(f)
    float(jf(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(jf(*args)); ts.append(time.perf_counter() - t0)
    print(f"{name:34s}: {min(ts)/K*1e3:7.2f} ms")


def chain(encode):
    def run(p, x):
        def body(carry, _):
            def loss(xx):
                e = encode(p, xx + carry.astype(xx.dtype))
                return jnp.float32((e.astype(jnp.float32) ** 2).sum())
            v, g = jax.value_and_grad(loss)(x)
            return v * 1e-12 + jnp.float32(g.sum()) * 1e-12, None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return total
    return run


timed(
    "module path fwd+bwd (64 crops)",
    chain(lambda p, x: perceptor.module.apply(p, x, method=perceptor.module.encode_image)),
    perceptor.params, crops,
)
timed(
    "fused-MLP path fwd+bwd (64 crops)",
    chain(lambda p, x: encode_image_fused(perceptor.module, p, x)),
    perceptor.params, crops,
)

# numerics spot-check on-device
e_mod = perceptor.module.apply(perceptor.params, crops, method=perceptor.module.encode_image)
e_fus = encode_image_fused(perceptor.module, perceptor.params, crops)
import numpy as np
d = np.abs(np.asarray(e_mod, np.float32) - np.asarray(e_fus, np.float32))
print(f"max |diff| = {d.max():.3e}, rel to |e| max {np.abs(np.asarray(e_mod)).max():.3f}")
print("OK")


def fwd_chain(encode):
    def run(p, x):
        def body(carry, _):
            e = encode(p, x + carry.astype(x.dtype))
            return jnp.float32((e.astype(jnp.float32) ** 2).sum()) * 1e-12, None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return total
    return run


timed(
    "module path FWD only (64 crops)",
    fwd_chain(lambda p, x: perceptor.module.apply(p, x, method=perceptor.module.encode_image)),
    perceptor.params, crops,
)
timed(
    "fused-MLP path FWD only (64 crops)",
    fwd_chain(lambda p, x: encode_image_fused(perceptor.module, p, x)),
    perceptor.params, crops,
)
