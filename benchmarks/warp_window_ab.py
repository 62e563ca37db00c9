"""TPU drive: FFVC_WARP_WINDOW narrow-vs-full A/B at train shapes.

The `full` mode takes whole-input row windows in the warp kernels, making
tile coverage unconditional — the compiled step drops the lax.cond fallback
(and its operand copies / second executable) at the price of wider window
DMAs. Same function either way; this script asserts value+grad parity on the
real chip and times the Af/Pe fwd+bwd chain under both modes.

Run twice: `python benchmarks/warp_window_ab.py` (narrow default) and
`FFVC_WARP_WINDOW=full python benchmarks/warp_window_ab.py`.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from feed_forward_vqgan_clip_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

from feed_forward_vqgan_clip_tpu.ops import augment as A

mode = A._WARP_WINDOW
print("window mode:", mode, flush=True)

B, H = 64, 224
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(B, H, H, 3)), jnp.bfloat16)

# affine draws matching RandomAffine(degrees=15, translate=(0.1, 0.1))
key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
deg = jax.random.uniform(k1, (B,), minval=-15.0, maxval=15.0) * jnp.pi / 180
tx = jax.random.uniform(k2, (B,), minval=-0.1, maxval=0.1) * H
ty = jax.random.uniform(k3, (B,), minval=-0.1, maxval=0.1) * H
c, s = jnp.cos(deg), jnp.sin(deg)
cx = cy = (H - 1) / 2.0
m = jnp.stack([
    jnp.stack([c, -s, cx - c * cx + s * cy + tx], -1),
    jnp.stack([s, c, cy - s * cx - c * cy + ty], -1),
    jnp.stack([jnp.zeros_like(c), jnp.zeros_like(c), jnp.ones_like(c)], -1),
], -2)


def loss(im):
    out = A.warp_projective(im, m, "zeros", 0, "affine")
    return jnp.float32((out.astype(jnp.float32) * jnp.cos(
        out.astype(jnp.float32))).sum())


v, g = jax.jit(jax.value_and_grad(loss))(img)
v = float(v)
g = np.asarray(g, np.float32)
print(f"value={v:.6e} grad_sum={g.sum():.6e} grad_absmax={np.abs(g).max():.4f}",
      flush=True)

K = 20


@jax.jit
def chain(x):
    def body(carry, i):
        vv, gg = jax.value_and_grad(loss)(x + carry.astype(x.dtype))
        return carry + vv * 1e-12 + jnp.float32(
            gg.astype(jnp.float32).sum()) * 1e-12, ()
    tot, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
    return tot


float(chain(img))
ts = []
for _ in range(3):
    t0 = time.perf_counter(); float(chain(img)); ts.append(time.perf_counter() - t0)
print(f"Af fwd+bwd chain ({mode}): {min(ts)/K*1e3:7.2f} ms/iter", flush=True)
print("OK")
