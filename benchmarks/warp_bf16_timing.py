"""TPU drive: bf16 vs f32 warp kernel value_and_grad at train shapes.

Times the Pallas forward+adjoint pair for the two default-chain warp families
with f32 pixels (bf16x3 hat contractions) and bf16 pixels (single-pass mode).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from feed_forward_vqgan_clip_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend())
from feed_forward_vqgan_clip_tpu.ops import augment as A

A._WARP_VJP_MODE = A._WARP_FWD_MODE = "pallas"

B, H, W = 64, 224, 224
rng = np.random.default_rng(0)
img32 = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.float32)
wts32 = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.float32)

key = jax.random.PRNGKey(3)
k1, k2, k3 = jax.random.split(key, 3)
ang = jax.random.uniform(k1, (B,), minval=-15., maxval=15.) * math.pi / 180
tx = jax.random.uniform(k2, (B,), minval=-0.1, maxval=0.1) * W
ty = jax.random.uniform(k3, (B,), minval=-0.1, maxval=0.1) * H
af = A._affine3(A._affine_inverse_about_center(ang, tx, ty, jnp.ones((B,)), H, W))
base = jnp.asarray([[0., 0.], [W - 1., 0.], [W - 1., H - 1.], [0., H - 1.]])
signs = jnp.asarray([[1, 1], [-1, 1], [-1, -1], [1, -1]], jnp.float32)
half = jnp.asarray([W, H], jnp.float32) * 0.35
disp = jax.random.uniform(jax.random.PRNGKey(9), (B, 4, 2)) * half * signs
pe = A.solve_homography(base[None] + disp, jnp.broadcast_to(base, (B, 4, 2)))

K = 20


def time_vg(img, wts, m, pmode, pad, kind):
    def chain(im):
        def body(carry, _):
            out, g = jax.value_and_grad(lambda x: jnp.sum(
                (A.warp_projective(x + carry.astype(x.dtype), m, pmode, pad,
                                   kind).astype(jnp.float32) * wts)))(im)
            return out * 1e-12 + jnp.float32(g.astype(jnp.float32).sum()) * 1e-12, None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return total

    f = jax.jit(chain)
    float(f(img))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(f(img)); ts.append(time.perf_counter() - t0)
    return min(ts) / K * 1e3


for name, m, pmode, pad, kind in (
    ("affine/border", af, "border", A._affine_pad(H, W, 15.0, 0.1), "affine"),
    ("projective/zeros", pe, "zeros", 0, "projective"),
):
    t32 = time_vg(img32, wts32, m, pmode, pad, kind)
    t16 = time_vg(img32.astype(jnp.bfloat16), wts32, m, pmode, pad, kind)
    print(f"{name:18s}: f32 {t32:6.1f} ms   bf16 {t16:6.1f} ms")
