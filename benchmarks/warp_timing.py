"""TPU drive: redesigned warp adjoint (big bands + border-by-clamping).

Checks grad exactness vs the XLA scatter transpose and times fwd+bwd for the
two default-chain warp families at train shapes.
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

B, H, W = 64, 224, 224
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.float32)
wts = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.float32)

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

cases = (("affine/border", af, "border", A._affine_pad(H, W, 15.0, 0.1)),
         ("projective/zeros", pe, "zeros", 0))
K = 20


def grad_of(mode_v, mode_f, m, pmode, pad, kind):
    A._WARP_VJP_MODE, A._WARP_FWD_MODE = mode_v, mode_f
    return jax.jit(jax.grad(lambda x: jnp.sum(
        A.warp_projective(x, m, pmode, pad, kind) * wts)))(img)


def time_both(mode_v, mode_f, m, pmode, pad, kind):
    A._WARP_VJP_MODE, A._WARP_FWD_MODE = mode_v, mode_f

    def chain(im):
        def body(carry, _):
            out, g = jax.value_and_grad(lambda x: jnp.sum(
                A.warp_projective(x + carry.astype(x.dtype), m, pmode, pad,
                                  kind) * wts))(im)
            return jnp.float32(out) * 1e-12 + jnp.float32(g.sum()) * 1e-12, None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return total

    f = jax.jit(chain)
    float(f(img))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(f(img)); ts.append(time.perf_counter() - t0)
    return min(ts) / K * 1e3


kind_of = {"affine/border": "affine", "projective/zeros": "projective"}
for name, m, pmode, pad in cases:
    kind = kind_of[name]
    g_fast = np.asarray(grad_of("pallas", "xla", m, pmode, pad, kind))
    g_ref = np.asarray(grad_of("xla", "xla", m, pmode, pad, kind))
    print(f"{name}: max|grad diff|={np.abs(g_fast - g_ref).max():.3e} "
          f"(ref scale {np.abs(g_ref).max():.2f})")

for name, m, pmode, pad in cases:
    kind = kind_of[name]
    t_pp = time_both("pallas", "pallas", m, pmode, pad, kind)
    t_xx = time_both("xla", "xla", m, pmode, pad, kind)
    print(f"{name}: value_and_grad pallas/pallas {t_pp:.2f} ms vs xla/xla {t_xx:.2f} ms")
print("OK")
