"""TPU drive: skewed (cross-band pipelined) warp forward vs the unskewed
kernel — bf16 train shapes (B=64, 224px), Af and Pe families, fwd-only and
fwd+bwd (the adjoint is unchanged; the delta isolates the forward's hy/hx
prologue overlap). Bit-parity between the two kernels is separately pinned by
tests/test_warp_forward.py::test_pipe_matches_unskewed_bitwise."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from feed_forward_vqgan_clip_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend())
from feed_forward_vqgan_clip_tpu.ops import augment as A
from feed_forward_vqgan_clip_tpu.ops.pallas import warp_forward as WF

B, H, W = 64, 224, 224
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.bfloat16)

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


def run_case(name, m, kind, border):
    cand = WF.pick_fwd_cand(32, "affine" if kind == "affine" else "proj", W, H)
    origins, _ = WF.forward_plan(m, H, (H, W), 32, cand, border, align=16)
    fwd = WF.warp_forward.__wrapped__

    for pipe in ("0", "1"):
        WF._FWD_PIPE_ENV = pipe

        @jax.jit
        def chain(x, m, origins):
            def body(carry, _):
                o = fwd(x + carry.astype(x.dtype), m, origins, out_hw=(H, W),
                        tile=32, cand=cand, border=border)
                return jnp.float32(jnp.sum(o.astype(jnp.float32))) * 1e-12, None
            tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return tot

        float(chain(img, m, origins))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); float(chain(img, m, origins)); ts.append(time.perf_counter() - t0)
        print(f"{name} pipe={pipe}: {min(ts)/K*1e3:7.2f} ms")

    WF._FWD_PIPE_ENV = "1"
    got = fwd(img, m, origins, out_hw=(H, W), tile=32, cand=cand, border=border)
    WF._FWD_PIPE_ENV = "0"
    want = fwd(img, m, origins, out_hw=(H, W), tile=32, cand=cand, border=border)
    eq = np.array_equal(np.asarray(got, np.float32), np.asarray(want, np.float32))
    print(f"{name} bitwise equal on device: {eq}")


run_case("Af fwd (border)", af, "affine", True)
run_case("Pe fwd (zeros)", pe, "proj", False)
print("OK")
