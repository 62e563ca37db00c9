"""TPU experiment: warp_adjoint band height (tile) sweep.

Hypothesis: tile=32 leaves the contraction's M dim at 25% MXU row occupancy
and rebuilds hx (the big hat factor) cand/tile times redundantly; total
contraction FLOPs are tile-invariant, so bigger bands should be strictly
faster until VMEM pressure bites.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from feed_forward_vqgan_clip_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend())

from feed_forward_vqgan_clip_tpu.ops import augment as A
from feed_forward_vqgan_clip_tpu.ops.pallas.warp_adjoint import (
    adjoint_plan,
    warp_adjoint,
)

B, H, W = 64, 224, 224
rng = np.random.default_rng(0)
g = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.float32)

base = jnp.asarray([[0., 0.], [W - 1., 0.], [W - 1., H - 1.], [0., H - 1.]])
signs = jnp.asarray([[1, 1], [-1, 1], [-1, -1], [1, -1]], jnp.float32)
half = jnp.asarray([W, H], jnp.float32) * 0.35
disp = jax.random.uniform(jax.random.PRNGKey(9), (B, 4, 2)) * half * signs
pe = A.solve_homography(base[None] + disp, jnp.broadcast_to(base, (B, 4, 2)))

# exact reference: XLA transpose of the gather forward
ref = A._xla_adjoint(g, pe, jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32), "zeros")
ref = np.asarray(ref)

K = 20
cand = 224
for tile in (32, 56, 112, 224):
    origins, unc = adjoint_plan(pe, (H, W), (H, W), tile, cand)
    assert not bool(unc), tile

    def run(gg, tile=tile, origins=origins):
        def body(carry, _):
            out = warp_adjoint(gg + carry.astype(gg.dtype), pe, origins,
                               in_hw=(H, W), tile=tile, cand=cand)
            return jnp.float32(out.sum()) * 1e-12, None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return total

    f = jax.jit(run)
    float(f(g))
    got = np.asarray(warp_adjoint(g, pe, origins, in_hw=(H, W), tile=tile, cand=cand))
    err = np.abs(got - ref).max()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(f(g)); ts.append(time.perf_counter() - t0)
    print(f"tile={tile:3d}: {min(ts)/K*1e3:7.2f} ms/iter  max|err|={err:.3e}")
print("OK")
