"""TPU drive: fused mixer TRAIN fwd+bwd at flagship geometry, pipe on/off.

Times value_and_grad over the 32-block fused stack (the mapper's hot train
path) at several batch sizes with FFVC_FUSED_TRAIN_PIPE forced on/off, to set
the skewed train-forward kernel's default dispatch by measurement.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend())

from feed_forward_vqgan_clip_tpu.ops.pallas import mixer_block as mb

D, T, DEPTH = 1024, 256, 32
key = jax.random.PRNGKey(0)
p = {}
for i in range(DEPTH):
    ks = jax.random.split(jax.random.fold_in(key, i), 8)
    et, ec = T // 2, D * 4
    p[f"block_{i}"] = {
        "token_norm": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        "token_fc1": jax.random.normal(ks[0], (T, et)) * 0.02,
        "token_fc1_bias": jnp.zeros((et,)),
        "token_fc2": jax.random.normal(ks[1], (et, T)) * 0.02,
        "token_fc2_bias": jnp.zeros((T,)),
        "channel_norm": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        "channel_fc1": {
            "kernel": jax.random.normal(ks[2], (D, ec)) * 0.02,
            "bias": jnp.zeros((ec,)),
        },
        "channel_fc2": {
            "kernel": jax.random.normal(ks[3], (ec, D)) * 0.02,
            "bias": jnp.zeros((D,)),
        },
    }
p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)


def stack_loss(params, x):
    h = x
    for i in range(DEPTH):
        h = mb.fused_mixer_block_train(h, params[f"block_{i}"], jnp.bfloat16, False)
    return jnp.sum(h.astype(jnp.float32) ** 2)


def loss_and_gradsum(params, x):
    # fold every grad into the fetched scalar so nothing can be elided and a
    # single float() forces the whole executable (axon-safe, like bench.py)
    loss, (gp, gx) = jax.value_and_grad(stack_loss, argnums=(0, 1))(params, x)
    gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(gp))
    return loss + gsum + jnp.sum(gx.astype(jnp.float32))


for B in (8, 32, 64):
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D), jnp.bfloat16)
    for env in ("0", "1"):
        mb._TRAIN_PIPE_ENV = env
        f = jax.jit(loss_and_gradsum)
        float(f(p, x))
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            float(f(p, x))
        dt = (time.perf_counter() - t0) / n
        print(f"B={B} pipe={env}: {dt*1e3:.2f} ms fwd+bwd (32 blocks)")
        f.clear_cache()
