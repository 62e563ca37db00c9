"""TPU drive: A/B the mapper TRAIN fwd+bwd (B=8) across the fused-path env
toggles. Run as subprocesses per setting (the env knobs resolve at import).

Usage: python benchmarks/mapper_train_ab.py            # all settings
       FFVC_AB_ONE=1 python benchmarks/mapper_train_ab.py  # current env only
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

SETTINGS = [
    {},  # shipping default
    {"FFVC_FUSED_TRAIN": "0"},  # XLA autodiff
    {"FFVC_FUSED_TRAIN_PIPE": "0"},  # unskewed fwd_res
    {"FFVC_CHANNEL_BWD_PIPE": "0"},
    {"FFVC_FUSED_TRAIN_PIPE": "0", "FFVC_CHANNEL_BWD_PIPE": "0"},
]


def run_one():
    import time

    import jax
    import jax.numpy as jnp

    from feed_forward_vqgan_clip_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from feed_forward_vqgan_clip_tpu.config import make_config
    from feed_forward_vqgan_clip_tpu.models.mappers import build_mapper

    bs = int(os.environ.get("FFVC_AB_BATCH", 8))
    dtype = jnp.bfloat16
    cfg = make_config(
        clip_model="ViT-B/32", model_type="mlp_mixer", dim=1024, depth=32,
        dropout=0, vq_image_size=16, noise_dim=0, batch_size=bs, cutn=8,
        compute_dtype="bfloat16",
    )
    mapper = build_mapper(dict(cfg), vq_channels=256, dtype=dtype)
    p = jax.jit(mapper.init)(jax.random.PRNGKey(1), jnp.zeros((1, 512)))
    emb = jax.random.normal(jax.random.PRNGKey(2), (bs, 512), dtype)
    K = 10

    def chain(pp, e):
        def body(carry, _):
            def loss(q):
                z = mapper.apply(q, e + carry.astype(e.dtype))
                return jnp.float32((z.astype(jnp.float32) ** 2).sum())

            v, g = jax.value_and_grad(loss)(pp)
            return (
                v * 1e-12
                + jnp.float32(sum(jnp.sum(x) for x in jax.tree.leaves(g))) * 1e-12,
                None,
            )

        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return total

    jf = jax.jit(chain)
    float(jf(p, emb))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jf(p, emb))
        ts.append(time.perf_counter() - t0)
    print(f"RESULT {min(ts)/K*1e3:7.2f} ms/step (B={bs})", flush=True)


import os  # noqa: E402

if os.environ.get("FFVC_AB_ONE"):
    run_one()
else:
    import subprocess

    here = os.path.abspath(__file__)
    for s in SETTINGS:
        env = dict(os.environ, FFVC_AB_ONE="1", **s)
        label = ",".join(f"{k}={v}" for k, v in s.items()) or "default"
        print(f"--- {label}", flush=True)
        subprocess.run([_sys.executable, here], env=env, check=False)
