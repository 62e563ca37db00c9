"""TPU drive: train-step time vs aug subset, isolating warp vs non-warp cost."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import time

os.environ.setdefault("FFVC_BENCH_MODE", "train")

import jax
import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.utils import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend())

from feed_forward_vqgan_clip_tpu.config import make_config
from feed_forward_vqgan_clip_tpu.models.mappers import build_mapper
from feed_forward_vqgan_clip_tpu.models.perceptor import load_perceptor
from feed_forward_vqgan_clip_tpu.models.vqgan import make_vqgan
from feed_forward_vqgan_clip_tpu.ops.cutouts import MakeCutouts
from feed_forward_vqgan_clip_tpu.registry import VQGAN_CONFIGS
from feed_forward_vqgan_clip_tpu.train import loop as L
from feed_forward_vqgan_clip_tpu.train.state import make_optimizer, make_train_state

bs = 8
dtype = jnp.bfloat16
cfg = make_config(
    clip_model="ViT-B/32", model_type="mlp_mixer", dim=1024, depth=32,
    dropout=0, vq_image_size=16, noise_dim=0, batch_size=bs, cutn=8,
    compute_dtype="bfloat16",
)
perceptor = load_perceptor("ViT-B/32", dtype=dtype)
vq = make_vqgan(VQGAN_CONFIGS["vqgan_imagenet_f16_16384"], dtype=dtype)
frozen = L.FrozenModels(perceptor, vq, jax.jit(vq.init)(
    jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 256))), None, None, None)
mapper = build_mapper(dict(cfg), vq_channels=256, dtype=dtype)
params = jax.jit(mapper.init)(jax.random.PRNGKey(1), jnp.zeros((1, 512)))
tx = make_optimizer(1e-3)
fz = {"clip": perceptor.params, "vq": frozen.vq_params}
toks = jnp.zeros((bs, 77), jnp.int32).at[:, 0].set(49406).at[:, 2].set(49407)
batch = {"inp": toks, "out": toks}

for name, augs in (("default Af,Pe,Ji,Er", None),
                   ("Ji,Er only", ["Ji", "Er"]),
                   ("Af only", ["Af"]),
                   ("Pe only", ["Pe"])):
    mc = MakeCutouts(cut_size=224, cutn=8, pool_size=224, augs=augs)
    step_fn, _ = L.make_train_step(
        cfg, mapper, frozen, mc, inp_is_tokens=True, out_is_tokens=True)
    state = make_train_state(jax.tree.map(jnp.copy, params), tx)
    state, m = step_fn(state, fz, batch, jax.random.PRNGKey(0))
    float(m["loss"])
    K = 10
    t0 = time.perf_counter()
    for i in range(K):
        state, m = step_fn(state, fz, batch, jax.random.PRNGKey(i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / K
    print(f"{name:22s}: {dt*1e3:7.1f} ms/step")
print("OK")
