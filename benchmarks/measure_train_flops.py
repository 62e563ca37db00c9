"""One-off: XLA cost-model FLOP count of the PARITY train graph (fwd+bwd+Adam)
at the flagship geometry (B=8, cutn=8, 224px, ViT-B/32, mixer 32x1024, f16-16384
VQGAN) with every framework optimization disabled — the reference's eager torch
step executes the same matmuls/convs, so this is its per-step FLOP budget."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["FFVC_FUSED_TRAIN"] = "0"
os.environ["FFVC_FAST_UPSAMPLE"] = "0"
os.environ["FFVC_STREAM_MIXER"] = "0"

import jax
import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.config import make_config
from feed_forward_vqgan_clip_tpu.models.mappers import build_mapper
from feed_forward_vqgan_clip_tpu.models.perceptor import load_perceptor
from feed_forward_vqgan_clip_tpu.models.vqgan import make_vqgan
from feed_forward_vqgan_clip_tpu.ops.cutouts import MakeCutouts
from feed_forward_vqgan_clip_tpu.registry import VQGAN_CONFIGS
from feed_forward_vqgan_clip_tpu.train import loop as L
from feed_forward_vqgan_clip_tpu.train.state import make_optimizer, make_train_state
from feed_forward_vqgan_clip_tpu.utils import enable_compilation_cache

enable_compilation_cache()
bs = 8
dtype = jnp.bfloat16
cfg = make_config(
    clip_model="ViT-B/32", model_type="mlp_mixer", dim=1024, depth=32,
    dropout=0, vq_image_size=16, noise_dim=0, batch_size=bs, cutn=8,
    compute_dtype="bfloat16", use_pallas=False,
)
perceptor = load_perceptor("ViT-B/32", dtype=dtype)
vq = make_vqgan(VQGAN_CONFIGS["vqgan_imagenet_f16_16384"], dtype=dtype)
frozen = L.FrozenModels(perceptor, vq, jax.jit(vq.init)(
    jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 256))), None, None, None)
mapper = build_mapper(dict(cfg), vq_channels=256, dtype=dtype)
params = jax.jit(mapper.init)(jax.random.PRNGKey(1), jnp.zeros((1, 512)))
tx = make_optimizer(1e-3, opt_dtype="float32")
state = make_train_state(params, tx)
step_fn, _ = L.make_train_step(
    cfg, mapper, frozen, MakeCutouts(cut_size=224, cutn=8, pool_size=224),
    inp_is_tokens=True, out_is_tokens=True,
)
fz = {"clip": perceptor.params, "vq": frozen.vq_params}
toks = jnp.zeros((bs, 77), jnp.int32).at[:, 0].set(49406).at[:, 2].set(49407)
batch = {"inp": toks, "out": toks}

lowered = jax.jit(step_fn.body, donate_argnums=(0,)).lower(
    state, fz, batch, jax.random.PRNGKey(0)
)
cost = lowered.compile().cost_analysis()
if isinstance(cost, list):
    cost = cost[0]
flops = float(cost.get("flops", 0.0))
print(f"train step flops total = {flops:.4e}")
print(f"per image (bs={bs})    = {flops / bs:.4e}")
