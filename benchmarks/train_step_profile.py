"""TPU drive: jax.profiler trace of the full train step with per-op attribution.

Builds the same train step as `FFVC_BENCH_MODE=train bench.py`, traces a few
steps, then parses the xplane.pb (xprof protobuf, available in this image via
tensorflow) and prints device-time aggregated by HLO op name prefix — the
source of the "warps / fused mapper / XLA fusions / conditionals / loss"
split in BENCH_NOTES.md.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import collections
import glob
import os
import re
import tempfile
import time

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

bs = int(os.environ.get("FFVC_BENCH_TRAIN_BATCH", 8))
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
state = make_train_state(params, tx)
mc = MakeCutouts(cut_size=224, cutn=8, pool_size=224)
step_fn, _ = L.make_train_step(
    cfg, mapper, frozen, mc, inp_is_tokens=True, out_is_tokens=True,
)
fz = {"clip": perceptor.params, "vq": frozen.vq_params}
toks = jnp.zeros((bs, 77), jnp.int32).at[:, 0].set(49406).at[:, 2].set(49407)
batch = {"inp": toks, "out": toks}

state, m = step_fn(state, fz, batch, jax.random.PRNGKey(0))
float(m["loss"])
for i in range(3):  # settle
    state, m = step_fn(state, fz, batch, jax.random.PRNGKey(i))
float(m["loss"])

NSTEPS = 3
logdir = tempfile.mkdtemp(prefix="ffvc_prof_")
jax.profiler.start_trace(logdir)
for i in range(NSTEPS):
    state, m = step_fn(state, fz, batch, jax.random.PRNGKey(100 + i))
float(m["loss"])
jax.profiler.stop_trace()
print("trace in", logdir)

# ---------------------------------------------------------------- parse xplane
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
assert paths, f"no xplane under {logdir}"
xs = xplane_pb2.XSpace()
with open(paths[0], "rb") as f:
    xs.ParseFromString(f.read())

per_op = collections.Counter()          # exact HLO op name -> ps
for plane in xs.planes:
    if "TPU" not in plane.name and "Device" not in plane.name:
        continue
    meta = plane.event_metadata
    for line in plane.lines:
        lname = line.name.lower()
        # keep only the xla op line (avoid double counting across aggregation lines)
        if "xla op" not in lname and "hlo op" not in lname:
            continue
        for ev in line.events:
            name = meta[ev.metadata_id].name if ev.metadata_id in meta else "?"
            per_op[name] += ev.duration_ps

if not per_op:
    # fall back: aggregate every device-plane line name once
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = plane.event_metadata
        seen_lines = set()
        for line in plane.lines:
            if line.name in seen_lines:
                continue
            seen_lines.add(line.name)
            print("line:", line.name, len(line.events))

total_ms = sum(per_op.values()) / 1e9 / NSTEPS

def bucket(name):
    n = name.lower()
    if "warp_forward" in n:
        return "warp fwd kernel"
    if "warp_adjoint" in n:
        return "warp adjoint kernel"
    if "block_res" in n or "fwd_res" in n:
        return "mapper fwd_res kernel"
    if "channel_bwd" in n:
        return "mapper channel_bwd kernel"
    if "token_bwd" in n:
        return "mapper token_bwd kernel"
    if "conditional" in n:
        return "conditional"
    if n.startswith("fusion") or ".fusion" in n:
        return "xla fusion"
    if "conv" in n:
        return "convolution"
    if "dot" in n:
        return "dot"
    if "scatter" in n:
        return "scatter"
    if "gather" in n:
        return "gather"
    if "reduce" in n:
        return "reduce"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/transpose"
    if "rng" in n:
        return "rng"
    if "custom-call" in n or "custom_call" in n:
        return "custom-call(other)"
    return "other"

by_bucket = collections.Counter()
for name, ps in per_op.items():
    by_bucket[bucket(name)] += ps

print(f"\n== device time by bucket ({NSTEPS} steps, total {total_ms:.1f} ms/step) ==")
for b, ps in by_bucket.most_common():
    print(f"  {b:28s} {ps/1e9/NSTEPS:8.2f} ms/step")

print("\n== top 45 ops ==")
for name, ps in per_op.most_common(45):
    print(f"  {ps/1e9/NSTEPS:8.3f} ms  {name[:110]}")
