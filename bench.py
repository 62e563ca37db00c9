"""Benchmark harness: the north-star metric (BASELINE.md).

Measures single-pass prompt->image throughput at 256x256 on one TPU chip for the
flagship config (CLIP ViT-B/32 text encoder + MLP-Mixer 32x1024 mapper + VQGAN
f16-16384 decoder, bf16). Weights are random — identical compute graph and
therefore identical throughput to trained weights.

Timing methodology (axon-platform-safe): `block_until_ready` is a no-op through
the axon tunnel and a bare host readback carries ~30ms of round-trip overhead, so
K=50 pipeline iterations are CHAINED INSIDE ONE JIT via lax.scan (each iteration
consumes its own token batch and contributes to a scalar carry, forcing sequential
execution) and synced with a single scalar readback whose overhead is <1% of the
chain. A slope variant of this harness measured 96% of v5e bf16 peak on a 4096^3
matmul, validating the method.

Default output (FFVC_BENCH_MODE=all): THREE json metric lines — the infer
headline {"metric", "value", "unit", "vs_baseline"}, the train-step line, and
the batch-1 latency line — with the headline repeated as the final line so
single-line parsers (first- or last-match) still resolve the north-star
metric. FFVC_BENCH_MODE=infer|train|latency prints just that one line.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the A100 anchor
is an analytic proxy:

    proxy_imgs_per_sec = A100_TF32_PEAK (156 TFLOP/s) * EAGER_UTIL
                         / REF_PIPELINE_FLOPS_PER_IMAGE

REF_PIPELINE_FLOPS_PER_IMAGE is a FROZEN constant — the XLA-cost-model FLOP count
of the parity pipeline (CLIP ViT-B/32 text encode + 32x1024 MLP-Mixer + f16-16384
VQGAN decode at 256px), 433.0 GFLOP/image, measured once in round 1 when this
repo's graph was op-for-op parity with the reference. The reference's eager torch
pipeline executes the same matmuls/convs, so this is its FLOP budget too. Freezing
it (instead of recomputing from the current graph) makes the anchor invariant to
our own optimizations: a FLOP-reducing rewrite on our side now *raises*
vs_baseline instead of silently lowering the anchor with it.

EAGER_UTIL: the reference runs eager PyTorch in full fp32 (no autocast/.half()
anywhere in main.py or predict.py), so TF32 tensor-core peak is the right ceiling.
Published eager-mode utilization measurements for conv/matmul mixes of this shape
are typically 0.10-0.30 of peak (per-op launch overhead, no cross-op fusion); the
headline uses 0.35 — deliberately *generous to the reference* (i.e. conservative
for us) — and the JSON also carries vs_baseline_util20 at a mid-range 0.20 so the
sensitivity of the claim to this one assumption is visible in every artifact.
The north-star asks for >= 5x.
"""

import functools
import json
import sys
import time

import os

import numpy as np

A100_TF32_PEAK = 156e12
A100_EAGER_UTIL = 0.35  # generous-to-reference headline assumption
A100_EAGER_UTIL_MID = 0.20  # mid-range measured eager utilization, reported alongside
# Frozen reference-pipeline FLOP budget (see module docstring). Do NOT recompute
# from the live graph: the anchor must stay pinned to the reference's compute.
REF_PIPELINE_FLOPS_PER_IMAGE = 433.0e9
# Train-side frozen anchor (round 5), same methodology: XLA cost-model FLOPs of
# the PARITY train step (fwd+bwd+Adam, every framework optimization disabled —
# FFVC_FUSED_TRAIN=0, FFVC_FAST_UPSAMPLE=0, use_pallas=False) at the example
# geometry B=8/cutn=8/224px/ViT-B/32/mixer-32x1024/f16-16384, measured once by
# benchmarks/measure_train_flops.py: 9.5078e12 per step. The reference's eager
# step runs the same matmuls/convs fwd+bwd, so this is its budget too.
REF_TRAIN_FLOPS_PER_IMAGE = 9.5078e12 / 8
# Default batch 256: measured 431.5 img/s vs 430.3 at B=128 and 422.5 at B=64
# (round 5) — boundary-step amortization in the skewed mixer kernel keeps
# paying through 256; latency/train modes are unaffected.
BATCH = int(os.environ.get("FFVC_BENCH_BATCH", 256))
K_ITERS = 50  # one compiled scan; dispatch+readback overhead (~30ms) is <1% of wall
# all (default): infer headline + train-step + batch-1-latency JSON lines in
# ONE run, so every headline number lands in the driver's BENCH artifact
# instead of builder-committed side files. infer|train|latency run just that
# mode (the round-3 single-line contract).
MODE = os.environ.get("FFVC_BENCH_MODE", "all")


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from feed_forward_vqgan_clip_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if MODE == "train":
        return train_bench()
    if MODE == "latency":
        # batch-1 serving: the depth-streaming whole-stack mixer kernel beats
        # the per-block weight-resident one (weight DMA hides under compute;
        # 32 kernel launches collapse into one). FFVC_STREAM_MIXER=0 reverts.
        os.environ.setdefault("FFVC_STREAM_MIXER", "1")
    from __graft_entry__ import entry

    fn, (tokens, mp, cp, vp) = entry()
    rng = np.random.default_rng(0)
    if MODE == "latency":
        return latency_bench(jax, jnp, fn, tokens, mp, cp, vp, rng)
    headline = infer_bench(jax, jnp, fn, tokens, mp, cp, vp, rng)
    if MODE != "all":
        return
    # extras are best-effort: the headline line above is already out, and each
    # failure is reported on stderr without killing the run
    for name, run in (("train", train_bench), ("latency", _latency_for_all)):
        try:
            run()
        except Exception as e:  # pragma: no cover - depends on live hardware
            print(f"# {name} bench failed: {e!r}", file=sys.stderr)
    # repeat the headline as the FINAL line: parsers that take the last (or
    # first) JSON line both resolve to the north-star metric, while the tail
    # still carries all three metric lines
    print(headline)


def _latency_for_all():
    """latency leg of MODE=all: entry() re-resolves with the depth-streaming
    mapper layout (the env var is read inside entry)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    os.environ["FFVC_STREAM_MIXER"] = "1"
    try:
        fn, (tokens, mp, cp, vp) = entry()
        latency_bench(jax, jnp, fn, tokens, mp, cp, vp, np.random.default_rng(0))
    finally:
        os.environ.pop("FFVC_STREAM_MIXER", None)


def infer_bench(jax, jnp, fn, tokens, mp, cp, vp, rng):
    """North-star throughput (batch 64, chained scan); prints the headline JSON
    line and returns it (MODE=all re-prints it as the final line)."""

    def token_stack(k):
        t = np.tile(tokens[:1], (k, BATCH, 1))
        t[:, :, 1] = rng.integers(300, 40000, size=(k, BATCH))
        return jnp.asarray(t)

    @functools.partial(jax.jit, static_argnums=(4,))
    def chain(tok_stack, mp, cp, vp, k):
        def body(carry, tok):
            img = fn(tok, mp, cp, vp)
            return carry + jnp.mean(img.astype(jnp.float32)), ()

        total, _ = jax.lax.scan(body, jnp.float32(0.0), tok_stack, length=k)
        return total

    stack = token_stack(K_ITERS)
    float(chain(stack, mp, cp, vp, K_ITERS))  # compile + warm
    t_best = min(_once(chain, stack, mp, cp, vp, K_ITERS) for _ in range(3))
    per_iter = t_best / K_ITERS
    imgs_per_sec = BATCH / per_iter

    # Anchor: frozen reference FLOP budget (module docstring). The live graph's
    # XLA cost model is still queried, but only for the MXU-utilization stderr
    # diagnostic — our own FLOP count may legitimately drift below the anchor.
    try:
        one = jax.jit(fn)
        cost = one.lower(np.asarray(token_stack(1)[0]), mp, cp, vp).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops_per_batch = float(cost.get("flops", 0.0))
    except Exception:
        flops_per_batch = 0.0
    live_flops_per_image = (
        flops_per_batch / BATCH if flops_per_batch > 0 else REF_PIPELINE_FLOPS_PER_IMAGE
    )
    a100_proxy = A100_TF32_PEAK * A100_EAGER_UTIL / REF_PIPELINE_FLOPS_PER_IMAGE
    a100_proxy_mid = A100_TF32_PEAK * A100_EAGER_UTIL_MID / REF_PIPELINE_FLOPS_PER_IMAGE

    headline = json.dumps(
        {
            "metric": "images_per_sec_per_chip_256px_prompt_to_image",
            "value": round(imgs_per_sec, 2),
            "unit": "img/s",
            "vs_baseline": round(imgs_per_sec / a100_proxy, 3),
            "vs_baseline_util20": round(imgs_per_sec / a100_proxy_mid, 3),
        }
    )
    print(headline, flush=True)
    print(
        f"# batch={BATCH} chain={K_ITERS} iters wall={t_best*1e3:.0f}ms -> "
        f"{per_iter*1e3:.2f} ms/batch; live flops/img={live_flops_per_image/1e9:.1f}G "
        f"(anchor frozen at {REF_PIPELINE_FLOPS_PER_IMAGE/1e9:.1f}G); "
        f"a100_proxy={a100_proxy:.1f} img/s @util {A100_EAGER_UTIL} "
        f"({a100_proxy_mid:.1f} @ {A100_EAGER_UTIL_MID}); "
        f"tpu_mxu_util={live_flops_per_image*imgs_per_sec/197e12:.1%} of v5e peak",
        file=sys.stderr,
    )
    return headline


def _once(chain, stack, mp, cp, vp, k):
    t0 = time.perf_counter()
    float(chain(stack, mp, cp, vp, k))
    return time.perf_counter() - t0


def latency_bench(jax, jnp, fn, tokens, mp, cp, vp, rng):
    """FFVC_BENCH_MODE=latency: single-prompt (batch 1) device latency of the
    full prompt->image pipeline. Uses the same in-jit chain so the host tunnel's
    ~30ms dispatch/readback overhead (environment, not model) stays out of the
    number; chained per-iteration device time IS the serialized batch-1 latency."""
    k = 50
    t = np.tile(tokens[:1], (k, 1, 1))
    t[:, :, 1] = rng.integers(300, 40000, size=(k, 1))
    stack = jnp.asarray(t)

    @functools.partial(jax.jit, static_argnums=(4,))
    def chain(tok_stack, mp, cp, vp, kk):
        def body(carry, tok):
            img = fn(tok, mp, cp, vp)
            return carry + jnp.mean(img.astype(jnp.float32)), ()

        total, _ = jax.lax.scan(body, jnp.float32(0.0), tok_stack, length=kk)
        return total

    float(chain(stack, mp, cp, vp, k))
    t_best = min(_once(chain, stack, mp, cp, vp, k) for _ in range(5))
    per_iter_ms = t_best / k * 1e3
    print(
        json.dumps(
            {
                "metric": "p50_latency_batch1_256px_prompt_to_image",
                "value": round(per_iter_ms, 2),
                "unit": "ms",
                "vs_baseline": None,
            }
        ),
        flush=True,
    )
    print(f"# chained batch-1 device latency over {k} prompts", file=sys.stderr)


def train_bench():
    """FFVC_BENCH_MODE=train: full train-step throughput for the example-config
    geometry (flagship mapper, cutn=8, 224px cutouts, ViT-B/32 loss) on one chip."""
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

    bs = int(os.environ.get("FFVC_BENCH_TRAIN_BATCH", 8))
    fuse = os.environ.get("FFVC_BENCH_FUSE_AUGS", "") not in ("", "0", "false")
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
    # bf16 Adam moments are the shipping default (config.py opt_dtype);
    # FFVC_BENCH_OPT_DTYPE=float32 measures the reference-f32 moment path
    tx = make_optimizer(
        1e-3, opt_dtype=os.environ.get("FFVC_BENCH_OPT_DTYPE", "bfloat16")
    )
    state = make_train_state(params, tx)
    mc = MakeCutouts(cut_size=224, cutn=8, pool_size=224, fuse_geometric=fuse)
    step_fn, _ = L.make_train_step(
        cfg, mapper, frozen, mc, inp_is_tokens=True, out_is_tokens=True,
        same_io=True,  # mirrors the trainer on a text dataset (one text encode)
    )
    fz = {"clip": perceptor.params, "vq": frozen.vq_params}
    toks = jnp.zeros((bs, 77), jnp.int32).at[:, 0].set(49406).at[:, 2].set(49407)
    batch = {"inp": toks, "out": toks}

    K = 10
    if os.environ.get("FFVC_BENCH_TRAIN_CHAIN", "1") not in ("0", "false"):
        # scan-chain K steps inside ONE jit (same methodology as the infer
        # bench): per-dispatch tunnel overhead stays out; the state carry
        # serializes iterations, per-step fold_in keys vary the aug draws so
        # nothing is loop-invariant
        root = jax.random.PRNGKey(0)

        @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
        def chain(st, fz, batch, k):
            def body(st, i):
                st, m = step_fn.body(st, fz, batch, jax.random.fold_in(root, i))
                return st, m["loss"]

            st, losses = jax.lax.scan(body, st, jnp.arange(k))
            return st, jnp.sum(losses)

        state, tot = chain(state, fz, batch, K)
        float(tot)
        t0 = time.perf_counter()
        state, tot = chain(state, fz, batch, K)
        float(tot)
        dt = (time.perf_counter() - t0) / K
    else:
        # python-loop mode: each step syncs through the donated state, final
        # scalar readback confirms
        state, m = step_fn(state, fz, batch, jax.random.PRNGKey(0))
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(K):
            state, m = step_fn(state, fz, batch, jax.random.PRNGKey(i))
        float(m["loss"])
        dt = (time.perf_counter() - t0) / K
    a100_train = A100_TF32_PEAK * A100_EAGER_UTIL / REF_TRAIN_FLOPS_PER_IMAGE
    a100_train_mid = A100_TF32_PEAK * A100_EAGER_UTIL_MID / REF_TRAIN_FLOPS_PER_IMAGE
    print(
        json.dumps(
            {
                "metric": "train_step_images_per_sec_single_chip",
                "value": round(bs / dt, 2),
                "unit": "img/s",
                "vs_baseline": round(bs / dt / a100_train, 3),
                "vs_baseline_util20": round(bs / dt / a100_train_mid, 3),
                "train_step_ms": round(dt * 1e3, 1),
            }
        ),
        flush=True,
    )
    print(
        f"# train step {dt*1e3:.1f} ms at batch={bs}, cutn=8, 224px cutouts, "
        f"fuse_geometric={fuse}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
