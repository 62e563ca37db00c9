"""aug_dtype training-equivalence experiment (round-3 verdict weak #6).

The default train configuration runs the cutout/augment stage in bf16
(aug_dtype follows compute_dtype; train/loop.py) — elementwise the warps match
f32 to 2e-2 abs / 5e-2 rel, but that alone doesn't show TRAINING equivalence.
This harness runs the same training twice (identical seed, data, init) with
aug_dtype=bfloat16 vs float32 on the flagship geometry and compares the loss
trajectories and final spherical eval distances.

Environment notes: no BPE merge table and no pretrained weights exist in this
image (egress-gated), so prompts are a fixed bank of random token sequences
and the frozen towers are randomly initialized — the architecture, scale,
gradient path, and aug math are exactly the training ones; only the semantic
content of the loss differs. Loss still decreases (the mapper learns to
please the random-frozen CLIP), which is what the comparison needs.

Run on the TPU chip:  python benchmarks/aug_dtype_equivalence.py
Env: FFVC_EQ_STEPS (default 300), FFVC_EQ_BATCH (default 8).
Prints one JSON line per setting plus a comparison line; paste results into
BENCH_NOTES.md.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STEPS = int(os.environ.get("FFVC_EQ_STEPS", 300))
BATCH = int(os.environ.get("FFVC_EQ_BATCH", 8))


def run(aug_dtype: str, opt_dtype=None):
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

    dtype = jnp.bfloat16
    cfg = make_config(
        clip_model="ViT-B/32", model_type="mlp_mixer", dim=1024, depth=32,
        dropout=0, vq_image_size=16, noise_dim=0, batch_size=BATCH, cutn=8,
        compute_dtype="bfloat16", aug_dtype=aug_dtype, lr=3e-4,
    )
    perceptor = load_perceptor("ViT-B/32", dtype=dtype)
    vq = make_vqgan(VQGAN_CONFIGS["vqgan_imagenet_f16_16384"], dtype=dtype)
    frozen = L.FrozenModels(perceptor, vq, None, None, None, None)
    mapper = build_mapper(dict(cfg), vq_channels=256, dtype=dtype)
    params = jax.jit(mapper.init)(jax.random.PRNGKey(1), jnp.zeros((1, 512)))
    tx = make_optimizer(3e-4, opt_dtype=opt_dtype)
    state = make_train_state(params, tx)
    mc = MakeCutouts(cut_size=224, cutn=8, pool_size=224)
    step_fn, loss_fn = L.make_train_step(
        cfg, mapper, frozen, mc, inp_is_tokens=True, out_is_tokens=True,
    )
    vq_params = jax.jit(vq.init)(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 256)))
    fz = {"clip": perceptor.params, "vq": vq_params}

    # fixed random-token prompt bank, identical across settings
    rng = np.random.default_rng(42)
    bank = np.zeros((64, 77), np.int32)
    bank[:, 0] = 49406
    bank[:, 1:6] = rng.integers(300, 40000, size=(64, 5))
    bank[:, 6] = 49407

    # chain CHUNK steps per dispatch (axon tunnel overhead), log losses
    root = jax.random.PRNGKey(7)
    CHUNK = 10

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(4,))
    def chain(st, fz, toks, i0, k):
        def body(st, i):
            b = {"inp": jax.lax.dynamic_index_in_dim(toks, i % toks.shape[0], keepdims=False),
                 "out": jax.lax.dynamic_index_in_dim(toks, i % toks.shape[0], keepdims=False)}
            st, m = step_fn.body(st, fz, b, jax.random.fold_in(root, i))
            return st, m["loss"]

        st, losses = jax.lax.scan(body, st, i0 + jnp.arange(k))
        return st, losses

    # pre-batch the bank into (nb, BATCH, 77) token batches
    nb = 64 // BATCH
    toks = jnp.asarray(bank[: nb * BATCH].reshape(nb, BATCH, 77))

    losses = []
    t0 = time.time()
    for i0 in range(0, STEPS, CHUNK):
        state, ls = chain(state, fz, toks, jnp.int32(i0), CHUNK)
        losses.extend(np.asarray(ls, np.float64).tolist())
    wall = time.time() - t0

    # final eval: no-cutout render -> resize -> CLIP dists on the full bank
    from feed_forward_vqgan_clip_tpu.models.vqgan import latent_bounds, synth
    from feed_forward_vqgan_clip_tpu.ops.grad_ops import clamp_with_grad
    from feed_forward_vqgan_clip_tpu.ops.losses import normalize, spherical_dist
    from feed_forward_vqgan_clip_tpu.registry import CLIP_MEAN, CLIP_STD

    @jax.jit
    def eval_dists(params, fz, tok):
        feats = perceptor.module.apply(fz["clip"], tok, method=perceptor.module.encode_text)
        z = mapper.apply(params, feats.astype(jnp.float32))
        lo, hi = latent_bounds(fz["vq"])
        xr = synth(vq, fz["vq"], clamp_with_grad(z, lo, hi)).astype(jnp.float32)
        xr = jax.image.resize(xr, (xr.shape[0], 224, 224, 3), "bilinear")
        mean = jnp.asarray(CLIP_MEAN).reshape(1, 1, 1, 3)
        std = jnp.asarray(CLIP_STD).reshape(1, 1, 1, 3)
        emb = perceptor.module.apply(
            fz["clip"], (xr - mean) / std, method=perceptor.module.encode_image
        )
        return spherical_dist(normalize(feats.astype(jnp.float32)),
                              normalize(emb.astype(jnp.float32)))

    ds = np.concatenate([np.asarray(eval_dists(state.params, fz, toks[i]))
                         for i in range(nb)])
    out = {
        "aug_dtype": aug_dtype,
        "opt_dtype": opt_dtype or "float32",
        "steps": STEPS,
        "loss_first10": round(float(np.mean(losses[:10])), 4),
        "loss_mid10": round(float(np.mean(losses[STEPS // 2 - 5: STEPS // 2 + 5])), 4),
        "loss_last10": round(float(np.mean(losses[-10:])), 4),
        "eval_dists_mean": round(float(ds.mean()), 4),
        "eval_dists_std": round(float(ds.std()), 4),
        "wall_s": round(wall, 1),
    }
    print(json.dumps(out), flush=True)
    return out, losses


def _compare(name, a, la, b, lb):
    la, lb = np.asarray(la), np.asarray(lb)
    # smoothed trajectory gap relative to the reference run's loss scale
    k = 20
    sa = np.convolve(la, np.ones(k) / k, "valid")
    sb = np.convolve(lb, np.ones(k) / k, "valid")
    print(json.dumps({
        "comparison": name,
        "max_smoothed_loss_gap": round(float(np.max(np.abs(sa - sb))), 4),
        "final_loss_gap": round(a["loss_last10"] - b["loss_last10"], 4),
        "eval_dists_gap": round(a["eval_dists_mean"] - b["eval_dists_mean"], 4),
    }), flush=True)


def main():
    a, la = run("bfloat16")            # the shipping default
    b, lb = run("float32")             # reference-f32 aug math
    c, lc = run("bfloat16", "bfloat16")  # + bf16 Adam moments
    _compare("bf16_vs_f32_aug", a, la, b, lb)
    _compare("bf16opt_vs_f32opt", c, lc, a, la)


if __name__ == "__main__":
    main()
