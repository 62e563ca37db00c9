"""Offline evaluation: CLIP score statistics (+ optional FID) over a prompt set.

Parity with the reference's `evaluate` (/root/reference/main.py:1063-1271):
generate with the model's own encoder, score with an independent eval perceptor
(default ViT-B/32), logit-scaled cosine CLIP scores, artifacts
`eval_<name>.npy` (per-prompt scores) + `eval_<name>.json`
{clip_score_mean, clip_score_std, clip_score_atleast_<thr>[, fid_<dataset>]};
optional image-grid dumps with caption sidecars; nb_test seeded subsampling.
"""

import json
import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from feed_forward_vqgan_clip_tpu.data.datasets import load_dataset
from feed_forward_vqgan_clip_tpu.infer import Generator
from feed_forward_vqgan_clip_tpu.io.images import save_grid
from feed_forward_vqgan_clip_tpu.models.perceptor import load_perceptor
from feed_forward_vqgan_clip_tpu.ops.losses import normalize
from feed_forward_vqgan_clip_tpu.registry import CLIP_MEAN, CLIP_STD

log = logging.getLogger(__name__)


def evaluate(
    model_path: str,
    data_path: str,
    *,
    batch_size: Optional[int] = None,
    out_folder: Optional[str] = None,
    clip_threshold: float = 25,
    nb_test: Optional[int] = None,
    save_images: bool = False,
    img_folder: Optional[str] = None,
    images_per_row: int = 8,
    seed: int = 42,
    clip_model: str = "ViT-B/32",
    clip_model_path: Optional[str] = None,
    compute_fid: bool = False,
    inception_features_real_path: Optional[str] = None,
    inception_weights_path: Optional[str] = None,
    prior_path: Optional[str] = None,
):
    name = os.path.basename(data_path) + "_" + clip_model.replace("/", "_")
    # artifacts land in the RUN folder: for a checkpoint dir that's its parent
    # (mirrors the reference's dirname(model_path), main.py:1141)
    model_dir = os.path.dirname(model_path.rstrip("/"))
    if not out_folder:
        out_folder = model_dir or "."
    os.makedirs(out_folder, exist_ok=True)
    if save_images and not img_folder:
        img_folder = os.path.join(model_dir or ".", f"eval_{name}_images")
    if img_folder:
        os.makedirs(img_folder, exist_ok=True)

    gen = Generator(model_path, prior_path=prior_path)
    eval_perceptor = load_perceptor(clip_model, clip_model_path)
    # the perceptor knows its own input geometry — any name the trainer
    # accepts (openclip tags, CLOOB, RN) works here too, instead of
    # KeyError-ing on names outside the registry table
    clip_size = eval_perceptor.size

    inception_fn = None
    inception_features = []
    if compute_fid:
        assert inception_features_real_path, "FID needs inception_features_real_path"
        from feed_forward_vqgan_clip_tpu.models.inception import make_inception_fn

        inception_fn = make_inception_fn(inception_weights_path)

    toks = load_dataset(data_path)
    if isinstance(toks, tuple):
        toks = toks[0]
    toks = np.asarray(toks)
    if not batch_size:
        batch_size = int(gen.cfg.get("batch_size"))
    rng = np.random.default_rng(seed)
    if nb_test:
        idx = rng.permutation(len(toks))[:nb_test]
        toks = toks[idx]
    log.info("Evaluate on %d prompts...", len(toks))

    is_tokens = np.issubdtype(toks.dtype, np.integer)
    mean = jnp.asarray(CLIP_MEAN).reshape(1, 1, 1, 3)
    std = jnp.asarray(CLIP_STD).reshape(1, 1, 1, 3)
    logit_scale = eval_perceptor.logit_scale

    decode_tokens = None
    if is_tokens and save_images:
        try:
            from feed_forward_vqgan_clip_tpu.tokenizer.bpe import get_tokenizer

            decode_tokens = get_tokenizer().decode
        except FileNotFoundError:
            pass

    scores_batches = []
    key = jax.random.PRNGKey(seed)
    for bi in range(0, len(toks), batch_size):
        chunk = toks[bi : bi + batch_size]
        if is_tokens:
            H = gen.perceptor.encode_text(jnp.asarray(chunk)).astype(jnp.float32)
            if gen.cfg.get("normalize_input"):
                H = normalize(H)
        else:
            H = jnp.asarray(chunk, jnp.float32)
        key, kgen = jax.random.split(key)
        xr = gen.generate(H, nb_repeats=1, key=kgen)

        if inception_fn is not None:
            inception_features.append(np.asarray(inception_fn(xr)))
        if save_images:
            save_grid(
                np.asarray(xr),
                os.path.join(img_folder, f"batch_{bi // batch_size:010d}.png"),
                nrow=images_per_row,
            )
            if decode_tokens is not None:
                with open(
                    os.path.join(img_folder, f"batch_{bi // batch_size:010d}.txt"), "w"
                ) as fd:
                    fd.write("\n".join(decode_tokens(t) for t in chunk))

        xs = jax.image.resize(xr, (xr.shape[0], clip_size, clip_size, 3), "bilinear")
        embed = eval_perceptor.encode_image((xs - mean) / std).astype(jnp.float32)
        image_features = normalize(embed)
        if is_tokens:
            text_features = eval_perceptor.encode_text(jnp.asarray(chunk)).astype(jnp.float32)
        else:
            text_features = jnp.asarray(chunk[:, : embed.shape[1]], jnp.float32)
        text_features = normalize(text_features)
        scores = logit_scale * jnp.sum(image_features * text_features, axis=1)
        scores_batches.append(np.asarray(scores))

    clip_scores = np.concatenate(scores_batches)
    out = os.path.join(out_folder, f"eval_{name}.npy")
    np.save(out, clip_scores)
    # the reference writes the per-prompt scores as a torch tensor
    # `eval_<name>.th` (main.py:1240-1245); keep that artifact too so
    # downstream reference tooling finds it
    try:
        import torch

        torch.save(torch.tensor(clip_scores), os.path.join(out_folder, f"eval_{name}.th"))
    except Exception as e:  # pragma: no cover
        log.warning("could not write eval_%s.th: %s", name, e)
    log.info("Saved %s (+ .th)", out)

    dump = {
        "clip_score_mean": float(clip_scores.mean()),
        "clip_score_std": float(clip_scores.std()),
        f"clip_score_atleast_{clip_threshold}": float(
            (clip_scores >= clip_threshold).mean()
        ),
    }
    if compute_fid:
        from feed_forward_vqgan_clip_tpu.eval.fid import frechet_distance

        fake = np.concatenate(inception_features)
        if inception_features_real_path.endswith((".th", ".pt", ".pkl")):
            import torch

            real = np.asarray(
                torch.load(inception_features_real_path, map_location="cpu", weights_only=False)
            )
        else:
            real = np.load(inception_features_real_path)
        fid = frechet_distance(real, fake)
        dump[f"fid_{os.path.basename(inception_features_real_path)}"] = fid
        log.info("FID: %s", fid)

    out = os.path.join(out_folder, f"eval_{name}.json")
    with open(out, "w") as fd:
        json.dump(dump, fd)
    log.info(
        "CLIP score mean: %s std: %s; fraction >= %s: %s",
        dump["clip_score_mean"], dump["clip_score_std"], clip_threshold,
        dump[f"clip_score_atleast_{clip_threshold}"],
    )
    return dump
