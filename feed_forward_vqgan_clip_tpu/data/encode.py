"""Dataset encoders: (image, text) pairs -> CLIP feature files.

Parity with the reference's `encode_text_and_images` (folder of img/txt pairs,
/root/reference/main.py:231-278) and `encode_text_and_images_webdataset`
(tar shards with per-process sharding and rank-0 merge, main.py:281-392). The
image preprocessing is CLIP's: bicubic resize of the short side to the encoder's
input size, center crop, CLIP-normalize. Deviation (documented): the reference
always uses the ViT-B/32 (224px) preprocess regardless of the encoding model
(main.py:255, 314), which would crash 288px perceptors; here the perceptor's own
input size is used.

The quality filter is a TPU-native NIMA (models/nima.py) replacing the
reference's optional pyiqa metric (main.py:308-312, 348-354): pass
`image_quality_threshold` plus NIMA weights (--nima-weights-path or
$FFVC_NIMA_WEIGHTS); without weights the filter warns and is skipped, matching
the reference's silent degradation on a failed pyiqa import.
"""

import logging
import os
from glob import glob
from io import BytesIO
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from feed_forward_vqgan_clip_tpu.data.tar_reader import iter_shards
from feed_forward_vqgan_clip_tpu.models.perceptor import load_perceptor
from feed_forward_vqgan_clip_tpu.registry import CLIP_MEAN, CLIP_STD
from feed_forward_vqgan_clip_tpu.tokenizer.bpe import get_tokenizer

log = logging.getLogger(__name__)

PREPROCESS_SIZE = 224  # the reference always preprocesses at ViT-B/32 geometry


def preprocess_image(img: Image.Image, size: int = PREPROCESS_SIZE) -> np.ndarray:
    """CLIP preprocessing: bicubic short-side resize, center crop, normalize; NHWC."""
    img = img.convert("RGB")
    w, h = img.size
    scale = size / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
    w, h = img.size
    left, top = (w - size) // 2, (h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img, np.float32) / 255.0
    mean = np.asarray(CLIP_MEAN, np.float32)
    std = np.asarray(CLIP_STD, np.float32)
    return (arr - mean) / std


def _save_pairs(out: str, text_feats: np.ndarray, image_feats: np.ndarray):
    if out.endswith((".pkl", ".th", ".pt")):
        import torch

        torch.save((torch.tensor(text_feats), torch.tensor(image_feats)), out)
    else:
        np.savez(out if out.endswith(".npz") else out + ".npz", x=text_feats, y=image_feats)


def _load_pairs(path: str):
    if path.endswith((".pkl", ".th", ".pt")):
        import torch

        t, i = torch.load(path, map_location="cpu", weights_only=False)
        return np.asarray(t), np.asarray(i)
    with np.load(path) as z:
        return z["x"], z["y"]


def merge_features(inputs, out: str) -> str:
    """Concatenate per-process feature shards into ONE file — the reference's
    rank-0 merge after hvd.join (/root/reference/main.py:372-390), offline form.
    `inputs`: explicit paths or a glob pattern."""
    if isinstance(inputs, str):
        paths = sorted(glob(inputs))
    else:
        paths = list(inputs)
    if not paths:
        raise FileNotFoundError(f"no feature shards match {inputs!r}")
    pairs = [_load_pairs(p) for p in paths]
    text_feats = np.concatenate([p[0] for p in pairs])
    image_feats = np.concatenate([p[1] for p in pairs])
    _save_pairs(out, text_feats, image_feats)
    log.info("Merged %d shards (%d pairs) -> %s", len(paths), len(text_feats), out)
    return out


def encode_text_and_images(
    folder: str,
    *,
    img_ext: str = "jpg",
    text_ext: str = "txt",
    out: str = "features.npz",
    clip_model: str = "ViT-B/32",
    clip_path: Optional[str] = None,
    batch_size: int = 64,
):
    perceptor = load_perceptor(clip_model, clip_path)
    size = perceptor.size
    tok = get_tokenizer()
    text_paths = sorted(glob(os.path.join(folder, "*." + text_ext)))
    img_paths = [t[: -len(text_ext)] + img_ext for t in text_paths]

    tf_list, if_list = [], []
    for i in range(0, len(text_paths), batch_size):
        texts = [open(p).read() for p in text_paths[i : i + batch_size]]
        imgs = np.stack(
            [preprocess_image(Image.open(p), size) for p in img_paths[i : i + batch_size]]
        )
        toks = np.asarray(tok.tokenize(texts, truncate=True))
        n = len(texts)
        if n < batch_size:  # pad the tail to the compiled static shape
            reps = -(-batch_size // n)
            toks = np.concatenate([toks] * reps)[:batch_size]
            imgs = np.concatenate([imgs] * reps)[:batch_size]
        tf_list.append(np.asarray(perceptor.encode_text(jnp.asarray(toks)))[:n])
        if_list.append(np.asarray(perceptor.encode_image(jnp.asarray(imgs)))[:n])
    _save_pairs(out, np.concatenate(tf_list), np.concatenate(if_list))
    log.info("Encoded %d pairs -> %s", len(text_paths), out)
    return out


def encode_text_and_images_webdataset(
    pattern: str,
    *,
    clip_model: str = "ViT-B/32",
    clip_path: Optional[str] = None,
    batch_size: int = 512,
    img_col: str = "input.jpg",
    txt_col: str = "output.txt",
    out: str = "features.npz",
    image_quality_threshold: Optional[float] = None,
    image_quality_method: str = "nima",
    nima_weights_path: Optional[str] = None,
    merge: bool = False,
):
    nima_fn = None
    if image_quality_threshold is not None:
        # TPU-native NIMA replaces the reference's pyiqa filter
        # (main.py:308-312, 348-354); weights via flag or FFVC_NIMA_WEIGHTS.
        if image_quality_method != "nima":
            raise ValueError(
                f"unsupported image_quality_method {image_quality_method!r} (only 'nima')"
            )
        path = nima_weights_path or os.environ.get("FFVC_NIMA_WEIGHTS")
        if path and os.path.exists(path):
            from feed_forward_vqgan_clip_tpu.models.nima import make_nima_fn

            nima_fn = make_nima_fn(path)
        else:
            log.warning(
                "image_quality_threshold set but no NIMA weights found "
                "(--nima-weights-path / $FFVC_NIMA_WEIGHTS) — skipping the "
                "quality filter (the reference degrades silently on a failed "
                "pyiqa import too, main.py:308-312)"
            )
    perceptor = load_perceptor(clip_model, clip_path)
    size = perceptor.size
    tok = get_tokenizer()

    tars = sorted(glob(pattern))
    # per-process shard split (replaces the modulo-rank split, main.py:331)
    tars = [t for i, t in enumerate(tars) if i % jax.process_count() == jax.process_index()]

    tf_list, if_list, nb, nb_dropped = [], [], 0, 0
    batch_imgs, batch_texts = [], []

    def flush():
        nonlocal nb, nb_dropped
        if not batch_imgs:
            return
        n = len(batch_imgs)
        toks = np.asarray(tok.tokenize(batch_texts, truncate=True))
        imgs = np.stack(batch_imgs)
        if n < batch_size:
            # pad the final batch to the compiled static shape (everywhere else
            # in the framework shapes are static; a ragged tail would trigger
            # one extra XLA compile per distinct remainder)
            reps = -(-batch_size // n)
            toks = np.concatenate([toks] * reps)[:batch_size]
            imgs = np.concatenate([imgs] * reps)[:batch_size]
        keep = np.ones(n, bool)
        if nima_fn is not None:
            # score in [0,1] space: de-normalize the CLIP batch like the
            # reference's X*std+mean (main.py:349)
            mean = np.asarray(CLIP_MEAN, np.float32)
            std = np.asarray(CLIP_STD, np.float32)
            scores = np.asarray(nima_fn(jnp.asarray(imgs * std + mean)))[:n]
            keep = scores >= image_quality_threshold
            nb_dropped += int(n - keep.sum())
            if not keep.any():
                # still emit the progress line: a heavily-filtered run must be
                # visible as "dropping everything", not silent (ADVICE r2)
                log.info("%d encoded (%d dropped by quality filter)", nb, nb_dropped)
                batch_imgs.clear()
                batch_texts.clear()
                return
        tf_list.append(np.asarray(perceptor.encode_text(jnp.asarray(toks)))[:n][keep])
        if_list.append(np.asarray(perceptor.encode_image(jnp.asarray(imgs)))[:n][keep])
        nb += int(keep.sum())
        if nb_dropped:
            log.info("%d encoded (%d dropped by quality filter)", nb, nb_dropped)
        else:
            log.info("%d encoded", nb)
        batch_imgs.clear()
        batch_texts.clear()

    for img_bytes, txt_bytes in iter_shards(tars, [img_col, txt_col]):
        try:
            img = Image.open(BytesIO(img_bytes))
            batch_imgs.append(preprocess_image(img, size))
            batch_texts.append(txt_bytes.decode("utf-8", errors="replace"))
        except Exception as e:
            log.warning("skipping sample: %s", e)
            continue
        if len(batch_imgs) >= batch_size:
            flush()
    flush()
    log.info("Nb of images processed: %d", nb)
    if nb == 0 and nb_dropped > 0:
        log.warning(
            "quality filter (threshold %.3f) removed ALL %d samples — writing "
            "an empty features file; lower --image-quality-threshold or check "
            "the NIMA weights", image_quality_threshold, nb_dropped,
        )

    text_feats = np.concatenate(tf_list) if tf_list else np.zeros((0, perceptor.dim), np.float32)
    image_feats = np.concatenate(if_list) if if_list else np.zeros((0, perceptor.dim), np.float32)

    if jax.process_count() > 1:
        _save_pairs(_shard_path(out, jax.process_index()), text_feats, image_feats)
        if merge:
            # the reference's hvd.join + rank-0 merge (main.py:372-390): barrier
            # across processes, then the primary concatenates all shards
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("ffvc_encode_merge")
            if jax.process_index() == 0:
                shards = [_shard_path(out, r) for r in range(jax.process_count())]
                merge_features([s for s in shards if os.path.exists(s)], out)
    else:
        _save_pairs(out, text_feats, image_feats)
    return out


def _shard_path(out: str, rank: int) -> str:
    base, ext = os.path.splitext(out)
    if ext in (".pkl", ".th", ".pt", ".npz"):
        return f"{base}_{rank}{ext}"
    return f"{out}_{rank}.npz"
