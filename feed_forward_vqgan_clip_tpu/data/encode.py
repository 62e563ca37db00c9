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
import queue
import threading
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
    `inputs`: explicit paths or a glob pattern.

    Memory is bounded by ONE shard, not the dataset: shards are loaded twice
    (a shape pass, then a copy pass) into disk-backed memmap outputs, so a
    CC12M-scale merge cannot OOM the host. `.npz` outputs are written by
    streaming the memmaps (np.savez reads through the page cache); torch
    formats (.pkl/.th/.pt) still materialize one full copy at pickling time —
    prefer .npz for datasets that don't fit in RAM."""
    if isinstance(inputs, str):
        paths = sorted(glob(inputs))
    else:
        paths = list(inputs)
    if not paths:
        raise FileNotFoundError(f"no feature shards match {inputs!r}")

    rows, dim_x, dim_y = 0, None, None
    for p in paths:  # shape pass: one shard resident at a time
        x, y = _load_pairs(p)
        if len(x) != len(y):
            raise ValueError(f"{p}: {len(x)} text rows vs {len(y)} image rows")
        rows += len(x)
        dim_x = dim_x if dim_x is not None else x.shape[1:]
        dim_y = dim_y if dim_y is not None else y.shape[1:]
        if x.shape[1:] != dim_x or y.shape[1:] != dim_y:
            raise ValueError(f"{p}: feature shape mismatch")
        del x, y

    base = out + ".merge_tmp"
    xm = np.lib.format.open_memmap(
        base + "_x.npy", mode="w+", dtype=np.float32, shape=(rows,) + tuple(dim_x)
    )
    ym = np.lib.format.open_memmap(
        base + "_y.npy", mode="w+", dtype=np.float32, shape=(rows,) + tuple(dim_y)
    )
    at = 0
    for p in paths:  # copy pass
        x, y = _load_pairs(p)
        xm[at : at + len(x)] = x
        ym[at : at + len(y)] = y
        at += len(x)
        del x, y
    xm.flush()
    ym.flush()
    _save_pairs(out, xm, ym)
    del xm, ym
    os.remove(base + "_x.npy")
    os.remove(base + "_y.npy")
    log.info("Merged %d shards (%d pairs) -> %s", len(paths), rows, out)
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


def _iter_preprocessed(tars, img_col, txt_col, size):
    """(preprocessed NHWC array, decoded text) per valid sample; corrupt
    samples are warned and skipped (webdataset's warn-and-continue)."""
    for img_bytes, txt_bytes in iter_shards(tars, [img_col, txt_col]):
        try:
            img = Image.open(BytesIO(img_bytes))
            yield (
                preprocess_image(img, size),
                txt_bytes.decode("utf-8", errors="replace"),
            )
        except Exception as e:
            log.warning("skipping sample: %s", e)


def _prefetched(gen, depth):
    """Run `gen` on a producer thread, yielding through a bounded queue.
    Order-preserving (single producer); producer exceptions re-raise at the
    consumer; the thread is a daemon so an aborted consume can't hang exit."""
    q: queue.Queue = queue.Queue(maxsize=max(2, depth))
    end = object()
    err: list = []

    def run():
        try:
            for item in gen:
                q.put(item)
        except BaseException as e:  # re-raised below, not swallowed
            err.append(e)
        finally:
            q.put(end)

    threading.Thread(target=run, daemon=True, name="ffvc-encode-prefetch").start()
    while True:
        item = q.get()
        if item is end:
            if err:
                raise err[0]
            return
        yield item


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
    spill_rows: int = 1_000_000,
    prefetch: bool = True,
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
    # bounded-memory spill: every `spill_rows` encoded rows are flushed to a
    # numbered on-disk shard and the in-RAM buffers cleared, so a CC12M-scale
    # encode holds at most spill_rows feature rows in memory (the reference
    # accumulates the whole run in RAM, main.py:355-371)
    spills: list = []
    rows_buffered = 0

    def _spill():
        nonlocal rows_buffered
        if not tf_list:
            return
        path = f"{out}.spill_{len(spills)}.npz"
        _save_pairs(path, np.concatenate(tf_list), np.concatenate(if_list))
        spills.append(path)
        tf_list.clear()
        if_list.clear()
        rows_buffered = 0

    def flush():
        nonlocal nb, nb_dropped, rows_buffered
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
        rows_buffered += int(keep.sum())
        if rows_buffered >= spill_rows:
            _spill()
        nb += int(keep.sum())
        if nb_dropped:
            log.info("%d encoded (%d dropped by quality filter)", nb, nb_dropped)
        else:
            log.info("%d encoded", nb)
        batch_imgs.clear()
        batch_texts.clear()

    samples = _iter_preprocessed(tars, img_col, txt_col, size)
    if prefetch:
        # overlap host-side tar IO + JPEG decode + bicubic preprocess with the
        # device encode of the previous batch (the dominant two costs of a
        # CC12M-scale encode run otherwise strictly alternate). Single producer
        # thread -> sample ORDER (and therefore the output feature order) is
        # identical to the sequential path.
        samples = _prefetched(samples, depth=2 * batch_size)
    for arr, text in samples:
        batch_imgs.append(arr)
        batch_texts.append(text)
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

    multi = jax.process_count() > 1
    local_out = _shard_path(out, jax.process_index()) if multi else out
    if spills:
        # bounded-memory finish: flush the remainder as the last spill, then
        # memmap-merge all spills into the process output
        _spill()
        merge_features(spills, local_out)
        for s in spills:
            os.remove(s)
    else:
        text_feats = (
            np.concatenate(tf_list) if tf_list else np.zeros((0, perceptor.dim), np.float32)
        )
        image_feats = (
            np.concatenate(if_list) if if_list else np.zeros((0, perceptor.dim), np.float32)
        )
        _save_pairs(local_out, text_feats, image_feats)

    if multi and merge:
        # the reference's hvd.join + rank-0 merge (main.py:372-390): barrier
        # across processes, then the primary concatenates all shards
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ffvc_encode_merge")
        if jax.process_index() == 0:
            shards = [_shard_path(out, r) for r in range(jax.process_count())]
            merge_features([s for s in shards if os.path.exists(s)], out)
    return out


def _shard_path(out: str, rank: int) -> str:
    base, ext = os.path.splitext(out)
    if ext in (".pkl", ".th", ".pt", ".npz"):
        return f"{base}_{rank}{ext}"
    return f"{out}_{rank}.npz"
