"""Dataset loading: text prompts, token pickles, or embedding-pair pickles.

Parity with the reference's `load_dataset` (/root/reference/main.py:1293-1306):
  * .txt file: one prompt per line -> tokenized
  * glob pattern: one prompt per file -> tokenized
  * .pkl/.th (torch.save): either a token tensor or an (input_feats, output_feats)
    tuple (text/image embedding pairs from the encoders)
  * .npz/.npy: the same payloads in native numpy form (this framework's encoders
    write these; `tokens` / ('x','y') keys)

Returns either a (N, 77) int array of tokens or a tuple of two float arrays.
"""

import os
from glob import glob
from typing import Optional, Tuple, Union

import numpy as np

Dataset = Union[np.ndarray, Tuple[np.ndarray, np.ndarray]]


def load_dataset(path: str, bpe_path: Optional[str] = None) -> Dataset:
    if path.endswith((".pkl", ".th", ".pt")):
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, (tuple, list)):
            return (np.asarray(obj[0]), np.asarray(obj[1]))
        return np.asarray(obj)
    if path.endswith(".npz"):
        z = np.load(path)
        if "tokens" in z:
            return z["tokens"]
        return (z["x"], z["y"])
    if path.endswith(".npy"):
        return np.load(path)
    from feed_forward_vqgan_clip_tpu.tokenizer.bpe import get_tokenizer

    tok = get_tokenizer(bpe_path)
    if "*" in path:
        texts = [open(f).read().strip() for f in sorted(glob(path))]
    else:
        with open(path) as fd:
            texts = [line.strip() for line in fd.readlines()]
    return tok.tokenize(texts, truncate=True)


def save_tokens(tokens: np.ndarray, out: str):
    if out.endswith(".npz"):
        np.savez(out, tokens=tokens)
    elif out.endswith((".pkl", ".th", ".pt")):
        import torch

        torch.save(torch.tensor(np.asarray(tokens)), out)
    else:
        np.savez(out if out.endswith(".npz") else out + ".npz", tokens=tokens)


def shard_for_process(n: int, process_index: int, process_count: int) -> np.ndarray:
    """Deterministic per-host index shard: contiguous strided split, padded by
    wraparound so every host sees the same number of samples. Epoch-INVARIANT —
    use `epoch_shard_batches` for training-loop sharding (DistributedSampler
    parity needs a fresh global permutation each epoch); this stays for
    one-shot splits (preprocessing-style sharding, local counts)."""
    idx = np.arange(process_index, n, process_count)
    per = -(-n // process_count)
    if len(idx) < per:
        idx = np.concatenate([idx, idx[: per - len(idx)]])
    return idx


def epoch_shard_batches(
    n: int,
    batch_size: int,
    *,
    seed: int,
    epoch: int,
    process_index: int = 0,
    process_count: int = 1,
    drop_last: bool = False,
):
    """DistributedSampler-parity per-epoch sharded batches (main.py:669-673,
    713-714): a GLOBAL permutation seeded by (seed, epoch), wraparound-padded
    to process_count-divisible, then strided across processes — so every host
    draws a different subset each epoch (the union of all hosts' batches covers
    the dataset exactly once, modulo the <process_count pad rows). Returns a
    list of (batch_size,) GLOBAL index arrays for this process; the final
    partial batch is wraparound-padded to keep shapes static under jit."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
    order = rng.permutation(n)
    per = -(-n // process_count)
    total = per * process_count
    if total > n:  # torch pads with the head of the permutation (sampler.py)
        order = np.concatenate([order, order[: total - n]])
    local = order[process_index::process_count]
    batches = []
    for i in range(0, per, batch_size):
        b = local[i : i + batch_size]
        if len(b) < batch_size:
            if drop_last and len(batches) > 0:
                break
            b = np.resize(np.concatenate([b, local]), batch_size)
        batches.append(b)
    return batches


def epoch_batches(n: int, batch_size: int, *, seed: int, epoch: int, drop_last: bool):
    """Shuffled batch index lists for one epoch; wraparound-padded final batch keeps
    shapes static under jit (the reference's variable last batch is a hard no on TPU,
    SURVEY.md §7 hard part (d))."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
    order = rng.permutation(n)
    batches = []
    for i in range(0, n, batch_size):
        b = order[i : i + batch_size]
        if len(b) < batch_size:
            if drop_last and len(batches) > 0:
                break
            # np.resize tiles as many times as needed — correct even when the
            # dataset is smaller than one batch
            b = np.resize(np.concatenate([b, order]), batch_size)
        batches.append(b)
    return batches
