"""tokenize subcommand: text file / glob -> token array file.

Parity with the reference's `tokenize` (/root/reference/main.py:395-421): glob
reads one prompt per file; plain files read one prompt per line with an optional
max_length character filter; batched tokenization; .npz output (or .pkl/.th for
reference interop).
"""

from glob import glob
from typing import Optional

import numpy as np

from feed_forward_vqgan_clip_tpu.data.datasets import save_tokens
from feed_forward_vqgan_clip_tpu.tokenizer.bpe import get_tokenizer


def tokenize(
    paths: str,
    out: str = "tokenized.npz",
    max_length: Optional[int] = None,
    batch_size: Optional[int] = None,
):
    if "*" in paths:
        texts = [open(f).read().strip() for f in sorted(glob(paths))]
    else:
        with open(paths) as fd:
            texts = [line.strip() for line in fd.readlines()]
        if max_length:
            texts = [t for t in texts if len(t) <= max_length]
    tok = get_tokenizer()
    if batch_size is None:
        batch_size = len(texts)
    chunks = [
        tok.tokenize(texts[i : i + batch_size], truncate=True)
        for i in range(0, len(texts), batch_size)
    ]
    toks = np.concatenate(chunks) if chunks else np.zeros((0, 77), np.int32)
    save_tokens(toks, out)
    return out
