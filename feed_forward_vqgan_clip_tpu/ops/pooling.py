"""Adaptive average / max pooling (torch semantics) for NHWC images.

The reference's cutout module leans on torch's AdaptiveAvgPool2d / AdaptiveMaxPool2d
(/root/reference/main.py:209-210, 218, 228). TPU formulation: the average pool is a
pair of precomputed sparse pooling matrices applied as einsums (MXU-friendly, static
shapes); the max pool gathers fixed-width index windows with -inf masking.

Window math matches torch exactly: output cell i covers
[floor(i*in/out), ceil((i+1)*in/out)).
"""

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _avg_matrix(in_size: int, out_size: int) -> np.ndarray:
    w = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        s = (i * in_size) // out_size
        e = -((-(i + 1) * in_size) // out_size)  # ceil
        w[i, s:e] = 1.0 / (e - s)
    return w


@functools.lru_cache(maxsize=64)
def _max_windows(in_size: int, out_size: int):
    starts = [(i * in_size) // out_size for i in range(out_size)]
    ends = [-((-(i + 1) * in_size) // out_size) for i in range(out_size)]
    L = max(e - s for s, e in zip(starts, ends))
    idx = np.zeros((out_size, L), np.int32)
    mask = np.zeros((out_size, L), bool)
    for i, (s, e) in enumerate(zip(starts, ends)):
        n = e - s
        idx[i, :n] = np.arange(s, e)
        idx[i, n:] = s  # clamped duplicates, masked out
        mask[i, :n] = True
    return idx, mask


def adaptive_avg_pool(x, out_h: int, out_w: int = None):
    """x: (B, H, W, C) -> (B, out_h, out_w, C), torch AdaptiveAvgPool2d parity."""
    out_w = out_h if out_w is None else out_w
    _, h, w, _ = x.shape
    wh = jnp.asarray(_avg_matrix(h, out_h))
    ww = jnp.asarray(_avg_matrix(w, out_w))
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    return jnp.einsum("ow,bhwc->bhoc", ww, x)


def adaptive_max_pool(x, out_h: int, out_w: int = None):
    """x: (B, H, W, C) -> (B, out_h, out_w, C), torch AdaptiveMaxPool2d parity."""
    out_w = out_h if out_w is None else out_w
    _, h, w, _ = x.shape
    idx_h, mask_h = _max_windows(h, out_h)
    idx_w, mask_w = _max_windows(w, out_w)
    neg = jnp.asarray(-jnp.inf, x.dtype)

    xh = x[:, jnp.asarray(idx_h), :, :]  # (B, out_h, L, W, C)
    xh = jnp.where(jnp.asarray(mask_h)[None, :, :, None, None], xh, neg)
    xh = xh.max(axis=2)  # (B, out_h, W, C)

    xw = xh[:, :, jnp.asarray(idx_w), :]  # (B, out_h, out_w, L, C)
    xw = jnp.where(jnp.asarray(mask_w)[None, None, :, :, None], xw, neg)
    return xw.max(axis=3)
