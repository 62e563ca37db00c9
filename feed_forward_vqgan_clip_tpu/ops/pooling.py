"""Adaptive average / max pooling (torch semantics) for NHWC images.

The reference's cutout module leans on torch's AdaptiveAvgPool2d / AdaptiveMaxPool2d
(/root/reference/main.py:209-210, 218, 228). TPU formulation: the average pool is a
pair of precomputed sparse pooling matrices applied as einsums (MXU-friendly, static
shapes); the max pool is shifted running-maxes + one-hot selection einsums, so
its backward is a matmul too (the gather formulation's scatter-add transpose
measured ~1 s/step at training shapes on TPU).

Window math matches torch exactly: output cell i covers
[floor(i*in/out), ceil((i+1)*in/out)).
"""

import functools

import jax

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
def _max_select(in_size: int, out_size: int):
    """Per-window-length one-hot selection matrices.

    Windows have lengths 1..L (L = ceil(in/out)+extra). S_k[i, s_i] = 1 for
    outputs whose window length is k. The pool becomes out = sum_k S_k @ z_k
    where z_k[p] = max(x[p..p+k)) from cheap shifted maxes — all matmuls, so the
    BACKWARD is a matmul too. The naive gather formulation's transpose is a TPU
    scatter-add that measured ~1s per step at training shapes.
    """
    starts = [(i * in_size) // out_size for i in range(out_size)]
    ends = [-((-(i + 1) * in_size) // out_size) for i in range(out_size)]
    lengths = [e - s for s, e in zip(starts, ends)]
    L = max(lengths)
    mats = {}
    for k in range(1, L + 1):
        S = np.zeros((out_size, in_size), np.float32)
        any_row = False
        for i, (s, ln) in enumerate(zip(starts, lengths)):
            if ln == k:
                S[i, s] = 1.0
                any_row = True
        if any_row:
            mats[k] = S
    return mats


def adaptive_avg_pool(x, out_h: int, out_w: int = None):
    """x: (B, H, W, C) -> (B, out_h, out_w, C), torch AdaptiveAvgPool2d parity.
    Output dtype follows x (the pooling matrices are cast down so a bf16 aug
    stage is not silently promoted back to f32)."""
    out_w = out_h if out_w is None else out_w
    _, h, w, _ = x.shape
    wh = jnp.asarray(_avg_matrix(h, out_h)).astype(x.dtype)
    ww = jnp.asarray(_avg_matrix(w, out_w)).astype(x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    return jnp.einsum("ow,bhwc->bhoc", ww, x)


def _running_max(x, axis, max_len):
    """z_k[p] = max(x[p..p+k)) along `axis` for k = 1..max_len (list of arrays)."""
    outs = [x]
    cur = x
    n = x.shape[axis]
    for k in range(2, max_len + 1):
        shifted = jax.lax.slice_in_dim(x, k - 1, n, axis=axis)
        head = jax.lax.slice_in_dim(cur, 0, n - k + 1, axis=axis)
        merged = jnp.maximum(head, shifted)
        # pad the tail (never selected: windows of length k start <= n-k)
        pad = jax.lax.slice_in_dim(cur, n - k + 1, n, axis=axis)
        cur = jnp.concatenate([merged, pad], axis=axis)
        outs.append(cur)
    return outs


def _max_pool_axis(x, out_size: int, axis: int):
    in_size = x.shape[axis]
    mats = _max_select(in_size, out_size)
    zs = _running_max(x, axis, max(mats))
    spec = "oi,bihc->bohc" if axis == 1 else "oi,bhic->bhoc"
    out = None
    for k, S in mats.items():
        term = jnp.einsum(spec, jnp.asarray(S, x.dtype), zs[k - 1])
        out = term if out is None else out + term
    return out


def adaptive_max_pool(x, out_h: int, out_w: int = None):
    """x: (B, H, W, C) -> (B, out_h, out_w, C), torch AdaptiveMaxPool2d parity.

    Shifted running maxes + one-hot selection einsums (see _max_select): both the
    forward and backward are MXU matmuls instead of gather/scatter."""
    out_w = out_h if out_w is None else out_w
    x = _max_pool_axis(x, out_h, 1)
    return _max_pool_axis(x, out_w, 2)
