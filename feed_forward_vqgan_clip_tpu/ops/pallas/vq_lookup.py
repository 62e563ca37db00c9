"""Fused nearest-codebook search as a Pallas TPU kernel.

The XLA path (ops/quantize.py) materializes an (N, K) distance matrix in HBM for the
f16-16384 codebook (K=16384); at train batch sizes that matrix dominates HBM traffic of
the quantize step. This kernel streams codebook tiles through VMEM, does the
`-2 x @ c^T + |c|^2` score on the MXU, and keeps only a running (min, argmin) pair per
token, so HBM traffic is O(N*C + K*C) instead of O(N*K).

The per-row `|x|^2` term of the reference's expanded distance
(/root/reference/main.py:135) is constant across codes, so it is dropped — the argmin
is unchanged.

Mosaic notes (hard-won):
  * `|c|^2` is precomputed OUTSIDE the kernel and fed as a (1, K) input. Reducing the
    codebook tile along lanes in-kernel and reshaping the (TILE_K,) sublane vector to
    a (1, TILE_K) lane vector forces a pathological relayout that blows ~95MB of
    kernel stack and fails to compile.
  * `jnp.argmin` likewise spills; first-match argmin is expressed as min + iota +
    masked min, which lowers to plain VPU reductions.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 256
_TILE_K = 1024


def _vq_kernel(x_ref, cb_ref, c2_ref, idx_ref, min_ref, arg_ref):
    j = pl.program_id(1)
    n_k = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        min_ref[:] = jnp.full_like(min_ref, jnp.inf)
        arg_ref[:] = jnp.zeros_like(arg_ref)

    x = x_ref[:].astype(jnp.float32)
    cb = cb_ref[:].astype(jnp.float32)
    scores = c2_ref[:] - 2.0 * jax.lax.dot_general(
        x,
        cb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE_N, TILE_K)

    local_min = jnp.min(scores, axis=1, keepdims=True)  # (TILE_N, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    local_arg = jnp.min(
        jnp.where(scores == local_min, col, jnp.int32(2**30)),
        axis=1,
        keepdims=True,
    ) + j * _TILE_K  # (TILE_N, 1), first match within the tile

    better = local_min < min_ref[:]
    arg_ref[:] = jnp.where(better, local_arg, arg_ref[:])
    min_ref[:] = jnp.where(better, local_min, min_ref[:])

    @pl.when(j == n_k - 1)
    def _emit():
        idx_ref[:] = arg_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_codebook_indices_pallas(x, codebook, *, interpret=False):
    """Argmin_k ||x_n - c_k||^2 for x (..., C), codebook (K, C) -> int32 (...,)."""
    lead_shape = x.shape[:-1]
    c = x.shape[-1]
    k = codebook.shape[0]
    xf = x.reshape(-1, c)
    n = xf.shape[0]

    n_pad = -n % _TILE_N
    if n_pad:
        xf = jnp.pad(xf, ((0, n_pad), (0, 0)))
    k_pad = -k % _TILE_K
    cbf = codebook
    if k_pad:
        cbf = jnp.pad(codebook, ((0, k_pad), (0, 0)))
    c2 = jnp.sum(jnp.square(cbf.astype(jnp.float32)), axis=1)[None, :]  # (1, Kp)
    if k_pad:
        # Padded codes must never win the argmin: push their score to +inf.
        lane = jnp.arange(cbf.shape[0])[None, :]
        c2 = jnp.where(lane >= k, jnp.inf, c2)

    n_tiles = (n + n_pad) // _TILE_N
    k_tiles = (k + k_pad) // _TILE_K

    idx = pl.pallas_call(
        _vq_kernel,
        grid=(n_tiles, k_tiles),
        in_specs=[
            pl.BlockSpec((_TILE_N, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_K, c), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_K), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TILE_N, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n + n_pad, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((_TILE_N, 1), jnp.float32),
            pltpu.VMEM((_TILE_N, 1), jnp.int32),
        ],
        interpret=interpret,
    )(xf, cbf, c2)

    return idx[:n, 0].reshape(lead_shape)
