"""Weight-resident fused MLP-Mixer block as a Pallas TPU kernel.

Motivation (BENCH_NOTES.md): the flagship 32x1024 mixer runs at ~52% of
FLOP-ideal under XLA because every one of its 64 feed-forwards round-trips a
134 MB hidden intermediate through HBM (plus LN/residual traffic). This kernel
computes ONE ENTIRE mixer block — LN -> token-mix FF -> residual -> LN ->
channel-mix FF -> residual — per grid step with every intermediate held in VMEM.
The grid walks the batch; all six weight tensors use constant index maps, so
Mosaic fetches them once and keeps them resident across the whole batch.

Per-block HBM traffic drops from ~600 MB (XLA, B=64 flagship) to
x-read + out-write + weights-once ~= 85 MB, which moves the block from
memory-bound to MXU-bound.

Numerics match models/mappers/mixer.MixerBlock exactly in structure: f32 LN
statistics with the folded a*x+b application in the compute dtype
(lean_layer_norm), matmuls with f32 MXU accumulation rounded to the compute
dtype, exact (erf) GELU, biases added per the reference's einsum layout
(token biases broadcast along the feature axis — mlp_mixer_pytorch.py:70-91
routes the token mix through a size-1 Conv1d, making its bias per-hidden-token).

Backward pass is NOT defined: this path is for inference/serving only (the
training step keeps the XLA module path, whose autodiff is exercised by the
oracle tests). models/mappers/fused.py gates dispatch accordingly.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from feed_forward_vqgan_clip_tpu.models.mappers.mixer import lean_layer_norm


def _gelu_exact(x, dtype):
    """Exact (erf-form) GELU. Mosaic has no erf/erfc lowering, so erf is the
    Abramowitz & Stegun 7.1.26 rational-exponential approximation (|err| <=
    1.5e-7 absolute — ~1 ulp of f32 for erf's O(1) range, far below the bf16
    activation rounding of the surrounding matmuls). Computed in f32 like XLA's
    own gelu, then cast back to the compute dtype."""
    xf = x.astype(jnp.float32)
    a = xf * jnp.float32(0.7071067811865476)  # x / sqrt(2)
    s = jnp.sign(a)
    z = jnp.abs(a)
    t = 1.0 / (1.0 + jnp.float32(0.3275911) * z)
    poly = t * (
        jnp.float32(0.254829592)
        + t
        * (
            jnp.float32(-0.284496736)
            + t
            * (
                jnp.float32(1.421413741)
                + t * (jnp.float32(-1.453152027) + t * jnp.float32(1.061405429))
            )
        )
    )
    erf = s * (1.0 - poly * jnp.exp(-z * z))
    return (0.5 * xf * (1.0 + erf)).astype(dtype)


def _block_kernel(
    x_ref,
    ln1s_ref,
    ln1b_ref,
    t1_ref,
    t1b_ref,
    t2_ref,
    t2b_ref,
    ln2s_ref,
    ln2b_ref,
    w1_ref,
    b1_ref,
    w2_ref,
    b2_ref,
    out_ref,
    *,
    dtype,
):
    x = x_ref[0]  # (T, D) compute dtype

    # token mixing ---------------------------------------------------------
    # LN params stay (1, D)-shaped: 1-D values force awkward relayouts in Mosaic,
    # and (T,1)x(1,D) broadcasting is what the VPU wants anyway.
    xn = lean_layer_norm(x, ln1s_ref[:], ln1b_ref[:], dtype)  # (T, D)
    # h1[e, d] = sum_t t1[t, e] * xn[t, d]   (einsum 'btd,te->bed' per element)
    h1 = jax.lax.dot_general(
        t1_ref[:], xn, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dtype)  # (Et, D)
    h1 = h1 + t1b_ref[:].astype(dtype)  # (Et, 1) broadcast over D
    g1 = _gelu_exact(h1, dtype)
    # h2[t, d] = sum_e t2[e, t] * g1[e, d]   (einsum 'bed,et->btd')
    h2 = jax.lax.dot_general(
        t2_ref[:], g1, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dtype)  # (T, D)
    h2 = h2 + t2b_ref[:].astype(dtype)  # (T, 1) broadcast over D
    r = x.astype(dtype) + h2

    # channel mixing -------------------------------------------------------
    # (software-pipelining the FF over Ec chunks — FF1 of chunk k+1 issued
    # before GELU of chunk k — measured perf-NEUTRAL at 0/2048/1024/512 chunk
    # sizes: Mosaic already extracts the available MXU/VPU overlap, the stage
    # is VPU-bound on LN+GELU. Experiment removed; see BENCH_NOTES.md.)
    rn = lean_layer_norm(r, ln2s_ref[:], ln2b_ref[:], dtype)  # (T, D)
    h3 = jax.lax.dot_general(
        rn, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)  # (T, Ec)
    h3 = h3 + b1_ref[:].astype(dtype)  # (1, Ec)
    g3 = _gelu_exact(h3, dtype)
    h4 = jax.lax.dot_general(
        g3, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)  # (T, D)
    h4 = h4 + b2_ref[:].astype(dtype)  # (1, D)
    out_ref[0] = r + h4


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def fused_mixer_block(x, p, *, dtype=jnp.float32, interpret=False):
    """One full mixer block, fused. x: (B, T, D); p: the MixerBlock param dict
    ({token_norm, token_fc1[_bias], token_fc2[_bias], channel_norm,
    channel_fc1, channel_fc2}) exactly as produced by mixer.MixerBlock.init."""
    b, t, d = x.shape
    t1 = p["token_fc1"].astype(dtype)  # (T, Et)
    t2 = p["token_fc2"].astype(dtype)  # (Et, T)
    et = t1.shape[1]
    w1 = p["channel_fc1"]["kernel"].astype(dtype)  # (D, Ec)
    w2 = p["channel_fc2"]["kernel"].astype(dtype)  # (Ec, D)
    ec = w1.shape[1]

    const = lambda i: (0, 0)
    args = (
        x.astype(dtype),
        p["token_norm"]["scale"].reshape(1, d).astype(jnp.float32),
        p["token_norm"]["bias"].reshape(1, d).astype(jnp.float32),
        t1,
        p["token_fc1_bias"].reshape(et, 1).astype(jnp.float32),
        t2,
        p["token_fc2_bias"].reshape(t, 1).astype(jnp.float32),
        p["channel_norm"]["scale"].reshape(1, d).astype(jnp.float32),
        p["channel_norm"]["bias"].reshape(1, d).astype(jnp.float32),
        w1,
        p["channel_fc1"]["bias"].reshape(1, ec).astype(jnp.float32),
        w2,
        p["channel_fc2"]["bias"].reshape(1, d).astype(jnp.float32),
    )
    in_specs = [
        pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((t, et), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((et, 1), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((et, t), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((t, 1), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, ec), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ec), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((ec, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
    ]
    flops = 2 * t * d * (2 * et + 2 * ec)  # per batch element
    itemsize = jnp.dtype(dtype).itemsize
    return pl.pallas_call(
        functools.partial(_block_kernel, dtype=dtype),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, d), dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * flops,
            bytes_accessed=(2 * b * t * d + t * et + et * t + d * ec + ec * d)
            * itemsize,
            transcendentals=b * (t * ec + et * d),
        ),
        # weight-resident blocks need ~20 MB scoped VMEM at flagship size; the
        # default 16 MB limit compiles at batch 64 but OOMs the batch-1
        # (latency/serving) pipeline
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def fused_block_vmem_bytes(t, d, et, ec, dtype=jnp.bfloat16):
    """Rough VMEM footprint of one grid step (weights + x + intermediates),
    used by the dispatch gate in models/mappers/fused.py."""
    w = jnp.dtype(dtype).itemsize
    weights = (t * et + et * t + d * ec + ec * d) * w
    acts = (3 * t * d + et * d + t * ec) * max(w, 2) + (t * d + et * d + t * ec) * 4
    return weights + 2 * t * d * w + acts
