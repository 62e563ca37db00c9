"""Fused inference dispatch for the MLP-Mixer mapper.

`make_mapper_apply(mapper)` returns `(params, x) -> z`, routing Mixer forwards
through the weight-resident Pallas block kernel (ops/pallas/mixer_block.py) when
that is both supported (shape/VMEM gates below) and profitable (TPU backend).
Everything else — other mapper families, unaligned shapes, CPU — falls back to
the stock `module.apply`, so this layer can be used unconditionally by the
inference entry points (infer.Generator, serve.Predictor, __graft_entry__).

Training has its own fused path: `train/loop.py` routes Mixer forwards through
`fused_mixer_block_train` (a custom_vjp pairing the fused forward with Pallas
backward kernels — see ops/pallas/mixer_block.py). This module's
`make_mapper_apply` is the INFERENCE dispatcher (it picks the no-residual-save
kernels); numerical parity between fused and stock paths is pinned by
tests/test_fused_mixer.py.
"""

import logging

import jax
import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.models.mappers.mixer import Mixer, lean_layer_norm
from feed_forward_vqgan_clip_tpu.ops.pallas.mixer_block import (
    fused_block_vmem_bytes,
    fused_mixer_block,
    fused_mixer_stream,
    stack_mixer_params,
)

log = logging.getLogger(__name__)

# Stay well inside the ~128 MB v5e VMEM (Mosaic reserves some; round-1 kernels
# started failing around ~95 MB of live state).
_VMEM_BUDGET_BYTES = 80 * 1024 * 1024


def _dense(x, p, dtype):
    """flax.linen.Dense numerics: operands promoted to module dtype."""
    return jnp.dot(x.astype(dtype), p["kernel"].astype(dtype)) + p["bias"].astype(dtype)


def fused_supported(mapper) -> bool:
    """Shape/VMEM gate for the Pallas fused-block path."""
    if not isinstance(mapper, Mixer):
        return False
    t = mapper.image_size * mapper.image_size
    d = mapper.dim
    et = t * mapper.expansion
    ec = d * mapper.expansion
    # Mosaic tiling: every matmul operand's lane (last) dim must be a multiple
    # of 128 to avoid padded tiles (t2 is (Et, T), so T itself needs 128 | T).
    if t % 128 or d % 128:
        return False
    return fused_block_vmem_bytes(t, d, et, ec, mapper.dtype) <= _VMEM_BUDGET_BYTES


def fused_mixer_forward(mapper: Mixer, variables, x, *, interpret=False):
    """Deterministic Mixer forward with each block as one Pallas kernel.

    Mirrors Mixer.__call__ (mixer.py) including the channel-major reshape quirk
    (/root/reference/mlp_mixer_pytorch.py:86). variables: {'params': ...} or the
    bare param dict from Mixer.init.
    """
    p = variables.get("params", variables)
    dt = mapper.dtype
    b = x.shape[0]
    s, c = mapper.image_size, mapper.channels
    h = _dense(x.astype(dt), p["proj"], dt)
    h = h.reshape(b, c, s, s).transpose(0, 2, 3, 1).reshape(b, s * s, c)
    h = _dense(h, p["embed"], dt)
    for i in range(mapper.depth):
        h = fused_mixer_block(h, p[f"block_{i}"], dtype=dt, interpret=interpret)
    h = lean_layer_norm(
        h, p["final_norm"]["scale"], p["final_norm"]["bias"], dt
    )
    h = _dense(h, p["final_proj"], dt)
    return h.reshape(b, s, s, c)


def fused_mixer_train_forward(mapper: Mixer, variables, x, *, interpret=False):
    """Differentiable Mixer forward with each block as a fused Pallas kernel
    pair (forward-with-residuals + channel/token backward kernels under a
    custom_vjp; ops/pallas/mixer_block.py). Mirrors fused_mixer_forward; the
    surrounding dense/LN layers are plain jnp and autodiff normally. Only valid
    for deterministic forwards (dropout == 0)."""
    from feed_forward_vqgan_clip_tpu.ops.pallas.mixer_block import (
        fused_mixer_block_train,
    )

    p = variables.get("params", variables)
    dt = mapper.dtype
    b = x.shape[0]
    s, c = mapper.image_size, mapper.channels
    h = _dense(x.astype(dt), p["proj"], dt)
    h = h.reshape(b, c, s, s).transpose(0, 2, 3, 1).reshape(b, s * s, c)
    h = _dense(h, p["embed"], dt)
    for i in range(mapper.depth):
        h = fused_mixer_block_train(h, p[f"block_{i}"], dt, interpret)
    h = lean_layer_norm(h, p["final_norm"]["scale"], p["final_norm"]["bias"], dt)
    h = _dense(h, p["final_proj"], dt)
    return h.reshape(b, s, s, c)


def make_mapper_train_apply(mapper, *, fused=None, interpret=False):
    """(params, x) -> z dispatcher for DIFFERENTIABLE deterministic forwards
    (the train step's dropout==0 path). Same auto-gating as make_mapper_apply
    (Pallas on TPU, module path on CPU); FFVC_FUSED_TRAIN=0 reverts to XLA.
    The Pallas train path saves GELU values + derivatives from the forward
    kernel so the backward never re-runs the polynomial chain (BENCH_NOTES.md
    round 3: 209.6 -> 195.8 ms full step, vs 197.4 on the XLA path)."""
    import os

    if os.environ.get("FFVC_FUSED_TRAIN", "1") in ("0", "false"):
        fused = False
    if fused is None:
        try:
            fused = jax.default_backend() not in ("cpu",)
        except Exception:
            fused = False
    if fused and fused_supported(mapper):
        log.info("Mixer: using Pallas fused-block TRAIN path (custom_vjp)")

        def apply_fn(params, x):
            return fused_mixer_train_forward(mapper, params, x, interpret=interpret)

        return apply_fn
    return lambda params, x: mapper.apply(params, x)


def streamed_supported(mapper) -> bool:
    """Gate for the whole-stack depth-streaming kernel: same Mosaic alignment
    as the per-block path, plus VMEM headroom for the double-buffered weight
    stream (two blocks' weights live while one computes)."""
    if not fused_supported(mapper):
        return False
    t = mapper.image_size * mapper.image_size
    d = mapper.dim
    et = t * mapper.expansion
    ec = d * mapper.expansion
    w = jnp.dtype(mapper.dtype).itemsize
    weights = (t * et + et * t + d * ec + ec * d) * w
    return fused_block_vmem_bytes(t, d, et, ec, mapper.dtype) + weights <= _VMEM_BUDGET_BYTES


def prepare_streamed_params(mapper: Mixer, variables):
    """Fold+stack the mapper's params ONCE into the streamed layout:
    {'head': proj/embed/final_*, 'stack': (L, ...) arrays}. Run eagerly per
    loaded model; the result is a pytree meant to be PASSED through jit
    boundaries (closing over it would embed ~600 MB of weights as HLO
    constants — the axon remote-compile tunnel rejects such payloads)."""
    p = variables.get("params", variables)
    sp = stack_mixer_params(
        [p[f"block_{i}"] for i in range(mapper.depth)], dtype=mapper.dtype
    )
    head = {k: p[k] for k in ("proj", "embed", "final_norm", "final_proj")}
    return {"head": head, "stack": sp}


def streamed_mixer_forward(mapper: Mixer, stream_params, x, *, interpret=False):
    """Small-batch/serving forward: the ENTIRE block stack as one
    depth-streaming pallas_call (ops/pallas/mixer_block.fused_mixer_stream).

    stream_params: prepare_streamed_params output — the per-call graph
    contains no per-block LN folds and no stack copies; at batch 1 those
    would rival the compute itself. Weights re-stream from HBM for every
    batch element (grid (B, L)), so this wins only where weight DMA hides
    under per-block compute: batch ~1-8 (serving / FFVC_BENCH_MODE=latency).
    Large batches keep the weight-resident per-block kernel."""
    head, sp = stream_params["head"], stream_params["stack"]
    dt = mapper.dtype
    s, c = mapper.image_size, mapper.channels
    b = x.shape[0]
    h = _dense(x.astype(dt), head["proj"], dt)
    h = h.reshape(b, c, s, s).transpose(0, 2, 3, 1).reshape(b, s * s, c)
    h = _dense(h, head["embed"], dt)
    h = fused_mixer_stream(h, sp, dtype=dt, interpret=interpret)
    h = lean_layer_norm(
        h, head["final_norm"]["scale"], head["final_norm"]["bias"], dt
    )
    h = _dense(h, head["final_proj"], dt)
    return h.reshape(b, s, s, c)


def make_streamed_mixer_apply(mapper: Mixer, variables, *, interpret=False):
    """Closure convenience over prepare_streamed_params + streamed_mixer_forward
    for un-jitted callers (tests, eager serving). Jitted callers must thread
    the prepared params as an argument instead — see prepare_streamed_params."""
    spp = prepare_streamed_params(mapper, variables)
    return lambda x: streamed_mixer_forward(mapper, spp, x, interpret=interpret)


def make_mapper_apply(mapper, *, fused=None, interpret=False):
    """(params, x) -> z dispatcher for deterministic (inference) forwards.

    fused=None: auto — Pallas path iff supported and a TPU backend is present
    (CPU would need interpret mode, which is far slower than plain XLA).
    fused=True/False: force (True still requires `fused_supported`).
    """
    if fused is None:
        try:
            fused = jax.default_backend() not in ("cpu",)
        except Exception:
            fused = False
    if fused and fused_supported(mapper):
        log.info("Mixer: using Pallas fused-block inference path")

        def apply_fn(params, x):
            return fused_mixer_forward(mapper, params, x, interpret=interpret)

        return apply_fn
    return lambda params, x: mapper.apply(params, x)
