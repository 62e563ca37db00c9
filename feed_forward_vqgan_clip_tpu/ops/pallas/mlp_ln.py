"""Weight-resident fused pre-LN MLP sublayer: y = x + fc2(act(fc1(LN(x)))).

Built for the CLIP ViT transformer blocks in the train loss (the image encoder
runs on cutn*B crops every step; BENCH_NOTES.md measured the tower at ~58% of
FLOP-ideal under XLA — the MLP sublayer's hidden intermediate (rows x 4D)
round-trips HBM and its LN/GELU run as separate VPU passes). The kernel
computes the WHOLE sublayer per grid step with both FF weights resident in
VMEM and the f32 matmul accumulator kept alive through bias + activation —
the same recipe as the fused mixer block's channel half
(ops/pallas/mixer_block.py), for the reference graph at
/root/reference/main.py:799 (perceptor.encode_image -> CLIP's
ResidualAttentionBlock.mlp).

Layout: x is 2-D (rows, D) — callers flatten (B, T, D); the sublayer is
row-wise so crop/token boundaries do not matter. The grid walks row tiles;
weights/LN params use constant index maps (fetched once, resident across the
batch). Supports act='gelu' (exact erf polynomial, shared with the mixer
kernel) and act='quick_gelu' (x * sigmoid(1.702 x), CLIP's activation).

Training path `fused_mlp_ln` is a custom_vjp: the forward also emits the
activation value AND derivative (the round-3 mixer lesson — recomputing the
activation-derivative chain dominated the backward), the backward recomputes
LN stats from the saved input (the input is live in the autodiff residual
anyway, so saving xhat/inv would only add write traffic — the token-backward
tradeoff) and accumulates param grads across grid steps into
constant-index-map f32 outputs (sequential TPU grid)."""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from feed_forward_vqgan_clip_tpu.ops.pallas.mixer_block import (
    _accum,
    _gelu_val_grad,
    _ln_bwd,
    _ln_stats,
)


def _quick_gelu_val_grad(x):
    """(quick_gelu(x), quick_gelu'(x)) in f32. s = sigmoid(1.702 x);
    val = x s; d/dx = s + 1.702 x s (1 - s)."""
    xf = x.astype(jnp.float32)
    s = jax.nn.sigmoid(jnp.float32(1.702) * xf)
    val = xf * s
    grad = s + jnp.float32(1.702) * val * (jnp.float32(1.0) - s)
    return val, grad


def _act_val_grad(x, act, dtype):
    if act == "quick_gelu":
        return _quick_gelu_val_grad(x)
    return _gelu_val_grad(x, dtype)


def _fwd_kernel(
    x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    out_ref, g_ref, dg_ref,
    *, act, dtype,
):
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    xhat, _ = _ln_stats(xf)
    xn = (xhat * lns_ref[:] + lnb_ref[:]).astype(dtype)
    h = jax.lax.dot_general(
        xn, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    gf, dgf = _act_val_grad(h + b1_ref[:], act, dtype)
    g = gf.astype(dtype)
    g_ref[...] = g
    dg_ref[...] = dgf.astype(dtype)
    h2 = jax.lax.dot_general(
        g, w2_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_ref[...] = x.astype(dtype) + (h2 + b2_ref[:]).astype(dtype)


def _bwd_kernel(
    dy_ref, x_ref, g_ref, dg_ref, lns_ref, lnb_ref, w1_ref, w2_ref,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dls_ref, dlb_ref,
    *, dtype,
):
    dy = dy_ref[...].astype(jnp.float32)
    dyd = dy.astype(dtype)
    xf = x_ref[...].astype(jnp.float32)
    xhat, inv = _ln_stats(xf)
    s = lns_ref[:]
    xn = (xhat * s + lnb_ref[:]).astype(dtype)
    g = g_ref[...]
    # dg_h[r, e] = sum_d dy[r, d] * w2[e, d]
    dgh = jax.lax.dot_general(
        dyd, w2_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    daf = dgh * dg_ref[...].astype(jnp.float32)
    da = daf.astype(dtype)
    _accum(db1_ref, jnp.sum(daf, axis=0, keepdims=True))
    _accum(db2_ref, jnp.sum(dy, axis=0, keepdims=True))
    # dW2[e, d] = sum_r g[r, e] dy[r, d]
    _accum(
        dw2_ref,
        jax.lax.dot_general(
            g, dyd, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ),
    )
    # dW1[d, e] = sum_r xn[r, d] da[r, e]
    _accum(
        dw1_ref,
        jax.lax.dot_general(
            xn, da, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ),
    )
    # dxn[r, d] = sum_e da[r, e] w1[d, e]
    dxn = jax.lax.dot_general(
        da, w1_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    _accum(dls_ref, jnp.sum(dxn * xhat, axis=0, keepdims=True))
    _accum(dlb_ref, jnp.sum(dxn, axis=0, keepdims=True))
    dx_ref[...] = dy + _ln_bwd(dxn, xhat, inv, s)


def _row_tile(n: int, d: int, e: int) -> int:
    """Largest row tile <= ~512 that divides n and respects bf16 sublane
    tiling. Returns 0 when no usable tile exists (caller falls back)."""
    for r in (512, 448, 384, 320, 256, 192, 128, 64, 32, 16):
        if n % r == 0:
            return r
    return 0


def mlp_ln_supported(n: int, d: int, e: int) -> bool:
    """Shape gate: lane dims 128-aligned, a row tile exists, VMEM fits."""
    if d % 128 or e % 128:
        return False
    r = _row_tile(n, d, e)
    if not r:
        return False
    vmem = (
        2 * d * e * 2              # w1 + w2 (bf16)
        + 3 * r * d * 4            # x/out/dx tiles (f32 worst case)
        + 3 * r * e * 4            # hidden + saves
        + d * e * 4 * 2            # grad accumulators (bwd)
    )
    return vmem <= 100 * 1024 * 1024


def _args(x, p, dtype):
    n, d = x.shape
    e = p["fc1"]["kernel"].shape[1]
    args = (
        x,
        p["ln"]["scale"].reshape(1, d).astype(jnp.float32),
        p["ln"]["bias"].reshape(1, d).astype(jnp.float32),
        p["fc1"]["kernel"].astype(dtype),
        p["fc1"]["bias"].reshape(1, e).astype(jnp.float32),
        p["fc2"]["kernel"].astype(dtype),
        p["fc2"]["bias"].reshape(1, d).astype(jnp.float32),
    )
    r = _row_tile(n, d, e)
    const = lambda i: (0, 0)
    row = lambda i: (i, 0)
    in_specs = [
        pl.BlockSpec((r, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, e), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, e), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((e, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
    ]
    return args, in_specs, (n, d, e, r)


@functools.partial(jax.jit, static_argnames=("act", "dtype", "interpret"))
def _fwd_res(x, p, act, dtype, interpret):
    args, in_specs, (n, d, e, r) = _args(x, p, dtype)
    row = lambda i: (i, 0)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, act=act, dtype=dtype),
        grid=(n // r,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((r, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((r, e), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((r, e), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), dtype),
            jax.ShapeDtypeStruct((n, e), dtype),
            jax.ShapeDtypeStruct((n, e), dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def _bwd(dy, x, g, dg, p, dtype, interpret):
    n, d = x.shape
    e = g.shape[1]
    r = _row_tile(n, d, e)
    const = lambda i: (0, 0)
    row = lambda i: (i, 0)
    args = (
        dy,
        x,
        g,
        dg,
        p["ln"]["scale"].reshape(1, d).astype(jnp.float32),
        p["ln"]["bias"].reshape(1, d).astype(jnp.float32),
        p["fc1"]["kernel"].astype(dtype),
        p["fc2"]["kernel"].astype(dtype),
    )
    in_specs = [
        pl.BlockSpec((r, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((r, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((r, e), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((r, e), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, e), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((e, d), const, memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, dtype=dtype),
        grid=(n // r,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((r, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, e), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((e, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), jnp.float32),  # dx
            jax.ShapeDtypeStruct((d, e), jnp.float32),  # dw1
            jax.ShapeDtypeStruct((1, e), jnp.float32),  # db1
            jax.ShapeDtypeStruct((e, d), jnp.float32),  # dw2
            jax.ShapeDtypeStruct((1, d), jnp.float32),  # db2
            jax.ShapeDtypeStruct((1, d), jnp.float32),  # dls
            jax.ShapeDtypeStruct((1, d), jnp.float32),  # dlb
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_mlp_ln(x, p, act="gelu", dtype=jnp.float32, interpret=False):
    """Differentiable fused pre-LN MLP sublayer.

    x: (rows, D); p: {'ln': {scale, bias}, 'fc1': {kernel, bias},
    'fc2': {kernel, bias}}. Returns x + fc2(act(fc1(LN(x)))) in `dtype`.
    Gradients are the analytic adjoint of the kernel math (parity with the
    XLA path pinned by tests/test_fused_clip.py)."""
    out, _, _ = _fwd_res(x, p, act, dtype, interpret)
    return out


def _fused_fwd(x, p, act, dtype, interpret):
    out, g, dg = _fwd_res(x, p, act, dtype, interpret)
    return out, (x, p, g, dg)


def _fused_bwd(act, dtype, interpret, res, dout):
    x, p, g, dg = res
    dx, dw1, db1, dw2, db2, dls, dlb = _bwd(
        dout.astype(jnp.float32), x, g, dg, p, dtype, interpret
    )

    def _like(grad, ref):
        return grad.reshape(ref.shape).astype(ref.dtype)

    dp = {
        "ln": {
            "scale": _like(dls, p["ln"]["scale"]),
            "bias": _like(dlb, p["ln"]["bias"]),
        },
        "fc1": {
            "kernel": _like(dw1, p["fc1"]["kernel"]),
            "bias": _like(db1, p["fc1"]["bias"]),
        },
        "fc2": {
            "kernel": _like(dw2, p["fc2"]["kernel"]),
            "bias": _like(db2, p["fc2"]["bias"]),
        },
    }
    return dx.astype(x.dtype), dp


fused_mlp_ln.defvjp(_fused_fwd, _fused_bwd)
