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
statistics (`_kernel_layer_norm`, a Mosaic-tuned application order of
mixer.lean_layer_norm), matmuls with f32 MXU accumulation kept alive through
bias+GELU and rounded to the compute dtype once, exact (erf-polynomial) GELU,
biases added per the reference's einsum layout (token biases broadcast along
the feature axis — mlp_mixer_pytorch.py:70-91 routes the token mix through a
size-1 Conv1d, making its bias per-hidden-token).

Two variants: the inference kernel (`fused_mixer_block`, forward only) and the
training path (`fused_mixer_block_train`, a custom_vjp over a
residual-emitting forward plus channel/token backward kernels with
grid-accumulated param grads). models/mappers/fused.py gates dispatch.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# FFVC_MIXER_PAIR=1: inference kernel processes TWO batch elements per grid
# step. Each element's op chain (LN -> mm -> GELU -> mm -> LN -> mm -> GELU ->
# mm) is strictly serial, so the MXU idles through every VPU phase; two
# independent chains in one kernel body give Mosaic's scheduler co-issuable
# MXU/VPU work. Perf experiment — numerics identical (per-element math).
# MEASURED WORSE at B=64 (79.6 vs 70.8 ms mapper stage): doubling every live
# intermediate defeats Mosaic's own pipelining. Kept for A/B only.
_PAIR = os.environ.get("FFVC_MIXER_PAIR", "0") not in ("", "0", "false")

# FFVC_MIXER_PIPE: software-pipelined (skewed) inference kernel — grid step j
# runs the CHANNEL half of element j-1 (residual carried in a 2-slot VMEM
# scratch) interleaved with the TOKEN half of element j. Same co-issue goal as
# pair mode, but the only extra live state is one (T, D) residual slot
# (~0.5 MB) instead of a second copy of every intermediate. Numerics per
# element are identical (same op order within each phase). Default resolved
# by fused.py's dispatcher; env overrides for A/B.
_PIPE_ENV = os.environ.get("FFVC_MIXER_PIPE", "")


def _kernel_ln_hat(x, dtype):
    """LayerNorm(eps=1e-5) WITHOUT the affine: (x - mean) * inv_std in f32
    stats. Used by the inference kernel whose channel-LN scale/bias are folded
    into the following matmul's weights/bias at wrapper level (the fold is a
    per-call (D, Ec) multiply, repaid by removing a 2-op pass over every
    (T, D) activation element)."""
    xf = x.astype(jnp.float32)
    if _DIAG_NOLN:
        return xf.astype(dtype)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    return ((xf - mean) * inv).astype(dtype)


def _kernel_layer_norm(x, scale, bias, dtype):
    """LayerNorm(eps=1e-5), f32 statistics — Mosaic-tuned variant of
    mixer.lean_layer_norm. The flax version folds the affine into per-element
    A/B tensors because XLA fuses them for free; inside the kernel those folds
    MATERIALIZE two (T, D) f32 temporaries, so this form keeps the per-row
    scalars (mean*inv) unmaterialized and applies (x*inv - mean*inv)*scale +
    bias directly — 4 per-element VPU ops instead of 5 plus two temporaries.
    Rounding order differs from the flax path at the ~1e-7-relative level."""
    xf = x.astype(jnp.float32)
    if _DIAG_NOLN:
        return (xf * scale + bias).astype(dtype)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    t = xf * inv - mean * inv
    return (t * scale + bias).astype(dtype)


# Minimax-style Chebyshev fit of erf(a)/a as a degree-14 polynomial in
# u = a^2/8 - 1 on a in [0, 4] (converted to the monomial basis in u, which is
# well-conditioned on [-1, 1]); f32 Horner evaluation error <= 1.45e-6 absolute
# against f64 math.erf, and erfc(4) = 1.5e-8 covers the clamped tail. Fit:
# np.polynomial.Chebyshev.fit on 40001 nodes; see BENCH_NOTES.md.
_ERF_POLY_U = (
    0.3535309521137796, -0.17657718195369534, 0.13168011378234515,
    -0.10767409805497345, 0.09011510776133011, -0.07512725770416412,
    0.060555409155397595, -0.04385004445866519, 0.030744714477915457,
    -0.027115873007745372, 0.018636229049850503, -0.002743992639232296,
    0.0005937384609687999, -0.0061009130341905535, 0.0033334585270929076,
)
# Shorter 11-coefficient fit (|err| <= 3.3e-4): GELU error stays below bf16
# activation rounding (2^-8 relative), so the bf16 compute path uses this one.
# (A 10-term fit measured perf-NEUTRAL on the flagship bench — the remaining
# mapper gap is not Horner length — so the more accurate set stays.)
_ERF_POLY_U_BF16 = (
    0.3535185727071676, -0.176754544870115, 0.13245392403933776,
    -0.10406920227586576, 0.08234563002438543, -0.09510300351998768,
    0.08847903500023639, -0.0008404364801543607, -0.012367164487456117,
    -0.06237002597947802, 0.04478815458919712,
)


# Diagnostic-only knobs (benchmarks/: attribute the fused block's VPU residue;
# NEVER set in production — they change the math):
#   FFVC_DIAG_NOGELU=1  -> GELU becomes identity
#   FFVC_DIAG_NOLN=1    -> kernel LNs skip the stats (scale/shift only)
_DIAG_NOGELU = os.environ.get("FFVC_DIAG_NOGELU", "0") == "1"
_DIAG_NOLN = os.environ.get("FFVC_DIAG_NOLN", "0") == "1"


def _gelu_exact(x, dtype):
    """Exact (erf-form) GELU in f32. Mosaic has no erf/erfc lowering; the
    round-2 kernel used the A&S 7.1.26 rational-exponential approximation,
    whose divide + exp are both multi-pass VPU sequences and made GELU the
    dominant VPU cost of the fused block (BENCH_NOTES.md). This version is a
    clamped odd polynomial: erf(a) = a * P(a^2/8 - 1) for |a| <= 4 (|err| <=
    1.5e-6 with the 15-term fit, 3.3e-4 with the 11-term bf16 fit; all
    single-pass VPU ops, no divide/exp), erf = +-1 beyond (erfc(4) = 1.5e-8).
    GELU absolute error <= |x|/2 * |err| — below f32 parity tolerance (long
    fit) and bf16 activation rounding (short fit).

    The sign handling is branch-free: erf(x/sqrt2) = sign(x) * erf(|x|/sqrt2),
    so 0.5*x*(1+erf) = 0.5*x + 0.5*|x|*erf(|x|/sqrt2). Input and output are
    f32 — the caller keeps the matmul's f32 accumulator alive through
    bias+GELU and casts to the compute dtype ONCE afterwards (two casts per
    activation tensor saved vs round-2)."""
    if _DIAG_NOGELU:
        return x.astype(jnp.float32)
    coef = _ERF_POLY_U_BF16 if dtype == jnp.bfloat16 else _ERF_POLY_U
    xf = x.astype(jnp.float32)
    ax = jnp.abs(xf)
    a = jnp.minimum(ax * jnp.float32(0.7071067811865476), jnp.float32(4.0))
    u = a * a * jnp.float32(0.125) - jnp.float32(1.0)
    p = jnp.float32(coef[-1])
    for c in coef[-2::-1]:
        p = p * u + jnp.float32(c)
    erf_abs = a * p
    return jnp.float32(0.5) * (xf + ax * erf_abs)


def _block_math(x, ln1s, ln1b, t1, t1b, t2, t2b, w1f, b1f, w2, b2, dtype):
    """One inference mixer block on VMEM-resident values: LN -> token FF ->
    residual -> LN-hat (channel affine pre-folded into w1f/b1f) -> channel FF
    -> residual. Shared by the per-block and the depth-streaming kernels."""
    # token mixing ---------------------------------------------------------
    # LN params stay (1, D)-shaped: 1-D values force awkward relayouts in Mosaic,
    # and (T,1)x(1,D) broadcasting is what the VPU wants anyway.
    xn = _kernel_layer_norm(x, ln1s, ln1b, dtype)  # (T, D)
    # h1[e, d] = sum_t t1[t, e] * xn[t, d]   (einsum 'btd,te->bed' per element)
    # The f32 MXU accumulator stays alive through bias + GELU; one cast out.
    h1 = jax.lax.dot_general(
        t1, xn, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Et, D) f32
    g1 = _gelu_exact(h1 + t1b, dtype).astype(dtype)  # bias (Et,1) over D
    # h2[t, d] = sum_e t2[e, t] * g1[e, d]   (einsum 'bed,et->btd')
    h2 = jax.lax.dot_general(
        t2, g1, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, D) f32
    r = x.astype(dtype) + (h2 + t2b).astype(dtype)  # bias (T,1) over D

    # channel mixing -------------------------------------------------------
    # (software-pipelining the FF over Ec chunks — FF1 of chunk k+1 issued
    # before GELU of chunk k — measured perf-NEUTRAL at 0/2048/1024/512 chunk
    # sizes: Mosaic already extracts the available MXU/VPU overlap, the stage
    # is VPU-bound on LN+GELU. Experiment removed; see BENCH_NOTES.md.)
    # channel LN's scale/bias are folded into w1f/b1f by the wrapper
    rhat = _kernel_ln_hat(r, dtype)  # (T, D)
    h3 = jax.lax.dot_general(
        rhat, w1f, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, Ec) f32
    g3 = _gelu_exact(h3 + b1f, dtype).astype(dtype)  # bias (1, Ec)
    h4 = jax.lax.dot_general(
        g3, w2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, D) f32
    return r + (h4 + b2).astype(dtype)  # bias (1, D)


def _block_math_pair(x0, x1, ln1s, ln1b, t1, t1b, t2, t2b, w1f, b1f, w2, b2,
                     dtype):
    """_block_math on two independent batch elements with their phases
    MANUALLY INTERLEAVED in program order (element 1 lags one phase behind
    element 0), so each MXU matmul has a co-issuable VPU phase (LN/GELU/
    residual) from the other element next to it in the instruction stream.
    Numerics per element are identical to _block_math."""
    dg = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32
    )
    tok = (((0,), (0,)), ((), ()))  # t1/t2 contractions
    ch1 = (((1,), (0,)), ((), ()))  # rhat @ w1f / g3 @ w2
    xn0 = _kernel_layer_norm(x0, ln1s, ln1b, dtype)            # VPU
    h1_0 = dg(t1, xn0, tok)                                    # MXU
    xn1 = _kernel_layer_norm(x1, ln1s, ln1b, dtype)            # VPU
    g1_0 = _gelu_exact(h1_0 + t1b, dtype).astype(dtype)        # VPU
    h1_1 = dg(t1, xn1, tok)                                    # MXU
    h2_0 = dg(t2, g1_0, tok)                                   # MXU
    g1_1 = _gelu_exact(h1_1 + t1b, dtype).astype(dtype)        # VPU
    r0 = x0.astype(dtype) + (h2_0 + t2b).astype(dtype)         # VPU
    rhat0 = _kernel_ln_hat(r0, dtype)                          # VPU
    h2_1 = dg(t2, g1_1, tok)                                   # MXU
    h3_0 = dg(rhat0, w1f, ch1)                                 # MXU
    r1 = x1.astype(dtype) + (h2_1 + t2b).astype(dtype)         # VPU
    rhat1 = _kernel_ln_hat(r1, dtype)                          # VPU
    g3_0 = _gelu_exact(h3_0 + b1f, dtype).astype(dtype)        # VPU
    h3_1 = dg(rhat1, w1f, ch1)                                 # MXU
    h4_0 = dg(g3_0, w2, ch1)                                   # MXU
    g3_1 = _gelu_exact(h3_1 + b1f, dtype).astype(dtype)        # VPU
    out0 = r0 + (h4_0 + b2).astype(dtype)                      # VPU
    h4_1 = dg(g3_1, w2, ch1)                                   # MXU
    out1 = r1 + (h4_1 + b2).astype(dtype)                      # VPU
    return out0, out1


def _block_kernel(
    x_ref,
    ln1s_ref,
    ln1b_ref,
    t1_ref,
    t1b_ref,
    t2_ref,
    t2b_ref,
    w1f_ref,
    b1f_ref,
    w2_ref,
    b2_ref,
    out_ref,
    *,
    dtype,
):
    consts = (
        ln1s_ref[:], ln1b_ref[:], t1_ref[:], t1b_ref[:], t2_ref[:],
        t2b_ref[:], w1f_ref[:], b1f_ref[:], w2_ref[:], b2_ref[:],
    )
    if x_ref.shape[0] == 2:  # pair mode (see _PAIR)
        out_ref[0], out_ref[1] = _block_math_pair(
            x_ref[0], x_ref[1], *consts, dtype
        )
    else:
        out_ref[0] = _block_math(x_ref[0], *consts, dtype)


# Default ON at batch >= 16 (measured: 70.76 -> 65.82 ms mapper stage at B=64;
# the two boundary steps cost 2/(B+1), so small batches keep the plain kernel
# — and batch <= 8 serving routes to the depth-streaming kernel anyway).
_PIPE_DEFAULT_MIN_BATCH = 16


def _pipe_enabled(b):
    if _PIPE_ENV in ("1", "true"):
        return b >= 2
    if _PIPE_ENV in ("0", "false"):
        return False
    return b >= _PIPE_DEFAULT_MIN_BATCH


def fused_mixer_block(x, p, *, dtype=jnp.float32, interpret=False):
    """One full mixer block, fused. x: (B, T, D); p: the MixerBlock param dict
    ({token_norm, token_fc1[_bias], token_fc2[_bias], channel_norm,
    channel_fc1, channel_fc2}) exactly as produced by mixer.MixerBlock.init.

    FFVC_MIXER_PAIR / FFVC_MIXER_PIPE resolve here (outside jit) so toggling
    them is never masked by a stale jit cache entry."""
    pe = 2 if (_PAIR and x.shape[0] % 2 == 0) else 1
    if pe == 1 and _pipe_enabled(x.shape[0]):
        return _fused_mixer_block_pipe_impl(x, p, dtype=dtype, interpret=interpret)
    return _fused_mixer_block_impl(x, p, pe=pe, dtype=dtype, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("pe", "dtype", "interpret"))
def _fused_mixer_block_impl(x, p, *, pe, dtype, interpret):
    b, t, d = x.shape
    t1 = p["token_fc1"].astype(dtype)  # (T, Et)
    t2 = p["token_fc2"].astype(dtype)  # (Et, T)
    et = t1.shape[1]
    w1_f32 = p["channel_fc1"]["kernel"].astype(jnp.float32)  # (D, Ec)
    w2 = p["channel_fc2"]["kernel"].astype(dtype)  # (Ec, D)
    ec = w1_f32.shape[1]
    # fold channel-LN affine into the first channel matmul:
    # rn @ W1 + b1 = rhat @ (s2[:,None]*W1) + (b2ln @ W1 + b1)
    s2 = p["channel_norm"]["scale"].astype(jnp.float32)
    b2ln = p["channel_norm"]["bias"].astype(jnp.float32)
    w1f = (w1_f32 * s2[:, None]).astype(dtype)
    b1f = p["channel_fc1"]["bias"].astype(jnp.float32) + b2ln @ w1_f32

    const = lambda i: (0, 0)
    args = (
        x.astype(dtype),
        p["token_norm"]["scale"].reshape(1, d).astype(jnp.float32),
        p["token_norm"]["bias"].reshape(1, d).astype(jnp.float32),
        t1,
        p["token_fc1_bias"].reshape(et, 1).astype(jnp.float32),
        t2,
        p["token_fc2_bias"].reshape(t, 1).astype(jnp.float32),
        w1f,
        b1f.reshape(1, ec),
        w2,
        p["channel_fc2"]["bias"].reshape(1, d).astype(jnp.float32),
    )
    in_specs = [
        pl.BlockSpec((pe, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((t, et), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((et, 1), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((et, t), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((t, 1), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, ec), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ec), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((ec, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
    ]
    flops = 2 * t * d * (2 * et + 2 * ec)  # per batch element
    itemsize = jnp.dtype(dtype).itemsize
    return pl.pallas_call(
        functools.partial(_block_kernel, dtype=dtype),
        grid=(b // pe,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((pe, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
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


def _pipe_kernel(
    x_ref, ln1s_ref, ln1b_ref, t1_ref, t1b_ref, t2_ref, t2b_ref,
    w1f_ref, b1f_ref, w2_ref, b2_ref, out_ref, r_scr, *, dtype, nb,
):
    """Skewed block body: channel phase of element j-1 + token phase of
    element j, fine-interleaved so every big MXU matmul has independent VPU
    work (the other phase's LN/GELU) adjacent in program order. Boundary
    steps do throwaway work instead of predicated skips (grid is nb+1): step
    0's channel phase chews a zeroed residual and its out write is
    overwritten at step 1 (same out block index, so it never even reaches
    HBM); step nb's token phase recomputes element nb-1 into an unread
    scratch slot. That costs 2/(nb+1) extra steps but keeps ONE unpredicated
    instruction stream for the scheduler."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():  # step 0's channel phase reads slot -1 % 2 = 1
        r_scr[1] = jnp.zeros_like(r_scr[1])

    dg = functools.partial(jax.lax.dot_general, preferred_element_type=jnp.float32)
    tok = (((0,), (0,)), ((), ()))
    ch1 = (((1,), (0,)), ((), ()))
    ln1s, ln1b, t1, t1b, t2, t2b = (
        ln1s_ref[:], ln1b_ref[:], t1_ref[:], t1b_ref[:], t2_ref[:], t2b_ref[:]
    )
    b1f, b2 = b1f_ref[:], b2_ref[:]
    # channel FF split into two Ec-halves: the half-GELUs (the longest VPU
    # ops) each sit next to the OTHER half's big matmul in program order, so
    # the g3 -> h4 dependency never leaves the MXU with only the small token
    # matmul to chew on. (Chunking measured NEUTRAL in the unskewed kernel —
    # round 2 — but in the skewed stream it is what fills the g3 window.)
    ec = b1f.shape[-1]
    half = ec // 2
    w1a, w1b = w1f_ref[:, :half], w1f_ref[:, half:]
    w2a, w2b = w2_ref[:half], w2_ref[half:]

    x = x_ref[0]
    r_prev = r_scr[(j - 1) % 2]
    rhat = _kernel_ln_hat(r_prev, dtype)                   # VPU
    h3a = dg(rhat, w1a, ch1)                               # MXU (half)
    xn = _kernel_layer_norm(x, ln1s, ln1b, dtype)          # VPU — under h3a
    h3b = dg(rhat, w1b, ch1)                               # MXU (half)
    g3a = _gelu_exact(h3a + b1f[:, :half], dtype).astype(dtype)  # VPU — under h3b
    h4a = dg(g3a, w2a, ch1)                                # MXU (half)
    g3b = _gelu_exact(h3b + b1f[:, half:], dtype).astype(dtype)  # VPU — under h4a
    h1 = dg(t1, xn, tok)                                   # MXU
    h4b = dg(g3b, w2b, ch1)                                # MXU (half)
    g1 = _gelu_exact(h1 + t1b, dtype).astype(dtype)        # VPU — under h4b
    out_ref[0] = r_prev + (h4a + h4b + b2).astype(dtype)   # VPU
    h2 = dg(t2, g1, tok)                                   # MXU
    r_scr[j % 2] = x.astype(dtype) + (h2 + t2b).astype(dtype)


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def _fused_mixer_block_pipe_impl(x, p, *, dtype, interpret):
    b, t, d = x.shape
    t1 = p["token_fc1"].astype(dtype)
    t2 = p["token_fc2"].astype(dtype)
    et = t1.shape[1]
    w1_f32 = p["channel_fc1"]["kernel"].astype(jnp.float32)
    w2 = p["channel_fc2"]["kernel"].astype(dtype)
    ec = w1_f32.shape[1]
    s2 = p["channel_norm"]["scale"].astype(jnp.float32)
    b2ln = p["channel_norm"]["bias"].astype(jnp.float32)
    w1f = (w1_f32 * s2[:, None]).astype(dtype)
    b1f = p["channel_fc1"]["bias"].astype(jnp.float32) + b2ln @ w1_f32

    const = lambda j: (0, 0)
    args = (
        x.astype(dtype),
        p["token_norm"]["scale"].reshape(1, d).astype(jnp.float32),
        p["token_norm"]["bias"].reshape(1, d).astype(jnp.float32),
        t1,
        p["token_fc1_bias"].reshape(et, 1).astype(jnp.float32),
        t2,
        p["token_fc2_bias"].reshape(t, 1).astype(jnp.float32),
        w1f,
        b1f.reshape(1, ec),
        w2,
        p["channel_fc2"]["bias"].reshape(1, d).astype(jnp.float32),
    )
    in_specs = [
        # skewed: token input j (clamped at the top), channel output j-1
        pl.BlockSpec(
            (1, t, d), lambda j: (jnp.minimum(j, b - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((t, et), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((et, 1), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((et, t), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((t, 1), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, ec), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ec), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((ec, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
    ]
    flops = 2 * t * d * (2 * et + 2 * ec)
    itemsize = jnp.dtype(dtype).itemsize
    return pl.pallas_call(
        functools.partial(_pipe_kernel, dtype=dtype, nb=b),
        grid=(b + 1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, t, d), lambda j: (jnp.maximum(j - 1, 0), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, d), dtype),
        scratch_shapes=[pltpu.VMEM((2, t, d), dtype)],  # r carry
        cost_estimate=pl.CostEstimate(
            flops=(b + 1) * flops,
            bytes_accessed=(2 * b * t * d + t * et + et * t + d * ec + ec * d)
            * itemsize,
            transcendentals=(b + 1) * (t * ec + et * d),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def fused_block_vmem_bytes(t, d, et, ec, dtype=jnp.bfloat16):
    """Rough VMEM footprint of one grid step (weights + x + intermediates),
    used by the dispatch gate in models/mappers/fused.py. Includes the pipe
    variant's 2-slot residual scratch (2*t*d) so the gate covers whichever
    kernel dispatch picks."""
    w = jnp.dtype(dtype).itemsize
    weights = (t * et + et * t + d * ec + ec * d) * w
    acts = (3 * t * d + et * d + t * ec) * max(w, 2) + (t * d + et * d + t * ec) * 4
    return weights + 2 * t * d * w + acts + 2 * t * d * w


# ---------------------------------------------------------------------------
# Stacked-weights layout: all L blocks' (pre-folded) weights as (L, ...) arrays.
# Prepared ONCE at model-load time (fused.stacked_mixer_params); serves two
# kernels:
#   * fused_mixer_stream — ONE pallas_call for the whole 32-block stack,
#     grid (B, L) with depth innermost: the activation carry lives in the
#     output's VMEM block across the L inner steps (its index map revisits the
#     same block, so Mosaic never writes it back mid-depth) while each block's
#     ~18 MB of weights stream HBM->VMEM double-buffered one grid step ahead.
#     At batch 1 (serving) this removes 32 kernel launches, 31 x-roundtrips
#     and serial weight fetches: weight DMA (~22 us/block at v5e HBM) overlaps
#     block compute (~27 us FLOP-ideal) instead of preceding it.
#   * fused_mixer_block_stacked — the per-block kernel fed by index maps into
#     the same stacked arrays (large batches keep the weights-resident grid;
#     no per-call fold and no second copy of the weights in HBM).
# ---------------------------------------------------------------------------


def stack_mixer_params(blocks, dtype=jnp.float32):
    """Fold + stack per-block Mixer params for the stacked-layout kernels.

    blocks: list of L MixerBlock param dicts (mixer.MixerBlock.init layout).
    Returns a dict of (L, ...) arrays with the channel-LN affine folded into
    the first channel matmul exactly as fused_mixer_block does per call:
    rn @ W1 + b1 = rhat @ (s2[:,None]*W1) + (b2ln @ W1 + b1). Meant to run
    eagerly once per loaded model (serving/latency paths)."""
    ln1s, ln1b, t1, t1b, t2, t2b, w1f, b1f, w2, b2 = ([] for _ in range(10))
    for p in blocks:
        d = p["token_norm"]["scale"].shape[-1]
        et = p["token_fc1"].shape[1]
        t = p["token_fc2"].shape[1]
        ec = p["channel_fc1"]["kernel"].shape[1]
        w1_f32 = p["channel_fc1"]["kernel"].astype(jnp.float32)
        s2 = p["channel_norm"]["scale"].astype(jnp.float32)
        b2ln = p["channel_norm"]["bias"].astype(jnp.float32)
        ln1s.append(p["token_norm"]["scale"].reshape(1, d).astype(jnp.float32))
        ln1b.append(p["token_norm"]["bias"].reshape(1, d).astype(jnp.float32))
        t1.append(p["token_fc1"].astype(dtype))
        t1b.append(p["token_fc1_bias"].reshape(et, 1).astype(jnp.float32))
        t2.append(p["token_fc2"].astype(dtype))
        t2b.append(p["token_fc2_bias"].reshape(t, 1).astype(jnp.float32))
        w1f.append((w1_f32 * s2[:, None]).astype(dtype))
        b1f.append(
            (p["channel_fc1"]["bias"].astype(jnp.float32) + b2ln @ w1_f32)
            .reshape(1, ec)
        )
        w2.append(p["channel_fc2"]["kernel"].astype(dtype))
        b2.append(p["channel_fc2"]["bias"].reshape(1, d).astype(jnp.float32))
    names = ("ln1s", "ln1b", "t1", "t1b", "t2", "t2b", "w1f", "b1f", "w2", "b2")
    vals = (ln1s, ln1b, t1, t1b, t2, t2b, w1f, b1f, w2, b2)
    return {k: jnp.stack(v) for k, v in zip(names, vals)}


def _stream_kernel(
    x_ref, ln1s_ref, ln1b_ref, t1_ref, t1b_ref, t2_ref, t2b_ref,
    w1f_ref, b1f_ref, w2_ref, b2_ref, out_ref, *, dtype,
):
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        out_ref[...] = x_ref[...]

    # out_ref IS the depth carry: its block index only depends on the batch
    # grid axis, so across the L inner steps Mosaic keeps it in VMEM (the
    # sequential TPU grid makes the read-modify-write sound, same argument as
    # the param-grad accumulators below).
    consts = (
        ln1s_ref[0], ln1b_ref[0], t1_ref[0], t1b_ref[0], t2_ref[0],
        t2b_ref[0], w1f_ref[0], b1f_ref[0], w2_ref[0], b2_ref[0],
    )
    if out_ref.shape[0] == 2:
        # pair mode (_PAIR): besides the MXU/VPU co-issue, pairing HALVES the
        # stream's dominant HBM cost — each depth step's weights serve TWO
        # batch elements instead of one (weights re-stream per grid step here,
        # unlike the weight-resident per-block kernel).
        out_ref[0], out_ref[1] = _block_math_pair(
            out_ref[0], out_ref[1], *consts, dtype
        )
    else:
        out_ref[0] = _block_math(out_ref[0], *consts, dtype)


def fused_mixer_stream(x, sp, *, dtype=jnp.float32, interpret=False):
    """The whole mixer-block stack in one pallas_call (weights streamed by
    depth, activation carried in VMEM). x: (B, T, D); sp: stack_mixer_params
    output. Numerics identical to looping fused_mixer_block.

    FFVC_MIXER_PAIR resolves here (outside jit) so toggling it is never masked
    by a stale jit cache entry. Pairing halves the stream's per-element weight
    traffic (see _stream_kernel); batch-1 (the latency headline) is unaffected."""
    pe = 2 if (_PAIR and x.shape[0] % 2 == 0) else 1
    return _fused_mixer_stream_impl(x, sp, pe=pe, dtype=dtype, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("pe", "dtype", "interpret"))
def _fused_mixer_stream_impl(x, sp, *, pe, dtype, interpret):
    b, t, d = x.shape
    L, _, et = sp["t1"].shape
    ec = sp["w2"].shape[1]

    def wspec(*shape):
        return pl.BlockSpec(
            (1,) + shape, lambda i, l: (l,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    args = (
        x.astype(dtype), sp["ln1s"], sp["ln1b"], sp["t1"], sp["t1b"],
        sp["t2"], sp["t2b"], sp["w1f"], sp["b1f"], sp["w2"], sp["b2"],
    )
    in_specs = [
        pl.BlockSpec((pe, t, d), lambda i, l: (i, 0, 0), memory_space=pltpu.VMEM),
        wspec(1, d), wspec(1, d), wspec(t, et), wspec(et, 1), wspec(et, t),
        wspec(t, 1), wspec(d, ec), wspec(1, ec), wspec(ec, d), wspec(1, d),
    ]
    flops = 2 * t * d * (2 * et + 2 * ec)  # per batch element per block
    itemsize = jnp.dtype(dtype).itemsize
    wbytes = (t * et + et * t + d * ec + ec * d) * itemsize
    return pl.pallas_call(
        functools.partial(_stream_kernel, dtype=dtype),
        grid=(b // pe, L),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (pe, t, d), lambda i, l: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, d), dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * L * flops,
            bytes_accessed=2 * b * t * d * itemsize + (b // pe) * L * wbytes,
            transcendentals=b * L * (t * ec + et * d),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _block_kernel_stacked(
    x_ref, ln1s_ref, ln1b_ref, t1_ref, t1b_ref, t2_ref, t2b_ref,
    w1f_ref, b1f_ref, w2_ref, b2_ref, out_ref, *, dtype,
):
    out_ref[0] = _block_math(
        x_ref[0], ln1s_ref[0], ln1b_ref[0], t1_ref[0], t1b_ref[0], t2_ref[0],
        t2b_ref[0], w1f_ref[0], b1f_ref[0], w2_ref[0], b2_ref[0], dtype,
    )


@functools.partial(jax.jit, static_argnames=("block_idx", "dtype", "interpret"))
def fused_mixer_block_stacked(x, sp, *, block_idx, dtype=jnp.float32,
                              interpret=False):
    """One block of the stacked layout with the batch-walking grid of
    fused_mixer_block (weights resident across the batch via constant index
    maps into the (L, ...) arrays — no slicing copy, no per-call LN fold)."""
    b, t, d = x.shape
    _, _, et = sp["t1"].shape
    ec = sp["w2"].shape[1]

    def wspec(*shape):
        return pl.BlockSpec(
            (1,) + shape, lambda i: (block_idx,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    args = (
        x.astype(dtype), sp["ln1s"], sp["ln1b"], sp["t1"], sp["t1b"],
        sp["t2"], sp["t2b"], sp["w1f"], sp["b1f"], sp["w2"], sp["b2"],
    )
    in_specs = [
        pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        wspec(1, d), wspec(1, d), wspec(t, et), wspec(et, 1), wspec(et, t),
        wspec(t, 1), wspec(d, ec), wspec(1, ec), wspec(ec, d), wspec(1, d),
    ]
    flops = 2 * t * d * (2 * et + 2 * ec)
    itemsize = jnp.dtype(dtype).itemsize
    return pl.pallas_call(
        functools.partial(_block_kernel_stacked, dtype=dtype),
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Training path: residual-emitting forward + two backward kernels under a
# custom_vjp. The XLA autodiff of the module path round-trips every hidden
# intermediate through HBM (mapper bwd measured ~35 ms vs ~27 ms FLOP-scaled
# at train shapes, BENCH_NOTES.md); here the forward saves only the three
# pre-activation residuals (a1, r, a3) and the backward recomputes LN stats /
# GELU values in VMEM. Param grads are accumulated ACROSS grid steps into
# constant-index-map f32 output blocks (zero-initialised at program_id 0 —
# the TPU grid is sequential, so read-modify-write accumulation is sound).
# ---------------------------------------------------------------------------

# Chebyshev fit (converted to monomials in u = a^2/8 - 1) of exp(-a^2) on
# a in [0, 4]: the Gaussian factor of gelu'(x) = Phi(x) + x*phi(x), with
# x = sqrt(2)*a so exp(-a^2) = exp(-x^2/2). f32 eval |err| <= 6.3e-6; past the
# clamp exp(-16) = 1.1e-7 is dropped. A dedicated fit is needed because the
# analytic derivative of the erf value polynomial amplifies its fit error by
# ~deg^2 (measured 3.3e-4 for the 15-term, 0.04 for the 11-term).
_GAUSS_POLY_U = (
    0.00033468212553164345, -0.002700033828658105, 0.010824628718555246,
    -0.02800216503701594, 0.05556036396587086, -0.09843614552055405,
    0.13421300898006472, -0.10698238111327471, 0.09768057791033924,
    -0.20256025567037544, 0.17687098731176398, 0.02577999414649561,
    -0.028799733332540833, -0.08709505446769782, 0.053317954680803456,
)


def _horner(coef, u):
    p = jnp.float32(coef[-1])
    for c in coef[-2::-1]:
        p = p * u + jnp.float32(c)
    return p


def _gelu_val_grad(x, dtype):
    """(gelu(x), gelu'(x)) in f32. The value uses the same erf polynomial as
    the forward kernel (backward recomputation matches forward bit-for-bit);
    the derivative uses gelu'(x) = Phi(x) + x*phi(x) with Phi from the value
    polynomial and phi from the dedicated Gaussian fit (|gelu' err| <= 1.4e-5
    for the f32 path, ~2e-4 for bf16 — the value polynomial's own error
    dominates there). 1/sqrt(2*pi) = 0.3989423."""
    coef = _ERF_POLY_U_BF16 if dtype == jnp.bfloat16 else _ERF_POLY_U
    xf = x.astype(jnp.float32)
    ax = jnp.abs(xf)
    aq = ax * jnp.float32(0.7071067811865476)
    inside = (aq < jnp.float32(4.0)).astype(jnp.float32)
    a = jnp.minimum(aq, jnp.float32(4.0))
    u = a * a * jnp.float32(0.125) - jnp.float32(1.0)
    e_abs = a * _horner(coef, u)
    phi = _horner(_GAUSS_POLY_U, u) * jnp.float32(0.3989422804014327)
    val = jnp.float32(0.5) * (xf + ax * e_abs)
    grad = (
        jnp.float32(0.5)
        + jnp.float32(0.5) * jnp.sign(xf) * e_abs
        + xf * phi * inside
    )
    return val, grad


def _block_res_kernel(
    x_ref, ln1s_ref, ln1b_ref, t1_ref, t1b_ref, t2_ref, t2b_ref,
    ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    out_ref, g1_ref, dg1_ref, rhat_ref, inv2_ref, g3_ref, dg3_ref,
    *, dtype,
):
    """Forward identical to _block_kernel, additionally materialising the GELU
    values AND their derivatives (plus the mid-block residual r, its
    normalized form rhat and inverse stds). Saving gelu'(a) from the forward
    instead of recomputing it from a saved a was the round-3 backward fix: the
    gelu' polynomial chain measured 0.47 ms/block of the token backward alone
    (~80% of its runtime) while the extra residual write+read is ~0.1 ms/block
    of HBM traffic at train batch. Saving rhat/inv2 likewise spares the
    channel backward its LN-stats recompute; the rounding order
    (rf*inv - mean*inv) matches _kernel_layer_norm exactly so `rn` and the
    block output are bit-identical to the pre-save kernel."""
    x = x_ref[0]
    xn = _kernel_layer_norm(x, ln1s_ref[:], ln1b_ref[:], dtype)
    h1 = jax.lax.dot_general(
        t1_ref[:], xn, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    g1f, dgelu1 = _gelu_val_grad(h1 + t1b_ref[:], dtype)
    g1 = g1f.astype(dtype)
    g1_ref[0] = g1
    dg1_ref[0] = dgelu1.astype(dtype)
    h2 = jax.lax.dot_general(
        t2_ref[:], g1, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    r = x.astype(dtype) + (h2 + t2b_ref[:]).astype(dtype)
    rf = r.astype(jnp.float32)
    mean = jnp.mean(rf, axis=-1, keepdims=True)
    var = jnp.mean(rf * rf, axis=-1, keepdims=True) - mean * mean
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    rhat = rf * inv - mean * inv
    rhat_ref[0] = rhat.astype(dtype)
    inv2_ref[0] = inv
    rn = (rhat * ln2s_ref[:] + ln2b_ref[:]).astype(dtype)
    h3 = jax.lax.dot_general(
        rn, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    g3f, dgelu3 = _gelu_val_grad(h3 + b1_ref[:], dtype)
    g3 = g3f.astype(dtype)
    g3_ref[0] = g3
    dg3_ref[0] = dgelu3.astype(dtype)
    h4 = jax.lax.dot_general(
        g3, w2_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_ref[0] = r + (h4 + b2_ref[:]).astype(dtype)


def _block_res_pipe_kernel(
    x_ref, ln1s_ref, ln1b_ref, t1_ref, t1b_ref, t2_ref, t2b_ref,
    ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    out_ref, g1_ref, dg1_ref, rhat_ref, inv2_ref, g3_ref, dg3_ref, r_scr,
    *, dtype, nb,
):
    """Skewed _block_res_kernel (same move as _pipe_kernel): step j runs the
    CHANNEL phase of element j-1 (residual carried in the 2-slot scratch)
    interleaved with the TOKEN phase of element j. Per-element op order is
    unchanged, so every output is bit-identical to _block_res_kernel; only
    the cross-element schedule differs. Boundary steps (grid nb+1): step 0's
    channel outputs are garbage into block 0 and overwritten at step 1
    before any HBM writeback (same block index); step nb's token phase
    recomputes element nb-1 into the same blocks with identical values."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():  # step 0's channel phase chews a zeroed residual
        r_scr[1] = jnp.zeros_like(r_scr[1])

    dg = functools.partial(jax.lax.dot_general, preferred_element_type=jnp.float32)
    tok = (((0,), (0,)), ((), ()))
    ch1 = (((1,), (0,)), ((), ()))

    x = x_ref[0]
    r_prev = r_scr[(j - 1) % 2]
    rf = r_prev.astype(jnp.float32)
    mean = jnp.mean(rf, axis=-1, keepdims=True)
    var = jnp.mean(rf * rf, axis=-1, keepdims=True) - mean * mean
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    rhat = rf * inv - mean * inv
    rhat_ref[0] = rhat.astype(dtype)
    inv2_ref[0] = inv
    rn = (rhat * ln2s_ref[:] + ln2b_ref[:]).astype(dtype)
    h3 = dg(rn, w1_ref[:], ch1)                                # MXU (big)
    xn = _kernel_layer_norm(x, ln1s_ref[:], ln1b_ref[:], dtype)  # VPU — under h3
    g3f, dgelu3 = _gelu_val_grad(h3 + b1_ref[:], dtype)        # VPU
    h1 = dg(t1_ref[:], xn, tok)                                # MXU — under g3
    g3 = g3f.astype(dtype)
    g3_ref[0] = g3
    dg3_ref[0] = dgelu3.astype(dtype)
    h4 = dg(g3, w2_ref[:], ch1)                                # MXU (big)
    g1f, dgelu1 = _gelu_val_grad(h1 + t1b_ref[:], dtype)       # VPU — under h4
    g1 = g1f.astype(dtype)
    g1_ref[0] = g1
    dg1_ref[0] = dgelu1.astype(dtype)
    out_ref[0] = r_prev + (h4 + b2_ref[:]).astype(dtype)       # VPU
    h2 = dg(t2_ref[:], g1, tok)                                # MXU
    r_scr[j % 2] = x.astype(dtype) + (h2 + t2b_ref[:]).astype(dtype)


def _ln_stats(xf):
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    return (xf - mean) * inv, inv


def _ln_bwd(dy, xhat, inv, scale):
    """LayerNorm input gradient given upstream dy, normalized xhat, inv-std,
    and the affine scale; all f32. d(scale)/d(bias) are taken by the caller."""
    g = dy * scale
    m1 = jnp.mean(g, axis=-1, keepdims=True)
    m2 = jnp.mean(g * xhat, axis=-1, keepdims=True)
    return inv * (g - m1 - xhat * m2)


def _accum(ref, val):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ref[...] = jnp.zeros_like(ref)

    ref[...] += val


def _channel_bwd_kernel(
    dout_ref, rhat_ref, inv2_ref, g3_ref, dgelu3_ref, ln2s_ref, ln2b_ref,
    w1_ref, w2_ref,
    dr_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dls2_ref, dlb2_ref,
    *, dtype,
):
    dout = dout_ref[0].astype(jnp.float32)  # (T, D)
    doutd = dout.astype(dtype)
    # rhat/inv2 saved by the forward: no LN-stats recompute (two (T, D) f32
    # reduction passes + rsqrt saved per block)
    rhat = rhat_ref[0].astype(jnp.float32)
    inv2 = inv2_ref[0]  # (T, 1) f32
    s2 = ln2s_ref[:]
    rn = (rhat * s2 + ln2b_ref[:]).astype(dtype)
    g3 = g3_ref[0]  # saved by the forward (value + derivative)
    # dg3[t,e] = sum_d dout[t,d] * w2[e,d]
    dg3 = jax.lax.dot_general(
        doutd, w2_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, Ec)
    da3f = dg3 * dgelu3_ref[0].astype(jnp.float32)
    da3 = da3f.astype(dtype)
    _accum(db1_ref, jnp.sum(da3f, axis=0, keepdims=True))  # (1, Ec)
    _accum(db2_ref, jnp.sum(dout, axis=0, keepdims=True))  # (1, D)
    # dW2[e,d] = sum_t g3[t,e] dout[t,d]
    _accum(
        dw2_ref,
        jax.lax.dot_general(
            g3, doutd, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ),
    )
    # dW1[d,e] = sum_t rn[t,d] da3[t,e]
    _accum(
        dw1_ref,
        jax.lax.dot_general(
            rn, da3, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ),
    )
    # drn[t,d] = sum_e da3[t,e] w1[d,e]
    drn = jax.lax.dot_general(
        da3, w1_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    _accum(dls2_ref, jnp.sum(drn * rhat, axis=0, keepdims=True))
    _accum(dlb2_ref, jnp.sum(drn, axis=0, keepdims=True))
    dr_ref[0] = dout + _ln_bwd(drn, rhat, inv2, s2)


def _channel_bwd_pipe_kernel(
    dout_ref, dout_prev_ref, rhat_ref, inv2_ref, g3_ref, dgelu3_ref,
    ln2s_ref, ln2b_ref, w1_ref, w2_ref,
    dr_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dls2_ref, dlb2_ref,
    da3_scr,
    *, dtype, nb,
):
    """Skewed _channel_bwd_kernel: step j runs phase 2 of element j-1 (all
    accumulations + dr) interleaved with phase 1 of element j (the dg3
    contraction + gelu' product, carried f32 in a 2-slot scratch), so every
    MXU dot has the other phase's reductions/LN-backward VPU work adjacent in
    program order. Element e's accumulation happens at step e+1 in the same
    e = 0..nb-1 sequence as the unskewed kernel, and the per-element terms
    are computed identically (da3 carried in f32), so the param grads are
    bit-identical. Boundary steps (grid nb+1): step 0's phase 2 is fully
    guarded (accumulators are zero-initialized, the dr block-0 write is
    overwritten at step 1 before HBM writeback); step nb's phase 1
    recomputes element nb-1 into an unread scratch slot."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        da3_scr[1] = jnp.zeros_like(da3_scr[1])
        for ref in (dw1_ref, db1_ref, dw2_ref, db2_ref, dls2_ref, dlb2_ref):
            ref[...] = jnp.zeros_like(ref)

    valid = j > 0
    s2 = ln2s_ref[:]
    da3f = da3_scr[(j - 1) % 2]                                # (T, Ec) f32
    da3 = da3f.astype(dtype)
    rhat = rhat_ref[0].astype(jnp.float32)
    rn = (rhat * s2 + ln2b_ref[:]).astype(dtype)               # VPU
    # P1(j): the big dg3 contraction — P2's reductions co-issue under it
    dg3 = jax.lax.dot_general(
        dout_ref[0].astype(dtype), w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                           # MXU
    dout_prev = dout_prev_ref[0].astype(jnp.float32)

    @pl.when(valid)
    def _sums():                                                # VPU — under dg3
        db1_ref[...] += jnp.sum(da3f, axis=0, keepdims=True)
        db2_ref[...] += jnp.sum(dout_prev, axis=0, keepdims=True)

    @pl.when(valid)
    def _dw1():                                                 # MXU
        dw1_ref[...] += jax.lax.dot_general(
            rn, da3, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    da3_scr[j % 2] = dg3 * dgelu3_ref[0].astype(jnp.float32)    # VPU (P1 tail)

    @pl.when(valid)
    def _dw2():                                                 # MXU
        dw2_ref[...] += jax.lax.dot_general(
            g3_ref[0], dout_prev.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    drn = jax.lax.dot_general(                                  # MXU
        da3, w1_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(valid)
    def _ln_sums():                                             # VPU — under dw2/drn
        dls2_ref[...] += jnp.sum(drn * rhat, axis=0, keepdims=True)
        dlb2_ref[...] += jnp.sum(drn, axis=0, keepdims=True)

    dr_ref[0] = dout_prev + _ln_bwd(drn, rhat, inv2_ref[0], s2)


def _token_bwd_kernel(
    dr_ref, x_ref, g1_ref, dgelu1_ref, ln1s_ref, ln1b_ref, t1_ref, t2_ref,
    dx_ref, dt1_ref, dt1b_ref, dt2_ref, dt2b_ref, dls1_ref, dlb1_ref,
    *, dtype,
):
    dr = dr_ref[0]  # (T, D) f32
    drd = dr.astype(dtype)
    xf = x_ref[0].astype(jnp.float32)
    xhat, inv1 = _ln_stats(xf)
    s1 = ln1s_ref[:]
    xn = (xhat * s1 + ln1b_ref[:]).astype(dtype)
    g1 = g1_ref[0]  # saved by the forward (value + derivative)
    _accum(dt2b_ref, jnp.sum(dr, axis=1, keepdims=True))  # (T, 1)
    # dg1[e,d] = sum_t t2[e,t] dr[t,d]
    dg1 = jax.lax.dot_general(
        t2_ref[:], drd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    da1f = dg1 * dgelu1_ref[0].astype(jnp.float32)
    da1 = da1f.astype(dtype)
    _accum(dt1b_ref, jnp.sum(da1f, axis=1, keepdims=True))  # (Et, 1)
    # dt2[e,t] = sum_d g1[e,d] dr[t,d]
    _accum(
        dt2_ref,
        jax.lax.dot_general(
            g1, drd, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ),
    )
    # dxn[t,d] = sum_e t1[t,e] da1[e,d]
    dxn = jax.lax.dot_general(
        t1_ref[:], da1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dt1[t,e] = sum_d xn[t,d] da1[e,d]
    _accum(
        dt1_ref,
        jax.lax.dot_general(
            xn, da1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ),
    )
    _accum(dls1_ref, jnp.sum(dxn * xhat, axis=0, keepdims=True))
    _accum(dlb1_ref, jnp.sum(dxn, axis=0, keepdims=True))
    dx_ref[0] = dr + _ln_bwd(dxn, xhat, inv1, s1)


def _block_args(x, p, dtype):
    b, t, d = x.shape
    et = p["token_fc1"].shape[1]
    ec = p["channel_fc1"]["kernel"].shape[1]
    args = (
        x.astype(dtype),
        p["token_norm"]["scale"].reshape(1, d).astype(jnp.float32),
        p["token_norm"]["bias"].reshape(1, d).astype(jnp.float32),
        p["token_fc1"].astype(dtype),
        p["token_fc1_bias"].reshape(et, 1).astype(jnp.float32),
        p["token_fc2"].astype(dtype),
        p["token_fc2_bias"].reshape(t, 1).astype(jnp.float32),
        p["channel_norm"]["scale"].reshape(1, d).astype(jnp.float32),
        p["channel_norm"]["bias"].reshape(1, d).astype(jnp.float32),
        p["channel_fc1"]["kernel"].astype(dtype),
        p["channel_fc1"]["bias"].reshape(1, ec).astype(jnp.float32),
        p["channel_fc2"]["kernel"].astype(dtype),
        p["channel_fc2"]["bias"].reshape(1, d).astype(jnp.float32),
    )
    const = lambda i: (0, 0)
    specs = [
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
    return args, specs, (b, t, d, et, ec)


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def _fwd_res(x, p, dtype, interpret):
    args, in_specs, (b, t, d, et, ec) = _block_args(x, p, dtype)
    elem = lambda i: (i, 0, 0)
    out, g1, dg1, rhat, inv2, g3, dg3 = pl.pallas_call(
        functools.partial(_block_res_kernel, dtype=dtype),
        grid=(b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, t, d), elem, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, et, d), elem, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, et, d), elem, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), elem, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1), elem, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, ec), elem, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, ec), elem, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, d), dtype),
            jax.ShapeDtypeStruct((b, et, d), dtype),
            jax.ShapeDtypeStruct((b, et, d), dtype),
            jax.ShapeDtypeStruct((b, t, d), dtype),
            jax.ShapeDtypeStruct((b, t, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, t, ec), dtype),
            jax.ShapeDtypeStruct((b, t, ec), dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out, g1, dg1, rhat, inv2, g3, dg3


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def _fwd_res_pipe(x, p, dtype, interpret):
    """Skewed residual-emitting forward (see _block_res_pipe_kernel)."""
    args, in_specs, (b, t, d, et, ec) = _block_args(x, p, dtype)
    # skew: token input / token outputs track element j (clamped at the top);
    # channel outputs track element j-1 (clamped at the bottom)
    tok_i = lambda j: (jnp.minimum(j, b - 1), 0, 0)
    ch_i = lambda j: (jnp.maximum(j - 1, 0), 0, 0)
    in_specs[0] = pl.BlockSpec((1, t, d), tok_i, memory_space=pltpu.VMEM)
    out, g1, dg1, rhat, inv2, g3, dg3 = pl.pallas_call(
        functools.partial(_block_res_pipe_kernel, dtype=dtype, nb=b),
        grid=(b + 1,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, t, d), ch_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, et, d), tok_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, et, d), tok_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), ch_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1), ch_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, ec), ch_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, ec), ch_i, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, d), dtype),
            jax.ShapeDtypeStruct((b, et, d), dtype),
            jax.ShapeDtypeStruct((b, et, d), dtype),
            jax.ShapeDtypeStruct((b, t, d), dtype),
            jax.ShapeDtypeStruct((b, t, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, t, ec), dtype),
            jax.ShapeDtypeStruct((b, t, ec), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((2, t, d), dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out, g1, dg1, rhat, inv2, g3, dg3


# FFVC_FUSED_TRAIN_PIPE: route the train forward through the skewed kernel.
# Measured on v5e (benchmarks/train_fwd_pipe_timing.py, 32-block fwd+bwd,
# flagship T=256/D=1024): B=8 73.1->71.3 ms, B=32 142.9->139.4, B=64
# 242.7->232.4 — a consistent 2.4-4.2% step win (~10% of the forward it
# touches), so default ON wherever a second element exists to skew with.
_TRAIN_PIPE_ENV = os.environ.get("FFVC_FUSED_TRAIN_PIPE", "")
_TRAIN_PIPE_DEFAULT = True
_TRAIN_PIPE_MIN_BATCH = 2


def _train_pipe_enabled(b):
    if _TRAIN_PIPE_ENV in ("1", "true"):
        return b >= 2
    if _TRAIN_PIPE_ENV in ("0", "false"):
        return False
    return _TRAIN_PIPE_DEFAULT and b >= _TRAIN_PIPE_MIN_BATCH


# FFVC_CHANNEL_BWD_PIPE: route the channel backward through the skewed kernel
# (phase 2 of element j-1 under phase 1 of element j). Param grads are
# bit-identical (same per-element terms, same accumulation sequence).
_CH_BWD_PIPE_ENV = os.environ.get("FFVC_CHANNEL_BWD_PIPE", "")
_CH_BWD_PIPE_DEFAULT = True


def _channel_bwd_pipe_enabled(b):
    if _CH_BWD_PIPE_ENV in ("1", "true"):
        return b >= 2
    if _CH_BWD_PIPE_ENV in ("0", "false"):
        return False
    return _CH_BWD_PIPE_DEFAULT and b >= 2


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def _channel_bwd_pipe(dout, rhat, inv2, g3, dgelu3, p, dtype, interpret):
    b, t, d = dout.shape
    ec = g3.shape[-1]
    const = lambda j: (0, 0)
    cur = lambda j: (jnp.minimum(j, b - 1), 0, 0)   # phase-1 element
    prev = lambda j: (jnp.maximum(j - 1, 0), 0, 0)  # phase-2 element
    args = (
        dout,
        dout,
        rhat,
        inv2,
        g3,
        dgelu3,
        p["channel_norm"]["scale"].reshape(1, d).astype(jnp.float32),
        p["channel_norm"]["bias"].reshape(1, d).astype(jnp.float32),
        p["channel_fc1"]["kernel"].astype(dtype),
        p["channel_fc2"]["kernel"].astype(dtype),
    )
    in_specs = [
        pl.BlockSpec((1, t, d), cur, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, d), prev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, d), prev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, 1), prev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, ec), prev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, ec), cur, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, ec), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((ec, d), const, memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        functools.partial(_channel_bwd_pipe_kernel, dtype=dtype, nb=b),
        grid=(b + 1,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, t, d), prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ec), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ec), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((ec, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, d), jnp.float32),  # dr
            jax.ShapeDtypeStruct((d, ec), jnp.float32),  # dw1
            jax.ShapeDtypeStruct((1, ec), jnp.float32),  # db1
            jax.ShapeDtypeStruct((ec, d), jnp.float32),  # dw2
            jax.ShapeDtypeStruct((1, d), jnp.float32),  # db2
            jax.ShapeDtypeStruct((1, d), jnp.float32),  # dls2
            jax.ShapeDtypeStruct((1, d), jnp.float32),  # dlb2
        ],
        scratch_shapes=[pltpu.VMEM((2, t, ec), jnp.float32)],  # da3 carry (f32)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def _channel_bwd(dout, rhat, inv2, g3, dgelu3, p, dtype, interpret):
    b, t, d = dout.shape
    ec = g3.shape[-1]
    if _channel_bwd_pipe_enabled(b):
        return _channel_bwd_pipe(dout, rhat, inv2, g3, dgelu3, p, dtype, interpret)
    const = lambda i: (0, 0)
    elem = lambda i: (i, 0, 0)
    args = (
        dout,
        rhat,
        inv2,
        g3,
        dgelu3,
        p["channel_norm"]["scale"].reshape(1, d).astype(jnp.float32),
        p["channel_norm"]["bias"].reshape(1, d).astype(jnp.float32),
        p["channel_fc1"]["kernel"].astype(dtype),
        p["channel_fc2"]["kernel"].astype(dtype),
    )
    in_specs = [
        pl.BlockSpec((1, t, d), elem, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, d), elem, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, 1), elem, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, ec), elem, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, ec), elem, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, ec), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((ec, d), const, memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        functools.partial(_channel_bwd_kernel, dtype=dtype),
        grid=(b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, t, d), elem, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ec), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ec), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((ec, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, d), jnp.float32),  # dr
            jax.ShapeDtypeStruct((d, ec), jnp.float32),  # dw1
            jax.ShapeDtypeStruct((1, ec), jnp.float32),  # db1
            jax.ShapeDtypeStruct((ec, d), jnp.float32),  # dw2
            jax.ShapeDtypeStruct((1, d), jnp.float32),  # db2
            jax.ShapeDtypeStruct((1, d), jnp.float32),  # dls2
            jax.ShapeDtypeStruct((1, d), jnp.float32),  # dlb2
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def _token_bwd(dr, x, g1, dgelu1, p, dtype, interpret):
    b, t, d = x.shape
    et = g1.shape[1]
    const = lambda i: (0, 0)
    elem = lambda i: (i, 0, 0)
    args = (
        dr,
        x.astype(dtype),
        g1,
        dgelu1,
        p["token_norm"]["scale"].reshape(1, d).astype(jnp.float32),
        p["token_norm"]["bias"].reshape(1, d).astype(jnp.float32),
        p["token_fc1"].astype(dtype),
        p["token_fc2"].astype(dtype),
    )
    in_specs = [
        pl.BlockSpec((1, t, d), elem, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, d), elem, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, et, d), elem, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, et, d), elem, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((t, et), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((et, t), const, memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        functools.partial(_token_bwd_kernel, dtype=dtype),
        grid=(b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, t, d), elem, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, et), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((et, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((et, t), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, d), jnp.float32),  # dx
            jax.ShapeDtypeStruct((t, et), jnp.float32),  # dt1
            jax.ShapeDtypeStruct((et, 1), jnp.float32),  # dt1b
            jax.ShapeDtypeStruct((et, t), jnp.float32),  # dt2
            jax.ShapeDtypeStruct((t, 1), jnp.float32),  # dt2b
            jax.ShapeDtypeStruct((1, d), jnp.float32),  # dls1
            jax.ShapeDtypeStruct((1, d), jnp.float32),  # dlb1
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_mixer_block_train(x, p, dtype=jnp.float32, interpret=False):
    """Differentiable fused mixer block (forward = fused_mixer_block numerics;
    backward = Pallas channel/token kernels). Gradients are the analytic
    adjoint of the kernel math — consistent with the fused forward and within
    f32-accumulation rounding of the XLA module path's autodiff (pinned by
    tests/test_fused_mixer.py::TestTrainGrads)."""
    out, _, _, _, _, _, _ = _fwd_res_dispatch(x, p, dtype, interpret)
    return out


def _fwd_res_dispatch(x, p, dtype, interpret):
    if _train_pipe_enabled(x.shape[0]):
        return _fwd_res_pipe(x, p, dtype, interpret)
    return _fwd_res(x, p, dtype, interpret)


def _fused_train_fwd(x, p, dtype, interpret):
    out, g1, dg1, rhat, inv2, g3, dg3 = _fwd_res_dispatch(x, p, dtype, interpret)
    return out, (x, p, g1, dg1, rhat, inv2, g3, dg3)


def _fused_train_bwd(dtype, interpret, res, dout):
    x, p, g1, dg1, rhat, inv2, g3, dg3 = res
    dout = dout.astype(jnp.float32)
    dr, dw1, db1, dw2, db2, dls2, dlb2 = _channel_bwd(
        dout, rhat, inv2, g3, dg3, p, dtype, interpret
    )
    dx, dt1, dt1b, dt2, dt2b, dls1, dlb1 = _token_bwd(dr, x, g1, dg1, p, dtype, interpret)
    d = x.shape[-1]
    t = dt1.shape[0]
    et = dt1.shape[1]
    ec = dw1.shape[1]

    def _like(g, ref):
        return g.reshape(ref.shape).astype(ref.dtype)

    dp = {
        "token_norm": {
            "scale": _like(dls1, p["token_norm"]["scale"]),
            "bias": _like(dlb1, p["token_norm"]["bias"]),
        },
        "token_fc1": _like(dt1, p["token_fc1"]),
        "token_fc1_bias": _like(dt1b, p["token_fc1_bias"]),
        "token_fc2": _like(dt2, p["token_fc2"]),
        "token_fc2_bias": _like(dt2b, p["token_fc2_bias"]),
        "channel_norm": {
            "scale": _like(dls2, p["channel_norm"]["scale"]),
            "bias": _like(dlb2, p["channel_norm"]["bias"]),
        },
        "channel_fc1": {
            "kernel": _like(dw1, p["channel_fc1"]["kernel"]),
            "bias": _like(db1, p["channel_fc1"]["bias"]),
        },
        "channel_fc2": {
            "kernel": _like(dw2, p["channel_fc2"]["kernel"]),
            "bias": _like(db2, p["channel_fc2"]["bias"]),
        },
    }
    return dx.astype(x.dtype), dp


fused_mixer_block_train.defvjp(_fused_train_fwd, _fused_train_bwd)
