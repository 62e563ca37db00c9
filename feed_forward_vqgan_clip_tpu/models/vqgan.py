"""VQGAN decoder (taming-transformers architecture) in flax, NHWC/TPU-native.

Replicates the compute graph the reference drives through
`taming.models.vqgan.VQModel.decode` (/root/reference/main.py:84-103, 140-143):
codebook lookup -> post_quant_conv (1x1) -> decoder (conv_in, mid ResNet+attention
blocks, per-level ResNet stacks with nearest-neighbor upsampling, GroupNorm+swish
head). Architecture hyperparameters come from the released yaml `ddconfig`
(registry.VQGAN_CONFIGS carries the f16 presets).

TPU design:
  * NHWC layout throughout; convs are lax.conv_general_dilated via flax with HWIO
    kernels so the MXU sees well-tiled contractions. The torch converter
    (io/torch_import.py) transposes taming's OIHW weights.
  * GroupNorm statistics in float32 regardless of compute dtype (bf16-safe).
  * The 16x16 attention block is exact softmax attention over 256 tokens — a single
    fused XLA dot chain; no flash/blockwise machinery is warranted at this size
    (SURVEY.md §5: largest sequence in the system is ~1k tokens).
"""

import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.ops.grad_ops import clamp_with_grad
from feed_forward_vqgan_clip_tpu.ops.quantize import quantize_indices, vector_quantize


def swish(x):
    return x * jax.nn.sigmoid(x)


class GroupNorm32(nn.Module):
    """GroupNorm(32 groups, eps=1e-6) with float32 statistics (taming's norm).

    Memory-lean formulation: statistics are reduced in f32 but the big activation
    tensor stays in the compute dtype — the normalization folds into one
    per-channel multiply-add (out = x*A + B with A/B tiny f32->dtype tensors), so
    no full-size f32 intermediate is ever materialized (matters at 256^2x128 in
    the decoder's top level).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # taming always uses 32 groups (channels are multiples of 32 in every released
        # config); fall back to per-channel groups for tiny test configs.
        c = x.shape[-1]
        groups = 32 if c % 32 == 0 else c
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        b = x.shape[0]
        xg = x.reshape(b, -1, groups, c // groups)
        xf = xg.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)  # (b,1,g,1) f32
        var = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True) - jnp.square(mean)
        # E[x^2]-E[x]^2 can go slightly NEGATIVE from f32 cancellation on
        # near-constant groups (measured as low as -0.03), which would NaN the
        # rsqrt — clamp like flax's GroupNorm does
        var = jnp.maximum(var, 0.0)
        inv = jax.lax.rsqrt(var + 1e-6)  # (b,1,g,1)

        sc = scale.reshape(groups, c // groups)[None, None]
        bi = bias.reshape(groups, c // groups)[None, None]
        A = (inv * sc).astype(self.dtype)  # (b,1,g,c/g)
        B = (bi - mean * inv * sc).astype(self.dtype)
        return (xg * A + B).reshape(x.shape)


class ResnetBlock(nn.Module):
    out_ch: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        in_ch = x.shape[-1]
        h = GroupNorm32(dtype=self.dtype, name="norm1")(x)
        h = swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(dtype=self.dtype, name="norm2")(h)
        h = swish(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(
                self.out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut"
            )(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head self-attention over the HxW token grid (taming's AttnBlock)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = GroupNorm32(dtype=self.dtype, name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn).reshape(b, h * w, c)
        attn = jnp.einsum("bqc,bkc->bqk", q, k) * (c ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class _Conv3x3Params(nn.Module):
    """Parameter container with nn.Conv's exact {kernel (3,3,Cin,Cout) HWIO,
    bias (Cout,)} layout/init, so Upsample's param tree (and therefore the
    torch converter and every checkpoint) is identical across both compute
    paths below."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


# Phase-fold matrices for the fast Upsample path (see Upsample docstring).
# Row a of R[p] gives the original-kernel row taps that land on the a-th input
# row of phase p's 2x2 window: NN-2x duplication collapses the 3 kernel rows
# onto at most 2 distinct input rows per output phase.
_PHASE_FOLD = jnp.asarray(
    [[[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]],   # even output rows: I[Y-1]*K0, I[Y]*(K1+K2)
     [[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]]],  # odd  output rows: I[Y]*(K0+K1), I[Y+1]*K2
    jnp.float32,
)

_DN = ("NHWC", "HWIO", "NHWC")


@jax.custom_vjp
def _dilated_up(x, k4):
    """lhs-dilated 4x4 conv (Upsample mode 2 core). The custom VJP exists
    because XLA's autodiff of a lhs-dilated conv lowers its input-gradient
    pathologically on TPU (measured +79 ms on the train step); the true
    adjoint is an ORDINARY stride-2 conv with the spatially-flipped,
    IO-transposed kernel — the same shape as an encoder downsampling conv."""
    return jax.lax.conv_general_dilated(
        x, k4, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=_DN,
    )


def _dilated_up_fwd(x, k4):
    return _dilated_up(x, k4), (x, k4)


def _dilated_up_bwd(res, g):
    x, k4 = res
    # y[U] = sum_t K4[t] xd_pad2[U+t] with xd[2m] = x[m]  =>
    # dx[m] = sum_t K4[t] g[2m+2-t] = (g * flip(K4)^T)[2m] at stride 2,
    # padding (1, 2) per dim (output length (2H+3-4)//2+1 = H).
    krev = jnp.flip(k4, (0, 1)).swapaxes(2, 3)
    dx = jax.lax.conv_general_dilated(
        g, krev, (2, 2), ((1, 2), (1, 2)), dimension_numbers=_DN
    )
    # kernel cotangent via XLA's own weight-grad (exact; DCE'd in training —
    # the decoder is frozen — and only exercised by tiny-shape parity tests).
    # vjp of the RAW conv, not _dilated_up: vjp-ing the custom_vjp'd function
    # would re-enter this rule and recurse at trace time.
    def _raw(kk):
        return jax.lax.conv_general_dilated(
            x, kk, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=_DN,
        )

    _, vjp_k = jax.vjp(_raw, k4)
    (dk4,) = vjp_k(g)
    return dx, dk4


_dilated_up.defvjp(_dilated_up_fwd, _dilated_up_bwd)


# FFVC_FAST_UPSAMPLE: 0 = naive NN-2x + 3x3 conv (the reference graph) |
# 1 = phase-decomposed 2x2 conv + pixel shuffle (measured LOSS on v5e —
# relayout-bound) | 2 = lhs-dilated 4x4 conv (transposed-conv form; DEFAULT —
# measured clamp+synth 97.8 -> 83.5 ms at B=64/256px on v5e). All three are
# mathematically identical; see Upsample docstring.
_FAST_UPSAMPLE_MODE = os.environ.get("FFVC_FAST_UPSAMPLE", "2")
if _FAST_UPSAMPLE_MODE in ("false", ""):
    _FAST_UPSAMPLE_MODE = "0"
if _FAST_UPSAMPLE_MODE == "true":
    _FAST_UPSAMPLE_MODE = "1"
if _FAST_UPSAMPLE_MODE not in ("0", "1", "2"):
    raise ValueError(
        f"FFVC_FAST_UPSAMPLE={os.environ['FFVC_FAST_UPSAMPLE']!r} is not a "
        "recognized upsample mode; use 0 (reference NN-2x + 3x3 conv graph), "
        "1 (phase-decomposed, measured slower on v5e), or 2 (lhs-dilated "
        "transposed conv, default)."
    )


class Upsample(nn.Module):
    """Nearest-neighbor 2x upsample followed by a 3x3 conv (taming's Upsample).

    Three mathematically identical compute paths (`fast` / FFVC_FAST_UPSAMPLE):
      * "0" naive: materialize the (2H, 2W) NN-upsampled tensor, 3x3 conv pad
        1 — the reference graph, 36 MACs per output pixel per (Cin->Cout)
        pair.
      * "1" phase-decomposed: NN duplication makes the 3x3 window read at most
        2x2 DISTINCT input pixels per output phase, so fold the kernel per
        phase (K2[p,q] = R[p] K R[q]^T over tap space, output channels stacked
        4*Cout), run ONE VALID 2x2 conv, pixel-shuffle the 4 phase groups —
        16 MACs/px. MEASURED a net LOSS on v5e (clamp+synth 116.6 vs 98.0 ms
        naive at B=64): the phase slicing + depth-to-space interleave is pure
        relayout traffic on (B, 2H, 2W, C)-scale tensors.
      * "2" lhs-dilated (DEFAULT, round 4): the same 16-MACs/px fold expressed
        as ONE lhs_dilation=(2,2) conv with the 4x4 kernel K4 = F K F^T over
        tap space (F = [[1,0,0],[1,1,0],[0,1,1],[0,0,1]] — each output phase
        reads 2 distinct input pixels per dim with tap weights pre-summed).
        This is exactly the conv-input-gradient shape XLA's TPU backend
        already lowers well, so the FLOP cut arrives WITHOUT the relayout:
        MEASURED clamp+synth 97.8 -> 83.5 ms at B=64/256px (full bench
        385.5 -> 420 img/s class). The zero-stuffed positions are skipped by
        the backend's phase handling, not computed.

    Numerics across paths differ only by the f32 pre-summing of adjacent taps
    (folded BEFORE the compute-dtype cast, so bf16 sees one rounding where the
    naive path rounds each tap) — within oracle tolerance, tested bit-tight in
    f32 (tests/test_vqgan.py). The parameter tree is nn.Conv-compatible
    ({conv: {kernel, bias}}) in all paths; gradients flow through the fold, so
    training takes the same cut.
    """

    dtype: Any = jnp.float32
    fast: Any = None  # None -> FFVC_FAST_UPSAMPLE (default mode 2); tests override

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        k, bias = _Conv3x3Params(c, c, name="conv")()
        if self.fast is None:
            mode = _FAST_UPSAMPLE_MODE
        elif self.fast in (True, 1, "1"):
            mode = "1"
        elif self.fast in (False, 0, "0"):
            mode = "0"
        else:
            mode = str(self.fast)
        if mode not in ("0", "1", "2"):
            raise ValueError(
                f"Upsample fast={self.fast!r} resolves to unrecognized mode "
                f"{mode!r}; use 0 (reference graph), 1 (phase-decomposed), "
                "or 2 (lhs-dilated transposed conv, default)."
            )
        dn = ("NHWC", "HWIO", "NHWC")
        if mode == "0":
            u = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2).astype(self.dtype)
            out = jax.lax.conv_general_dilated(
                u, k.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=dn,
            )
            return out + bias.astype(self.dtype)
        if mode == "2":
            # transposed-conv form: NN2x + 3x3/pad1 == lhs-dilated (stride-2
            # zero-stuffed) conv with the 4x4 kernel K4[a,b] = F K F^T over tap
            # space, F = [[1,0,0],[1,1,0],[0,1,1],[0,0,1]] (each output phase
            # reads 2 distinct input pixels per dim with tap weights summed;
            # padding (2,2) makes output row U read xd[U-2..U+1]). Taps are
            # pre-summed in f32 before the compute-dtype cast, like mode 1.
            # This is XLA's native conv-input-gradient shape — the relayout
            # that sank mode 1 never materializes.
            fold = jnp.asarray(
                [[1.0, 0.0, 0.0], [1.0, 1.0, 0.0], [0.0, 1.0, 1.0], [0.0, 0.0, 1.0]],
                jnp.float32,
            )
            k4 = jnp.einsum("ai,ijuv,bj->abuv", fold, k.astype(jnp.float32), fold)
            out = _dilated_up(x.astype(self.dtype), k4.astype(self.dtype))
            return out + bias.astype(self.dtype)
        # K2[p,q,a,b,u,v] = sum_ij R[p,a,i] K[i,j,u,v] R[q,b,j]; output-channel
        # layout (p, q, v) so one conv computes all four phases
        k2 = jnp.einsum(
            "pai,ijuv,qbj->abupqv", _PHASE_FOLD, k.astype(jnp.float32), _PHASE_FOLD
        ).reshape(2, 2, c, 4 * c)
        pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(self.dtype)
        yf = jax.lax.conv_general_dilated(
            pad, k2.astype(self.dtype), (1, 1), "VALID", dimension_numbers=dn
        )  # (B, H+1, W+1, 4C); phase (p,q) lives at spatial offset (p,q)
        ph = yf.reshape(b, h + 1, w + 1, 2, 2, c)
        y00 = ph[:, 0:h, 0:w, 0, 0]
        y01 = ph[:, 0:h, 1 : w + 1, 0, 1]
        y10 = ph[:, 1 : h + 1, 0:w, 1, 0]
        y11 = ph[:, 1 : h + 1, 1 : w + 1, 1, 1]
        out = (
            jnp.stack([y00, y01, y10, y11], axis=3)
            .reshape(b, h, w, 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, 2 * h, 2 * w, c)
        )
        return out + bias.astype(self.dtype)


class Decoder(nn.Module):
    """taming's Decoder: z (B, S, S, z_channels) -> image (B, 16S, 16S, out_ch) in (-1, 1)."""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    resolution: int = 256
    z_channels: int = 256
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, deterministic=True):
        num_levels = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        # Attention placement is CONFIG-derived, exactly like taming: curr_res =
        # resolution // 2^(levels-1), independent of the actual latent grid size.
        # This is what makes vq_image_size=32 -> 512px work with the same released
        # weights — the trained attention blocks still run (on 32x32 features),
        # they are not skipped. Gating on z.shape would silently drop them.
        curr_res = self.resolution // (2 ** (num_levels - 1))

        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(block_in, self.dropout, self.dtype, name="mid_block_1")(
            h, deterministic
        )
        h = AttnBlock(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, self.dropout, self.dtype, name="mid_block_2")(
            h, deterministic
        )

        for i_level in reversed(range(num_levels)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(
                    block_out,
                    self.dropout,
                    self.dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(h, deterministic)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(self.dtype, name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(self.dtype, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        h = GroupNorm32(dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
        return h


class VQGAN(nn.Module):
    """Codebook + post_quant_conv + decoder. Only the decode path the reference uses.

    `decode_latent` == VQModel.decode (post_quant_conv then decoder); `codebook()`
    exposes the embedding table for the latent-bounds computation
    (z_min/z_max, /root/reference/main.py:645-646).
    """

    n_embed: int = 16384
    embed_dim: int = 256
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    resolution: int = 256
    z_channels: int = 256
    dropout: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        self.codebook_table = self.param(
            "codebook",
            nn.initializers.uniform(scale=2.0 / self.n_embed),
            (self.n_embed, self.embed_dim),
            jnp.float32,
        )
        self.post_quant_conv = nn.Conv(
            self.z_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
        )
        self.decoder = Decoder(
            ch=self.ch,
            out_ch=self.out_ch,
            ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions,
            resolution=self.resolution,
            z_channels=self.z_channels,
            dropout=self.dropout,
            dtype=self.dtype,
            name="decoder",
        )

    def codebook(self):
        return self.codebook_table

    def decode_latent(self, z_q, deterministic=True):
        h = self.post_quant_conv(z_q.astype(self.dtype))
        return self.decoder(h, deterministic)

    def decode_post_quant(self, h, deterministic=True):
        """Decoder only — `h` is already in post-quant space (the folded
        codebook path in `synth` computes post_quant_conv at lookup time)."""
        return self.decoder(h.astype(self.dtype), deterministic)

    def __call__(self, z_q, deterministic=True):
        return self.decode_latent(z_q, deterministic)


def make_vqgan(config: dict, dtype=jnp.float32) -> VQGAN:
    """Build a VQGAN from a `ddconfig`-style dict (registry.VQGAN_CONFIGS preset or
    a parsed taming yaml's model.params)."""
    return VQGAN(
        n_embed=int(config["n_embed"]),
        embed_dim=int(config["embed_dim"]),
        ch=int(config.get("ch", 128)),
        out_ch=int(config.get("out_ch", 3)),
        ch_mult=tuple(config.get("ch_mult", (1, 1, 2, 2, 4))),
        num_res_blocks=int(config.get("num_res_blocks", 2)),
        attn_resolutions=tuple(config.get("attn_resolutions", (16,))),
        resolution=int(config.get("resolution", 256)),
        z_channels=int(config.get("z_channels", 256)),
        dropout=float(config.get("dropout", 0.0)),
        dtype=dtype,
    )


@jax.custom_vjp
def _st_through_linear(z, value, w):
    """Forward `value`; backward routes the cotangent to `z` through the linear
    map `w` — i.e. d/dz = g @ w^T, exactly the adjoint of `(z @ w + b)`.

    This is the straight-through composition `post_quant_conv(vector_quantize(z))`
    collapsed into one op: vector_quantize's backward is identity to `z`
    (main.py:138) and a 1x1 conv's input-gradient is the channel matmul with
    the transposed kernel, so the composed cotangent is `g @ w^T` regardless of
    which codebook row the forward selected. `value`/`w` receive zeros (the
    VQGAN is frozen; callers pass them through stop_gradient anyway).
    """
    return value


def _st_through_linear_fwd(z, value, w):
    # zeros_like placeholders carry shape+dtype to the bwd rule as arrays
    # (dtype objects are not valid residual leaves); they fold to constants.
    return value, (w, jnp.zeros_like(z), jnp.zeros_like(value))


def _st_through_linear_bwd(res, g):
    w, z0, v0 = res
    dz = jnp.einsum("...o,co->...c", g, w).astype(z0.dtype)
    return dz, v0, jnp.zeros_like(w)


_st_through_linear.defvjp(_st_through_linear_fwd, _st_through_linear_bwd)


# FFVC_FOLD_PQC: 1 lets `synth` fold post_quant_conv (1x1) into the codebook
# when the token count is at least the codebook size — the conv is applied to
# the CODEBOOK once ((K, z_ch) rows, K=16384) and decoder inputs are looked up
# directly in post-quant space, deduplicating the per-token conv (B*S*S rows)
# down to K rows. Exact-arithmetic identical (f32 pinned; ~1 bf16 ulp at the
# decoder input from shape-dependent conv lowering — the mode-2-upsample
# deviation class); the straight-through gradient to z is the same `g @ W^T`
# the conv adjoint produces. Default 0 (the literal lookup-then-conv graph,
# main.py:140-143): MEASURED a small net LOSS on v5e even at its best case —
# 430.2 -> 429.3 img/s at B=128 (BENCH_NOTES.md round 5) — the deduped conv
# saves too few FLOPs to cover the extra table round-trip and the
# gather-after-conv dependency it introduces.
_FOLD_PQC = os.environ.get("FFVC_FOLD_PQC", "0")
if _FOLD_PQC not in ("0", "1"):
    raise ValueError(
        f"FFVC_FOLD_PQC={_FOLD_PQC!r} is not a recognized mode; use 0 (reference "
        "lookup-then-conv graph, default) or 1 (fold the 1x1 post_quant_conv "
        "into the codebook when tokens >= codebook size; measured slightly "
        "slower on v5e)."
    )


def synth(vqgan: VQGAN, params, z, *, use_pallas="auto", data_mesh=None, fold_pqc=None):
    """z (B, S, S, C) latent -> image (B, 16S, 16S, 3) in [0, 1].

    Parity with the reference's `synth` (/root/reference/main.py:140-143):
    vector_quantize (straight-through) -> decode -> (x+1)/2 -> clamp_with_grad.

    `data_mesh`: forwarded to the VQ index search — shard_maps the Pallas
    search over the 'data' axis on a DP mesh (the decoder itself partitions
    natively under GSPMD and needs no wrapping).

    `fold_pqc`: None resolves FFVC_FOLD_PQC (default 0 — measured slightly
    slower on v5e; see the _FOLD_PQC comment), whose auto gate folds only when
    the token count is at least the codebook size; explicit True/False force
    the folded / reference graph. When folded, the 1x1 post_quant_conv is
    applied to the CODEBOOK once instead of to every token; values match the
    unfolded graph exactly in f32 and to ~1 bf16 ulp at the decoder input, and
    the straight-through gradient to z is the same conv adjoint.
    """
    codebook = params["params"]["codebook"]
    if fold_pqc is None:
        n_tokens = 1
        for s in z.shape[:-1]:
            n_tokens *= s
        fold = _FOLD_PQC == "1" and n_tokens >= codebook.shape[0]
    else:
        fold = bool(fold_pqc)
    if fold:
        idx = quantize_indices(z, codebook, use_pallas=use_pallas, data_mesh=data_mesh)
        pq = params["params"]["post_quant_conv"]
        w = pq["kernel"].reshape(codebook.shape[-1], -1).astype(vqgan.dtype)
        # run the ACTUAL post_quant_conv over the codebook laid out as a
        # (1, K, 1, C) image — the same 1x1-conv op the unfolded graph runs per
        # token, so each folded row carries the conv's own per-row arithmetic
        # (not a dot re-association of it)
        kk, cc = codebook.shape
        folded = vqgan.apply(
            params,
            codebook.reshape(1, kk, 1, cc),
            method=lambda m, t: m.post_quant_conv(t.astype(m.dtype)),
        ).reshape(kk, -1)
        h_q = jnp.take(jax.lax.stop_gradient(folded), idx, axis=0)
        h = _st_through_linear(z, h_q, jax.lax.stop_gradient(w))
        x = vqgan.apply(params, h, method=vqgan.decode_post_quant)
    else:
        z_q = vector_quantize(z, codebook, use_pallas=use_pallas, data_mesh=data_mesh)
        x = vqgan.apply(params, z_q, method=vqgan.decode_latent)
    return clamp_with_grad((x + 1.0) / 2.0, 0.0, 1.0)


def latent_bounds(params):
    """Column-wise codebook min/max used for latent clamping (main.py:645-646, 763).

    The reference clamps with scalar z_min.min() / z_max.max(); return scalars.
    """
    cb = params["params"]["codebook"]
    return cb.min(), cb.max()
