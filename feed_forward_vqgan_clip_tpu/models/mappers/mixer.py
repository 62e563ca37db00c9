"""MLP-Mixer mapper: CLIP embedding (+noise) -> VQGAN latent grid.

Semantics of the reference's `Mixer` (/root/reference/mlp_mixer_pytorch.py:70-91):
proj Linear(input_dim -> S*S*C) viewed CHANNEL-MAJOR as (C, S, S), rearranged to S^2
tokens of C features, Linear(C -> dim), `depth` blocks of [token-mix FF over S^2,
channel-mix FF over dim] with pre-LayerNorm residuals and expansion 4, final
LayerNorm, Linear(dim -> C) head. The channel-major view quirk is preserved exactly
so converted released checkpoints (cc12m *mlp_mixer*) reproduce.

TPU notes: token mixing is expressed as an einsum over the token axis — the same
contraction the reference routes through a size-1 Conv1d — so both mixing matmuls
land on the MXU with (S^2 x dim) operands. All shapes are static; the whole mapper
fuses into one XLA module.
"""

import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# Rematerialize mixer blocks in the backward pass instead of storing their
# hidden intermediates (~17 MB/block at train shapes). Measured perf-NEUTRAL
# on the flagship train step (198.5 vs 197.6 ms) — kept as a MEMORY knob for
# configs whose activations don't fit (e.g. larger batch x 512px), not a
# speed lever. Gradients are bit-identical to the plain path (tested).
_MIXER_REMAT = os.environ.get("FFVC_MIXER_REMAT", "0") not in ("", "0", "false")


def lean_layer_norm(x, scale, bias, dtype):
    """LayerNorm(eps=1e-5) with f32 statistics, compute-dtype activations.

    Shared by the flax module below and the Pallas fused-block path
    (ops/pallas/mixer_block.py) so the two stay numerically identical.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    # clamp f32 cancellation (can dip below -eps on near-constant rows; would
    # NaN the rsqrt — nn.LayerNorm clamps the same way)
    var = jnp.maximum(var, 0.0)
    inv = jax.lax.rsqrt(var + 1e-5)
    a = (inv * scale).astype(dtype)  # broadcast (..., 1)*(d,) -> (..., d)
    b = (bias - mean * inv * scale).astype(dtype)  # folded fully in f32
    return x.astype(dtype) * a + b


class LeanLayerNorm(nn.Module):
    """LayerNorm(eps=1e-5) with f32 statistics but compute-dtype activations.

    The stock pattern (cast to f32 -> LN -> cast back) materializes a full-size
    f32 copy of the (B, 256, 1024) activation twice per block in HBM — at the
    flagship mapper that is ~8-10 GB of avoidable traffic per batch. Here only
    the per-position mean/inv-std are f32; the big tensor is touched once with a
    fused x*A+B in the compute dtype. Param layout ({scale, bias}) is unchanged.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return lean_layer_norm(x, scale, bias, self.dtype)


class MixerBlock(nn.Module):
    tokens: int
    dim: int
    expansion: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        # token mixing: LN over features, then FF along the token axis, expressed
        # as einsums contracting the token dim — measured FASTER than explicit
        # transpose + minor-dim matmuls (305 vs 294 img/s on the flagship bench);
        # XLA's internal relayout beats materialized transposes here.
        h = LeanLayerNorm(self.dtype, name="token_norm")(x)
        t1 = self.param(
            "token_fc1",
            nn.initializers.lecun_normal(),
            (self.tokens, self.tokens * self.expansion),
            jnp.float32,
        )
        t1b = self.param(
            "token_fc1_bias", nn.initializers.zeros, (self.tokens * self.expansion,), jnp.float32
        )
        t2 = self.param(
            "token_fc2",
            nn.initializers.lecun_normal(),
            (self.tokens * self.expansion, self.tokens),
            jnp.float32,
        )
        t2b = self.param("token_fc2_bias", nn.initializers.zeros, (self.tokens,), jnp.float32)
        h = jnp.einsum("btd,te->bed", h, t1.astype(self.dtype)) + t1b.astype(self.dtype)[None, :, None]
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = jnp.einsum("bed,et->btd", h, t2.astype(self.dtype)) + t2b.astype(self.dtype)[None, :, None]
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        x = x + h

        # channel mixing
        h = LeanLayerNorm(self.dtype, name="channel_norm")(x)
        h = nn.Dense(self.dim * self.expansion, dtype=self.dtype, name="channel_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="channel_fc2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return x + h


class Mixer(nn.Module):
    input_dim: int
    image_size: int  # latent grid side S
    channels: int  # VQGAN z_channels
    dim: int
    depth: int
    expansion: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        """x: (B, input_dim) -> latent (B, S, S, C) NHWC."""
        b = x.shape[0]
        s, c = self.image_size, self.channels
        h = nn.Dense(s * s * c, dtype=self.dtype, name="proj")(x.astype(self.dtype))
        # channel-major view quirk (mlp_mixer_pytorch.py:86): (B, C, S, S) -> tokens
        h = h.reshape(b, c, s, s).transpose(0, 2, 3, 1).reshape(b, s * s, c)
        h = nn.Dense(self.dim, dtype=self.dtype, name="embed")(h)
        block_cls = (
            nn.remat(MixerBlock, static_argnums=(2,)) if _MIXER_REMAT else MixerBlock
        )
        for i in range(self.depth):
            h = block_cls(
                tokens=s * s,
                dim=self.dim,
                expansion=self.expansion,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"block_{i}",
            )(h, deterministic)
        h = LeanLayerNorm(self.dtype, name="final_norm")(h)
        h = nn.Dense(c, dtype=self.dtype, name="final_proj")(h)
        return h.reshape(b, s, s, c)
