"""VitGAN mapper family: self-modulated-LayerNorm transformer generators.

Semantics of the reference's Generator / SimpleGenerator (/root/reference/
vitgan.py:221-305) with their quirks preserved exactly for checkpoint parity:
  * SLN(hl, w) = gamma * w * LN(hl) + beta * w with SCALAR gamma/beta (vitgan.py:8-21);
  * attention scale is dim**-0.5 (NOT head_dim**-0.5, vitgan.py:65) and the packed
    qkv projection interleaves as '(d k h)' — head index fastest (vitgan.py:82);
  * the generator threads (x, hl) through blocks where x is the SLN modulation input
    and hl accumulates residuals (vitgan.py:132-135); x itself passes through
    unchanged until the final SLN;
  * Generator's head Linear(dim -> T*C) output (B, T, T*C) is viewed channel-major
    as (B, C, T, T) (vitgan.py:259) — T = initialize_size*8 tokens.

Outputs are NHWC latents (B, S, S, C).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class SLN(nn.Module):
    """Self-modulated LayerNorm with scalar gamma/beta (vitgan.py:8-21)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hl, w):
        gamma = self.param("gamma", nn.initializers.normal(1.0), (1, 1, 1), jnp.float32)
        beta = self.param("beta", nn.initializers.normal(1.0), (1, 1, 1), jnp.float32)
        ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")(
            hl.astype(jnp.float32)
        ).astype(self.dtype)
        g = gamma.astype(self.dtype)
        b = beta.astype(self.dtype)
        return g * w * ln + b * w


class VitGANAttention(nn.Module):
    """Einsum attention with the reference's packed-qkv interleave and dim**-0.5 scale."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, _ = x.shape
        h = self.num_heads
        dh = self.dim // h
        qkv = nn.Dense(3 * h * dh, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        # '(d k h)' unpack (vitgan.py:82): flat index = (d*3 + k)*h + h_i
        qkv = qkv.reshape(b, t, dh, 3, h)
        q = qkv[:, :, :, 0, :].transpose(0, 3, 1, 2)  # (b, h, t, dh)
        k = qkv[:, :, :, 1, :].transpose(0, 3, 1, 2)
        v = qkv[:, :, :, 2, :].transpose(0, 3, 1, 2)
        attn = jnp.einsum("bhid,bhjd->bhij", q, k) * (self.dim ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, h * dh)
        return nn.Dense(self.dim, dtype=self.dtype, name="w_out")(out)


class VitGANMLP(nn.Module):
    dim: int
    hidden: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="linear1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(x)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


class GEncoderBlock(nn.Module):
    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hl, x, deterministic=True):
        """Returns (x, hl_final) like vitgan.py:132-135."""
        h = SLN(self.dtype, name="norm1")(hl, x)
        h = VitGANAttention(self.dim, self.num_heads, self.dtype, name="attn")(h)
        hl_temp = nn.Dropout(self.dropout, deterministic=deterministic)(h) + hl
        h2 = SLN(self.dtype, name="norm2")(hl_temp, x)
        hl_final = (
            VitGANMLP(self.dim, self.dim * 4, self.dropout, self.dtype, name="mlp")(
                h2, deterministic
            )
            + hl_temp
        )
        return x, hl_final


class Generator(nn.Module):
    """VitGAN Generator (vitgan.py:221-260): T = initialize_size*8 tokens."""

    initialize_size: int
    input_dim: int
    dim: int = 384
    blocks: int = 6
    num_heads: int = 6
    dropout: float = 0.0
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, deterministic=True):
        """z: (B, input_dim) -> latent (B, T, T, C) NHWC with T = initialize_size*8."""
        t = self.initialize_size * 8
        b = z.shape[0]
        pos = self.param(
            "pos_emb1D", nn.initializers.normal(1.0), (t, self.dim), jnp.float32
        )
        x = nn.Dense(t * self.dim, dtype=self.dtype, name="mlp")(z.astype(self.dtype))
        x = x.reshape(b, t, self.dim)
        hl = jnp.broadcast_to(pos.astype(self.dtype), (b, t, self.dim))
        for i in range(self.blocks):
            x, hl = GEncoderBlock(
                self.dim, self.num_heads, self.dropout, self.dtype, name=f"block_{i}"
            )(hl, x, deterministic)
        x = SLN(self.dtype, name="sln_norm")(hl, x)
        x = nn.Dense(t * self.out_channels, dtype=self.dtype, name="w_out")(x)
        # channel-major view quirk (vitgan.py:259): (B, T, T*C) -> (B, C, T, T) -> NHWC
        x = x.reshape(b, self.out_channels, t, t)
        return x.transpose(0, 2, 3, 1)


class SimpleGenerator(nn.Module):
    """VitGAN SimpleGenerator (vitgan.py:262-305): size^2 tokens, per-token head."""

    size: int
    input_dim: int
    dim: int = 384
    blocks: int = 6
    num_heads: int = 6
    dropout: float = 0.0
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, deterministic=True):
        s = self.size
        t = s * s
        b = z.shape[0]
        pos = self.param(
            "pos_emb1D", nn.initializers.normal(1.0), (t, self.dim), jnp.float32
        )
        x = nn.Dense(t * self.dim, dtype=self.dtype, name="mlp")(z.astype(self.dtype))
        x = x.reshape(b, t, self.dim)
        inp = nn.Dense(t * self.dim, dtype=self.dtype, name="inp")(z.astype(self.dtype))
        # dim-major view quirk (vitgan.py:300): (B, dim, T) -> permute -> (B, T, dim)
        inp_emb = inp.reshape(b, self.dim, t).transpose(0, 2, 1)
        hl = inp_emb + pos.astype(self.dtype)
        for i in range(self.blocks):
            x, hl = GEncoderBlock(
                self.dim, self.num_heads, self.dropout, self.dtype, name=f"block_{i}"
            )(hl, x, deterministic)
        x = SLN(self.dtype, name="sln_norm")(hl, x)
        x = nn.Dense(self.out_channels, dtype=self.dtype, name="w_out")(x)
        return x.reshape(b, s, s, self.out_channels)
