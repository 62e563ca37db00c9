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

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class MixerBlock(nn.Module):
    tokens: int
    dim: int
    expansion: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        # token mixing: LN over features, then FF along the token axis
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="token_norm")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
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
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="channel_norm")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
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
        for i in range(self.depth):
            h = MixerBlock(
                tokens=s * s,
                dim=self.dim,
                expansion=self.expansion,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"block_{i}",
            )(h, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_norm")(
            h.astype(jnp.float32)
        ).astype(self.dtype)
        h = nn.Dense(c, dtype=self.dtype, name="final_proj")(h)
        return h.reshape(b, s, s, c)
