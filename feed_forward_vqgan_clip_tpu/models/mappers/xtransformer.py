"""XTransformer mapper: causal decoder transformer over the latent token grid.

Capability parity with the reference's wrapper around lucidrains' x_transformers
ContinuousTransformerWrapper + Decoder (/root/reference/transformer.py:5-46),
including its three input modes:
  * initial_proj=True: Linear(input_dim -> S^2*dim) seeds all tokens (transformer.py:30-32);
  * initial_proj=False, add_input=True: the embedding is broadcast to all S^2
    positions (transformer.py:34-36);
  * initial_proj=False, add_input=False: the embedding is prepended as token 0 to
    S^2 zero tokens and dropped from the output (transformer.py:37-43).

Architecture note (documented deviation): the transformer stack here is a standard
pre-LN causal decoder with learned absolute position embeddings and GELU FF — the
same family x_transformers' default Decoder configures, but not weight-compatible
with lucidrains' internals. The released cc12m_256x16_xtransformer checkpoint needs
its own converter mapping (io/torch_import.py gates on this).
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.models.clip_vit import LayerNorm, MHSA


class DecoderBlock(nn.Module):
    heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        d = x.shape[-1]
        h = LayerNorm(self.dtype, name="ln_attn")(x)
        x = x + MHSA(self.heads, self.dtype, name="attn")(h, mask)
        h = LayerNorm(self.dtype, name="ln_ff")(x)
        h = nn.Dense(d * 4, dtype=self.dtype, name="ff1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(d, dtype=self.dtype, name="ff2")(h)
        return x + h


class XTransformer(nn.Module):
    input_dim: int
    image_size: int  # latent grid side S
    channels: int
    dim: int
    depth: int
    heads: int = 6
    initial_proj: bool = True
    add_input: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, deterministic=True):
        """z: (B, input_dim) -> latent (B, S, S, C) NHWC."""
        b = z.shape[0]
        s = self.image_size
        n = s * s
        z = z.astype(self.dtype)

        if self.initial_proj:
            h = nn.Dense(n * self.dim, dtype=self.dtype, name="proj")(z)
            h = h.reshape(b, n, self.dim)
            seq_len = n
        elif self.add_input:
            h = jnp.broadcast_to(z[:, None, :], (b, n, self.input_dim))
            seq_len = n
        else:
            zeros = jnp.zeros((b, n, self.input_dim), self.dtype)
            h = jnp.concatenate([z[:, None, :], zeros], axis=1)
            seq_len = n + 1

        if h.shape[-1] != self.dim:
            h = nn.Dense(self.dim, dtype=self.dtype, name="project_in")(h)

        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02), (seq_len, self.dim), jnp.float32
        )
        h = h + pos.astype(self.dtype)
        mask = jnp.triu(jnp.full((seq_len, seq_len), -jnp.inf, jnp.float32), k=1)
        for i in range(self.depth):
            h = DecoderBlock(self.heads, self.dropout, self.dtype, name=f"block_{i}")(
                h, mask, deterministic
            )
        h = LayerNorm(self.dtype, name="final_norm")(h)
        h = nn.Dense(self.channels, dtype=self.dtype, name="project_out")(h)
        if not self.initial_proj and not self.add_input:
            h = h[:, 1:]
        return h.reshape(b, s, s, self.channels)
