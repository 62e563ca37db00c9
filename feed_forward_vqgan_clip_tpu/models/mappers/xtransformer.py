"""XTransformer mapper: causal decoder transformer over the latent token grid.

Weight-compatible reimplementation of the reference's wrapper around lucidrains'
x_transformers (pinned x-transformers==0.19.1 in the reference requirements)
`ContinuousTransformerWrapper` + `Decoder` (/root/reference/transformer.py:5-46),
including its three input modes:
  * initial_proj=True: Linear(input_dim -> S^2*dim) seeds all tokens (transformer.py:30-32);
  * initial_proj=False, add_input=True: the embedding is broadcast to all S^2
    positions (transformer.py:34-36);
  * initial_proj=False, add_input=False: the embedding is prepended as token 0 to
    S^2 zero tokens and dropped from the output (transformer.py:37-43).

x_transformers 0.19.1 semantics replicated exactly so the released
`cc12m_256x16_xtransformer_*.th` checkpoint converts
(io/torch_import.convert_xtransformer):
  * wrapper: project_in Linear (ALWAYS present — dim_in is passed either way),
    learned absolute positional embedding added post-projection, pre-LN decoder
    stack, wrapper-level final LayerNorm, project_out Linear;
  * attention: separate bias-free to_q/to_k/to_v, inner dim = heads * dim_head
    with dim_head DEFAULT 64 (independent of dim — the lucidrains default the
    reference never overrides), scale dim_head^-0.5, causal mask, to_out Linear
    with bias;
  * feed-forward: Linear(dim -> 4*dim) -> exact GELU -> dropout -> Linear.
Parity is pinned against a vendored minimal torch reimplementation in
tests/test_xtransformer_convert.py.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.models.clip_vit import LayerNorm


class XAttention(nn.Module):
    """x_transformers 0.19.1 Attention: bias-free q/k/v, fixed dim_head."""

    heads: int
    dim_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        b, n, d = x.shape
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x)
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, n, self.heads, self.dim_head)
        v = v.reshape(b, n, self.heads, self.dim_head)
        dots = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (self.dim_head ** -0.5)
        dots = dots.astype(jnp.float32) + mask
        attn = jax.nn.softmax(dots, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, inner)
        return nn.Dense(d, dtype=self.dtype, name="to_out")(out)


class DecoderBlock(nn.Module):
    heads: int
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        d = x.shape[-1]
        h = LayerNorm(self.dtype, name="ln_attn")(x)
        x = x + XAttention(self.heads, self.dim_head, self.dtype, name="attn")(h, mask)
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
    dim_head: int = 64  # x_transformers DEFAULT_DIM_HEAD; the reference never overrides
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

        # ContinuousTransformerWrapper always constructs project_in (dim_in is
        # passed in both branches of transformer.py:12-13), so a dim->dim Linear
        # IS applied in the initial_proj mode too.
        h = nn.Dense(self.dim, dtype=self.dtype, name="project_in")(h)

        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02), (seq_len, self.dim), jnp.float32
        )
        h = h + pos.astype(self.dtype)
        mask = jnp.triu(jnp.full((seq_len, seq_len), -jnp.inf, jnp.float32), k=1)
        for i in range(self.depth):
            h = DecoderBlock(
                self.heads, self.dim_head, self.dropout, self.dtype, name=f"block_{i}"
            )(h, mask, deterministic)
        h = LayerNorm(self.dtype, name="final_norm")(h)
        h = nn.Dense(self.channels, dtype=self.dtype, name="project_out")(h)
        if not self.initial_proj and not self.add_input:
            h = h[:, 1:]
        return h.reshape(b, s, s, self.channels)
