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


# --------------------------------------------------------------------------
# Auxiliary VitGAN classes (reference vitgan.py:196-357). None of these are
# reachable from the reference's `train` entry point — the Discriminator is
# never constructed by main.py and both generators' SineLayer heads are
# commented out (vitgan.py:247-251) — but they are part of the module's public
# surface, so they are provided for completeness (a user porting code that
# instantiates them directly finds the same API here).


def _siren_kernel_init(is_first: bool, omega_0: float):
    """SIREN kernel init (vitgan.py:210-215): U(-1/in, 1/in) on the first
    layer, U(-sqrt(6/in)/omega, sqrt(6/in)/omega) after."""

    def init(rng, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = (1.0 / fan_in) if is_first else (6.0 / fan_in) ** 0.5 / omega_0
        return jax.random.uniform(rng, shape, dtype, -bound, bound)

    return init


def _torch_linear_bias_init(fan_in: int):
    """torch nn.Linear's default bias init, U(-1/sqrt(in), 1/sqrt(in)) — the
    SIREN init only resets the weight (vitgan.py:211-215)."""

    def init(rng, shape, dtype=jnp.float32):
        bound = fan_in ** -0.5
        return jax.random.uniform(rng, shape, dtype, -bound, bound)

    return init


class SineLayer(nn.Module):
    """SIREN layer: sin(omega_0 * (x @ W + b)) (vitgan.py:196-218)."""

    features: int
    is_first: bool = False
    omega_0: float = 30.0
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        y = nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=_siren_kernel_init(self.is_first, self.omega_0),
            bias_init=_torch_linear_bias_init(fan_in),
            name="linear",
        )(x)
        return jnp.sin(self.omega_0 * y)


class DiscriminatorAttention(nn.Module):
    """The `discriminator=True` branch of vitgan.Attention (vitgan.py:59-97):
    L2 (cdist) attention scores for Lipschitz-bounded discriminators, with the
    qkv weight renormalized to its construction-time spectral norm each
    forward.

    Functional spectral-norm semantics: torch REASSIGNS the parameter
    `w <- w * s0 / sigma_max(w)` on every forward, with `s0` captured at
    __init__ (vitgan.py:69-78; note torch keeps s0 from the RANDOM init even
    after load_state_dict, because it is a plain attribute). Here `s0` is the
    param `init_spect_norm`, seeded to sigma_max(kernel) by
    `init_discriminator_spectral_norms` (the factory/converter call it on the
    final kernel values, which is the deterministic version of torch's
    behavior), and the forward uses `w * s0 / sigma_max(w)` without mutation —
    the same fixed point torch's reassignment converges to.
    """

    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, _ = x.shape
        h = self.num_heads
        dh = self.dim // h
        kernel = self.param(
            "to_qkv_kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], 3 * h * dh),
            jnp.float32,
        )
        s0 = self.param(
            "init_spect_norm", nn.initializers.ones, (), jnp.float32
        )
        # sigma_max via SVD in f32 (the weight is (dim, 3*dim) — tiny next to
        # the attention matmuls; XLA hoists it out of any scan over batches)
        sigma = jnp.linalg.svd(kernel, compute_uv=False)[0]
        w = (kernel * (s0 / sigma)).astype(self.dtype)
        qkv = x @ w
        # '(d k h)' packed unpack, identical to the generator attention
        qkv = qkv.reshape(b, t, dh, 3, h)
        q = qkv[:, :, :, 0, :].transpose(0, 3, 1, 2)  # (b, h, t, dh)
        k = qkv[:, :, :, 1, :].transpose(0, 3, 1, 2)
        v = qkv[:, :, :, 2, :].transpose(0, 3, 1, 2)
        # torch.cdist(q, k, p=2): NON-squared euclidean distance, softmaxed
        # as-is with the dim**-0.5 scale (vitgan.py:88-92)
        q2 = jnp.sum(jnp.square(q), axis=-1, keepdims=True)
        k2 = jnp.sum(jnp.square(k), axis=-1)
        d2 = q2 + k2[:, :, None, :] - 2.0 * jnp.einsum("bhid,bhjd->bhij", q, k)
        attn = jnp.sqrt(jnp.maximum(d2.astype(jnp.float32), 0.0)) * (
            self.dim ** -0.5
        )
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, h * dh)
        return nn.Dense(self.dim, dtype=self.dtype, name="w_out")(out)


class DEncoderBlock(nn.Module):
    """Discriminator encoder block: pre-LN attention + MLP residuals
    (vitgan.py:100-117)."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        h = DiscriminatorAttention(self.dim, self.num_heads, self.dtype, name="attn")(h)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        x = x + VitGANMLP(self.dim, self.dim * 4, self.dropout, self.dtype, name="mlp")(
            h2, deterministic
        )
        return x


class Discriminator(nn.Module):
    """VitGAN Discriminator (vitgan.py:307-357): overlapping-patch ViT with a
    cls token and a sigmoid head.

    Input is NHWC (B, H, W, C) like the rest of this framework. Two reference
    quirks are replicated exactly, because they shape the parameter tree and
    the numerics:
      * the patch stride is `(H - patch)//8 + 1` per dim (vitgan.py:337-338),
        so the token count is fixed at 64 for any input size;
      * the flat patch view (vitgan.py:340-342) reinterprets the contiguous
        (B, C, nH, nW, p, p) buffer as (B, nH*nW, C*p*p) WITHOUT regrouping
        axes — tokens mix channel/row slices. Same row-major reinterpretation
        here (a plain reshape), bit-compatible with torch's `.view`.
      * pos_emb1D is allocated at (token_dim + 1, dim) but sliced to
        tokens + 1 rows (vitgan.py:326, 351).
    """

    patch_size: int = 8
    extend_size: int = 2
    dim: int = 384
    blocks: int = 6
    num_heads: int = 6
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, deterministic=True):
        p = self.patch_size + 2 * self.extend_size
        b, hh, ww, c = img.shape
        token_dim = c * p * p
        x = img.transpose(0, 3, 1, 2)  # NCHW for the unfold-order quirk
        sh = (hh - p) // 8 + 1
        sw = (ww - p) // 8 + 1
        nh = (hh - p) // sh + 1
        nw = (ww - p) // sw + 1
        ih = (jnp.arange(nh) * sh)[:, None] + jnp.arange(p)[None, :]
        iw = (jnp.arange(nw) * sw)[:, None] + jnp.arange(p)[None, :]
        a = jnp.take(x, ih.reshape(-1), axis=2).reshape(b, c, nh, p, ww)
        a = jnp.take(a, iw.reshape(-1), axis=4).reshape(b, c, nh, p, nw, p)
        patches = a.transpose(0, 1, 2, 4, 3, 5)  # (b, c, nh, nw, ph, pw)
        tokens = nh * nw
        flat = patches.reshape(b, tokens, token_dim)  # the .view quirk
        emb = nn.Dense(self.dim, dtype=self.dtype, name="project_patches")(
            flat.astype(self.dtype)
        )
        cls = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.dim), jnp.float32
        )
        pos = self.param(
            "pos_emb1D",
            nn.initializers.normal(1.0),
            (token_dim + 1, self.dim),
            jnp.float32,
        )
        emb = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.dim)), emb], axis=1
        )
        emb = emb + pos[: tokens + 1].astype(self.dtype)
        emb = nn.Dropout(self.dropout, deterministic=deterministic)(emb)
        for i in range(self.blocks):
            emb = DEncoderBlock(
                self.dim, self.num_heads, self.dropout, self.dtype, name=f"block_{i}"
            )(emb, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="head_norm")(
            emb[:, 0, :].astype(jnp.float32)
        ).astype(self.dtype)
        logits = nn.Dense(1, dtype=self.dtype, name="head")(h)
        return jax.nn.sigmoid(logits.astype(jnp.float32)).astype(self.dtype)


def init_discriminator_spectral_norms(params):
    """Seed every DiscriminatorAttention's `init_spect_norm` with the max
    singular value of its CURRENT to_qkv kernel (see DiscriminatorAttention
    docstring for why this is the deterministic reading of torch's
    construction-time capture). Returns a new param pytree."""
    import numpy as np

    def walk(tree):
        out = {}
        for key, val in tree.items():
            if isinstance(val, dict):
                if "to_qkv_kernel" in val and "init_spect_norm" in val:
                    val = dict(val)
                    sigma = np.linalg.svd(
                        np.asarray(val["to_qkv_kernel"], np.float32),
                        compute_uv=False,
                    )[0]
                    val["init_spect_norm"] = jnp.asarray(sigma, jnp.float32)
                    out[key] = val
                else:
                    out[key] = walk(val)
            else:
                out[key] = val
        return out

    return jax.tree_util.tree_map(lambda x: x, walk(dict(params)))
