"""VQGAN decoder tests: shapes, gradients, and numerics parity against torch
primitives with converted weights (validates the OIHW->HWIO / NCHW->NHWC conventions
that io/torch_import.py relies on for the released checkpoints)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from feed_forward_vqgan_clip_tpu.io import torch_import as ti
from feed_forward_vqgan_clip_tpu.models.vqgan import (
    AttnBlock,
    Decoder,
    ResnetBlock,
    Upsample,
    VQGAN,
    latent_bounds,
    make_vqgan,
    synth,
)

TINY = dict(
    n_embed=32, embed_dim=8, z_channels=8, ch=8, ch_mult=(1, 2),
    num_res_blocks=1, attn_resolutions=(4,), resolution=8, out_ch=3, dropout=0.0,
)


def _nchw(x):
    return torch.tensor(np.transpose(np.asarray(x), (0, 3, 1, 2)))


def _nhwc(t):
    return jnp.asarray(np.transpose(t.detach().numpy(), (0, 2, 3, 1)))


class TestPrimitivesParity:
    def test_conv3x3_matches_torch(self, rng):
        tconv = torch.nn.Conv2d(4, 6, 3, padding=1)
        x = jnp.asarray(rng.normal(size=(2, 5, 5, 4)), jnp.float32)
        import flax.linen as nn

        conv = nn.Conv(6, (3, 3), padding=1)
        params = {
            "params": {
                "kernel": ti.conv_kernel(tconv.weight.detach().numpy()),
                "bias": tconv.bias.detach().numpy(),
            }
        }
        got = conv.apply(params, x)
        want = _nhwc(tconv(_nchw(x)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_groupnorm_matches_torch(self, rng):
        tn = torch.nn.GroupNorm(2, 8, eps=1e-6)
        with torch.no_grad():
            tn.weight.normal_()
            tn.bias.normal_()
        x = jnp.asarray(rng.normal(size=(2, 3, 3, 8)), jnp.float32)
        import flax.linen as nn

        gn = nn.GroupNorm(num_groups=2, epsilon=1e-6)
        params = {
            "params": {
                "scale": tn.weight.detach().numpy(),
                "bias": tn.bias.detach().numpy(),
            }
        }
        np.testing.assert_allclose(
            gn.apply(params, x), _nhwc(tn(_nchw(x))), atol=1e-5
        )


def _torch_resnet_block(in_ch, out_ch):
    class TRB(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = torch.nn.GroupNorm(32 if in_ch >= 32 else in_ch, in_ch, eps=1e-6)
            self.conv1 = torch.nn.Conv2d(in_ch, out_ch, 3, padding=1)
            self.norm2 = torch.nn.GroupNorm(32 if out_ch >= 32 else out_ch, out_ch, eps=1e-6)
            self.conv2 = torch.nn.Conv2d(out_ch, out_ch, 3, padding=1)
            if in_ch != out_ch:
                self.nin_shortcut = torch.nn.Conv2d(in_ch, out_ch, 1)

        def forward(self, x):
            h = self.conv1(torch.nn.functional.silu(self.norm1(x)))
            h = self.conv2(torch.nn.functional.silu(self.norm2(h)))
            sc = self.nin_shortcut(x) if hasattr(self, "nin_shortcut") else x
            return sc + h

    return TRB()


class TestBlocksParity:
    @pytest.mark.parametrize("in_ch,out_ch", [(32, 32), (32, 64)])
    def test_resnet_block(self, rng, in_ch, out_ch):
        tb = _torch_resnet_block(in_ch, out_ch)
        sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
        params = {"params": ti._resnet_block({f"b.{k}": v for k, v in sd.items()}, "b")}
        x = jnp.asarray(rng.normal(size=(2, 4, 4, in_ch)), jnp.float32)
        got = ResnetBlock(out_ch).apply(params, x)
        want = _nhwc(tb(_nchw(x)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_attn_block(self, rng):
        c = 32

        class TAttn(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.norm = torch.nn.GroupNorm(32, c, eps=1e-6)
                self.q = torch.nn.Conv2d(c, c, 1)
                self.k = torch.nn.Conv2d(c, c, 1)
                self.v = torch.nn.Conv2d(c, c, 1)
                self.proj_out = torch.nn.Conv2d(c, c, 1)

            def forward(self, x):
                h = self.norm(x)
                q, k, v = self.q(h), self.k(h), self.v(h)
                b, cc, hh, ww = q.shape
                q = q.reshape(b, cc, hh * ww).permute(0, 2, 1)
                k = k.reshape(b, cc, hh * ww)
                w_ = torch.softmax(torch.bmm(q, k) * cc ** -0.5, dim=2)
                v = v.reshape(b, cc, hh * ww)
                out = torch.bmm(v, w_.permute(0, 2, 1)).reshape(b, cc, hh, ww)
                return x + self.proj_out(out)

        tb = TAttn()
        sd = {f"a.{k}": v.detach().numpy() for k, v in tb.state_dict().items()}
        params = {"params": ti._attn_block(sd, "a")}
        x = jnp.asarray(rng.normal(size=(2, 4, 4, c)), jnp.float32)
        got = AttnBlock().apply(params, x)
        want = _nhwc(tb(_nchw(x)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_upsample(self, rng):
        c = 8
        tconv = torch.nn.Conv2d(c, c, 3, padding=1)
        sd = {f"u.conv.{k}": v.detach().numpy() for k, v in tconv.state_dict().items()}
        params = {"params": {"conv": ti._conv(sd, "u.conv")}}
        x = jnp.asarray(rng.normal(size=(1, 3, 3, c)), jnp.float32)
        got = Upsample().apply(params, x)
        want = _nhwc(tconv(torch.nn.functional.interpolate(_nchw(x), scale_factor=2.0, mode="nearest")))
        assert got.shape == (1, 6, 6, c)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestVQGAN:
    def test_decode_shapes_and_upsampling_factor(self, rng):
        vq = make_vqgan(TINY)
        z = jnp.asarray(rng.normal(size=(2, 4, 4, 8)), jnp.float32)
        params = vq.init(jax.random.PRNGKey(0), z)
        x = vq.apply(params, z)
        # 2 levels -> one upsample -> 4 -> 8
        assert x.shape == (2, 8, 8, 3)

    def test_synth_range_and_grad(self, rng):
        vq = make_vqgan(TINY)
        z = jnp.asarray(rng.normal(size=(1, 4, 4, 8)), jnp.float32)
        params = vq.init(jax.random.PRNGKey(0), z)
        img = synth(vq, params, z, use_pallas=False)
        assert img.shape == (1, 8, 8, 3)
        assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0
        g = jax.grad(
            lambda zz: jnp.sum(synth(vq, params, zz, use_pallas=False))
        )(z)
        assert bool(jnp.isfinite(g).all())
        # straight-through: some gradient must reach the latent
        assert float(jnp.abs(g).max()) > 0

    def test_latent_bounds(self, rng):
        vq = make_vqgan(TINY)
        z = jnp.zeros((1, 4, 4, 8), jnp.float32)
        params = vq.init(jax.random.PRNGKey(0), z)
        lo, hi = latent_bounds(params)
        cb = params["params"]["codebook"]
        assert float(lo) == float(cb.min()) and float(hi) == float(cb.max())

    def test_f16_default_config_structure(self):
        from feed_forward_vqgan_clip_tpu.registry import VQGAN_CONFIGS

        vq = make_vqgan(VQGAN_CONFIGS["vqgan_imagenet_f16_16384"])
        assert vq.n_embed == 16384 and vq.embed_dim == 256
        assert tuple(vq.ch_mult) == (1, 1, 2, 2, 4)


class TestNormNumerics:
    def test_groupnorm_no_nan_on_near_constant_groups(self, rng):
        """E[x^2]-E[x]^2 cancellation regression: near-constant groups with a
        large mean must not NaN (variance clamped like flax)."""
        from feed_forward_vqgan_clip_tpu.models.vqgan import GroupNorm32

        x = jnp.full((2, 8, 8, 64), 50.0) + 1e-4 * jnp.asarray(
            rng.normal(size=(2, 8, 8, 64)), jnp.float32
        )
        gn = GroupNorm32()
        y = gn.apply(gn.init(jax.random.PRNGKey(0), x), x)
        assert bool(jnp.isfinite(y).all())

    def test_lean_layernorm_no_nan_on_near_constant_rows(self, rng):
        from feed_forward_vqgan_clip_tpu.models.mappers.mixer import LeanLayerNorm

        x = jnp.full((4, 16, 512), 40.0) + 1e-4 * jnp.asarray(
            rng.normal(size=(4, 16, 512)), jnp.float32
        )
        ln = LeanLayerNorm()
        y = ln.apply(ln.init(jax.random.PRNGKey(0), x), x)
        assert bool(jnp.isfinite(y).all())
