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

    def test_upsample_fast_matches_naive(self, rng):
        """The phase-decomposed Upsample path (2x2 conv + pixel shuffle at
        16/36 of the FLOPs — models/vqgan.Upsample docstring) computes the
        SAME function as NN-2x + 3x3 conv: f32 outputs agree to tap-presum
        rounding, and grads to both kernel and input match."""
        c = 16
        x = jnp.asarray(rng.normal(size=(2, 7, 5, c)), jnp.float32)
        params = Upsample(fast=False).init(jax.random.PRNGKey(3), x)
        naive = Upsample(fast=False).apply(params, x)
        fast = Upsample(fast=True).apply(params, x)
        assert fast.shape == naive.shape == (2, 14, 10, c)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(naive), atol=1e-5, rtol=1e-5
        )

        def loss(mod, p, x):
            return jnp.sum(jnp.sin(mod.apply(p, x)))

        gp_n, gx_n = jax.grad(lambda p, x: loss(Upsample(fast=False), p, x), (0, 1))(params, x)
        gp_f, gx_f = jax.grad(lambda p, x: loss(Upsample(fast=True), p, x), (0, 1))(params, x)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_n), atol=1e-4)
        for a, b in zip(jax.tree.leaves(gp_f), jax.tree.leaves(gp_n)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_upsample_dilated_matches_naive(self, rng):
        """Mode 2 (round 4): NN-2x + 3x3/pad1 expressed as ONE lhs-dilated
        4x4 conv (K4 = F K F^T over tap space) — XLA's native transposed-conv
        shape, no phase slicing or pixel shuffle. Same function as naive."""
        c = 16
        x = jnp.asarray(rng.normal(size=(2, 7, 5, c)), jnp.float32)
        params = Upsample(fast=False).init(jax.random.PRNGKey(3), x)
        naive = Upsample(fast=False).apply(params, x)
        fast = Upsample(fast="2").apply(params, x)
        assert fast.shape == naive.shape == (2, 14, 10, c)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(naive), atol=1e-5, rtol=1e-5
        )

        def loss(mod, p, x):
            return jnp.sum(jnp.sin(mod.apply(p, x)))

        gp_n, gx_n = jax.grad(lambda p, x: loss(Upsample(fast=False), p, x), (0, 1))(params, x)
        gp_f, gx_f = jax.grad(lambda p, x: loss(Upsample(fast="2"), p, x), (0, 1))(params, x)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_n), atol=1e-4)
        for a, b in zip(jax.tree.leaves(gp_f), jax.tree.leaves(gp_n)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    @pytest.mark.parametrize("mode", [True, "2"])
    def test_upsample_fast_bf16(self, rng, mode):
        """bf16 compute: both fast paths fold taps in f32 BEFORE the bf16
        cast, so they stay within bf16 rounding of the naive bf16 path."""
        c = 16
        x = jnp.asarray(rng.normal(size=(1, 6, 6, c)), jnp.float32)
        params = Upsample(fast=False).init(jax.random.PRNGKey(4), x)
        naive = Upsample(fast=False, dtype=jnp.bfloat16).apply(params, x)
        fast = Upsample(fast=mode, dtype=jnp.bfloat16).apply(params, x)
        scale = float(jnp.max(jnp.abs(naive.astype(jnp.float32)))) + 1e-6
        diff = float(jnp.max(jnp.abs((fast - naive).astype(jnp.float32))))
        assert diff / scale < 0.05, (diff, scale)


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


# ---------------------------------------------------------------------------
# Full-decoder oracle: a complete taming-style torch VQGAN assembled in-test
# with taming's exact module tree (state-dict key layout `decoder.up.{level}.
# block.{i}`, per-level attention, `decoder.mid.*`, `post_quant_conv`,
# `quantize.embedding`), run end to end through `convert_vqgan`'s naming walk —
# the offline de-risking for the released-checkpoint path
# (/root/reference/main.py:84-103, 140-143).
# ---------------------------------------------------------------------------


def _torch_swish(x):
    return x * torch.sigmoid(x)


class _TResnetBlock(torch.nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        g = 32 if in_ch % 32 == 0 else in_ch
        self.norm1 = torch.nn.GroupNorm(g, in_ch, eps=1e-6)
        self.conv1 = torch.nn.Conv2d(in_ch, out_ch, 3, padding=1)
        g2 = 32 if out_ch % 32 == 0 else out_ch
        self.norm2 = torch.nn.GroupNorm(g2, out_ch, eps=1e-6)
        self.conv2 = torch.nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.use_nin = in_ch != out_ch
        if self.use_nin:
            self.nin_shortcut = torch.nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x):
        h = self.conv1(_torch_swish(self.norm1(x)))
        h = self.conv2(_torch_swish(self.norm2(h)))
        return (self.nin_shortcut(x) if self.use_nin else x) + h


class _TAttnBlock(torch.nn.Module):
    def __init__(self, ch):
        super().__init__()
        g = 32 if ch % 32 == 0 else ch
        self.norm = torch.nn.GroupNorm(g, ch, eps=1e-6)
        self.q = torch.nn.Conv2d(ch, ch, 1)
        self.k = torch.nn.Conv2d(ch, ch, 1)
        self.v = torch.nn.Conv2d(ch, ch, 1)
        self.proj_out = torch.nn.Conv2d(ch, ch, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        hn = self.norm(x)
        q = self.q(hn).reshape(b, c, h * w).permute(0, 2, 1)
        k = self.k(hn).reshape(b, c, h * w)
        attn = torch.softmax(torch.bmm(q, k) * c ** -0.5, dim=2)
        v = self.v(hn).reshape(b, c, h * w)
        out = torch.bmm(v, attn.permute(0, 2, 1)).reshape(b, c, h, w)
        return x + self.proj_out(out)


class _TUpsample(torch.nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = torch.nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(torch.nn.functional.interpolate(x, scale_factor=2.0, mode="nearest"))


class _TamingVQ(torch.nn.Module):
    """Minimal taming VQModel decode path with taming's module/key layout."""

    def __init__(self, cfg):
        super().__init__()
        ch, ch_mult = cfg["ch"], cfg["ch_mult"]
        nrb, attn_res = cfg["num_res_blocks"], cfg["attn_resolutions"]
        res, zc = cfg["resolution"], cfg["z_channels"]
        levels = len(ch_mult)
        self.quantize = torch.nn.Module()
        self.quantize.embedding = torch.nn.Embedding(cfg["n_embed"], cfg["embed_dim"])
        self.post_quant_conv = torch.nn.Conv2d(cfg["embed_dim"], zc, 1)
        dec = torch.nn.Module()
        block_in = ch * ch_mult[-1]
        dec.conv_in = torch.nn.Conv2d(zc, block_in, 3, padding=1)
        dec.mid = torch.nn.Module()
        dec.mid.block_1 = _TResnetBlock(block_in, block_in)
        dec.mid.attn_1 = _TAttnBlock(block_in)
        dec.mid.block_2 = _TResnetBlock(block_in, block_in)
        curr_res = res // (2 ** (levels - 1))
        dec.up = torch.nn.ModuleList([torch.nn.Module() for _ in range(levels)])
        self._attn_levels = set()
        for i_level in reversed(range(levels)):
            block_out = ch * ch_mult[i_level]
            blocks = torch.nn.ModuleList()
            attns = torch.nn.ModuleList()
            for _ in range(nrb + 1):
                blocks.append(_TResnetBlock(block_in, block_out))
                block_in = block_out
                if curr_res in attn_res:
                    attns.append(_TAttnBlock(block_in))
            dec.up[i_level].block = blocks
            if len(attns):
                dec.up[i_level].attn = attns
                self._attn_levels.add(i_level)
            if i_level != 0:
                dec.up[i_level].upsample = _TUpsample(block_in)
                curr_res *= 2
        g = 32 if block_in % 32 == 0 else block_in
        dec.norm_out = torch.nn.GroupNorm(g, block_in, eps=1e-6)
        dec.conv_out = torch.nn.Conv2d(block_in, cfg.get("out_ch", 3), 3, padding=1)
        self.decoder = dec
        self._levels = levels
        self._nrb = nrb

    def decode(self, z_q):
        h = self.decoder.conv_in(self.post_quant_conv(z_q))
        h = self.decoder.mid.block_2(self.decoder.mid.attn_1(self.decoder.mid.block_1(h)))
        for i_level in reversed(range(self._levels)):
            for i_block in range(self._nrb + 1):
                h = self.decoder.up[i_level].block[i_block](h)
                if i_level in self._attn_levels:
                    h = self.decoder.up[i_level].attn[i_block](h)
            if i_level != 0:
                h = self.decoder.up[i_level].upsample(h)
        return self.decoder.conv_out(_torch_swish(self.decoder.norm_out(h)))


class TestFullDecoderOracle:
    # two configs: single-attn-level 2-level, and a 3-level config with channel
    # changes + two attn levels to exercise every branch of the naming walk
    CFGS = [
        dict(n_embed=32, embed_dim=8, z_channels=8, ch=8, ch_mult=(1, 2),
             num_res_blocks=1, attn_resolutions=(4,), resolution=8, out_ch=3),
        dict(n_embed=16, embed_dim=4, z_channels=4, ch=4, ch_mult=(1, 2, 4),
             num_res_blocks=2, attn_resolutions=(4, 8), resolution=16, out_ch=3),
    ]

    def _oracle(self, cfg, mutate_sd=None):
        torch.manual_seed(0)
        tvq = _TamingVQ(cfg)
        with torch.no_grad():
            for p in tvq.parameters():
                p.normal_(0.0, 0.2)
        sd = {k: v.detach().numpy() for k, v in tvq.state_dict().items()}
        if mutate_sd:
            sd = mutate_sd(sd)
        params = ti.convert_vqgan(sd, cfg)
        vq = make_vqgan(cfg)

        rng = np.random.default_rng(3)
        s = cfg["resolution"] // (2 ** (len(cfg["ch_mult"]) - 1))
        z_q = rng.normal(size=(2, s, s, cfg["embed_dim"])).astype(np.float32)
        got = vq.apply(params, jnp.asarray(z_q), method=vq.decode_latent)
        with torch.no_grad():
            want = _nhwc(tvq.decode(_nchw(z_q)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
        # codebook came through for latent bounds
        np.testing.assert_allclose(
            np.asarray(params["params"]["codebook"]),
            tvq.quantize.embedding.weight.detach().numpy(),
        )

    @pytest.mark.parametrize("icfg", [0, 1])
    def test_full_decode_parity(self, icfg):
        self._oracle(self.CFGS[icfg])

    def test_gumbel_alias(self):
        """GumbelVQ names the codebook quantize.embed (main.py:94)."""

        def alias(sd):
            sd = dict(sd)
            sd["quantize.embed.weight"] = sd.pop("quantize.embedding.weight")
            return sd

        self._oracle(self.CFGS[0], mutate_sd=alias)

    def test_net2net_prefix(self):
        """Net2NetTransformer ckpts prefix everything with first_stage_model.
        (the reference loads the wrapper and takes .first_stage_model,
        main.py:95-99); convert_vqgan strips it."""

        def prefix(sd):
            return {f"first_stage_model.{k}": v for k, v in sd.items()}

        self._oracle(self.CFGS[1], mutate_sd=prefix)


class TestPostQuantFold:
    """FFVC_FOLD_PQC: synth's folded post_quant_conv (codebook-side 1x1 conv +
    post-quant lookup) vs the reference lookup-then-conv graph
    (main.py:140-143). Exact-arithmetic identical; f32 is pinned tight here,
    bf16 differs by ~1 ulp at the decoder input (shape-dependent conv
    lowering — the same deviation class as the mode-2 upsample tap presum)."""

    def _vq(self, dtype):
        return VQGAN(
            n_embed=64, embed_dim=8, ch=8, ch_mult=(1, 2), num_res_blocks=1,
            attn_resolutions=(4,), resolution=8, z_channels=8, dtype=dtype,
        )

    def _params(self, vq):
        p = vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8)))
        # unit-scale codebook: the default tiny-uniform init makes rows nearly
        # identical, which turns the decoder's GroupNorm into a difference
        # amplifier and the argmin into a tie-breaker stress test
        p["params"]["codebook"] = jax.random.normal(jax.random.PRNGKey(7), (64, 8))
        return p

    def test_f32_forward_and_grad_parity(self):
        vq = self._vq(jnp.float32)
        p = self._params(vq)
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8))

        def loss(q, fold):
            return jnp.sum(synth(vq, p, q, use_pallas=False, fold_pqc=fold) ** 2)

        x0 = synth(vq, p, z, use_pallas=False, fold_pqc=False)
        x1 = synth(vq, p, z, use_pallas=False, fold_pqc=True)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), atol=2e-6)
        g0 = jax.grad(lambda q: loss(q, False))(z)
        g1 = jax.grad(lambda q: loss(q, True))(z)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=0, atol=1e-4)

    def test_bf16_decoder_input_within_ulp(self):
        from feed_forward_vqgan_clip_tpu.ops.quantize import (
            quantize_indices,
            vector_quantize,
        )

        vq = self._vq(jnp.bfloat16)
        p = self._params(vq)
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8)).astype(jnp.bfloat16)
        cb = p["params"]["codebook"]
        zq = vector_quantize(z, cb, use_pallas=False)
        h_conv = vq.apply(p, zq, method=lambda m, t: m.post_quant_conv(t.astype(m.dtype)))
        idx = quantize_indices(z, cb, use_pallas=False)
        folded = vq.apply(
            p, cb.reshape(1, 64, 1, 8),
            method=lambda m, t: m.post_quant_conv(t.astype(m.dtype)),
        ).reshape(64, -1)
        h_fold = jnp.take(folded, idx, axis=0)
        a = np.asarray(h_conv, np.float32)
        b = np.asarray(h_fold, np.float32)
        # a handful of bf16 ulps relative to the value scale: the two paths run
        # the same conv arithmetic over the same rows, differing only in the
        # backend's shape-dependent reduction layout. rtol 2^-6 (4 mantissa
        # steps) with a small atol floor catches any real bug (wrong kernel
        # orientation, dropped bias, bad index) by orders of magnitude.
        np.testing.assert_allclose(b, a, rtol=2.0 ** -6, atol=0.02)

    def test_auto_gate_folds_only_at_codebook_scale(self, monkeypatch):
        # with FFVC_FOLD_PQC=1 the auto gate (fold_pqc=None) folds iff
        # tokens >= K; both sides of the gate must agree with the forced
        # reference graph (the shipping default is 0 — never fold)
        from feed_forward_vqgan_clip_tpu.models import vqgan as vqgan_mod

        monkeypatch.setattr(vqgan_mod, "_FOLD_PQC", "1")
        vq = self._vq(jnp.float32)
        p = self._params(vq)
        small = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 8))  # 16 < 64
        big = jax.random.normal(jax.random.PRNGKey(3), (8, 4, 4, 8))  # 128 >= 64
        for z in (small, big):
            x_auto = synth(vq, p, z, use_pallas=False)
            x_ref = synth(vq, p, z, use_pallas=False, fold_pqc=False)
            np.testing.assert_allclose(np.asarray(x_auto), np.asarray(x_ref), atol=2e-6)

    def test_grad_routes_only_to_z(self):
        # the straight-through fold must leave the frozen VQGAN params with
        # finite-and-zero cotangents (no NaN leaks through the custom VJP)
        vq = self._vq(jnp.float32)
        p = self._params(vq)
        z = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 4, 8))

        def loss(pp):
            return jnp.sum(synth(vq, pp, z, use_pallas=False, fold_pqc=True) ** 2)

        g = jax.grad(loss)(p)
        # the folded table and its weight are stop_gradient-ed: the VQ/conv
        # seam contributes exactly zero to them (decoder params still get
        # real grads through the decode)
        np.testing.assert_array_equal(
            np.asarray(g["params"]["post_quant_conv"]["kernel"]), 0.0
        )
        np.testing.assert_array_equal(np.asarray(g["params"]["codebook"]), 0.0)
