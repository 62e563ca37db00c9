"""Composed end-to-end torch-oracle parity: the FULL reference training graph
(/root/reference/main.py:715-837) at tiny scale as ONE oracle.

Every prior oracle pins a stage in isolation (tests/test_clip.py, test_vqgan.py,
test_mappers.py, test_augment.py); this one runs the whole chain — tokens ->
CLIP text encode -> mixer -> l2 -> latent clamp -> vector-quantize -> VQGAN
decode -> (x+1)/2 clamp -> tv -> pooled cutouts (augs neutralized via Cc,
noise_fac=0) -> CLIP image encode -> spherical losses -> total loss ->
BACKWARD to the mapper gradients — against the same graph built from torch
modules, with weights flowing through the REAL loaders (clip_model_path /
vqgan_checkpoint / build_frozen / io.torch_import). Composition bugs at stage
seams (dtype casts, cutn-major tiling vs the loss, clamp-inside-synth,
normalize-once-vs-twice of inp_feats) are exactly what the per-module tests
cannot see and this one does.

Torch references: the mixer is the reference's own module
(/root/reference/mlp_mixer_pytorch.py); the VQGAN decode stack reuses
tests/test_vqgan._TamingVQ; the CLIP towers and the straight-through /
cutout / loss glue are restated below from main.py:105-229, 733-831 (clip
and kornia are not in the image).
"""

import sys
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

sys.path.insert(0, "/root/reference")

from test_vqgan import _TamingVQ  # the taming decode-path oracle

from feed_forward_vqgan_clip_tpu.config import make_config
from feed_forward_vqgan_clip_tpu.models.mappers import build_mapper
from feed_forward_vqgan_clip_tpu.io import torch_import as ti
from feed_forward_vqgan_clip_tpu.ops.cutouts import MakeCutouts
from feed_forward_vqgan_clip_tpu.registry import CLIP_MEAN, CLIP_STD

# ---------------------------------------------------------------------------
# torch CLIP (OpenAI ViT layout, quick_gelu) — tiny registry config
# ---------------------------------------------------------------------------


class _TQuickGELU(torch.nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _TResBlock(torch.nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.attn = torch.nn.MultiheadAttention(d, heads)
        self.ln_1 = torch.nn.LayerNorm(d)
        self.mlp = torch.nn.Sequential(
            OrderedDict(
                [
                    ("c_fc", torch.nn.Linear(d, d * 4)),
                    ("gelu", _TQuickGELU()),
                    ("c_proj", torch.nn.Linear(d * 4, d)),
                ]
            )
        )
        self.ln_2 = torch.nn.LayerNorm(d)

    def forward(self, x, mask=None):
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, need_weights=False, attn_mask=mask)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class _TTransformer(torch.nn.Module):
    def __init__(self, width, layers, heads):
        super().__init__()
        self.resblocks = torch.nn.ModuleList(
            [_TResBlock(width, heads) for _ in range(layers)]
        )

    def forward(self, x, mask=None):
        for b in self.resblocks:
            x = b(x, mask)
        return x


class _TVisual(torch.nn.Module):
    def __init__(self, cfg):
        super().__init__()
        w, p = cfg["vision_width"], cfg["patch_size"]
        grid = cfg["image_size"] // p
        self.conv1 = torch.nn.Conv2d(3, w, p, stride=p, bias=False)
        self.class_embedding = torch.nn.Parameter(torch.randn(w))
        self.positional_embedding = torch.nn.Parameter(
            torch.randn(grid * grid + 1, w)
        )
        self.ln_pre = torch.nn.LayerNorm(w)
        self.transformer = _TTransformer(w, cfg["vision_layers"], cfg["vision_heads"])
        self.ln_post = torch.nn.LayerNorm(w)
        self.proj = torch.nn.Parameter(torch.randn(w, cfg["embed_dim"]))

    def forward(self, x):
        x = self.conv1(x)  # (B, w, g, g)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding.expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x).permute(1, 0, 2)  # LND
        x = self.transformer(x).permute(1, 0, 2)
        return self.ln_post(x[:, 0, :]) @ self.proj


class _TCLIP(torch.nn.Module):
    def __init__(self, cfg):
        super().__init__()
        tw, ctx = cfg["text_width"], cfg["context_length"]
        self.visual = _TVisual(cfg)
        self.token_embedding = torch.nn.Embedding(cfg["vocab_size"], tw)
        self.positional_embedding = torch.nn.Parameter(torch.randn(ctx, tw))
        self.transformer = _TTransformer(tw, cfg["text_layers"], cfg["text_heads"])
        self.ln_final = torch.nn.LayerNorm(tw)
        self.text_projection = torch.nn.Parameter(torch.randn(tw, cfg["embed_dim"]))
        self.logit_scale = torch.nn.Parameter(torch.tensor(4.6052))
        mask = torch.full((ctx, ctx), float("-inf")).triu_(1)
        self.register_buffer("attn_mask", mask, persistent=False)

    def encode_image(self, x):
        return self.visual(x)

    def encode_text(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding
        x = x.permute(1, 0, 2)
        x = self.transformer(x, self.attn_mask).permute(1, 0, 2)
        x = self.ln_final(x)
        return x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)] @ self.text_projection


# ---------------------------------------------------------------------------
# torch straight-through / synth / cutout / loss glue (main.py:105-229, 733-831)
# ---------------------------------------------------------------------------


class _ReplaceGrad(torch.autograd.Function):
    @staticmethod
    def forward(ctx, fwd, bwd):
        ctx.shape = bwd.shape
        return fwd

    @staticmethod
    def backward(ctx, g):
        return None, g.sum_to_size(ctx.shape)


class _ClampWithGrad(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x, lo, hi):
        ctx.lo, ctx.hi = lo, hi
        ctx.save_for_backward(x)
        return x.clamp(lo, hi)

    @staticmethod
    def backward(ctx, g):
        (x,) = ctx.saved_tensors
        return g * (g * (x - x.clamp(ctx.lo, ctx.hi)) >= 0), None, None


def _t_vector_quantize(x, codebook):
    d = (
        x.pow(2).sum(dim=-1, keepdim=True)
        + codebook.pow(2).sum(dim=1)
        - 2 * x @ codebook.T
    )
    idx = d.argmin(-1)
    x_q = F.one_hot(idx, codebook.shape[0]).to(d.dtype) @ codebook
    return _ReplaceGrad.apply(x_q, x)


def _t_synth(tvq, z):
    z_q = _t_vector_quantize(z.movedim(1, 3), tvq.quantize.embedding.weight).movedim(3, 1)
    return _ClampWithGrad.apply(tvq.decode(z_q).add(1).div(2), 0.0, 1.0)


def _t_pooled_cutouts(x, cutn, pool_size):
    cut = (
        F.adaptive_avg_pool2d(x, (pool_size, pool_size))
        + F.adaptive_max_pool2d(x, (pool_size, pool_size))
    ) / 2
    return cut.repeat(cutn, 1, 1, 1)  # Cc (CenterCrop p=1, same size) = identity


def _t_tv_loss(y):
    return 0.5 * (
        (y[:, :, 1:, :] - y[:, :, :-1, :]).abs().mean()
        + (y[:, :, :, 1:] - y[:, :, :, :-1]).abs().mean()
    )


def _t_spherical(h, e):
    return h.sub(e).norm(dim=-1).div(2).arcsin().pow(2).mul(2).mean()


# ---------------------------------------------------------------------------
# the composed test
# ---------------------------------------------------------------------------

VQ_CFG = dict(
    n_embed=32, embed_dim=8, z_channels=8, ch=8, ch_mult=(1, 2),
    num_res_blocks=1, attn_resolutions=(4,), resolution=8, out_ch=3,
)
BS, REPEAT, CUTN, S = 2, 2, 3, 4  # latent grid S = resolution // 2^(levels-1) = 4
L2_COEF, TV_COEF, IN_COEF = 0.1, 0.1, 0.5


@pytest.mark.slow
class TestComposedTorchOracle:
    @pytest.fixture(scope="class")
    def rigs(self, tmp_path_factory):
        """Build torch modules, save their checkpoints, load through the REAL
        framework paths, and return both graphs' ingredients."""
        from feed_forward_vqgan_clip_tpu.registry import CLIP_VIT_CONFIGS
        from feed_forward_vqgan_clip_tpu.train.loop import (
            build_frozen,
            make_train_step,
        )
        from mlp_mixer_pytorch import Mixer as TorchMixer

        tmp = tmp_path_factory.mktemp("e2e_oracle")
        torch.manual_seed(0)

        ccfg = CLIP_VIT_CONFIGS["tiny"]
        tclip = _TCLIP(ccfg).eval()
        with torch.no_grad():
            for p in tclip.parameters():
                p.normal_(0.0, 0.04)
        torch.save(tclip.state_dict(), str(tmp / "clip.pt"))

        tvq = _TamingVQ(VQ_CFG).eval()
        with torch.no_grad():
            for p in tvq.parameters():
                p.normal_(0.0, 0.2)
        torch.save({"state_dict": tvq.state_dict()}, str(tmp / "vq.ckpt"))

        cfg = make_config(
            clip_model="tiny",
            clip_model_path=str(tmp / "clip.pt"),
            vqgan_arch=dict(VQ_CFG),
            vqgan_checkpoint=str(tmp / "vq.ckpt"),
            model_type="mlp_mixer",
            dim=32, depth=2, dropout=0,
            vq_image_size=S,
            batch_size=BS, repeat=REPEAT, cutn=CUTN,
            lr=1e-3, epochs=1,
            compute_dtype="float32", aug_dtype="float32",
            noise_dim=0, seed=0,
            augs=["Cc"], noise_fac=0.0,  # deterministic cutouts (pool + identity)
            normalize_input=True, input_loss=True, input_loss_coef=IN_COEF,
            l2_coef=L2_COEF, tv_coef=TV_COEF,
            folder=str(tmp),
        )

        frozen = build_frozen(cfg, jnp.float32)
        mapper = build_mapper(dict(cfg), vq_channels=VQ_CFG["z_channels"], dtype=jnp.float32)

        tmix = TorchMixer(
            input_dim=32, image_size=S, channels=VQ_CFG["z_channels"],
            patch_size=1, dim=32, depth=2, dropout=0.0,
        ).eval()
        with torch.no_grad():
            for p in tmix.parameters():
                p.normal_(0.0, 0.1)
        params = ti.convert_mixer(
            {k: v.detach().numpy() for k, v in tmix.state_dict().items()}, depth=2
        )

        clip_size = frozen.perceptor.size
        make_cutouts = MakeCutouts(
            cut_size=clip_size, cutn=CUTN, augs=["Cc"], pool=True,
            pool_size=clip_size, noise_fac=0.0,
        )
        _, loss_fn = make_train_step(
            cfg, mapper, frozen, make_cutouts,
            inp_is_tokens=True, out_is_tokens=True, mesh=None,
        )

        g = np.random.default_rng(7)
        toks = np.zeros((BS, ccfg["context_length"]), np.int64)
        toks[:, 0] = 49406
        lengths = [5, 9]
        for i, ln in enumerate(lengths):
            toks[i, 1 : 1 + ln] = g.integers(2, 49000, size=ln)
            toks[i, 1 + ln] = 49407  # EOT: highest id -> argmax pooling site

        return dict(
            cfg=cfg, frozen=frozen, params=params, loss_fn=loss_fn,
            tclip=tclip, tvq=tvq, tmix=tmix, toks=toks, clip_size=clip_size,
        )

    def _torch_forward(self, r):
        """main.py:733-831 with the chain's exact term order; returns
        (loss, parts, xr, grads_sd)."""
        tclip, tvq, tmix = r["tclip"], r["tvq"], r["tmix"]
        toks = torch.tensor(r["toks"])
        mean = torch.tensor(CLIP_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(CLIP_STD).view(1, 3, 1, 1)

        tmix.zero_grad(set_to_none=True)
        inp_feats = tclip.encode_text(toks).float()
        inp_feats = F.normalize(inp_feats, dim=1)  # normalize_input
        out_feats = tclip.encode_text(toks).float()
        inp_feats = inp_feats.repeat(REPEAT, 1)
        out_feats = out_feats.repeat(REPEAT, 1)

        z = tmix(inp_feats).contiguous().view(REPEAT * BS, VQ_CFG["z_channels"], S, S)
        l2 = (z ** 2).mean()
        cb = tvq.quantize.embedding.weight
        z = _ClampWithGrad.apply(z, cb.min().item(), cb.max().item())
        xr = _t_synth(tvq, z)
        tv = _t_tv_loss(xr)

        x = _t_pooled_cutouts(xr, CUTN, r["clip_size"])
        x = (x - mean) / std
        embed = F.normalize(tclip.encode_image(x).float(), dim=1)

        H = F.normalize(
            out_feats.repeat(CUTN, 1).view(CUTN, REPEAT, BS, -1), dim=-1
        ).view(CUTN * REPEAT * BS, -1)
        dists = 1.0 * _t_spherical(H, embed)
        Hi = F.normalize(
            inp_feats.repeat(CUTN, 1).view(CUTN, REPEAT, BS, -1), dim=-1
        ).view(CUTN * REPEAT * BS, -1)
        dists = dists + IN_COEF * _t_spherical(Hi, embed)

        loss = dists + L2_COEF * l2 + TV_COEF * tv
        loss.backward()
        grads_sd = {
            k: p.grad.detach().numpy() for k, p in tmix.named_parameters()
        }
        return loss, dict(dists=dists, l2=l2, tv=tv), xr, grads_sd

    def test_full_chain_forward_and_backward(self, rigs):
        r = rigs
        t_loss, t_parts, t_xr, t_grads_sd = self._torch_forward(r)

        fz = {"clip": r["frozen"].perceptor.params, "vq": r["frozen"].vq_params}
        batch = {
            "inp": jnp.asarray(r["toks"], jnp.int32),
            "out": jnp.asarray(r["toks"], jnp.int32),
        }
        (j_loss, metrics), j_grads = jax.value_and_grad(
            r["loss_fn"], has_aux=True
        )(r["params"], fz, batch, jax.random.PRNGKey(0))

        # (b) total loss + each term
        np.testing.assert_allclose(
            float(j_loss), float(t_loss.detach()), rtol=0, atol=5e-4
        )
        np.testing.assert_allclose(
            float(metrics["dists"]), float(t_parts["dists"].detach()), atol=5e-4
        )
        np.testing.assert_allclose(
            float(metrics["l2"]), float(t_parts["l2"].detach()), atol=1e-5
        )
        np.testing.assert_allclose(
            float(metrics["tv"]), float(t_parts["tv"].detach()), atol=1e-5
        )

        # (c) mapper GRADIENTS: run the torch grads through the SAME layout
        # converter as the weights (pure transposes/reshapes, so it maps
        # cotangents identically) and compare tree-leaf by tree-leaf
        want = ti.convert_mixer(t_grads_sd, depth=2)
        got_flat, got_tree = jax.tree.flatten(j_grads)
        want_flat, want_tree = jax.tree.flatten(want)
        assert got_tree == want_tree
        for gw, ww in zip(got_flat, want_flat):
            scale = max(1e-3, float(np.abs(np.asarray(ww)).max()))
            np.testing.assert_allclose(
                np.asarray(gw), np.asarray(ww), atol=5e-3 * scale,
                err_msg="mapper gradient mismatch",
            )

    def test_generated_image_parity(self, rigs):
        """(a) the rendered image itself (pre-cutout seam) matches torch."""
        r = rigs
        _, _, t_xr, _ = self._torch_forward(r)

        from feed_forward_vqgan_clip_tpu.models.vqgan import (
            latent_bounds,
            synth,
        )
        from feed_forward_vqgan_clip_tpu.ops.grad_ops import clamp_with_grad
        from feed_forward_vqgan_clip_tpu.ops.losses import normalize

        fz_clip = r["frozen"].perceptor.params
        pc = r["frozen"].perceptor
        toks = jnp.asarray(r["toks"], jnp.int32)
        feats = pc.module.apply(fz_clip, toks, method=pc.module.encode_text)
        feats = normalize(feats.astype(jnp.float32))
        feats = jnp.tile(feats, (REPEAT, 1))
        mapper_out = build_mapper(
            dict(r["cfg"]), vq_channels=VQ_CFG["z_channels"], dtype=jnp.float32
        ).apply(r["params"], feats)
        lo, hi = latent_bounds(r["frozen"].vq_params)
        zc = clamp_with_grad(mapper_out, lo, hi)
        xr = synth(r["frozen"].vq_module, r["frozen"].vq_params, zc)
        want = np.transpose(t_xr.detach().numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(xr), want, atol=2e-4)
