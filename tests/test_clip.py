"""CLIP encoder tests: MHSA parity vs torch.nn.MultiheadAttention through the
converter's packed-in_proj split, causal masking, EOT pooling, full-model shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from feed_forward_vqgan_clip_tpu.io import torch_import as ti
from feed_forward_vqgan_clip_tpu.models.clip_vit import (
    CLIP,
    MHSA,
    TextTransformer,
    VisionTransformer,
    make_clip,
    quick_gelu,
)

TINY = dict(
    image_size=32, patch_size=8, vision_width=64, vision_layers=2, vision_heads=4,
    embed_dim=16, text_width=32, text_layers=2, text_heads=2, vocab_size=100,
    context_length=12,
)


class TestMHSAParity:
    def test_matches_torch_multihead_attention(self, rng):
        d, heads, b, t = 32, 4, 2, 7
        tattn = torch.nn.MultiheadAttention(d, heads, batch_first=True)
        sd = {f"a.{k}": v.detach().numpy() for k, v in tattn.state_dict().items()}
        params = {"params": ti._mhsa(sd, "a")}
        x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
        got = MHSA(heads=heads).apply(params, x)
        xt = torch.tensor(np.asarray(x))
        want, _ = tattn(xt, xt, xt, need_weights=False)
        np.testing.assert_allclose(got, want.detach().numpy(), atol=1e-5)

    def test_causal_mask_matches_torch(self, rng):
        d, heads, b, t = 16, 2, 1, 5
        tattn = torch.nn.MultiheadAttention(d, heads, batch_first=True)
        sd = {f"a.{k}": v.detach().numpy() for k, v in tattn.state_dict().items()}
        params = {"params": ti._mhsa(sd, "a")}
        x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
        mask = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
        got = MHSA(heads=heads).apply(params, x, mask)
        xt = torch.tensor(np.asarray(x))
        tmask = torch.triu(torch.full((t, t), float("-inf")), diagonal=1)
        want, _ = tattn(xt, xt, xt, attn_mask=tmask, need_weights=False)
        np.testing.assert_allclose(got, want.detach().numpy(), atol=1e-5)


class TestQuickGELU:
    def test_value(self):
        x = jnp.linspace(-3, 3, 13)
        want = np.asarray(x) * (1 / (1 + np.exp(-1.702 * np.asarray(x))))
        np.testing.assert_allclose(quick_gelu(x), want, rtol=1e-6)


class TestTextTransformer:
    def _tokens(self, vocab, ctx, lengths):
        toks = np.zeros((len(lengths), ctx), np.int32)
        for i, ln in enumerate(lengths):
            toks[i, 0] = vocab - 2  # sot
            toks[i, 1 : ln + 1] = np.arange(1, ln + 1)
            toks[i, ln + 1] = vocab - 1  # eot (max id)
        return jnp.asarray(toks)

    def test_tokens_after_eot_do_not_change_embedding(self):
        tt = TextTransformer(
            context_length=12, vocab_size=100, width=32, layers=2, heads=2, embed_dim=16
        )
        toks = self._tokens(100, 12, [4])
        params = tt.init(jax.random.PRNGKey(0), toks)
        e1 = tt.apply(params, toks)
        toks2 = np.asarray(toks).copy()
        toks2[0, 7] = 55  # junk beyond eot — causally masked from the eot position
        e2 = tt.apply(params, jnp.asarray(toks2))
        np.testing.assert_allclose(e1, e2, atol=1e-5)

    def test_eot_pooling_varies_with_length(self):
        tt = TextTransformer(
            context_length=12, vocab_size=100, width=32, layers=2, heads=2, embed_dim=16
        )
        toks = self._tokens(100, 12, [3, 6])
        params = tt.init(jax.random.PRNGKey(0), toks)
        e = tt.apply(params, toks)
        assert e.shape == (2, 16)
        assert not np.allclose(e[0], e[1])


class TestFullModel:
    def test_shapes_and_dtypes(self, rng):
        clip = CLIP(**TINY)
        toks = jnp.zeros((2, 12), jnp.int32).at[:, 0].set(98).at[:, 5].set(99)
        imgs = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        params = clip.init(jax.random.PRNGKey(0), toks, imgs)
        te, ie = clip.apply(params, toks, imgs)
        assert te.shape == (2, 16) and ie.shape == (2, 16)
        assert te.dtype == jnp.float32 and ie.dtype == jnp.float32
        scale = float(jnp.exp(params["params"]["logit_scale"]))
        assert 99 < scale < 101  # exp(4.6052) ~ 100

    def test_encode_methods(self, rng):
        clip = CLIP(**TINY)
        toks = jnp.zeros((1, 12), jnp.int32).at[:, 0].set(98).at[:, 3].set(99)
        imgs = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
        params = clip.init(jax.random.PRNGKey(0), toks, imgs)
        ie = clip.apply(params, imgs, method=clip.encode_image)
        te = clip.apply(params, toks, method=clip.encode_text)
        assert ie.shape == te.shape == (1, 16)

    def test_registry_builders(self):
        m = make_clip("ViT-B/32")
        assert m.patch_size == 32 and m.embed_dim == 512 and m.act == "quick_gelu"
        m = make_clip("openclip/ViT-B-32/laion2b_e16")
        assert m.act == "gelu"
        m = make_clip("openclip/ViT-B-32-quickgelu/laion400m_e32")
        assert m.act == "quick_gelu"


class TestConverterRoundtrip:
    def test_convert_clip_vit_structure(self, rng):
        """Build a fake OpenAI-style state dict for the TINY config; converted params
        must apply cleanly (structure agreement between converter and model)."""
        cfg = TINY
        d, layers = cfg["vision_width"], cfg["vision_layers"]
        td, tlayers = cfg["text_width"], cfg["text_layers"]
        grid = cfg["image_size"] // cfg["patch_size"]
        g = lambda *s: rng.normal(size=s).astype(np.float32)

        sd = {
            "visual.conv1.weight": g(d, 3, cfg["patch_size"], cfg["patch_size"]),
            "visual.class_embedding": g(d),
            "visual.positional_embedding": g(grid * grid + 1, d),
            "visual.ln_pre.weight": g(d), "visual.ln_pre.bias": g(d),
            "visual.ln_post.weight": g(d), "visual.ln_post.bias": g(d),
            "visual.proj": g(d, cfg["embed_dim"]),
            "token_embedding.weight": g(cfg["vocab_size"], td),
            "positional_embedding": g(cfg["context_length"], td),
            "ln_final.weight": g(td), "ln_final.bias": g(td),
            "text_projection": g(td, cfg["embed_dim"]),
            "logit_scale": np.float32(4.6052),
        }
        for pre, dd, nl in [("visual.transformer", d, layers), ("transformer", td, tlayers)]:
            for i in range(nl):
                p = f"{pre}.resblocks.{i}"
                sd.update({
                    f"{p}.ln_1.weight": g(dd), f"{p}.ln_1.bias": g(dd),
                    f"{p}.attn.in_proj_weight": g(3 * dd, dd),
                    f"{p}.attn.in_proj_bias": g(3 * dd),
                    f"{p}.attn.out_proj.weight": g(dd, dd),
                    f"{p}.attn.out_proj.bias": g(dd),
                    f"{p}.ln_2.weight": g(dd), f"{p}.ln_2.bias": g(dd),
                    f"{p}.mlp.c_fc.weight": g(4 * dd, dd), f"{p}.mlp.c_fc.bias": g(4 * dd),
                    f"{p}.mlp.c_proj.weight": g(dd, 4 * dd), f"{p}.mlp.c_proj.bias": g(dd),
                })

        params = ti.convert_clip_vit(sd)
        clip = CLIP(**cfg)
        toks = jnp.zeros((1, cfg["context_length"]), jnp.int32).at[:, 1].set(99)
        imgs = jnp.zeros((1, 32, 32, 3), jnp.float32)
        # structural agreement: converted params must match the init structure
        ref = clip.init(jax.random.PRNGKey(0), toks, imgs)
        ref_paths = set(jax.tree_util.tree_flatten_with_path(ref)[0][i][0] .__repr__() for i in range(len(jax.tree.leaves(ref))))
        got_paths = set(jax.tree_util.tree_flatten_with_path(params)[0][i][0].__repr__() for i in range(len(jax.tree.leaves(params))))
        assert ref_paths == got_paths
        te, ie = clip.apply(params, toks, imgs)
        assert np.isfinite(np.asarray(te)).all() and np.isfinite(np.asarray(ie)).all()

    def _fake_openai_sd(self, rng):
        cfg = TINY
        d, layers = cfg["vision_width"], cfg["vision_layers"]
        td, tlayers = cfg["text_width"], cfg["text_layers"]
        grid = cfg["image_size"] // cfg["patch_size"]
        g = lambda *s: rng.normal(size=s).astype(np.float32)
        sd = {
            "visual.conv1.weight": g(d, 3, cfg["patch_size"], cfg["patch_size"]),
            "visual.class_embedding": g(d),
            "visual.positional_embedding": g(grid * grid + 1, d),
            "visual.ln_pre.weight": g(d), "visual.ln_pre.bias": g(d),
            "visual.ln_post.weight": g(d), "visual.ln_post.bias": g(d),
            "visual.proj": g(d, cfg["embed_dim"]),
            "token_embedding.weight": g(cfg["vocab_size"], td),
            "positional_embedding": g(cfg["context_length"], td),
            "ln_final.weight": g(td), "ln_final.bias": g(td),
            "text_projection": g(td, cfg["embed_dim"]),
            "logit_scale": np.float32(4.6052),
        }
        for pre, dd, nl in [("visual.transformer", d, layers), ("transformer", td, tlayers)]:
            for i in range(nl):
                p = f"{pre}.resblocks.{i}"
                sd.update({
                    f"{p}.ln_1.weight": g(dd), f"{p}.ln_1.bias": g(dd),
                    f"{p}.attn.in_proj_weight": g(3 * dd, dd),
                    f"{p}.attn.in_proj_bias": g(3 * dd),
                    f"{p}.attn.out_proj.weight": g(dd, dd),
                    f"{p}.attn.out_proj.bias": g(dd),
                    f"{p}.ln_2.weight": g(dd), f"{p}.ln_2.bias": g(dd),
                    f"{p}.mlp.c_fc.weight": g(4 * dd, dd), f"{p}.mlp.c_fc.bias": g(4 * dd),
                    f"{p}.mlp.c_proj.weight": g(dd, 4 * dd), f"{p}.mlp.c_proj.bias": g(dd),
                })
        return sd

    def test_openclip_naming_variants(self, rng):
        """open_clip checkpoint layouts (reference main.py:1323-1329): DDP
        'module.' prefixes and CustomTextCLIP 'text.'-nested text towers must
        convert to the SAME params as the OpenAI layout."""
        sd = self._fake_openai_sd(rng)
        want = ti.convert_clip_vit(dict(sd))

        ddp = {f"module.{k}": v for k, v in sd.items()}
        got = ti.convert_clip_vit(ddp)
        assert jax.tree.all(jax.tree.map(np.array_equal, got, want))

        text_keys = (
            "token_embedding.weight", "positional_embedding", "ln_final.weight",
            "ln_final.bias", "text_projection",
        )
        custom = {
            (f"text.{k}" if k.startswith(("transformer.",)) or k in text_keys else k): v
            for k, v in sd.items()
        }
        got = ti.convert_clip_vit(custom)
        assert jax.tree.all(jax.tree.map(np.array_equal, got, want))


class TestArchSniffAndOpenCLIPRouting:
    """Arbitrary `openclip/<arch>/<tag>` coverage (reference main.py:1323-1329
    hands any arch to open_clip): known archs resolve from the registry; archs
    outside it are sniffed from the checkpoint's shapes."""

    def test_sniff_vit_recovers_config(self, rng):
        sd = TestConverterRoundtrip()._fake_openai_sd(rng)
        family, cfg = ti.sniff_clip_arch(sd)
        assert family == "vit"
        for k in (
            "image_size", "patch_size", "vision_width", "vision_layers",
            "embed_dim", "text_width", "text_layers", "vocab_size",
            "context_length",
        ):
            assert cfg[k] == TINY[k], k

    def test_unknown_vit_arch_sniffed_from_checkpoint(self, rng, tmp_path):
        from feed_forward_vqgan_clip_tpu.models.perceptor import load_perceptor

        sd = TestConverterRoundtrip()._fake_openai_sd(rng)
        p = tmp_path / "vit_h.pt"
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, str(p))
        pc = load_perceptor("openclip/ViT-H-14/laion2b_s32b_b79k", str(p), dtype=jnp.float32)
        assert pc.module.act == "gelu"  # non-quickgelu tag
        assert pc.module.image_size == TINY["image_size"]
        toks = jnp.zeros((1, TINY["context_length"]), jnp.int32).at[:, 1].set(99)
        imgs = jnp.zeros((1, 32, 32, 3), jnp.float32)
        te, ie = pc.encode_text(toks), pc.encode_image(imgs)
        assert te.shape == ie.shape == (1, TINY["embed_dim"])
        assert np.isfinite(np.asarray(te)).all() and np.isfinite(np.asarray(ie)).all()

    def test_unknown_arch_without_path_is_actionable(self):
        import pytest

        from feed_forward_vqgan_clip_tpu.models.perceptor import load_perceptor

        with pytest.raises(ValueError, match="clip_model_path"):
            make_clip("ViT-H/14")
        with pytest.raises(ValueError, match="sniffed"):
            load_perceptor("openclip/ViT-H-14/laion2b_s32b_b79k")
        with pytest.raises(ValueError, match="openclip/<arch>/<pretrained_tag>"):
            load_perceptor("openclip/justanarch")


class TestPatchEmbed:
    def test_matches_nn_conv(self):
        """The reshape+matmul patchify must equal the stride-p nn.Conv it
        replaced (same HWIO kernel), including non-square frames."""
        import flax.linen as nn

        from feed_forward_vqgan_clip_tpu.models.clip_vit import PatchEmbed

        rng = np.random.default_rng(0)
        for (h, w, p, width) in ((64, 64, 32, 16), (64, 96, 16, 8)):
            x = jnp.asarray(rng.normal(size=(2, h, w, 3)), jnp.float32)
            pe = PatchEmbed(width, p, jnp.float32)
            params = pe.init(jax.random.PRNGKey(1), x)
            conv = nn.Conv(width, (p, p), strides=(p, p), use_bias=False,
                           dtype=jnp.float32)
            got = pe.apply(params, x)
            want = conv.apply(
                {"params": {"kernel": params["params"]["kernel"]}}, x
            ).reshape(2, -1, width)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
            )
            assert params["params"]["kernel"].shape == (p, p, 3, width)
