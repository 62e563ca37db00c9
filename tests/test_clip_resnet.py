"""ModifiedResNet + CLOOB backend tests: block-level torch parity and converter
structure (fake OpenAI-RN / CLOOB / haiku state dicts)."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from feed_forward_vqgan_clip_tpu.io import torch_import as ti
from feed_forward_vqgan_clip_tpu.models.clip_resnet import (
    AttentionPool2d,
    Bottleneck,
    CLIPResNet,
    FrozenBatchNorm,
)
from feed_forward_vqgan_clip_tpu.models.cloob import (
    CROWSON_CONFIGS,
    CrowsonCLOOB,
    convert_crowson_pickle,
    load_cloob,
)


def _nchw(x):
    return torch.tensor(np.transpose(np.asarray(x), (0, 3, 1, 2)))


def _nhwc(t):
    return jnp.asarray(np.transpose(t.detach().numpy(), (0, 2, 3, 1)))


class TestFrozenBN:
    def test_matches_torch_eval_bn(self, rng):
        tbn = torch.nn.BatchNorm2d(8).eval()
        with torch.no_grad():
            tbn.weight.normal_()
            tbn.bias.normal_()
            tbn.running_mean.normal_()
            tbn.running_var.uniform_(0.5, 2.0)
        sd = {f"b.{k}": v.numpy() for k, v in tbn.state_dict().items()}
        params = {"params": ti._frozen_bn(sd, "b")}
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)), jnp.float32)
        got = FrozenBatchNorm(8).apply(params, x)
        want = _nhwc(tbn(_nchw(x)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestBottleneckParity:
    @pytest.mark.parametrize("stride,in_ch", [(1, 128), (2, 32)])
    def test_matches_torch(self, rng, stride, in_ch):
        planes = 32

        class TB(torch.nn.Module):  # CLIP's Bottleneck structure
            def __init__(self):
                super().__init__()
                self.conv1 = torch.nn.Conv2d(in_ch, planes, 1, bias=False)
                self.bn1 = torch.nn.BatchNorm2d(planes)
                self.conv2 = torch.nn.Conv2d(planes, planes, 3, padding=1, bias=False)
                self.bn2 = torch.nn.BatchNorm2d(planes)
                self.avgpool = torch.nn.AvgPool2d(stride) if stride > 1 else torch.nn.Identity()
                self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
                self.bn3 = torch.nn.BatchNorm2d(planes * 4)
                if stride > 1 or in_ch != planes * 4:
                    self.downsample = torch.nn.Sequential(
                        torch.nn.AvgPool2d(stride) if stride > 1 else torch.nn.Identity(),
                        torch.nn.Conv2d(in_ch, planes * 4, 1, bias=False),
                        torch.nn.BatchNorm2d(planes * 4),
                    )

            def forward(self, x):
                out = torch.relu(self.bn1(self.conv1(x)))
                out = torch.relu(self.bn2(self.conv2(out)))
                out = self.avgpool(out)
                out = self.bn3(self.conv3(out))
                idn = self.downsample(x) if hasattr(self, "downsample") else x
                return torch.relu(out + idn)

        tb = TB().eval()
        with torch.no_grad():
            for m in tb.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.1)
                    m.running_var.uniform_(0.5, 2.0)
        sd = {f"visual.layer1.0.{k}": v.numpy() for k, v in tb.state_dict().items()}
        # torch Sequential indices here are 0 (identity/avgpool has no params),
        # 1 (conv), 2 (bn) — remap to CLIP's 0/1 naming used by the converter
        sd = {
            k.replace("downsample.1.", "downsample.0.").replace("downsample.2.", "downsample.1.")
            : v for k, v in sd.items()
        }
        params = {"params": ti._bottleneck(sd, "visual.layer1.0")}
        x = jnp.asarray(rng.normal(size=(2, 8, 8, in_ch)), jnp.float32)
        got = Bottleneck(planes, stride).apply(params, x)
        with torch.no_grad():
            want = _nhwc(tb(_nchw(x)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


class TestAttentionPool:
    def test_mean_query_shape_and_finite(self, rng):
        m = AttentionPool2d(heads=4, output_dim=16)
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 32)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == (2, 16)
        assert np.isfinite(np.asarray(out)).all()


def _fake_rn_state_dict(rng, cloob_layout=False):
    g = lambda *s: (0.1 * rng.normal(size=s)).astype(np.float32)
    w = 16  # vision width
    td, tl = 32, 2  # text width/layers
    sd = {}
    sd["visual.conv1.weight"] = g(w // 2, 3, 3, 3)
    sd["visual.conv2.weight"] = g(w // 2, w // 2, 3, 3)
    sd["visual.conv3.weight"] = g(w, w // 2, 3, 3)
    for bn, ch in (("bn1", w // 2), ("bn2", w // 2), ("bn3", w)):
        sd[f"visual.{bn}.weight"] = g(ch)
        sd[f"visual.{bn}.bias"] = g(ch)
        sd[f"visual.{bn}.running_mean"] = g(ch)
        sd[f"visual.{bn}.running_var"] = np.abs(g(ch)) + 0.5

    def bottleneck(prefix, in_ch, planes, stride):
        sd[f"{prefix}.conv1.weight"] = g(planes, in_ch, 1, 1)
        sd[f"{prefix}.conv2.weight"] = g(planes, planes, 3, 3)
        sd[f"{prefix}.conv3.weight"] = g(planes * 4, planes, 1, 1)
        for bn, ch in (("bn1", planes), ("bn2", planes), ("bn3", planes * 4)):
            sd[f"{prefix}.{bn}.weight"] = g(ch)
            sd[f"{prefix}.{bn}.bias"] = g(ch)
            sd[f"{prefix}.{bn}.running_mean"] = g(ch)
            sd[f"{prefix}.{bn}.running_var"] = np.abs(g(ch)) + 0.5
        if stride > 1 or in_ch != planes * 4:
            sd[f"{prefix}.downsample.0.weight"] = g(planes * 4, in_ch, 1, 1)
            sd[f"{prefix}.downsample.1.weight"] = g(planes * 4)
            sd[f"{prefix}.downsample.1.bias"] = g(planes * 4)
            sd[f"{prefix}.downsample.1.running_mean"] = g(planes * 4)
            sd[f"{prefix}.downsample.1.running_var"] = np.abs(g(planes * 4)) + 0.5

    in_ch = w
    for li, (n, stride) in enumerate(zip((1, 1, 1, 1), (1, 2, 2, 2))):
        planes = w * 2 ** li
        for bi in range(n):
            bottleneck(f"visual.layer{li + 1}.{bi}", in_ch, planes, stride if bi == 0 else 1)
            in_ch = planes * 4
    c = in_ch  # final channels
    embed_dim = 24
    sd["visual.attnpool.positional_embedding"] = g(2 * 2 + 1, c)
    for p in ("q_proj", "k_proj", "v_proj"):
        sd[f"visual.attnpool.{p}.weight"] = g(c, c)
        sd[f"visual.attnpool.{p}.bias"] = g(c)
    sd["visual.attnpool.c_proj.weight"] = g(embed_dim, c)
    sd["visual.attnpool.c_proj.bias"] = g(embed_dim)

    sd["token_embedding.weight"] = g(64, td)
    sd["positional_embedding"] = g(12, td)
    sd["ln_final.weight"] = g(td)
    sd["ln_final.bias"] = g(td)
    sd["text_projection"] = g(td, embed_dim)
    sd["logit_scale"] = np.float32(4.6052)
    for i in range(tl):
        p = f"transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = g(td)
        sd[f"{p}.ln_1.bias"] = g(td)
        sd[f"{p}.attn.in_proj_weight"] = g(3 * td, td)
        sd[f"{p}.attn.in_proj_bias"] = g(3 * td)
        sd[f"{p}.attn.out_proj.weight"] = g(td, td)
        sd[f"{p}.attn.out_proj.bias"] = g(td)
        sd[f"{p}.ln_2.weight"] = g(td)
        sd[f"{p}.ln_2.bias"] = g(td)
        sd[f"{p}.mlp.c_fc.weight"] = g(4 * td, td)
        sd[f"{p}.mlp.c_fc.bias"] = g(4 * td)
        sd[f"{p}.mlp.c_proj.weight"] = g(td, 4 * td)
        sd[f"{p}.mlp.c_proj.bias"] = g(td)
    if cloob_layout:
        out = {}
        for k, v in sd.items():
            if k == "logit_scale":
                out["logit_inv_tau"] = v
            elif k.startswith("visual."):
                out[k] = v
            else:
                out[f"transformer.{k}"] = v
        out["logit_scale_hopfield"] = np.float32(4.6052)
        return out
    return sd


@pytest.mark.slow
class TestRNConverter:
    @pytest.mark.parametrize("cloob_layout", [False, True])
    def test_structure_and_apply(self, rng, cloob_layout):
        sd = _fake_rn_state_dict(rng, cloob_layout)
        params = ti.convert_clip_resnet(sd)
        model = CLIPResNet(
            image_size=64, vision_layers=(1, 1, 1, 1), vision_width=16,
            embed_dim=24, text_width=32, text_layers=2, text_heads=2,
            vocab_size=64, context_length=12,
        )
        toks = jnp.zeros((1, 12), jnp.int32).at[:, 1].set(63)
        imgs = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        ref = model.init(jax.random.PRNGKey(0), toks, imgs)
        import jax.tree_util as jtu

        rp = {jtu.keystr(k) for k, _ in jtu.tree_flatten_with_path(ref)[0]}
        gp = {jtu.keystr(k) for k, _ in jtu.tree_flatten_with_path(params)[0]}
        assert rp == gp
        te, ie = model.apply(params, toks, imgs)
        assert te.shape == (1, 24) and ie.shape == (1, 24)
        assert np.isfinite(np.asarray(te)).all() and np.isfinite(np.asarray(ie)).all()


class TestOpenCLIPRNRouting:
    """`openclip/<RN-arch>/<tag>` routes to the ModifiedResNet towers instead of
    KeyError-ing (reference main.py:1323-1329 accepts any open_clip arch)."""

    def test_rn50_constructs_with_checkpoint(self, rng, tmp_path):
        from feed_forward_vqgan_clip_tpu.models.perceptor import load_perceptor

        sd = _fake_rn_state_dict(rng)
        p = tmp_path / "rn.pt"
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, str(p))
        pc = load_perceptor("openclip/RN50/yfcc15m", str(p), dtype=jnp.float32)
        assert isinstance(pc.module, CLIPResNet)
        assert pc.module.act == "gelu"  # non-quickgelu tag -> exact gelu
        assert pc.name == "openclip/RN50/yfcc15m" and pc.dim == 1024
        pc2 = load_perceptor("openclip/RN50-quickgelu/openai", str(p), dtype=jnp.float32)
        assert pc2.module.act == "quick_gelu"

    def test_unknown_rn_arch_sniffed_from_checkpoint(self, rng, tmp_path):
        # an RN arch outside CLIP_RESNET_CONFIGS (e.g. RN50x64) builds from the
        # checkpoint's shapes and applies end to end
        from feed_forward_vqgan_clip_tpu.models.perceptor import load_perceptor

        sd = _fake_rn_state_dict(rng)
        p = tmp_path / "rn64.pt"
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, str(p))
        pc = load_perceptor("openclip/RN50x64/fake_tag", str(p), dtype=jnp.float32)
        assert tuple(pc.module.vision_layers) == (1, 1, 1, 1)
        assert pc.module.image_size == 64 and pc.module.embed_dim == 24
        toks = jnp.zeros((1, 12), jnp.int32).at[:, 1].set(63)
        imgs = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        te, ie = pc.encode_text(toks), pc.encode_image(imgs)
        assert te.shape == (1, 24) and ie.shape == (1, 24)
        assert np.isfinite(np.asarray(te)).all() and np.isfinite(np.asarray(ie)).all()

    def test_sniff_rn_recovers_config(self, rng):
        family, cfg = ti.sniff_clip_arch(_fake_rn_state_dict(rng))
        assert family == "resnet"
        assert cfg["vision_layers"] == (1, 1, 1, 1) and cfg["vision_width"] == 16
        assert cfg["image_size"] == 64 and cfg["embed_dim"] == 24
        assert cfg["text_width"] == 32 and cfg["text_layers"] == 2
        assert cfg["vocab_size"] == 64 and cfg["context_length"] == 12


class TestCrowsonCLOOB:
    TINY = dict(
        d_embed=8, image_layers=1, image_d_model=16, image_heads=2,
        image_size=16, patch_size=8, text_layers=1, text_d_model=16,
        text_heads=2, text_size=10, vocab_size=32,
    )

    def test_encoders_normalize(self, rng):
        m = CrowsonCLOOB(**self.TINY)
        toks = jnp.zeros((2, 10), jnp.int32).at[:, 3].set(31)
        imgs = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), toks, imgs)
        te, ie = m.apply(params, toks, imgs)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(te), axis=1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(ie), axis=1), 1.0, rtol=1e-5)

    def test_padding_mask_is_query_side_like_upstream(self, rng):
        """Upstream masks the QUERY axis, not keys (cloob_crowsonkb.py:55-57) —
        so tokens beyond eot still leak into valid queries through the keys.
        Assert we reproduce that quirk rather than 'fixing' it."""
        m = CrowsonCLOOB(**self.TINY)
        toks = np.zeros((1, 10), np.int32)
        toks[0, :3] = [5, 6, 31]  # token, token, eot
        imgs = jnp.zeros((1, 16, 16, 3))
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(toks), imgs)
        e1 = m.apply(params, jnp.asarray(toks), method=m.encode_text)
        toks2 = toks.copy()
        toks2[0, 5] = 9  # junk beyond eot — changes keys, so output must move
        e2 = m.apply(params, jnp.asarray(toks2), method=m.encode_text)
        assert not np.allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)

    def test_haiku_pickle_conversion(self, tmp_path, rng):
        cfg = self.TINY
        g = lambda *s: (0.1 * rng.normal(size=s)).astype(np.float32)
        dm, ff = cfg["image_d_model"], cfg["image_d_model"] * 4

        def layer_tree(base, i, d, dff):
            return {
                f"{base}/layer_{i}/self_attention/layer_norm": {"scale": g(d), "offset": g(d)},
                f"{base}/layer_{i}/self_attention/multi_head_attention/query": {"w": g(d, d), "b": g(d)},
                f"{base}/layer_{i}/self_attention/multi_head_attention/key": {"w": g(d, d), "b": g(d)},
                f"{base}/layer_{i}/self_attention/multi_head_attention/value": {"w": g(d, d), "b": g(d)},
                f"{base}/layer_{i}/self_attention/multi_head_attention/linear": {"w": g(d, d), "b": g(d)},
                f"{base}/layer_{i}/feed_forward/layer_norm": {"scale": g(d), "offset": g(d)},
                f"{base}/layer_{i}/feed_forward/linear_0": {"w": g(d, dff), "b": g(dff)},
                f"{base}/layer_{i}/feed_forward/linear_1": {"w": g(dff, d), "b": g(d)},
            }

        ib, tb = "vi_t_image_encoder", "text_encoder"
        img_tree = {
            ib: {"class_embed": g(dm)},
            f"{ib}/embed": {"w": g(cfg["patch_size"], cfg["patch_size"], 3, dm)},
            f"{ib}/pos_embed": {"w": g((cfg["image_size"] // cfg["patch_size"]) ** 2 + 1, dm)},
            f"{ib}/proj": {"w": g(dm, cfg["d_embed"]), "b": g(cfg["d_embed"])},
            **layer_tree(ib, 0, dm, ff),
        }
        td, tff = cfg["text_d_model"], cfg["text_d_model"] * 4
        txt_tree = {
            f"{tb}/embed": {"embeddings": g(cfg["vocab_size"], td)},
            f"{tb}/pos_embed": {"w": g(cfg["text_size"], td)},
            f"{tb}/proj": {"w": g(td, cfg["d_embed"]), "b": g(cfg["d_embed"])},
            **layer_tree(tb, 0, td, tff),
        }
        path = str(tmp_path / "cloob.pkl")
        with open(path, "wb") as fd:
            pickle.dump({"params": (img_tree, txt_tree)}, fd)

        params = convert_crowson_pickle(path, cfg)
        m = CrowsonCLOOB(**cfg)
        toks = jnp.zeros((1, cfg["text_size"]), jnp.int32).at[:, 2].set(cfg["vocab_size"] - 1)
        imgs = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
        ref = m.init(jax.random.PRNGKey(0), toks, imgs)
        import jax.tree_util as jtu

        rp = {jtu.keystr(k) for k, _ in jtu.tree_flatten_with_path(ref)[0]}
        gp = {jtu.keystr(k) for k, _ in jtu.tree_flatten_with_path(params)[0]}
        assert rp == gp
        te, ie = m.apply(params, toks, imgs)
        assert np.isfinite(np.asarray(te)).all() and np.isfinite(np.asarray(ie)).all()


@pytest.mark.slow
class TestLoadCloobDispatch:
    def test_crowson_random_init(self):
        p = load_cloob("cloob_laion_400m_vit_b_16_32_epochs")
        assert p.size == 224 and p.dim == 512
