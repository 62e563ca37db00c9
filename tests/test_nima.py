"""NIMA quality scorer tests: module semantics, converter naming, filter wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feed_forward_vqgan_clip_tpu.io import torch_import as ti
from feed_forward_vqgan_clip_tpu.models.nima import NIMA


@pytest.mark.slow
class TestNimaModule:
    def test_scores_are_mos_in_range(self, rng):
        m = NIMA(backbone="inception_v3")
        x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        s = m.apply(params, x)
        assert s.shape == (2,)
        assert bool(jnp.all((s >= 1.0) & (s <= 10.0)))

    def test_converter_roundtrip_via_synthesized_torch_keys(self, rng):
        """Reverse-map the init tree into a NIMA-style torch state dict
        (base_model.<inception keys> + classifier 10-way linear), convert back,
        demand exact agreement — same approach as the inception test."""
        m = NIMA(backbone="inception_v3")
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        ref = jax.jit(m.init)(jax.random.PRNGKey(1), x)

        sd = {}

        def emit(tree, prefix):
            for k, v in tree.items():
                path = f"{prefix}.{k}" if prefix else k
                if k == "conv":
                    sd[f"base_model.{path}.weight"] = np.transpose(
                        np.asarray(v["kernel"]), (3, 2, 0, 1)
                    )
                elif k == "bn":
                    sd[f"base_model.{path}.weight"] = np.asarray(v["scale"])
                    sd[f"base_model.{path}.bias"] = np.asarray(v["bias"])
                    sd[f"base_model.{path}.running_mean"] = np.asarray(v["mean"])
                    sd[f"base_model.{path}.running_var"] = np.asarray(v["var"])
                else:
                    emit(v, path)

        emit(ref["params"]["backbone"], "")
        sd["classifier.1.weight"] = np.asarray(ref["params"]["classifier"]["kernel"]).T
        sd["classifier.1.bias"] = np.asarray(ref["params"]["classifier"]["bias"])

        got = ti.convert_nima(sd)
        y_ref = m.apply(ref, jnp.asarray(np.random.default_rng(0).uniform(size=(1, 64, 64, 3)), jnp.float32))
        y_got = m.apply(got, jnp.asarray(np.random.default_rng(0).uniform(size=(1, 64, 64, 3)), jnp.float32))
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_got), atol=1e-5)


class TestQualityFilterWiring:
    def test_threshold_filters_rows(self, tmp_path, monkeypatch):
        """encode_text_and_images_webdataset drops below-threshold samples when
        a NIMA scorer is active (reference main.py:348-354)."""
        import io
        import tarfile

        from PIL import Image

        import feed_forward_vqgan_clip_tpu.data.encode as enc
        from feed_forward_vqgan_clip_tpu.tokenizer.bpe import ClipTokenizer

        # tar with 4 samples
        tar_path = tmp_path / "d-000.tar"
        with tarfile.open(tar_path, "w") as tf:
            for i in range(4):
                img = Image.fromarray(
                    (np.full((8, 8, 3), 40 * i, np.uint8))
                )
                buf = io.BytesIO()
                img.save(buf, "PNG")
                for name, data in ((f"{i:03d}.input.png", buf.getvalue()),
                                   (f"{i:03d}.output.txt", f"a b {i}".encode())):
                    info = tarfile.TarInfo(name)
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))

        monkeypatch.setattr(
            enc, "get_tokenizer", lambda *a, **k: ClipTokenizer(merges=["a b"])
        )
        # fake scorer: score = mean pixel * 10 -> exactly 2 of 4 pass at 2.5
        fake = lambda x: jnp.mean(x, axis=(1, 2, 3)) * 10.0
        import feed_forward_vqgan_clip_tpu.models.nima as nima_mod

        monkeypatch.setattr(nima_mod, "make_nima_fn", lambda path: fake)
        (tmp_path / "w.pth").write_bytes(b"x")  # existence check only

        out = enc.encode_text_and_images_webdataset(
            str(tmp_path / "d-*.tar"), clip_model="tiny", batch_size=4,
            img_col="input.png", txt_col="output.txt",
            out=str(tmp_path / "f.npz"),
            image_quality_threshold=2.5,
            nima_weights_path=str(tmp_path / "w.pth"),
        )
        with np.load(out) as z:
            assert len(z["x"]) == len(z["y"]) == 2


@pytest.mark.slow
class TestInceptionResNetV2Oracle:
    """Parity of the IRv2 trunk + NIMA head against a vendored minimal torch
    reimplementation of the Cadene/timm `inception_resnet_v2` module layout —
    the backbone of pyiqa's stock `nima` metric (timm/pyiqa are not installed
    in this image; the oracle mirrors the published port key-by-key, so the
    converter and this oracle can only be wrong together if the vendored
    layout itself mis-states the port — each branch shape is pinned by the
    paper's table and the port's README)."""

    def _torch_model(self):
        import torch
        import torch.nn as tnn

        class BC(tnn.Module):  # BasicConv2d of the port
            def __init__(self, i, o, k, stride=1, padding=0):
                super().__init__()
                self.conv = tnn.Conv2d(i, o, k, stride=stride, padding=padding, bias=False)
                self.bn = tnn.BatchNorm2d(o, eps=1e-3)

            def forward(self, x):
                return torch.relu(self.bn(self.conv(x)))

        class Mixed5b(tnn.Module):
            def __init__(self):
                super().__init__()
                self.branch0 = BC(192, 96, 1)
                self.branch1 = tnn.Sequential(BC(192, 48, 1), BC(48, 64, 5, padding=2))
                self.branch2 = tnn.Sequential(
                    BC(192, 64, 1), BC(64, 96, 3, padding=1), BC(96, 96, 3, padding=1)
                )
                self.branch3 = tnn.Sequential(
                    tnn.AvgPool2d(3, 1, 1, count_include_pad=False), BC(192, 64, 1)
                )

            def forward(self, x):
                return torch.cat(
                    [self.branch0(x), self.branch1(x), self.branch2(x), self.branch3(x)], 1
                )

        class Block35(tnn.Module):
            def __init__(self):
                super().__init__()
                self.branch0 = BC(320, 32, 1)
                self.branch1 = tnn.Sequential(BC(320, 32, 1), BC(32, 32, 3, padding=1))
                self.branch2 = tnn.Sequential(
                    BC(320, 32, 1), BC(32, 48, 3, padding=1), BC(48, 64, 3, padding=1)
                )
                self.conv2d = tnn.Conv2d(128, 320, 1)

            def forward(self, x):
                up = self.conv2d(
                    torch.cat([self.branch0(x), self.branch1(x), self.branch2(x)], 1)
                )
                return torch.relu(x + 0.17 * up)

        class Mixed6a(tnn.Module):
            def __init__(self):
                super().__init__()
                self.branch0 = BC(320, 384, 3, stride=2)
                self.branch1 = tnn.Sequential(
                    BC(320, 256, 1), BC(256, 256, 3, padding=1), BC(256, 384, 3, stride=2)
                )
                self.branch2 = tnn.MaxPool2d(3, stride=2)

            def forward(self, x):
                return torch.cat([self.branch0(x), self.branch1(x), self.branch2(x)], 1)

        class Block17(tnn.Module):
            def __init__(self):
                super().__init__()
                self.branch0 = BC(1088, 192, 1)
                self.branch1 = tnn.Sequential(
                    BC(1088, 128, 1),
                    BC(128, 160, (1, 7), padding=(0, 3)),
                    BC(160, 192, (7, 1), padding=(3, 0)),
                )
                self.conv2d = tnn.Conv2d(384, 1088, 1)

            def forward(self, x):
                up = self.conv2d(torch.cat([self.branch0(x), self.branch1(x)], 1))
                return torch.relu(x + 0.10 * up)

        class Mixed7a(tnn.Module):
            def __init__(self):
                super().__init__()
                self.branch0 = tnn.Sequential(BC(1088, 256, 1), BC(256, 384, 3, stride=2))
                self.branch1 = tnn.Sequential(BC(1088, 256, 1), BC(256, 288, 3, stride=2))
                self.branch2 = tnn.Sequential(
                    BC(1088, 256, 1), BC(256, 288, 3, padding=1), BC(288, 320, 3, stride=2)
                )
                self.branch3 = tnn.MaxPool2d(3, stride=2)

            def forward(self, x):
                return torch.cat(
                    [self.branch0(x), self.branch1(x), self.branch2(x), self.branch3(x)], 1
                )

        class Block8(tnn.Module):
            def __init__(self, scale=0.20, no_relu=False):
                super().__init__()
                self.scale, self.no_relu = scale, no_relu
                self.branch0 = BC(2080, 192, 1)
                self.branch1 = tnn.Sequential(
                    BC(2080, 192, 1),
                    BC(192, 224, (1, 3), padding=(0, 1)),
                    BC(224, 256, (3, 1), padding=(1, 0)),
                )
                self.conv2d = tnn.Conv2d(448, 2080, 1)

            def forward(self, x):
                up = self.conv2d(torch.cat([self.branch0(x), self.branch1(x)], 1))
                out = x + self.scale * up
                return out if self.no_relu else torch.relu(out)

        class IRv2(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv2d_1a = BC(3, 32, 3, stride=2)
                self.conv2d_2a = BC(32, 32, 3)
                self.conv2d_2b = BC(32, 64, 3, padding=1)
                self.maxpool_3a = tnn.MaxPool2d(3, stride=2)
                self.conv2d_3b = BC(64, 80, 1)
                self.conv2d_4a = BC(80, 192, 3)
                self.maxpool_5a = tnn.MaxPool2d(3, stride=2)
                self.mixed_5b = Mixed5b()
                self.repeat = tnn.Sequential(*[Block35() for _ in range(10)])
                self.mixed_6a = Mixed6a()
                self.repeat_1 = tnn.Sequential(*[Block17() for _ in range(20)])
                self.mixed_7a = Mixed7a()
                self.repeat_2 = tnn.Sequential(*[Block8() for _ in range(9)])
                self.block8 = Block8(scale=1.0, no_relu=True)
                self.conv2d_7b = BC(2080, 1536, 1)

            def forward(self, x):
                h = self.conv2d_1a(x)
                h = self.conv2d_2a(h)
                h = self.conv2d_2b(h)
                h = self.maxpool_3a(h)
                h = self.conv2d_3b(h)
                h = self.conv2d_4a(h)
                h = self.maxpool_5a(h)
                h = self.mixed_5b(h)
                h = self.repeat(h)
                h = self.mixed_6a(h)
                h = self.repeat_1(h)
                h = self.mixed_7a(h)
                h = self.repeat_2(h)
                h = self.block8(h)
                h = self.conv2d_7b(h)
                return h.mean(dim=(2, 3))

        class TNIMA(tnn.Module):  # pyiqa-style wrapper: base_model + classifier
            def __init__(self):
                super().__init__()
                self.base_model = IRv2()
                self.classifier = tnn.Sequential(
                    tnn.Dropout(0.0), tnn.Linear(1536, 10), tnn.Softmax(dim=1)
                )

            def forward(self, x):
                p = self.classifier(self.base_model(x))
                bins = torch.arange(1, 11, dtype=torch.float32)
                return (p * bins).sum(dim=1)

        return TNIMA()

    def test_irv2_nima_matches_torch_oracle(self):
        import torch

        torch.manual_seed(0)
        tm = self._torch_model().eval()
        # randomize BN running stats so the mean/var mapping is exercised
        with torch.no_grad():
            for mod in tm.modules():
                if isinstance(mod, torch.nn.BatchNorm2d):
                    mod.running_mean.normal_(0, 0.2)
                    mod.running_var.uniform_(0.5, 1.5)

        x01 = np.random.default_rng(3).uniform(size=(2, 96, 96, 3)).astype(np.float32)
        xt = torch.tensor((x01 - 0.5) / 0.5).permute(0, 3, 1, 2)
        with torch.no_grad():
            mos_ref = tm(xt).numpy()

        params = ti.convert_nima({k: v.numpy() for k, v in tm.state_dict().items()})
        m = NIMA(backbone="inception_resnet_v2")
        mos = np.asarray(m.apply(params, jnp.asarray(x01)))
        np.testing.assert_allclose(mos, mos_ref, atol=2e-3, rtol=2e-3)
