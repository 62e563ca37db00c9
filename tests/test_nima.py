"""NIMA quality scorer tests: module semantics, converter naming, filter wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from feed_forward_vqgan_clip_tpu.io import torch_import as ti
from feed_forward_vqgan_clip_tpu.models.nima import NIMA


class TestNimaModule:
    def test_scores_are_mos_in_range(self, rng):
        m = NIMA()
        x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        s = m.apply(params, x)
        assert s.shape == (2,)
        assert bool(jnp.all((s >= 1.0) & (s <= 10.0)))

    def test_converter_roundtrip_via_synthesized_torch_keys(self, rng):
        """Reverse-map the init tree into a NIMA-style torch state dict
        (base_model.<inception keys> + classifier 10-way linear), convert back,
        demand exact agreement — same approach as the inception test."""
        m = NIMA()
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
