"""Serving + InceptionV3 tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feed_forward_vqgan_clip_tpu.config import make_config
from feed_forward_vqgan_clip_tpu.models.inception import InceptionV3Features
from feed_forward_vqgan_clip_tpu.io import torch_import as ti


@pytest.mark.slow
class TestInception:
    def test_feature_shape_and_channel_arithmetic(self, rng):
        m = InceptionV3Features()
        x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        feats = m.apply(params, x)
        assert feats.shape == (2, 2048)
        assert np.isfinite(np.asarray(feats)).all()

    def test_converter_roundtrip_via_synthesized_torch_keys(self, rng):
        """Reverse-map our init tree to torchvision-style keys, convert back, and
        demand exact tree agreement — pins the converter naming in both
        directions without needing torchvision."""
        m = InceptionV3Features()
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        ref = jax.jit(m.init)(jax.random.PRNGKey(0), x)

        sd = {}

        def emit(tree, prefix):
            for k, v in tree.items():
                path = f"{prefix}.{k}" if prefix else k
                if k == "conv":
                    sd[f"{path}.weight"] = np.transpose(np.asarray(v["kernel"]), (3, 2, 0, 1))
                elif k == "bn":
                    sd[f"{path}.weight"] = np.asarray(v["scale"])
                    sd[f"{path}.bias"] = np.asarray(v["bias"])
                    sd[f"{path}.running_mean"] = np.asarray(v["mean"])
                    sd[f"{path}.running_var"] = np.asarray(v["var"])
                else:
                    emit(v, path)

        emit(ref["params"], "")
        got = ti.convert_inception(sd)

        import jax.tree_util as jtu

        rp = {jtu.keystr(k): v.shape for k, v in jtu.tree_flatten_with_path(ref)[0]}
        gp = {jtu.keystr(k): v.shape for k, v in jtu.tree_flatten_with_path(got)[0]}
        assert rp == gp
        for (k1, v1), (k2, v2) in zip(
            sorted(jtu.tree_flatten_with_path(ref)[0], key=lambda t: jtu.keystr(t[0])),
            sorted(jtu.tree_flatten_with_path(got)[0], key=lambda t: jtu.keystr(t[0])),
        ):
            np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))

    def test_fid_known_value(self, rng):
        from feed_forward_vqgan_clip_tpu.eval.fid import frechet_distance

        a = rng.normal(size=(500, 16)).astype(np.float64)
        np.testing.assert_allclose(frechet_distance(a, a), 0.0, atol=1e-6)
        b = a + 3.0  # pure mean shift of 3 in 16 dims -> FID = 16*9
        np.testing.assert_allclose(frechet_distance(a, b), 16 * 9.0, rtol=1e-3)


@pytest.mark.slow
class TestPredictor:
    def _train_tiny(self, tmp_path, name):
        from feed_forward_vqgan_clip_tpu.train.loop import train

        folder = tmp_path / name
        rng = np.random.default_rng(0)
        np.savez(
            tmp_path / f"{name}.npz",
            x=rng.normal(size=(16, 32)).astype(np.float32),
            y=rng.normal(size=(16, 32)).astype(np.float32),
        )
        cfg = make_config(
            clip_model="tiny",
            vqgan_arch=dict(n_embed=32, embed_dim=8, z_channels=8, ch=8,
                            ch_mult=(1, 2), num_res_blocks=1,
                            attn_resolutions=(4,), resolution=8),
            model_type="mlp_mixer", dim=16, depth=1, dropout=0, vq_image_size=4,
            batch_size=8, repeat=1, cutn=1, cut_size=32, pool_size=32,
            lr=1e-3, epochs=100, max_steps=1, log_interval=100,
            folder=str(folder), compute_dtype="float32", noise_dim=0, seed=0,
            path=str(tmp_path / f"{name}.npz"),
        )
        train(cfg)
        return str(folder / "checkpoint")

    def test_setup_dedups_and_predict_needs_tokenizer(self, tmp_path, monkeypatch):
        from feed_forward_vqgan_clip_tpu.serve.predictor import Predictor
        from feed_forward_vqgan_clip_tpu.tokenizer.bpe import ClipTokenizer

        p1 = self._train_tiny(tmp_path, "m1")
        pred = Predictor([p1])
        pred.setup()
        assert len(pred.models) == 1
        assert len(pred.perceptors) == 1 and len(pred.vqgans) == 1

        # tiny BPE stands in for the release merge table
        tiny_tok = ClipTokenizer(merges=["a b"])
        import feed_forward_vqgan_clip_tpu.tokenizer.bpe as bpe

        monkeypatch.setattr(bpe, "get_tokenizer", lambda *a, **k: tiny_tok)
        out = pred.predict("a b", model=list(pred.models)[0], grid_size="2x2",
                           seed=3, out_path=str(tmp_path / "grid.png"))
        assert (tmp_path / "grid.png").exists()
        from PIL import Image

        w, h = Image.open(out).size
        assert w > 8 and h > 8  # 2x2 grid of 8px tiles + padding


@pytest.mark.slow
class TestInferCLI:
    def test_test_command_prompts_and_grid(self, tmp_path, monkeypatch):
        """The reference `test` surface (main.py:977-1061): '|'-separated prompts
        and .txt files -> grid PNG, through the real CLI function."""
        from feed_forward_vqgan_clip_tpu.tokenizer.bpe import ClipTokenizer
        import feed_forward_vqgan_clip_tpu.tokenizer.bpe as bpe

        ckpt = TestPredictor()._train_tiny(tmp_path, "m_cli")
        tiny_tok = ClipTokenizer(merges=["a b"])
        monkeypatch.setattr(bpe, "get_tokenizer", lambda *a, **k: tiny_tok)

        from feed_forward_vqgan_clip_tpu.infer import test as infer_test

        out = infer_test(
            ckpt, "a cat|a dog", nb_repeats=2,
            out_path=str(tmp_path / "gen.png"), seed=7,
        )
        assert (tmp_path / "gen.png").exists()

        prompts = tmp_path / "prompts.txt"
        prompts.write_text("a\nb\nab\n")
        infer_test(
            ckpt, str(prompts), out_path=str(tmp_path / "gen2.png"),
            images_per_row=3, seed=7,
        )
        from PIL import Image

        w1, _ = Image.open(tmp_path / "gen.png").size
        w2, _ = Image.open(tmp_path / "gen2.png").size
        assert w2 > w1  # 3 columns vs 2


@pytest.mark.slow
class TestGradioApp:
    def test_app_fn_contract_all_input_combinations(self, tmp_path, monkeypatch):
        """Drive serve/app.py's callback directly (gradio absent in this image):
        each model/prior/grid/seed combination must yield a readable PNG whose
        grid geometry matches, mirroring /root/reference/app.py:43-116."""
        from PIL import Image

        import feed_forward_vqgan_clip_tpu.tokenizer.bpe as bpe
        from feed_forward_vqgan_clip_tpu.serve.app import build_fn
        from feed_forward_vqgan_clip_tpu.tokenizer.bpe import ClipTokenizer

        ckpt = TestPredictor()._train_tiny(tmp_path, "m_app")
        monkeypatch.setattr(
            bpe, "get_tokenizer", lambda *a, **k: ClipTokenizer(merges=["a b"])
        )
        out = str(tmp_path / "app_out.png")
        fn, names = build_fn([ckpt], out_path=out)
        assert names == [ckpt.replace(str(tmp_path) + "/", "").split("/")[0] or ckpt] or len(names) == 1

        sizes = {}
        for grid in ("1x1", "2x2"):
            for seed in (0, 7):
                # prior=True with no prior loaded must degrade gracefully (the
                # reference samples only when a prior exists, app.py:95-99)
                for prior in (False, True):
                    path = fn("a b", names[0], prior, grid, seed)
                    assert path == out
                    img = Image.open(path)
                    sizes[(grid, seed, prior)] = img.size
        # 2x2 grids are larger than 1x1
        assert sizes[("2x2", 0, False)][0] > sizes[("1x1", 0, False)][0]
        # model=None falls back to a random (here: the only) model
        assert fn("a b", None, False, "1x1", 1) == out
