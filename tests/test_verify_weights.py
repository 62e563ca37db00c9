"""verify-weights machinery tests (offline: tiny random-weight checkpoints).

The real zoo is egress-gated; these tests pin the probe/golden/report flow so
the command works the moment weights exist (VERDICT round-1 item #6)."""

import json

import numpy as np
import pytest

from feed_forward_vqgan_clip_tpu.config import make_config


@pytest.fixture()
def tiny_ckpt(tmp_path, monkeypatch):
    from feed_forward_vqgan_clip_tpu.tokenizer.bpe import ClipTokenizer
    import feed_forward_vqgan_clip_tpu.tokenizer.bpe as bpe
    from feed_forward_vqgan_clip_tpu.train.loop import train

    monkeypatch.setattr(bpe, "get_tokenizer", lambda *a, **k: ClipTokenizer(merges=["a b"]))
    rng = np.random.default_rng(0)
    np.savez(
        tmp_path / "d.npz",
        x=rng.normal(size=(16, 32)).astype(np.float32),
        y=rng.normal(size=(16, 32)).astype(np.float32),
    )
    folder = tmp_path / "m"
    cfg = make_config(
        clip_model="tiny",
        vqgan_arch=dict(n_embed=32, embed_dim=8, z_channels=8, ch=8, ch_mult=(1, 2),
                        num_res_blocks=1, attn_resolutions=(4,), resolution=8),
        model_type="mlp_mixer", dim=16, depth=1, dropout=0, vq_image_size=4,
        batch_size=8, repeat=1, cutn=1, cut_size=32, pool_size=32,
        lr=1e-3, epochs=100, max_steps=1, log_interval=100,
        folder=str(folder), compute_dtype="float32", noise_dim=0, seed=0,
        path=str(tmp_path / "d.npz"),
    )
    train(cfg)
    return str(folder / "checkpoint")


@pytest.mark.slow
class TestVerifyWeights:
    def test_golden_roundtrip_and_mismatch(self, tiny_ckpt, tmp_path):
        from feed_forward_vqgan_clip_tpu.verify_weights import verify_weights

        gdir = str(tmp_path / "goldens")
        rpt = str(tmp_path / "report.json")

        # first run writes goldens
        r1 = verify_weights(
            str(tmp_path), models=[tiny_ckpt], goldens_dir=gdir, out=rpt
        )
        assert r1["models"]["checkpoint"]["status"] == "golden_written"

        # second run matches them
        r2 = verify_weights(
            str(tmp_path), models=[tiny_ckpt], goldens_dir=gdir, out=rpt
        )
        assert r2["models"]["checkpoint"]["status"] == "ok"
        probes = r2["models"]["checkpoint"]["probes"]
        assert probes["prompt_thumb"]["status"] == "match"
        assert probes["fixed_z_sha"]["status"] == "match"
        with open(rpt) as fd:
            assert json.load(fd)["summary"]["fail"] == 0

        # corrupt one golden array -> FAIL with a max_abs_diff
        import numpy as _np

        gfile = f"{gdir}/checkpoint.npz"
        g = dict(_np.load(gfile, allow_pickle=False))
        g["prompt_thumb"] = g["prompt_thumb"] + 1.0
        _np.savez_compressed(gfile, **g)
        r3 = verify_weights(
            str(tmp_path), models=[tiny_ckpt], goldens_dir=gdir, out=rpt
        )
        assert r3["models"]["checkpoint"]["status"] == "FAIL"
        assert r3["models"]["checkpoint"]["probes"]["prompt_thumb"]["max_abs_diff"] >= 0.9

    def test_absent_models_reported_not_fatal(self, tmp_path):
        from feed_forward_vqgan_clip_tpu.verify_weights import verify_weights

        r = verify_weights(
            str(tmp_path / "nowhere"), goldens_dir=str(tmp_path / "g"),
            out=str(tmp_path / "r.json"),
        )
        assert r["summary"]["absent"] == len(r["models"]) > 0
        assert r["summary"]["fail"] == 0
