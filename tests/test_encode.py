"""Dataset-encoder e2e: real PNG files / tar shards -> CLIP feature pairs."""

import io
import tarfile

import numpy as np
import pytest
from PIL import Image

from feed_forward_vqgan_clip_tpu.data.encode import (
    encode_text_and_images,
    encode_text_and_images_webdataset,
    preprocess_image,
)


@pytest.fixture(autouse=True)
def tiny_everything(monkeypatch):
    """Swap the heavy CLIP + tokenizer for tiny stand-ins."""
    from feed_forward_vqgan_clip_tpu.models.perceptor import load_perceptor
    from feed_forward_vqgan_clip_tpu.tokenizer.bpe import ClipTokenizer

    import feed_forward_vqgan_clip_tpu.data.encode as E

    tiny = load_perceptor("tiny")
    monkeypatch.setattr(E, "load_perceptor", lambda *a, **k: tiny)
    tok = ClipTokenizer(merges=["a b"])
    monkeypatch.setattr(E, "get_tokenizer", lambda *a, **k: tok)
    return tiny


def _png_bytes(color, size=(48, 40)):
    img = Image.new("RGB", size, color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


class TestPreprocess:
    def test_resize_crop_normalize(self):
        img = Image.new("RGB", (100, 60), (255, 0, 0))
        arr = preprocess_image(img, size=32)
        assert arr.shape == (32, 32, 3)
        # red channel normalized: (1 - mean_r) / std_r ~ 1.93
        assert abs(arr[..., 0].mean() - (1 - 0.48145466) / 0.26862954) < 1e-4


class TestFolderEncoder:
    def test_pairs_to_npz(self, tmp_path):
        for i, color in enumerate([(255, 0, 0), (0, 255, 0), (0, 0, 255)]):
            (tmp_path / f"s{i}.txt").write_text(f"a b {i}")
            Image.new("RGB", (48, 40), color).save(tmp_path / f"s{i}.jpg", format="JPEG")
        out = str(tmp_path / "feats.npz")
        encode_text_and_images(str(tmp_path), out=out, batch_size=2)
        z = np.load(out)
        assert z["x"].shape == (3, 32) and z["y"].shape == (3, 32)
        assert np.isfinite(z["x"]).all() and np.isfinite(z["y"]).all()
        # different images -> different image features
        assert not np.allclose(z["y"][0], z["y"][2])


@pytest.mark.slow
class TestWebdatasetEncoder:
    def test_tars_to_npz_with_corrupt_sample(self, tmp_path):
        p = str(tmp_path / "shard0.tar")
        with tarfile.open(p, "w") as tf:
            samples = [
                ("000", _png_bytes((255, 0, 0)), b"a b"),
                ("001", b"not an image at all", b"bad"),  # decode fails -> skipped
                ("002", _png_bytes((0, 0, 255)), b"b a"),
            ]
            for key, img, txt in samples:
                for col, payload in (("input.jpg", img), ("output.txt", txt)):
                    info = tarfile.TarInfo(f"{key}.{col}")
                    info.size = len(payload)
                    tf.addfile(info, io.BytesIO(payload))
        out = str(tmp_path / "wds.npz")
        encode_text_and_images_webdataset(
            str(tmp_path / "shard*.tar"), out=out, batch_size=2,
        )
        z = np.load(out)
        assert z["x"].shape == (2, 32) and z["y"].shape == (2, 32)

    def test_quality_threshold_warns_and_continues(self, tmp_path, caplog):
        p = str(tmp_path / "s.tar")
        with tarfile.open(p, "w") as tf:
            img, txt = _png_bytes((9, 9, 9)), b"a"
            for col, payload in (("input.jpg", img), ("output.txt", txt)):
                info = tarfile.TarInfo(f"k.{col}")
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
        out = str(tmp_path / "q.npz")
        encode_text_and_images_webdataset(p, out=out, image_quality_threshold=5.0)
        assert np.load(out)["x"].shape[0] == 1  # filter skipped, data encoded


def test_merge_features_roundtrip(tmp_path):
    """ffvc merge-features: the reference's rank-0 shard merge (main.py:372-390)."""
    import numpy as np

    from feed_forward_vqgan_clip_tpu.data.encode import _load_pairs, merge_features

    rng = np.random.default_rng(0)
    parts = []
    for r in range(3):
        x, y = rng.normal(size=(4 + r, 8)).astype(np.float32), rng.normal(size=(4 + r, 8)).astype(np.float32)
        p = tmp_path / f"features_{r}.npz"
        np.savez(p, x=x, y=y)
        parts.append((x, y))
    out = merge_features(str(tmp_path / "features_*.npz"), str(tmp_path / "merged.npz"))
    mx, my = _load_pairs(out if out.endswith(".npz") else out + ".npz")
    np.testing.assert_array_equal(mx, np.concatenate([p[0] for p in parts]))
    np.testing.assert_array_equal(my, np.concatenate([p[1] for p in parts]))


def test_merge_features_torch_format(tmp_path):
    import numpy as np
    import torch

    from feed_forward_vqgan_clip_tpu.data.encode import _load_pairs, merge_features

    rng = np.random.default_rng(1)
    for r in range(2):
        torch.save(
            (torch.tensor(rng.normal(size=(3, 4)).astype(np.float32)),
             torch.tensor(rng.normal(size=(3, 4)).astype(np.float32))),
            tmp_path / f"f_{r}.pkl",
        )
    out = merge_features([str(tmp_path / "f_0.pkl"), str(tmp_path / "f_1.pkl")],
                         str(tmp_path / "merged.pkl"))
    mx, my = _load_pairs(out)
    assert mx.shape == (6, 4) and my.shape == (6, 4)


def test_webdataset_spill_shards_equivalent(tmp_path):
    """spill_rows=1 forces a spill after every flush; the merged output must
    equal the in-RAM path and the spill shards must be cleaned up."""
    import tarfile

    p = str(tmp_path / "shard0.tar")
    with tarfile.open(p, "w") as tf:
        for i, color in enumerate([(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]):
            img, txt = _png_bytes(color), f"caption {i}".encode()
            for col, payload in (("input.jpg", img), ("output.txt", txt)):
                info = tarfile.TarInfo(f"{i:03d}.{col}")
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
    ram = str(tmp_path / "ram.npz")
    spilled = str(tmp_path / "spill.npz")
    encode_text_and_images_webdataset(p, out=ram, batch_size=2)
    encode_text_and_images_webdataset(p, out=spilled, batch_size=2, spill_rows=1)
    a, b = np.load(ram), np.load(spilled)
    np.testing.assert_array_equal(a["x"], b["x"])
    np.testing.assert_array_equal(a["y"], b["y"])
    assert not list(tmp_path.glob("*.spill_*")), "spill shards not cleaned up"


def test_webdataset_prefetch_matches_sequential(tmp_path):
    """The producer-thread prefetch (encode._prefetched, default on) must not
    change output CONTENT or ORDER vs prefetch=False, and must skip corrupt
    members identically."""
    import tarfile

    p = str(tmp_path / "shard0.tar")
    with tarfile.open(p, "w") as tf:
        for i, color in enumerate([(255, 0, 0), (0, 255, 0), (7, 7, 7)]):
            img, txt = _png_bytes(color), f"caption {i}".encode()
            if i == 1:
                img = b"not an image"  # corrupt member: warn-and-skip
            for col, payload in (("input.jpg", img), ("output.txt", txt)):
                info = tarfile.TarInfo(f"{i:03d}.{col}")
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
    seq = str(tmp_path / "seq.npz")
    pre = str(tmp_path / "pre.npz")
    encode_text_and_images_webdataset(p, out=seq, batch_size=2, prefetch=False)
    encode_text_and_images_webdataset(p, out=pre, batch_size=2, prefetch=True)
    a, b = np.load(seq), np.load(pre)
    assert a["x"].shape[0] == 2  # corrupt member dropped
    np.testing.assert_array_equal(a["x"], b["x"])
    np.testing.assert_array_equal(a["y"], b["y"])


def test_merge_features_bounded_memory_uses_memmap(tmp_path):
    """The merge's working arrays are disk-backed (np.memmap) and the temp
    files are removed afterwards."""
    from feed_forward_vqgan_clip_tpu.data.encode import merge_features

    rng = np.random.default_rng(2)
    for r in range(4):
        np.savez(tmp_path / f"m_{r}.npz",
                 x=rng.normal(size=(5, 8)).astype(np.float32),
                 y=rng.normal(size=(5, 8)).astype(np.float32))
    out = merge_features(str(tmp_path / "m_*.npz"), str(tmp_path / "all.npz"))
    z = np.load(out)
    assert z["x"].shape == (20, 8)
    assert not list(tmp_path.glob("*.merge_tmp*")), "memmap temp files left behind"
