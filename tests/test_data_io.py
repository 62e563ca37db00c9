"""Data pipeline + IO tests: dataset loading, batching, grids, tar streaming,
checkpoint roundtrip, and the torch released-checkpoint interop path."""

import io
import os
import sys
import tarfile

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

from feed_forward_vqgan_clip_tpu.data.datasets import (
    epoch_batches,
    epoch_shard_batches,
    load_dataset,
    save_tokens,
    shard_for_process,
)
from feed_forward_vqgan_clip_tpu.data.tar_reader import iter_shards, iter_tar_samples
from feed_forward_vqgan_clip_tpu.io import checkpoint as ckpt_io
from feed_forward_vqgan_clip_tpu.io.images import make_grid, save_image


class TestLoadDataset:
    def test_npz_tokens(self, tmp_path):
        toks = np.ones((5, 77), np.int32)
        np.savez(tmp_path / "t.npz", tokens=toks)
        out = load_dataset(str(tmp_path / "t.npz"))
        np.testing.assert_array_equal(out, toks)

    def test_npz_pairs(self, tmp_path):
        np.savez(tmp_path / "p.npz", x=np.ones((3, 4)), y=np.zeros((3, 4)))
        x, y = load_dataset(str(tmp_path / "p.npz"))
        assert x.shape == (3, 4) and y.shape == (3, 4)

    def test_torch_pkl_pairs(self, tmp_path):
        torch.save((torch.ones(3, 4), torch.zeros(3, 4)), tmp_path / "p.pkl")
        x, y = load_dataset(str(tmp_path / "p.pkl"))
        assert x.shape == (3, 4)

    def test_torch_pkl_tokens(self, tmp_path):
        torch.save(torch.ones(5, 77, dtype=torch.long), tmp_path / "t.pkl")
        out = load_dataset(str(tmp_path / "t.pkl"))
        assert out.shape == (5, 77) and np.issubdtype(out.dtype, np.integer)

    def test_save_tokens_roundtrip(self, tmp_path):
        toks = np.arange(10, dtype=np.int32).reshape(2, 5)
        save_tokens(toks, str(tmp_path / "t.npz"))
        np.testing.assert_array_equal(load_dataset(str(tmp_path / "t.npz")), toks)


class TestBatching:
    def test_epoch_batches_cover_all(self):
        batches = epoch_batches(10, 4, seed=0, epoch=0, drop_last=False)
        ids = np.concatenate(batches)
        assert all(len(b) == 4 for b in batches)
        assert set(ids) == set(range(10))  # wraparound pad reuses seen ids

    def test_epoch_batches_deterministic_per_epoch(self):
        a = epoch_batches(10, 4, seed=0, epoch=1, drop_last=False)
        b = epoch_batches(10, 4, seed=0, epoch=1, drop_last=False)
        c = epoch_batches(10, 4, seed=0, epoch=2, drop_last=False)
        np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))
        assert not np.array_equal(np.concatenate(a), np.concatenate(c))

    def test_shard_for_process(self):
        shards = [shard_for_process(10, i, 4) for i in range(4)]
        assert len({len(s) for s in shards}) == 1  # equal sizes
        covered = set(np.concatenate(shards))
        assert covered == set(range(10))

    def test_epoch_shard_batches_distributed_sampler_parity(self):
        # DistributedSampler semantics (main.py:669-673, 713-714): the union of
        # all hosts' indices covers the dataset each epoch, and each host's
        # subset CHANGES across epochs (global reshuffle before the split).
        n, bs, pc = 103, 8, 4
        per_epoch = {}
        for epoch in (0, 1):
            all_ids = []
            host_sets = []
            for pi in range(pc):
                batches = epoch_shard_batches(
                    n, bs, seed=7, epoch=epoch, process_index=pi,
                    process_count=pc, drop_last=False,
                )
                assert all(len(b) == bs for b in batches)
                ids = np.concatenate(batches)
                host_sets.append(set(ids.tolist()))
                all_ids.append(ids)
            union = set(np.concatenate(all_ids).tolist())
            assert union == set(range(n))  # full coverage every epoch
            per_epoch[epoch] = host_sets
        # each host draws a different subset in epoch 1 than in epoch 0
        for pi in range(pc):
            assert per_epoch[0][pi] != per_epoch[1][pi]

    def test_epoch_shard_batches_deterministic(self):
        a = epoch_shard_batches(50, 4, seed=3, epoch=5, process_index=1, process_count=2)
        b = epoch_shard_batches(50, 4, seed=3, epoch=5, process_index=1, process_count=2)
        np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))

    def test_epoch_shard_batches_tiny_dataset(self):
        # dataset smaller than one batch: wraparound fills the batch
        batches = epoch_shard_batches(3, 8, seed=0, epoch=0)
        assert len(batches) == 1 and len(batches[0]) == 8
        assert set(batches[0].tolist()) == {0, 1, 2}


class TestImages:
    def test_make_grid_layout(self):
        imgs = np.zeros((3, 4, 4, 3), np.float32)
        imgs[1] = 1.0
        grid = make_grid(imgs, nrow=2, padding=1)
        assert grid.shape == (2 * 5 + 1, 2 * 5 + 1, 3)
        # image 1 sits top-right
        assert grid[1:5, 6:10].min() == 1.0

    def test_save_png_roundtrip(self, tmp_path):
        from PIL import Image

        img = np.random.default_rng(0).uniform(size=(8, 8, 3)).astype(np.float32)
        save_image(img, str(tmp_path / "x.png"))
        back = np.asarray(Image.open(tmp_path / "x.png"), np.float32) / 255.0
        np.testing.assert_allclose(back, img, atol=1 / 255.0 + 1e-6)


class TestTarReader:
    def _make_tar(self, path, samples):
        with tarfile.open(path, "w") as tf:
            for key, cols in samples:
                for col, payload in cols.items():
                    info = tarfile.TarInfo(f"{key}.{col}")
                    info.size = len(payload)
                    tf.addfile(info, io.BytesIO(payload))

    def test_groups_by_key(self, tmp_path):
        p = str(tmp_path / "s.tar")
        self._make_tar(
            p,
            [
                ("a", {"input.jpg": b"imgA", "output.txt": b"txtA"}),
                ("b", {"input.jpg": b"imgB", "output.txt": b"txtB"}),
                ("c", {"input.jpg": b"imgC"}),  # missing column -> dropped
            ],
        )
        rows = list(iter_shards([p], ["input.jpg", "output.txt"]))
        assert rows == [[b"imgA", b"txtA"], [b"imgB", b"txtB"]]

    def test_corrupt_shard_skipped(self, tmp_path):
        bad = tmp_path / "bad.tar"
        bad.write_bytes(b"this is not a tar file")
        good = str(tmp_path / "good.tar")
        self._make_tar(good, [("a", {"x.txt": b"1"})])
        rows = list(iter_shards([str(bad), good], ["x.txt"]))
        assert rows == [[b"1"]]

    def test_dotted_column_names(self, tmp_path):
        p = str(tmp_path / "s.tar")
        self._make_tar(p, [("k", {"input.jpg": b"i", "meta.json": b"{}"})])
        sample = next(iter_tar_samples(p))
        assert set(sample) == {"input.jpg", "meta.json"}


class TestCheckpointIO:
    def test_save_load_roundtrip(self, tmp_path):
        params = {"params": {"w": np.ones((2, 3), np.float32)}}
        noise = np.zeros((4, 8), np.float32)
        ckpt_io.save_checkpoint(
            str(tmp_path), "checkpoint", params, {"dim": 16, "model_type": "mlp_mixer"},
            step=7, epoch=2, noise=noise,
        )
        p, cfg, step, epoch, n = ckpt_io.load_checkpoint(str(tmp_path / "checkpoint"))
        np.testing.assert_array_equal(p["params"]["w"], params["params"]["w"])
        assert step == 7 and epoch == 2 and cfg.get("dim") == 16
        np.testing.assert_array_equal(n, noise)

    def test_load_model_from_reference_torch_checkpoint(self, tmp_path, rng):
        """The released-checkpoint path: torch {state_dict, config, step, epoch}
        with the reference's own Mixer -> converted mapper with identical outputs."""
        from mlp_mixer_pytorch import Mixer as TorchMixer

        tm = TorchMixer(
            input_dim=40, image_size=4, channels=8, patch_size=1, dim=32,
            depth=2, dropout=0.0,
        ).eval()
        cfg = {
            "model_type": "mlp_mixer", "dim": 32, "depth": 2, "dropout": 0,
            "clip_model": "ViT-B/32", "clip_dim": 32, "noise_dim": 8,
            "vq_image_size": 4,
            "vqgan_arch": {"z_channels": 8, "n_embed": 32, "embed_dim": 8,
                           "ch": 8, "ch_mult": [1, 2], "num_res_blocks": 1,
                           "attn_resolutions": [4], "resolution": 8},
        }
        path = str(tmp_path / "model.th")
        torch.save(
            {"state_dict": tm.state_dict(), "config": cfg, "step": 5, "epoch": 1},
            path,
        )
        mapper, params, loaded_cfg, noise = ckpt_io.load_model(path)
        assert loaded_cfg.get("model_type") == "mlp_mixer" and noise is None

        import jax.numpy as jnp

        x = rng.normal(size=(2, 40)).astype(np.float32)
        got = mapper.apply(params, jnp.asarray(x))
        with torch.no_grad():
            want = np.transpose(tm(torch.tensor(x)).numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    def test_load_model_legacy_whole_module_pickle(self, tmp_path, rng):
        """Legacy model.th path (main.py:568-575): whole nn.Module pickle with
        .config and .NOISE attributes."""
        from mlp_mixer_pytorch import Mixer as TorchMixer

        tm = TorchMixer(
            input_dim=40, image_size=4, channels=8, patch_size=1, dim=32,
            depth=1, dropout=0.0,
        ).eval()
        tm.config = {
            "model_type": "mlp_mixer", "dim": 32, "depth": 1, "dropout": 0,
            "clip_model": "ViT-B/32", "clip_dim": 32, "noise_dim": 8,
            "vq_image_size": 4,
            "vqgan_arch": {"z_channels": 8},
        }
        tm.NOISE = torch.randn(4, 8)
        path = str(tmp_path / "model.th")
        torch.save(tm, path)
        mapper, params, cfg, noise = ckpt_io.load_model(path)
        assert noise is not None and noise.shape == (4, 8)

        import jax.numpy as jnp

        x = rng.normal(size=(1, 40)).astype(np.float32)
        got = mapper.apply(params, jnp.asarray(x))
        with torch.no_grad():
            want = np.transpose(tm(torch.tensor(x)).numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


class TestVqganYaml:
    def test_plain_and_net2net_yaml(self, tmp_path):
        import yaml

        from feed_forward_vqgan_clip_tpu.config import make_config, vqgan_arch_config

        dd = dict(z_channels=8, resolution=16, in_channels=3, out_ch=3, ch=8,
                  ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[4], dropout=0.0)
        plain = dict(model=dict(target="taming.models.vqgan.VQModel",
                                params=dict(n_embed=32, embed_dim=8, ddconfig=dd)))
        net2net = dict(model=dict(
            target="taming.models.cond_transformer.Net2NetTransformer",
            params=dict(first_stage_config=dict(
                params=dict(n_embed=32, embed_dim=8, ddconfig=dd)))))
        for name, doc in (("plain.yaml", plain), ("n2n.yaml", net2net)):
            p = tmp_path / name
            yaml.safe_dump(doc, open(p, "w"))
            arch = vqgan_arch_config(make_config(vqgan_config=str(p)))
            assert arch["n_embed"] == 32 and arch["z_channels"] == 8
            assert arch["ch_mult"] == (1, 2)
