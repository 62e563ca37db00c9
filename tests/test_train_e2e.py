"""End-to-end training + inference smoke tests on the 8-device CPU mesh.

This is the minimum end-to-end slice of SURVEY.md §7 (stages 1-7). Each test is a
full training run, so configs are consolidated to keep compile count low.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feed_forward_vqgan_clip_tpu.config import make_config
from feed_forward_vqgan_clip_tpu.train.loop import train

TINY_VQ = dict(
    n_embed=32, embed_dim=8, z_channels=8, ch=8, ch_mult=(1, 2),
    num_res_blocks=1, attn_resolutions=(4,), resolution=8,
)


def _base_cfg(tmp_path, **kw):
    cfg = dict(
        clip_model="tiny",
        vqgan_arch=TINY_VQ,
        model_type="mlp_mixer",
        dim=16, depth=1, dropout=0,
        vq_image_size=4,
        batch_size=8, repeat=1, cutn=2,
        cut_size=32, pool_size=32,
        lr=1e-3, epochs=100, max_steps=3, log_interval=2,
        folder=str(tmp_path),
        compute_dtype="float32",
        noise_dim=0,
        seed=0,
    )
    cfg.update(kw)
    return make_config(**cfg)


@pytest.fixture
def token_data(tmp_path):
    path = os.path.join(tmp_path, "toks.npz")
    toks = np.zeros((16, 77), np.int32)
    toks[:, 0] = 49406
    toks[:, 1] = np.arange(16) + 5
    toks[:, 2] = 49407
    np.savez(path, tokens=toks)
    return path


@pytest.fixture
def feature_data(tmp_path):
    path = os.path.join(tmp_path, "feats.npz")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 32)).astype(np.float32)
    y = rng.normal(size=(16, 32)).astype(np.float32)
    np.savez(path, x=x, y=y)
    return path


@pytest.mark.slow
class TestTrainE2E:
    def test_token_dataset_full_flow(self, tmp_path, token_data):
        """Train on tokens, check artifacts, resume, then run inference."""
        cfg = _base_cfg(tmp_path, path=token_data, max_steps=2)
        state = train(cfg)
        assert int(state.step) == 2
        assert os.path.exists(tmp_path / "checkpoint" / "params.msgpack")
        assert os.path.exists(tmp_path / "opt" / "state.msgpack")
        assert os.path.exists(tmp_path / "progress.png")
        assert os.path.exists(tmp_path / "fixed_batch_progress.png")

        # resume continues the step count (same compiled shapes -> fast)
        state = train(_base_cfg(tmp_path, path=token_data, max_steps=4))
        assert int(state.step) == 4

        from feed_forward_vqgan_clip_tpu.infer import Generator

        gen = Generator(str(tmp_path / "checkpoint"))
        H = jax.random.normal(jax.random.PRNGKey(0), (2, 32))
        imgs = np.asarray(gen.generate(H, nb_repeats=2, seed=1))
        assert imgs.shape == (4, 8, 8, 3)
        assert imgs.min() >= 0 and imgs.max() <= 1

    def test_feature_pairs_all_knobs(self, tmp_path, feature_data):
        """One run exercising: input_loss, l2, tv, diversity, normalize_input,
        repeat>1, noise bank, EMA, cosine schedule, grad clipping, bf16 Adam
        moments; then inference with the restored noise bank."""
        cfg = _base_cfg(
            tmp_path, path=feature_data, input_loss=True, l2_coef=0.1,
            tv_coef=0.1, normalize_input=True, repeat=2, diversity_coef=0.05,
            noise_dim=8, nb_noise=4, use_ema=True, ema_decay=0.9,
            scheduler="cosine", clip_grad_norm=1.0, max_steps=3, dropout=0.1,
            opt_dtype="bfloat16",
        )
        state = train(cfg)
        assert int(state.step) == 3
        moments = [
            s for s in jax.tree.leaves(
                state.opt_state, is_leaf=lambda x: hasattr(x, "mu"))
            if hasattr(s, "mu")
        ]
        assert moments and all(
            l.dtype == jnp.bfloat16 for l in jax.tree.leaves(moments[0].mu)
        )
        noise_path = tmp_path / "checkpoint" / "noise.npy"
        assert noise_path.exists() and np.load(noise_path).shape == (4, 8)
        assert os.path.exists(tmp_path / "checkpoint_ema" / "params.msgpack")

        from feed_forward_vqgan_clip_tpu.infer import Generator

        gen = Generator(str(tmp_path / "checkpoint"))
        assert gen.noise_bank is not None
        H = jax.random.normal(jax.random.PRNGKey(0), (1, 32))
        assert np.asarray(gen.generate(H, nb_repeats=3, seed=0)).shape == (3, 8, 8, 3)

    def test_resume_reproduces_uninterrupted_run(self, tmp_path, feature_data):
        """Interrupted+resumed training equals the uninterrupted run bitwise.

        Pins the (seed, step)-keyed noise-bank row draw (train/loop.batch_for)
        plus step-keyed aug rngs and exact opt/EMA checkpoint roundtrips — the
        reference is NOT resume-reproducible (unseeded np.random.permutation,
        main.py:689-694); this is a conscious fix, see PARITY.md."""
        kw = dict(
            path=feature_data, noise_dim=8, nb_noise=4, use_ema=True,
            log_interval=100,
        )
        a = train(_base_cfg(tmp_path, folder=str(tmp_path / "a"), max_steps=4, **kw))
        train(_base_cfg(tmp_path, folder=str(tmp_path / "b"), max_steps=2, **kw))
        b = train(_base_cfg(tmp_path, folder=str(tmp_path / "b"), max_steps=4, **kw))
        assert int(a.step) == int(b.step) == 4
        for pa, pb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
        for ea, eb in zip(jax.tree.leaves(a.ema_params), jax.tree.leaves(b.ema_params)):
            np.testing.assert_array_equal(np.asarray(ea), np.asarray(eb))

    def test_mesh_2d_model_axis(self, tmp_path, feature_data, monkeypatch):
        # 4-way data x 2-way tensor parallel over the 8 virtual devices
        cfg = _base_cfg(
            tmp_path, path=feature_data, mesh_shape={"data": 4, "model": 2},
        )
        # TP must force the XLA module path for the mapper: the fused Pallas
        # kernels hold whole weight tensors and declare no partitioning rule
        # (train/loop.py tp_active gate)
        from feed_forward_vqgan_clip_tpu.models.mappers import fused as F

        seen = {}
        orig = F.make_mapper_train_apply

        def spy(mapper, **kw):
            seen.update(kw)
            return orig(mapper, **kw)

        monkeypatch.setattr(F, "make_mapper_train_apply", spy)
        state = train(cfg)
        assert seen.get("fused") is False
        assert int(state.step) == 3
        # TP must actually shard the mixer FFN kernels over 'model'
        from jax.sharding import PartitionSpec as P

        k1 = state.params["params"]["block_0"]["channel_fc1"]["kernel"]
        k2 = state.params["params"]["block_0"]["channel_fc2"]["kernel"]
        assert tuple(k1.sharding.spec) == (None, "model"), k1.sharding
        # trailing Nones are normalized away by jit round-trips
        assert tuple(k2.sharding.spec)[:1] == ("model",), k2.sharding
        # and the optimizer moments inherit the same layout
        mu = jax.tree.leaves(
            jax.tree.map(lambda x: x, state.opt_state), is_leaf=lambda x: hasattr(x, "sharding")
        )
        assert any(
            getattr(m, "sharding", None) is not None
            and getattr(m.sharding, "spec", None) == P(None, "model")
            for m in mu
        )

    def test_loss_decreases_over_training(self, tmp_path, feature_data):
        # With random frozen CLIP/VQGAN the spherical-distance landscape is pure
        # noise (straight-through VQ over random codes), so optimize the
        # deterministic L2 term — it still drives the full step machinery
        # (mapper fwd, synth, cutouts, CLIP encode, grads, Adam).
        cfg = _base_cfg(
            tmp_path, path=feature_data, max_steps=40, lr=1e-2, log_interval=100,
            cutn=1, augs=["Cc"], noise_fac=0.0, target_loss_coef=0.0, l2_coef=1.0,
        )
        from feed_forward_vqgan_clip_tpu.train import loop as L

        losses = []
        orig = L.make_train_step

        def spy(*a, **k):
            step_fn, loss_fn = orig(*a, **k)

            def wrapped(state, fz, batch, key):
                new_state, m = step_fn(state, fz, batch, key)
                losses.append(float(m["loss"]))
                return new_state, m

            return wrapped, loss_fn

        L.make_train_step = spy
        try:
            train(cfg)
        finally:
            L.make_train_step = orig
        assert len(losses) == 40
        assert np.mean(losses[-5:]) < 0.5 * np.mean(losses[:5])
