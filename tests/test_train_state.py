"""Optimizer/TrainState unit tests.

Covers the `opt_dtype` framework extension (train/state.py:
_scale_by_adam_cast_state — Adam with BOTH moments stored in bf16, f32 math;
the reference trains f32 torch.Adam, main.py:591, so bf16 state is an opt-in
deviation) plus the msgpack roundtrip of low-precision optimizer state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from feed_forward_vqgan_clip_tpu.train.state import (
    _scale_by_adam_cast_state,
    make_optimizer,
    make_train_state,
)


def _params():
    k = jax.random.PRNGKey(0)
    return {
        "w": jax.random.normal(k, (8, 16), jnp.float32),
        "b": jnp.zeros((16,), jnp.float32),
    }


def _grads(i):
    k = jax.random.PRNGKey(100 + i)
    return {
        "w": jax.random.normal(k, (8, 16), jnp.float32) * 0.1,
        "b": jax.random.normal(jax.random.fold_in(k, 1), (16,), jnp.float32),
    }


def test_cast_state_f32_matches_optax_scale_by_adam():
    """With state_dtype=float32 the custom transform's rule must reproduce
    optax.scale_by_adam (eps_root=0) — pins the bias-correction and count
    wiring independent of any bf16 rounding."""
    p = _params()
    ours = _scale_by_adam_cast_state(0.9, 0.999, 1e-8, jnp.float32)
    ref = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    s_o, s_r = ours.init(p), ref.init(p)
    for i in range(5):
        g = _grads(i)
        u_o, s_o = ours.update(g, s_o)
        u_r, s_r = ref.update(g, s_r)
        for k in p:
            np.testing.assert_allclose(
                np.asarray(u_o[k]), np.asarray(u_r[k]), rtol=1e-6, atol=1e-7
            )
    assert int(s_o.count) == int(s_r.count) == 5


def test_make_optimizer_bf16_state_dtype_and_update_close():
    """opt_dtype='bfloat16' stores mu AND nu in bf16; updates stay within
    bf16-accumulation rounding (~1%) of the stock f32 adam."""
    p = _params()
    tx16 = make_optimizer(1e-3, opt_dtype="bfloat16")
    tx32 = make_optimizer(1e-3)
    s16, s32 = tx16.init(p), tx32.init(p)
    # find the ScaleByAdamState inside the chain state
    flat = [
        s
        for s in jax.tree.leaves(s16, is_leaf=lambda x: hasattr(x, "mu"))
        if hasattr(s, "mu")
    ]
    assert flat, "no ScaleByAdamState found in chain state"
    adam16 = flat[0]
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(adam16.mu))
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(adam16.nu))

    p16, p32 = dict(p), dict(p)
    for i in range(10):
        g = _grads(i)
        u16, s16 = tx16.update(g, s16, p16)
        u32, s32 = tx32.update(g, s32, p32)
        p16 = optax.apply_updates(p16, u16)
        p32 = optax.apply_updates(p32, u32)
    for k in p:
        a, b = np.asarray(p16[k]), np.asarray(p32[k])
        # per-step updates are ~lr-sized; bf16 moment rounding perturbs each by
        # <~1% relative, so after 10 steps the params differ by <<1 lr unit
        np.testing.assert_allclose(a, b, atol=2e-4)
        assert np.all(np.isfinite(a))


def test_bf16_opt_state_msgpack_roundtrip(tmp_path):
    """The train loop persists opt_state via save_pytree/load_pytree
    (train/loop.py); bf16 moment leaves must survive byte-exactly."""
    from feed_forward_vqgan_clip_tpu.io import checkpoint as ckpt_io

    p = _params()
    tx = make_optimizer(1e-3, opt_dtype="bfloat16")
    s = tx.init(p)
    _, s = tx.update(_grads(0), s, p)
    path = str(tmp_path / "opt.msgpack")
    ckpt_io.save_pytree(path, s)
    loaded = ckpt_io.load_pytree(path, like=s)
    for got, want in zip(jax.tree.leaves(loaded), jax.tree.leaves(s)):
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("bad", ["float16x", "notadtype"])
def test_bad_opt_dtype_raises(bad):
    with pytest.raises(TypeError):
        make_optimizer(1e-3, opt_dtype=bad)


class TestEMAWarmup:
    """torch_ema `use_num_updates=True` decay ramp (the reference's default,
    main.py:520-525): update t applies decay_t = min(decay, (1+t)/(10+t)),
    t counting EMA updates from 1. Oracle below is torch_ema's update() rule
    restated in numpy (s -= (1-d)*(s-p)); torch_ema itself isn't in the image."""

    def _run(self, steps, *, ema_decay, ema_warmup):
        p = _params()
        tx = make_optimizer(1e-2, opt_dtype="float32")
        state = make_train_state(
            p, tx, use_ema=True, ema_decay=ema_decay, ema_warmup=ema_warmup
        )
        # numpy mirror of params + torch_ema shadow
        shadow = {k: np.asarray(v).copy() for k, v in p.items()}
        for i in range(steps):
            g = _grads(i)
            state = state.apply_gradients(g)
            d = ema_decay
            if ema_warmup:
                d = min(d, (1 + (i + 1)) / (10 + (i + 1)))
            for k in shadow:
                live = np.asarray(state.params[k])
                shadow[k] = shadow[k] - (1.0 - d) * (shadow[k] - live)
        return state, shadow

    def test_warmup_matches_torch_ema_rule(self):
        state, shadow = self._run(25, ema_decay=0.995, ema_warmup=True)
        for k in shadow:
            np.testing.assert_allclose(
                np.asarray(state.ema_params[k]), shadow[k], rtol=1e-6, atol=1e-7
            )

    def test_warmup_off_is_fixed_decay(self):
        state, shadow = self._run(5, ema_decay=0.9, ema_warmup=False)
        for k in shadow:
            np.testing.assert_allclose(
                np.asarray(state.ema_params[k]), shadow[k], rtol=1e-6, atol=1e-7
            )

    def test_early_warmup_tracks_params_closely(self):
        # first update blends ~82% live params (decay 2/11): the warmed-up EMA
        # must sit far closer to the live params than the fixed-0.995 one
        warm, _ = self._run(3, ema_decay=0.995, ema_warmup=True)
        fixed, _ = self._run(3, ema_decay=0.995, ema_warmup=False)
        gap = lambda s: sum(
            float(np.abs(np.asarray(s.ema_params[k]) - np.asarray(s.params[k])).sum())
            for k in s.params
        )
        assert gap(warm) < 0.2 * gap(fixed)


def test_save_pytree_is_atomic(tmp_path):
    """save_pytree goes through tmp+rename: no .tmp residue, and an existing
    file is either the old or the new complete version — never torn."""
    from feed_forward_vqgan_clip_tpu.io import checkpoint as ckpt_io

    path = str(tmp_path / "t.msgpack")
    ckpt_io.save_pytree(path, {"a": np.arange(3)})
    ckpt_io.save_pytree(path, {"a": np.arange(3) + 1})
    assert not list(tmp_path.glob("*.tmp"))
    got = ckpt_io.load_pytree(path)
    np.testing.assert_array_equal(got["a"], np.arange(3) + 1)


def test_async_saver_orders_and_raises():
    """_AsyncSaver: writes run in submit order (single slot), and a failed
    write re-raises at the next submit/wait instead of being swallowed."""
    from feed_forward_vqgan_clip_tpu.train.loop import _AsyncSaver

    s = _AsyncSaver()
    seen = []
    s.submit(lambda: seen.append(1))
    s.submit(lambda: seen.append(2))  # joins the first before starting
    s.wait()
    assert seen == [1, 2]

    def boom():
        raise IOError("disk full")

    s.submit(boom)
    with pytest.raises(IOError, match="disk full"):
        s.wait()
    # the error is cleared after being raised once
    s.submit(lambda: seen.append(3))
    s.wait()
    assert seen == [1, 2, 3]
