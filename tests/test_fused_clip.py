"""Parity: the fused CLIP image-encode path (models/clip_fused.py +
ops/pallas/mlp_ln.py, interpret mode on CPU) vs the stock flax module —
forward embeddings AND gradients through a downstream loss, for both
activations (quick_gelu / gelu). The dispatcher must also fall back cleanly
on unsupported shapes and non-CLIP modules."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feed_forward_vqgan_clip_tpu.models.clip_fused import (
    clip_fused_supported,
    encode_image_fused,
    make_clip_image_apply,
)
from feed_forward_vqgan_clip_tpu.models.clip_vit import CLIP
from feed_forward_vqgan_clip_tpu.ops.pallas.mlp_ln import fused_mlp_ln, mlp_ln_supported

# lane-dim alignment (128 | width, 128 | 4*width) is required by the kernel, so
# the tiny tower uses width 128; token count 17 (16 patches + cls) x batch 16
# gives rows=272 -> tile 16.
CFG = dict(
    image_size=32, patch_size=8, vision_width=128, vision_layers=2,
    vision_heads=4, embed_dim=32, text_width=32, text_layers=1, text_heads=2,
    vocab_size=64, context_length=8,
)


def _mk(act, dtype):
    m = CLIP(act=act, dtype=dtype, **CFG)
    v = m.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, CFG["context_length"]), jnp.int32),
        jnp.zeros((1, 32, 32, 3), jnp.float32),
    )
    return m, v


class TestFusedMLPLn:
    @pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
    def test_matches_xla_and_grads(self, rng, act):
        n, d, e = 64, 128, 512
        p = {
            "ln": {
                "scale": jnp.asarray(1 + 0.1 * rng.normal(size=(d,)), jnp.float32),
                "bias": jnp.asarray(0.1 * rng.normal(size=(d,)), jnp.float32),
            },
            "fc1": {
                "kernel": jnp.asarray(rng.normal(size=(d, e)) * 0.05, jnp.float32),
                "bias": jnp.asarray(rng.normal(size=(e,)) * 0.05, jnp.float32),
            },
            "fc2": {
                "kernel": jnp.asarray(rng.normal(size=(e, d)) * 0.05, jnp.float32),
                "bias": jnp.asarray(rng.normal(size=(d,)) * 0.05, jnp.float32),
            },
        }
        x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)

        def ref(x, p):
            xf = x.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            var = jnp.square(xf - mu).mean(-1, keepdims=True)
            h = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * p["ln"]["scale"] + p["ln"]["bias"]
            h = h @ p["fc1"]["kernel"] + p["fc1"]["bias"]
            if act == "quick_gelu":
                h = h * jax.nn.sigmoid(1.702 * h)
            else:
                h = jax.nn.gelu(h, approximate=False)
            return x + (h @ p["fc2"]["kernel"] + p["fc2"]["bias"])

        fused = functools.partial(
            fused_mlp_ln, act=act, dtype=jnp.float32, interpret=True
        )
        got = fused(x, p)
        want = ref(x, p)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

        def loss_f(fn):
            def L(x, p):
                y = fn(x, p)
                return jnp.sum(jnp.square(y.astype(jnp.float32))) / n
            return jax.grad(L, argnums=(0, 1))

        gx_f, gp_f = loss_f(fused)(x, p)
        gx_r, gp_r = loss_f(ref)(x, p)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=5e-3)
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(gp_f)[0],
            jax.tree_util.tree_flatten_with_path(gp_r)[0],
        ):
            scale = max(1e-2, float(np.abs(np.asarray(b)).max()))
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-3 * scale,
                err_msg=f"param grad mismatch at {jax.tree_util.keystr(path)}",
            )

    def test_shape_gates(self):
        assert mlp_ln_supported(3200, 768, 3072)  # train flagship rows
        assert not mlp_ln_supported(3200, 760, 3040)  # lane misalignment
        assert not mlp_ln_supported(17, 768, 3072)  # no row tile divides 17


class TestFusedCLIPTower:
    @pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
    def test_encode_image_parity(self, rng, act):
        m, v = _mk(act, jnp.float32)
        x = jnp.asarray(rng.normal(size=(16, 32, 32, 3)), jnp.float32)
        assert clip_fused_supported(m, 16, 32)
        got = encode_image_fused(m, v, x, interpret=True)
        want = m.apply(v, x, method=m.encode_image)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)

    def test_grads_parity(self, rng):
        m, v = _mk("quick_gelu", jnp.float32)
        x = jnp.asarray(rng.normal(size=(16, 32, 32, 3)), jnp.float32)
        tgt = jnp.asarray(rng.normal(size=(16, CFG["embed_dim"])), jnp.float32)

        def L_fused(v):
            e = encode_image_fused(m, v, x, interpret=True)
            return jnp.mean(jnp.square(e - tgt))

        def L_mod(v):
            e = m.apply(v, x, method=m.encode_image)
            return jnp.mean(jnp.square(e - tgt))

        gf = jax.grad(L_fused)(v)
        gm = jax.grad(L_mod)(v)
        # text-tower leaves get zero grads on both paths; compare everything
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(gf)[0],
            jax.tree_util.tree_flatten_with_path(gm)[0],
        ):
            scale = max(1e-2, float(np.abs(np.asarray(b)).max()))
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3 * scale,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
            )

    def test_dispatcher_falls_back(self, rng, monkeypatch):
        m, v = _mk("quick_gelu", jnp.float32)
        # CPU backend -> auto-gate picks the module path; result still correct
        apply = make_clip_image_apply(m)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        want = m.apply(v, x, method=m.encode_image)
        np.testing.assert_allclose(
            np.asarray(apply(v, x)), np.asarray(want), atol=1e-6
        )
        # env kill-switch
        monkeypatch.setenv("FFVC_FUSED_CLIP", "0")
        apply2 = make_clip_image_apply(m, fused=True)
        np.testing.assert_allclose(
            np.asarray(apply2(v, x)), np.asarray(want), atol=1e-6
        )

    def test_forced_fused_on_cpu_interpret(self, rng):
        m, v = _mk("quick_gelu", jnp.float32)
        apply = make_clip_image_apply(m, fused=True, interpret=True)
        x = jnp.asarray(rng.normal(size=(16, 32, 32, 3)), jnp.float32)
        want = m.apply(v, x, method=m.encode_image)
        np.testing.assert_allclose(
            np.asarray(apply(v, x)), np.asarray(want), atol=5e-4
        )
