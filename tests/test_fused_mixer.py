"""Parity of the Pallas fused mixer-block inference path vs the XLA module path.

The fused path (models/mappers/fused.py + ops/pallas/mixer_block.py) must be a
drop-in for Mixer.apply on deterministic forwards: same params pytree, same
outputs. Runs in Pallas interpret mode on CPU; the compiled kernel itself is
exercised on the real TPU by bench.py / __graft_entry__.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feed_forward_vqgan_clip_tpu.models.mappers import build_mapper
from feed_forward_vqgan_clip_tpu.models.mappers.fused import (
    fused_mixer_forward,
    fused_supported,
    make_mapper_apply,
)
from feed_forward_vqgan_clip_tpu.models.mappers.mixer import Mixer


def _mk(dtype, dim=128, depth=2, s=16, input_dim=64, channels=32):
    mapper = Mixer(
        input_dim=input_dim,
        image_size=s,
        channels=channels,
        dim=dim,
        depth=depth,
        dtype=dtype,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (3, input_dim), jnp.float32)
    params = mapper.init(jax.random.PRNGKey(0), x)
    return mapper, params, x


def test_fused_matches_module_f32():
    mapper, params, x = _mk(jnp.float32)
    ref = mapper.apply(params, x)
    out = fused_mixer_forward(mapper, params, x, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_matches_module_bf16():
    mapper, params, x = _mk(jnp.bfloat16)
    ref = np.asarray(mapper.apply(params, x), np.float32)
    out = np.asarray(
        fused_mixer_forward(mapper, params, x, interpret=True), np.float32
    )
    # bf16 has ~8 mantissa bits; the two paths may round reductions differently.
    scale = max(1e-3, float(np.abs(ref).max()))
    assert np.max(np.abs(out - ref)) / scale < 0.03


def test_fused_supported_gates():
    mapper, _, _ = _mk(jnp.float32)
    assert fused_supported(mapper)
    # unaligned token count (S=8 -> T=64, not a multiple of 128)
    small = Mixer(input_dim=64, image_size=8, channels=32, dim=128, depth=1)
    assert not fused_supported(small)
    # unaligned feature dim
    odd = Mixer(input_dim=64, image_size=16, channels=32, dim=96, depth=1)
    assert not fused_supported(odd)
    # other mapper families fall back
    vit = build_mapper(
        dict(clip_model="ViT-B/32", model_type="vitgan", dim=64, depth=1,
             vq_image_size=16, num_heads=2),
        vq_channels=32,
    )
    assert not fused_supported(vit)


def test_make_mapper_apply_fallback_on_cpu():
    mapper, params, x = _mk(jnp.float32)
    # auto mode on CPU -> module path (no interpret-mode surprise in prod code)
    auto = make_mapper_apply(mapper)
    np.testing.assert_allclose(
        np.asarray(auto(params, x)), np.asarray(mapper.apply(params, x)), atol=0
    )
    # forced fused with interpret -> parity
    forced = make_mapper_apply(mapper, fused=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(forced(params, x)),
        np.asarray(mapper.apply(params, x)),
        atol=2e-5,
        rtol=2e-5,
    )


@pytest.mark.parametrize("dropout", [0.3])
def test_fused_ignores_dropout_like_deterministic(dropout):
    """Inference is deterministic; fused path must equal the deterministic
    module forward even when the module was built with dropout > 0."""
    mapper = Mixer(
        input_dim=64, image_size=16, channels=32, dim=128, depth=1, dropout=dropout
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64), jnp.float32)
    params = mapper.init(jax.random.PRNGKey(0), x)
    ref = mapper.apply(params, x, True)  # deterministic=True
    out = fused_mixer_forward(mapper, params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_pair_mode_bit_exact(monkeypatch):
    """FFVC_MIXER_PAIR=1 (two batch elements per grid step with manually
    interleaved MXU/VPU phases — ops/pallas/mixer_block._block_math_pair) is a
    pure scheduling change: per-element math is identical, so outputs must be
    BIT-exact vs the single-element kernel, and odd batches must fall back."""
    from feed_forward_vqgan_clip_tpu.ops.pallas import mixer_block as mb
    from feed_forward_vqgan_clip_tpu.ops.pallas.mixer_block import fused_mixer_block

    mapper, params, _ = _mk(jnp.float32)
    p = params["params"]["block_0"]
    h = jax.random.normal(jax.random.PRNGKey(2), (4, 256, 128), jnp.float32)
    single = fused_mixer_block(h, p, dtype=jnp.float32, interpret=True)
    single16 = fused_mixer_block(h, p, dtype=jnp.bfloat16, interpret=True)
    monkeypatch.setattr(mb, "_PAIR", True)
    paired = fused_mixer_block(h, p, dtype=jnp.float32, interpret=True)
    assert np.array_equal(np.asarray(paired), np.asarray(single))
    paired16 = fused_mixer_block(h, p, dtype=jnp.bfloat16, interpret=True)
    assert np.array_equal(
        np.asarray(paired16, np.float32), np.asarray(single16, np.float32)
    )
    odd = fused_mixer_block(h[:3], p, dtype=jnp.float32, interpret=True)
    assert np.array_equal(np.asarray(odd), np.asarray(single[:3]))




def _assert_grads_close(gp_got, gx_got, gp_ref, gx_ref, rel=1e-2):
    """Per-leaf relative comparison of grad pytrees. The fused backward's
    gelu' is a polynomial within 1.4e-5 of the true derivative (vs the module
    path's exact erf), which amplifies through depth and O(10) activation
    magnitudes to a few 1e-3 relative — hence the 1e-2 bar. Leaves whose
    reference grad is negligible relative to the global gradient scale are
    checked absolutely (token_fc2_bias is analytically ZERO: a per-row
    constant shift of the residual is absorbed by every downstream
    LayerNorm's mean subtraction, so its f32 value is pure roundoff)."""
    leaves_ref = jax.tree_util.tree_flatten_with_path(gp_ref)[0]
    got = dict(jax.tree_util.tree_flatten_with_path(gp_got)[0])
    gmax = max(float(np.abs(v).max()) for _, v in leaves_ref)
    np.testing.assert_allclose(
        np.asarray(gx_got), np.asarray(gx_ref), atol=rel * gmax * 1e-2, rtol=rel
    )
    for path, ref_val in leaves_ref:
        g = np.asarray(got[path])
        r = np.asarray(ref_val)
        diff = float(np.abs(g - r).max())
        scale = float(np.abs(r).max())
        if scale < 1e-4 * gmax:  # analytically-zero leaf: roundoff only
            assert diff < 1e-4 * gmax, f"{jax.tree_util.keystr(path)}: {diff} vs ~0"
        else:
            assert diff / scale < rel, (
                f"{jax.tree_util.keystr(path)}: rel err {diff / scale}"
            )


@pytest.mark.slow
def test_pipe_mode_matches_plain_kernel(monkeypatch):
    """FFVC_MIXER_PIPE (skewed kernel: channel phase of element j-1 + token
    phase of element j per grid step, channel FF in two Ec-halves) preserves
    per-element op order except that h4 is the SUM of two half-dots — an f32
    accumulation-order change only, so outputs match the plain kernel to f32
    rounding. Default dispatch: ON at batch >= 16, off below, env-forcible."""
    from feed_forward_vqgan_clip_tpu.ops.pallas import mixer_block as mb
    from feed_forward_vqgan_clip_tpu.ops.pallas.mixer_block import fused_mixer_block

    mapper, params, _ = _mk(jnp.float32)
    p = params["params"]["block_0"]
    h = jax.random.normal(jax.random.PRNGKey(2), (5, 256, 128), jnp.float32)
    plain = fused_mixer_block(h, p, dtype=jnp.float32, interpret=True)
    plain16 = np.asarray(
        fused_mixer_block(h, p, dtype=jnp.bfloat16, interpret=True), np.float32
    )
    monkeypatch.setattr(mb, "_PIPE_ENV", "1")
    piped = fused_mixer_block(h, p, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(piped), np.asarray(plain), rtol=1e-5, atol=1e-5
    )
    piped16 = np.asarray(
        fused_mixer_block(h, p, dtype=jnp.bfloat16, interpret=True), np.float32
    )
    np.testing.assert_allclose(piped16, plain16, rtol=2e-2, atol=2e-2)
    # batch-1 falls back to the plain kernel (no second element to skew with)
    one = fused_mixer_block(h[:1], p, dtype=jnp.float32, interpret=True)
    assert np.array_equal(np.asarray(one), np.asarray(plain[:1]))
    # default gating: off below the min batch, on at/above it
    monkeypatch.setattr(mb, "_PIPE_ENV", "")
    assert not mb._pipe_enabled(8)
    assert mb._pipe_enabled(16)


@pytest.mark.slow
def test_train_pipe_matches_plain_kernel(monkeypatch):
    """FFVC_FUSED_TRAIN_PIPE (skewed residual-emitting TRAIN forward) keeps
    per-element op order unchanged — no FF halving, unlike the infer pipe —
    so all seven outputs (out + saved residuals) match _fwd_res to rounding.
    (Not bit-exact in interpret mode: XLA-CPU reassociates the LN-stat
    reductions differently per program context — measured, the PLAIN kernel
    already differs ~9e-4 on inv2 from the same math traced standalone — so
    the bar is ~1 bf16 ULP on dtype outputs, tight f32 on the f32 path.)"""
    from feed_forward_vqgan_clip_tpu.ops.pallas import mixer_block as mb

    mapper, params, _ = _mk(jnp.float32)
    p = params["params"]["block_0"]
    h = jax.random.normal(jax.random.PRNGKey(3), (5, 256, 128), jnp.float32)
    names = ("out", "g1", "dg1", "rhat", "inv2", "g3", "dg3")
    for dt, atol in ((jnp.float32, 1e-5), (jnp.bfloat16, 0.04)):
        plain = mb._fwd_res(h, p, dt, True)
        piped = mb._fwd_res_pipe(h, p, dt, True)
        for name, a, b in zip(names, piped, plain):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = max(1.0, float(np.abs(b).max()))
            assert np.abs(a - b).max() <= atol * scale, (name, dt)

    def grads(env):
        monkeypatch.setattr(mb, "_TRAIN_PIPE_ENV", env)
        def scalar(pp, xx):
            return jnp.sum(mb.fused_mixer_block_train(xx, pp, jnp.float32, True) ** 2)
        return jax.grad(scalar, argnums=(0, 1))(p, h)

    gp_on, gx_on = grads("1")
    gp_off, gx_off = grads("0")
    np.testing.assert_allclose(
        np.asarray(gx_on), np.asarray(gx_off), rtol=1e-4, atol=1e-4
    )
    _assert_grads_close(gp_on, gx_on, gp_off, gx_off, rel=1e-3)
    # batch-1 falls back to the plain kernel (no second element to skew with)
    monkeypatch.setattr(mb, "_TRAIN_PIPE_ENV", "1")
    assert not mb._train_pipe_enabled(1)


def test_channel_bwd_pipe_matches_plain_kernel(monkeypatch):
    """FFVC_CHANNEL_BWD_PIPE (skewed channel backward, round 4): per-element
    terms and the accumulation sequence are identical to the unskewed kernel
    (da3 carried f32 in scratch), so ALL seven outputs — dr and the six param
    grads — must match the plain kernel to f32-tight tolerance."""
    from feed_forward_vqgan_clip_tpu.ops.pallas import mixer_block as mb

    mapper, params, _ = _mk(jnp.float32)
    p = params["params"]["block_0"]
    b, t, d = 5, 256, 128
    ec = p["channel_fc1"]["kernel"].shape[1]
    key = jax.random.PRNGKey(9)
    ks = jax.random.split(key, 5)
    dout = jax.random.normal(ks[0], (b, t, d), jnp.float32)
    rhat = jax.random.normal(ks[1], (b, t, d), jnp.float32)
    inv2 = jax.random.uniform(ks[2], (b, t, 1), jnp.float32, 0.5, 2.0)
    for dt, atol in ((jnp.float32, 1e-5), (jnp.bfloat16, 1e-5)):
        g3 = jax.random.normal(ks[3], (b, t, ec), dt)
        dgelu3 = jax.random.normal(ks[4], (b, t, ec), dt)
        monkeypatch.setattr(mb, "_CH_BWD_PIPE_ENV", "0")
        plain = mb._channel_bwd(dout, rhat, inv2, g3, dgelu3, p, dt, True)
        piped = mb._channel_bwd_pipe(dout, rhat, inv2, g3, dgelu3, p, dt, True)
        names = ("dr", "dw1", "db1", "dw2", "db2", "dls2", "dlb2")
        for name, a, bb in zip(names, piped, plain):
            a = np.asarray(a, np.float32)
            bb = np.asarray(bb, np.float32)
            scale = max(1.0, float(np.abs(bb).max()))
            assert np.abs(a - bb).max() <= atol * scale, (name, dt)
    # batch-1 falls back to the plain kernel (no second element to skew with)
    monkeypatch.setattr(mb, "_CH_BWD_PIPE_ENV", "1")
    assert not mb._channel_bwd_pipe_enabled(1)


class TestTrainGrads:
    """Pallas fused-block backward (custom_vjp) vs XLA autodiff of the module
    path: input grad + every param grad, interpret mode on CPU."""

    def _grads(self, fn, params, x, dout):
        def scalar(p, xx):
            return jnp.sum(fn(p, xx) * dout)

        gp, gx = jax.grad(scalar, argnums=(0, 1))(params, x)
        return gp, gx

    def test_block_grads_match_module_f32(self):
        from feed_forward_vqgan_clip_tpu.models.mappers.mixer import MixerBlock
        from feed_forward_vqgan_clip_tpu.ops.pallas.mixer_block import (
            fused_mixer_block_train,
        )

        t_side, dim = 16, 128  # T = 256 tokens (gate needs 128 | T)
        block = MixerBlock(tokens=t_side * t_side, dim=dim, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, t_side * t_side, dim))
        variables = block.init(jax.random.PRNGKey(0), x)
        p = variables["params"]
        dout = jax.random.normal(jax.random.PRNGKey(2), x.shape)

        gp_ref, gx_ref = self._grads(
            lambda pp, xx: block.apply({"params": pp}, xx), p, x, dout
        )
        gp_fused, gx_fused = self._grads(
            lambda pp, xx: fused_mixer_block_train(xx, pp, jnp.float32, True), p, x, dout
        )

        _assert_grads_close(gp_fused, gx_fused, gp_ref, gx_ref)

    def test_forward_train_matches_inference_kernel(self):
        from feed_forward_vqgan_clip_tpu.ops.pallas.mixer_block import (
            fused_mixer_block,
            fused_mixer_block_train,
        )

        mapper, params, x = _mk(jnp.float32, dim=128, depth=1)
        p = params["params"]["block_0"]
        h = jax.random.normal(jax.random.PRNGKey(3), (2, 256, 128))
        a = fused_mixer_block(h, p, dtype=jnp.float32, interpret=True)
        b = fused_mixer_block_train(h, p, jnp.float32, True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)

    def test_full_mapper_train_forward_grads(self):
        from feed_forward_vqgan_clip_tpu.models.mappers.fused import (
            fused_mixer_train_forward,
            make_mapper_train_apply,
        )

        mapper, params, x = _mk(jnp.float32, dim=128, depth=2)
        dout = jax.random.normal(jax.random.PRNGKey(5), (3, 16, 16, 32))

        def scalar(fn):
            def s(p, xx):
                return jnp.sum(fn(p, xx) * dout)
            return jax.grad(s, argnums=(0, 1))

        gp_ref, gx_ref = scalar(lambda p, xx: mapper.apply(p, xx))(params, x)
        gp_f, gx_f = scalar(
            lambda p, xx: fused_mixer_train_forward(mapper, p, xx, interpret=True)
        )(params, x)
        _assert_grads_close(gp_f, gx_f, gp_ref, gx_ref)

        # auto mode on CPU must fall back to the module path (differentiably)
        auto = make_mapper_train_apply(mapper)
        np.testing.assert_allclose(
            np.asarray(auto(params, x)), np.asarray(mapper.apply(params, x)), atol=0
        )


class TestStackedLayout:
    """Stacked-weights layout: the depth-streaming whole-stack kernel and the
    stacked per-block kernel must match the reference per-block kernel / the
    module path (ops/pallas/mixer_block.py stacked-layout section)."""

    def test_stream_matches_block_loop_f32(self):
        from feed_forward_vqgan_clip_tpu.ops.pallas.mixer_block import (
            fused_mixer_block,
            fused_mixer_stream,
            stack_mixer_params,
        )

        mapper, params, _ = _mk(jnp.float32, dim=128, depth=3)
        p = params["params"]
        blocks = [p[f"block_{i}"] for i in range(3)]
        sp = stack_mixer_params(blocks, dtype=jnp.float32)
        h = jax.random.normal(jax.random.PRNGKey(7), (2, 256, 128))
        ref = h
        for bp in blocks:
            ref = fused_mixer_block(ref, bp, dtype=jnp.float32, interpret=True)
        out = fused_mixer_stream(h, sp, dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6, rtol=1e-6)

    def test_stream_pair_mode_bit_exact(self, monkeypatch):
        """FFVC_MIXER_PAIR=1 on the depth-streaming kernel (two batch elements
        per grid step — halves per-element weight streaming) is a scheduling/
        traffic change only: bit-exact vs unpaired, odd batches fall back."""
        from feed_forward_vqgan_clip_tpu.ops.pallas import mixer_block as mb
        from feed_forward_vqgan_clip_tpu.ops.pallas.mixer_block import (
            fused_mixer_stream,
            stack_mixer_params,
        )

        mapper, params, _ = _mk(jnp.float32, dim=128, depth=3)
        p = params["params"]
        sp = stack_mixer_params(
            [p[f"block_{i}"] for i in range(3)], dtype=jnp.float32
        )
        h = jax.random.normal(jax.random.PRNGKey(9), (4, 256, 128))
        single = fused_mixer_stream(h, sp, dtype=jnp.float32, interpret=True)
        monkeypatch.setattr(mb, "_PAIR", True)
        paired = fused_mixer_stream(h, sp, dtype=jnp.float32, interpret=True)
        assert np.array_equal(np.asarray(paired), np.asarray(single))
        odd = fused_mixer_stream(h[:3], sp, dtype=jnp.float32, interpret=True)
        assert np.array_equal(np.asarray(odd), np.asarray(single[:3]))

    def test_stacked_block_matches_per_block(self):
        from feed_forward_vqgan_clip_tpu.ops.pallas.mixer_block import (
            fused_mixer_block,
            fused_mixer_block_stacked,
            stack_mixer_params,
        )

        mapper, params, _ = _mk(jnp.float32, dim=128, depth=2)
        p = params["params"]
        blocks = [p[f"block_{i}"] for i in range(2)]
        sp = stack_mixer_params(blocks, dtype=jnp.float32)
        h = jax.random.normal(jax.random.PRNGKey(8), (2, 256, 128))
        for i, bp in enumerate(blocks):
            a = fused_mixer_block(h, bp, dtype=jnp.float32, interpret=True)
            b = fused_mixer_block_stacked(
                h, sp, block_idx=i, dtype=jnp.float32, interpret=True
            )
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=0, rtol=0)

    def test_streamed_apply_matches_module(self):
        from feed_forward_vqgan_clip_tpu.models.mappers.fused import (
            make_streamed_mixer_apply,
            streamed_supported,
        )

        mapper, params, x = _mk(jnp.float32, dim=128, depth=2)
        assert streamed_supported(mapper)
        apply_fn = make_streamed_mixer_apply(mapper, params, interpret=True)
        ref = mapper.apply(params, x)
        out = apply_fn(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def test_streamed_apply_bf16(self):
        from feed_forward_vqgan_clip_tpu.models.mappers.fused import (
            make_streamed_mixer_apply,
        )

        mapper, params, x = _mk(jnp.bfloat16, dim=128, depth=2)
        apply_fn = make_streamed_mixer_apply(mapper, params, interpret=True)
        ref = np.asarray(mapper.apply(params, x), np.float32)
        out = np.asarray(apply_fn(x), np.float32)
        scale = max(1e-3, float(np.abs(ref).max()))
        assert np.max(np.abs(out - ref)) / scale < 0.03
