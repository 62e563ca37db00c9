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
