"""Unit tests for the core differentiable ops (SURVEY.md §4 test strategy:
quantizer straight-through gradients, clamp gradient mask, spherical-distance values)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feed_forward_vqgan_clip_tpu.ops import (
    clamp_with_grad,
    l2_loss,
    replace_grad,
    spherical_dist_loss,
    tv_loss,
    vector_quantize,
)
from feed_forward_vqgan_clip_tpu.ops.losses import (
    diversity_loss,
    normalize,
    normalize_tensor,
)
from feed_forward_vqgan_clip_tpu.ops.quantize import nearest_codebook_indices
from feed_forward_vqgan_clip_tpu.ops.pallas.vq_lookup import (
    nearest_codebook_indices_pallas,
)


class TestReplaceGrad:
    def test_forward_value(self):
        xf = jnp.array([1.0, 2.0])
        xb = jnp.array([10.0, 20.0])
        np.testing.assert_allclose(replace_grad(xf, xb), xf)

    def test_backward_routes_to_xb(self):
        xf = jnp.array([1.0, 2.0])
        xb = jnp.array([10.0, 20.0])
        g = jax.grad(lambda a, b: jnp.sum(replace_grad(a, b) * 3.0), argnums=(0, 1))
        ga, gb = g(xf, xb)
        np.testing.assert_allclose(ga, jnp.zeros_like(xf))
        np.testing.assert_allclose(gb, jnp.full_like(xb, 3.0))

    def test_broadcast_sums_to_size(self):
        # reference uses grad_in.sum_to_size(x_backward.shape) (main.py:113)
        xf = jnp.ones((4, 3))
        xb = jnp.ones((1, 3))
        gb = jax.grad(lambda b: jnp.sum(replace_grad(xf, b)))(xb)
        np.testing.assert_allclose(gb, jnp.full((1, 3), 4.0))


class TestClampWithGrad:
    def test_forward_is_clip(self):
        x = jnp.array([-2.0, 0.5, 2.0])
        np.testing.assert_allclose(clamp_with_grad(x, -1.0, 1.0), [-1.0, 0.5, 1.0])

    def test_gradient_mask(self):
        # grad passes where it doesn't push further out of range (main.py:127-129):
        # keep iff g * (x - clamp(x)) >= 0.
        x = jnp.array([-2.0, 0.0, 2.0])

        # upstream gradient +1 everywhere: at x=-2 (x-clamped=-1): g*(x-y)=-1 <0 -> drop
        # at x=0: 0 >= 0 -> keep; at x=2: (x-y)=1 -> keep
        g = jax.grad(lambda v: jnp.sum(clamp_with_grad(v, -1.0, 1.0)))(x)
        np.testing.assert_allclose(g, [0.0, 1.0, 1.0])

        # upstream gradient -1: opposite mask on the out-of-range points
        g = jax.grad(lambda v: -jnp.sum(clamp_with_grad(v, -1.0, 1.0)))(x)
        np.testing.assert_allclose(g, [-1.0, -1.0, 0.0])

    def test_traced_bounds(self):
        x = jnp.array([-2.0, 0.5, 2.0])
        lo = jnp.float32(-1.0)
        hi = jnp.float32(1.0)
        y = jax.jit(clamp_with_grad)(x, lo, hi)
        np.testing.assert_allclose(y, [-1.0, 0.5, 1.0])


class TestVectorQuantize:
    def test_picks_nearest(self, rng):
        codebook = jnp.asarray(rng.normal(size=(17, 4)), jnp.float32)
        x = codebook[jnp.array([3, 9, 16])] + 0.01
        idx = nearest_codebook_indices(x, codebook)
        np.testing.assert_array_equal(idx, [3, 9, 16])
        xq = vector_quantize(x, codebook, use_pallas=False)
        np.testing.assert_allclose(xq, codebook[jnp.array([3, 9, 16])], atol=1e-6)

    def test_straight_through_grad(self, rng):
        codebook = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(5, 4)), jnp.float32)
        g = jax.grad(
            lambda v: jnp.sum(vector_quantize(v, codebook, use_pallas=False) * 2.0)
        )(x)
        np.testing.assert_allclose(g, jnp.full_like(x, 2.0))

    def test_first_match_ties(self):
        codebook = jnp.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        idx = nearest_codebook_indices(jnp.array([[1.0, 0.0]]), codebook)
        assert int(idx[0]) == 0

    def test_pallas_kernel_matches_xla(self, rng):
        codebook = jnp.asarray(rng.normal(size=(300, 16)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(70, 16)), jnp.float32)
        ref = nearest_codebook_indices(x, codebook)
        got = nearest_codebook_indices_pallas(x, codebook, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_pallas_kernel_batched_shape(self, rng):
        codebook = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(2, 3, 3, 8)), jnp.float32)
        got = nearest_codebook_indices_pallas(x, codebook, interpret=True)
        ref = nearest_codebook_indices(x, codebook)
        assert got.shape == (2, 3, 3)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestVQMultiDevice:
    """The multi-device VQ story (train/loop._use_pallas_for + the shard_map
    route in vector_quantize): Pallas stays ON under pure DP (per-shard
    kernels), falls back to XLA whenever the 'model' axis is sharded —
    including the {'data': 1, 'model': 2} case where the old data-axis-only
    gate kept an unpartitionable pallas_call enabled across 2 devices."""

    def test_gate_per_axis(self):
        from feed_forward_vqgan_clip_tpu.parallel import mesh as meshlib
        from feed_forward_vqgan_clip_tpu.train.loop import _use_pallas_for

        cfg = {"use_pallas": True}
        devs = jax.devices()
        dp = meshlib.make_mesh({"data": 8, "model": 1})
        assert _use_pallas_for(cfg, dp) == (True, dp)
        assert _use_pallas_for(cfg, meshlib.make_mesh({"data": 4, "model": 2})) == (
            False, None,
        )
        # pure TP, data == 1: still multi-device, must fall back to XLA
        tp = meshlib.make_mesh({"data": 1, "model": 2}, devices=devs[:2])
        assert _use_pallas_for(cfg, tp) == (False, None)
        single = meshlib.make_mesh({"data": 1, "model": 1}, devices=devs[:1])
        assert _use_pallas_for(cfg, single) == (True, None)
        assert _use_pallas_for(cfg, None) == (True, None)

    def test_sharded_pallas_lookup_matches_single_device(self, rng, monkeypatch):
        import functools

        from feed_forward_vqgan_clip_tpu.ops.pallas import vq_lookup
        from feed_forward_vqgan_clip_tpu.parallel import mesh as meshlib

        calls = []
        orig = vq_lookup.nearest_codebook_indices_pallas

        def spy(x, cb):
            calls.append(tuple(x.shape))
            return orig(x, cb, interpret=True)  # CPU needs interpret mode

        monkeypatch.setattr(vq_lookup, "nearest_codebook_indices_pallas", spy)
        mesh = meshlib.make_mesh({"data": 8, "model": 1})
        codebook = jnp.asarray(rng.normal(size=(96, 8)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(16, 3, 3, 8)), jnp.float32)
        got = vector_quantize(x, codebook, use_pallas=True, data_mesh=mesh)
        ref = vector_quantize(x, codebook, use_pallas=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
        # the kernel saw the LOCAL shard (16/8 = 2 rows), not the global batch
        assert calls and calls[0][0] == 2

        # straight-through gradient is untouched by the shard_map route
        g = jax.grad(
            lambda v: jnp.sum(
                vector_quantize(v, codebook, use_pallas=True, data_mesh=mesh) * 2.0
            )
        )(x)
        np.testing.assert_allclose(np.asarray(g), np.full(x.shape, 2.0), atol=1e-6)


class TestLosses:
    def test_spherical_dist_known_values(self):
        a = jnp.array([[1.0, 0.0]])
        # identical vectors -> 0
        np.testing.assert_allclose(spherical_dist_loss(a, a), 0.0, atol=1e-7)
        # orthogonal unit vectors: ||a-b|| = sqrt(2), arcsin(sqrt(2)/2)=pi/4
        b = jnp.array([[0.0, 1.0]])
        expect = 2.0 * (np.pi / 4) ** 2
        np.testing.assert_allclose(spherical_dist_loss(a, b), expect, rtol=1e-6)
        # antipodal: arcsin(1) = pi/2 -> pi^2/2
        c = jnp.array([[-1.0, 0.0]])
        np.testing.assert_allclose(
            spherical_dist_loss(a, c), np.pi**2 / 2, rtol=1e-6
        )

    def test_tv_loss(self):
        # constant image -> 0
        x = jnp.ones((2, 4, 4, 3))
        np.testing.assert_allclose(tv_loss(x), 0.0)
        # ramp along H with slope 1 -> dH mean 1, dW 0 -> 0.5
        ramp = jnp.broadcast_to(
            jnp.arange(4.0)[None, :, None, None], (1, 4, 4, 3)
        )
        np.testing.assert_allclose(tv_loss(ramp), 0.5)

    def test_l2(self):
        np.testing.assert_allclose(l2_loss(jnp.full((2, 3), 2.0)), 4.0)

    def test_normalize_matches_torch_semantics(self, rng):
        x = jnp.asarray(rng.normal(size=(4, 7)), jnp.float32)
        y = normalize(x)
        np.testing.assert_allclose(
            jnp.linalg.norm(y, axis=-1), jnp.ones(4), rtol=1e-6
        )

    def test_normalize_tensor(self, rng):
        f = jnp.asarray(rng.normal(size=(2, 3, 3, 5)), jnp.float32)
        nt = normalize_tensor(f)
        norms = jnp.linalg.norm(nt, axis=-1)
        np.testing.assert_allclose(norms, jnp.ones_like(norms), rtol=1e-4)

    def test_diversity_zero_for_identical(self, rng):
        f = jnp.asarray(rng.normal(size=(2, 4, 4, 6)), jnp.float32)
        # repeat=2 copies of the same bs=2 features -> zero diversity
        fm = jnp.concatenate([f[:2], f[:2]], axis=0)
        d = diversity_loss([fm], repeat=2, bs=2, mode="between_same_prompts")
        np.testing.assert_allclose(d, 0.0, atol=1e-10)
        d_all = diversity_loss([f], repeat=1, bs=2, mode="all")
        assert float(d_all) > 0.0

    def test_diversity_mode_validation(self):
        with pytest.raises(ValueError):
            diversity_loss([jnp.ones((2, 2, 2, 2))], 1, 2, mode="bogus")
