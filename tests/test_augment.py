"""Augmentation/pooling/cutout tests: torch parity for adaptive pools, geometric
sanity for warps, PRNG determinism, probability gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from feed_forward_vqgan_clip_tpu.ops import augment as A
from feed_forward_vqgan_clip_tpu.ops.cutouts import MakeCutouts
from feed_forward_vqgan_clip_tpu.ops.pooling import adaptive_avg_pool, adaptive_max_pool


class TestAdaptivePooling:
    @pytest.mark.parametrize("in_s,out_s", [(256, 224), (8, 8), (10, 3), (7, 5)])
    def test_avg_matches_torch(self, rng, in_s, out_s):
        x = rng.normal(size=(2, in_s, in_s, 3)).astype(np.float32)
        got = adaptive_avg_pool(jnp.asarray(x), out_s)
        want = torch.nn.functional.adaptive_avg_pool2d(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))), (out_s, out_s)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.transpose(want.numpy(), (0, 2, 3, 1)), atol=1e-5
        )

    @pytest.mark.parametrize("in_s,out_s", [(256, 224), (10, 3), (7, 5)])
    def test_max_matches_torch(self, rng, in_s, out_s):
        x = rng.normal(size=(2, in_s, in_s, 3)).astype(np.float32)
        got = adaptive_max_pool(jnp.asarray(x), out_s)
        want = torch.nn.functional.adaptive_max_pool2d(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))), (out_s, out_s)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.transpose(want.numpy(), (0, 2, 3, 1)), atol=1e-6
        )


class TestWarps:
    def test_identity_affine_is_identity(self, rng):
        x = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)), jnp.float32)
        ident = jnp.broadcast_to(
            jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]), (2, 2, 3)
        )
        y = A.warp_affine_inverse(x, ident)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_translation_shifts_pixels(self):
        x = jnp.zeros((1, 8, 8, 1)).at[0, 2, 2, 0].set(1.0)
        # inverse map: output (x,y) samples input at (x-1, y) -> shifts content +1 in x
        inv = jnp.asarray([[[1.0, 0.0, -1.0], [0.0, 1.0, 0.0]]])
        y = A.warp_affine_inverse(x, inv)
        assert float(y[0, 2, 3, 0]) == pytest.approx(1.0)

    def test_homography_solve_roundtrip(self, rng):
        src = jnp.asarray(rng.uniform(0, 16, size=(3, 4, 2)), jnp.float32)
        dst = src * 1.5 + 2.0  # affine is a homography too
        H = A.solve_homography(src, dst)
        ones = jnp.ones((3, 4, 1))
        p = jnp.concatenate([src, ones], -1) @ jnp.transpose(H, (0, 2, 1))
        mapped = p[..., :2] / p[..., 2:3]
        np.testing.assert_allclose(np.asarray(mapped), np.asarray(dst), atol=1e-3)

    def test_grid_sample_matches_torch_border(self, rng):
        x = rng.uniform(size=(2, 9, 9, 3)).astype(np.float32)
        gx = rng.uniform(-2, 10, size=(2, 5, 5)).astype(np.float32)
        gy = rng.uniform(-2, 10, size=(2, 5, 5)).astype(np.float32)
        got = A.grid_sample(jnp.asarray(x), jnp.asarray(gx), jnp.asarray(gy), "border")
        # torch grid_sample with align_corners=True on normalized coords
        nx = 2 * gx / 8 - 1
        ny = 2 * gy / 8 - 1
        grid = torch.tensor(np.stack([nx, ny], axis=-1))
        want = torch.nn.functional.grid_sample(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))), grid,
            mode="bilinear", padding_mode="border", align_corners=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.transpose(want.numpy(), (0, 2, 3, 1)), atol=1e-5
        )


class TestColor:
    def test_hsv_roundtrip(self, rng):
        x = jnp.asarray(rng.uniform(0.05, 0.95, size=(2, 4, 4, 3)), jnp.float32)
        y = A.hsv_to_rgb(A.rgb_to_hsv(x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def test_jitter_p0_is_identity(self, rng):
        x = jnp.asarray(rng.uniform(size=(2, 4, 4, 3)), jnp.float32)
        y = A.color_jitter(jax.random.PRNGKey(0), x, p=0.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))


class TestAugBehavior:
    @pytest.mark.parametrize(
        "code", ["Ji2", "Ji", "Sh", "Gn", "Pe", "Ro", "Af", "Et", "Ts", "Er", "Er2"]
    )
    def test_shape_preserved_and_deterministic(self, rng, code):
        fns = A.build_augment_pipeline([code], cut_size=8)
        x = jnp.asarray(rng.uniform(size=(3, 8, 8, 3)), jnp.float32)
        k = jax.random.PRNGKey(7)
        y1 = fns[0](k, x)
        y2 = fns[0](k, x)
        assert y1.shape == x.shape
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))
        assert bool(jnp.isfinite(y1).all())

    @pytest.mark.parametrize("code", ["Cr", "Re", "Re2", "Cc", "R"])
    def test_resizing_codes_output_cut_size(self, rng, code):
        fns = A.build_augment_pipeline([code], cut_size=6)
        x = jnp.asarray(rng.uniform(size=(2, 10, 10, 3)), jnp.float32)
        y = fns[0](jax.random.PRNGKey(0), x)
        assert y.shape == (2, 6, 6, 3)

    def test_erasing_zeros_a_region(self, rng):
        x = jnp.ones((2, 16, 16, 3), jnp.float32)
        y = A.random_erasing(jax.random.PRNGKey(3), x, p=1.0)
        frac = float((np.asarray(y) == 0).mean())
        assert 0.05 < frac < 0.6  # scale (0.1, 0.4) plus rounding slack

    def test_erasing_same_on_batch(self):
        x = jnp.ones((3, 16, 16, 3), jnp.float32)
        y = np.asarray(A.random_erasing(jax.random.PRNGKey(3), x, p=1.0, same_on_batch=True))
        masks = (y == 0).all(axis=-1)
        assert (masks[0] == masks[1]).all() and (masks[1] == masks[2]).all()

    def test_unknown_code_raises(self):
        with pytest.raises(ValueError):
            A.build_augment_pipeline(["XX"], 8)

    def test_augs_are_differentiable(self, rng):
        fns = A.build_augment_pipeline(["Af", "Pe", "Ji", "Er"], 8)
        x = jnp.asarray(rng.uniform(size=(2, 8, 8, 3)), jnp.float32)

        def f(img):
            out = img
            for i, fn in enumerate(fns):
                out = fn(jax.random.PRNGKey(i), out)
            return jnp.sum(out)

        g = jax.grad(f)(x)
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0


class TestMakeCutouts:
    def test_default_pipeline_shapes(self, rng):
        mc = MakeCutouts(cut_size=8, cutn=4, pool_size=8)
        x = jnp.asarray(rng.uniform(size=(2, 12, 12, 3)), jnp.float32)
        y = mc(jax.random.PRNGKey(0), x)
        assert y.shape == (8, 8, 8, 3)

    def test_cutn_major_tiling(self, rng):
        # no augs, no noise: output must be [img0, img1, img0, img1, ...]
        mc = MakeCutouts(cut_size=6, cutn=3, augs=["Cc"], pool_size=6, noise_fac=0.0)
        x = jnp.asarray(rng.uniform(size=(2, 6, 6, 3)), jnp.float32)
        y = np.asarray(mc(jax.random.PRNGKey(0), x))
        assert y.shape[0] == 6
        np.testing.assert_allclose(y[0], y[2], atol=1e-6)
        np.testing.assert_allclose(y[1], y[3], atol=1e-6)
        assert not np.allclose(y[0], y[1])

    def test_pool_false_keeps_resolution(self, rng):
        mc = MakeCutouts(cut_size=8, cutn=2, augs=["Ji"], pool=False, noise_fac=0.0)
        x = jnp.asarray(rng.uniform(size=(1, 12, 12, 3)), jnp.float32)
        assert mc(jax.random.PRNGKey(0), x).shape == (2, 12, 12, 3)

    def test_interpolate_path(self, rng):
        mc = MakeCutouts(
            cut_size=8, cutn=2, pool_size=8, interpolate=True, interp_size=5,
            noise_fac=0.0,
        )
        x = jnp.asarray(rng.uniform(size=(1, 12, 12, 3)), jnp.float32)
        assert mc(jax.random.PRNGKey(0), x).shape == (2, 5, 5, 3)

    def test_jittable(self, rng):
        mc = MakeCutouts(cut_size=8, cutn=2, pool_size=8)
        x = jnp.asarray(rng.uniform(size=(2, 12, 12, 3)), jnp.float32)
        y = jax.jit(mc.__call__)(jax.random.PRNGKey(0), x)
        assert y.shape == (4, 8, 8, 3)


class TestFusedGeometric:
    def test_fused_replaces_af_pe(self, rng):
        mc = MakeCutouts(cut_size=8, cutn=2, pool_size=8, fuse_geometric=True)
        # default augs Af,Pe,Ji,Er -> fused,Ji,Er = 3 entries
        assert len(mc.augs) == 3
        x = jnp.asarray(rng.uniform(size=(2, 12, 12, 3)), jnp.float32)
        y = mc(jax.random.PRNGKey(0), x)
        assert y.shape == (4, 8, 8, 3)
        assert bool(jnp.isfinite(y).all())

    def test_fused_identity_when_neither_applies(self, rng):
        x = jnp.asarray(rng.uniform(size=(3, 10, 10, 3)), jnp.float32)
        y = A.fused_affine_perspective(jax.random.PRNGKey(0), x, p_af=0.0, p_pe=0.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)

    def test_fused_matches_affine_when_pe_off(self, rng):
        # with Pe disabled the fused op is exactly one affine warp family:
        # deterministic under the same key and differs from identity
        x = jnp.asarray(rng.uniform(size=(2, 12, 12, 3)), jnp.float32)
        y1 = A.fused_affine_perspective(jax.random.PRNGKey(1), x, p_af=1.0, p_pe=0.0)
        y2 = A.fused_affine_perspective(jax.random.PRNGKey(1), x, p_af=1.0, p_pe=0.0)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))
        assert not np.allclose(np.asarray(y1), np.asarray(x))

    def test_fused_is_differentiable(self, rng):
        x = jnp.asarray(rng.uniform(size=(2, 8, 8, 3)), jnp.float32)
        g = jax.grad(
            lambda im: jnp.sum(A.fused_affine_perspective(jax.random.PRNGKey(2), im))
        )(x)
        assert bool(jnp.isfinite(g).all())
