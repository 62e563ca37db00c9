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


# --------------------------------------------------------- Et/Ts kornia parity
#
# kornia itself is not installed here, so the oracle vendors kornia 0.5.10's
# elastic_transform2d / get_tps_transform / warp_image_tps math in torch (the
# reference pins kornia==0.5.10, requirements.txt:9) — crucially driving torch's
# REAL F.grid_sample/conv2d/linalg.solve kernels, which is where the fiddly
# align_corners=False + zeros-padding semantics live.


def _t_gauss1d(ksize, sigma):
    xs = torch.arange(ksize, dtype=torch.float64) - ksize // 2
    g = torch.exp(-(xs**2) / (2 * sigma**2))
    return g / g.sum()


def _t_meshgrid_norm(h, w):
    """kornia create_meshgrid(normalized): align-corners linspace, xy order."""
    ys, xs = torch.meshgrid(
        torch.linspace(-1, 1, h, dtype=torch.float64),
        torch.linspace(-1, 1, w, dtype=torch.float64),
        indexing="ij",
    )
    return torch.stack([xs, ys], -1)  # (H,W,2)


def _t_elastic(x_nhwc, noise_nhwc2, ksize, sigma, alpha):
    x = torch.tensor(x_nhwc, dtype=torch.float64).permute(0, 3, 1, 2)
    noise = torch.tensor(noise_nhwc2, dtype=torch.float64).permute(0, 3, 1, 2)
    g1 = _t_gauss1d(ksize, sigma)
    k2 = torch.outer(g1, g1)[None, None]
    pad = ksize // 2
    disp_x = torch.nn.functional.conv2d(noise[:, :1], k2, padding=pad) * alpha
    disp_y = torch.nn.functional.conv2d(noise[:, 1:], k2, padding=pad) * alpha
    h, w = x.shape[2:]
    grid = _t_meshgrid_norm(h, w)[None]
    disp = torch.cat([disp_x, disp_y], 1).permute(0, 2, 3, 1)
    out = torch.nn.functional.grid_sample(
        x, (grid + disp).clamp(-1, 1), mode="bilinear",
        padding_mode="zeros", align_corners=False,
    )
    return out.permute(0, 2, 3, 1).numpy()


def _t_pair_sq(a, b):
    d = (
        -2 * a @ b.transpose(1, 2)
        + (a * a).sum(-1, keepdim=True)
        + (b * b).sum(-1).unsqueeze(1)
    )
    return d.clamp(min=0)


def _t_kd(d2):
    return 0.5 * d2 * torch.log(d2 + 1e-8)


def _t_tps(x_nhwc, src, dst):
    """RandomThinPlateSpline.apply_transform: get_tps_transform(dst, src) then
    warp_image_tps(input, src, ...) — kernel centers src, weights solved at dst."""
    x = torch.tensor(x_nhwc, dtype=torch.float64).permute(0, 3, 1, 2)
    src_t = torch.tensor(src, dtype=torch.float64)
    dst_t = torch.tensor(dst, dtype=torch.float64)
    bsz, n = dst_t.shape[:2]
    k = _t_kd(_t_pair_sq(dst_t, dst_t))
    one = torch.ones(bsz, n, 1, dtype=torch.float64)
    p = torch.cat([one, dst_t], -1)
    z33 = torch.zeros(bsz, 3, 3, dtype=torch.float64)
    L = torch.cat([torch.cat([k, p], -1), torch.cat([p, z33], 1).transpose(1, 2)], 1)
    rhs = torch.cat([src_t, torch.zeros(bsz, 3, 2, dtype=torch.float64)], 1)
    wts = torch.linalg.solve(L, rhs)
    kw, aw = wts[:, :n], wts[:, n:]
    h, w = x.shape[2:]
    coords = _t_meshgrid_norm(h, w).reshape(1, -1, 2).expand(bsz, -1, -1)
    kk = _t_kd(_t_pair_sq(coords, src_t))
    warped = kk @ kw + coords @ aw[:, 1:] + aw[:, :1]
    out = torch.nn.functional.grid_sample(
        x, warped.reshape(bsz, h, w, 2), mode="bilinear",
        padding_mode="zeros", align_corners=False,
    )
    return out.permute(0, 2, 3, 1).numpy()


class TestElasticTpsParity:
    @pytest.mark.parametrize("ksize,sigma,alpha,hw", [(7, 2.0, 0.5, 16), (63, 32.0, 1.0, 64)])
    def test_elastic_matches_kornia_math(self, rng, ksize, sigma, alpha, hw):
        x = rng.uniform(size=(2, hw, hw, 3)).astype(np.float32)
        noise = (rng.uniform(size=(2, hw, hw, 2)) * 2 - 1).astype(np.float32)
        got = A.elastic_warp(jnp.asarray(x), jnp.asarray(noise), ksize, sigma, alpha)
        want = _t_elastic(x, noise, ksize, sigma, alpha)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    def test_tps_matches_kornia_math(self, rng):
        x = rng.uniform(size=(2, 20, 20, 3)).astype(np.float32)
        src = np.tile(
            np.asarray(
                [[-1, -1], [-1, 1], [1, -1], [1, 1], [0, 0]], np.float32
            )[None],
            (2, 1, 1),
        )
        dst = src + rng.uniform(-0.3, 0.3, size=src.shape).astype(np.float32)
        got = A.tps_warp(jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst))
        want = _t_tps(x, src, dst)
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)

    def test_tps_identity_controls_gives_identity_points(self, rng):
        # dst == src must solve to zero kernel weights + identity affine; the
        # IMAGE is still not bit-identical because kornia samples the
        # align-corners meshgrid with align_corners=False (a slight zoom we
        # replicate on purpose — the oracle parity test above covers it).
        src = jnp.asarray(
            [[[-1, -1], [-1, 1], [1, -1], [1, 1], [0, 0]]], jnp.float32
        )
        kw, aw = A.get_tps_transform(src, src)
        pts = jnp.asarray(rng.uniform(-1, 1, size=(1, 17, 2)), jnp.float32)
        warped = A.warp_points_tps(pts, src, kw, aw)
        np.testing.assert_allclose(np.asarray(warped), np.asarray(pts), atol=1e-5)

    def test_et_ts_differentiable(self, rng):
        x = jnp.asarray(rng.uniform(size=(2, 12, 12, 3)), jnp.float32)
        for code in ("Et", "Ts"):
            fn = A.build_augment_pipeline([code], cut_size=12)[0]
            g = jax.grad(lambda im: jnp.sum(fn(jax.random.PRNGKey(3), im)))(x)
            assert bool(jnp.isfinite(g).all())
