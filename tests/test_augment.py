"""Augmentation/pooling/cutout tests: torch parity for adaptive pools, geometric
sanity for warps, PRNG determinism, probability gating."""

import jax
import jax.numpy as jnp
import math
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


# ---------------------------------------- Af/Pe/Ji/Er kornia 0.5.10 parity
#
# The DEFAULT training augs (main.py:164: Af, Pe, Ji, Er) get the same
# vendored-oracle treatment as Et/Ts: torch f64 reimplementations of kornia
# 0.5.10's apply math (driving torch's real F.grid_sample, incl. the
# normalize-with-(w-1)-but-sample-align_corners=False quirk) checked against
# the jax apply fns under INJECTED parameters (fixed-draw parity), plus
# distribution tests on the samplers (kornia's ranges and, for Er, its
# two-part aspect mixture — which is NOT torchvision's log-uniform).


def _t_normal_transform_pixel(h, w):
    return torch.tensor(
        [[2.0 / (w - 1), 0, -1], [0, 2.0 / (h - 1), -1], [0, 0, 1]],
        dtype=torch.float64,
    )


def _t_kornia_warp(x_nhwc, m_pix, padding_mode):
    """kornia warp_affine/warp_perspective core: pixel matrix -> normalized via
    normal_transform_pixel ((w-1) convention), inverted, applied to the
    align-corners meshgrid, sampled with align_corners=False."""
    x = torch.tensor(x_nhwc, dtype=torch.float64).permute(0, 3, 1, 2)
    b, _, h, w = x.shape
    n = _t_normal_transform_pixel(h, w)
    m_norm = n[None] @ m_pix @ torch.linalg.inv(n)[None]
    inv = torch.linalg.inv(m_norm)
    grid = _t_meshgrid_norm(h, w).reshape(1, -1, 2).expand(b, -1, -1)
    ones = torch.ones(b, grid.shape[1], 1, dtype=torch.float64)
    pts = torch.cat([grid, ones], -1) @ inv.transpose(1, 2)
    pts = pts[..., :2] / pts[..., 2:3]
    out = torch.nn.functional.grid_sample(
        x, pts.reshape(b, h, w, 2), mode="bilinear",
        padding_mode=padding_mode, align_corners=False,
    )
    return out.permute(0, 2, 3, 1).numpy()


def _t_affine_matrix(ang_deg, tx, ty, h, w):
    """kornia get_affine_matrix2d: OpenCV get_rotation_matrix2d about the
    (w-1)/2 center + translation added to the last column."""
    b = len(ang_deg)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    a = torch.cos(torch.tensor(ang_deg, dtype=torch.float64) * math.pi / 180)
    be = torch.sin(torch.tensor(ang_deg, dtype=torch.float64) * math.pi / 180)
    tx = torch.tensor(tx, dtype=torch.float64)
    ty = torch.tensor(ty, dtype=torch.float64)
    m = torch.zeros(b, 3, 3, dtype=torch.float64)
    m[:, 0, 0] = a
    m[:, 0, 1] = be
    m[:, 0, 2] = (1 - a) * cx - be * cy + tx
    m[:, 1, 0] = -be
    m[:, 1, 1] = a
    m[:, 1, 2] = be * cx + (1 - a) * cy + ty
    m[:, 2, 2] = 1.0
    return m


def _t_perspective_matrix(start, end):
    """kornia get_perspective_transform: DLT solve start -> end."""
    b = start.shape[0]
    src = torch.tensor(start, dtype=torch.float64)
    dst = torch.tensor(end, dtype=torch.float64)
    x, y = src[..., 0], src[..., 1]
    u, v = dst[..., 0], dst[..., 1]
    zeros = torch.zeros_like(x)
    ones = torch.ones_like(x)
    ru = torch.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], -1)
    rv = torch.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], -1)
    A = torch.cat([ru, rv], 1)
    rhs = torch.cat([u, v], 1).unsqueeze(-1)
    p = torch.linalg.solve(A, rhs)[..., 0]
    m = torch.cat([p, torch.ones(b, 1, dtype=torch.float64)], 1).reshape(b, 3, 3)
    return m


class TestAffinePerspectiveKorniaParity:
    def test_affine_fixed_draw_matches_kornia_math(self, rng):
        x = rng.uniform(size=(3, 24, 20, 3)).astype(np.float32)
        ang = [7.5, -12.0, 0.0]
        tx = [1.5, -2.0, 0.6]
        ty = [-1.0, 2.2, 0.0]
        got = A.af_apply(
            jnp.asarray(x), jnp.asarray(ang, jnp.float32),
            jnp.asarray(tx, jnp.float32), jnp.asarray(ty, jnp.float32),
            "border", 0,
        )
        m = _t_affine_matrix(ang, tx, ty, 24, 20)
        want = _t_kornia_warp(x, m, "border")
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    def test_rotation_fixed_draw_matches_kornia_math(self, rng):
        # Ro shares af_apply with zeros padding (RandomRotation, main.py:180)
        x = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
        ang = [10.0, -4.0]
        zeros = jnp.zeros((2,), jnp.float32)
        got = A.af_apply(jnp.asarray(x), jnp.asarray(ang, jnp.float32), zeros, zeros, "zeros", 0)
        want = _t_kornia_warp(x, _t_affine_matrix(ang, [0, 0], [0, 0], 16, 16), "zeros")
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    def test_perspective_fixed_draw_matches_kornia_math(self, rng):
        h, w = 20, 24
        x = rng.uniform(size=(2, h, w, 3)).astype(np.float32)
        base = np.asarray(
            [[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0], [0.0, h - 1.0]],
            np.float32,
        )
        signs = np.asarray([[1, 1], [-1, 1], [-1, -1], [1, -1]], np.float32)
        disp = rng.uniform(size=(2, 4, 2)).astype(np.float32) * np.asarray(
            [w, h], np.float32
        ) * 0.35 * signs
        start = np.tile(base[None], (2, 1, 1))
        end = start + disp
        got = A.pe_apply(jnp.asarray(x), jnp.asarray(start), jnp.asarray(end))
        want = _t_kornia_warp(x, _t_perspective_matrix(start, end), "zeros")
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)

    def test_af_sampler_distribution(self):
        ang, tx, ty = A.af_sample(jax.random.PRNGKey(0), 4000, 32, 48, 15.0, 0.1)
        ang, tx, ty = map(np.asarray, (ang, tx, ty))
        assert np.abs(ang).max() <= 15.0 and np.abs(ang).max() > 13.0
        assert np.abs(tx).max() <= 0.1 * 48 and np.abs(ty).max() <= 0.1 * 32
        assert abs(ang.mean()) < 1.0  # symmetric
        # uniform, not normal: std of U(-15,15) is 15/sqrt(3) ~ 8.66
        assert abs(ang.std() - 8.66) < 0.5

    def test_pe_sampler_pulls_corners_inward(self):
        start, end = A.pe_sample(jax.random.PRNGKey(1), 2000, 20, 24, 0.7)
        disp = np.asarray(end - start)
        # sign pattern: corner 0 moves right/down (+x, +y); corner 2 left/up
        assert (disp[:, 0] >= 0).all() and (disp[:, 2] <= 0).all()
        assert disp[:, :, 0].__abs__().max() <= 0.35 * 24 + 1e-4
        assert disp[:, :, 1].__abs__().max() <= 0.35 * 20 + 1e-4


class TestColorJitterKorniaParity:
    def _t_rgb_to_hsv(self, x):
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        maxc = x.max(-1).values
        minc = x.min(-1).values
        v = maxc
        delta = maxc - minc
        s = torch.where(maxc > 0, delta / maxc.clamp(min=1e-8), torch.zeros_like(maxc))
        safe = delta.clamp(min=1e-8)
        rc, gc, bc = (maxc - r) / safe, (maxc - g) / safe, (maxc - b) / safe
        h = torch.where(
            maxc == r, bc - gc, torch.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
        )
        h = torch.where(delta > 0, (h / 6.0) % 1.0, torch.zeros_like(h))
        return h, s, v

    def _t_hsv_to_rgb(self, h, s, v):
        i = torch.floor(h * 6.0)
        f = h * 6.0 - i
        p = v * (1 - s)
        q = v * (1 - f * s)
        t = v * (1 - (1 - f) * s)
        i = i.long() % 6
        sel = lambda vals: torch.stack(vals, -1).gather(-1, i.unsqueeze(-1))[..., 0]
        r = sel([v, q, p, p, t, v])
        g = sel([t, v, v, q, p, p])
        b = sel([p, p, t, v, v, q])
        return torch.stack([r, g, b], -1)

    def _t_kornia_jitter(self, x_nhwc, bf, cf, sf, hf, order):
        """kornia 0.5.10 ColorJitter.apply_transform: brightness ADDITIVE
        (input + (factor-1), clamped), contrast PURE SCALE (input * factor,
        clamped), saturation scale in HSV (clamped), modular hue shift
        (adjust_hue factor*2pi == `factor` turns); applied in the sampled
        randperm order, each as its own HSV round trip."""
        x = torch.tensor(x_nhwc, dtype=torch.float64)
        bf = torch.tensor(bf, dtype=torch.float64).view(-1, 1, 1, 1)
        cf = torch.tensor(cf, dtype=torch.float64).view(-1, 1, 1, 1)
        sf = torch.tensor(sf, dtype=torch.float64).view(-1, 1, 1)
        hf = torch.tensor(hf, dtype=torch.float64).view(-1, 1, 1)

        def t_b(img):
            return (img + (bf - 1)).clamp(0, 1)

        def t_c(img):
            return (img * cf).clamp(0, 1)

        def t_s(img):
            h, s, v = self._t_rgb_to_hsv(img)
            return self._t_hsv_to_rgb(h, (s * sf).clamp(0, 1), v)

        def t_h(img):
            h, s, v = self._t_rgb_to_hsv(img)
            return self._t_hsv_to_rgb((h + hf) % 1.0, s, v)

        fns = [t_b, t_c, t_s, t_h]
        for idx in order:
            x = fns[idx](x)
        return x.numpy()

    def test_ji_fixed_draw_matches_kornia_math(self, rng):
        x = rng.uniform(size=(3, 12, 12, 3)).astype(np.float32)
        bf = np.asarray([1.05, 0.92, 1.0], np.float32)
        cf = np.asarray([0.95, 1.08, 1.0], np.float32)
        sf = np.asarray([1.1, 0.9, 1.02], np.float32)
        hf = np.asarray([0.07, -0.05, 0.0], np.float32)
        for order in ([0, 1, 2, 3], [3, 2, 1, 0], [2, 0, 3, 1]):
            got = A.ji_apply(
                jnp.asarray(x), jnp.asarray(bf), jnp.asarray(cf),
                jnp.asarray(sf), jnp.asarray(hf), jnp.asarray(order),
            )
            want = self._t_kornia_jitter(x, bf, cf, sf, hf, order)
            np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_ji_sampler_distribution(self):
        bf, cf, sf, hf, order = A.ji_sample(
            jax.random.PRNGKey(2), 5000, brightness=0.0, contrast=0.0,
            saturation=0.1, hue=0.1,
        )
        assert np.allclose(np.asarray(bf), 1.0) and np.allclose(np.asarray(cf), 1.0)
        sf, hf = np.asarray(sf), np.asarray(hf)
        assert sf.min() >= 0.9 and sf.max() <= 1.1 and abs(sf.mean() - 1.0) < 0.005
        assert hf.min() >= -0.1 and hf.max() <= 0.1 and abs(hf.mean()) < 0.005
        assert sorted(np.asarray(order).tolist()) == [0, 1, 2, 3]


class TestErasingKorniaParity:
    def test_er_fixed_draw_matches_kornia_mask(self, rng):
        x = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
        x0 = jnp.asarray([3.4, 0.0], jnp.float32)
        y0 = jnp.asarray([2.7, 10.0], jnp.float32)
        ew = jnp.asarray([5.0, 4.0], jnp.float32)
        eh = jnp.asarray([4.0, 6.0], jnp.float32)
        got = np.asarray(A.er_apply(jnp.asarray(x), x0, y0, ew, eh))
        # kornia bbox_to_mask: integer pixel j erased iff x0 <= j <= x0+ew-1
        want = x.copy()
        for b, (xx, yy, w_, h_) in enumerate(zip([3.4, 0.0], [2.7, 10.0], [5, 4], [4, 6])):
            for j in range(16):
                for i in range(16):
                    if xx <= i <= xx + w_ - 1 and yy <= j <= yy + h_ - 1:
                        want[b, j, i] = 0.0
        np.testing.assert_allclose(got, want, atol=0)

    def test_er_sampler_two_part_mixture_not_loguniform(self):
        """kornia 0.5.10 draws the aspect from uniform(r0,1)/uniform(1,r1)
        coin-flipped — P(aspect < 0.65) = 0.25, where torchvision's
        log-uniform would give 0.32. Also: integer box sides in [1, side]."""
        x0, y0, ew, eh = A.er_sample(
            jax.random.PRNGKey(3), 20000, 64, 64, (0.1, 0.4), (0.3, 1 / 0.3)
        )
        ew, eh = np.asarray(ew), np.asarray(eh)
        aspect_proxy = eh / ew  # round() blurs aspect slightly; proxy is fine
        frac = float((aspect_proxy < 0.65).mean())
        assert 0.20 < frac < 0.30, frac  # log-uniform would sit near 0.32
        assert np.allclose(ew, np.round(ew)) and np.allclose(eh, np.round(eh))
        assert ew.min() >= 1 and eh.min() >= 1 and ew.max() <= 64 and eh.max() <= 64
        x0, y0 = np.asarray(x0), np.asarray(y0)
        assert (x0 >= 0).all() and (x0 <= 64 - ew + 1).all()
        assert (y0 >= 0).all() and (y0 <= 64 - eh + 1).all()

    def test_ji_default_fast_path_equals_ordered(self, rng):
        """brightness == contrast == 0 (the default 'Ji'): the joint one-pass
        sat+hue application must equal the kornia ordered path for any order."""
        x = jnp.asarray(rng.uniform(size=(4, 10, 10, 3)), jnp.float32)
        ones = jnp.ones((4,), jnp.float32)
        sf = jnp.asarray([1.08, 0.93, 1.0, 0.9], jnp.float32)
        hf = jnp.asarray([0.04, -0.09, 0.0, 0.1], jnp.float32)
        hsv = A.rgb_to_hsv(x)
        ss = jnp.clip(hsv[..., 1] * sf.reshape(-1, 1, 1), 0.0, 1.0)
        hh = (hsv[..., 0] + hf.reshape(-1, 1, 1)) % 1.0
        joint = A.hsv_to_rgb(jnp.stack([hh, ss, hsv[..., 2]], axis=-1))
        for order in ([0, 1, 2, 3], [3, 2, 1, 0], [1, 3, 0, 2]):
            ordered = A.ji_apply(x, ones, ones, sf, hf, jnp.asarray(order))
            np.testing.assert_allclose(
                np.asarray(joint), np.asarray(ordered), atol=2e-6
            )
