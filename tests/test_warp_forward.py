"""Exactness of the MXU-contraction forward warp (ops/pallas/warp_forward.py).

The Pallas forward must match the XLA gather forward (same math, different
rounding order) for zeros and border modes, affine and perspective families,
including the lax.cond fallback on uncoverable draws. Runs the kernel in
interpret mode on CPU.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feed_forward_vqgan_clip_tpu.ops import augment as A


@pytest.fixture(autouse=True)
def _force_pallas_fwd(monkeypatch):
    monkeypatch.setattr(A, "_WARP_FWD_MODE", "pallas")
    monkeypatch.setattr(A, "_WARP_VJP_MODE", "xla")
    monkeypatch.setattr(A, "_WARP_INTERPRET", True)


def _rot_trans_mats(key, b, h, w, degrees=15.0, translate=0.1):
    k1, k2, k3 = jax.random.split(key, 3)
    ang = jax.random.uniform(k1, (b,), minval=-degrees, maxval=degrees) * math.pi / 180
    tx = jax.random.uniform(k2, (b,), minval=-translate, maxval=translate) * w
    ty = jax.random.uniform(k3, (b,), minval=-translate, maxval=translate) * h
    inv = A._affine_inverse_about_center(ang, tx, ty, jnp.ones((b,)), h, w)
    return A._affine3(inv)


def _pe_mats(key, b, h, w, distortion=0.2):
    base = jnp.asarray([[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0], [0.0, h - 1.0]])
    signs = jnp.asarray([[1, 1], [-1, 1], [-1, -1], [1, -1]], jnp.float32)
    half = jnp.asarray([w, h], jnp.float32) * (distortion / 2.0)
    disp = jax.random.uniform(key, (b, 4, 2)) * half * signs
    return A.solve_homography(base[None] + disp, jnp.broadcast_to(base, (b, 4, 2)))


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("mode", ["zeros", "border"])
def test_affine_forward_matches_gather(seed, mode):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    m = _rot_trans_mats(jax.random.PRNGKey(seed), 2, 64, 64)
    got = A.warp_projective(img, m, mode, 0, "affine")
    want = A.warp_perspective_inverse(img, m, mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("mode", ["zeros", "border"])
def test_perspective_forward_matches_gather(mode):
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    m = _pe_mats(jax.random.PRNGKey(2), 2, 64, 64, distortion=0.3)
    got = A.warp_projective(img, m, mode, 0, "projective")
    want = A.warp_perspective_inverse(img, m, mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_horizon_straddling_draw_is_exact():
    """Projective uses the full-height row window, so even a horizon-straddling
    homography is computed in-kernel (no fallback) and must match XLA."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    m = _pe_mats(jax.random.PRNGKey(5), 1, 64, 64, distortion=1.4)
    got = A.warp_projective(img, m, "zeros", 0, "projective")
    want = A.warp_perspective_inverse(img, m, "zeros")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_affine_overshoot_falls_back_to_gather():
    """An affine draw rotated far beyond the 15-degree window bound must route
    to the XLA forward via the coverage lax.cond and stay exact. 224px is the
    smallest size where the affine window is narrower than the image."""
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.normal(size=(1, 224, 224, 1)), jnp.float32)
    ang = jnp.asarray([80.0 * math.pi / 180.0])
    inv = A._affine_inverse_about_center(ang, jnp.zeros((1,)), jnp.zeros((1,)),
                                         jnp.ones((1,)), 224, 224)
    m = A._affine3(inv)
    from feed_forward_vqgan_clip_tpu.ops.pallas.warp_forward import (
        forward_plan, pick_fwd_cand)
    cand = pick_fwd_cand(32, "affine", 224, 224)
    assert cand < 224
    _, uncovered = forward_plan(m, 224, (224, 224), 32, cand, False)
    assert bool(uncovered)
    got = A.warp_projective(img, m, "zeros", 0, "affine")
    want = A.warp_perspective_inverse(img, m, "zeros")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_rotation_zeros_forward():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    b = 2
    ang = jax.random.uniform(jax.random.PRNGKey(6), (b,), minval=-0.3, maxval=0.3)
    inv = A._affine_inverse_about_center(ang, jnp.zeros((b,)), jnp.zeros((b,)),
                                         jnp.ones((b,)), 64, 64)
    m = A._affine3(inv)
    got = A.warp_projective(img, m, "zeros", 0, "affine")
    want = A.warp_perspective_inverse(img, m, "zeros")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_aug_outputs_match_between_fwd_modes(monkeypatch):
    """End-to-end random_affine + random_perspective outputs agree between the
    Pallas forward and the XLA gather (same PRNG keys -> same draws)."""
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    key = jax.random.PRNGKey(11)

    def apply(im):
        x = A.random_affine(key, im)
        return A.random_perspective(jax.random.fold_in(key, 1), x, 0.2)

    out_fast = apply(img)
    monkeypatch.setattr(A, "_WARP_FWD_MODE", "xla")
    out_ref = apply(img)
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(out_ref), atol=1e-4, rtol=1e-4
    )


def test_grad_through_pallas_forward_matches(monkeypatch):
    """Pallas forward + Pallas adjoint: gradient agrees with the all-XLA path."""
    monkeypatch.setattr(A, "_WARP_VJP_MODE", "pallas")
    rng = np.random.default_rng(8)
    img = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    wts = jnp.asarray(rng.normal(size=img.shape), jnp.float32)
    m = _rot_trans_mats(jax.random.PRNGKey(9), 1, 64, 64)
    pad = A._affine_pad(64, 64, 15.0, 0.1)

    def loss(im):
        return jnp.sum(A.warp_projective(im, m, "border", pad, "affine") * wts)

    g_fast = jax.grad(loss)(img)
    monkeypatch.setattr(A, "_WARP_FWD_MODE", "xla")
    monkeypatch.setattr(A, "_WARP_VJP_MODE", "xla")
    g_ref = jax.grad(loss)(img)
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_ref), atol=2e-4, rtol=1e-4
    )


@pytest.mark.parametrize("kind", ["affine", "projective"])
def test_bf16_forward_mode(kind):
    """bf16 pixels run the single-pass kernel mode (16-aligned origins) and
    match the f32 path to bf16 rounding; output dtype is preserved."""
    rng = np.random.default_rng(5)
    img32 = jnp.asarray(rng.random(size=(2, 64, 64, 3)), jnp.float32)
    img16 = img32.astype(jnp.bfloat16)
    key = jax.random.PRNGKey(5)
    m = (
        _rot_trans_mats(key, 2, 64, 64)
        if kind == "affine"
        else _pe_mats(key, 2, 64, 64, distortion=0.3)
    )
    mode = "border" if kind == "affine" else "zeros"
    got16 = A.warp_projective(img16, m, mode, 0, kind)
    assert got16.dtype == jnp.bfloat16
    want = A.warp_projective(img32, m, mode, 0, kind)
    np.testing.assert_allclose(
        np.asarray(got16, np.float32), np.asarray(want), atol=2e-2
    )


@pytest.mark.parametrize("kind", ["affine", "projective"])
def test_pipe_matches_unskewed_bitwise(kind, monkeypatch):
    """The skewed (cross-band pipelined) bf16 forward kernel must be
    BIT-identical to the unskewed bf16 kernel — same per-band math, only the
    cross-band schedule differs."""
    from feed_forward_vqgan_clip_tpu.ops.pallas import warp_forward as WF

    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.random(size=(2, 64, 64, 3)), jnp.bfloat16)
    key = jax.random.PRNGKey(7)
    m = (
        _rot_trans_mats(key, 2, 64, 64)
        if kind == "affine"
        else _pe_mats(key, 2, 64, 64, distortion=0.3)
    )
    border = kind == "affine"
    cand = WF.pick_fwd_cand(32, kind if kind == "affine" else "proj", 64, 64)
    origins, _ = WF.forward_plan(m, 64, (64, 64), 32, cand, border, align=16)
    run = WF.warp_forward.__wrapped__  # bypass the jit cache (global toggle)

    monkeypatch.setattr(WF, "_FWD_PIPE_ENV", "1")
    got = run(img, m, origins, out_hw=(64, 64), tile=32, cand=cand,
              border=border, interpret=True)
    monkeypatch.setattr(WF, "_FWD_PIPE_ENV", "0")
    want = run(img, m, origins, out_hw=(64, 64), tile=32, cand=cand,
               border=border, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def _crop_oracle(x, x0, y0, cw, ch, out_size):
    """The pre-round-4 _crop_resize: explicit linspace grid + grid_sample."""
    b = x.shape[0]
    lin = jnp.linspace(0.0, 1.0, out_size)
    gx = x0[:, None, None] + lin[None, None, :] * (cw[:, None, None] - 1)
    gy = y0[:, None, None] + lin[None, :, None] * (ch[:, None, None] - 1)
    gx = jnp.broadcast_to(gx, (b, out_size, out_size))
    gy = jnp.broadcast_to(gy, (b, out_size, out_size))
    return A.grid_sample(x, gx, gy, "border")


def _crop_params(key, b, h, w, out):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    cw = jax.random.uniform(k1, (b,), minval=out * 0.5, maxval=float(w))
    ch = jax.random.uniform(k2, (b,), minval=out * 0.5, maxval=float(h))
    x0 = jax.random.uniform(k3, (b,)) * (w - cw)
    y0 = jax.random.uniform(k4, (b,)) * (h - ch)
    return x0, y0, cw, ch


def test_crop_rectangular_output_matches_grid_sample():
    """_crop_resize rides the Pallas warp kernels with out_hw != input size
    (round 4); it must match the explicit-grid construction it replaced."""
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.normal(size=(3, 64, 64, 3)), jnp.float32)
    x0, y0, cw, ch = _crop_params(jax.random.PRNGKey(5), 3, 64, 64, 32)
    got = A._crop_resize(img, x0, y0, cw, ch, 32)
    want = _crop_oracle(img, x0, y0, cw, ch, 32)
    assert got.shape == (3, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


class TestFullWindowMode:
    """FFVC_WARP_WINDOW=full (augment._WARP_WINDOW): whole-input row windows
    make coverage unconditional, removing the lax.cond fallback from the
    compiled step. Values and gradients must match the narrow-window default
    on covered draws — wider windows only add zero-weight taps."""

    def _setup(self):
        rng = np.random.default_rng(9)
        # 224px: the only size where the affine narrow window (128) differs
        # from full (224) — smaller sizes already take the full window
        img = jnp.asarray(rng.normal(size=(1, 224, 224, 1)), jnp.float32)
        m = _rot_trans_mats(jax.random.PRNGKey(9), 1, 224, 224)
        return img, m

    @pytest.mark.parametrize("mode", ["zeros", "border"])
    def test_forward_matches_narrow(self, monkeypatch, mode):
        img, m = self._setup()
        narrow = A.warp_projective(img, m, mode, 0, "affine")
        monkeypatch.setattr(A, "_WARP_WINDOW", "full")
        full = A.warp_projective(img, m, mode, 0, "affine")
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(narrow), atol=1e-5, rtol=1e-5
        )

    def test_adjoint_matches_narrow(self, monkeypatch):
        img, m = self._setup()
        monkeypatch.setattr(A, "_WARP_VJP_MODE", "pallas")

        def loss(im):
            out = A.warp_projective(im, m, "zeros", 0, "affine")
            return jnp.sum(out * jnp.cos(out))

        g_narrow = jax.grad(loss)(img)
        monkeypatch.setattr(A, "_WARP_WINDOW", "full")
        g_full = jax.grad(loss)(img)
        np.testing.assert_allclose(
            np.asarray(g_full), np.asarray(g_narrow), atol=1e-4, rtol=1e-4
        )
