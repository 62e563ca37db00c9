"""Exactness of the gather-only warp adjoint (ops/pallas/warp_adjoint.py).

The fast VJP must be bit-for-bit-ish EQUAL to XLA's autodiff (scatter) backward
of the same forward — zeros and border modes, affine and perspective families,
plus the lax.cond fallback on uncoverable draws. Runs the kernel in interpret
mode on CPU.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feed_forward_vqgan_clip_tpu.ops import augment as A


@pytest.fixture(autouse=True)
def _force_pallas_vjp(monkeypatch):
    monkeypatch.setattr(A, "_WARP_VJP_MODE", "pallas")
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


def _grads(img, m, padding_mode, pad, kind, weights):
    def fast_loss(im):
        return jnp.sum(A.warp_projective(im, m, padding_mode, pad, kind) * weights)

    def ref_loss(im):
        return jnp.sum(A.warp_perspective_inverse(im, m, padding_mode) * weights)

    return jax.grad(fast_loss)(img), jax.grad(ref_loss)(img)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_zeros_affine_adjoint_exact(seed):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    m = _rot_trans_mats(jax.random.PRNGKey(seed), 2, 64, 64)
    wts = jnp.asarray(rng.normal(size=img.shape), jnp.float32)
    got, want = _grads(img, m, "zeros", 0, "affine", wts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("seed", [0, 3])
def test_zeros_perspective_adjoint_exact(seed):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    m = _pe_mats(jax.random.PRNGKey(seed), 2, 64, 64, distortion=0.2)
    wts = jnp.asarray(rng.normal(size=img.shape), jnp.float32)
    got, want = _grads(img, m, "zeros", 0, "projective", wts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4)


def test_border_affine_adjoint_exact():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    m = _rot_trans_mats(jax.random.PRNGKey(4), 2, 64, 64)
    pad = A._affine_pad(64, 64, 15.0, 0.1)
    wts = jnp.asarray(rng.normal(size=img.shape), jnp.float32)
    got, want = _grads(img, m, "border", pad, "affine", wts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4)


def test_uncovered_draw_falls_back_exactly():
    """A violently-contracting homography overflows any candidate window; the
    lax.cond must route to the XLA transpose and stay exact."""
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    m = _pe_mats(jax.random.PRNGKey(5), 1, 64, 64, distortion=1.4)
    from feed_forward_vqgan_clip_tpu.ops.pallas.warp_adjoint import adjoint_plan

    _, uncovered = adjoint_plan(m, (64, 64), (64, 64), 32, 56)
    wts = jnp.asarray(rng.normal(size=img.shape), jnp.float32)
    got, want = _grads(img, m, "zeros", 0, "projective", wts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4)


def test_forward_unchanged(monkeypatch):
    """With FFVC_WARP_FWD=xla, warp_projective's forward must be the plain XLA
    grid-sample, bit-equal (the Pallas forward is covered by
    test_warp_forward.py and agrees to rounding order only)."""
    monkeypatch.setattr(A, "_WARP_FWD_MODE", "xla")
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    for mode, mats in (("zeros", _pe_mats(jax.random.PRNGKey(6), 2, 64, 64)),
                       ("border", _rot_trans_mats(jax.random.PRNGKey(7), 2, 64, 64))):
        out = A.warp_projective(img, mats, mode, 8, "projective")
        ref = A.warp_perspective_inverse(img, mats, mode)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_aug_grads_match_between_modes(monkeypatch):
    """End-to-end: random_affine + random_perspective gradients identical with
    the fast VJP and the plain XLA path (same PRNG keys -> same draws)."""
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    wts = jnp.asarray(rng.normal(size=img.shape), jnp.float32)
    key = jax.random.PRNGKey(11)

    def loss(im):
        x = A.random_affine(key, im)
        x = A.random_perspective(jax.random.fold_in(key, 1), x, 0.2)
        return jnp.sum(x * wts)

    g_fast = jax.grad(loss)(img)
    monkeypatch.setattr(A, "_WARP_VJP_MODE", "xla")
    g_ref = jax.grad(loss)(img)
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_ref), atol=2e-4, rtol=1e-4
    )


def test_border_far_overshoot_exact():
    """Border mode via in-kernel clamping needs no overshoot bound: a huge
    translation (most samples far outside the frame, all clamped onto the
    border pixels) must still match the XLA transpose exactly."""
    rng = np.random.default_rng(9)
    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    b = 1
    inv = A._affine_inverse_about_center(
        jnp.asarray([0.2]), jnp.asarray([55.0]), jnp.asarray([-60.0]),
        jnp.ones((b,)), 64, 64)
    m = A._affine3(inv)
    wts = jnp.asarray(rng.normal(size=img.shape), jnp.float32)
    got, want = _grads(img, m, "border", 0, "affine", wts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4)


def test_nonsquare_shapes_adjoint_exact():
    """Odd (8-multiple) non-square frames pick a non-default band height and
    must stay exact, zeros and border."""
    rng = np.random.default_rng(10)
    img = jnp.asarray(rng.normal(size=(2, 72, 88, 3)), jnp.float32)
    m = _rot_trans_mats(jax.random.PRNGKey(10), 2, 72, 88)
    wts = jnp.asarray(rng.normal(size=img.shape), jnp.float32)
    for mode in ("zeros", "border"):
        got, want = _grads(img, m, mode, 0, "affine", wts)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4)


def test_pick_tile_properties():
    from feed_forward_vqgan_clip_tpu.ops.pallas.warp_adjoint import pick_tile

    t, ck = pick_tile(224, 224, 224, 3, 224)
    assert t == 224 and 224 % ck == 0
    # even chunk count preferred so the kernel's 2-unrolled loop applies
    assert (224 // ck) % 2 == 0
    t, ck = pick_tile(72, 88, 88, 3, 72)
    assert t == 72 and 72 % ck == 0
    # non-8-multiple height is rejected
    assert pick_tile(225, 224, 224, 3, 224) == (None, None)
    # a tiny budget forces smaller bands but still returns a divisor (12 MB:
    # the 2-unrolled kernel keeps two chunks' hats live, raising the floor —
    # 6 MB now legitimately returns None -> XLA fallback)
    assert pick_tile(224, 224, 224, 3, 224, budget_bytes=6 * 1024 * 1024) == (
        None, None,
    )
    t, ck = pick_tile(224, 224, 224, 3, 224, budget_bytes=12 * 1024 * 1024)
    assert t is not None and 224 % t == 0 and t < 224


def test_bf16_adjoint_mode():
    """bf16 cotangents run the single-pass adjoint mode; the image gradient
    stays bf16 and matches the f32 adjoint to bf16 rounding."""
    import math as _math

    rng = np.random.default_rng(7)
    img32 = jnp.asarray(rng.random(size=(2, 64, 64, 3)), jnp.float32)
    img16 = img32.astype(jnp.bfloat16)
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    ang = jax.random.uniform(k1, (2,), minval=-15.0, maxval=15.0) * _math.pi / 180
    tx = jax.random.uniform(k2, (2,), minval=-0.1, maxval=0.1) * 64
    ty = jax.random.uniform(k3, (2,), minval=-0.1, maxval=0.1) * 64
    inv = A._affine_inverse_about_center(ang, tx, ty, jnp.ones((2,)), 64, 64)
    m = A._affine3(inv)

    def loss(x):
        return jnp.sum(A.warp_projective(x, m, "border", 0, "affine").astype(jnp.float32) ** 2)

    g16 = jax.grad(loss)(img16)
    assert g16.dtype == jnp.bfloat16
    g32 = jax.grad(loss)(img32)
    scale = float(jnp.max(jnp.abs(g32))) + 1e-8
    err = float(jnp.max(jnp.abs(g16.astype(jnp.float32) - g32))) / scale
    assert err < 5e-2, err


def test_crop_rectangular_adjoint_exact():
    """Crop-family VJP (rectangular out_hw, round 4) must equal XLA's
    scatter backward of the same forward."""
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
    cw = jax.random.uniform(k1, (2,), minval=16.0, maxval=64.0)
    ch = jax.random.uniform(k2, (2,), minval=16.0, maxval=64.0)
    x0 = jax.random.uniform(k3, (2,)) * (64 - cw)
    y0 = jax.random.uniform(k4, (2,)) * (64 - ch)
    wts = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)

    def fast_loss(im):
        return jnp.sum(A._crop_resize(im, x0, y0, cw, ch, 32) * wts)

    def ref_loss(im):
        lin = jnp.linspace(0.0, 1.0, 32)
        gx = x0[:, None, None] + lin[None, None, :] * (cw[:, None, None] - 1)
        gy = y0[:, None, None] + lin[None, :, None] * (ch[:, None, None] - 1)
        gx = jnp.broadcast_to(gx, (2, 32, 32))
        gy = jnp.broadcast_to(gy, (2, 32, 32))
        return jnp.sum(A.grid_sample(im, gx, gy, "border") * wts)

    got = jax.grad(fast_loss)(img)
    want = jax.grad(ref_loss)(img)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4)
