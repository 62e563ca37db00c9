"""Differentiable batched image augmentations, PRNG-keyed, NHWC.

TPU-native replacement for the kornia augmentation pipeline the reference composes
by 2-char codes (/root/reference/main.py:167-201). Every op is shape-static and
jittable; randomness comes from explicit jax.random keys; per-sample probability
gating is a bernoulli select (kornia's default per-sample behavior).

All warps share one primitive — `grid_sample` (bilinear, zeros/border padding) —
so affine / perspective / rotation / crops / elastic / thin-plate all lower to the
same gather+lerp graph XLA fuses with the downstream CLIP-normalize.

Parity notes per code (default train set is ('Af','Pe','Ji','Er'), main.py:165).
"oracle-pinned" = fixed-draw output equality against vendored kornia-0.5.10
math (tests/test_augment.py), not just the same transform family:
  Af  RandomAffine(degrees 15, translate 0.1, p .7, border)   oracle-pinned
  Pe  RandomPerspective(distortion_scale 0.7, p .7)           oracle-pinned
  Ji  ColorJitter(hue .1, saturation .1, p .7)                oracle-pinned
  Er/Er2 RandomErasing(scale (.1,.4), ratio (.3,3.33), p .7)  oracle-pinned
  Et  ElasticTransform(p .7)       oracle-pinned (kornia 0.5.10 kernel)
  Ts  ThinPlateSpline(.3, p .7)    oracle-pinned (incl. kornia's center quirk)
  Ji2 ColorJitter(brightness .1, contrast .1, sat .05, hue .05, p .5)
  Sh  RandomSharpness(.4, p .7)    Gn  GaussianNoise(std 1, p .5)
  Ro  RandomRotation(15, p .7)
  Cr/Re/Cc crops (+Re2)            exact family: the same output->input map
      kornia's crop_by_boxes solves (sx = x0 + qx*(cw-1)/(S-1)), expressed as
      a projective matrix and routed through `warp_projective` — so crops ride
      the MXU warp kernels instead of the gather/scatter pair (measured
      617.6 -> 22.7 ms fwd+bwd for a Cc chain at train shapes, BENCH_NOTES.md)
  R   resize                       jax.image bilinear
"""

import functools
import math
import os
from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- core sampler


def grid_sample(img, gx, gy, padding_mode="zeros"):
    """Bilinear sample img (B,H,W,C) at pixel coords gx/gy (B,Ho,Wo) -> (B,Ho,Wo,C)."""
    b, h, w, c = img.shape
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = (gx - x0)[..., None]
    wy = (gy - y0)[..., None]

    def fetch(xi, yi):
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = img.reshape(b, h * w, c)
        idx = yc * w + xc  # (B, Ho, Wo)
        val = jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1), axis=1
        ).reshape(*idx.shape, c)
        if padding_mode == "zeros":
            inside = (
                (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            )[..., None]
            val = jnp.where(inside, val, 0.0)
        return val

    v00 = fetch(x0, y0)
    v01 = fetch(x0 + 1, y0)
    v10 = fetch(x0, y0 + 1)
    v11 = fetch(x0 + 1, y0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _base_grid(b, h, w):
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return (
        jnp.broadcast_to(xs, (b, h, w)),
        jnp.broadcast_to(ys, (b, h, w)),
    )


def warp_affine_inverse(img, inv_mat, out_hw=None, padding_mode="zeros"):
    """Warp with per-sample INVERSE 2x3 affine `inv_mat` (B,2,3) in pixel coords:
    output pixel (x,y) samples input at inv_mat @ [x, y, 1]."""
    b, h, w, _ = img.shape
    oh, ow = out_hw or (h, w)
    gx, gy = _base_grid(b, oh, ow)
    sx = inv_mat[:, 0, 0, None, None] * gx + inv_mat[:, 0, 1, None, None] * gy + inv_mat[:, 0, 2, None, None]
    sy = inv_mat[:, 1, 0, None, None] * gx + inv_mat[:, 1, 1, None, None] * gy + inv_mat[:, 1, 2, None, None]
    return grid_sample(img, sx, sy, padding_mode)


def _affine_inverse_about_center(angle, tx, ty, scale, h, w):
    """Inverse affine (B,2,3) for rotate(angle)+translate(t)+scale about the center."""
    cx = (w - 1) / 2.0
    cy = (h - 1) / 2.0
    cos = jnp.cos(-angle) / scale
    sin = jnp.sin(-angle) / scale
    # inverse of [R*s | t] about center: p_in = R^-1/s (p_out - c - t) + c
    a, bb = cos, -sin
    d, e = sin, cos
    c0 = -a * (cx + tx) - bb * (cy + ty) + cx
    f0 = -d * (cx + tx) - e * (cy + ty) + cy
    return jnp.stack(
        [jnp.stack([a, bb, c0], -1), jnp.stack([d, e, f0], -1)], axis=1
    )


def solve_homography(src, dst):
    """Per-sample homography H (B,3,3) with dst ~ H @ src; src/dst (B,4,2)."""
    b = src.shape[0]
    x, y = src[..., 0], src[..., 1]
    u, v = dst[..., 0], dst[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    rows_u = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], -1)
    rows_v = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], -1)
    A = jnp.concatenate([rows_u, rows_v], axis=1)  # (B, 8, 8)
    rhs = jnp.concatenate([u, v], axis=1)[..., None]  # (B, 8, 1)
    p = jnp.linalg.solve(A, rhs)[..., 0]  # (B, 8)
    return jnp.concatenate([p, jnp.ones((b, 1))], axis=1).reshape(b, 3, 3)


def warp_perspective_inverse(img, h_inv, padding_mode="zeros", out_hw=None):
    """Warp with per-sample inverse homography (output->input, pixel coords).
    out_hw sets the output grid size (crops/resizes); default = input size."""
    b, h, w, _ = img.shape
    oh, ow = out_hw or (h, w)
    gx, gy = _base_grid(b, oh, ow)
    den = h_inv[:, 2, 0, None, None] * gx + h_inv[:, 2, 1, None, None] * gy + h_inv[:, 2, 2, None, None]
    sx = (h_inv[:, 0, 0, None, None] * gx + h_inv[:, 0, 1, None, None] * gy + h_inv[:, 0, 2, None, None]) / den
    sy = (h_inv[:, 1, 0, None, None] * gx + h_inv[:, 1, 1, None, None] * gy + h_inv[:, 1, 2, None, None]) / den
    return grid_sample(img, sx, sy, padding_mode)


# ------------------------------------------------- fast-VJP projective warping
#
# XLA's autodiff backward of `grid_sample` w.r.t. the image is a scatter-add
# (~400 ms/step per warp at train shapes, BENCH_NOTES.md). `warp_projective`
# keeps the forward EXACTLY as above but replaces the image-gradient with the
# gather-only Pallas adjoint (ops/pallas/warp_adjoint.py) whenever its static
# candidate windows provably cover the draw; a lax.cond falls back to the XLA
# transpose on the rare uncoverable draws, so gradients are exact ALWAYS.
#
# The warp matrices are never trainable (they are drawn from jax.random inside
# the aug fns, /root/reference/main.py:167-201 semantics) — their cotangent is
# returned as zeros.

_WARP_VJP_MODE = os.environ.get("FFVC_WARP_VJP", "auto")  # auto | pallas | xla
_WARP_FWD_MODE = os.environ.get("FFVC_WARP_FWD", "auto")  # auto | pallas | xla
_WARP_INTERPRET = False  # tests flip this to exercise the kernel on CPU
# narrow (default): the zeros-affine family uses the 15-degree-bound row
# window with a traced lax.cond fallback to the XLA path on uncoverable draws.
# full: every family takes the whole-input row window, making coverage
# unconditional — the compiled step carries NO conditional (and none of its
# operand copies / fallback executable) at the price of wider window DMAs.
# Same exact gradients either way (benchmarks/warp_window_ab.py: identical
# value/grad on chip). Measured on v5e at B=64/224px: the wider windows LOSE
# — Af fwd+bwd chain 19.32 (narrow) -> 21.74 ms (full) — so narrow stays the
# default; `full` remains available for pods/compile-time A/Bs.
_WARP_WINDOW = os.environ.get("FFVC_WARP_WINDOW", "narrow")
if _WARP_WINDOW not in ("narrow", "full"):
    raise ValueError(
        f"FFVC_WARP_WINDOW={_WARP_WINDOW!r} is not a recognized mode; use "
        "'narrow' (bounded affine windows + cond fallback, default) or 'full' "
        "(unconditional whole-input windows, no conditional in the step)."
    )


def _fast_fwd_enabled():
    if _WARP_FWD_MODE == "xla":
        return False
    if _WARP_FWD_MODE == "pallas":
        return True
    return _fast_vjp_enabled()


def _fast_vjp_enabled():
    if _WARP_VJP_MODE == "xla":
        return False
    if _WARP_VJP_MODE == "pallas":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _proj_warp_math(img, m, padding_mode, out_hw=None):
    return warp_perspective_inverse(img, m, padding_mode, out_hw)


def _xla_adjoint(gout, m, img_sd, padding_mode, out_hw=None):
    # the .astype matches _dispatch_forward's output cast (bf16 pixels promote
    # through grid_sample's f32 lerp weights; the transposed fn must agree)
    (gimg,) = jax.linear_transpose(
        lambda im: _proj_warp_math(im, m, padding_mode, out_hw).astype(img_sd.dtype),
        img_sd,
    )(gout.astype(img_sd.dtype))
    return gimg


def _pallas_adjoint(gout, m, img_sd, padding_mode, pad, kind, out_hw=None):
    """Exact grad via the gather kernel, lax.cond-guarded to the XLA transpose.

    border mode is handled by in-kernel coordinate clamping (grid_sample's
    border padding IS coordinate clamping — both bilinear taps of an
    out-of-frame sample collapse onto the border pixel with weights summing
    to 1), so no frame padding or gradient fold is needed and `pad` is
    advisory only. border/projective take the full-output row window, making
    coverage unconditional; only the zeros-affine family uses a narrower
    window with a planned fallback."""
    from feed_forward_vqgan_clip_tpu.ops.pallas.warp_adjoint import (
        adjoint_plan,
        pick_cand,
        pick_tile,
        warp_adjoint,
    )

    b, h, w, c = img_sd.shape
    oh, ow = gout.shape[1:3]
    # bf16 cotangents (aug stage running in the pipeline's bf16 compute dtype)
    # keep the single-pass bf16 kernel mode; everything else computes in f32
    bf16 = img_sd.dtype == jnp.bfloat16 and gout.dtype == jnp.bfloat16
    align = 16 if bf16 else 8
    gout = gout.astype(jnp.bfloat16 if bf16 else jnp.float32)
    border = padding_mode == "border"

    if oh % align != 0:
        return _xla_adjoint(gout, m, img_sd, padding_mode, out_hw)
    full = (oh // align) * align
    tile, ck = pick_tile(h, w, ow, c, full)
    if tile is None:
        return _xla_adjoint(gout, m, img_sd, padding_mode, out_hw)
    cand = full if _WARP_WINDOW == "full" else pick_cand(tile, kind, w, oh, border)
    if cand < align or cand % align != 0:
        return _xla_adjoint(gout, m, img_sd, padding_mode, out_hw)
    if cand < full:
        tile, ck = pick_tile(h, w, ow, c, cand)
        # pick_tile's VMEM estimate is monotone in cand today, so this re-pick
        # cannot fail while the first succeeded — but that is an invariant of
        # the estimate, not of the interface; guard so a future heuristic
        # change degrades to the XLA path instead of a TypeError.
        if tile is None:
            return _xla_adjoint(gout, m, img_sd, padding_mode, out_hw)

    origins, uncovered = adjoint_plan(m, (h, w), (oh, ow), tile, cand, align=align)

    def fast(g):
        return warp_adjoint(
            g, m, origins, in_hw=(h, w), tile=tile, cand=cand, border=border,
            ck=ck, interpret=_WARP_INTERPRET,
        )

    if uncovered is False:  # static full-window coverage: no cond, no fallback branch
        return fast(gout).astype(img_sd.dtype)

    def slow(g):
        return _xla_adjoint(g, m, img_sd, padding_mode, out_hw).astype(g.dtype)

    return jax.lax.cond(uncovered, slow, fast, gout).astype(img_sd.dtype)


def _pallas_forward(img, m, padding_mode, kind, out_hw=None):
    """MXU-contraction forward (ops/pallas/warp_forward.py), lax.cond-guarded
    to the XLA gather on uncoverable draws. Same math as _proj_warp_math,
    different rounding order (~1e-5). out_hw != input size (crops) rides the
    kernel's rectangular output support (output row bands, input row windows)."""
    from feed_forward_vqgan_clip_tpu.ops.pallas.warp_forward import (
        forward_plan,
        pick_fwd_cand,
        warp_forward,
    )

    b, h, w, c = img.shape
    oh, ow = out_hw or (h, w)
    bf16 = img.dtype == jnp.bfloat16
    align = 16 if bf16 else 8
    kdt = jnp.bfloat16 if bf16 else jnp.float32
    tile = next((t for t in (32, 16, 8) if oh % t == 0), None)
    if tile is None or h % align != 0:
        return _proj_warp_math(img, m, padding_mode, out_hw)
    border = padding_mode == "border"
    cand = (h // 8) * 8 if _WARP_WINDOW == "full" else pick_fwd_cand(tile, kind, ow, h)
    if cand < align or cand % align != 0:
        return _proj_warp_math(img, m, padding_mode, out_hw)
    origins, uncovered = forward_plan(m, h, (oh, ow), tile, cand, border, align=align)

    def fast(im):
        return warp_forward(
            im, m, origins, out_hw=(oh, ow), tile=tile, cand=cand, border=border,
            interpret=_WARP_INTERPRET,
        )

    if uncovered is False:  # static full-window coverage: no cond, no fallback branch
        return fast(img.astype(kdt)).astype(img.dtype)

    def slow(im):
        return _proj_warp_math(im, m, padding_mode, out_hw).astype(kdt)

    return jax.lax.cond(
        uncovered, slow, fast, img.astype(kdt)
    ).astype(img.dtype)


def _dispatch_forward(img, m, padding_mode, kind, out_hw=None):
    # output dtype always equals img dtype (grid_sample's f32 lerp weights
    # promote bf16 pixels — cast back so the Pallas and XLA paths agree)
    if _fast_fwd_enabled():
        return _pallas_forward(img, m, padding_mode, kind, out_hw).astype(img.dtype)
    return _proj_warp_math(img, m, padding_mode, out_hw).astype(img.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def warp_projective(img, m, padding_mode="zeros", pad=0, kind="projective",
                    out_hw=None):
    """grid_sample with a projective (B, 3, 3) output->input map `m`, a fast
    MXU forward, and a gather-only exact VJP. Forward math identical to
    warp_perspective_inverse (bit-identical when FFVC_WARP_FWD=xla; the Pallas
    forward differs only in rounding order, ~1e-5). `pad` is unused (border
    mode is exact via in-kernel coordinate clamping — no overshoot bound
    needed); kept in the signature for call-site stability. Fallbacks to the
    XLA gather/transpose remain only for the narrow-window zeros-affine
    adjoint plan and non-8-multiple shapes."""
    return _dispatch_forward(img, m, padding_mode, kind, out_hw)


def _warp_projective_fwd(img, m, padding_mode, pad, kind, out_hw):
    out = _dispatch_forward(img, m, padding_mode, kind, out_hw)
    return out, (m, jax.ShapeDtypeStruct(img.shape, img.dtype))


def _warp_projective_bwd(padding_mode, pad, kind, out_hw, res, gout):
    m, img_sd = res
    if _fast_vjp_enabled():
        gimg = _pallas_adjoint(gout, m, img_sd, padding_mode, pad, kind, out_hw)
    else:
        gimg = _xla_adjoint(gout, m, img_sd, padding_mode, out_hw)
    return gimg, jnp.zeros_like(m)


warp_projective.defvjp(_warp_projective_fwd, _warp_projective_bwd)


def _affine3(inv2x3):
    b = inv2x3.shape[0]
    last = jnp.broadcast_to(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (b, 1, 3))
    return jnp.concatenate([inv2x3, last], axis=1)


def _affine_pad(h, w, degrees, translate):
    """Static bound on |s| overshoot beyond the frame for rotation(+-degrees)
    about the center + translate: corner displacement 2 sin(deg/2) * diag/2,
    plus the translation."""
    diag = math.hypot(h, w)
    return int(
        math.ceil(2 * math.sin(math.radians(degrees) / 2) * diag / 2
                  + translate * max(h, w)) + 2
    )


# ---------------------------------------------------------------- color space


def rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.0)
    safe = jnp.maximum(delta, 1e-8)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _apply_p(key, p, x_aug, x):
    applied = jax.random.bernoulli(key, p, (x.shape[0],))
    return jnp.where(applied[:, None, None, None], x_aug, x)


# ---------------------------------------------------------------- augmentations


def fused_affine_perspective(key, x, degrees=15.0, translate=0.1, p_af=0.7,
                             distortion_scale=0.7, p_pe=0.7):
    """RandomAffine followed by RandomPerspective COMPOSED into one projective
    warp (one resample instead of two).

    The sequential reference pipeline resamples twice — on TPU each bilinear
    warp's backward is a scatter (~400 ms/step at train shapes), so fusing the
    two geometric augs halves the dominant training cost. Composition differs
    from two sequential resamples only in interpolation (single-resample is
    sharper) and in padding semantics (border, from the affine stage, applies to
    the whole composed warp); per-sample application probabilities are preserved
    exactly. Opt-in via the `fuse_geometric` knob in MakeCutouts.
    """
    b, h, w, _ = x.shape
    k1, k2, k3, kpa, k4, kpp = jax.random.split(key, 6)

    # affine inverse map (identity where not applied)
    ang = jax.random.uniform(k1, (b,), minval=-degrees, maxval=degrees) * math.pi / 180
    tx = jax.random.uniform(k2, (b,), minval=-translate, maxval=translate) * w
    ty = jax.random.uniform(k3, (b,), minval=-translate, maxval=translate) * h
    af = _affine_inverse_about_center(ang, tx, ty, jnp.ones((b,)), h, w)  # (b,2,3)
    af3 = jnp.concatenate(
        [af, jnp.broadcast_to(jnp.asarray([[0.0, 0.0, 1.0]]), (b, 1, 3))], axis=1
    )
    eye = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))
    applied_af = jax.random.bernoulli(kpa, p_af, (b,))[:, None, None]
    af3 = jnp.where(applied_af, af3, eye)

    # perspective inverse map (identity where not applied)
    base = jnp.asarray(
        [[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0], [0.0, h - 1.0]]
    )
    signs = jnp.asarray([[1, 1], [-1, 1], [-1, -1], [1, -1]], jnp.float32)
    half = jnp.asarray([w, h], jnp.float32) * (distortion_scale / 2.0)
    disp = jax.random.uniform(k4, (b, 4, 2)) * half * signs
    dst = base[None] + disp
    h_inv = solve_homography(dst, jnp.broadcast_to(base, (b, 4, 2)))
    applied_pe = jax.random.bernoulli(kpp, p_pe, (b,))[:, None, None]
    h_inv = jnp.where(applied_pe, h_inv, eye)

    # out(q) = img(Af_inv . Pe_inv . q): Pe is applied LAST in the reference
    # chain, so its inverse acts first on the output coordinate
    m = jnp.einsum("bij,bjk->bik", af3, h_inv)
    return warp_projective(
        x, m, "border", _affine_pad(h, w, degrees, translate) + 16, "projective"
    )


def _kornia_ac_false_fold(m3, h, w):
    """Fold kornia 0.5.10's align_corners mismatch into an inverse warp matrix.

    kornia's warp_affine/warp_perspective normalize the pixel matrix with the
    ALIGN-CORNERS convention (normal_transform_pixel: scale 2/(w-1)) but then
    call F.grid_sample with align_corners=False — the net effect is that the
    pixel-space source coordinate s our matrices produce is sampled by torch at
    s*w/(w-1) - 0.5 per axis (the same sub-pixel "zoom" quirk the Et/Ts
    oracles replicate). Composing that map into rows 0/1 of the 3x3 inverse
    keeps the downstream warp kernels (XLA and Pallas) unchanged."""
    fx = w / (w - 1.0)
    fy = h / (h - 1.0)
    r0 = m3[:, 0:1, :] * fx - 0.5 * m3[:, 2:3, :]
    r1 = m3[:, 1:2, :] * fy - 0.5 * m3[:, 2:3, :]
    return jnp.concatenate([r0, r1, m3[:, 2:3, :]], axis=1)


def af_sample(key, b, h, w, degrees=15.0, translate=0.1):
    """kornia random_affine_generator draws: angle (degrees), translations
    (pixels, bound translate*side)."""
    k1, k2, k3 = jax.random.split(key, 3)
    ang = jax.random.uniform(k1, (b,), minval=-degrees, maxval=degrees)
    tx = jax.random.uniform(k2, (b,), minval=-translate, maxval=translate) * w
    ty = jax.random.uniform(k3, (b,), minval=-translate, maxval=translate) * h
    return ang, tx, ty


def af_apply(x, ang_deg, tx, ty, padding_mode="border", pad=0):
    """kornia RandomAffine.apply for sampled (angle, translations): rotation
    about the (w-1)/2 center composed with translation
    (get_affine_matrix2d), warped through the align_corners=False quirk.
    kornia's get_rotation_matrix2d is the OpenCV matrix [[a, b], [-b, a]] with
    b = sin(angle); _affine_inverse_about_center(+ang) builds exactly that
    FORWARD form, so the kornia-parity INVERSE is obtained by negating the
    angle (pinned by the fixed-draw oracle in tests/test_augment.py)."""
    b, h, w, _ = x.shape
    ang = -ang_deg * (math.pi / 180.0)
    inv = _affine_inverse_about_center(ang, tx, ty, jnp.ones((b,)), h, w)
    m3 = _kornia_ac_false_fold(_affine3(inv), h, w)
    return warp_projective(x, m3, padding_mode, pad, "affine")


def random_affine(key, x, degrees=15.0, translate=0.1, p=0.7):
    """kornia RandomAffine(degrees, translate, padding_mode='border') (main.py:182)."""
    b, h, w, _ = x.shape
    ks, kp = jax.random.split(key)
    ang, tx, ty = af_sample(ks, b, h, w, degrees, translate)
    warped = af_apply(x, ang, tx, ty, "border", _affine_pad(h, w, degrees, translate))
    return _apply_p(kp, p, warped, x)


def random_rotation(key, x, degrees=15.0, p=0.7):
    """kornia RandomRotation(degrees) (main.py:180)."""
    b, h, w, _ = x.shape
    k1, kp = jax.random.split(key)
    ang = jax.random.uniform(k1, (b,), minval=-degrees, maxval=degrees)
    zero = jnp.zeros((b,))
    return _apply_p(kp, p, af_apply(x, ang, zero, zero, "zeros", 0), x)


def pe_sample(key, b, h, w, distortion_scale=0.7):
    """kornia random_perspective_generator: end = corner + U(0,1) * d/2 * side
    pulled INWARD via the fixed sign pattern."""
    base = jnp.asarray(
        [[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0], [0.0, h - 1.0]]
    )
    signs = jnp.asarray([[1, 1], [-1, 1], [-1, -1], [1, -1]], jnp.float32)
    half = jnp.asarray([w, h], jnp.float32) * (distortion_scale / 2.0)
    disp = jax.random.uniform(key, (b, 4, 2)) * half * signs
    start = jnp.broadcast_to(base, (b, 4, 2))
    return start, start + disp


def pe_apply(x, start, end, padding_mode="zeros"):
    """kornia RandomPerspective.apply for sampled corner points: H solved from
    start->end (get_perspective_transform), inverse-warped with zeros padding
    through the align_corners=False quirk."""
    b, h, w, _ = x.shape
    h_inv = solve_homography(end, start)
    h_inv = _kornia_ac_false_fold(h_inv, h, w)
    return warp_projective(x, h_inv, padding_mode, 0, "projective")


def random_perspective(key, x, distortion_scale=0.7, p=0.7):
    """kornia RandomPerspective (main.py:178): corners pulled inward by
    uniform(0, d/2 * side)."""
    b, h, w, _ = x.shape
    k1, kp = jax.random.split(key)
    start, end = pe_sample(k1, b, h, w, distortion_scale)
    return _apply_p(kp, p, pe_apply(x, start, end), x)


def ji_sample(key, b, brightness=0.0, contrast=0.0, saturation=0.1, hue=0.1):
    """kornia random_color_jitter_generator (0.5.10): per-sample factors with
    kornia's bound convention (scalar c -> uniform[max(0, 1-c), 1+c]; hue ->
    uniform[-hue, hue]) plus ONE random application order per call
    (torch.randperm(4))."""
    kb, kc, ks, kh, ko = jax.random.split(key, 5)
    bf = jax.random.uniform(kb, (b,), minval=max(0.0, 1 - brightness), maxval=1 + brightness)
    cf = jax.random.uniform(kc, (b,), minval=max(0.0, 1 - contrast), maxval=1 + contrast)
    sf = jax.random.uniform(ks, (b,), minval=max(0.0, 1 - saturation), maxval=1 + saturation)
    hf = jax.random.uniform(kh, (b,), minval=-hue, maxval=hue)
    order = jax.random.permutation(ko, 4)
    return bf, cf, sf, hf, order


def ji_apply(x, bf, cf, sf, hf, order=None):
    """kornia ColorJitter.apply_transform (0.5.10) semantics — these differ
    from torchvision on purpose: brightness is ADDITIVE (input + (factor-1),
    clamped), contrast is a PURE SCALE (input * factor, clamped, no mean
    centering), saturation scales S in HSV (clamped), hue shifts H modularly
    (adjust_hue's factor*2pi == a shift of `factor` in our [0,1) hue turns).
    Each adjustment is its own HSV round trip like kornia's, applied in
    `order` (kornia draws torch.randperm(4) per call; None = identity order)."""
    bf = bf.reshape(-1, 1, 1, 1)
    cf = cf.reshape(-1, 1, 1, 1)

    def _brightness(img):
        return jnp.clip(img + (bf - 1.0), 0.0, 1.0)

    def _contrast(img):
        return jnp.clip(img * cf, 0.0, 1.0)

    def _saturation(img):
        hsv = rgb_to_hsv(img)
        ss = jnp.clip(hsv[..., 1] * sf.reshape(-1, 1, 1), 0.0, 1.0)
        return hsv_to_rgb(jnp.stack([hsv[..., 0], ss, hsv[..., 2]], axis=-1))

    def _hue(img):
        hsv = rgb_to_hsv(img)
        hh = (hsv[..., 0] + hf.reshape(-1, 1, 1)) % 1.0
        return hsv_to_rgb(jnp.stack([hh, hsv[..., 1], hsv[..., 2]], axis=-1))

    fns = (_brightness, _contrast, _saturation, _hue)
    out = x
    if order is None:
        for fn in fns:
            out = fn(out)
    else:
        for i in range(4):
            out = jax.lax.switch(order[i], fns, out)
    return out


def color_jitter(key, x, brightness=0.0, contrast=0.0, saturation=0.1, hue=0.1, p=0.7):
    """kornia ColorJitter (main.py:170-172): per-sample factors, one random
    transform order per call (kornia 0.5.10 randperm semantics).

    Fast path for the default 'Ji' code (brightness == contrast == 0,
    STATICALLY known): the b/c transforms are identities and saturation/hue
    act on disjoint HSV channels, so every one of kornia's 24 orders computes
    the same function — apply both in ONE HSV round trip with no lax.switch
    (the ordered path costs two round trips + 4 switches per call; measured
    on the train-step hot loop). Exactness vs the ordered path is pinned by
    the kornia oracle tests."""
    b = x.shape[0]
    ks, kp = jax.random.split(key)
    bf, cf, sf, hf, order = ji_sample(ks, b, brightness, contrast, saturation, hue)
    # HSV math always runs in f32 (hue is an angle in [0,1) — bf16's 8-bit
    # mantissa would quantize it to ~1.4 deg steps); bf16 inputs only pay two
    # casts, which XLA fuses into the elementwise chain.
    xf = x.astype(jnp.float32)
    if brightness == 0.0 and contrast == 0.0:
        hsv = rgb_to_hsv(xf)
        ss = jnp.clip(hsv[..., 1] * sf.reshape(-1, 1, 1), 0.0, 1.0)
        hh = (hsv[..., 0] + hf.reshape(-1, 1, 1)) % 1.0
        out = hsv_to_rgb(jnp.stack([hh, ss, hsv[..., 2]], axis=-1))
    else:
        out = ji_apply(xf, bf, cf, sf, hf, order)
    return _apply_p(kp, p, out.astype(x.dtype), x)


def er_sample(key, n, h, w, scale=(0.1, 0.4), ratio=(0.3, 1 / 0.3)):
    """kornia random_rectangles_params_generator (0.5.10): area uniform in
    scale*H*W; aspect (box h/w) drawn as a TWO-PART uniform mixture when the
    ratio range straddles 1 (uniform(r0,1) or uniform(1,r1), coin-flipped) —
    NOT torchvision's log-uniform; box height = round(sqrt(area*aspect)) and
    width = round(sqrt(area/aspect)), clamped to [1, side]; the origin is
    uniform(0,1)*(side - box + 1) kept as a FLOAT."""
    ka, kr1, kr2, kpick, kx, ky = jax.random.split(key, 6)
    area = jax.random.uniform(ka, (n,), minval=scale[0], maxval=scale[1]) * h * w
    if ratio[0] < 1.0 < ratio[1]:
        a1 = jax.random.uniform(kr1, (n,), minval=ratio[0], maxval=1.0)
        a2 = jax.random.uniform(kr2, (n,), minval=1.0, maxval=ratio[1])
        pick = jnp.round(jax.random.uniform(kpick, (n,))).astype(bool)
        aspect = jnp.where(pick, a1, a2)
    else:
        aspect = jax.random.uniform(kr1, (n,), minval=ratio[0], maxval=ratio[1])
    eh = jnp.clip(jnp.round(jnp.sqrt(area * aspect)), 1, h)
    ew = jnp.clip(jnp.round(jnp.sqrt(area / aspect)), 1, w)
    y0 = jax.random.uniform(ky, (n,)) * (h - eh + 1)
    x0 = jax.random.uniform(kx, (n,)) * (w - ew + 1)
    return x0, y0, ew, eh


def er_apply(x, x0, y0, ew, eh):
    """kornia RandomErasing.apply via bbox_to_mask semantics: integer pixel j
    is erased iff x0 <= j <= x0 + ew - 1 (float comparisons against the
    integer grid, i.e. j in [ceil(x0), floor(x0+ew-1)])."""
    n = x0.shape[0]
    h, w = x.shape[1:3]
    gx, gy = _base_grid(n, h, w)
    inside = (
        (gx >= x0[:, None, None]) & (gx <= (x0 + ew - 1)[:, None, None])
        & (gy >= y0[:, None, None]) & (gy <= (y0 + eh - 1)[:, None, None])
    )[..., None]
    inside = jnp.broadcast_to(inside, x.shape[:3] + (1,))
    return jnp.where(inside, 0.0, x)


def random_erasing(key, x, scale=(0.1, 0.4), ratio=(0.3, 1 / 0.3), p=0.7, same_on_batch=True):
    """kornia RandomErasing (main.py:190-192): rectangle filled with zeros."""
    b, h, w, _ = x.shape
    n = 1 if same_on_batch else b
    ks, kp = jax.random.split(key)
    x0, y0, ew, eh = er_sample(ks, n, h, w, scale, ratio)
    return _apply_p(kp, p, er_apply(x, x0, y0, ew, eh), x)


def random_sharpness(key, x, sharpness=0.4, p=0.7):
    """kornia RandomSharpness (main.py:174): blend toward a 3x3 smoothed image."""
    b = x.shape[0]
    k1, kp = jax.random.split(key)
    factor = jax.random.uniform(k1, (b, 1, 1, 1), minval=0.0, maxval=sharpness)
    kernel = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    blurred = _conv2d_same(x, kernel)
    # interior-only smoothing like torchvision: keep the border rows/cols
    blurred = _keep_border(blurred, x)
    sharp = x + factor * (x - blurred)
    return _apply_p(kp, p, jnp.clip(sharp, 0.0, 1.0), x)


def gaussian_noise(key, x, mean=0.0, std=1.0, p=0.5):
    """kornia RandomGaussianNoise (main.py:176)."""
    k1, kp = jax.random.split(key)
    noisy = x + mean + std * jax.random.normal(k1, x.shape, x.dtype)
    return _apply_p(kp, p, noisy, x)


def _sample_normalized_ac_false(x, gx_norm, gy_norm):
    """F.grid_sample(align_corners=False, padding_mode='zeros') semantics: map
    normalized [-1,1] coords to pixel centers via p = ((g+1)*S - 1)/2 and
    bilinear-sample with per-tap zeroing outside the frame."""
    _, h, w, _ = x.shape
    sx = ((gx_norm + 1.0) * w - 1.0) / 2.0
    sy = ((gy_norm + 1.0) * h - 1.0) / 2.0
    return grid_sample(x, sx, sy, "zeros")


def elastic_warp(x, noise, kernel_size=63, sigma=32.0, alpha=1.0):
    """kornia 0.5.10 `elastic_transform2d` exactly: uniform noise field (B,H,W,2)
    blurred by a normalized zero-padded Gaussian ('constant' border), scaled by
    alpha, added to the NORMALIZED align-corners meshgrid, clamped to [-1,1],
    sampled with align_corners=False + zeros padding."""
    b, h, w, _ = x.shape
    disp = _gaussian_blur(noise, kernel_size, sigma) * alpha
    gnx = jnp.linspace(-1.0, 1.0, w, dtype=jnp.float32)
    gny = jnp.linspace(-1.0, 1.0, h, dtype=jnp.float32)
    gx = jnp.clip(gnx[None, None, :] + disp[..., 0], -1.0, 1.0)
    gy = jnp.clip(gny[None, :, None] + disp[..., 1], -1.0, 1.0)
    return _sample_normalized_ac_false(x, gx, gy)


def elastic_transform(key, x, kernel_size=63, sigma=32.0, alpha=1.0, p=0.7):
    """kornia RandomElasticTransform defaults (main.py:184), exact kernel math
    (see elastic_warp); per-sample p-gating like the kornia base class."""
    b, h, w, _ = x.shape
    k1, kp = jax.random.split(key)
    noise = jax.random.uniform(k1, (b, h, w, 2), minval=-1.0, maxval=1.0)
    return _apply_p(kp, p, elastic_warp(x, noise, kernel_size, sigma, alpha), x)


# ------------------------------------------------------------ thin plate spline

_TPS_EPS = 1e-8


def _tps_kernel(d2):
    # kornia _kernel_distance: 0.5 * d^2 * log(d^2 + eps)  (== d^2 log d)
    return 0.5 * d2 * jnp.log(d2 + _TPS_EPS)


def _pair_sq_dist(a, b):
    d = (
        -2.0 * jnp.einsum("bnd,bmd->bnm", a, b)
        + jnp.sum(a * a, -1)[:, :, None]
        + jnp.sum(b * b, -1)[:, None, :]
    )
    return jnp.maximum(d, 0.0)  # kornia clamps at 0


def get_tps_transform(points_src, points_dst):
    """kornia 0.5.10 `get_tps_transform`: solve [K P; P^T 0][w; a] = [dst; 0]
    with U(r) = r^2 log r at the src points. Returns (kernel_weights (B,N,2),
    affine_weights (B,3,2)) — affine row 0 is the constant term."""
    b, n = points_src.shape[:2]
    k = _tps_kernel(_pair_sq_dist(points_src, points_src))  # (B,N,N)
    one = jnp.ones((b, n, 1), points_src.dtype)
    p = jnp.concatenate([one, points_src], -1)  # (B,N,3)
    zeros33 = jnp.zeros((b, 3, 3), points_src.dtype)
    l_top = jnp.concatenate([k, p], -1)  # (B,N,N+3)
    l_bot = jnp.transpose(jnp.concatenate([p, zeros33], 1), (0, 2, 1))  # (B,3,N+3)
    l_mat = jnp.concatenate([l_top, l_bot], 1)  # (B,N+3,N+3)
    rhs = jnp.concatenate([points_dst, jnp.zeros((b, 3, 2), points_src.dtype)], 1)
    weights = jnp.linalg.solve(l_mat, rhs)
    return weights[:, :n], weights[:, n:]


def warp_points_tps(points, kernel_centers, kernel_weights, affine_weights):
    """f(v) = a0 + A v + sum_i w_i U(|v - c_i|), batched over (B,M,2) points."""
    k = _tps_kernel(_pair_sq_dist(points, kernel_centers))  # (B,M,N)
    return (
        jnp.einsum("bmn,bnd->bmd", k, kernel_weights)
        + jnp.einsum("bmd,bde->bme", points, affine_weights[:, 1:])
        + affine_weights[:, None, 0]
    )


def tps_warp(x, src, dst):
    """kornia 0.5.10 RandomThinPlateSpline.apply_transform exactly, INCLUDING its
    upstream quirk (kornia issue #1186): weights are solved for the inverse map
    with `dst` as the spline's source points, but evaluation passes `src` as the
    kernel centers. Replicated verbatim for parity."""
    b, h, w, _ = x.shape
    kernel_w, affine_w = get_tps_transform(dst, src)
    gnx, gny = jnp.meshgrid(
        jnp.linspace(-1.0, 1.0, w, dtype=jnp.float32),
        jnp.linspace(-1.0, 1.0, h, dtype=jnp.float32),
        indexing="xy",
    )
    coords = jnp.stack([gnx, gny], -1).reshape(1, h * w, 2)
    coords = jnp.broadcast_to(coords, (b, h * w, 2))
    warped = warp_points_tps(coords, src, kernel_w, affine_w).reshape(b, h, w, 2)
    return _sample_normalized_ac_false(x, warped[..., 0], warped[..., 1])


def thin_plate_spline(key, x, scale=0.3, p=0.7):
    """kornia RandomThinPlateSpline(scale) (main.py:186), exact: 5 control points
    (4 corners + center in normalized coords), dst = src + U(-scale, scale)."""
    b = x.shape[0]
    k1, kp = jax.random.split(key)
    src = jnp.broadcast_to(
        jnp.asarray(
            [[-1.0, -1.0], [-1.0, 1.0], [1.0, -1.0], [1.0, 1.0], [0.0, 0.0]],
            jnp.float32,
        ),
        (b, 5, 2),
    )
    dst = src + jax.random.uniform(k1, (b, 5, 2), minval=-scale, maxval=scale)
    return _apply_p(kp, p, tps_warp(x, src, dst), x)


def random_crop(key, x, size, p=0.5):
    """kornia RandomCrop (main.py:188). Output size is static -> the crop happens for
    every sample; p gates whether the offset is random or centered."""
    b, h, w, _ = x.shape
    k1, k2, kp = jax.random.split(key, 3)
    max_y = h - size
    max_x = w - size
    y0r = jax.random.uniform(k1, (b,)) * max_y
    x0r = jax.random.uniform(k2, (b,)) * max_x
    applied = jax.random.bernoulli(kp, p, (b,))
    y0 = jnp.where(applied, y0r, max_y / 2.0)
    x0 = jnp.where(applied, x0r, max_x / 2.0)
    return _crop_resize(x, x0, y0, jnp.full((b,), float(size)), jnp.full((b,), float(size)), size)


def center_crop(key, x, size, p=1.0):
    """kornia CenterCrop (main.py:198)."""
    b, h, w, _ = x.shape
    y0 = jnp.full((b,), (h - size) / 2.0)
    x0 = jnp.full((b,), (w - size) / 2.0)
    return _crop_resize(x, x0, y0, jnp.full((b,), float(size)), jnp.full((b,), float(size)), size)


def random_resized_crop(key, x, size, scale=(0.1, 1.0), ratio=(0.75, 1.333), p=1.0):
    """kornia RandomResizedCrop (main.py:194-196)."""
    b, h, w, _ = x.shape
    ka, kr, kx, ky = jax.random.split(key, 4)
    area = jax.random.uniform(ka, (b,), minval=scale[0], maxval=scale[1]) * h * w
    log_r = jax.random.uniform(kr, (b,), minval=math.log(ratio[0]), maxval=math.log(ratio[1]))
    aspect = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * aspect), 1.0, w)
    ch = jnp.clip(jnp.sqrt(area / aspect), 1.0, h)
    x0 = jax.random.uniform(kx, (b,)) * (w - cw)
    y0 = jax.random.uniform(ky, (b,)) * (h - ch)
    return _crop_resize(x, x0, y0, cw, ch, size)


def resize_bilinear(key, x, size, p=1.0):
    """The reference's plain `Resize` module (main.py:145-152)."""
    return jax.image.resize(x, (x.shape[0], size, size, x.shape[3]), "bilinear")


# ---------------------------------------------------------------- helpers


def _crop_resize(x, x0, y0, cw, ch, out_size):
    """Crop per-sample region (x0, y0, cw, ch) and bilinear-resize to out_size.

    The sampling map is the axis-aligned projective
    sx = x0 + qx*(cw-1)/(S-1), sy = y0 + qy*(ch-1)/(S-1) — the same map
    kornia's crop_by_boxes solves from its box corners — expressed as a
    (B, 3, 3) matrix and routed through `warp_projective`, so crops get the
    MXU warp forward + gather-only adjoint instead of grid_sample's
    gather/scatter pair (617.6 -> 22.7 ms fwd+bwd for a Cc chain at train
    shapes, BENCH_NOTES.md). Border clamping matches the old grid_sample
    call; crop boxes are in-frame by construction anyway."""
    b = x.shape[0]
    zeros = jnp.zeros((b,), jnp.float32)
    ones = jnp.ones((b,), jnp.float32)
    denom = float(max(out_size - 1, 1))
    m = jnp.stack(
        [
            jnp.stack([(cw - 1.0) / denom, zeros, x0], -1),
            jnp.stack([zeros, (ch - 1.0) / denom, y0], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=1,
    )
    return warp_projective(x, m, "border", 0, "crop", (out_size, out_size))


def _conv2d_same(x, kernel2d):
    kh, kw = kernel2d.shape
    c = x.shape[-1]
    k = jnp.zeros((kh, kw, c, c), x.dtype).at[:, :, jnp.arange(c), jnp.arange(c)].set(
        kernel2d[:, :, None]
    )
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _keep_border(blurred, x):
    b, h, w, c = x.shape
    out = blurred
    out = out.at[:, 0, :, :].set(x[:, 0, :, :])
    out = out.at[:, -1, :, :].set(x[:, -1, :, :])
    out = out.at[:, :, 0, :].set(x[:, :, 0, :])
    out = out.at[:, :, -1, :].set(x[:, :, -1, :])
    return out


def _gaussian_blur(x, kernel_size, sigma):
    half = kernel_size // 2
    xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    g = jnp.exp(-(xs ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    c = x.shape[-1]
    kv = jnp.zeros((kernel_size, 1, c, c), x.dtype).at[
        :, :, jnp.arange(c), jnp.arange(c)
    ].set(g[:, None, None])
    kh = jnp.transpose(kv, (1, 0, 2, 3))
    x = jax.lax.conv_general_dilated(x, kv, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, kh, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ---------------------------------------------------------------- registry

AugFn = Callable[..., jnp.ndarray]


def build_augment_pipeline(codes: Sequence[str], cut_size: int) -> List[AugFn]:
    """Aug code list -> list of key->image fns (reference's table, main.py:167-201)."""
    table: Dict[str, AugFn] = {
        "Ji2": lambda k, x: color_jitter(k, x, brightness=0.1, contrast=0.1, saturation=0.05, hue=0.05, p=0.5),
        "Ji": lambda k, x: color_jitter(k, x, saturation=0.1, hue=0.1, p=0.7),
        "Sh": lambda k, x: random_sharpness(k, x, 0.4, p=0.7),
        "Gn": lambda k, x: gaussian_noise(k, x, 0.0, 1.0, p=0.5),
        "Pe": lambda k, x: random_perspective(k, x, 0.7, p=0.7),
        "Ro": lambda k, x: random_rotation(k, x, 15.0, p=0.7),
        "Af": lambda k, x: random_affine(k, x, 15.0, 0.1, p=0.7),
        "Et": lambda k, x: elastic_transform(k, x, p=0.7),
        "Ts": lambda k, x: thin_plate_spline(k, x, 0.3, p=0.7),
        "Cr": lambda k, x: random_crop(k, x, cut_size, p=0.5),
        "Er": lambda k, x: random_erasing(k, x, p=0.7, same_on_batch=True),
        "Er2": lambda k, x: random_erasing(k, x, p=0.7, same_on_batch=False),
        "Re": lambda k, x: random_resized_crop(k, x, cut_size, scale=(0.1, 1.0)),
        "Re2": lambda k, x: random_resized_crop(k, x, cut_size, scale=(0.9, 1.0)),
        "Cc": lambda k, x: center_crop(k, x, cut_size),
        "R": lambda k, x: resize_bilinear(k, x, cut_size),
    }
    missing = [c for c in codes if c not in table]
    if missing:
        raise ValueError(f"unknown augmentation codes: {missing}")
    return [table[c] for c in codes]
