"""Gather-free FORWARD bilinear projective warp as MXU contractions.

Why: the warp FORWARD in the training hot loop (Af, Pe, Ro —
/root/reference/main.py:178-182) is an XLA 4-tap gather costing ~160-230 ms at
train shapes — after the gather-only adjoint (warp_adjoint.py) removed the
~400 ms scatter backward, the forward gather is what dominates each warp.
XLA lowers `take_along_axis` to near-scalar gathers on TPU; this kernel
computes the same bilinear sample as dense separable hat contractions instead:

  out[q] = sum_{py,px} hy(sy(q)-py) * hx(sx(q)-px) * img[py, px]

  * grid over (batch, OUTPUT row bands). For one T-row output band, the input
    rows its taps touch span the image of the band box under the projective
    map s(q) — extremes of a linear-fractional map over a rectangle sit on
    its corners, so `forward_plan` (XLA) derives an input ROW WINDOW origin
    per band and passes it as scalar prefetch (8-aligned, like the adjoint).
  * the kernel DMAs the (C, CAND, W) input row window once per band, builds
    hy (Q, CAND) and hx (Q, W) for the band's Q = T*Wo output pixels, and per
    channel contracts tmp = hy @ win_c on the MXU, then reduces
    out_c[q] = sum_px hx[q,px] * tmp[q,px] on the VPU.
  * zeros mode: hats vanish outside the frame (window rows/cols not in the
    frame carry zero hat weight or zero-padded pixels), so out-of-frame taps
    contribute exactly 0. border mode: grid_sample's border padding equals
    CLAMPING the sample coordinates into the frame before the bilinear taps,
    so the kernel clamps sx/sy — no padded image needed.
  * coverage is DECIDABLE per draw: `forward_plan` flags bands whose clipped
    input-row span exceeds CAND or whose corners straddle the projective
    horizon; callers lax.cond to the XLA gather forward on those draws
    (ops/augment.warp_projective), so the composite is always exact-math.

Numerics: hats and pixels are f32 and the contraction runs through
warp_adjoint._mxu_dot (bf16x3 split-operand decomposition by default; DEFAULT
TPU dots truncate f32 operands to bf16 — measured 5e-2 error on the adjoint
before that fix). Output matches the XLA gather forward to ~1e-5 absolute
(rounding order differs; the math is identical).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from feed_forward_vqgan_clip_tpu.ops.pallas.warp_adjoint import (
    _bf16_split,
    _mxu_dot_split,
    _proj,
)


def forward_plan(m, in_h, out_hw, tile, cand, border, align=8):
    """Input-row window origins + coverage verdict for `warp_forward`.

    m: (B, 3, 3) output->input. Returns (origins (B*NTY,) int32 input-row
    starts IN UNITS OF `align` ROWS (8 for f32 windows, 16 for bf16 — the
    DMA row offset must be divisible by the dtype's sublane tiling),
    uncovered_any: scalar bool)."""
    ho, wo = out_hw
    t = tile
    nty = ho // t
    b = m.shape[0]
    if cand >= in_h:
        # The row window [0, cand) holds the ENTIRE input: every in-frame tap
        # is inside it no matter what the map does (horizon crossings included
        # — out-of-frame samples just get zero hat weight in-kernel), so
        # coverage is unconditional. This is always the case for projective
        # draws (pick_fwd_cand returns full height) — they never fall back.
        # Python False: callers skip the lax.cond at trace time (no XLA
        # fallback branch in the compiled program).
        return jnp.zeros((b * nty,), jnp.int32), False
    mf = m.astype(jnp.float32)

    ys = jnp.arange(nty, dtype=jnp.float32) * t
    cx = jnp.broadcast_to(jnp.asarray([0.0, wo - 1.0, 0.0, wo - 1.0]), (b, nty, 4))
    cy = jnp.broadcast_to(
        jnp.stack([ys, ys, ys + t - 1.0, ys + t - 1.0], -1)[None], (b, nty, 4)
    )
    _, sy, den = _proj(mf[:, None, None], cx, cy)

    mixed = (jnp.min(den, -1) < 0) & (jnp.max(den, -1) > 0)
    if border:
        sy = jnp.clip(sy, 0.0, in_h - 1.0)
    sy_lo = jnp.clip(jnp.floor(jnp.min(sy, -1)) - 1, 0, in_h)
    sy_hi = jnp.clip(jnp.ceil(jnp.max(sy, -1)) + 1, 0, in_h - 1)
    oya = jnp.clip(
        sy_lo.astype(jnp.int32) // align, 0, max(in_h - cand, 0) // align
    )
    too_tall = (sy_hi.astype(jnp.int32) - oya * align) > (cand - 1)
    uncovered_any = jnp.any(too_tall | mixed)
    return oya.reshape(-1), uncovered_any


def _kernel(origins_ref, mats_ref, img_ref, out_ref, win_ref, sem, *,
            tile, cand, c, h, w, wo, border, align, bf16):
    b = pl.program_id(0)
    ty = pl.program_id(1)
    nty = pl.num_programs(1)
    oy = origins_ref[b * nty + ty] * align  # provably tiling-aligned offset

    dma = pltpu.make_async_copy(img_ref.at[b, :, pl.ds(oy, cand), :], win_ref, sem)
    dma.start()

    m00, m01, m02 = mats_ref[b, 0], mats_ref[b, 1], mats_ref[b, 2]
    m10, m11, m12 = mats_ref[b, 3], mats_ref[b, 4], mats_ref[b, 5]
    m20, m21, m22 = mats_ref[b, 6], mats_ref[b, 7], mats_ref[b, 8]

    t = tile
    w_pad = win_ref.shape[-1]
    qyf = jax.lax.broadcasted_iota(jnp.int32, (t, wo), 0).astype(jnp.float32) + (
        ty * t
    ).astype(jnp.float32)
    qxf = jax.lax.broadcasted_iota(jnp.int32, (t, wo), 1).astype(jnp.float32)
    den = m20 * qxf + m21 * qyf + m22
    den = jnp.where(jnp.abs(den) < 1e-8, jnp.where(den < 0, -1e-8, 1e-8), den)
    sx = jnp.clip((m00 * qxf + m01 * qyf + m02) / den, -1e6, 1e6)
    sy = jnp.clip((m10 * qxf + m11 * qyf + m12) / den, -1e6, 1e6)
    if border:
        # grid_sample border padding == clamp coords, then plain bilinear taps
        sx = jnp.clip(sx, 0.0, w - 1.0)
        sy = jnp.clip(sy, 0.0, h - 1.0)

    # hats in native layouts (3-D build, free leading-dim collapse)
    ry = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cand), 2).astype(
        jnp.float32
    ) + oy.astype(jnp.float32)
    px = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w_pad), 2).astype(jnp.float32)
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(sy[:, :, None] - ry))  # (T, Wo, CAND)
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[:, :, None] - px))  # (T, Wo, Wp)
    if not border:
        # zeros mode: column taps outside the frame contribute nothing (the
        # zero-padded window columns already handle px >= w; px < 0 taps never
        # index the window at all, so kill their weight explicitly)
        hx = jnp.where(px >= w, 0.0, hx)

    q = t * wo
    hyq = hy.reshape(q, cand)
    hxq = hx.reshape(q, w_pad)

    dma.wait()
    dims = (((1,), (0,)), ((), ()))
    if bf16:
        # native single-pass bf16 dot (f32 accumulation) — the pixels are
        # already bf16-precise, so the 3-pass split gains nothing
        hyqb = hyq.astype(jnp.bfloat16)
        for cc in range(c):
            tmp = jax.lax.dot_general(
                hyqb, win_ref[cc], dims, preferred_element_type=jnp.float32
            )  # (Q, Wp)
            out_ref[0, cc] = (
                jnp.sum(hxq * tmp, axis=1).reshape(t, wo).astype(out_ref.dtype)
            )
        return
    # hyq is channel-independent: bf16x3-split once, reuse for all channels
    hyq3 = _bf16_split(hyq)
    for cc in range(c):
        tmp = _mxu_dot_split(
            hyq3,
            _bf16_split(win_ref[cc].astype(jnp.float32)),
            dims,
        )  # (Q, Wp)
        out_ref[0, cc] = jnp.sum(hxq * tmp, axis=1).reshape(t, wo)


def _kernel_pipe(origins_ref, mats_ref, img_ref, out_ref, win_scr, hy_scr,
                 hx_scr, sems, *, tile, cand, c, h, w, wo, border, align,
                 nty, nsteps):
    """Skewed _kernel (bf16 mode): step j contracts band j-1's dots from the
    2-slot hat/window scratch while BUILDING band j's hats — the hy/hx build
    is the one un-overlapped VPU prologue of the unskewed kernel (round-4
    ROADMAP item; the in-band 2-half split died on VMEM pressure, this
    cross-band skew adds only the second scratch slot). Per-band math and
    rounding are identical to _kernel's bf16 mode (hy stored bf16 exactly as
    the unskewed cast, hx stored f32), so outputs are bit-identical.

    Boundary steps (grid = nsteps = b*nty + 1): step 0 builds band 0 and
    writes garbage dots into out block 0, overwritten at step 1 (same block
    index, the mixer-pipe trick); step nsteps-1 re-builds the last band into
    an unread slot."""
    j = pl.program_id(0)
    t = tile
    q = t * wo
    w_pad = win_scr.shape[-1]

    @pl.when(j == 0)
    def _init():  # step 0's dots chew zeros (NaN-free garbage into block 0)
        hy_scr[1] = jnp.zeros_like(hy_scr[1])
        hx_scr[1] = jnp.zeros_like(hx_scr[1])
        win_scr[1] = jnp.zeros_like(win_scr[1])

    # ---- prep: band jb = min(j, n-1) — start its window DMA first so it
    # flies under this step's compute
    jb = jnp.minimum(j, nsteps - 2)
    bb = jb // nty
    ty = jb % nty
    oy = origins_ref[jb] * align

    def _win_dma(slot, b_idx, oy_idx):
        return pltpu.make_async_copy(
            img_ref.at[b_idx, :, pl.ds(oy_idx, cand), :],
            win_scr.at[slot],
            sems.at[slot],
        )

    @pl.when(j < nsteps - 1)
    def _start():
        _win_dma(j % 2, bb, oy).start()

    # band jb's sample coordinates (small VPU work, needed by both builds)
    m00, m01, m02 = mats_ref[bb, 0], mats_ref[bb, 1], mats_ref[bb, 2]
    m10, m11, m12 = mats_ref[bb, 3], mats_ref[bb, 4], mats_ref[bb, 5]
    m20, m21, m22 = mats_ref[bb, 6], mats_ref[bb, 7], mats_ref[bb, 8]
    qyf = jax.lax.broadcasted_iota(jnp.int32, (t, wo), 0).astype(jnp.float32) + (
        ty * t
    ).astype(jnp.float32)
    qxf = jax.lax.broadcasted_iota(jnp.int32, (t, wo), 1).astype(jnp.float32)
    den = m20 * qxf + m21 * qyf + m22
    den = jnp.where(jnp.abs(den) < 1e-8, jnp.where(den < 0, -1e-8, 1e-8), den)
    sx = jnp.clip((m00 * qxf + m01 * qyf + m02) / den, -1e6, 1e6)
    sy = jnp.clip((m10 * qxf + m11 * qyf + m12) / den, -1e6, 1e6)
    if border:
        sx = jnp.clip(sx, 0.0, w - 1.0)
        sy = jnp.clip(sy, 0.0, h - 1.0)
    ry = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cand), 2).astype(
        jnp.float32
    ) + oy.astype(jnp.float32)
    px = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w_pad), 2).astype(jnp.float32)

    # ---- compute: band j-1's dots from the previous slot. The slot-(j-1)
    # window DMA was started a full step ago; builds for band jb are emitted
    # BETWEEN the channel dots so their VPU work co-issues under the MXU.
    pv = (j - 1) % 2
    dims = (((1,), (0,)), ((), ()))
    hyp = hy_scr[pv]
    hxp = hx_scr[pv]

    @pl.when(j > 0)
    def _wait():
        # reconstruct the descriptor started last step; only the semaphore
        # matters for wait()
        jpb = jnp.maximum(j - 1, 0)
        _win_dma(pv, jpb // nty, origins_ref[jpb] * align).wait()

    tmp0 = jax.lax.dot_general(
        hyp, win_scr[pv, 0], dims, preferred_element_type=jnp.float32
    )
    hy_scr[j % 2] = jnp.maximum(
        0.0, 1.0 - jnp.abs(sy[:, :, None] - ry)
    ).reshape(q, cand).astype(hy_scr.dtype)
    out_ref[0, 0] = (
        jnp.sum(hxp * tmp0, axis=1).reshape(t, wo).astype(out_ref.dtype)
    )
    tmp1 = jax.lax.dot_general(
        hyp, win_scr[pv, 1], dims, preferred_element_type=jnp.float32
    )
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[:, :, None] - px))
    if not border:
        hx = jnp.where(px >= w, 0.0, hx)
    hx_scr[j % 2] = hx.reshape(q, w_pad)
    out_ref[0, 1] = (
        jnp.sum(hxp * tmp1, axis=1).reshape(t, wo).astype(out_ref.dtype)
    )
    tmp2 = jax.lax.dot_general(
        hyp, win_scr[pv, 2], dims, preferred_element_type=jnp.float32
    )
    out_ref[0, 2] = (
        jnp.sum(hxp * tmp2, axis=1).reshape(t, wo).astype(out_ref.dtype)
    )


_FWD_PIPE_ENV = os.environ.get("FFVC_WARP_FWD_PIPE", "")


def _fwd_pipe_enabled(bf16, c, nbands):
    if _FWD_PIPE_ENV in ("1", "true"):
        return bf16 and c == 3
    if _FWD_PIPE_ENV in ("0", "false"):
        return False
    return bf16 and c == 3 and nbands >= 2


@functools.partial(
    jax.jit, static_argnames=("out_hw", "tile", "cand", "border", "interpret")
)
def warp_forward(img, m, origins, *, out_hw, tile=32, cand=224, border=False,
                 interpret=False):
    """out (B, Ho, Wo, C) = bilinear projective warp of img (B, H, W, C)
    with output->input map m, given per-band input-row origins from
    `forward_plan`. Only exact when forward_plan said covered.

    Dtype follows img: bf16 pixels run the single-pass bf16 mode (pass
    `forward_plan(..., align=16)` origins); anything else is computed as f32
    with the _DOT_MODE hat contractions."""
    bf16 = img.dtype == jnp.bfloat16
    dt = jnp.bfloat16 if bf16 else jnp.float32
    align = 16 if bf16 else 8
    b, h, w, c = img.shape
    ho, wo = out_hw
    t = tile
    assert ho % t == 0, (out_hw, t)
    assert cand % align == 0 and cand <= h, (cand, h, align)
    nty = ho // t
    mats = m.astype(jnp.float32).reshape(b, 9)
    it = jnp.transpose(img.astype(dt), (0, 3, 1, 2))  # (B, C, H, W)
    # Mosaic DMA lane alignment: zero-pad the image width to 128 multiples
    # (zero pixels contribute exactly nothing in either padding mode — border
    # clamps sx to w-1, whose upper tap weight at column w is exactly 0)
    w_pad = -(-w // 128) * 128
    if w_pad != w:
        it = jnp.pad(it, ((0, 0), (0, 0), (0, 0), (0, w_pad - w)))

    if _fwd_pipe_enabled(bf16, c, b * nty):
        q = t * wo

        def _out_idx(j, o_, m_):
            p = jnp.maximum(j - 1, 0)
            return (p // nty, 0, p % nty, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b * nty + 1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, c, t, wo), _out_idx),
            scratch_shapes=[
                pltpu.VMEM((2, c, cand, w_pad), dt),
                pltpu.VMEM((2, q, cand), dt),
                pltpu.VMEM((2, q, w_pad), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(
            functools.partial(
                _kernel_pipe, tile=t, cand=cand, c=c, h=h, w=w, wo=wo,
                border=border, align=align, nty=nty, nsteps=b * nty + 1,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, c, ho, wo), dt),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(origins.astype(jnp.int32), mats, it)
        return jnp.transpose(out, (0, 2, 3, 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nty),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, c, t, wo), lambda bb, ty, o_, m_: (bb, 0, ty, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((c, cand, w_pad), dt),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, tile=t, cand=cand, c=c, h=h, w=w, wo=wo, border=border,
            align=align, bf16=bf16,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, ho, wo), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(origins.astype(jnp.int32), mats, it)
    return jnp.transpose(out, (0, 2, 3, 1))


def pick_fwd_cand(tile, kind, out_w, in_h):
    """Static input-row window size per warp family (mirrors
    warp_adjoint.pick_cand with the roles of input/output swapped)."""
    full = (in_h // 8) * 8
    if kind == "affine":
        need = (tile + 2) * np.cos(np.radians(15.0)) + (out_w + 2) * np.sin(
            np.radians(15.0)
        ) + 16
        return min(int(np.ceil(need / 32) * 32), full)
    return full
