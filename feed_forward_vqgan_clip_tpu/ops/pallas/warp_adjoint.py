"""Exact image-gradient (adjoint) of bilinear projective warps, gather-only.

Why: each geometric augmentation in the training hot loop (Af, Pe, Ro —
/root/reference/main.py:178-182) is a bilinear warp whose XLA autodiff backward
is a scatter-add costing ~400 ms/step at train shapes (BENCH_NOTES.md). The
adjoint  grad[p] = sum_q w(s(q), p) * g[q]  is computed here by GATHERS +
MXU contractions instead:

  * grid over (batch, input ROW BANDS). For one T-row full-width input band,
    the output pixels q that sample into it lie in the preimage of the band
    under the projective map s(q) = proj(m, q): a strip whose row extent
    follows from the 4 preimage corners of the (full-width x T) box —
    computed in XLA (`adjoint_plan`) and passed as scalar-prefetch row
    origins. Full-width bands keep every DMA slice aligned: channels-leading
    (B, C, Ho, Wo) layout, full lane dim, 8-aligned dynamic rows. (A previous
    (CAND x CAND) windowed design needed lane-dim slicing of a channels-last
    array, which Mosaic rejects / pads 42x.)
  * the kernel DMAs the (C, CAND, Wo) row window of g once per band, then per
    channel builds the separable bilinear hat factors hy (Q, T) (folded with
    g) and hx (Q, W) in native layouts and contracts them on the MXU:
    grad_band_c = (hy o g_c)^T @ hx. Zero hat weights make out-of-support
    pixels contribute exactly 0, so the sum equals the true adjoint whenever
    the row window covers the band's preimage.
  * coverage is DECIDABLE per draw: `adjoint_plan` flags any band whose
    (frame-clipped) preimage rows exceed CAND or whose corners straddle the
    projective horizon (denominator sign change). Callers lax.cond to the XLA
    scatter adjoint on those draws, so the composite is exact ALWAYS
    (ops/augment.warp_projective). With CAND = Ho (the default for projective
    draws) row coverage is total and only the horizon check remains.

Padding modes: zeros-mode hats vanish outside the frame, matching
grid_sample's zeros mode. border mode CLAMPS the sample coordinates into the
frame before building the hats — grid_sample's border padding is exactly
coordinate clamping (out-of-frame samples collapse both bilinear taps onto the
border pixel with weights summing to 1), so the clamped adjoint equals the
true border adjoint with no frame padding and no gradient fold. With
border=True the caller must pass cand covering the full output (clamping
invalidates the corner-based row bound), which pick_cand does.

Band height (tile): the contraction's M dim IS the band height, so tile=32
ran the MXU at 25% row occupancy and rebuilt the (Q, W) hx factor cand/tile
times over. Total contraction FLOPs are tile-invariant; measured at train
shapes (B=64, 224px, cand=224): tile 32 -> 120.7 ms, 56 -> 74.6, 112 -> 55.8,
224 -> 48.2. Callers pick the largest VMEM-feasible divisor (pick_tile).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# TPU dots at DEFAULT precision truncate f32 operands to bf16 (rel err ~4e-3
# — measured 5e-2 absolute grad error vs an f64 oracle at train shapes), so
# the hat contractions need an f32-quality scheme. Modes:
#   bf16x3  — (default) manual 3-pass split-operand decomposition
#             a_hi@b_hi + a_hi@b_lo + a_lo@b_hi at DEFAULT precision: drops
#             only the lo@lo term (~2^-16 rel per product), halving MXU time
#             vs HIGHEST. Measured vs the f64 oracle at train shapes the
#             decomposition is error-NEUTRAL (affine 3.496e-4 vs 3.510e-4 at
#             HIGHEST vs 3.520e-4 for the XLA scatter; projective 2.201e-4 vs
#             2.210e-4 both) — f32 accumulation order dominates — while the
#             per-warp value_and_grad drops 75.5->41.5 ms (Af) / 95.3->55.0 ms
#             (Pe);
#   highest — jax.lax.Precision.HIGHEST, 6 MXU passes (Mosaic rejects HIGH).
_DOT_MODE = os.environ.get("FFVC_WARP_DOT_PRECISION", "bf16x3")
assert _DOT_MODE in ("highest", "bf16x3"), _DOT_MODE


def _bf16_split(a):
    """(hi, lo, original) triple for the bf16x3 decomposition; pre-split once
    when an operand is reused across several _mxu_dot calls (the per-channel
    loops were re-splitting the big shared hat factor 3x — measured VPU
    waste, BENCH_NOTES.md round 3). In `highest` mode the split is skipped
    (the full-precision dot consumes the f32 original)."""
    if _DOT_MODE != "bf16x3":
        return (None, None, a)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    return (ah, al, a)


def _mxu_dot_split(a3, b3, dims):
    """f32-quality dot on pre-split operands from _bf16_split."""
    ah, al, a = a3
    bh, bl, b = b3
    if _DOT_MODE == "bf16x3":
        def d(x, y):
            return jax.lax.dot_general(
                x, y, dims, preferred_element_type=jnp.float32
            )

        return d(ah, bh) + d(ah, bl) + d(al, bh)
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _mxu_dot(a, b, dims):
    """f32-quality dot for the hat contractions (see _DOT_MODE)."""
    return _mxu_dot_split(_bf16_split(a), _bf16_split(b), dims)


# bf16 image mode: when the aug stage runs in the pipeline's bf16 compute dtype
# (train/loop aug_dtype), the pixels/cotangents carry only bf16 precision to
# begin with, so the hat contraction drops the 3-pass split for ONE native
# bf16 x bf16 MXU pass with f32 accumulation — 3x fewer MXU passes and half
# the window DMA/VMEM. Hats are still built in f32 (exact piecewise-linear
# weights from f32 coords) and rounded once to bf16 for the dot.


def _proj(m, x, y):
    """Apply projective m (..., 3, 3) to coords -> (sx, sy, den)."""
    den = m[..., 2, 0] * x + m[..., 2, 1] * y + m[..., 2, 2]
    safe = jnp.where(jnp.abs(den) < 1e-8, jnp.where(den < 0, -1e-8, 1e-8), den)
    sx = (m[..., 0, 0] * x + m[..., 0, 1] * y + m[..., 0, 2]) / safe
    sy = (m[..., 1, 0] * x + m[..., 1, 1] * y + m[..., 1, 2]) / safe
    return sx, sy, den


def adjoint_plan(m, in_hw, out_hw, tile, cand, align=8):
    """Row-window origins + coverage verdict for `warp_adjoint`.

    m: (B, 3, 3) output->input. Returns (origins (B*NTY,) int32 row starts into
    the output grad IN UNITS OF `align` ROWS (the kernel multiplies back —
    Mosaic must statically prove the DMA row offset divisible by the sublane
    tiling: 8 for f32 windows, 16 for bf16),
    uncovered_any: scalar bool — True when ANY band's preimage rows cannot fit
    a `cand`-row window, i.e. the caller must take the scatter fallback)."""
    h, w = in_hw
    ho, wo = out_hw
    t = tile
    nty = h // t
    b = m.shape[0]
    if cand >= ho:
        # the row window holds the ENTIRE output grad: every output pixel's
        # contribution is summed in-kernel whatever the map does (horizon
        # crossings sample far out of frame and get zero hat weight), so
        # coverage is unconditional. Required for border=True (clamping breaks
        # the corner bound below); automatic for projective (pick_cand).
        # Python False (not a traced scalar): callers skip the lax.cond
        # entirely at trace time, keeping the XLA fallback branch out of the
        # compiled program.
        return jnp.zeros((b * nty,), jnp.int32), False
    m_inv = jnp.linalg.inv(m.astype(jnp.float32))  # input->output

    # band hat-support corners: s in (-1, w) x (y0-1, y0+t), full width
    ys = jnp.arange(nty, dtype=jnp.float32) * t
    cx = jnp.broadcast_to(
        jnp.asarray([-1.0, float(w), -1.0, float(w)]), (b, nty, 4)
    )
    cy = jnp.broadcast_to(
        jnp.stack([ys - 1.0, ys - 1.0, ys + t, ys + t], -1)[None], (b, nty, 4)
    )
    qx, qy, den = _proj(m_inv[:, None, None], cx, cy)

    mixed = (jnp.min(den, -1) < 0) & (jnp.max(den, -1) > 0)  # horizon in band
    qy_lo = jnp.clip(jnp.floor(jnp.min(qy, -1)) - 1, 0, ho)
    qy_hi = jnp.clip(jnp.ceil(jnp.max(qy, -1)) + 1, 0, ho)
    oya = jnp.clip(
        qy_lo.astype(jnp.int32) // align, 0, max(ho - cand, 0) // align
    )
    too_tall = (qy_hi.astype(jnp.int32) - oya * align) > cand
    uncovered_any = jnp.any(too_tall | mixed)
    return oya.reshape(-1), uncovered_any


def _kernel(origins_ref, mats_ref, g_ref, out_ref, win_ref, sem, *, tile, cand,
            c, h, w, ck, border, align, bf16, unroll2):
    b = pl.program_id(0)
    ty = pl.program_id(1)
    nty = pl.num_programs(1)
    oy = origins_ref[b * nty + ty] * align  # provably tiling-aligned row offset

    # one row-window DMA per band: channels-leading, full lanes, aligned rows
    dma = pltpu.make_async_copy(
        g_ref.at[b, :, pl.ds(oy, cand), :], win_ref, sem
    )
    dma.start()

    m00, m01, m02 = mats_ref[b, 0], mats_ref[b, 1], mats_ref[b, 2]
    m10, m11, m12 = mats_ref[b, 3], mats_ref[b, 4], mats_ref[b, 5]
    m20, m21, m22 = mats_ref[b, 6], mats_ref[b, 7], mats_ref[b, 8]

    t = tile
    wo = win_ref.shape[-1]
    # input positions of this band's rows / of all columns (Mosaic iota is
    # integer-only — build int32 and cast)
    py = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2).astype(jnp.float32) + (
        ty * t
    ).astype(jnp.float32)
    px = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2).astype(jnp.float32)

    dma.wait()

    # The hats hy/hx are channel-independent, so they are built ONCE per chunk
    # and reused by all c channel contractions (hx is the big (CK*Wo, W)
    # factor — building it per channel tripled the VPU cost of the whole
    # kernel).
    def chunk_hats(k):
        row0 = oy + k * ck
        qyf = (
            jax.lax.broadcasted_iota(jnp.int32, (ck, wo), 0).astype(jnp.float32)
            + row0.astype(jnp.float32)
        )
        qxf = jax.lax.broadcasted_iota(jnp.int32, (ck, wo), 1).astype(jnp.float32)
        den = m20 * qxf + m21 * qyf + m22
        den = jnp.where(jnp.abs(den) < 1e-8, jnp.where(den < 0, -1e-8, 1e-8), den)
        sx = jnp.clip((m00 * qxf + m01 * qyf + m02) / den, -1e6, 1e6)
        sy = jnp.clip((m10 * qxf + m11 * qyf + m12) / den, -1e6, 1e6)
        if border:
            # grid_sample border padding == clamp coords, then bilinear taps
            sx = jnp.clip(sx, 0.0, w - 1.0)
            sy = jnp.clip(sy, 0.0, h - 1.0)

        hy = jnp.maximum(0.0, 1.0 - jnp.abs(sy[:, :, None] - py))  # (CK, Wo, T)
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[:, :, None] - px))  # (CK, Wo, W)
        return hy, hx

    q = ck * wo
    dims = (((0,), (0,)), ((), ()))

    def chunk_updates(k, hy, hx):
        """Per-channel (t, w) contraction contributions of one chunk."""
        out = []
        if bf16:
            # native single-pass bf16 dot (f32 accumulation) — the window is
            # already bf16-precise, so the split gains nothing
            hxb = hx.reshape(q, w).astype(jnp.bfloat16)
            for cc in range(c):
                gc = win_ref[cc, pl.ds(k * ck, ck), :].astype(jnp.float32)
                hyg = (hy * gc.reshape(ck, wo, 1)).reshape(q, t)
                out.append(jax.lax.dot_general(
                    hyg.astype(jnp.bfloat16), hxb, dims,
                    preferred_element_type=jnp.float32,
                ))
            return out
        # the hx factor is channel-independent: bf16x3-split it ONCE per chunk
        # (the per-channel _mxu_dot used to re-split it 3x)
        hx3 = _bf16_split(hx.reshape(q, w))
        for cc in range(c):
            gc = win_ref[cc, pl.ds(k * ck, ck), :].astype(jnp.float32)
            hyg = hy * gc.reshape(ck, wo, 1)
            out.append(_mxu_dot_split(_bf16_split(hyg.reshape(q, t)), hx3, dims))
        return out

    # Chunk loop. fori_loop, NOT a full Python unroll: Mosaic stack-allocates
    # every unrolled iteration's intermediates simultaneously (measured 122 MB
    # at train shapes). unroll2 processes TWO chunks per iteration with chunk
    # B's hat build placed in program order between chunk A's dots and chunk
    # B's dots — the VPU hat work then co-issues under the MXU contractions
    # (same scheduling move as the skewed mixer kernel; the single-chunk body
    # serialized hats -> dots -> hats at ~41% MXU util). Two chunks' hats live
    # at once; callers pick ck so the doubled footprint stays in budget.
    if unroll2:
        def body2(i, accs):
            ka = 2 * i
            hy_a, hx_a = chunk_hats(ka)                    # VPU
            upd_a = chunk_updates(ka, hy_a, hx_a)          # MXU (+ fold VPU)
            hy_b, hx_b = chunk_hats(ka + 1)                # VPU — under A dots
            upd_b = chunk_updates(ka + 1, hy_b, hx_b)      # MXU
            return tuple(
                acc + ua + ub for acc, ua, ub in zip(accs, upd_a, upd_b)
            )

        accs = jax.lax.fori_loop(
            0, cand // (2 * ck), body2,
            tuple(jnp.zeros((t, w), jnp.float32) for _ in range(c)),
        )
    else:
        def body(k, accs):
            hy, hx = chunk_hats(k)
            return tuple(a + u for a, u in zip(accs, chunk_updates(k, hy, hx)))

        accs = jax.lax.fori_loop(
            0, cand // ck, body,
            tuple(jnp.zeros((t, w), jnp.float32) for _ in range(c)),
        )
    for cc in range(c):
        out_ref[0, cc] = accs[cc].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("in_hw", "tile", "cand", "border", "ck", "interpret"),
)
def warp_adjoint(g, m, origins, *, in_hw, tile=32, cand=224, border=False,
                 ck=None, interpret=False):
    """grad_img (B, H, W, C) = adjoint of bilinear projective sampling
    (zeros mode, or border mode via in-kernel coordinate clamping), given
    output-grads g (B, Ho, Wo, C) and per-band row origins from
    `adjoint_plan`. Only exact when adjoint_plan said covered — callers cond
    to the XLA transpose otherwise. border=True requires cand >= Ho.

    Dtype follows g: bf16 cotangents run the single-pass bf16 mode (pass
    `adjoint_plan(..., align=16)` origins — bf16 sublane tiling is (16, 128));
    anything else is computed as f32 with the _DOT_MODE hat contractions."""
    bf16 = g.dtype == jnp.bfloat16
    dt = jnp.bfloat16 if bf16 else jnp.float32
    align = 16 if bf16 else 8
    b, ho, wo, c = g.shape
    h, w = in_hw
    t = tile
    assert h % t == 0, (in_hw, t)
    assert cand % align == 0 and cand <= ho and ho % 8 == 0, (cand, ho, align)
    assert not border or cand >= ho, (border, cand, ho)
    nty = h // t
    if ck is None:
        # prefer a ck with an EVEN chunk count so the 2-unrolled loop applies
        # (chunk B's hats co-issue under chunk A's dots); two half-size chunks
        # hold the same hat VMEM as one full-size one
        for cand_ck in (32, 16, 8):
            if cand % (2 * cand_ck) == 0:
                ck = cand_ck
                break
        else:
            ck = 32 if cand % 32 == 0 else (16 if cand % 16 == 0 else 8)
    assert cand % ck == 0, (cand, ck)
    # FFVC_ADJ_UNROLL=0 disables the 2-chunk unroll (diagnostic A/B)
    unroll2 = cand % (2 * ck) == 0 and os.environ.get(
        "FFVC_ADJ_UNROLL", "1"
    ) not in ("0", "false")
    mats = m.astype(jnp.float32).reshape(b, 9)
    gt = jnp.transpose(g.astype(dt), (0, 3, 1, 2))  # (B, C, Ho, Wo)
    # Mosaic DMA slices must be 128-aligned on the lane dim even when taking
    # the whole (padded) extent — zero-pad the grad width; zero cotangents
    # contribute exactly nothing, so the adjoint is unchanged.
    wo_pad = -(-wo // 128) * 128
    if wo_pad != wo:
        gt = jnp.pad(gt, ((0, 0), (0, 0), (0, 0), (0, wo_pad - wo)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nty),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            # with scalar prefetch the index map receives (*grid_ids, *scalar_refs)
            (1, c, t, w), lambda bb, ty, o_, m_: (bb, 0, ty, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((c, cand, wo_pad), dt),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, tile=t, cand=cand, c=c, h=h, w=w, ck=ck,
                          border=border, align=align, bf16=bf16,
                          unroll2=unroll2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(origins.astype(jnp.int32), mats, gt)
    return jnp.transpose(out, (0, 2, 3, 1))


def pick_cand(tile, kind, in_w, out_h, border=False):
    """Static row-window size per warp family (see module docstring).
    border mode always takes the full window (coordinate clamping voids the
    corner-based row bound, and full windows make coverage unconditional)."""
    full = (out_h // 8) * 8
    if kind == "affine" and not border:
        # rotation <= 15 deg + translate: preimage rows of a full-width band
        # extend <= (t+2)cos(15) + (w+2)sin(15); +8 alignment +8 safety
        need = (tile + 2) * np.cos(np.radians(15.0)) + (in_w + 2) * np.sin(
            np.radians(15.0)
        ) + 16
        return min(int(np.ceil(need / 32) * 32), full)  # 32-mult -> bigger CK
    return full  # projective/border: total row coverage, no fallback


def _rnd128(n):
    return -(-n // 128) * 128


def pick_tile(h, w, ow, c, cand, budget_bytes=48 * 1024 * 1024):
    """Largest 8-multiple divisor of the input height whose kernel VMEM
    footprint fits the budget (the contraction's M dim is the band height:
    small bands under-occupy MXU rows and rebuild hx cand/tile times — see
    module docstring). Prefers a ck giving an EVEN chunk count, which enables
    the kernel's 2-unrolled chunk loop (chunk B's hat build co-issues under
    chunk A's dots); both live chunks are counted in the estimate. Returns
    (tile, ck) or (None, None)."""
    if h % 8 != 0:
        return None, None
    for t in range(h, 7, -8):
        if h % t:
            continue
        # even-chunk candidates first (the kernel unrolls 2 chunks/iteration)
        cks = [k for k in (32, 16, 8) if cand % (2 * k) == 0]
        cks += [k for k in (32, 16, 8) if cand % k == 0 and k not in cks]
        for ck in cks:
            live_chunks = 2 if cand % (2 * ck) == 0 else 1
            est = 4 * (
                c * cand * _rnd128(ow)        # g row window (scratch)
                + 2 * c * t * _rnd128(w)      # fori accs + out block
                + live_chunks * (
                    ck * ow * _rnd128(t)      # hy
                    + 2 * ck * ow * _rnd128(w)  # hx + per-channel hyg
                )
            )
            if est <= budget_bytes:
                return t, ck
    return None, None
