"""Exact image-gradient (adjoint) of bilinear projective warps, gather-only.

Why: each geometric augmentation in the training hot loop (Af, Pe, Ro —
/root/reference/main.py:178-182) is a bilinear warp whose XLA autodiff backward
is a scatter-add costing ~400 ms/step at train shapes (BENCH_NOTES.md). The
adjoint  grad[p] = sum_q w(s(q), p) * g[q]  is computed here by GATHERS instead:

  * grid over (batch, input tiles). For one TxT input tile, the output pixels q
    that sample into it lie in the preimage of the tile under the projective
    map s(q) = proj(m, q). Projective maps send lines to lines, so that
    preimage is a quad whose bounding box follows from the 4 corner preimages —
    computed in XLA (`adjoint_plan`) and passed as scalar-prefetch window
    origins.
  * the kernel DMAs the (CAND, CAND) candidate window of g, builds the
    separable bilinear hat factors hy (Q, T) and hx⊙g (Q, T*C) in native
    layouts (no relayouts: 3D constructions + free leading-dim collapses), and
    contracts them on the MXU: grad_tile = hy^T @ (hx ⊙ g_rep). Zero hat
    weights make out-of-support candidates contribute exactly 0, so the sum
    equals the true adjoint whenever the window covers the preimage.
  * coverage is DECIDABLE per draw: `adjoint_plan` flags any tile whose
    (frame-clipped) preimage bbox exceeds CAND or whose corners straddle the
    projective horizon (denominator sign change). Callers lax.cond to the XLA
    scatter adjoint on those rare draws, so the composite is exact ALWAYS
    (ops/augment.warp_projective). Measured over 3000 draws of the reference's
    aug distributions (tile 32): affine needs CAND>=44 (provable: rotations
    are isometries), perspective(0.7) hit a max extent of 154 -> CAND=160.

Zeros-padding semantics only: hats vanish outside the frame, matching
grid_sample's zeros mode. Border mode is reduced to zeros mode by the caller
(replicate-pad the *coordinate frame* and fold the pad gradients back — see
ops/augment._adjoint_border).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _proj(m, x, y):
    """Apply projective m (..., 3, 3) to coords -> (sx, sy, den)."""
    den = m[..., 2, 0] * x + m[..., 2, 1] * y + m[..., 2, 2]
    safe = jnp.where(jnp.abs(den) < 1e-8, jnp.where(den < 0, -1e-8, 1e-8), den)
    sx = (m[..., 0, 0] * x + m[..., 0, 1] * y + m[..., 0, 2]) / safe
    sy = (m[..., 1, 0] * x + m[..., 1, 1] * y + m[..., 1, 2]) / safe
    return sx, sy, den


def adjoint_plan(m, in_hw, out_hw, tile, cand):
    """Window origins + coverage verdict for `warp_adjoint`.

    m: (B, 3, 3) output->input. Returns (origins (B*NTY*NTX, 2) int32 [oy, ox],
    uncovered_any: scalar bool — True when ANY tile's preimage cannot fit a
    (cand, cand) window, i.e. the caller must take the scatter fallback)."""
    h, w = in_hw
    ho, wo = out_hw
    t = tile
    nty, ntx = h // t, w // t
    m_inv = jnp.linalg.inv(m.astype(jnp.float32))  # input->output

    # tile hat-support corners: s in (x0-1, x0+t) x (y0-1, y0+t)
    xs = jnp.arange(ntx, dtype=jnp.float32) * t
    ys = jnp.arange(nty, dtype=jnp.float32) * t
    cx = jnp.stack([xs - 1.0, xs + t, xs - 1.0, xs + t], -1)  # (NTX, 4)
    cy = jnp.stack([ys - 1.0, ys - 1.0, ys + t, ys + t], -1)  # (NTY, 4)
    # (B, NTY, NTX, 4)
    cxb = jnp.broadcast_to(cx[None, None], (m.shape[0], nty, ntx, 4))
    cyb = jnp.broadcast_to(cy[:, None].reshape(1, nty, 1, 4), (m.shape[0], nty, ntx, 4))
    # coefficients must broadcast as (B, 1, 1, 1) against (B, NTY, NTX, 4)
    qx, qy, den = _proj(m_inv[:, None, None, None], cxb, cyb)

    mixed = (jnp.min(den, -1) < 0) & (jnp.max(den, -1) > 0)  # horizon in tile
    qx_lo = jnp.clip(jnp.floor(jnp.min(qx, -1)) - 1, -1, wo)
    qx_hi = jnp.clip(jnp.ceil(jnp.max(qx, -1)) + 1, -1, wo)
    qy_lo = jnp.clip(jnp.floor(jnp.min(qy, -1)) - 1, -1, ho)
    qy_hi = jnp.clip(jnp.ceil(jnp.max(qy, -1)) + 1, -1, ho)
    too_wide = ((qx_hi - qx_lo) >= cand) | ((qy_hi - qy_lo) >= cand)
    uncovered_any = jnp.any(too_wide | mixed)

    oy = jnp.clip(qy_lo.astype(jnp.int32), 0, ho - cand)
    ox = jnp.clip(qx_lo.astype(jnp.int32), 0, wo - cand)
    origins = jnp.stack([oy, ox], -1).reshape(-1, 2)
    return origins, uncovered_any


def _kernel(origins_ref, mats_ref, g_ref, out_ref, win_ref, sem, *, tile, cand, c):
    b = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    nty = pl.num_programs(1)
    ntx = pl.num_programs(2)
    idx = (b * nty + ty) * ntx + tx
    oy = origins_ref[idx, 0]
    ox = origins_ref[idx, 1]

    dma = pltpu.make_async_copy(
        g_ref.at[b, pl.ds(oy, cand), pl.ds(ox, cand), :], win_ref, sem
    )
    dma.start()

    # window coords + projective map, all in native (CAND, CAND) layout
    qyf = (
        jax.lax.broadcasted_iota(jnp.float32, (cand, cand), 0) + oy.astype(jnp.float32)
    )
    qxf = (
        jax.lax.broadcasted_iota(jnp.float32, (cand, cand), 1) + ox.astype(jnp.float32)
    )
    m00, m01, m02 = mats_ref[b, 0], mats_ref[b, 1], mats_ref[b, 2]
    m10, m11, m12 = mats_ref[b, 3], mats_ref[b, 4], mats_ref[b, 5]
    m20, m21, m22 = mats_ref[b, 6], mats_ref[b, 7], mats_ref[b, 8]
    den = m20 * qxf + m21 * qyf + m22
    den = jnp.where(jnp.abs(den) < 1e-8, jnp.where(den < 0, -1e-8, 1e-8), den)
    sx = jnp.clip((m00 * qxf + m01 * qyf + m02) / den, -1e6, 1e6)
    sy = jnp.clip((m10 * qxf + m11 * qyf + m12) / den, -1e6, 1e6)

    t = tile
    # hy[qy, qx, j] = hat(sy - (ty*t + j)), lanes j in [0, t)
    py = jax.lax.broadcasted_iota(jnp.float32, (1, 1, t), 2) + (ty * t).astype(
        jnp.float32
    )
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(sy[:, :, None] - py))  # (CAND, CAND, T)
    # hx3[qy, qx, j] = hat(sx - (tx*t + j//C)), lanes j in [0, t*C)
    pxc = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t * c), 2) // c
    px = pxc.astype(jnp.float32) + (tx * t).astype(jnp.float32)
    hx3 = jnp.maximum(0.0, 1.0 - jnp.abs(sx[:, :, None] - px))  # (CAND, CAND, T*C)

    dma.wait()
    gwin = win_ref[:].astype(jnp.float32)  # (CAND, CAND, C)
    grep = jnp.concatenate([gwin] * t, axis=-1)  # (CAND, CAND, T*C), col j -> c=j%C
    hxg = hx3 * grep

    q = cand * cand
    acc = jax.lax.dot_general(
        hy.reshape(q, t),
        hxg.reshape(q, t * c),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, T*C)
    out_ref[0] = acc


@functools.partial(
    jax.jit, static_argnames=("in_hw", "tile", "cand", "interpret")
)
def warp_adjoint(g, m, origins, *, in_hw, tile=32, cand=160, interpret=False):
    """grad_img (B, H, W, C) f32 = adjoint of zeros-mode bilinear projective
    sampling, given output-grads g (B, Ho, Wo, C) and per-tile window `origins`
    from `adjoint_plan`. Only exact when adjoint_plan said covered — callers
    cond to the XLA transpose otherwise."""
    b, ho, wo, c = g.shape
    h, w = in_hw
    t = tile
    assert h % t == 0 and w % t == 0, (in_hw, t)
    assert cand % 8 == 0 and cand <= ho and cand <= wo, (cand, ho, wo)
    nty, ntx = h // t, w // t
    mats = m.astype(jnp.float32).reshape(b, 9)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nty, ntx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            # with scalar prefetch the index map receives (*grid_ids, *scalar_refs)
            (1, t, t * c), lambda bb, ty, tx, o_, m_: (bb, ty, tx)
        ),
        scratch_shapes=[
            pltpu.VMEM((cand, cand, c), g.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, tile=t, cand=cand, c=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w * c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(origins.astype(jnp.int32), mats, g)
    return out.reshape(b, h, w, c)


def pick_cand(tile, kind):
    """Static candidate-window sizes per warp family (see module docstring)."""
    if kind == "affine":
        # isometry: preimage of a (t+2)-box has extent <= (t+2)*sqrt(2) + 2
        return int(np.ceil(((tile + 2) * np.sqrt(2.0) + 4) / 8) * 8)
    return 160  # projective families (measured 154 max @ tile 32, dist 0.7)
