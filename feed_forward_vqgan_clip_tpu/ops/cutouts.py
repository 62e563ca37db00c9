"""MakeCutouts: pooled views + augmentations feeding the CLIP image encoder.

Parity with the reference's MakeCutouts (/root/reference/main.py:154-229):
  * pool=True: (adaptive_avg_pool + adaptive_max_pool)/2 to pool_size;
  * the pooled batch is tiled `cutn` times, cutn-major (torch .repeat(cutn,1,1,1)) —
    the loss tiles targets the same way (main.py:801);
  * augmentation pipeline selected by 2-char codes, default ('Af','Pe','Ji','Er');
  * additive noise: per-sample factor ~ U(0, noise_fac=0.1) times N(0,1) noise;
  * optional adaptive-avg-pool to interp_size (main.py:226-228).

Stateless and jittable: call with an explicit PRNG key.
"""

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.ops.augment import build_augment_pipeline
from feed_forward_vqgan_clip_tpu.ops.pooling import adaptive_avg_pool, adaptive_max_pool

# Pointwise (non-resampling) augs: their backwards are elementwise chains whose
# XLA autodiff saves several full-size intermediates (the HSV round trip alone
# keeps ~6). FFVC_REMAT_COLOR=1 wraps them in jax.checkpoint so the backward
# recomputes the cheap VPU chain instead of round-tripping activations through
# HBM — a perf experiment knob (identical math; grads equal to rounding).
_POINTWISE_CODES = {"Ji", "Ji2", "Er", "Er2", "Sh", "Gn"}
_REMAT_COLOR = os.environ.get("FFVC_REMAT_COLOR", "0") not in ("", "0", "false")


class MakeCutouts:
    def __init__(
        self,
        cut_size: int,
        cutn: int,
        augs: Optional[Sequence[str]] = None,
        pool: bool = True,
        pool_size: Optional[int] = None,
        interpolate: bool = False,
        interp_size: Optional[int] = None,
        noise_fac: float = 0.1,
        fuse_geometric: bool = False,
    ):
        self.cut_size = cut_size
        self.cutn = cutn
        self.pool = pool
        self.pool_size = pool_size if pool_size is not None else cut_size
        self.interpolate = interpolate
        self.interp_size = interp_size if interp_size is not None else self.pool_size
        self.noise_fac = noise_fac
        # NOTE: an empty/None augs list means the DEFAULT set, like the reference
        # (main.py:164-165) — pass e.g. ["Cc"] to effectively disable augs.
        codes = list(augs) if augs else ["Af", "Pe", "Ji", "Er"]
        if fuse_geometric:
            # compose consecutive Af,Pe pairs into one projective resample
            # (ops/augment.fused_affine_perspective): ~2x on the aug-dominated
            # training step, opt-in because interpolation/padding differ slightly
            from feed_forward_vqgan_clip_tpu.ops.augment import (
                fused_affine_perspective,
            )

            fused_codes = []
            i = 0
            while i < len(codes):
                if i + 1 < len(codes) and codes[i] == "Af" and codes[i + 1] == "Pe":
                    fused_codes.append(fused_affine_perspective)
                    i += 2
                else:
                    fused_codes.append(codes[i])
                    i += 1
            codes = fused_codes
        str_codes = [c for c in codes if not callable(c)]
        built = iter(build_augment_pipeline(str_codes, cut_size))
        self.augs = []
        for c in codes:
            fn = c if callable(c) else next(built)
            if _REMAT_COLOR and not callable(c) and c in _POINTWISE_CODES:
                fn = jax.checkpoint(fn)
            self.augs.append(fn)

    def __call__(self, key, x):
        """x: (B, H, W, 3) in [0,1] -> (cutn*B, h', w', 3)."""
        if self.pool:
            pooled = (
                adaptive_avg_pool(x, self.pool_size)
                + adaptive_max_pool(x, self.pool_size)
            ) / 2.0
            batch = jnp.tile(pooled, (self.cutn, 1, 1, 1))
        else:
            batch = jnp.tile(x, (self.cutn, 1, 1, 1))

        keys = jax.random.split(key, len(self.augs) + 2)
        for aug, k in zip(self.augs, keys[: len(self.augs)]):
            batch = aug(k, batch)

        if self.noise_fac:
            k_fac, k_noise = keys[-2], keys[-1]
            facs = jax.random.uniform(
                k_fac, (batch.shape[0], 1, 1, 1), maxval=self.noise_fac
            ).astype(batch.dtype)  # keep bf16 batches bf16 (no f32 promotion)
            batch = batch + facs * jax.random.normal(k_noise, batch.shape, batch.dtype)

        if self.interpolate:
            batch = adaptive_avg_pool(batch, self.interp_size)
        return batch
