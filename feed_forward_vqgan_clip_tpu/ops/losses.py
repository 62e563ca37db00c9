"""Loss stack.

TPU-native equivalents of the reference's loss terms: squared spherical CLIP distance
(/root/reference/main.py:811), total-variation (main.py:423-428), L2 (main.py:758-762)
and the VGG-feature diversity term (main.py:776-791, computed in models/vgg.py's
feature space via `diversity_loss`).
"""

import jax.numpy as jnp


def normalize(x, axis=-1, eps=0.0):
    """F.normalize parity: x / max(||x||, eps) along `axis` (torch uses eps=1e-12)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, jnp.asarray(max(eps, 1e-12), x.dtype))


def spherical_dist(a, b):
    """Per-row squared spherical distance `2*arcsin(||a-b||/2)^2` between unit vectors.

    Matches the reference's `H.sub(embed).norm(-1).div(2).arcsin().pow(2).mul(2)`
    (main.py:811). Inputs must already be L2-normalized.
    """
    d = jnp.linalg.norm(a - b, axis=-1)
    # ||a-b||/2 can exceed 1.0 by float error for antipodal points; clamp for arcsin.
    half = jnp.clip(d / 2.0, 0.0, 1.0)
    return 2.0 * jnp.square(jnp.arcsin(half))


def spherical_dist_loss(a, b):
    """Mean squared spherical distance (the training `dists` term, main.py:811)."""
    return jnp.mean(spherical_dist(a, b))


def tv_loss(x):
    """Total variation: 0.5 * (mean |dH| + mean |dW|) on NHWC images (main.py:423-428)."""
    dh = jnp.abs(x[:, 1:, :, :] - x[:, :-1, :, :]).mean()
    dw = jnp.abs(x[:, :, 1:, :] - x[:, :, :-1, :]).mean()
    return 0.5 * (dh + dw)


def l2_loss(z):
    """Mean squared latent magnitude (main.py:760)."""
    return jnp.mean(jnp.square(z))


def normalize_tensor(feats, eps=1e-10):
    """Channel-wise unit-normalize conv feature maps, NHWC.

    Parity with taming's `normalize_tensor` (used at main.py:780): divide by the
    channel-norm plus eps.
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(feats), axis=-1, keepdims=True))
    return feats / (norm + eps)


def diversity_loss(feature_maps, repeat, bs, mode="between_same_prompts"):
    """Diversity term over a list of NHWC VGG feature maps (main.py:776-791).

    `feature_maps` entries have shape (repeat*bs, H, W, C), laid out repeat-major —
    the same layout the reference's `.repeat(repeat, 1)` produces.

    mode "between_same_prompts": mean over all (repeat_i, repeat_j) pairs of the
    channel-summed squared feature difference for the same prompt.
    mode "all": all (sample_i, sample_j) pairs regardless of prompt.
    """
    div = 0.0
    for feats in feature_maps:
        feats = normalize_tensor(feats)
        n, hh, ww, cc = feats.shape
        if mode == "between_same_prompts":
            f = feats.reshape(repeat, bs, hh, ww, cc)
            diff = f[:, None] - f[None, :]  # (repeat, repeat, bs, H, W, C)
            div = div + jnp.mean(jnp.sum(jnp.square(diff), axis=-1))
        elif mode == "all":
            diff = feats[:, None] - feats[None, :]  # (n, n, H, W, C)
            div = div + jnp.mean(jnp.sum(jnp.square(diff), axis=-1))
        else:
            raise ValueError(
                "diversity_mode should be 'between_same_prompts' or 'all'"
            )
    return div
