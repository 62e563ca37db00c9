"""Straight-through gradient ops.

TPU-native equivalents of the reference's autograd.Function pair
(`ReplaceGrad` /root/reference/main.py:105-116, `ClampWithGrad` main.py:118-132),
expressed as `jax.custom_vjp` rules so they inline into XLA's fused backward graph.
"""

import jax
import jax.numpy as jnp


def replace_grad(x_forward, x_backward):
    """Forward `x_forward`; route the cotangent entirely to `x_backward`.

    The reference's `sum_to_size` broadcast-reduction falls out of standard JAX
    broadcasting transposition because we express the op as arithmetic:
    forward value is `x_backward + stop_grad(x_forward - x_backward)`.
    """
    return x_backward + jax.lax.stop_gradient(x_forward - x_backward)


@jax.custom_vjp
def clamp_with_grad(x, lo, hi):
    """Clamp with a gradient that is masked only where it pushes further out of range.

    Backward rule (reference main.py:127-129): pass the cotangent where
    ``g * (x - clamp(x)) >= 0`` — i.e. zero the gradient only when it would move an
    out-of-range input even further out of range.
    """
    return jnp.clip(x, lo, hi)


def _clamp_fwd(x, lo, hi):
    y = jnp.clip(x, lo, hi)
    return y, (x, y, lo, hi)


def _clamp_bwd(res, g):
    x, y, lo, hi = res
    keep = (g * (x - y) >= 0).astype(g.dtype)
    zero = lambda v: jnp.zeros(jnp.shape(v), dtype=jnp.result_type(v))
    return (g * keep, zero(lo), zero(hi))


clamp_with_grad.defvjp(_clamp_fwd, _clamp_bwd)
