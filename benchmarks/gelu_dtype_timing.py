"""TPU drive: is a bf16 Horner chain faster than f32 on the VPU?

The fused mixer's remaining VPU residue is GELU (~4.8 ms of the B=64 mapper
stage, BENCH_NOTES.md round 4). The polynomial is evaluated in f32 today (the
matmul accumulator stays alive through bias+GELU). If the VPU retires bf16
lanes at 2x f32 rate, evaluating the Horner chain in bf16 (the 11-term fit is
already below bf16 rounding) would halve that residue; if bf16 ops run at f32
rate (upconvert), the cast costs make it a wash. This kernel isolates exactly
that question: same (T, E) tensor, same chain, dtype A/B.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from feed_forward_vqgan_clip_tpu.utils import enable_compilation_cache
from feed_forward_vqgan_clip_tpu.ops.pallas.mixer_block import (
    _ERF_POLY_U,
    _ERF_POLY_U_BF16,
)

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

T, E = 256, 4096
REPS = 64  # polynomial passes per kernel call (amortize launch + DMA)


def _horner_gelu(x, coef, dt):
    xf = x.astype(dt)
    ax = jnp.abs(xf)
    a = jnp.minimum(ax * dt(0.7071067811865476), dt(4.0))
    u = a * a * dt(0.125) - dt(1.0)
    p = dt(coef[-1])
    for c in coef[-2::-1]:
        p = p * u + dt(c)
    return dt(0.5) * (xf + ax * (a * p))


def _kernel(x_ref, o_ref, *, dt, coef):
    acc = x_ref[...]
    for i in range(REPS):
        acc = _horner_gelu(acc * dt(0.999), coef, dt).astype(acc.dtype)
    o_ref[...] = acc


def run(name, dt, coef, in_dt):
    x = jax.random.normal(jax.random.PRNGKey(0), (T, E), in_dt)
    f = pl.pallas_call(
        functools.partial(_kernel, dt=dt, coef=coef),
        out_shape=jax.ShapeDtypeStruct((T, E), in_dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )

    @jax.jit
    def chain(x):
        def body(c, _):
            return f(c), None
        out, _ = jax.lax.scan(body, x, None, length=20)
        return jnp.float32(out.astype(jnp.float32).sum())

    float(chain(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(chain(x)); ts.append(time.perf_counter() - t0)
    per_pass_ns = min(ts) / (20 * REPS) * 1e9
    print(f"{name:34s}: {per_pass_ns:9.0f} ns per (256,4096) GELU pass", flush=True)


run("f32 chain, 15-term poly", jnp.float32, _ERF_POLY_U, jnp.float32)
run("f32 chain, 11-term poly", jnp.float32, _ERF_POLY_U_BF16, jnp.float32)
run("bf16 chain, 11-term poly", jnp.bfloat16, _ERF_POLY_U_BF16, jnp.bfloat16)
run("bf16 data, f32 math, 11-term", jnp.float32, _ERF_POLY_U_BF16, jnp.bfloat16)
print("OK")
