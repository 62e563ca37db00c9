"""TrainState: trainable mapper params + Adam + optional EMA + schedule.

Replaces torch Adam + torch_ema (/root/reference/main.py:591-616): one pytree
struct, donated through the jitted step. The reference's EMA-updates-on-rank-0-only
quirk (main.py:843-844) is moot here: params are replicated, so the single EMA
update is bitwise the rank-0 behavior.

EMA decay follows torch_ema's default `use_num_updates=True` warmup ramp
(main.py:520-525 constructs ExponentialMovingAverage without disabling it):
decay_t = min(ema_decay, (1 + n) / (10 + n)) where n counts EMA updates —
the shadow tracks the params closely early on (first update blends ~82% of the
live params) and reaches the configured 0.995 only after ~1790 steps.
`ema_warmup: false` (framework extension) pins the fixed decay instead.
One conscious deviation: the reference resets n to 0 on EVERY resume (it
rebuilds ExponentialMovingAverage fresh, main.py:604-615, so an interrupted
run re-warms its EMA); here n = TrainState.step, which persists across resume —
interrupted and uninterrupted runs see the same decay schedule (PARITY.md).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any  # None when EMA disabled
    step: jnp.ndarray  # scalar int32
    # device-side EMA of the loss (reference's avg_loss, main.py:861) — carried in
    # the state so it updates EVERY step without forcing a host sync
    avg_loss: Any = None
    tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)
    ema_decay: float = struct.field(pytree_node=False, default=0.995)
    ema_warmup: bool = struct.field(pytree_node=False, default=True)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        if self.ema_params is not None:
            d = jnp.float32(self.ema_decay)
            if self.ema_warmup:
                # torch_ema update(): num_updates += 1, then
                # min(decay, (1+n)/(10+n)) — n here is the post-increment count
                n = (self.step + 1).astype(jnp.float32)
                d = jnp.minimum(d, (1.0 + n) / (10.0 + n))
            new_ema = jax.tree.map(
                lambda e, p: (d * e + (1.0 - d) * p).astype(e.dtype),
                self.ema_params, new_params,
            )
        else:
            new_ema = None
        return self.replace(
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
            step=self.step + 1,
        )


def _scale_by_adam_cast_state(
    b1: float, b2: float, eps: float, state_dtype
) -> optax.GradientTransformation:
    """optax.scale_by_adam with BOTH moments STORED in `state_dtype` (bf16) and
    all update math in f32. optax's stock adam only downcasts mu (`mu_dtype`);
    nu — the same size — stays f32 there. Casting both halves the optimizer's
    HBM footprint and per-step read+write traffic (the flagship 290M-param
    mapper carries 2.3 GB of moments, touched twice per step). bf16 keeps f32's
    exponent range, so nu (grad^2) cannot overflow; the cost is ~2^-8 relative
    rounding on the moment ACCUMULATION — the DEFAULT since round 4 (measured
    training-equivalent to f32 moments over 300 same-seed flagship steps,
    benchmarks/aug_dtype_equivalence.py; opt_dtype: float32 restores the
    reference's f32 torch.Adam, main.py:591). Update rule, bias correction,
    and the count increment match optax.scale_by_adam(eps_root=0) exactly."""
    sd = jnp.dtype(state_dtype)

    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=sd)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        f32 = jnp.float32
        mu = jax.tree.map(
            lambda m, g: f32(b1) * m.astype(f32) + f32(1 - b1) * g.astype(f32),
            state.mu, updates,
        )
        nu = jax.tree.map(
            lambda v, g: f32(b2) * v.astype(f32)
            + f32(1 - b2) * jnp.square(g.astype(f32)),
            state.nu, updates,
        )
        count = optax.safe_int32_increment(state.count)
        bc1 = 1.0 - f32(b1) ** count.astype(f32)
        bc2 = 1.0 - f32(b2) ** count.astype(f32)
        upd = jax.tree.map(
            lambda m, v: ((m / bc1) / (jnp.sqrt(v / bc2) + f32(eps))).astype(
                m.dtype
            ),
            mu, nu,
        )
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree.map(lambda m: m.astype(sd), mu),
            nu=jax.tree.map(lambda v: v.astype(sd), nu),
        )
        return upd, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    lr: float,
    *,
    scheduler: Optional[str] = None,
    max_steps: Optional[int] = None,
    clip_grad_norm: Optional[float] = None,
    opt_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """Adam(lr) with optional cosine annealing to 0 over max_steps and global-norm
    clipping (main.py:591, 702-709, 833-834). Only 'cosine' is supported, like the
    reference. opt_dtype ('bfloat16') stores the Adam moments in that dtype —
    a framework extension, see _scale_by_adam_cast_state."""
    if scheduler is None:
        sched = lr
    elif scheduler == "cosine":
        if not max_steps:
            raise ValueError("scheduler='cosine' requires max_steps (main.py:704)")
        sched = optax.cosine_decay_schedule(lr, decay_steps=max_steps, alpha=0.0)
    else:
        raise ValueError(f"unknown scheduler {scheduler!r} (reference supports 'cosine')")
    chain = []
    if clip_grad_norm:
        chain.append(optax.clip_by_global_norm(float(clip_grad_norm)))
    if opt_dtype and jnp.dtype(opt_dtype) != jnp.float32:
        chain.append(_scale_by_adam_cast_state(0.9, 0.999, 1e-8, opt_dtype))
        chain.append(optax.scale_by_learning_rate(sched))
    else:
        chain.append(optax.adam(sched))
    return optax.chain(*chain)


def make_train_state(
    params,
    tx: optax.GradientTransformation,
    *,
    use_ema: bool = False,
    ema_decay: float = 0.995,
    ema_warmup: bool = True,
    step: int = 0,
    ema_params=None,
) -> TrainState:
    if use_ema and ema_params is None:
        # materialize a distinct copy that PRESERVES each leaf's sharding
        # (aliased buffers break step donation; jnp.array would reset placement)
        ema_params = jax.tree.map(lambda p: p + jnp.zeros((), p.dtype), params)
    return TrainState(
        params=params,
        # optax zeros_like follows each param's sharding, so initializing AFTER
        # placement gives the optimizer state matching TP/replicated layouts
        opt_state=tx.init(params),
        ema_params=ema_params if use_ema else None,
        step=jnp.asarray(step, jnp.int32),
        avg_loss=jnp.float32(1.0),
        tx=tx,
        ema_decay=float(ema_decay),
        ema_warmup=bool(ema_warmup),
    )
