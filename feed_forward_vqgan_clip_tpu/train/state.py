"""TrainState: trainable mapper params + Adam + optional EMA + schedule.

Replaces torch Adam + torch_ema (/root/reference/main.py:591-616): one pytree
struct, donated through the jitted step. The reference's EMA-updates-on-rank-0-only
quirk (main.py:843-844) is moot here: params are replicated, so the single EMA
update is bitwise the rank-0 behavior.
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

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        if self.ema_params is not None:
            d = self.ema_decay
            new_ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p, self.ema_params, new_params
            )
        else:
            new_ema = None
        return self.replace(
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
            step=self.step + 1,
        )


def make_optimizer(
    lr: float,
    *,
    scheduler: Optional[str] = None,
    max_steps: Optional[int] = None,
    clip_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """Adam(lr) with optional cosine annealing to 0 over max_steps and global-norm
    clipping (main.py:591, 702-709, 833-834). Only 'cosine' is supported, like the
    reference."""
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
    chain.append(optax.adam(sched))
    return optax.chain(*chain)


def make_train_state(
    params,
    tx: optax.GradientTransformation,
    *,
    use_ema: bool = False,
    ema_decay: float = 0.995,
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
    )
