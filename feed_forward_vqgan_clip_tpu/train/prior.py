"""Flow-prior trainer: p(image_embedding | text_embedding).

Parity with the reference's `train_prior` (/root/reference/main.py:1335-1445):
data is a (text_feats, image_feats) pair file or a directory of shards (sharded
across processes, main.py:1346-1362), loss is the flow NLL, Adam with optional
grad clipping, TB scalars every 100 steps, checkpoint + opt state every
log_interval. Config schema: {data: {path, batch_size}, model: {embedding_dim,
hidden_dim, hidden_depth, n_flows}, optim: {lr, epochs, clip_grad_norm},
logging: {log_interval}} — same yaml shape the reference consumes.
"""

import functools
import json
import logging
import os
import random
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np

from feed_forward_vqgan_clip_tpu.data.datasets import epoch_shard_batches
from feed_forward_vqgan_clip_tpu.io import checkpoint as ckpt_io
from feed_forward_vqgan_clip_tpu.models.flow import build_prior_model, nll_loss
from feed_forward_vqgan_clip_tpu.parallel import mesh as meshlib
from feed_forward_vqgan_clip_tpu.train.state import make_optimizer, make_train_state

log = logging.getLogger(__name__)


def _load_pairs(path: str, seed: int = 0):
    def load_one(p):
        if p.endswith(".npz"):
            z = np.load(p)
            return np.asarray(z["x"]), np.asarray(z["y"])
        import torch

        x, y = torch.load(p, map_location="cpu", weights_only=False)
        return np.asarray(x), np.asarray(y)

    if os.path.isdir(path):
        paths = sorted(glob(os.path.join(path, "*")))
        # SEEDED shuffle before the modulo-rank split. The reference's
        # unseeded random.shuffle (main.py:1348-1351) gives each process a
        # different permutation, so shards overlap/go missing across ranks —
        # a real multi-process data bug; fixed deviation, noted in PARITY.md.
        random.Random(seed).shuffle(paths)
        paths = [
            p for i, p in enumerate(paths)
            if i % jax.process_count() == jax.process_index()
        ]
        xs, ys = zip(*(load_one(p) for p in paths))
        return np.concatenate(xs), np.concatenate(ys)
    return load_one(path)


def train_prior(cfg):
    folder = cfg.get("folder") or "."
    os.makedirs(folder, exist_ok=True)
    data_cfg = cfg.get("data") or {}
    optim_cfg = cfg.get("optim") or {}
    logging_cfg = cfg.get("logging") or {}
    model_cfg = cfg.get("model") or {}

    x, y = _load_pairs(data_cfg["path"], int(cfg.get("seed") or 0))
    input_size, output_size = x.shape[1], y.shape[1]
    bs = int(data_cfg.get("batch_size", 128))
    lr = float(optim_cfg.get("lr", 1e-4))
    epochs = int(optim_cfg.get("epochs", 100))
    clip_grad_norm = optim_cfg.get("clip_grad_norm")
    log_interval = int(logging_cfg.get("log_interval", 1000))
    max_steps = cfg.get("max_steps")
    seed = int(cfg.get("seed") or 0)

    flow = build_prior_model({"model": model_cfg}, input_size, output_size)
    mesh = meshlib.make_mesh(cfg.get("mesh_shape"))
    primary = meshlib.is_primary()

    step, epoch0 = 0, 0
    ckpt_dir = os.path.join(folder, "checkpoint")
    if os.path.exists(os.path.join(ckpt_dir, "meta.json")):
        variables = ckpt_io.load_pytree(os.path.join(ckpt_dir, "params.msgpack"))
        with open(os.path.join(ckpt_dir, "meta.json")) as fd:
            meta = json.load(fd)
        step, epoch0 = int(meta["step"]), int(meta.get("epoch", 0))
        log.info("Resuming prior from step %d (epoch %d)", step, epoch0)
    else:
        variables = jax.jit(flow.init)(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, output_size)), jnp.zeros((1, input_size)),
        )

    tx = make_optimizer(lr, clip_grad_norm=clip_grad_norm)
    state = make_train_state(variables["params"], tx, step=step)
    buffers = variables["buffers"]
    opt_path = os.path.join(folder, "opt", "state.msgpack")
    if os.path.exists(opt_path):
        state = state.replace(opt_state=ckpt_io.load_pytree(opt_path, like=state.opt_state))

    with mesh:
        state = meshlib.replicate(mesh, state)
        buffers = meshlib.replicate(mesh, buffers)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, buffers, xb, yb):
        def loss_fn(params):
            z, logdet = flow.apply({"params": params, "buffers": buffers}, yb, xb)
            return nll_loss(z, logdet)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), dict(aux, loss=loss)

    writer = None
    if primary:
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(folder)
        except Exception:  # pragma: no cover
            pass

    ds = meshlib.data_sharding(mesh)
    n_proc = jax.process_count()
    if bs % mesh.shape["data"] != 0 or bs % n_proc != 0:
        raise ValueError(
            f"batch_size={bs} must be divisible by the data axis "
            f"({mesh.shape['data']}) and the process count ({n_proc})"
        )
    bs_local = bs // n_proc

    def _global(rows):
        if n_proc == 1:
            return jax.device_put(rows, ds)
        return jax.make_array_from_process_local_data(ds, rows)

    def save(step, epoch=0):
        path = os.path.join(folder, "checkpoint")
        os.makedirs(path, exist_ok=True)
        ckpt_io.save_pytree(
            os.path.join(path, "params.msgpack"),
            {"params": state.params, "buffers": buffers},
        )
        with open(os.path.join(path, "meta.json"), "w") as fd:
            json.dump(
                {
                    "config": {"model": dict(model_cfg)},
                    "step": step,
                    "epoch": epoch,
                    "input_size": int(input_size),
                    "output_size": int(output_size),
                },
                fd,
            )
        os.makedirs(os.path.join(folder, "opt"), exist_ok=True)
        ckpt_io.save_pytree(os.path.join(folder, "opt", "state.msgpack"), state.opt_state)

    with mesh:
        for epoch in range(epoch0, epochs):
            # DistributedSampler-parity per-epoch global reshuffle (main.py:1365-1369)
            for ids in epoch_shard_batches(
                len(x), bs_local, seed=seed, epoch=epoch,
                process_index=jax.process_index(), process_count=jax.process_count(),
                drop_last=False,
            ):
                xb = _global(x[ids])
                yb = _global(y[ids])
                state, metrics = train_step(state, buffers, xb, yb)
                if primary and step % 100 == 0 and writer:
                    for k, v in metrics.items():
                        writer.add_scalar(k, float(v), step)
                if primary and step % log_interval == 0:
                    print(epoch, step, float(metrics["loss"]), flush=True)
                    save(step, epoch)
                step += 1
                if max_steps is not None and step >= int(max_steps):
                    if primary:
                        save(step, epoch)
                    return state
    if primary:
        save(step, max(epochs - 1, epoch0))
    return state
