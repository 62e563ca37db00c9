"""Checkpoint I/O: config-carrying checkpoints, optimizer state, EMA.

Layout mirrors the reference's contract (/root/reference/main.py:560-616, 903-911):
a run folder holds `checkpoint/` (mapper params + config + step + epoch),
`checkpoint_ema/` and `opt/`. The config travels inside the checkpoint so
test/evaluate/serving need no yaml (main.py:1277-1280). The fixed NOISE bank is
part of the checkpoint payload (the reference stores it as a model attribute,
main.py:687).

Format: flax msgpack for pytrees + a json meta file. `load_model` additionally
accepts the reference's released torch `.th` files (both the current
{state_dict, config, step, epoch} dicts and legacy whole-module pickles,
main.py:1273-1290) and converts them via io/torch_import.
"""

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
from flax import serialization

from feed_forward_vqgan_clip_tpu.config import TrainConfig, make_config


def _to_numpy_tree(tree):
    import jax

    return jax.tree.map(lambda a: np.asarray(a), tree)


def save_pytree(path: str, tree) -> None:
    """Atomic write (tmp + rename): a crash mid-write can never tear an
    existing checkpoint file — the previous complete version survives."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as fd:
        fd.write(serialization.to_bytes(_to_numpy_tree(tree)))
    os.replace(tmp, path)


def load_pytree(path: str, like=None):
    with open(path, "rb") as fd:
        data = fd.read()
    if like is not None:
        return serialization.from_bytes(like, data)
    return serialization.msgpack_restore(data)


def save_checkpoint(
    folder: str,
    name: str,
    params,
    config: Dict[str, Any],
    step: int,
    epoch: int,
    noise: Optional[np.ndarray] = None,
) -> str:
    """Write `<folder>/<name>/` with params.msgpack + meta.json (+ noise.npy)."""
    path = os.path.join(folder, name)
    os.makedirs(path, exist_ok=True)
    # params and noise first (each atomically), meta.json LAST — its rename is
    # the commit point checkpoint_exists/load_checkpoint key off
    save_pytree(os.path.join(path, "params.msgpack"), params)
    if noise is not None:
        ntmp = os.path.join(path, "noise.npy.tmp")
        with open(ntmp, "wb") as fd:
            np.save(fd, np.asarray(noise))
        os.replace(ntmp, os.path.join(path, "noise.npy"))
    meta = {"config": dict(config), "step": int(step), "epoch": int(epoch)}
    tmp = os.path.join(path, "meta.json.tmp")
    with open(tmp, "w") as fd:
        json.dump(meta, fd, default=str)
    os.replace(tmp, os.path.join(path, "meta.json"))
    return path


def load_checkpoint(path: str) -> Tuple[Any, TrainConfig, int, int, Optional[np.ndarray]]:
    """Read a checkpoint dir -> (params, config, step, epoch, noise)."""
    params = load_pytree(os.path.join(path, "params.msgpack"))
    with open(os.path.join(path, "meta.json")) as fd:
        meta = json.load(fd)
    noise_path = os.path.join(path, "noise.npy")
    noise = np.load(noise_path) if os.path.exists(noise_path) else None
    cfg = make_config(**meta["config"])
    return params, cfg, int(meta["step"]), int(meta["epoch"]), noise


def checkpoint_exists(folder: str, name: str = "checkpoint") -> bool:
    return os.path.exists(os.path.join(folder, name, "meta.json"))


def load_model(model_path: str):
    """Load a mapper from either this framework's checkpoint dir or a reference
    torch .th file. Returns (mapper_module, params, config, noise).

    Torch dispatch mirrors load_model (main.py:1273-1290): dict checkpoints carry
    {state_dict, config, ...}; legacy files are whole nn.Module pickles whose
    .config attribute and .NOISE bank are recovered from the pickle.
    """
    from feed_forward_vqgan_clip_tpu.models.mappers import build_mapper

    if os.path.isdir(model_path):
        params, cfg, _step, _epoch, noise = load_checkpoint(model_path)
        mapper = build_mapper(cfg, vq_channels=_vq_channels(cfg))
        return mapper, params, cfg, noise

    # torch checkpoint (.th)
    import torch

    obj = torch.load(model_path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        sd = obj["state_dict"]
        raw_cfg = dict(obj["config"])
        noise = sd.pop("NOISE", None)
    else:  # legacy whole-module pickle
        sd = obj.state_dict()
        raw_cfg = dict(obj.config)
        noise = getattr(obj, "NOISE", None)
    if noise is not None:
        noise = np.asarray(noise)
    cfg = make_config(**raw_cfg)
    sd = {k: np.asarray(v.detach().float().numpy()) for k, v in sd.items() if hasattr(v, "detach")}
    params = convert_mapper_state_dict(sd, cfg)
    mapper = build_mapper(cfg, vq_channels=_vq_channels(cfg))
    return mapper, params, cfg, noise


def convert_mapper_state_dict(sd: Dict[str, np.ndarray], cfg: TrainConfig):
    from feed_forward_vqgan_clip_tpu.io import torch_import as ti

    mt = cfg.get("model_type")
    depth = int(cfg.get("depth"))
    if mt == "mlp_mixer":
        return ti.convert_mixer(sd, depth)
    if mt in ("vitgan", "simple_vitgan"):
        return ti.convert_vitgan_generator(sd, depth)
    if mt == "xtransformer":
        return ti.convert_xtransformer(sd, depth)
    raise NotImplementedError(f"no torch converter for model_type={mt!r}")


def _vq_channels(cfg: TrainConfig) -> int:
    from feed_forward_vqgan_clip_tpu.config import vqgan_arch_config

    return int(vqgan_arch_config(cfg)["z_channels"])
