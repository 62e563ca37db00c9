"""Device mesh + sharding helpers.

Single-controller JAX replacement for the reference's Horovod layer
(/root/reference/main.py:41-48, 626-629; SURVEY.md §5 "Distributed communication"):
  * a ('data', 'model') Mesh over ICI — 'data' carries the batch (the reference's
    pure DP parity bar), 'model' tensor-shards large mapper FFNs;
  * params are replicated over 'data' (broadcast_parameters equivalent) and the
    global-batch mean of the loss auto-inserts the psum the reference got from
    hvd.DistributedOptimizer's allreduce;
  * process_index()==0 gates host I/O (rank-0 logging/ckpt, main.py:620).
"""

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Dict[str, int]] = None, devices=None) -> Mesh:
    """shape e.g. {'data': 8} or {'data': 4, 'model': 2}; default: all devices on
    'data', 'model'=1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = {"data": n, "model": 1}
    if "model" not in shape:
        shape = dict(shape, model=1)
    if "data" not in shape:
        shape = dict(shape, data=n // shape["model"])
    d, m = int(shape["data"]), int(shape["model"])
    if d * m != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(d, m)
    return Mesh(dev_array, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place host arrays with batch-dim sharding over 'data'."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, r), tree)


def is_primary() -> bool:
    return jax.process_index() == 0


def host_array(x) -> np.ndarray:
    """Materialize any jax.Array (or numpy) as a full host numpy array on EVERY
    process. Replicated / single-process arrays are fully addressable and fetch
    directly; globally-sharded arrays go through a collective allgather, so on a
    real pod ALL processes must reach this call (it replaces the np.asarray that
    would throw 'non-addressable' there)."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    # for global arrays tiled=True is required and returns the (replicated)
    # GLOBAL value, not a concatenation
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def host_tree(tree):
    """host_array over a pytree (collective on sharded leaves — all processes
    must participate)."""
    return jax.tree.map(host_array, tree)


def ensure_on_mesh(mesh: Mesh, tree):
    """Place any leaf whose sharding is not already a NamedSharding on `mesh`
    (e.g. optimizer step counters, fresh scalars) as replicated; leaves that are
    already mesh-placed (params, zeros_like-derived moments) are untouched."""
    rep = replicated(mesh)

    def fix(leaf):
        s = getattr(leaf, "sharding", None)
        if isinstance(s, NamedSharding) and s.mesh == mesh:
            return leaf
        return jax.device_put(leaf, rep)

    return jax.tree.map(fix, tree)


# FFN kernels across every mapper family follow one of two patterns:
#   column-parallel (in, hidden): shard the hidden/output dim; bias shards too
#   row-parallel   (hidden, out): shard the hidden/input dim; bias replicated
# fc1-sharded-out + fc2-sharded-in is the Megatron pairing that makes XLA
# insert exactly ONE all-reduce per FFN over ICI.
_COL_PARALLEL = {"channel_fc1", "linear1", "ff1"}  # mixer / vitgan / xtransformer
_ROW_PARALLEL = {"channel_fc2", "linear2", "ff2"}


def mapper_param_sharding(mesh: Mesh, params):
    """Tensor-parallel sharding rule over 'model' for ALL mapper families:
    Mixer channel-mix AND token-mix FFNs, VitGAN block MLPs, XTransformer block
    FFNs (attention and embeddings stay replicated — they are a small fraction
    of the FLOPs and sharding heads would reshard mid-attention). Everything
    else is replicated. No-op when the model axis has size 1."""
    if mesh.shape["model"] == 1:
        return jax.tree.map(lambda _: replicated(mesh), params)

    def rule(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        last = names[-1]
        parent = names[-2] if len(names) >= 2 else ""
        # mixer token mix: raw-array params (t1 (T,Et), t2 (Et,T), biases)
        if last == "token_fc1":
            return NamedSharding(mesh, P(None, "model"))
        if last == "token_fc1_bias":
            return NamedSharding(mesh, P("model"))
        if last == "token_fc2":
            return NamedSharding(mesh, P("model", None))
        # Dense-style FFNs
        if parent in _COL_PARALLEL:
            if last == "kernel":
                return NamedSharding(mesh, P(None, "model"))
            if last == "bias":
                return NamedSharding(mesh, P("model"))
        if parent in _ROW_PARALLEL and last == "kernel":
            return NamedSharding(mesh, P("model", None))
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(rule, params)


# retained name: the round-1 rule covered only the mixer's channel-mix FFNs
mixer_param_sharding = mapper_param_sharding
