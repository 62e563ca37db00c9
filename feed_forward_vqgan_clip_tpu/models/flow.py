"""Conditional affine coupling flow — the text->image-embedding prior.

Equivalent of net2net's ConditionalFlatCouplingFlow as driven by the reference
(/root/reference/main.py:1335-1462): `forward(x, cond) -> (z, logdet)` for NLL
training, `sample(cond)` for generation (main.py:1040-1042). Structure per flow
block: ActNorm -> conditional double affine coupling (two passes, each scaling/
shifting one half conditioned on [other half, embedded cond]; tanh-bounded log
scale; halves swapped between passes) -> fixed channel shuffle. A small leaky-relu
MLP embeds the conditioning once, shared by all blocks.

Everything operates on flat (B, C) vectors; the reference's (B, C, 1, 1) shape is
squeezed at the call boundary. The fixed shuffle permutations live in a 'buffers'
variable collection so the optimizer never touches them, and torch checkpoints'
permutation buffers restore exactly (io/torch_import.convert_flow).

Deviation (documented): net2net's ActNorm does data-dependent init on the first
batch; here fresh training starts at loc=0/scale=1 (converted checkpoints load
their trained values, so parity holds for released priors).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicFC(nn.Module):
    """net2net BasicFullyConnectedNet: Linear -> LeakyReLU x (depth+1) -> Linear
    [-> tanh]."""

    hidden_dim: int
    out_dim: int
    depth: int = 2
    use_tanh: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x.astype(self.dtype)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc_in")(h)
        h = nn.leaky_relu(h, 0.01)
        for i in range(self.depth):
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"fc_{i}")(h)
            h = nn.leaky_relu(h, 0.01)
        h = nn.Dense(self.out_dim, dtype=self.dtype, name="fc_out")(h)
        if self.use_tanh:
            h = jnp.tanh(h)
        return h


class ActNorm(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, reverse=False):
        loc = self.param("loc", nn.initializers.zeros, (self.channels,), jnp.float32)
        scale = self.param("scale", nn.initializers.ones, (self.channels,), jnp.float32)
        if not reverse:
            h = scale * (x + loc)
            logdet = jnp.full(
                (x.shape[0],), jnp.sum(jnp.log(jnp.abs(scale))), x.dtype
            )
            return h, logdet
        return x / scale - loc


class ConditionalDoubleCoupling(nn.Module):
    """Two affine-coupling passes; pass i transforms the second half conditioned on
    [first half, cond]; halves are swapped before the second pass."""

    channels: int
    cond_dim: int
    hidden_dim: int
    hidden_depth: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond, reverse=False):
        half = self.channels // 2
        s_nets = [
            BasicFC(self.hidden_dim, half, self.hidden_depth, use_tanh=True,
                    dtype=self.dtype, name=f"s_{i}")
            for i in range(2)
        ]
        t_nets = [
            BasicFC(self.hidden_dim, half, self.hidden_depth, use_tanh=False,
                    dtype=self.dtype, name=f"t_{i}")
            for i in range(2)
        ]
        if not reverse:
            logdet = jnp.zeros((x.shape[0],), x.dtype)
            for i in range(2):
                if i % 2 != 0:
                    x = jnp.concatenate([x[:, half:], x[:, :half]], axis=1)
                xa, xb = x[:, :half], x[:, half:]
                ci = jnp.concatenate([xa, cond], axis=1)
                scale = s_nets[i](ci)
                xb = xb * jnp.exp(scale) + t_nets[i](ci)
                x = jnp.concatenate([xa, xb], axis=1)
                logdet = logdet + jnp.sum(scale, axis=1)
            return x, logdet
        for i in reversed(range(2)):
            xa, xb = x[:, :half], x[:, half:]
            ci = jnp.concatenate([xa, cond], axis=1)
            scale = s_nets[i](ci)
            xb = (xb - t_nets[i](ci)) * jnp.exp(-scale)
            x = jnp.concatenate([xa, xb], axis=1)
            if i % 2 != 0:
                x = jnp.concatenate([x[:, half:], x[:, :half]], axis=1)
        return x


class FlowBlock(nn.Module):
    channels: int
    cond_dim: int
    hidden_dim: int
    hidden_depth: int
    block_index: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond, reverse=False):
        norm = ActNorm(self.channels, name="norm")
        coupling = ConditionalDoubleCoupling(
            self.channels, self.cond_dim, self.hidden_dim, self.hidden_depth,
            self.dtype, name="coupling",
        )
        perm = self.variable(
            "buffers", "shuffle",
            lambda: jnp.asarray(
                np.random.RandomState(self.block_index).permutation(self.channels),
                jnp.int32,
            ),
        ).value
        if not reverse:
            h, ld0 = norm(x)
            h, ld1 = coupling(h, cond)
            h = h[:, perm]
            return h, ld0 + ld1
        inv = jnp.argsort(perm)
        h = x[:, inv]
        h = coupling(h, cond, reverse=True)
        return norm(h, reverse=True)


class ConditionalFlatCouplingFlow(nn.Module):
    in_channels: int  # flow dimension (image-embedding dim)
    conditioning_dim: int  # text-embedding dim
    embedding_dim: int
    hidden_dim: int
    hidden_depth: int
    n_flows: int
    conditioning_depth: int = 2
    conditioning_hidden_dim: int = 256
    dtype: Any = jnp.float32

    def setup(self):
        self.embedder = BasicFC(
            self.conditioning_hidden_dim, self.embedding_dim,
            self.conditioning_depth, dtype=self.dtype, name="embedder",
        )
        self.blocks = [
            FlowBlock(
                self.in_channels, self.embedding_dim, self.hidden_dim,
                self.hidden_depth, block_index=i, dtype=self.dtype,
                name=f"flow_{i}",
            )
            for i in range(self.n_flows)
        ]

    def __call__(self, x, cond):
        """x: (B, C) flow input (image embedding), cond: (B, D) text embedding ->
        (z, logdet)."""
        emb = self.embedder(cond.astype(self.dtype))
        logdet = jnp.zeros((x.shape[0],), jnp.float32)
        h = x.astype(self.dtype)
        for blk in self.blocks:
            h, ld = blk(h, emb)
            logdet = logdet + ld.astype(jnp.float32)
        return h.astype(jnp.float32), logdet

    def reverse(self, z, cond):
        emb = self.embedder(cond.astype(self.dtype))
        h = z.astype(self.dtype)
        for blk in reversed(self.blocks):
            h = blk(h, emb, reverse=True)
        return h.astype(jnp.float32)


def nll_loss(z, logdet):
    """net2net NLL: mean(0.5*sum(z^2)) - mean(logdet) (main.py:1399, 1424)."""
    nll = jnp.mean(jnp.sum(0.5 * jnp.square(z), axis=1))
    return nll - jnp.mean(logdet), {"nll_loss": nll, "nlogdet_loss": -jnp.mean(logdet)}


class Prior:
    """Loaded flow + params with the reference's 4-D call conventions flattened
    away: sample(key, H) takes/returns flat (B, D) arrays (main.py:1040-1042)."""

    def __init__(self, flow: ConditionalFlatCouplingFlow, variables):
        self.flow = flow
        self.variables = variables

    def forward(self, x, cond):
        return self.flow.apply(self.variables, x, cond)

    def sample(self, key, cond):
        z = jax.random.normal(key, (cond.shape[0], self.flow.in_channels))
        return self.flow.apply(
            self.variables, z, cond, method=self.flow.reverse
        )


def build_prior_model(config: dict, input_size: int, output_size: int) -> ConditionalFlatCouplingFlow:
    """Mirror of the reference's build_prior_model (main.py:1453-1462)."""
    m = config["model"] if "model" in config else config
    return ConditionalFlatCouplingFlow(
        in_channels=int(output_size),
        conditioning_dim=int(input_size),
        embedding_dim=int(m["embedding_dim"]),
        hidden_dim=int(m["hidden_dim"]),
        hidden_depth=int(m["hidden_depth"]),
        n_flows=int(m["n_flows"]),
    )


def load_prior_model(prior_path: str) -> Prior:
    """Load a prior from a native checkpoint dir or a reference torch .th
    ({model, step, input_size, output_size, config}, main.py:1436-1443)."""
    import os

    if os.path.isdir(prior_path):
        import json

        from feed_forward_vqgan_clip_tpu.io.checkpoint import load_pytree

        with open(os.path.join(prior_path, "meta.json")) as fd:
            meta = json.load(fd)
        flow = build_prior_model(
            meta["config"], meta["input_size"], meta["output_size"]
        )
        variables = load_pytree(os.path.join(prior_path, "params.msgpack"))
        return Prior(flow, variables)

    import torch

    from feed_forward_vqgan_clip_tpu.io.torch_import import convert_flow

    ckpt = torch.load(prior_path, map_location="cpu", weights_only=False)
    cfg = ckpt["config"]
    cfg = {k: dict(v) if hasattr(v, "keys") else v for k, v in dict(cfg).items()}
    flow = build_prior_model(cfg, int(ckpt["input_size"]), int(ckpt["output_size"]))
    sd = {k: np.asarray(v.detach().float().numpy()) for k, v in ckpt["model"].items()}
    variables = convert_flow(sd, n_flows=flow.n_flows)
    return Prior(flow, variables)
