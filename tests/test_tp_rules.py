"""Tensor-parallel sharding rules across all mapper families (parallel/mesh.py).

The 8-device CPU mesh (conftest) gives real GSPMD semantics: assert the rule
assigns the Megatron pairing to every FFN, and that a jitted forward with
TP-sharded params runs and matches the replicated result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from feed_forward_vqgan_clip_tpu.models.mappers import build_mapper
from feed_forward_vqgan_clip_tpu.parallel import mesh as meshlib


def _mesh42():
    return meshlib.make_mesh({"data": 4, "model": 2})


def _spec_map(mesh, params):
    shards = meshlib.mapper_param_sharding(mesh, params)
    flat = jax.tree_util.tree_flatten_with_path(shards)[0]
    return {jax.tree_util.keystr(k): v.spec for k, v in flat}


def _build(model_type, **kw):
    cfg = dict(
        model_type=model_type, dim=64, depth=2, num_heads=2, dropout=0.0,
        vq_image_size=8, clip_dim=32, noise_dim=0, clip_model="tiny", **kw,
    )
    mapper = build_mapper(cfg, vq_channels=8, dtype=jnp.float32)
    x = jnp.zeros((2, 32), jnp.float32)
    params = mapper.init(jax.random.PRNGKey(0), x)
    return mapper, params


class TestRuleAssignment:
    def test_mixer_token_and_channel_ffns_sharded(self):
        _, params = _build("mlp_mixer")
        specs = _spec_map(_mesh42(), params)
        token_fc1 = [v for k, v in specs.items() if k.endswith("['token_fc1']")]
        token_fc2 = [v for k, v in specs.items() if k.endswith("['token_fc2']")]
        ch1 = [v for k, v in specs.items() if "channel_fc1" in k and "kernel" in k]
        ch2 = [v for k, v in specs.items() if "channel_fc2" in k and "kernel" in k]
        assert token_fc1 and all(s == P(None, "model") for s in token_fc1)
        assert token_fc2 and all(s == P("model", None) for s in token_fc2)
        assert ch1 and all(s == P(None, "model") for s in ch1)
        assert ch2 and all(s == P("model", None) for s in ch2)

    def test_vitgan_and_xtransformer_ffns_sharded(self):
        for mt, col, row in (("vitgan", "linear1", "linear2"),
                             ("xtransformer", "ff1", "ff2")):
            _, params = _build(mt)
            specs = _spec_map(_mesh42(), params)
            c = [v for k, v in specs.items() if col in k and "kernel" in k]
            r = [v for k, v in specs.items() if row in k and "kernel" in k]
            cb = [v for k, v in specs.items() if col in k and "bias" in k]
            assert c and all(s == P(None, "model") for s in c), mt
            assert r and all(s == P("model", None) for s in r), mt
            assert cb and all(s == P("model") for s in cb), mt
            # attention stays replicated
            att = [v for k, v in specs.items()
                   if any(t in k for t in ("to_q", "to_kv", "to_qkv", "attn"))
                   and "kernel" in k]
            assert all(s == P() for s in att), mt

    def test_model_axis_1_is_fully_replicated(self):
        _, params = _build("mlp_mixer")
        mesh = meshlib.make_mesh({"data": 8, "model": 1})
        specs = _spec_map(mesh, params)
        assert all(s == P() for s in specs.values())


@pytest.mark.slow
class TestShardedForwardParity:
    def test_shard_map_mapper_grads_match_unsharded(self):
        """The DP shard_map wrap of the mapper train apply (train/loop.py
        data_par path: params replicated in, batch split over 'data', param
        cotangents psum'd by shard_map's transpose) must reproduce the
        unsharded value_and_grad exactly (same math, different partitioning)."""
        mapper, params = _build("mlp_mixer")
        x = jax.random.normal(jax.random.PRNGKey(2), (8, 32), jnp.float32)

        def loss(apply_fn, p, xb):
            return jnp.mean(jnp.square(apply_fn(p, xb)))

        ref_l, ref_g = jax.value_and_grad(
            lambda p: loss(lambda p_, x_: mapper.apply(p_, x_), p, x)
        )(params)
        mesh = meshlib.make_mesh({"data": 8, "model": 1})
        with mesh:
            placed = jax.tree.map(
                lambda a: jax.device_put(a, meshlib.replicated(mesh)), params
            )
            xb = jax.device_put(x, meshlib.data_sharding(mesh))

            def wrapped(p, xin):
                return jax.shard_map(
                    lambda p_, x_: mapper.apply(p_, x_), mesh=mesh,
                    in_specs=(P(), P("data")), out_specs=P("data"),
                    check_vma=False,
                )(p, xin)

            got_l, got_g = jax.jit(
                jax.value_and_grad(lambda p: loss(wrapped, p, xb))
            )(placed)
        np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(got_g), jax.tree.leaves(ref_g)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
            )

    def test_tp_forward_matches_replicated(self):
        for mt in ("mlp_mixer", "vitgan", "xtransformer"):
            mapper, params = _build(mt)
            x = jax.random.normal(jax.random.PRNGKey(1), (4, 32), jnp.float32)
            ref = mapper.apply(params, x)
            mesh = _mesh42()
            with mesh:
                shards = meshlib.mapper_param_sharding(mesh, params)
                placed = jax.tree.map(jax.device_put, params, shards)
                xb = jax.device_put(x, meshlib.data_sharding(mesh))
                out = jax.jit(mapper.apply)(placed, xb)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
            )
