"""DP/TP numerical equivalence: the SAME global batch must produce the SAME
loss and mapper gradients on {data:8}, {data:4, model:2}, and a single device.

The reference gets this property from Horovod allreduce over per-rank batches
(main.py:627, 839-842); here it must hold by construction of the shard_map /
GSPMD decomposition (parallel/mesh.py TP rules, train/loop.py data_par
shard_maps + psum-by-transpose). dryrun_multichip proves execution and
test_tp_rules proves shardings — this test pins the NUMBERS.

Augmentation randomness folds in axis_index('data') per shard (by design, the
reference's per-rank torch RNG semantics), which makes full-aug bitwise parity
across mesh shapes impossible; the test pins everything AROUND it by
neutralizing the randomness: augs=["Cc"] (deterministic identity), noise_fac=0,
dropout=0 — then every stage is a pure function of the global batch and the
meshes must agree to f32 tolerance.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feed_forward_vqgan_clip_tpu.config import make_config, vqgan_arch_config
from feed_forward_vqgan_clip_tpu.models.mappers import build_mapper
from feed_forward_vqgan_clip_tpu.models.perceptor import load_perceptor
from feed_forward_vqgan_clip_tpu.models.vqgan import make_vqgan
from feed_forward_vqgan_clip_tpu.ops.cutouts import MakeCutouts
from feed_forward_vqgan_clip_tpu.parallel import mesh as meshlib
from feed_forward_vqgan_clip_tpu.train import loop as L

pytestmark = pytest.mark.slow

BS = 8
TINY_VQ = dict(
    n_embed=32, embed_dim=8, z_channels=8, ch=8, ch_mult=(1, 2),
    num_res_blocks=1, attn_resolutions=(4,), resolution=8,
)


@functools.lru_cache(maxsize=1)
def _rig():
    cfg = make_config(
        clip_model="tiny", vqgan_arch=TINY_VQ, model_type="mlp_mixer",
        dim=16, depth=1, dropout=0, vq_image_size=4,
        batch_size=BS, repeat=2, cutn=2, cut_size=32, pool_size=32,
        noise_dim=0, lr=1e-3, compute_dtype="float32", aug_dtype="float32",
        augs=["Cc"], noise_fac=0.0, normalize_input=True,
        l2_coef=0.1, tv_coef=0.1, seed=0,
    )
    dtype = jnp.float32
    perceptor = load_perceptor("tiny", dtype=dtype)
    arch = vqgan_arch_config(cfg)
    vq = make_vqgan(arch, dtype=dtype)
    vq_params = jax.jit(vq.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, arch["z_channels"]))
    )
    frozen = L.FrozenModels(perceptor, vq, vq_params, None, None, None)
    mapper = build_mapper(dict(cfg), vq_channels=arch["z_channels"], dtype=dtype)
    params = jax.jit(mapper.init)(jax.random.PRNGKey(1), jnp.zeros((1, 32)))
    g = np.random.default_rng(3)
    toks = np.zeros((BS, 77), np.int32)
    toks[:, 0] = 49406
    for i in range(BS):
        ln = 3 + i % 5
        toks[i, 1 : 1 + ln] = g.integers(2, 49000, size=ln)
        toks[i, 1 + ln] = 49407
    return cfg, frozen, mapper, params, toks


def _loss_and_grads(mesh):
    cfg, frozen, mapper, params, toks = _rig()
    mc = MakeCutouts(cut_size=32, cutn=2, augs=["Cc"], pool_size=32, noise_fac=0.0)
    _, loss_fn = L.make_train_step(
        cfg, mapper, frozen, mc, inp_is_tokens=True, out_is_tokens=True, mesh=mesh,
    )
    fz = {"clip": frozen.perceptor.params, "vq": frozen.vq_params}
    key = jax.random.PRNGKey(0)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    if mesh is None:
        (loss, _), grads = grad_fn(params, fz, {"inp": jnp.asarray(toks), "out": jnp.asarray(toks)}, key)
    else:
        with mesh:
            p = jax.tree.map(
                jax.device_put, params, meshlib.mapper_param_sharding(mesh, params)
            )
            fzp = meshlib.replicate(mesh, fz)
            b = jax.device_put(jnp.asarray(toks), meshlib.data_sharding(mesh))
            (loss, _), grads = grad_fn(p, fzp, {"inp": b, "out": b}, key)
    return float(loss), jax.tree.map(np.asarray, grads)


class TestSameIOSingleEncode:
    def test_same_io_matches_double_encode_bitwise(self):
        """same_io=True (text-only dataset: one text encode reused for the
        target) must be the IDENTICAL function to encoding the same tokens
        twice — bitwise, since the deduped subgraph feeds the same ops."""
        cfg, frozen, mapper, params, toks = _rig()
        mc = MakeCutouts(cut_size=32, cutn=2, augs=["Cc"], pool_size=32, noise_fac=0.0)
        fz = {"clip": frozen.perceptor.params, "vq": frozen.vq_params}
        key = jax.random.PRNGKey(0)
        batch = {"inp": jnp.asarray(toks), "out": jnp.asarray(toks)}
        outs = []
        for same_io in (False, True):
            _, loss_fn = L.make_train_step(
                cfg, mapper, frozen, mc, inp_is_tokens=True,
                out_is_tokens=True, same_io=same_io,
            )
            (loss, _), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
                params, fz, batch, key
            )
            outs.append((float(loss), jax.tree.map(np.asarray, grads)))
        (l0, g0), (l1, g1) = outs
        assert l0 == l1
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), g0, g1)


class TestMeshNumericalEquivalence:
    def test_dp8_and_tp2_match_single_device(self):
        loss_1, grads_1 = _loss_and_grads(None)
        for shape in ({"data": 8, "model": 1}, {"data": 4, "model": 2}):
            mesh = meshlib.make_mesh(shape)
            loss_m, grads_m = _loss_and_grads(mesh)
            np.testing.assert_allclose(loss_m, loss_1, rtol=0, atol=1e-5)
            assert jax.tree.structure(grads_m) == jax.tree.structure(grads_1)

            def check(path, a, b, shape=shape):
                # rtol covers real-magnitude leaves; the absolute floor covers
                # numerically-zero leaves (bias grads that are sums of large
                # cancelling terms land at ~1e-7 with reduction-order noise of
                # the same size — equal to f32 rounding, not a sharding bug)
                scale = max(1e-1, float(np.abs(b).max()))
                np.testing.assert_allclose(
                    a, b, rtol=2e-5, atol=1e-5 * scale,
                    err_msg=f"grad mismatch at {jax.tree_util.keystr(path)} on mesh {shape}",
                )

            jax.tree_util.tree_map_with_path(check, grads_m, grads_1)
