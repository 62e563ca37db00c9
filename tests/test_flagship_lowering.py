"""Flagship-shape multi-device lowering checks (SURVEY.md §4 multi-device
strategy; round-3 verdict weak #4).

The dryrun and e2e tests exercise multi-device training at toy dims
(dim=16 / depth=2 / vq_image_size=4); shape-dependent dispatch — TP rules on
1024-wide FFNs, the 224px cutout shard_map at cutn=8, warp planner windows,
Mosaic BlockSpec shapes — is only proven composable if the graphs BUILD at the
sizes that matter. These tests trace (`jit(...).lower(...)`) the train grad
step and the inference render at the flagship geometry (MLP-Mixer 32x1024,
f16-16384 VQGAN at 256px, ViT-B/32 loss, batch 8 / cutn 8) on the virtual
8-device mesh, with all inputs ABSTRACT (ShapeDtypeStruct + shardings) so no
flagship-sized buffer is ever allocated, let alone replicated 8x.

`.lower()` (not `.compile()`): shard_map validates specs/divisibility and the
Pallas wrappers run their trace-time planners during tracing; GSPMD
propagation itself happens at compile, which at these dims takes tens of
minutes on CPU — out of test budget (the TPU-side compile is exercised by
bench.py on real hardware every round).

The Pallas variant forces the kernel paths a real TPU pod would take
(interpret mode so CPU can trace them): fused mixer train kernels under the
DP shard_map, Pallas warp forward/adjoint inside the cutout stage, the
shard_map'd VQ lookup.
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

BS = 8  # global batch; divisible by both mesh shapes' data axes


def _flagship_cfg(**kw):
    cfg = dict(
        clip_model="ViT-B/32",
        vqgan_config="vqgan_imagenet_f16_16384",
        model_type="mlp_mixer", dim=1024, depth=32, dropout=0,
        vq_image_size=16,  # -> 256px decode
        batch_size=BS, repeat=1, cutn=8, cut_size=224, pool_size=224,
        noise_dim=0, lr=1e-3, compute_dtype="bfloat16",
    )
    cfg.update(kw)
    return make_config(**cfg)


def _abstractify(tree, sharding_tree):
    return jax.tree.map(
        lambda sd, sh: jax.ShapeDtypeStruct(sd.shape, sd.dtype, sharding=sh),
        tree, sharding_tree,
    )


@functools.lru_cache(maxsize=1)
def _models():
    cfg = _flagship_cfg()
    dtype = jnp.bfloat16
    perceptor = load_perceptor("ViT-B/32", dtype=dtype)
    arch = vqgan_arch_config(cfg)
    vq = make_vqgan(arch, dtype=dtype)
    mapper = build_mapper(dict(cfg), vq_channels=int(arch["z_channels"]), dtype=dtype)
    # abstract param trees — nothing flagship-sized is materialized
    mapper_sds = jax.eval_shape(
        mapper.init, jax.random.PRNGKey(0), jnp.zeros((1, 512), jnp.float32)
    )
    vq_sds = jax.eval_shape(
        vq.init, jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 256), jnp.float32)
    )
    clip_sds = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), perceptor.params
    )
    return cfg, perceptor, vq, mapper, mapper_sds, vq_sds, clip_sds


def _lower_train(mesh, cfg, perceptor, vq, mapper, mapper_sds, vq_sds, clip_sds):
    frozen = L.FrozenModels(perceptor, vq, None, None, None, None)
    mc = MakeCutouts(cut_size=224, cutn=8, pool_size=224)
    _, loss_fn = L.make_train_step(
        cfg, mapper, frozen, mc, inp_is_tokens=True, out_is_tokens=True, mesh=mesh,
    )
    rep = meshlib.replicated(mesh)
    params_abs = _abstractify(mapper_sds, meshlib.mapper_param_sharding(mesh, mapper_sds))
    fz_abs = {
        "clip": _abstractify(clip_sds, jax.tree.map(lambda _: rep, clip_sds)),
        "vq": _abstractify(vq_sds, jax.tree.map(lambda _: rep, vq_sds)),
    }
    tok_abs = jax.ShapeDtypeStruct((BS, 77), jnp.int32, sharding=meshlib.data_sharding(mesh))
    batch_abs = {"inp": tok_abs, "out": tok_abs}
    key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    with mesh:
        lowered = jax.jit(grad_fn).lower(params_abs, fz_abs, batch_abs, key_abs)
    text = lowered.as_text()
    n = int(np.prod(list(dict(mesh.shape).values())))
    # SPMD module over all 8 devices with the mesh axes annotated (Shardy)
    assert f"mhlo.num_partitions = {n}" in text
    assert "sdy.mesh" in text and '"data"' in text
    return text


def _lower_render(mesh, cfg, perceptor, vq, mapper, mapper_sds, vq_sds, clip_sds):
    frozen = L.FrozenModels(perceptor, vq, None, None, None, None)
    render = L.make_render_fn(cfg, mapper, frozen, mesh=mesh)
    rep = meshlib.replicated(mesh)
    params_abs = _abstractify(mapper_sds, meshlib.mapper_param_sharding(mesh, mapper_sds))
    fz_abs = {
        "clip": _abstractify(clip_sds, jax.tree.map(lambda _: rep, clip_sds)),
        "vq": _abstractify(vq_sds, jax.tree.map(lambda _: rep, vq_sds)),
    }
    feats_abs = jax.ShapeDtypeStruct(
        (BS, 512), jnp.float32, sharding=meshlib.data_sharding(mesh)
    )
    with mesh:
        render.lower(params_abs, fz_abs, feats_abs)


class TestFlagshipLowering:
    def test_train_grad_lowers_dp8(self):
        mesh = meshlib.make_mesh({"data": 8, "model": 1})
        _lower_train(mesh, *_models())

    def test_train_grad_lowers_dp4_tp2(self):
        mesh = meshlib.make_mesh({"data": 4, "model": 2})
        _lower_train(mesh, *_models())

    def test_render_lowers_both_meshes(self):
        for shape in ({"data": 8, "model": 1}, {"data": 4, "model": 2}):
            _lower_render(meshlib.make_mesh(shape), *_models())


class TestFlagshipLoweringPallasPaths:
    """Same flagship train lowering, but forcing the kernel paths a TPU pod
    would dispatch (interpret mode lets CPU trace them): Pallas warps inside
    the cutout shard_map, the fused-mixer train kernels under the DP mapper
    shard_map, and the shard_map'd Pallas VQ lookup."""

    def test_train_grad_lowers_dp8_pallas(self, monkeypatch):
        from feed_forward_vqgan_clip_tpu.models.mappers import fused
        from feed_forward_vqgan_clip_tpu.ops import augment
        from feed_forward_vqgan_clip_tpu.ops.pallas import vq_lookup

        monkeypatch.setattr(augment, "_WARP_VJP_MODE", "pallas")
        monkeypatch.setattr(augment, "_WARP_FWD_MODE", "pallas")
        monkeypatch.setattr(augment, "_WARP_INTERPRET", True)
        orig_make = fused.make_mapper_train_apply

        def forced(mapper, *, fused=None, interpret=False):
            # fused=None is the backend auto-gate (False on CPU); force the
            # kernel path a TPU would take. tp_active's explicit False stays.
            return orig_make(
                mapper, fused=True if fused is None else fused, interpret=True
            )

        monkeypatch.setattr(fused, "make_mapper_train_apply", forced)
        orig_vq = vq_lookup.nearest_codebook_indices_pallas
        monkeypatch.setattr(
            vq_lookup,
            "nearest_codebook_indices_pallas",
            functools.partial(orig_vq, interpret=True),
        )

        cfg, perceptor, vq, mapper, mapper_sds, vq_sds, clip_sds = _models()
        cfg = _flagship_cfg(use_pallas=True)
        mesh = meshlib.make_mesh({"data": 8, "model": 1})
        _lower_train(mesh, cfg, perceptor, vq, mapper, mapper_sds, vq_sds, clip_sds)
