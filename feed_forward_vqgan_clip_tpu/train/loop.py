"""The amortized VQGAN-CLIP trainer.

Functional replica of the reference's `train` (/root/reference/main.py:504-974),
re-architected TPU-first:
  * ONE donated, jitted train step over a ('data','model') Mesh containing the whole
    hot path — text encode -> mapper -> quantize -> VQGAN decode -> cutouts ->
    CLIP image encode -> loss -> grads -> Adam -> EMA. Params replicated over
    'data'; batch sharded; the global-batch loss mean auto-inserts the psum that
    replaces Horovod's DistributedOptimizer allreduce (main.py:627, 839-842).
  * all randomness (augs, noise factors) from explicit jax.random keys split per
    step; the fixed NOISE bank is sampled host-side per step exactly like the
    reference's np.random path (main.py:743-746) and checkpointed (main.py:687).
  * host work (logging, previews, checkpoints) happens only every log_interval on
    process 0, so steps pipeline without host sync.

Loss parity, term by term: spherical distance (main.py:811), optional input_loss
(main.py:812-824), diversity over VGG16 slices (main.py:776-791), L2 (758-762),
TV (769-773), loss = dists - diversity_coef*div + l2_coef*l2 + tv_coef*tv (831).
"""

import functools
import logging
import os
import time
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from feed_forward_vqgan_clip_tpu.config import (
    TrainConfig,
    resolved_clip_geometry,
    vqgan_arch_config,
)
from feed_forward_vqgan_clip_tpu.data.datasets import (
    epoch_shard_batches,
    load_dataset,
    shard_for_process,
)
from feed_forward_vqgan_clip_tpu.io import checkpoint as ckpt_io
from feed_forward_vqgan_clip_tpu.io.images import save_grid
from feed_forward_vqgan_clip_tpu.models.mappers import build_mapper
from feed_forward_vqgan_clip_tpu.models.perceptor import Perceptor, load_perceptor
from feed_forward_vqgan_clip_tpu.models.vqgan import latent_bounds, make_vqgan, synth
from feed_forward_vqgan_clip_tpu.ops.cutouts import MakeCutouts
from feed_forward_vqgan_clip_tpu.ops.grad_ops import clamp_with_grad
from feed_forward_vqgan_clip_tpu.ops.losses import (
    diversity_loss,
    l2_loss,
    normalize,
    spherical_dist,
    spherical_dist_loss,
    tv_loss,
)
from feed_forward_vqgan_clip_tpu.parallel import mesh as meshlib
from feed_forward_vqgan_clip_tpu.registry import CLIP_MEAN, CLIP_STD
from feed_forward_vqgan_clip_tpu.train.state import (
    TrainState,
    make_optimizer,
    make_train_state,
)

log = logging.getLogger(__name__)


class FrozenModels(NamedTuple):
    perceptor: Perceptor
    vq_module: Any
    vq_params: Any
    vgg_module: Any  # None unless diversity_coef
    vgg_params: Any
    eval_perceptor: Optional[Perceptor]


def _dtype_of(cfg: TrainConfig):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        str(cfg.get("compute_dtype", "bfloat16"))
    ]


def load_vqgan(cfg: TrainConfig, dtype):
    """Build the VQGAN and load weights: torch .ckpt -> converted; msgpack dir ->
    native; none -> random init (smoke/bench only)."""
    arch = vqgan_arch_config(cfg)
    vq = make_vqgan(arch, dtype=dtype)
    path = cfg.get("vqgan_checkpoint")
    if path and os.path.isdir(path):
        raw = ckpt_io.load_pytree(os.path.join(path, "params.msgpack"))["params"]
        params = {"params": _migrate_groupnorm_layout(raw)}
    elif path and os.path.exists(path):
        from feed_forward_vqgan_clip_tpu.io.torch_import import (
            convert_vqgan,
            load_torch_state_dict,
        )

        params = convert_vqgan(load_torch_state_dict(path), arch)
    else:
        log.warning("No VQGAN weights — random init (smoke/bench only).")
        z0 = jnp.zeros((1, 4, 4, arch["z_channels"]), jnp.float32)
        params = jax.jit(vq.init)(jax.random.PRNGKey(0), z0)
    return vq, params


def _migrate_groupnorm_layout(tree):
    """Flatten the pre-2024-08 nested {'GroupNorm_0': {scale, bias}} GroupNorm32
    layout to the current flat {scale, bias} (native msgpack dirs saved by older
    versions of this framework)."""
    if isinstance(tree, dict):
        if set(tree) == {"GroupNorm_0"}:
            return dict(tree["GroupNorm_0"])
        return {k: _migrate_groupnorm_layout(v) for k, v in tree.items()}
    return tree


def build_frozen(cfg: TrainConfig, dtype) -> FrozenModels:
    perceptor = load_perceptor(cfg.get("clip_model"), cfg.get("clip_model_path"), dtype=dtype)
    vq, vq_params = load_vqgan(cfg, dtype)
    vgg_module = vgg_params = None
    if cfg.get("diversity_coef"):
        from feed_forward_vqgan_clip_tpu.models.vgg import VGG16Features

        vgg_module = VGG16Features(dtype=dtype)
        vgg_path = cfg.get("vgg_path")
        if vgg_path and os.path.exists(vgg_path):
            from feed_forward_vqgan_clip_tpu.io.torch_import import (
                convert_vgg16,
                load_torch_state_dict,
            )

            vgg_params = convert_vgg16(load_torch_state_dict(vgg_path))
        else:
            log.warning("No VGG16 weights — random init (diversity loss untrained).")
            vgg_params = jax.jit(vgg_module.init)(
                jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3), jnp.float32)
            )
    eval_p = None
    if cfg.get("eval_path") and cfg.get("eval_clip_model"):
        eval_p = load_perceptor(
            cfg.get("eval_clip_model"), cfg.get("eval_clip_model_path"), dtype=dtype
        )
    return FrozenModels(perceptor, vq, vq_params, vgg_module, vgg_params, eval_p)


def _use_pallas_for(cfg, mesh):
    """Resolve (use_pallas, vq_data_mesh) for synth's Pallas VQ lookup.

    pallas_call has no GSPMD partitioning rule, so the multi-device story is
    per-axis (matches the warp/mapper stages, make_train_step's data_par note):
      * 'model' axis > 1 -> forced OFF. The kernel holds the whole codebook per
        grid step and cannot compute on model shards; XLA's lookup partitions
        the contraction natively.
      * 'data' axis > 1 (pure DP) -> stays ON, run under shard_map over 'data'
        (the search is batch-parallel with a replicated codebook) — the mesh is
        returned for synth's data_mesh argument.
      * single device -> cfg's use_pallas, no wrapping.
    """
    if mesh is None:
        return cfg.get("use_pallas"), None
    shape = dict(getattr(mesh, "shape", {}))
    if int(shape.get("model", 1) or 1) > 1:
        return False, None
    if int(shape.get("data", 1) or 1) > 1:
        return cfg.get("use_pallas"), mesh
    return cfg.get("use_pallas"), None


def make_train_step(
    cfg: TrainConfig,
    mapper,
    frozen: FrozenModels,
    make_cutouts: MakeCutouts,
    *,
    inp_is_tokens: bool,
    out_is_tokens: bool,
    same_io: bool = False,
    mesh=None,
):
    """Build the jitted train step. Static structure (loss terms, token-vs-feature
    dispatch, cutn/repeat) is baked in; all arrays flow as arguments."""
    repeat = int(cfg.get("repeat"))
    cutn = int(cfg.get("cutn"))
    clip_size, clip_dim = resolved_clip_geometry(cfg)
    noise_dim = int(cfg.get("noise_dim") or 0)
    normalize_input = bool(cfg.get("normalize_input"))
    input_loss = bool(cfg.get("input_loss"))
    input_loss_coef = float(cfg.get("input_loss_coef"))
    target_loss_coef = float(cfg.get("target_loss_coef"))
    l2_coef = float(cfg.get("l2_coef"))
    tv_coef = float(cfg.get("tv_coef"))
    diversity_coef = float(cfg.get("diversity_coef"))
    diversity_mode = str(cfg.get("diversity_mode"))
    mean = jnp.asarray(CLIP_MEAN).reshape(1, 1, 1, 3)
    std = jnp.asarray(CLIP_STD).reshape(1, 1, 1, 3)
    # cutout/augment stage dtype: follows compute_dtype unless overridden —
    # in bf16 the geometric warps run the single-pass Pallas kernel mode (3x
    # fewer MXU passes, half the window DMA; BENCH_NOTES.md round 3). The
    # images feed a bf16 CLIP tower either way, so stage precision matches
    # what the consumer already sees. aug_dtype="float32" restores f32 math.
    aug_dtype = jnp.dtype(cfg.get("aug_dtype") or _dtype_of(cfg))
    perceptor, vq = frozen.perceptor, frozen.vq_module
    # dropout==0 forwards route through the Pallas fused-block train path when
    # supported (custom_vjp backward kernels; FFVC_FUSED_TRAIN=0 reverts).
    from feed_forward_vqgan_clip_tpu.models.mappers.fused import (
        make_mapper_train_apply,
    )

    # Tensor parallelism ('model' axis > 1) forces the XLA module path: the
    # fused kernels hold WHOLE weight tensors per grid step and declare no
    # partitioning rule, so under TP they would force all-gathers of the
    # model-sharded FFN kernels (or fail to partition) instead of computing on
    # the shards — XLA's einsum path partitions the TP contraction natively.
    ms = cfg.get("mesh_shape")
    tp_active = isinstance(ms, dict) and int(ms.get("model", 1) or 1) > 1
    mapper_train_apply = make_mapper_train_apply(
        mapper, fused=False if tp_active else None
    )
    # CLIP image encode of the cutouts: dispatcher for the Pallas fused-MLP
    # tower (models/clip_fused.py). Default is the XLA module path — the
    # fused path measured SLOWER at train shapes (clip_fused.py docstring);
    # FFVC_FUSED_CLIP=1 opts in for A/B. TP keeps the module path like the
    # mapper (whole-weight kernels have no partitioning rule).
    from feed_forward_vqgan_clip_tpu.models.clip_fused import make_clip_image_apply

    clip_image_apply = make_clip_image_apply(
        perceptor.module, fused=False if tp_active else None
    )
    # ---- data-parallel cutout/augment stage. pallas_call has no GSPMD
    # partitioning rule: left inside a plain sharded jit on a pod, the warp
    # kernels would be computed on the gathered GLOBAL batch by every device.
    # With data > 1 the stage runs under shard_map instead — each device warps
    # only its local batch shard. The local (cutn*local_b) cutn-major output is
    # reshaped to (cutn, local_b) and recombined over dim 1, so the GLOBAL
    # cutn-major row order (and therefore the H/embed row pairing downstream)
    # is identical to the single-device path. Aug randomness folds in
    # axis_index('data') — per-shard independent draws, the reference's
    # per-Horovod-rank torch RNG semantics (not bitwise the 1-chip draw).
    data_par = mesh is not None and int(dict(getattr(mesh, "shape", {})).get("data", 1)) > 1
    # the Pallas VQ lookup inside synth has the same GSPMD blind spot as the
    # warps; under pure DP it stays on via shard_map over 'data' (vq_mesh),
    # under TP it falls back to XLA (~1.6 ms slower at B=64)
    use_pallas, vq_mesh = _use_pallas_for(cfg, mesh)
    if data_par and not tp_active:
        # same GSPMD blind spot as the warps: under pure DP, run the mapper
        # forward/backward per-shard (params replicated in, shard_map's
        # transpose psums the param cotangents across 'data' automatically)
        from jax.sharding import PartitionSpec as P

        _mapper_apply_local = mapper_train_apply

        def mapper_train_apply(params, xin):  # noqa: F811 - deliberate rebind
            # check_vma=False: the static varying-axes checker is conservative
            # about hand-written custom_vjp bwd rules (it demands their
            # cotangents carry matching vma tags); the computation here is
            # structurally batch-parallel with replicated params.
            return jax.shard_map(
                _mapper_apply_local, mesh=mesh,
                in_specs=(P(), P("data")), out_specs=P("data"),
                check_vma=False,
            )(params, xin)

        _clip_apply_local = clip_image_apply

        def clip_image_apply(cv, xin):  # noqa: F811 - deliberate rebind
            # the image encode is row-independent, so partitioning the
            # cutn-major crop rows over 'data' (a relayout of the cutout
            # output) computes the identical embeddings; frozen params are
            # replicated in, and their cotangents are zero (no psum needed —
            # value_and_grad never differentiates wrt fz)
            return jax.shard_map(
                _clip_apply_local, mesh=mesh,
                in_specs=(P(), P("data")), out_specs=P("data"),
                check_vma=False,
            )(cv, xin)

    def cut_stage(kc, xr):
        if not data_par:
            return make_cutouts(kc, xr)
        from jax.sharding import PartitionSpec as P

        cutn_local = make_cutouts.cutn

        def local(kc, xr_l):
            kl = jax.random.fold_in(kc, jax.lax.axis_index("data"))
            out = make_cutouts(kl, xr_l)
            return out.reshape(cutn_local, xr_l.shape[0], *out.shape[1:])

        out = jax.shard_map(
            local, mesh=mesh, in_specs=(P(), P("data")),
            out_specs=P(None, "data"), check_vma=False,
        )(kc, xr)
        return out.reshape(-1, *out.shape[2:])

    def loss_fn(params, fz, batch, key):
        z_lo, z_hi = latent_bounds(fz["vq"])
        inp, out = batch["inp"], batch["out"]
        bs = inp.shape[0]
        if inp_is_tokens:
            inp_feats = perceptor.module.apply(fz["clip"], inp, method=perceptor.module.encode_text)
        else:
            inp_feats = inp.astype(jnp.float32)
        # text-only datasets feed the SAME tokens as input and target
        # (TensorDataset(toks, toks), main.py:652-655); identical inputs give
        # identical embeddings, so run the text tower once. XLA cannot CSE
        # this itself — `inp` and `out` arrive as two distinct jit parameters.
        if same_io:
            out_feats = inp_feats
        elif out_is_tokens:
            out_feats = perceptor.module.apply(fz["clip"], out, method=perceptor.module.encode_text)
        else:
            out_feats = out.astype(jnp.float32)
        if normalize_input:
            inp_feats = normalize(inp_feats)

        # (repeat*bs, dim) tiling, repeat-major (main.py:739-740)
        inp_feats = jnp.tile(inp_feats, (repeat, 1))
        out_feats = jnp.tile(out_feats, (repeat, 1))
        if noise_dim:
            if "noise" in batch:  # fixed bank rows: (repeat, noise_dim)
                noise = jnp.repeat(batch["noise"], bs, axis=0)
            else:
                key, kn = jax.random.split(key)
                noise = jax.random.normal(kn, (repeat * bs, noise_dim))
            net_in = jnp.concatenate([inp_feats, noise.astype(inp_feats.dtype)], axis=1)
        else:
            net_in = inp_feats

        dropout = float(cfg.get("dropout") or 0.0)
        if dropout > 0:
            key, kd = jax.random.split(key)
            z = mapper.apply(
                params, net_in, deterministic=False, rngs={"dropout": kd}
            )
        else:
            z = mapper_train_apply(params, net_in)  # (repeat*bs, S, S, C)
        l2 = l2_loss(z) if l2_coef > 0 else jnp.float32(0.0)
        z = clamp_with_grad(z, z_lo, z_hi)
        xr = synth(vq, fz["vq"], z, use_pallas=use_pallas, data_mesh=vq_mesh)  # (repeat*bs, H, W, 3)
        xr = xr.astype(jnp.float32)

        tv = tv_loss(xr) if tv_coef > 0 else jnp.float32(0.0)

        if diversity_coef:
            feats = frozen.vgg_module.apply(fz["vgg"], (xr - mean) / std)
            div = diversity_loss(
                [f.astype(jnp.float32) for f in feats], repeat, bs, diversity_mode
            )
        else:
            div = jnp.float32(0.0)

        key, kc = jax.random.split(key)
        x = cut_stage(kc, xr.astype(aug_dtype))  # (cutn*repeat*bs, h, w, 3)
        x = (x - mean.astype(aug_dtype)) / std.astype(aug_dtype)
        embed = clip_image_apply(fz["clip"], x)
        embed = normalize(embed.astype(jnp.float32))

        H = normalize(jnp.tile(out_feats, (cutn, 1)))  # (cutn*repeat*bs, dim)
        dists = target_loss_coef * spherical_dist_loss(H, embed)
        if input_loss:
            Hi = normalize(jnp.tile(inp_feats, (cutn, 1)))
            dists = dists + input_loss_coef * spherical_dist_loss(Hi, embed)

        loss = dists - diversity_coef * div + l2_coef * l2 + tv_coef * tv
        return loss, {"loss": loss, "dists": dists, "diversity": div, "l2": l2, "tv": tv}

    def _step_body(state: TrainState, fz, batch, key):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, fz, batch, key
        )
        state = state.apply_gradients(grads)
        # per-step loss EMA on device (main.py:861) — no host sync needed
        state = state.replace(
            avg_loss=metrics["loss"] * 0.01 + state.avg_loss * 0.99
        )
        return state, metrics

    train_step = functools.partial(jax.jit, donate_argnums=(0,))(_step_body)
    # un-jitted body for callers that need to compose steps inside one jit
    # (bench.py's scan-chained train timing — the axon tunnel's per-dispatch
    # overhead stays out of the measurement that way)
    train_step.body = _step_body
    return train_step, loss_fn


def make_render_fn(cfg: TrainConfig, mapper, frozen: FrozenModels, mesh=None):
    """images for previews: params, features(+noise) -> synth output (no cutouts)."""
    use_pallas, vq_mesh = _use_pallas_for(cfg, mesh)

    @jax.jit
    def render(params, fz, net_in):
        z_lo, z_hi = latent_bounds(fz["vq"])
        z = mapper.apply(params, net_in)
        z = clamp_with_grad(z, z_lo, z_hi)
        return synth(
            frozen.vq_module, fz["vq"], z, use_pallas=use_pallas, data_mesh=vq_mesh
        ).astype(jnp.float32)

    return render


def make_eval_step(cfg: TrainConfig, mapper, frozen: FrozenModels, eval_p: Perceptor,
                   mesh=None):
    """In-train eval (main.py:866-896): no-cutout pass, bilinear resize to
    clip_size, CLIP score with the eval perceptor's logit scale."""
    clip_size = eval_p.size
    use_pallas, vq_mesh = _use_pallas_for(cfg, mesh)

    @jax.jit
    def eval_step(params, fz, eval_fz, feats):
        z_lo, z_hi = latent_bounds(fz["vq"])
        z = mapper.apply(params, feats)
        z = clamp_with_grad(z, z_lo, z_hi)
        xr = synth(
            frozen.vq_module, fz["vq"], z, use_pallas=use_pallas, data_mesh=vq_mesh
        ).astype(jnp.float32)
        xr = jax.image.resize(
            xr, (xr.shape[0], clip_size, clip_size, 3), "bilinear"
        )
        mean = jnp.asarray(CLIP_MEAN).reshape(1, 1, 1, 3)
        std = jnp.asarray(CLIP_STD).reshape(1, 1, 1, 3)
        embed = eval_p.module.apply(
            eval_fz, (xr - mean) / std, method=eval_p.module.encode_image
        )
        embed = normalize(embed.astype(jnp.float32))
        H = normalize(feats[:, : embed.shape[1]].astype(jnp.float32))
        dists = spherical_dist(H, embed)
        scale = jnp.exp(eval_fz["params"]["logit_scale"])
        scores = scale * jnp.sum(H * embed, axis=1)
        return dists, scores

    return eval_step


def train(cfg: TrainConfig):  # noqa: C901 - mirrors the reference's one trainer fn
    dtype = _dtype_of(cfg)
    folder = cfg.get("folder") or "."
    os.makedirs(folder, exist_ok=True)
    seed = int(cfg.get("seed") or 0)
    root_key = jax.random.PRNGKey(seed)

    mesh = meshlib.make_mesh(cfg.get("mesh_shape"))
    primary = meshlib.is_primary()

    # ---- data
    data = load_dataset(cfg.get("path"))
    if isinstance(data, tuple):
        inp_all, out_all = np.asarray(data[0]), np.asarray(data[1])
    else:
        inp_all = out_all = np.asarray(data)
    inp_is_tokens = np.issubdtype(inp_all.dtype, np.integer)
    out_is_tokens = np.issubdtype(out_all.dtype, np.integer)
    same_io = inp_all is out_all  # text-only dataset: one text encode per step
    n_local = len(shard_for_process(len(inp_all), jax.process_index(), jax.process_count()))
    log.info("Number of examples: %d (%d local)", len(inp_all), n_local)

    # ---- frozen models + mapper
    frozen = build_frozen(cfg, dtype)
    clip_size, clip_dim = resolved_clip_geometry(cfg)
    arch = vqgan_arch_config(cfg)
    mapper = build_mapper(dict(cfg), vq_channels=int(arch["z_channels"]), dtype=dtype)

    noise_dim = int(cfg.get("noise_dim") or 0)
    nb_noise = cfg.get("nb_noise")
    sample_dim = clip_dim + noise_dim
    init_key, noise_key, root_key = jax.random.split(root_key, 3)

    epoch0, step = 0, 0
    noise_bank = None
    ema_params = None
    if ckpt_io.checkpoint_exists(folder):
        params, _cfg_saved, step, epoch0, noise_bank = ckpt_io.load_checkpoint(
            os.path.join(folder, "checkpoint")
        )
        log.info("Resuming model from %s (step %d, epoch %d)", folder, step, epoch0)
        if ckpt_io.checkpoint_exists(folder, "checkpoint_ema"):
            ema_params, *_ = ckpt_io.load_checkpoint(os.path.join(folder, "checkpoint_ema"))
    else:
        params = jax.jit(mapper.init)(
            init_key, jnp.zeros((1, sample_dim), jnp.float32)
        )

    if noise_dim and nb_noise and noise_bank is None:
        # fixed noise bank, replicated (replaces hvd.broadcast of NOISE, main.py:680-687)
        noise_bank = np.asarray(jax.random.normal(noise_key, (int(nb_noise), noise_dim)))

    tx = make_optimizer(
        float(cfg.get("lr")),
        scheduler=cfg.get("scheduler"),
        max_steps=cfg.get("max_steps"),
        clip_grad_norm=cfg.get("clip_grad_norm"),
        opt_dtype=cfg.get("opt_dtype"),
    )

    # ---- placement: params FIRST (TP rule over 'model' for mixer FFNs, else
    # replicated), so optimizer/EMA state initialized from them inherits the
    # same shardings leaf by leaf.
    with mesh:
        param_shards = meshlib.mixer_param_sharding(mesh, params)
        params = jax.tree.map(jax.device_put, params, param_shards)
        if ema_params is not None:
            ema_params = jax.tree.map(jax.device_put, ema_params, param_shards)
        state = make_train_state(
            params, tx,
            use_ema=bool(cfg.get("use_ema")), ema_decay=float(cfg.get("ema_decay")),
            ema_warmup=bool(cfg.get("ema_warmup", True)),
            step=step, ema_params=ema_params,
        )
        # optimizer counters / fresh scalars are not params-derived -> replicate
        state = meshlib.ensure_on_mesh(mesh, state)
        opt_path = os.path.join(folder, "opt", "state.msgpack")
        if os.path.exists(opt_path):
            log.info("Resuming optimizer state from %s", opt_path)
            loaded = ckpt_io.load_pytree(opt_path, like=state.opt_state)
            placed = jax.tree.map(
                lambda tmpl, v: jax.device_put(v, tmpl.sharding), state.opt_state, loaded
            )
            state = state.replace(opt_state=placed)
        fz: Dict[str, Any] = {"clip": frozen.perceptor.params, "vq": frozen.vq_params}
        if frozen.vgg_params is not None:
            fz["vgg"] = frozen.vgg_params
        fz = meshlib.replicate(mesh, fz)

    make_cutouts = MakeCutouts(
        cut_size=int(cfg.get("cut_size") or clip_size),
        cutn=int(cfg.get("cutn")),
        augs=cfg.get("augs"),
        pool=bool(cfg.get("pool", True)),
        pool_size=int(cfg.get("pool_size") or clip_size),
        interpolate=bool(cfg.get("interpolate")),
        interp_size=int(cfg.get("interp_size") or clip_size),
        noise_fac=float(cfg.get("noise_fac")),
        fuse_geometric=bool(cfg.get("fuse_geometric")),
    )
    train_step, _ = make_train_step(
        cfg, mapper, frozen, make_cutouts,
        inp_is_tokens=inp_is_tokens, out_is_tokens=out_is_tokens,
        same_io=same_io, mesh=mesh,
    )
    render = make_render_fn(cfg, mapper, frozen, mesh=mesh)

    eval_data = None
    if cfg.get("eval_path"):
        eval_data = load_dataset(cfg.get("eval_path"))
        eval_p = frozen.eval_perceptor or frozen.perceptor
        eval_step = make_eval_step(cfg, mapper, frozen, eval_p, mesh=mesh)
        eval_fz = meshlib.replicate(mesh, eval_p.params)

    writer = None
    if primary:
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(folder)
        except Exception as e:  # pragma: no cover
            log.warning("TensorBoard writer unavailable: %s", e)
    use_wandb = bool(cfg.get("use_wandb"))
    wandb_run = None
    if use_wandb and primary:
        try:
            import wandb

            wandb_run = wandb.init(
                project=cfg.get("wandb_project"), entity=cfg.get("wandb_entity"),
                resume=False, config=dict(cfg),
            )
        except Exception as e:  # pragma: no cover
            log.warning("wandb unavailable: %s", e)
            use_wandb = False

    bs = int(cfg.get("batch_size"))  # GLOBAL batch across all processes
    repeat = int(cfg.get("repeat"))
    log_interval = int(cfg.get("log_interval"))
    max_steps = cfg.get("max_steps")
    epochs = int(cfg.get("epochs"))
    # per-epoch GLOBAL reshuffle + strided split (DistributedSampler parity,
    # main.py:669-673, 713-714) — each host sees a different subset each epoch
    n_examples = len(inp_all)

    def _epoch_ids(epoch):
        return epoch_shard_batches(
            n_examples,
            bs_local,
            seed=seed,
            epoch=epoch,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            drop_last=False,
        )
    # noise rows must be IDENTICAL on every process (replicated placement; the
    # reference broadcasts the bank + rank-0-identical np.random draws). The
    # draw is keyed on (seed, step) rather than a sequential host rng so an
    # interrupted+resumed run sees the SAME row sequence as an uninterrupted
    # one — a conscious fix of the reference's unseeded np.random.permutation
    # (main.py:689-694), like the prior-shard shuffle fix (PARITY.md).

    n_data = mesh.shape["data"]
    n_proc = jax.process_count()
    if bs % n_data != 0 or bs % n_proc != 0:
        raise ValueError(
            f"batch_size={bs} (global) must be divisible by the data mesh axis "
            f"({n_data}) and the process count ({n_proc}) — static shard shapes "
            f"are a TPU requirement"
        )
    bs_local = bs // n_proc
    data_sharding = meshlib.data_sharding(mesh)

    def _global_batch(local_rows: np.ndarray):
        """Assemble the globally-sharded batch from this process's rows."""
        if n_proc == 1:
            return jax.device_put(local_rows, data_sharding)
        return jax.make_array_from_process_local_data(data_sharding, local_rows)

    def batch_for(ids, step_):
        b_inp = _global_batch(inp_all[ids])
        b = {
            "inp": b_inp,
            # same_io: ship the rows once (loss_fn ignores "out" then anyway)
            "out": b_inp if same_io else _global_batch(out_all[ids]),
        }
        if noise_dim and nb_noise is not None and noise_bank is not None:
            rows = np.random.default_rng((seed, step_)).permutation(
                len(noise_bank)
            )[:repeat]
            b["noise"] = jax.device_put(noise_bank[rows], meshlib.replicated(mesh))
        return b

    first_ids = _epoch_ids(epoch0)[0]
    # pinned first batch for fixed previews (main.py:676-679), assembled ONCE as
    # a global array so the preview render stays SPMD-consistent on a pod
    with mesh:
        fixed_inp_global = _global_batch(inp_all[first_ids])
    decode_tokens = _make_token_decoder() if inp_is_tokens else None

    # Profiling (framework extra — the reference has no tracing at all,
    # SURVEY.md §5): capture a jax.profiler trace of steps [10, 15).
    profile_dir = cfg.get("profile_dir")
    profile_window = (10, 15) if profile_dir else None

    # per-step scalar buffer: the reference writes every step's scalars to TB
    # (main.py:845-850) and wandb every wandb_log_interval (main.py:851-860).
    # We keep per-step metrics as DEVICE scalars (no host sync in the hot loop)
    # and flush the whole window with one stacked fetch at log_interval.
    wandb_log_interval = int(cfg.get("wandb_log_interval") or 1)
    pending: list = []  # [(step, metrics_dict_of_device_scalars)]

    def _flush_scalars():
        if not pending:
            return {}
        steps_ = [s for s, _ in pending]
        stacked = {
            k: np.asarray(jnp.stack([m[k] for _, m in pending]), np.float32)
            for k in pending[0][1]
        }
        if primary and writer:
            for i, s in enumerate(steps_):
                for k, vals in stacked.items():
                    writer.add_scalar(k, float(vals[i]), s)
        if primary and use_wandb and wandb_run:
            for i, s in enumerate(steps_):
                if s % wandb_log_interval == 0 and s != steps_[-1]:
                    wandb_run.log(
                        {k: float(vals[i]) for k, vals in stacked.items()}, step=s
                    )
        last = {k: float(vals[-1]) for k, vals in stacked.items()}
        pending.clear()
        return last

    t_start = time.time()
    saver = _AsyncSaver()  # background checkpoint writer (one write in flight)
    with mesh:
        for epoch in range(epoch0, epochs):
            epoch_batches = _epoch_ids(epoch)
            # `step` counts completed steps globally and every epoch yields the
            # same batch count, so on resume skip the batches this epoch already
            # consumed before the checkpoint — the resumed run replays the
            # uninterrupted data sequence exactly (the reference instead
            # restarts the saved epoch from batch 0, main.py:713-716)
            done_here = step - epoch * len(epoch_batches)
            for ids in epoch_batches[max(done_here, 0):]:
                if profile_window and step == profile_window[0] and primary:
                    jax.profiler.start_trace(profile_dir)
                batch = batch_for(ids, step)
                step_key = jax.random.fold_in(root_key, step)
                state, metrics = train_step(state, fz, batch, step_key)
                pending.append((step, metrics))
                if profile_window and step == profile_window[1] and primary:
                    jax.tree.map(lambda a: a.block_until_ready(), metrics)
                    jax.profiler.stop_trace()
                    log.info("Wrote profiler trace to %s", profile_dir)

                # log steps run on EVERY process — previews/eval/ckpt contain
                # collectives (host_array gathers); file/TB/stdout writes are
                # primary-gated inside.
                if step % log_interval == 0:
                    m = _flush_scalars()
                    avg_loss = float(state.avg_loss)  # device-side EMA, per-step
                    if primary:
                        print(
                            f"epoch:{epoch:03d}, step:{step:05d}, avg_loss:{avg_loss:.3f}, "
                            f"loss:{m['loss']:.3f}, dists:{m['dists']:.3f}, "
                            f"div:{m['diversity']:.3f}, l2:{m['l2']:.3f} tv:{m['tv']}",
                            flush=True,
                        )
                    _log_step_artifacts(
                        cfg, folder, mapper, frozen, state, fz, batch, render,
                        step, epoch, noise_bank, decode_tokens, writer,
                        fixed_inp_global, noise_dim, clip_dim,
                        inp_is_tokens, primary, saver,
                    )
                    if eval_data is not None:
                        ed, es = _run_eval(
                            eval_step, state.params, fz, eval_fz, eval_data,
                            frozen, bs, noise_dim, mesh,
                        )
                        if primary:
                            print(f"Eval dists: {ed:.3f}\nEval clip score: {es:.3f}", flush=True)
                            if writer:
                                writer.add_scalar("eval_dists", ed, step)
                                writer.add_scalar("eval_clip_score", es, step)
                    if primary and use_wandb and wandb_run:
                        payload = dict(m, avg_loss=avg_loss)
                        try:  # image panels (main.py:951-966)
                            import wandb as _wandb

                            payload["image"] = [
                                _wandb.Image(os.path.join(folder, "progress.png"))
                            ]
                            payload["image_fixed"] = [
                                _wandb.Image(
                                    os.path.join(folder, "fixed_batch_progress.png")
                                )
                            ]
                        except Exception:  # pragma: no cover
                            pass
                        wandb_run.log(payload, step=step)

                step += 1
                if max_steps is not None and step >= int(max_steps):
                    _flush_scalars()
                    _save_all(folder, cfg, state, step, epoch, noise_bank, primary,
                              saver=saver)
                    saver.wait()  # files complete before returning
                    log.info(
                        "Reached max_steps=%s in %.1fs", max_steps, time.time() - t_start
                    )
                    return state
    _flush_scalars()
    _save_all(folder, cfg, state, step, max(epochs - 1, epoch0), noise_bank, primary,
              saver=saver)
    saver.wait()
    return state


def _make_token_decoder():
    try:
        from feed_forward_vqgan_clip_tpu.tokenizer.bpe import get_tokenizer

        return get_tokenizer().decode
    except FileNotFoundError:
        return None


class _AsyncSaver:
    """Single-slot background checkpoint writer: at most one write in flight;
    submit() joins the previous write first (ordering) and re-raises any write
    error (disk-full is never silent). wait() must run before the train loop
    returns so files are complete on exit."""

    def __init__(self):
        self._t = None
        self._err = None

    def submit(self, fn):
        import threading

        self.wait()

        def run():
            try:
                fn()
            except BaseException as e:  # surfaced at the next submit/wait
                self._err = e

        self._t = threading.Thread(target=run, daemon=True, name="ffvc-ckpt-writer")
        self._t.start()

    def wait(self):
        if self._t is not None:
            self._t.join()
            self._t = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err


def _save_all(folder, cfg, state, step, epoch, noise_bank, primary=True, saver=None):
    """Checkpoint params/EMA/opt. COLLECTIVE on a pod: host_tree allgathers any
    model-axis-sharded leaves, so every process must reach this call; only the
    primary writes files. The device->host gather is synchronous (numpy copies,
    so no donated-buffer hazard); with `saver` the file writes (msgpack
    serialize + disk IO, the slow part at flagship scale) run on a background
    thread instead of stalling the step loop.

    The persisted step counter is state.step — the number of COMPLETED updates
    in the saved params — not the caller's step label (which at log-interval
    saves is one behind): resume must not re-apply an already-applied step."""
    step = int(state.step)
    params = meshlib.host_tree(state.params)
    ema = meshlib.host_tree(state.ema_params) if state.ema_params is not None else None
    opt = meshlib.host_tree(state.opt_state)
    if not primary:
        return

    def write():
        ckpt_io.save_checkpoint(folder, "checkpoint", params, cfg, step, epoch, noise_bank)
        if ema is not None:
            ckpt_io.save_checkpoint(folder, "checkpoint_ema", ema, cfg, step, epoch, noise_bank)
        os.makedirs(os.path.join(folder, "opt"), exist_ok=True)
        ckpt_io.save_pytree(os.path.join(folder, "opt", "state.msgpack"), opt)

    if saver is not None:
        saver.submit(write)
    else:
        write()


def _log_step_artifacts(
    cfg, folder, mapper, frozen, state, fz, batch, render, step, epoch,
    noise_bank, decode_tokens, writer, fixed_inp_global,
    noise_dim, clip_dim, inp_is_tokens, primary, saver=None,
):
    """progress grids + prompt sidecars + checkpoints (main.py:899-949).

    COLLECTIVE on a pod: renders run SPMD over the globally-sharded batch on all
    processes and outputs come back through host_array allgathers (np.asarray on
    a globally-sharded array would throw 'non-addressable' on a real pod); file
    writes are primary-gated.
    """
    bs = int(cfg.get("batch_size"))
    repeat = int(cfg.get("repeat"))
    # re-render current batch through the no-cutout path
    net_in = _features_for(frozen, fz, batch["inp"], inp_is_tokens, cfg)
    net_in = jnp.tile(net_in, (repeat, 1))
    if noise_dim:
        noise = (
            jnp.repeat(jnp.asarray(batch["noise"]), net_in.shape[0] // batch["noise"].shape[0], axis=0)
            if "noise" in batch
            else jax.random.normal(jax.random.PRNGKey(step), (net_in.shape[0], noise_dim))
        )
        net_in = jnp.concatenate([net_in, noise.astype(net_in.dtype)], axis=1)
    xr = meshlib.host_array(render(state.params, fz, net_in))
    if primary:
        save_grid(xr, os.path.join(folder, "progress.png"), nrow=bs)
        save_grid(xr, os.path.join(folder, f"progress_{step:010d}.png"), nrow=bs)

    if inp_is_tokens and decode_tokens is not None:
        toks = meshlib.host_array(batch["inp"])
        if primary:
            text = "\n".join(decode_tokens(t) for t in toks)
            for name in ("progress.txt", f"progress_{step:010d}.txt"):
                with open(os.path.join(folder, name), "w") as fd:
                    fd.write(text)

    _save_all(folder, cfg, state, step, epoch, noise_bank, primary, saver=saver)

    # fixed-batch preview with EMA params when enabled (main.py:920-949)
    net_in = _features_for(frozen, fz, fixed_inp_global, inp_is_tokens, cfg)
    if noise_dim:
        nz = (
            jnp.asarray(noise_bank[: net_in.shape[0]])
            if noise_bank is not None and len(noise_bank) >= net_in.shape[0]
            else jax.random.normal(jax.random.PRNGKey(0), (net_in.shape[0], noise_dim))
        )
        net_in = jnp.concatenate([net_in, nz.astype(net_in.dtype)], axis=1)
    preview_params = state.ema_params if state.ema_params is not None else state.params
    xf = meshlib.host_array(render(preview_params, fz, net_in))
    if primary:
        save_grid(xf, os.path.join(folder, "fixed_batch_progress.png"), nrow=bs)
        save_grid(xf, os.path.join(folder, f"fixed_batch_progress_{step:010d}.png"), nrow=bs)
    if step == 0 and inp_is_tokens and decode_tokens is not None:
        fixed_toks = meshlib.host_array(fixed_inp_global)
        if primary:
            with open(os.path.join(folder, "fixed_batch.txt"), "w") as fd:
                fd.write("\n".join(decode_tokens(t) for t in fixed_toks))


def _features_for(frozen, fz, inp, inp_is_tokens, cfg):
    p = frozen.perceptor
    if inp_is_tokens:
        feats = p.module.apply(fz["clip"], jnp.asarray(inp), method=p.module.encode_text)
    else:
        feats = jnp.asarray(inp, jnp.float32)
    if cfg.get("normalize_input"):
        feats = normalize(feats)
    return feats.astype(jnp.float32)


def _run_eval(eval_step, params, fz, eval_fz, eval_data, frozen, bs, noise_dim, mesh):
    data = np.asarray(eval_data if not isinstance(eval_data, tuple) else eval_data[0])
    dists_all, scores_all = [], []
    for i in range(0, len(data), bs):
        chunk = data[i : i + bs]
        valid = len(chunk)
        if valid < bs:
            # pad by wraparound to keep the compiled shape; slice valid rows after
            chunk = np.resize(np.concatenate([chunk, data]), (bs,) + data.shape[1:])
        if np.issubdtype(chunk.dtype, np.integer):
            p = frozen.eval_perceptor or frozen.perceptor
            feats = p.module.apply(eval_fz, jnp.asarray(chunk), method=p.module.encode_text)
        else:
            feats = jnp.asarray(chunk, jnp.float32)
        if noise_dim:
            feats = jnp.concatenate(
                [feats, jnp.zeros((len(feats), noise_dim), feats.dtype)], axis=1
            )
        d, s = eval_step(params, fz, eval_fz, feats)
        dists_all.append(np.asarray(d)[:valid])
        scores_all.append(np.asarray(s)[:valid])
    return float(np.concatenate(dists_all).mean()), float(np.concatenate(scores_all).mean())
