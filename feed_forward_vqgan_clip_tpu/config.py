"""Training configuration: the reference's full yaml knob surface.

OmegaConf is replaced by plain yaml + a defaulting dict (the reference reads ~40
knobs via config.get(key, default) scattered through `train`, main.py:504-709;
SURVEY.md §5 lists them). `TrainConfig.get` keeps the same access pattern so configs
written for the reference parse unchanged.
"""

import os
from typing import Any, Dict, Optional

import yaml

# knob -> default, from the reference's config.get(...) sites (main.py:504-709)
DEFAULTS: Dict[str, Any] = {
    "lr": 0.001,
    "epochs": 200,
    "max_steps": None,
    "batch_size": 8,
    "repeat": 1,
    "cutn": 8,
    "cut_size": None,  # defaults to clip_size (main.py:634)
    "augs": None,  # defaults to ('Af','Pe','Ji','Er') (main.py:165)
    "pool": True,
    "pool_size": None,  # defaults to clip_size (main.py:641)
    "interpolate": False,
    "interp_size": None,
    "noise_dim": 0,
    "nb_noise": None,
    "model_type": "mlp_mixer",
    "dim": 128,
    "depth": 8,
    "num_heads": 6,
    "dropout": 0.0,
    "initial_proj": True,
    "add_input": False,
    "vq_image_size": 16,
    "vqgan_config": None,
    "vqgan_checkpoint": None,
    "vqgan_model": "vqgan_imagenet_f16_16384",  # registry preset when no yaml given
    "clip_model": "ViT-B/32",
    "clip_model_path": None,
    "clip_size": None,
    "clip_dim": None,
    "path": None,
    "eval_path": None,
    "eval_clip_model": None,
    "eval_clip_model_path": None,  # weights for the eval perceptor (framework extra)
    "folder": None,
    "log_interval": 100,
    "diversity_coef": 0.0,
    "diversity_mode": "between_same_prompts",
    "input_loss": False,
    "input_loss_coef": 1.0,
    "target_loss_coef": 1.0,
    "l2_coef": 0.0,
    "tv_coef": 0.0,
    # tv_exponent is read by the reference but never used (main.py:699) — kept for
    # config compatibility, deliberately unused here too.
    "tv_exponent": 1.0,
    "clip_grad_norm": None,
    "scheduler": None,
    "normalize_input": False,
    "use_ema": False,
    "ema_decay": 0.995,
    # torch_ema's default use_num_updates=True warmup ramp, on in the reference
    # (main.py:520-525): decay_t = min(ema_decay, (1+n)/(10+n)). False pins the
    # fixed decay from step 0 (framework extension).
    "ema_warmup": True,
    "use_wandb": False,
    "wandb_project": "feed_forward_vqgan_clip",
    "wandb_entity": None,
    "wandb_log_interval": 1,
    # TPU-framework extensions (absent from the reference)
    "vgg_path": None,  # VGG16 weights for the diversity loss (torch or msgpack)
    "noise_fac": 0.1,  # cutout additive-noise factor (hardcoded 0.1 in the reference, main.py:202)
    "fuse_geometric": False,  # compose Af+Pe into one resample (numerically
    # deviating, opt-in; largely obsolete — the Pallas warp kernels make the
    # exact default chain faster than this path was, see BENCH_NOTES.md)
    "vqgan_arch": None,  # inline ddconfig-style dict (smoke configs)
    "compute_dtype": "bfloat16",
    "opt_dtype": "bfloat16",  # Adam moment storage. Default bf16: halves
    # optimizer HBM footprint + per-step traffic (f32 math, bf16-stored mu AND
    # nu — train/state._scale_by_adam_cast_state); measured -4 ms/step at the
    # flagship geometry and training-equivalent to f32 moments over 300
    # same-seed steps (final loss gap 0.0006, eval dists within noise —
    # benchmarks/aug_dtype_equivalence.py, BENCH_NOTES.md round 4).
    # "float32" restores the reference's torch.Adam moment numerics — also
    # required to RESUME optimizer state saved by a float32-moment run (the
    # two chains serialize different opt-state structures).
    "aug_dtype": None,  # cutout/augment stage dtype: None = follow compute_dtype
    # (bf16 warps run the single-pass Pallas kernels — 3x fewer MXU passes);
    # "float32" restores the f32 aug math whatever compute_dtype says
    "seed": 0,
    "mesh_shape": None,  # e.g. {"data": 8} or {"data": 4, "model": 2}
    "use_pallas": "auto",
    "fused_mixer": None,  # Pallas fused mixer blocks for inference: None=auto (TPU only)
    "profile_dir": None,
}


class TrainConfig(dict):
    """dict with reference-style .get defaulting and attribute access."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def get(self, key, default=None):
        if key in self:
            return super().get(key)
        if default is not None:
            return default
        return DEFAULTS.get(key, default)


def load_config(path: str) -> TrainConfig:
    with open(path) as fd:
        raw = yaml.safe_load(fd) or {}
    cfg = TrainConfig(DEFAULTS)
    cfg.update(raw)
    if not cfg.get("folder"):
        # reference defaults the run folder to the config's directory (main.py:507-508)
        cfg["folder"] = os.path.dirname(os.path.abspath(path))
    return cfg


def make_config(**overrides) -> TrainConfig:
    cfg = TrainConfig(DEFAULTS)
    cfg.update(overrides)
    return cfg


def resolved_clip_geometry(cfg: TrainConfig):
    """(clip_size, clip_dim) honoring explicit overrides (main.py:553-554)."""
    from feed_forward_vqgan_clip_tpu.registry import CLIP_DIM, CLIP_SIZE

    clip_model = cfg.get("clip_model")
    size = cfg.get("clip_size") or CLIP_SIZE.get(clip_model)
    dim = cfg.get("clip_dim") or CLIP_DIM.get(clip_model)
    return size, dim


def vqgan_arch_config(cfg: TrainConfig) -> dict:
    """Resolve the VQGAN architecture dict: taming yaml if provided, else preset."""
    from feed_forward_vqgan_clip_tpu.registry import VQGAN_CONFIGS

    inline = cfg.get("vqgan_arch")
    if isinstance(inline, dict):  # framework extra: inline arch (smoke configs)
        base = dict(VQGAN_CONFIGS["vqgan_imagenet_f16_16384"])
        base.update(inline)
        base["ch_mult"] = tuple(base["ch_mult"])
        base["attn_resolutions"] = tuple(base["attn_resolutions"])
        return base

    yaml_path: Optional[str] = cfg.get("vqgan_config")
    if yaml_path and os.path.exists(yaml_path):
        with open(yaml_path) as fd:
            taming = yaml.safe_load(fd)
        p = taming["model"]["params"]
        if "first_stage_config" in p:
            # Net2NetTransformer yaml: the VQGAN lives in first_stage_config
            # (reference main.py:95-99 takes .first_stage_model)
            p = p["first_stage_config"]["params"]
        dd = p["ddconfig"]
        return dict(
            n_embed=p["n_embed"], embed_dim=p["embed_dim"],
            z_channels=dd["z_channels"], resolution=dd["resolution"],
            in_channels=dd.get("in_channels", 3), out_ch=dd.get("out_ch", 3),
            ch=dd.get("ch", 128), ch_mult=tuple(dd.get("ch_mult", (1, 1, 2, 2, 4))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            attn_resolutions=tuple(dd.get("attn_resolutions", (16,))),
            dropout=dd.get("dropout", 0.0),
        )
    return dict(VQGAN_CONFIGS[cfg.get("vqgan_model") or "vqgan_imagenet_f16_16384"])
