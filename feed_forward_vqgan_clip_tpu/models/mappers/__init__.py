"""Mapper factory — parity with the reference's `build_model` (/root/reference/main.py:448-502)."""

from typing import Any, Optional

import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.models.mappers.mixer import Mixer  # noqa: F401
from feed_forward_vqgan_clip_tpu.models.mappers.vitgan import (  # noqa: F401
    Discriminator,
    Generator,
    SimpleGenerator,
    SineLayer,
    init_discriminator_spectral_norms,
)
from feed_forward_vqgan_clip_tpu.models.mappers.xtransformer import XTransformer  # noqa: F401
from feed_forward_vqgan_clip_tpu.registry import CLIP_DIM


def build_mapper(config: dict, *, vq_channels: int = 256, dtype: Any = jnp.float32):
    """config: the training yaml dict (same knobs as the reference's).

    input dim = clip_dim + noise_dim; out channels = VQGAN z_channels;
    vq_image_size defaults to 16 (main.py:456).
    """
    clip_model = config["clip_model"]
    clip_dim = int(config.get("clip_dim") or CLIP_DIM.get(clip_model, 512))
    noise_dim = int(config.get("noise_dim") or 0)
    vq_image_size = int(config.get("vq_image_size") or 16)
    input_dim = clip_dim + noise_dim
    model_type = config["model_type"]
    dim = int(config["dim"])
    depth = int(config["depth"])
    dropout = float(config.get("dropout") or 0.0)
    num_heads = int(config.get("num_heads") or 6)

    if model_type == "vitgan":
        return Generator(
            initialize_size=vq_image_size // 8,
            input_dim=input_dim,
            dim=dim,
            blocks=depth,
            num_heads=num_heads,
            dropout=dropout,
            out_channels=vq_channels,
            dtype=dtype,
        )
    if model_type == "simple_vitgan":
        return SimpleGenerator(
            size=vq_image_size,
            input_dim=input_dim,
            dim=dim,
            blocks=depth,
            num_heads=num_heads,
            dropout=dropout,
            out_channels=vq_channels,
            dtype=dtype,
        )
    if model_type == "mlp_mixer":
        return Mixer(
            input_dim=input_dim,
            image_size=vq_image_size,
            channels=vq_channels,
            dim=dim,
            depth=depth,
            dropout=dropout,
            dtype=dtype,
        )
    if model_type == "xtransformer":
        return XTransformer(
            input_dim=input_dim,
            image_size=vq_image_size,
            channels=vq_channels,
            dim=dim,
            depth=depth,
            heads=num_heads,
            initial_proj=bool(config.get("initial_proj", True)),
            add_input=bool(config.get("add_input", False)),
            dropout=dropout,
            dtype=dtype,
        )
    raise ValueError(
        "model_type should be 'vitgan', 'simple_vitgan', 'mlp_mixer' or 'xtransformer'"
    )
