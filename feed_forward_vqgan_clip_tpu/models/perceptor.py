"""Perceptor (CLIP-family) backend mux.

Parity with `load_clip_model` (/root/reference/main.py:1308-1333): dispatch by name
to OpenAI CLIP ViT/RN, OpenCLIP tags, or CLOOB variants; always frozen. Returns the
module + converted params + the frozen-model surface the trainer consumes.

Weight sources (zero-egress aware): a torch checkpoint path (converted on load), a
native msgpack checkpoint dir, or — for smoke/bench runs only — random init with a
loud warning.
"""

import logging
import os
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from feed_forward_vqgan_clip_tpu.registry import CLIP_DIM, CLIP_SIZE

log = logging.getLogger(__name__)


class Perceptor(NamedTuple):
    module: Any
    params: Any
    name: str
    size: int
    dim: int

    def encode_text(self, tokens):
        return self.module.apply(self.params, tokens, method=self.module.encode_text)

    def encode_image(self, images):
        return self.module.apply(self.params, images, method=self.module.encode_image)

    @property
    def logit_scale(self):
        return jnp.exp(self.params["params"]["logit_scale"])


def _load_openclip(name: str, path: Optional[str], dtype) -> Perceptor:
    """`openclip/<arch>/<pretrained>` names (reference main.py:1323-1329 hands
    these to open_clip, which knows every arch by name): RN archs route to the
    ModifiedResNet towers, known ViT archs to the registry configs, and any
    other arch is constructed from the checkpoint's own shapes when a path is
    given (io/torch_import.sniff_clip_arch)."""
    from feed_forward_vqgan_clip_tpu.models.clip_resnet import load_clip_resnet
    from feed_forward_vqgan_clip_tpu.models.clip_vit import (
        make_clip_from_config,
        openclip_vit_canonical,
    )
    from feed_forward_vqgan_clip_tpu.registry import (
        CLIP_RESNET_CONFIGS,
        CLIP_VIT_CONFIGS,
    )

    parts = name.split("/")
    if len(parts) < 3:
        raise ValueError(
            f"openclip perceptor name {name!r} must look like "
            "'openclip/<arch>/<pretrained_tag>' (main.py:1323-1329 parity)"
        )
    arch_raw = parts[1]
    act = "quick_gelu" if arch_raw.endswith("-quickgelu") else "gelu"
    arch = arch_raw.replace("-quickgelu", "")
    if arch in CLIP_RESNET_CONFIGS:
        return load_clip_resnet(arch, path, dtype=dtype, act=act, display_name=name)
    if openclip_vit_canonical(arch) in CLIP_VIT_CONFIGS:
        return _load_clip_vit(name, path, dtype)
    if path:
        from feed_forward_vqgan_clip_tpu.io.torch_import import (
            convert_clip_resnet,
            convert_clip_vit,
            load_torch_state_dict,
            sniff_clip_arch,
        )

        sd = load_torch_state_dict(path)
        family, cfg = sniff_clip_arch(sd)
        if family == "resnet":
            return load_clip_resnet(
                arch, path, dtype=dtype, act=act, display_name=name, arch_config=cfg
            )
        module = make_clip_from_config(cfg, act=act, dtype=dtype)
        return Perceptor(
            module=module, params=convert_clip_vit(sd), name=name,
            size=CLIP_SIZE.get(name, cfg["image_size"]),
            dim=CLIP_DIM.get(name, cfg["embed_dim"]),
        )
    raise ValueError(
        f"unknown openclip arch {arch!r} with no clip_model_path: known ViT "
        f"archs {sorted(CLIP_VIT_CONFIGS)}, RN archs {sorted(CLIP_RESNET_CONFIGS)}; "
        "any other arch works when clip_model_path points at its checkpoint "
        "(the architecture is sniffed from the weights' shapes)."
    )


def load_perceptor(name: str, path: Optional[str] = None, dtype=jnp.bfloat16) -> Perceptor:
    if name.startswith("cloob"):
        from feed_forward_vqgan_clip_tpu.models.cloob import load_cloob

        return load_cloob(name, path, dtype=dtype)
    if name.startswith("RN"):
        from feed_forward_vqgan_clip_tpu.models.clip_resnet import load_clip_resnet

        return load_clip_resnet(name, path, dtype=dtype)
    if name.startswith("openclip/"):
        return _load_openclip(name, path, dtype)
    return _load_clip_vit(name, path, dtype)


def _load_clip_vit(name: str, path: Optional[str], dtype) -> Perceptor:
    from feed_forward_vqgan_clip_tpu.models.clip_vit import make_clip

    module = make_clip(name, dtype=dtype)
    params = None
    if path:
        if os.path.isdir(path):
            from feed_forward_vqgan_clip_tpu.io.checkpoint import load_pytree

            params = load_pytree(os.path.join(path, "params.msgpack"))
        else:
            from feed_forward_vqgan_clip_tpu.io.torch_import import (
                convert_clip_vit,
                load_torch_state_dict,
            )

            params = convert_clip_vit(load_torch_state_dict(path))
    if params is None:
        log.warning(
            "No weights for CLIP %s — random init (smoke/bench only; pass "
            "clip_model_path for real runs).", name
        )
        size = CLIP_SIZE.get(name, 224)
        params = module.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, module.context_length), jnp.int32),
            jnp.zeros((1, size, size, 3), jnp.float32),
        )
    return Perceptor(
        module=module,
        params=params,
        name=name,
        size=CLIP_SIZE.get(name, 224),
        dim=CLIP_DIM.get(name, module.embed_dim),
    )
