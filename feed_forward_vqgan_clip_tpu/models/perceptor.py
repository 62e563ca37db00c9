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


def load_perceptor(name: str, path: Optional[str] = None, dtype=jnp.bfloat16) -> Perceptor:
    if name.startswith("cloob"):
        from feed_forward_vqgan_clip_tpu.models.cloob import load_cloob

        return load_cloob(name, path, dtype=dtype)
    if name.startswith("RN"):
        from feed_forward_vqgan_clip_tpu.models.clip_resnet import load_clip_resnet

        return load_clip_resnet(name, path, dtype=dtype)

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
