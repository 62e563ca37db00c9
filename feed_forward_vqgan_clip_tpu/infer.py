"""Inference: prompt(s) -> image grid PNG.

Parity with the reference's `test` CLI (/root/reference/main.py:977-1061):
'|'-separated prompts or a .txt file, nb_repeats with noise-bank reuse semantics
(main.py:1043-1055), optional flow prior sampling, seeded, grid output.

The whole prompt->image path (text encode -> [prior] -> mapper -> quantize ->
decode) is one jitted function — the serving hot path bench.py measures.
"""

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from feed_forward_vqgan_clip_tpu.config import vqgan_arch_config
from feed_forward_vqgan_clip_tpu.io import checkpoint as ckpt_io
from feed_forward_vqgan_clip_tpu.io.images import save_grid
from feed_forward_vqgan_clip_tpu.models.perceptor import load_perceptor
from feed_forward_vqgan_clip_tpu.models.vqgan import latent_bounds, synth
from feed_forward_vqgan_clip_tpu.ops.grad_ops import clamp_with_grad
from feed_forward_vqgan_clip_tpu.ops.losses import normalize
from feed_forward_vqgan_clip_tpu.train.loop import load_vqgan, _dtype_of

log = logging.getLogger(__name__)


class Generator:
    """Loaded mapper + frozen models with a jitted prompt->image function."""

    def __init__(self, model_path: str, *, prior_path: Optional[str] = None, dtype=None):
        mapper, params, cfg, noise = ckpt_io.load_model(model_path)
        self.cfg = cfg
        self.mapper = mapper
        self.params = params
        self.noise_bank = noise
        dtype = dtype or _dtype_of(cfg)
        self.perceptor = load_perceptor(
            cfg.get("clip_model"), cfg.get("clip_model_path"), dtype=dtype
        )
        self.vq, self.vq_params = load_vqgan(cfg, dtype)
        self.noise_dim = int(cfg.get("noise_dim") or 0)
        self.prior = None
        if prior_path:
            from feed_forward_vqgan_clip_tpu.models.flow import load_prior_model

            self.prior = load_prior_model(prior_path)

        use_pallas = cfg.get("use_pallas")
        from feed_forward_vqgan_clip_tpu.models.mappers.fused import make_mapper_apply

        mapper_apply = make_mapper_apply(mapper, fused=cfg.get("fused_mixer"))

        @jax.jit
        def _text_to_image(mapper_params, clip_params, vq_params, net_in):
            z_lo, z_hi = latent_bounds(vq_params)
            z = mapper_apply(mapper_params, net_in)
            z = clamp_with_grad(z, z_lo, z_hi)
            return synth(self.vq, vq_params, z, use_pallas=use_pallas).astype(jnp.float32)

        self._render = _text_to_image

    def encode_prompts(self, texts):
        from feed_forward_vqgan_clip_tpu.tokenizer.bpe import get_tokenizer

        toks = get_tokenizer().tokenize(texts, truncate=True)
        H = self.perceptor.encode_text(jnp.asarray(toks)).astype(jnp.float32)
        if self.cfg.get("normalize_input"):
            H = normalize(H)
        return H

    def generate(self, H, *, nb_repeats: int = 1, seed: Optional[int] = None, key=None):
        """H: (B, clip_dim) embeddings -> images (nb_repeats*B, H, W, 3) in [0,1]."""
        if key is None:
            key = jax.random.PRNGKey(0 if seed is None else seed)
        H = jnp.tile(H, (nb_repeats, 1))
        if self.prior is not None:
            key, kp = jax.random.split(key)
            H = self.prior.sample(kp, H)
        if self.noise_dim:
            n = len(H)
            if self.noise_bank is not None:
                bank = np.asarray(self.noise_bank)
                if len(bank) > n:
                    noise = bank[:n]  # truncate (main.py:1047-1048)
                else:
                    key, ki = jax.random.split(key)
                    idx = jax.random.randint(ki, (n,), 0, len(bank))
                    noise = bank[np.asarray(idx)]
                noise = jnp.asarray(noise)
            else:
                key, kn = jax.random.split(key)
                noise = jax.random.normal(kn, (n, self.noise_dim))
            H = jnp.concatenate([H, noise.astype(H.dtype)], axis=1)
        return self._render(self.params, self.perceptor.params, self.vq_params, H)


def test(
    model_path: str,
    text_or_path: str,
    *,
    nb_repeats: int = 1,
    out_path: str = "gen.png",
    images_per_row: Optional[int] = None,
    prior_path: Optional[str] = None,
    seed: Optional[int] = None,
):
    """Generate an image grid from prompts (reference `test`, main.py:977-1061)."""
    if text_or_path.endswith(".txt") and os.path.exists(text_or_path):
        with open(text_or_path) as fd:
            texts = [line.strip() for line in fd.readlines()]
    else:
        texts = text_or_path.split("|")
    gen = Generator(model_path, prior_path=prior_path)
    H = gen.encode_prompts(texts)
    images = np.asarray(gen.generate(H, nb_repeats=nb_repeats, seed=seed))
    save_grid(images, out_path, nrow=images_per_row or nb_repeats)
    log.info("Wrote %s (%d images)", out_path, len(images))
    return out_path
