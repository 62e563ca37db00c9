"""Serving predictor with deduplicated frozen-model caches.

Parity with the reference's Replicate predictor (/root/reference/predict.py:47-124):
setup() preloads a list of mapper checkpoints and dedup-caches perceptors by
(clip_model, clip_model_path), VQGANs by their checkpoint identity (with cached
latent bounds), and priors by path; predict() runs tokenize -> encode_text ->
repeat grid_h*grid_w -> optional prior.sample -> mapper -> clamp -> synth ->
grid -> PNG.

TPU-native difference: no cpu<->device model shuttling (predict.py:95, 124 moved
mappers between cpu and gpu per request to fit memory) — mapper params are small
next to HBM, and all models stay resident; the whole predict path is one jitted
function per (mapper, vqgan) pair.
"""

import logging
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from feed_forward_vqgan_clip_tpu.config import vqgan_arch_config
from feed_forward_vqgan_clip_tpu.io import checkpoint as ckpt_io
from feed_forward_vqgan_clip_tpu.io.images import make_grid, save_image
from feed_forward_vqgan_clip_tpu.models.perceptor import load_perceptor
from feed_forward_vqgan_clip_tpu.models.vqgan import latent_bounds, synth
from feed_forward_vqgan_clip_tpu.models.mappers import build_mapper
from feed_forward_vqgan_clip_tpu.ops.grad_ops import clamp_with_grad
from feed_forward_vqgan_clip_tpu.ops.losses import normalize
from feed_forward_vqgan_clip_tpu.registry import PRIOR_MODELS
from feed_forward_vqgan_clip_tpu.train.loop import load_vqgan, _dtype_of

log = logging.getLogger(__name__)


def default_model_paths() -> list:
    """The released-zoo filenames present locally (the reference's MODELS list,
    predict.py:13-24, resolved against files fetched by download-weights)."""
    from feed_forward_vqgan_clip_tpu.registry import MODEL_URLS

    return [p for p in MODEL_URLS if not p.startswith("prior_") and os.path.exists(p)]


class Predictor:
    def __init__(self, model_paths: Optional[Sequence[str]] = None,
                 prior_paths: Optional[Dict[str, str]] = None):
        """model_paths: mapper checkpoints (native dirs or reference .th files);
        defaults to every released-zoo file present locally (predict.py:13-24).
        prior_paths: optional {model_basename: prior_path}; defaults to the
        registry PRIOR_MODELS map resolved against local files (predict.py:70-76)."""
        self.model_paths = (
            list(model_paths) if model_paths is not None else default_model_paths()
        )
        self.prior_paths = prior_paths
        self.models: Dict[str, tuple] = {}
        self.perceptors: Dict[Tuple[str, Optional[str]], object] = {}
        self.vqgans: Dict[str, tuple] = {}
        self.priors: Dict[str, object] = {}
        self._render_fns: Dict[str, object] = {}
        self._stream_render_fns: Dict[str, object] = {}
        self._stream_params: Dict[str, object] = {}

    def setup(self):
        for path in self.model_paths:
            name = os.path.basename(path.rstrip("/"))
            try:
                mapper, params, cfg, noise = ckpt_io.load_model(path)
            except NotImplementedError as e:
                # an unknown model_type from a future/foreign checkpoint (all 4
                # reference families — mixer/vitgan/simple_vitgan/xtransformer —
                # convert; io/checkpoint.py dispatches them): serve the loadable
                # models instead of dying (predict.py never faced this; its
                # MODELS list was all-loadable)
                log.warning("skipping %s: %s", name, e)
                continue
            self.models[name] = (mapper, params, cfg, noise)

            pkey = (cfg.get("clip_model"), cfg.get("clip_model_path"))
            if pkey not in self.perceptors:
                self.perceptors[pkey] = load_perceptor(*pkey, dtype=_dtype_of(cfg))

            vkey = str(cfg.get("vqgan_checkpoint")) + "|" + str(cfg.get("vqgan_config"))
            if vkey not in self.vqgans:
                vq, vq_params = load_vqgan(cfg, _dtype_of(cfg))
                self.vqgans[vkey] = (vq, vq_params, latent_bounds(vq_params))

            prior_path = None
            if self.prior_paths and name in self.prior_paths:
                prior_path = self.prior_paths[name]
            elif name in PRIOR_MODELS and os.path.exists(PRIOR_MODELS[name]):
                prior_path = PRIOR_MODELS[name]
            if prior_path and prior_path not in self.priors:
                from feed_forward_vqgan_clip_tpu.models.flow import load_prior_model

                self.priors[prior_path] = load_prior_model(prior_path)
            if prior_path:
                self.models[name] += (prior_path,)

            use_pallas = cfg.get("use_pallas")
            vq, vq_params, (z_lo, z_hi) = self.vqgans[vkey]
            from feed_forward_vqgan_clip_tpu.models.mappers.fused import (
                make_mapper_apply,
                prepare_streamed_params,
                streamed_mixer_forward,
                streamed_supported,
            )

            mapper_apply = make_mapper_apply(mapper, fused=cfg.get("fused_mixer"))

            def render(mp, vp, net_in, _apply=mapper_apply, _vq=vq, _lo=z_lo, _hi=z_hi, _up=use_pallas):
                z = _apply(mp, net_in)
                z = clamp_with_grad(z, _lo, _hi)
                return synth(_vq, vp, z, use_pallas=_up).astype(jnp.float32)

            self._render_fns[name] = jax.jit(render)

            # Small-request latency path: the depth-streaming whole-stack mixer
            # kernel (weights DMA'd under compute, one launch for the stack)
            # beats the weight-resident per-block grid at batch <= ~8. Stacked
            # params are prepared once here and threaded through jit as the mp
            # argument (closure constants overflow the remote-compile payload).
            try:
                streamable = streamed_supported(mapper) and jax.default_backend() not in ("cpu",)
            except Exception:
                streamable = False
            if streamable:
                self._stream_params[name] = prepare_streamed_params(mapper, params)

                def srender(mp, vp, net_in, _m=mapper, _vq=vq, _lo=z_lo, _hi=z_hi, _up=use_pallas):
                    z = streamed_mixer_forward(_m, mp, net_in)
                    z = clamp_with_grad(z, _lo, _hi)
                    return synth(_vq, vp, z, use_pallas=_up).astype(jnp.float32)

                self._stream_render_fns[name] = jax.jit(srender)
        log.info("Predictor ready: %d models, %d perceptors, %d vqgans, %d priors",
                 len(self.models), len(self.perceptors), len(self.vqgans), len(self.priors))

    def predict(
        self,
        prompt: str,
        model: Optional[str] = None,
        prior: bool = False,
        grid_size: str = "1x1",
        seed: Optional[int] = None,
        out_path: str = "out.png",
    ) -> str:
        """prompt -> PNG grid path (predict.py:78-124 surface)."""
        key = jax.random.PRNGKey(np.random.randint(0, 2**31) if seed is None else seed)
        if model is None:
            key, km = jax.random.split(key)
            model = list(self.models)[int(jax.random.randint(km, (), 0, len(self.models)))]
        entry = self.models[model]
        mapper, params, cfg, noise_bank = entry[:4]
        prior_path = entry[4] if len(entry) > 4 else None
        perceptor = self.perceptors[(cfg.get("clip_model"), cfg.get("clip_model_path"))]
        vkey = str(cfg.get("vqgan_checkpoint")) + "|" + str(cfg.get("vqgan_config"))
        _, vq_params, _ = self.vqgans[vkey]

        gh, gw = (int(v) for v in grid_size.split("x"))
        n = gh * gw

        from feed_forward_vqgan_clip_tpu.tokenizer.bpe import get_tokenizer

        toks = get_tokenizer().tokenize([prompt], truncate=True)
        H = perceptor.encode_text(jnp.asarray(toks)).astype(jnp.float32)
        if cfg.get("normalize_input"):
            H = normalize(H)
        H = jnp.tile(H, (n, 1))
        if prior and prior_path:
            key, kp = jax.random.split(key)
            H = self.priors[prior_path].sample(kp, H)
        noise_dim = int(cfg.get("noise_dim") or 0)
        if noise_dim:
            if noise_bank is not None and len(noise_bank) >= n:
                nz = jnp.asarray(noise_bank[:n])
            else:
                key, kn = jax.random.split(key)
                nz = jax.random.normal(kn, (n, noise_dim))
            H = jnp.concatenate([H, nz.astype(H.dtype)], axis=1)
        if n <= 8 and model in self._stream_render_fns:
            imgs = np.asarray(
                self._stream_render_fns[model](self._stream_params[model], vq_params, H)
            )
        else:
            imgs = np.asarray(self._render_fns[model](params, vq_params, H))
        save_image(make_grid(imgs, nrow=gw), out_path)
        return out_path
