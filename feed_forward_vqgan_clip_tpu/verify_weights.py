"""Real-weight verification: download -> convert -> probe -> diff vs goldens.

North-star groundwork (BASELINE.md: pixel-faithful outputs from the released
cc12m checkpoints): in this environment egress is blocked, so real-weight pixel
parity cannot be *proven* here — but this module makes it a ONE-COMMAND check
the moment the released files are reachable (or pre-fetched into a directory).

`ffvc verify-weights [--download]` walks the reference zoo
(/root/reference/predict.py:13-24 MODELS, download_weights.py:3-28), converts
each torch `.th` through `io.checkpoint.load_model`, runs deterministic probes,
and diffs against committed goldens:

  text_embed    CLIP text embeddings of 2 fixed prompts           (2, clip_dim)
  fixed_z       VQGAN decode of a seeded latent in [z_lo, z_hi]   32x32 thumb
  prompt_image  full prompt -> image at seed 0                    32x32 thumb

Thumbnails are 32x32 bilinear means of the full render (small enough to commit,
sensitive enough that any conversion error shows up); the sha256 of the full
uint8 image is recorded alongside for exact-match bookkeeping. The first run in
a weight-bearing environment writes the goldens (`--update-goldens`); every
later run — any machine, any backend — compares within `--atol` and emits a
JSON report.
"""

import hashlib
import json
import logging
import os
from typing import Dict, List, Optional

import numpy as np

from feed_forward_vqgan_clip_tpu.registry import MODEL_URLS, PRIOR_MODELS

log = logging.getLogger(__name__)

PROMPTS = (
    "a photo of a sunset over the ocean",
    "an oil painting of a red fox in the snow",
)
THUMB = 32
Z_SEED = 1234


def _thumb(img: np.ndarray) -> np.ndarray:
    import jax

    t = jax.image.resize(
        np.asarray(img, np.float32), (img.shape[0], THUMB, THUMB, 3), "bilinear"
    )
    return np.asarray(t, np.float32)


def _sha(img: np.ndarray) -> str:
    u8 = np.clip(np.asarray(img, np.float32) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    return hashlib.sha256(u8.tobytes()).hexdigest()


def probe_model(model_path: str, prior_path: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Run the deterministic probe set on one mapper checkpoint."""
    import jax
    import jax.numpy as jnp

    from feed_forward_vqgan_clip_tpu.config import vqgan_arch_config
    from feed_forward_vqgan_clip_tpu.infer import Generator
    from feed_forward_vqgan_clip_tpu.models.vqgan import latent_bounds, synth

    # prior-less Generator: the prior is probed separately below so the
    # text/fixed_z/prompt probes don't depend on prior availability
    gen = Generator(model_path)
    out: Dict[str, np.ndarray] = {}

    H = gen.encode_prompts(list(PROMPTS))
    out["text_embed"] = np.asarray(H, np.float32)

    # fixed-z decode: exercises codebook + decoder conversion alone
    arch = vqgan_arch_config(gen.cfg)
    s = int(gen.cfg.get("vq_image_size") or 16)
    zc = int(arch["z_channels"])
    z_lo, z_hi = latent_bounds(gen.vq_params)
    u = jax.random.uniform(jax.random.PRNGKey(Z_SEED), (1, s, s, zc))
    z = z_lo + u * (z_hi - z_lo)
    img_z = np.asarray(
        jax.jit(lambda p, zz: synth(gen.vq, p, zz).astype(jnp.float32))(
            gen.vq_params, z
        )
    )
    out["fixed_z_thumb"] = _thumb(img_z)
    out["fixed_z_sha"] = np.asarray(_sha(img_z))

    # full prompt->image: mapper + everything (always prior-less so the mapper
    # probe is stable across prior availability)
    imgs = np.asarray(gen.generate(H, seed=0))
    out["prompt_thumb"] = _thumb(imgs)
    out["prompt_sha"] = np.asarray(_sha(imgs))

    # prior-conditioned probe: seeded flow sample (covers the net2net converter,
    # /root/reference/main.py:1447-1462) + the render of that sample
    if prior_path:
        from feed_forward_vqgan_clip_tpu.models.flow import load_prior_model

        prior = load_prior_model(prior_path)
        Hp = prior.sample(jax.random.PRNGKey(Z_SEED), H).astype(jnp.float32)
        out["prior_sample"] = np.asarray(Hp, np.float32)
        imgs_p = np.asarray(gen.generate(Hp, seed=0))
        out["prior_thumb"] = _thumb(imgs_p)
        out["prior_sha"] = np.asarray(_sha(imgs_p))
    return out


def _compare(probes: Dict[str, np.ndarray], golden: Dict[str, np.ndarray], atol: float):
    result = {}
    ok = True
    for k, v in probes.items():
        if k not in golden:
            result[k] = {"status": "missing_golden"}
            ok = False
            continue
        g = golden[k]
        if v.dtype.kind == "U" or g.dtype.kind == "U":  # sha strings
            exact = str(v) == str(g)
            result[k] = {"status": "match" if exact else "hash_differs"}
            # hash mismatch alone is informative, not fatal (backend rounding)
            continue
        if v.shape != g.shape:
            result[k] = {"status": "shape_mismatch", "got": list(v.shape), "want": list(g.shape)}
            ok = False
            continue
        diff = float(np.max(np.abs(v - g)))
        good = diff <= atol
        result[k] = {"status": "match" if good else "mismatch", "max_abs_diff": diff}
        ok = ok and good
    return ok, result


def verify_weights(
    weights_dir: Optional[str] = None,
    *,
    goldens_dir: str = "goldens",
    models: Optional[List[str]] = None,
    download: bool = False,
    update_goldens: bool = False,
    atol: float = 2e-2,
    out: str = "verify_weights_report.json",
):
    """Convert + probe every available zoo checkpoint; diff against goldens.

    Returns the report dict (also written to `out`). Checkpoints not present in
    `weights_dir` are reported as "absent" rather than failing, so the command
    is runnable in egress-less environments too.
    """
    weights_dir = weights_dir or os.environ.get("FFVC_WEIGHTS_DIR", "weights")
    if download:
        from feed_forward_vqgan_clip_tpu.download_weights import download as dl

        os.makedirs(weights_dir, exist_ok=True)
        for name, url in MODEL_URLS.items():
            try:
                dl(url, os.path.join(weights_dir, name))
            except Exception as e:  # pragma: no cover - network
                log.warning("download failed for %s: %s", name, e)

    names = models or [n for n in MODEL_URLS if not n.startswith("prior_")]
    report: Dict[str, dict] = {}
    for name in names:
        path = name if os.path.exists(name) else os.path.join(weights_dir, name)
        base = os.path.basename(path)
        if not os.path.exists(path):
            report[base] = {"status": "absent", "path": path}
            continue
        prior_name = PRIOR_MODELS.get(base)
        prior_path = (
            os.path.join(weights_dir, prior_name)
            if prior_name and os.path.exists(os.path.join(weights_dir, prior_name))
            else None
        )
        try:
            # prompt_image stays prior-less so the mapper probe is stable; the
            # zoo's prior checkpoint (if present) gets its own seeded-sample +
            # render probes inside probe_model
            probes = probe_model(path, prior_path=prior_path)
        except Exception as e:
            log.exception("probe failed for %s", base)
            report[base] = {"status": "error", "error": f"{type(e).__name__}: {e}"}
            continue

        gpath = os.path.join(goldens_dir, base + ".npz")
        if update_goldens or not os.path.exists(gpath):
            os.makedirs(goldens_dir, exist_ok=True)
            np.savez_compressed(gpath, **probes)
            report[base] = {"status": "golden_written", "golden": gpath}
            log.info("wrote golden %s", gpath)
        else:
            golden = dict(np.load(gpath, allow_pickle=False))
            ok, detail = _compare(probes, golden, atol)
            report[base] = {"status": "ok" if ok else "FAIL", "probes": detail}

    summary = {
        "ok": sum(1 for r in report.values() if r["status"] in ("ok", "golden_written")),
        "fail": sum(1 for r in report.values() if r["status"] in ("FAIL", "error")),
        "absent": sum(1 for r in report.values() if r["status"] == "absent"),
        "atol": atol,
    }
    full = {"summary": summary, "models": report}
    with open(out, "w") as fd:
        json.dump(full, fd, indent=2)
    for name, r in report.items():
        log.info("%-70s %s", name, r["status"])
    log.info(
        "verify-weights: %d ok / %d fail / %d absent -> %s",
        summary["ok"], summary["fail"], summary["absent"], out,
    )
    return full
