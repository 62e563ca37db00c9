"""PyTorch checkpoint -> JAX pytree converters.

Everything downstream of the reference's released weight zoo is parity-testable only
through these (SURVEY.md §7 stage 2). Layout conventions:

  * torch Conv2d kernels are OIHW; flax wants HWIO  -> transpose (2, 3, 1, 0)
  * torch Linear weights are (out, in); flax wants (in, out) -> transpose
  * images are NCHW in torch, NHWC here

torch is only imported lazily (CPU wheel, used host-side for deserialization only).
"""

from typing import Any, Dict, Mapping

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .th/.ckpt/.pt file into a flat {name: np.ndarray} state dict.

    Handles both raw state dicts and Lightning-style {'state_dict': ...} wrappers
    (taming checkpoints), mirroring `init_from_ckpt` usage at
    /root/reference/main.py:89.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    if not isinstance(obj, Mapping):
        # whole-module pickle (legacy model.th, main.py:568-575)
        obj = obj.state_dict()
    return {k: _to_np(v) for k, v in obj.items() if hasattr(v, "numpy") or hasattr(v, "detach")}


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy()) if hasattr(t, "detach") else np.asarray(t)


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    """(out, in) -> (in, out)."""
    return np.transpose(w, (1, 0))


def _conv(sd, prefix):
    return {"kernel": conv_kernel(sd[f"{prefix}.weight"]), "bias": sd[f"{prefix}.bias"]}


def _dense(sd, prefix):
    p = {"kernel": linear_kernel(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _norm(sd, prefix):
    """torch GroupNorm/LayerNorm {weight, bias} -> flax {scale, bias}."""
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _groupnorm32(sd, prefix):
    """Our GroupNorm32 wrapper nests flax's GroupNorm one level down."""
    return {"GroupNorm_0": _norm(sd, prefix)}


def _resnet_block(sd, prefix):
    p = {
        "norm1": _groupnorm32(sd, f"{prefix}.norm1"),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "norm2": _groupnorm32(sd, f"{prefix}.norm2"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.nin_shortcut.weight" in sd:
        p["nin_shortcut"] = _conv(sd, f"{prefix}.nin_shortcut")
    return p


def _attn_block(sd, prefix):
    return {
        "norm": _groupnorm32(sd, f"{prefix}.norm"),
        "q": _conv(sd, f"{prefix}.q"),
        "k": _conv(sd, f"{prefix}.k"),
        "v": _conv(sd, f"{prefix}.v"),
        "proj_out": _conv(sd, f"{prefix}.proj_out"),
    }


def convert_vqgan(sd: Dict[str, np.ndarray], config: dict) -> Dict[str, Any]:
    """taming VQModel state dict -> params for models.vqgan.VQGAN.

    taming naming: quantize.embedding.weight, post_quant_conv.*, decoder.conv_in.*,
    decoder.mid.{block_1,attn_1,block_2}.*, decoder.up.{level}.block.{i}.*,
    decoder.up.{level}.attn.{i}.*, decoder.up.{level}.upsample.conv.*,
    decoder.{norm_out,conv_out}.*  (GumbelVQ aliases quantize.embed ->
    quantize.embedding, reference main.py:94).
    """
    if "quantize.embedding.weight" in sd:
        codebook = sd["quantize.embedding.weight"]
    elif "quantize.embed.weight" in sd:  # GumbelVQ (main.py:94)
        codebook = sd["quantize.embed.weight"]
    else:
        raise KeyError("no codebook found in state dict")

    ch_mult = tuple(config.get("ch_mult", (1, 1, 2, 2, 4)))
    num_res_blocks = int(config.get("num_res_blocks", 2))
    attn_resolutions = tuple(config.get("attn_resolutions", (16,)))
    resolution = int(config.get("resolution", 256))
    num_levels = len(ch_mult)

    dec: Dict[str, Any] = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid_block_1": _resnet_block(sd, "decoder.mid.block_1"),
        "mid_attn_1": _attn_block(sd, "decoder.mid.attn_1"),
        "mid_block_2": _resnet_block(sd, "decoder.mid.block_2"),
        "norm_out": _groupnorm32(sd, "decoder.norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }
    curr_res = resolution // (2 ** (num_levels - 1))
    for i_level in reversed(range(num_levels)):
        for i_block in range(num_res_blocks + 1):
            dec[f"up_{i_level}_block_{i_block}"] = _resnet_block(
                sd, f"decoder.up.{i_level}.block.{i_block}"
            )
            if curr_res in attn_resolutions:
                dec[f"up_{i_level}_attn_{i_block}"] = _attn_block(
                    sd, f"decoder.up.{i_level}.attn.{i_block}"
                )
        if i_level != 0:
            dec[f"up_{i_level}_upsample"] = {
                "conv": _conv(sd, f"decoder.up.{i_level}.upsample.conv")
            }
            curr_res *= 2

    return {
        "params": {
            "codebook": codebook,
            "post_quant_conv": _conv(sd, "post_quant_conv"),
            "decoder": dec,
        }
    }
