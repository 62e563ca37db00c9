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
    """GroupNorm32 holds {scale, bias} directly."""
    return _norm(sd, prefix)


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


def _mhsa(sd, prefix):
    """torch nn.MultiheadAttention (packed in_proj) -> our MHSA q/k/v/out Denses."""
    w = sd[f"{prefix}.in_proj_weight"]
    b = sd[f"{prefix}.in_proj_bias"]
    d = w.shape[1]
    qw, kw, vw = w[:d], w[d : 2 * d], w[2 * d :]
    qb, kb, vb = b[:d], b[d : 2 * d], b[2 * d :]
    return {
        "q": {"kernel": linear_kernel(qw), "bias": qb},
        "k": {"kernel": linear_kernel(kw), "bias": kb},
        "v": {"kernel": linear_kernel(vw), "bias": vb},
        "out": _dense(sd, f"{prefix}.out_proj"),
    }


def _layernorm(sd, prefix):
    return {"LayerNorm_0": _norm(sd, prefix)}


def _resblock(sd, prefix):
    return {
        "ln_1": _layernorm(sd, f"{prefix}.ln_1"),
        "attn": _mhsa(sd, f"{prefix}.attn"),
        "ln_2": _layernorm(sd, f"{prefix}.ln_2"),
        "c_fc": _dense(sd, f"{prefix}.mlp.c_fc"),
        "c_proj": _dense(sd, f"{prefix}.mlp.c_proj"),
    }


def _normalize_openclip_naming(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Normalize open_clip checkpoint layouts to the OpenAI CLIP naming the
    converter walks (reference loads these via open_clip.create_model_and_
    transforms, main.py:1323-1329):
      * DDP/compile wrappers prefix everything with 'module.' / '_orig_mod.';
        some exports nest under 'model.';
      * CustomTextCLIP nests the text tower under 'text.' (text.token_embedding,
        text.ln_final, text.text_projection, ...) while OpenAI keeps it at the
        top level."""
    for prefix in ("module.", "_orig_mod.", "model."):
        if any(k.startswith(prefix) for k in sd) and not any(
            k.startswith("visual.") or k == "logit_scale" for k in sd
        ):
            sd = {
                (k[len(prefix):] if k.startswith(prefix) else k): v
                for k, v in sd.items()
            }
    if any(k.startswith("text.") for k in sd) and "token_embedding.weight" not in sd:
        sd = {
            (k[len("text."):] if k.startswith("text.") else k): v
            for k, v in sd.items()
        }
    return sd


def sniff_clip_arch(sd: Dict[str, np.ndarray]):
    """Derive (family, arch_config) from a CLIP-layout state dict's shapes.

    The reference hands arbitrary `openclip/<arch>/<tag>` names to
    open_clip.create_model_and_transforms (main.py:1323-1329), which knows every
    arch by name; here the checkpoint itself carries the architecture — the same
    shape arithmetic OpenAI CLIP's build_model applies to decide ViT-vs-RN and
    recover widths/layers/heads. Returns ('vit'|'resnet', dict) matching the
    CLIP_VIT_CONFIGS / CLIP_RESNET_CONFIGS schema.
    """
    sd = _normalize_openclip_naming(dict(sd))
    text = dict(
        embed_dim=int(sd["text_projection"].shape[1]),
        text_width=int(sd["ln_final.weight"].shape[0]),
        text_layers=len({
            k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")
        }),
        vocab_size=int(sd["token_embedding.weight"].shape[0]),
        context_length=int(sd["positional_embedding"].shape[0]),
    )
    # real CLIP towers always use head_dim 64; max(1, .) keeps tiny test dicts valid
    text["text_heads"] = max(1, text["text_width"] // 64)
    if "visual.conv1.weight" in sd and "visual.class_embedding" in sd:  # ViT tower
        width = int(sd["visual.conv1.weight"].shape[0])
        patch = int(sd["visual.conv1.weight"].shape[-1])
        grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
        layers = len({
            k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")
        })
        return "vit", dict(
            image_size=patch * grid, patch_size=patch, vision_width=width,
            vision_layers=layers, vision_heads=max(1, width // 64), **text,
        )
    if any(k.startswith("visual.layer1.") for k in sd):  # ModifiedResNet tower
        counts = tuple(
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}.")})
            for b in (1, 2, 3, 4)
        )
        width = int(sd["visual.layer1.0.conv1.weight"].shape[0])
        out_grid = int(round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5))
        return "resnet", dict(
            image_size=out_grid * 32, vision_layers=counts, vision_width=width,
            **text,
        )
    raise ValueError(
        "state dict is neither a CLIP ViT (visual.conv1 + class_embedding) nor a "
        "ModifiedResNet (visual.layer1..4) checkpoint"
    )


def convert_clip_vit(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """OpenAI CLIP ViT state dict -> params for models.clip_vit.CLIP.

    Naming: visual.conv1/class_embedding/positional_embedding/ln_pre/
    transformer.resblocks.N.{ln_1,attn.in_proj_*,attn.out_proj,ln_2,mlp.c_fc,
    mlp.c_proj}/ln_post/proj; token_embedding, positional_embedding,
    transformer.resblocks.N.*, ln_final, text_projection, logit_scale.
    Released checkpoints are fp16; everything is cast to f32 here.
    """
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    sd = _normalize_openclip_naming(sd)
    n_vis = max(
        int(k.split(".")[3]) + 1
        for k in sd
        if k.startswith("visual.transformer.resblocks.")
    )
    n_txt = max(
        int(k.split(".")[2]) + 1 for k in sd if k.startswith("transformer.resblocks.")
    )
    visual: Dict[str, Any] = {
        "conv1": {"kernel": conv_kernel(sd["visual.conv1.weight"])},
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": _layernorm(sd, "visual.ln_pre"),
        "ln_post": _layernorm(sd, "visual.ln_post"),
        "proj": sd["visual.proj"],
        "transformer": {
            f"resblock_{i}": _resblock(sd, f"visual.transformer.resblocks.{i}")
            for i in range(n_vis)
        },
    }
    text: Dict[str, Any] = {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "ln_final": _layernorm(sd, "ln_final"),
        "text_projection": sd["text_projection"],
        "transformer": {
            f"resblock_{i}": _resblock(sd, f"transformer.resblocks.{i}")
            for i in range(n_txt)
        },
    }
    return {
        "params": {
            "visual": visual,
            "text": text,
            "logit_scale": sd["logit_scale"].reshape(()),
        }
    }


def _frozen_bn(sd, prefix):
    return {
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }


def _conv_nobias(sd, prefix):
    return {"kernel": conv_kernel(sd[f"{prefix}.weight"])}


def _bottleneck(sd, prefix):
    p = {
        "conv1": _conv_nobias(sd, f"{prefix}.conv1"),
        "bn1": _frozen_bn(sd, f"{prefix}.bn1"),
        "conv2": _conv_nobias(sd, f"{prefix}.conv2"),
        "bn2": _frozen_bn(sd, f"{prefix}.bn2"),
        "conv3": _conv_nobias(sd, f"{prefix}.conv3"),
        "bn3": _frozen_bn(sd, f"{prefix}.bn3"),
    }
    if f"{prefix}.downsample.0.weight" in sd:
        p["downsample_conv"] = _conv_nobias(sd, f"{prefix}.downsample.0")
        p["downsample_bn"] = _frozen_bn(sd, f"{prefix}.downsample.1")
    return p


def convert_clip_resnet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """OpenAI CLIP RN / ml-jku CLOOB state dict -> params for CLIPResNet.

    CLOOB (cloob.py:658-681) nests the text tower under 'transformer.' and uses
    'logit_inv_tau' instead of 'logit_scale'; both namings are normalized here.
    """
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    if "logit_inv_tau" in sd:  # CLOOB layout -> CLIP layout
        remap = {}
        for k, v in sd.items():
            if k == "logit_inv_tau":
                remap["logit_scale"] = v
            elif k == "logit_scale_hopfield":
                continue  # training-loss-only parameter, no encode role
            elif k.startswith("transformer."):
                remap[k[len("transformer."):]] = v
            else:
                remap[k] = v
        sd = remap

    n_txt = max(
        int(k.split(".")[2]) + 1 for k in sd if k.startswith("transformer.resblocks.")
    )
    visual: Dict[str, Any] = {
        "conv1": _conv_nobias(sd, "visual.conv1"),
        "bn1": _frozen_bn(sd, "visual.bn1"),
        "conv2": _conv_nobias(sd, "visual.conv2"),
        "bn2": _frozen_bn(sd, "visual.bn2"),
        "conv3": _conv_nobias(sd, "visual.conv3"),
        "bn3": _frozen_bn(sd, "visual.bn3"),
        "attnpool": {
            "positional_embedding": sd["visual.attnpool.positional_embedding"],
            "q_proj": _dense(sd, "visual.attnpool.q_proj"),
            "k_proj": _dense(sd, "visual.attnpool.k_proj"),
            "v_proj": _dense(sd, "visual.attnpool.v_proj"),
            "c_proj": _dense(sd, "visual.attnpool.c_proj"),
        },
    }
    for li in range(1, 5):
        bi = 0
        while f"visual.layer{li}.{bi}.conv1.weight" in sd:
            visual[f"layer{li}_{bi}"] = _bottleneck(sd, f"visual.layer{li}.{bi}")
            bi += 1
    text: Dict[str, Any] = {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "ln_final": _layernorm(sd, "ln_final"),
        "text_projection": sd["text_projection"],
        "transformer": {
            f"resblock_{i}": _resblock(sd, f"transformer.resblocks.{i}")
            for i in range(n_txt)
        },
    }
    return {
        "params": {
            "visual": visual,
            "text": text,
            "logit_scale": sd["logit_scale"].reshape(()),
        }
    }


def _basic_fc(sd, prefix, depth=2):
    """net2net BasicFullyConnectedNet 'main.N' Sequential -> our BasicFC names:
    fc_in = main.0, fc_i = main.{2(i+1)}, fc_out = main.{2(depth+1)}."""
    p = {"fc_in": _dense(sd, f"{prefix}.main.0")}
    for i in range(depth):
        p[f"fc_{i}"] = _dense(sd, f"{prefix}.main.{2 * (i + 1)}")
    p["fc_out"] = _dense(sd, f"{prefix}.main.{2 * (depth + 1)}")
    return p


def convert_flow(sd: Dict[str, np.ndarray], n_flows: int, *, hidden_depth: int = None,
                 conditioning_depth: int = 2) -> Dict[str, Any]:
    """net2net ConditionalFlatCouplingFlow state dict -> our flow variables.

    Naming: embedder.main.N, sub_layers.{i}.norm_layer.{loc,scale} (1,C,1,1),
    sub_layers.{i}.coupling.{s,t}.{j}.main.N, sub_layers.{i}.shuffle.
    forward_shuffle_idx.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if hidden_depth is None:
        # infer from the number of layers in the first s-net
        idxs = [
            int(k.split(".main.")[1].split(".")[0])
            for k in sd
            if k.startswith("sub_layers.0.coupling.s.0.main.") and k.endswith("weight")
        ]
        hidden_depth = (max(idxs) // 2) - 1
    params: Dict[str, Any] = {
        "embedder": _basic_fc(sd, "embedder", conditioning_depth)
    }
    buffers: Dict[str, Any] = {}
    for i in range(n_flows):
        p = f"sub_layers.{i}"
        coupling = {}
        for j in range(2):
            coupling[f"s_{j}"] = _basic_fc(sd, f"{p}.coupling.s.{j}", hidden_depth)
            coupling[f"t_{j}"] = _basic_fc(sd, f"{p}.coupling.t.{j}", hidden_depth)
        params[f"flow_{i}"] = {
            "norm": {
                "loc": sd[f"{p}.norm_layer.loc"].reshape(-1),
                "scale": sd[f"{p}.norm_layer.scale"].reshape(-1),
            },
            "coupling": coupling,
        }
        buffers[f"flow_{i}"] = {
            "shuffle": sd[f"{p}.shuffle.forward_shuffle_idx"].astype(np.int32)
        }
    return {"params": params, "buffers": buffers}


def _inception_bn(sd, prefix):
    return {
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }


def convert_inception(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision inception_v3 (or the FID-port, same naming) state dict ->
    params for models.inception.InceptionV3Features. Every BasicConv2d is
    '<block>.conv.weight' + '<block>.bn.{weight,bias,running_mean,running_var}';
    fc / AuxLogits are dropped (feature extractor only)."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    blocks: Dict[str, Any] = {}
    for k in sd:
        if not k.endswith(".conv.weight"):
            continue
        path = k[: -len(".conv.weight")]  # e.g. Mixed_5b.branch1x1
        parts = path.split(".")
        node = blocks
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = {
            "conv": {"kernel": conv_kernel(sd[k])},
            "bn": _inception_bn(sd, f"{path}.bn"),
        }
    if "Conv2d_1a_3x3" not in blocks:
        raise KeyError("state dict does not look like torchvision inception_v3")
    return {"params": blocks}


def convert_inception_resnet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Cadene/timm `inception_resnet_v2` state dict -> params for
    models.inception_resnet.InceptionResNetV2Features. Key grammar of the port:
    BasicConv2d as '<block>.conv.weight' + '<block>.bn.*'; branch Sequentials
    as 'branchK.N' (flattened here to 'branchK_N'); the residual blocks'
    biased 1x1 projection as '<block>.conv2d.{weight,bias}'; the Sequential
    repeats as 'repeat.N' / 'repeat_1.N' / 'repeat_2.N' (flattened to
    'repeat_N' etc.). The 1001-way ImageNet head ('classif.*' / 'last_linear.*')
    is dropped — feature trunk only."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    params: Dict[str, Any] = {}

    def _flax_path(path: str) -> str:
        parts = path.split(".")
        out = []
        i = 0
        while i < len(parts):
            p = parts[i]
            if p in ("repeat", "repeat_1", "repeat_2") and i + 1 < len(parts):
                out.append(f"{p}_{parts[i + 1]}")
                i += 2
            elif p.startswith("branch") and i + 1 < len(parts) and parts[i + 1].isdigit():
                out.append(f"{p}_{parts[i + 1]}")
                i += 2
            else:
                out.append(p)
                i += 1
        return ".".join(out)

    def _node(path: str):
        node = params
        for p in path.split("."):
            node = node.setdefault(p, {})
        return node

    for k, v in sd.items():
        if k.startswith(("classif.", "last_linear.")):
            continue
        if k.endswith(".conv.weight"):
            path = _flax_path(k[: -len(".conv.weight")])
            _node(path)["conv"] = {"kernel": conv_kernel(v)}
            _node(path)["bn"] = _inception_bn(sd, k[: -len(".conv.weight")] + ".bn")
        elif k.endswith(".conv2d.weight"):  # residual up-projection (biased conv)
            path = _flax_path(k[: -len(".conv2d.weight")])
            _node(path)["conv2d"] = {
                "kernel": conv_kernel(v),
                "bias": sd[k[: -len(".weight")] + ".bias"],
            }
    if "conv2d_1a" not in params:
        raise KeyError("state dict does not look like inception_resnet_v2")
    return {"params": params}


def convert_nima(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """NIMA checkpoint (InceptionV3 trunk + 10-way head) -> models.nima.NIMA
    params. Accepts 'module.'/'base_model.'/'backbone.'/'features.' backbone
    prefixes. The 10-way head is matched by NAME (classifier/head/fc/
    last_linear segments) first, with a shape-only fallback when exactly one
    (10, F) matrix exists — matching by shape alone would let a checkpoint's
    aux head (AuxLogits.fc.weight, (10, 768)) silently win over the real
    (10, 2048) classifier. AuxLogits.* keys are dropped before backbone
    conversion; ambiguous multiple candidates raise. Replaces pyiqa's
    InferenceModel('nima') load path (/root/reference/main.py:310)."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    backbone_sd: Dict[str, np.ndarray] = {}
    head_cands: Dict[str, np.ndarray] = {}  # base path (sans .weight) -> weight
    head_biases: Dict[str, np.ndarray] = {}

    def _is_head_name(base: str) -> bool:
        segs = base.lower().split(".")
        return any(s in ("classifier", "head", "fc", "last_linear") for s in segs)

    for k, v in sd.items():
        base = k
        for prefix in ("module.", "base_model.", "backbone.", "features.", "model."):
            if base.startswith(prefix):
                base = base[len(prefix):]
        if base.startswith("AuxLogits."):  # train-time aux head: never features
            continue
        if v.ndim == 2 and v.shape[0] == 10 and base.endswith(".weight"):
            head_cands[base[: -len(".weight")]] = v
        elif v.ndim == 1 and v.shape == (10,) and base.endswith(".bias"):
            head_biases[base[: -len(".bias")]] = v
        else:
            backbone_sd[base] = v
    named = {p: w for p, w in head_cands.items() if _is_head_name(p)}
    pick = named or head_cands
    if len(pick) > 1:
        raise KeyError(
            f"ambiguous NIMA head candidates {sorted(pick)}; expected exactly one "
            "10-way classifier (name it classifier/head/fc, or drop the extras)"
        )
    if not pick:
        raise KeyError("no 10-way NIMA head (weight (10, F) + bias (10,)) in state dict")
    ((head_path, head_w),) = pick.items()
    head_b = head_biases.pop(head_path, None)
    # non-head 10-biases (none expected in practice) go back to the backbone
    backbone_sd.update({f"{p}.bias": b for p, b in head_biases.items()})
    if head_b is None:
        raise KeyError(f"no bias matching NIMA head '{head_path}'")
    # trunk dispatch: pyiqa's stock `nima` is a Cadene/timm inception_resnet_v2
    # (conv2d_1a.* stem); torchvision-style InceptionV3 NIMAs use Conv2d_1a_3x3
    if any(k.startswith("conv2d_1a.") for k in backbone_sd):
        trunk = convert_inception_resnet(backbone_sd)["params"]
    else:
        trunk = convert_inception(backbone_sd)["params"]
    return {
        "params": {
            "backbone": trunk,
            "classifier": {"kernel": linear_kernel(head_w), "bias": head_b},
        }
    }


def convert_vgg16(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision vgg16 ('features.N.*') or taming-LPIPS ('net.sliceK.N.*' /
    'sliceK.N.*') state dict -> params for models.vgg.VGG16Features."""
    from feed_forward_vqgan_clip_tpu.models.vgg import VGG16_CHANNELS

    by_idx: Dict[int, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        parts = k.split(".")
        nums = [p for p in parts if p.isdigit()]
        if not nums or parts[-1] not in ("weight", "bias"):
            continue
        idx = int(nums[-1])
        if idx not in VGG16_CHANNELS:
            continue
        by_idx.setdefault(idx, {})[parts[-1]] = np.asarray(v, np.float32)
    params = {
        f"conv_{i}": {"kernel": conv_kernel(t["weight"]), "bias": t["bias"]}
        for i, t in by_idx.items()
    }
    missing = set(f"conv_{i}" for i in VGG16_CHANNELS) - set(params)
    if missing:
        raise KeyError(f"VGG16 conv layers missing from state dict: {sorted(missing)}")
    return {"params": params}


def convert_mixer(sd: Dict[str, np.ndarray], depth: int) -> Dict[str, Any]:
    """Reference Mixer state dict -> params for models.mappers.mixer.Mixer.

    torch layout (mlp_mixer_pytorch.py:25-91): mixer.0 = Rearrange (no params),
    mixer.1 = Linear(C->dim), mixer.(2+i) = [PreNormResidual(token Conv1d FF),
    PreNormResidual(channel Linear FF)], mixer.(2+depth) = LayerNorm; plus
    proj/final_proj. Token-mix Conv1d kernels are (out, in, 1).
    """
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

    def conv1d_kernel(w):
        return np.transpose(w[:, :, 0], (1, 0))

    params: Dict[str, Any] = {
        "proj": _dense(sd, "proj"),
        "embed": _dense(sd, "mixer.1"),
        "final_norm": _norm(sd, f"mixer.{2 + depth}"),
        "final_proj": _dense(sd, "final_proj"),
    }
    for i in range(depth):
        p = f"mixer.{2 + i}"
        params[f"block_{i}"] = {
            "token_norm": _norm(sd, f"{p}.0.norm"),
            "token_fc1": conv1d_kernel(sd[f"{p}.0.fn.0.weight"]),
            "token_fc1_bias": sd[f"{p}.0.fn.0.bias"],
            "token_fc2": conv1d_kernel(sd[f"{p}.0.fn.3.weight"]),
            "token_fc2_bias": sd[f"{p}.0.fn.3.bias"],
            "channel_norm": _norm(sd, f"{p}.1.norm"),
            "channel_fc1": _dense(sd, f"{p}.1.fn.0"),
            "channel_fc2": _dense(sd, f"{p}.1.fn.3"),
        }
    return {"params": params}


def _sln(sd, prefix):
    return {
        "gamma": sd[f"{prefix}.gamma"],
        "beta": sd[f"{prefix}.beta"],
        "ln": _norm(sd, f"{prefix}.ln"),
    }


def _vitgan_block(sd, prefix):
    return {
        "norm1": _sln(sd, f"{prefix}.norm1"),
        "norm2": _sln(sd, f"{prefix}.norm2"),
        "attn": {
            "to_qkv": {"kernel": linear_kernel(sd[f"{prefix}.attn.to_qkv.weight"])},
            "w_out": _dense(sd, f"{prefix}.attn.w_out"),
        },
        "mlp": {
            "linear1": _dense(sd, f"{prefix}.mlp.linear1"),
            "linear2": _dense(sd, f"{prefix}.mlp.linear2"),
        },
    }


def convert_vitgan_generator(sd: Dict[str, np.ndarray], blocks: int) -> Dict[str, Any]:
    """Reference VitGAN Generator state dict -> params (vitgan.py:221-260 naming:
    pos_emb1D, mlp, Transformer_Encoder.blocks.N.*, w_out.0, sln_norm)."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    params: Dict[str, Any] = {
        "pos_emb1D": sd["pos_emb1D"],
        "mlp": _dense(sd, "mlp"),
        "w_out": _dense(sd, "w_out.0"),
        "sln_norm": _sln(sd, "sln_norm"),
    }
    for i in range(blocks):
        params[f"block_{i}"] = _vitgan_block(sd, f"Transformer_Encoder.blocks.{i}")
    if "inp.weight" in sd:  # SimpleGenerator (vitgan.py:286)
        params["inp"] = _dense(sd, "inp")
    return {"params": params}


def convert_vitgan_discriminator(sd: Dict[str, np.ndarray], blocks: int) -> Dict[str, Any]:
    """Reference VitGAN Discriminator state dict -> params (vitgan.py:307-357
    naming: project_patches, cls_token, pos_emb1D, Transformer_Encoder.blocks.N
    with plain LayerNorms and the discriminator L2 attention, mlp_head.{0,1}).

    `init_spect_norm` is seeded from the LOADED to_qkv weight's max singular
    value. torch's attribute keeps the value computed from the pre-load RANDOM
    init (vitgan.py:69-71 runs in __init__, and the attribute is not part of
    the state dict), which is construction-RNG-dependent and unreproducible —
    this deterministic reading is the documented deviation (see
    models/mappers/vitgan.DiscriminatorAttention)."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    params: Dict[str, Any] = {
        "project_patches": _dense(sd, "project_patches"),
        "cls_token": sd["cls_token"],
        "pos_emb1D": sd["pos_emb1D"],
        "head_norm": _norm(sd, "mlp_head.0"),
        "head": _dense(sd, "mlp_head.1"),
    }
    for i in range(blocks):
        prefix = f"Transformer_Encoder.blocks.{i}"
        qkv = linear_kernel(sd[f"{prefix}.attn.to_qkv.weight"])
        params[f"block_{i}"] = {
            "norm1": _norm(sd, f"{prefix}.norm1"),
            "norm2": _norm(sd, f"{prefix}.norm2"),
            "attn": {
                "to_qkv_kernel": qkv,
                "init_spect_norm": np.linalg.svd(qkv, compute_uv=False)[0].astype(
                    np.float32
                ),
                "w_out": _dense(sd, f"{prefix}.attn.w_out"),
            },
            "mlp": {
                "linear1": _dense(sd, f"{prefix}.mlp.linear1"),
                "linear2": _dense(sd, f"{prefix}.mlp.linear2"),
            },
        }
    return {"params": params}


def convert_sine_layer(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference SineLayer state dict (vitgan.py:196-218: one nn.Linear) ->
    params for models.mappers.vitgan.SineLayer."""
    return {"params": {"linear": _dense({k: np.asarray(v, np.float32) for k, v in sd.items()}, "linear")}}


def convert_xtransformer(sd: Dict[str, np.ndarray], depth: int) -> Dict[str, Any]:
    """Reference XTransformer state dict (lucidrains x-transformers==0.19.1
    internals, /root/reference/transformer.py:12-24) -> params for
    models.mappers.xtransformer.XTransformer.

    Key layout at that pin: outer `proj` (initial_proj mode only);
    `transformer.project_in`; `transformer.pos_emb.emb.weight`
    (AbsolutePositionalEmbedding's nn.Embedding); per block i the decoder
    alternates attention (layers.{2i}) and feed-forward (layers.{2i+1}), each a
    ModuleList [LayerNorm, layer, Residual] so the LN is `.0` and the layer
    `.1`; attention has bias-free to_q/to_k/to_v and biased to_out; the FF nests
    as net.0.0 (Linear inside Sequential(Linear, GELU)) and net.2;
    `transformer.norm` + `transformer.project_out` close the wrapper."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    t = "transformer"
    params: Dict[str, Any] = {
        "project_in": _dense(sd, f"{t}.project_in"),
        "final_norm": _layernorm(sd, f"{t}.norm"),
        "project_out": _dense(sd, f"{t}.project_out"),
    }
    if f"{t}.pos_emb.emb.weight" in sd:
        params["pos_emb"] = sd[f"{t}.pos_emb.emb.weight"]
    else:  # some versions flatten the embedding onto pos_emb directly
        params["pos_emb"] = sd[f"{t}.pos_emb.weight"]
    if "proj.weight" in sd:
        params["proj"] = _dense(sd, "proj")
        # transformer.py:15 sizes the pos table n + (0 if add_input else 1)
        # UNCONDITIONALLY, so an initial_proj=True + add_input=False checkpoint
        # carries one unused trailing row (sequence length is n in that mode);
        # AbsolutePositionalEmbedding indexes arange(seq_len), i.e. the first
        # rows — truncate to the used length.
        dim = sd[f"{t}.project_in.weight"].shape[0]
        n = params["proj"]["bias"].shape[0] // dim
        params["pos_emb"] = params["pos_emb"][:n]
    for i in range(depth):
        a = f"{t}.attn_layers.layers.{2 * i}"
        f = f"{t}.attn_layers.layers.{2 * i + 1}"
        params[f"block_{i}"] = {
            "ln_attn": _layernorm(sd, f"{a}.0"),
            "attn": {
                "to_q": {"kernel": linear_kernel(sd[f"{a}.1.to_q.weight"])},
                "to_k": {"kernel": linear_kernel(sd[f"{a}.1.to_k.weight"])},
                "to_v": {"kernel": linear_kernel(sd[f"{a}.1.to_v.weight"])},
                "to_out": _dense(sd, f"{a}.1.to_out"),
            },
            "ln_ff": _layernorm(sd, f"{f}.0"),
            "ff1": _dense(sd, f"{f}.1.net.0.0"),
            "ff2": _dense(sd, f"{f}.1.net.2"),
        }
    return {"params": params}


def convert_vqgan(sd: Dict[str, np.ndarray], config: dict) -> Dict[str, Any]:
    """taming VQModel state dict -> params for models.vqgan.VQGAN.

    taming naming: quantize.embedding.weight, post_quant_conv.*, decoder.conv_in.*,
    decoder.mid.{block_1,attn_1,block_2}.*, decoder.up.{level}.block.{i}.*,
    decoder.up.{level}.attn.{i}.*, decoder.up.{level}.upsample.conv.*,
    decoder.{norm_out,conv_out}.*  (GumbelVQ aliases quantize.embed ->
    quantize.embedding, reference main.py:94).
    """
    # Net2NetTransformer checkpoints carry the VQGAN under `first_stage_model.`
    # (the reference loads the wrapper and takes .first_stage_model, main.py:95-99)
    if any(k.startswith("first_stage_model.") for k in sd):
        sd = {
            k[len("first_stage_model."):]: v
            for k, v in sd.items()
            if k.startswith("first_stage_model.")
        }
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
