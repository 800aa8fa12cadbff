"""OpenAI CLIP checkpoint -> JAX param mapping (ViT variants).

Accepts the released state_dict layout (run_on_video/clip/model.py:395+
builds from the same dict) and emits params for univtg_tpu.extract.clip.CLIP.
"""
from __future__ import annotations

import numpy as np

from univtg_tpu.extract.clip.model import CLIPConfig


def _np(t):
    # always copy (shared-storage hazard; see interop/torch_ckpt.py)
    if hasattr(t, "detach"):
        return t.detach().cpu().float().numpy().copy()
    return np.array(t)


def _block(sd, prefix):
    return {
        "in_proj_kernel": _np(sd[f"{prefix}.attn.in_proj_weight"]).T,
        "in_proj_bias": _np(sd[f"{prefix}.attn.in_proj_bias"]),
        "out_kernel": _np(sd[f"{prefix}.attn.out_proj.weight"]).T,
        "out_bias": _np(sd[f"{prefix}.attn.out_proj.bias"]),
        "ln_1": {"scale": _np(sd[f"{prefix}.ln_1.weight"]), "bias": _np(sd[f"{prefix}.ln_1.bias"])},
        "ln_2": {"scale": _np(sd[f"{prefix}.ln_2.weight"]), "bias": _np(sd[f"{prefix}.ln_2.bias"])},
        "c_fc": {"kernel": _np(sd[f"{prefix}.mlp.c_fc.weight"]).T, "bias": _np(sd[f"{prefix}.mlp.c_fc.bias"])},
        "c_proj": {"kernel": _np(sd[f"{prefix}.mlp.c_proj.weight"]).T, "bias": _np(sd[f"{prefix}.mlp.c_proj.bias"])},
    }


def config_from_state_dict(sd) -> CLIPConfig:
    """Infer the architecture (ViT or ModifiedResNet) from a released
    state_dict (mirrors run_on_video/clip/model.py:395-420)."""
    if "visual.layer1.0.conv1.weight" in sd:  # ResNet releases (RN50/RN101/…)
        counts = []
        for stage in (1, 2, 3, 4):
            n = len(
                {
                    k.split(".")[2]
                    for k in sd
                    if k.startswith(f"visual.layer{stage}.")
                }
            )
            counts.append(n)
        width = _np(sd["visual.conv1.weight"]).shape[0] * 2  # stem conv1 = w//2
        out_grid = round(
            (_np(sd["visual.attnpool.positional_embedding"]).shape[0] - 1) ** 0.5
        )
        return CLIPConfig(
            embed_dim=_np(sd["text_projection"]).shape[1],
            image_resolution=out_grid * 32,
            vision_layers=tuple(counts),
            vision_width=width,
            vision_patch_size=0,
            context_length=_np(sd["positional_embedding"]).shape[0],
            vocab_size=_np(sd["token_embedding.weight"]).shape[0],
            transformer_width=_np(sd["ln_final.weight"]).shape[0],
            transformer_heads=_np(sd["ln_final.weight"]).shape[0] // 64,
            transformer_layers=len(
                {
                    k.split(".")[2]
                    for k in sd
                    if k.startswith("transformer.resblocks")
                }
            ),
        )
    vision_width = _np(sd["visual.conv1.weight"]).shape[0]
    patch = _np(sd["visual.conv1.weight"]).shape[-1]
    vision_layers = len(
        {k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks")}
    )
    grid = round((_np(sd["visual.positional_embedding"]).shape[0] - 1) ** 0.5)
    return CLIPConfig(
        embed_dim=_np(sd["text_projection"]).shape[1],
        image_resolution=grid * patch,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=patch,
        context_length=_np(sd["positional_embedding"]).shape[0],
        vocab_size=_np(sd["token_embedding.weight"]).shape[0],
        transformer_width=_np(sd["ln_final.weight"]).shape[0],
        transformer_heads=_np(sd["ln_final.weight"]).shape[0] // 64,
        transformer_layers=len(
            {
                k.split(".")[2]
                for k in sd
                if k.startswith("transformer.resblocks")
            }
        ),
    )


def _conv2d(sd, prefix):
    # torch (out, in, kh, kw) -> flax NHWC kernel (kh, kw, in, out)
    return {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}


def _bn(sd, prefix):
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }


def _dense_t(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).T, "bias": _np(sd[f"{prefix}.bias"])}


def _resnet_visual(sd, cfg: CLIPConfig):
    visual = {
        "conv1": _conv2d(sd, "visual.conv1"),
        "bn1": _bn(sd, "visual.bn1"),
        "conv2": _conv2d(sd, "visual.conv2"),
        "bn2": _bn(sd, "visual.bn2"),
        "conv3": _conv2d(sd, "visual.conv3"),
        "bn3": _bn(sd, "visual.bn3"),
        "attnpool": {
            "positional_embedding": _np(sd["visual.attnpool.positional_embedding"]),
            "q_proj": _dense_t(sd, "visual.attnpool.q_proj"),
            "k_proj": _dense_t(sd, "visual.attnpool.k_proj"),
            "v_proj": _dense_t(sd, "visual.attnpool.v_proj"),
            "c_proj": _dense_t(sd, "visual.attnpool.c_proj"),
        },
    }
    for stage, blocks in enumerate(cfg.vision_layers):
        for i in range(blocks):
            p = f"visual.layer{stage + 1}.{i}"
            block = {
                "conv1": _conv2d(sd, f"{p}.conv1"),
                "bn1": _bn(sd, f"{p}.bn1"),
                "conv2": _conv2d(sd, f"{p}.conv2"),
                "bn2": _bn(sd, f"{p}.bn2"),
                "conv3": _conv2d(sd, f"{p}.conv3"),
                "bn3": _bn(sd, f"{p}.bn3"),
            }
            if f"{p}.downsample.0.weight" in sd:
                block["downsample_conv"] = _conv2d(sd, f"{p}.downsample.0")
                block["downsample_bn"] = _bn(sd, f"{p}.downsample.1")
            visual[f"layer{stage + 1}_{i}"] = block
    return visual


def _text_params(sd, cfg: CLIPConfig):
    """Text tower conversion, shared by the ViT and ResNet CLIP variants."""
    text = {
        "token_embedding": _np(sd["token_embedding.weight"]),
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_final": {
            "scale": _np(sd["ln_final.weight"]),
            "bias": _np(sd["ln_final.bias"]),
        },
        "text_projection": _np(sd["text_projection"]),
    }
    for i in range(cfg.transformer_layers):
        text[f"resblocks_{i}"] = _block(sd, f"transformer.resblocks.{i}")
    return text


def clip_params_from_torch_state_dict(sd, cfg: CLIPConfig):
    if cfg.is_resnet:
        visual = _resnet_visual(sd, cfg)
    else:
        visual = {
            "conv1": {"kernel": _np(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)},
            "class_embedding": _np(sd["visual.class_embedding"]),
            "positional_embedding": _np(sd["visual.positional_embedding"]),
            "ln_pre": {
                "scale": _np(sd["visual.ln_pre.weight"]),
                "bias": _np(sd["visual.ln_pre.bias"]),
            },
            "ln_post": {
                "scale": _np(sd["visual.ln_post.weight"]),
                "bias": _np(sd["visual.ln_post.bias"]),
            },
            "proj": _np(sd["visual.proj"]),
        }
        for i in range(cfg.vision_layers):
            visual[f"resblocks_{i}"] = _block(sd, f"visual.transformer.resblocks.{i}")

    return {
        "params": {
            "visual": visual,
            "text": _text_params(sd, cfg),
            "logit_scale": _np(sd["logit_scale"]),
        }
    }


def load_clip_checkpoint(path):
    """Load a released CLIP .pt (jit archive or plain state_dict)."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except Exception:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    cfg = config_from_state_dict(sd)
    return clip_params_from_torch_state_dict(sd, cfg), cfg
