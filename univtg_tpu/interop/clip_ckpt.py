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
    """Infer the ViT architecture from a released state_dict
    (mirrors run_on_video/clip/model.py:395-420)."""
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


def clip_params_from_torch_state_dict(sd, cfg: CLIPConfig):
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

    return {
        "params": {
            "visual": visual,
            "text": text,
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
