"""PyTorch -> JAX checkpoint interop for released UniVTG weights.

Maps the reference Model's state_dict (model/univtg.py:51-103 layout; ckpt
container format documented at main/train_mr.py:149-187 / main/config.py:
362-374) onto this framework's param pytree. Layout rules:

  torch Linear weight (out, in)    -> dense kernel (in, out)      [transpose]
  torch Conv1d weight (out, in, k) -> conv kernel (k, in, out)    [perm 2,1,0]
  torch MHA in_proj_weight (3D, D) -> in_proj_kernel (D, 3D)      [transpose]
  LayerNorm weight/bias            -> scale/bias                  [as-is]
"""
from __future__ import annotations

import numpy as np


def _np(t):
    # always copy: torch .numpy() shares storage with the live tensor, so
    # in-place torch updates would silently mutate the mapped params
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy().copy()
    return np.array(t)


def _dense(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).T, "bias": _np(sd[f"{prefix}.bias"])}


def _norm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _conv(sd, prefix):
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 1, 0),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _input_proj(sd, prefix, n_layers):
    out = {}
    for i in range(n_layers):
        out[f"layers_{i}"] = {
            "norm": _norm(sd, f"{prefix}.{i}.LayerNorm"),
            "dense": _dense(sd, f"{prefix}.{i}.net.1"),
        }
    return out


def _encoder_layer(sd, prefix):
    return {
        "in_proj_kernel": _np(sd[f"{prefix}.self_attn.in_proj_weight"]).T,
        "in_proj_bias": _np(sd[f"{prefix}.self_attn.in_proj_bias"]),
        "out_kernel": _np(sd[f"{prefix}.self_attn.out_proj.weight"]).T,
        "out_bias": _np(sd[f"{prefix}.self_attn.out_proj.bias"]),
        "linear1": _dense(sd, f"{prefix}.linear1"),
        "linear2": _dense(sd, f"{prefix}.linear2"),
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
    }


def params_from_torch_state_dict(state_dict, cfg):
    """Build this framework's UniVTG param pytree from a torch state_dict.

    Args:
      state_dict: mapping of torch parameter names to tensors/arrays; DDP
        'module.' prefixes are stripped (main/config.py:366-367).
      cfg: ModelConfig matching the checkpoint's architecture.
    Returns:
      {'params': ...} pytree for UniVTG.apply.
    """
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}

    params = {
        "input_vid_proj": _input_proj(sd, "input_vid_proj", cfg.n_input_proj),
        "input_txt_proj": _input_proj(sd, "input_txt_proj", cfg.n_input_proj),
        "token_type_embedding": _np(sd["token_type_embeddings.weight"]),
        "encoder": {},
        "class_head": {},
        "span_head": {},
        "weighted_pool": {"w": _np(sd["weightedpool.weight"])},
    }
    for i in range(cfg.num_layers):
        params["encoder"][f"layers_{i}"] = _encoder_layer(
            sd, f"transformer.encoder.layers.{i}"
        )
    for i in range(3):
        params["class_head"][f"conv_{i}"] = _conv(sd, f"class_embed.layers.{i}")
        params["span_head"][f"conv_{i}"] = _conv(sd, f"span_embed.layers.{i}")
    if cfg.use_txt_pos:
        params["txt_pos"] = {
            "embedding": _np(sd["txt_position_embed.position_embeddings.weight"]),
            "norm": _norm(sd, "txt_position_embed.LayerNorm"),
        }
    return {"params": params}


def _mha(sd, prefix):
    return {
        "in_proj_kernel": _np(sd[f"{prefix}.in_proj_weight"]).T,
        "in_proj_bias": _np(sd[f"{prefix}.in_proj_bias"]),
        "out_kernel": _np(sd[f"{prefix}.out_proj.weight"]).T,
        "out_bias": _np(sd[f"{prefix}.out_proj.bias"]),
    }


def md_params_from_torch_state_dict(state_dict, cfg):
    """Moment-DETR param mapping (model/moment_detr.py + model/transformer.py
    layouts -> univtg_tpu.models.moment_detr.MomentDETR)."""
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    params = {
        "input_vid_proj": _input_proj(sd, "input_vid_proj", cfg.n_input_proj),
        "input_txt_proj": _input_proj(sd, "input_txt_proj", cfg.n_input_proj),
        "query_embed": _np(sd["query_embed.weight"]),
        "class_embed": _dense(sd, "class_embed"),
        "span_embed": {},
        "saliency_proj": _dense(sd, "saliency_proj"),
        "decoder_norm": _norm(sd, "transformer.decoder.norm"),
    }
    for i in range(3):
        params["span_embed"][f"dense_{i}"] = _dense(sd, f"span_embed.layers.{i}")
    for i in range(cfg.num_layers):
        p = f"transformer.encoder.layers.{i}"
        params[f"encoder_layers_{i}"] = {
            "self_attn": _mha(sd, f"{p}.self_attn"),
            "linear1": _dense(sd, f"{p}.linear1"),
            "linear2": _dense(sd, f"{p}.linear2"),
            "norm1": _norm(sd, f"{p}.norm1"),
            "norm2": _norm(sd, f"{p}.norm2"),
        }
    for i in range(cfg.num_decoder_layers):
        p = f"transformer.decoder.layers.{i}"
        params[f"decoder_layers_{i}"] = {
            "self_attn": _mha(sd, f"{p}.self_attn"),
            "cross_attn": _mha(sd, f"{p}.multihead_attn"),
            "linear1": _dense(sd, f"{p}.linear1"),
            "linear2": _dense(sd, f"{p}.linear2"),
            "norm1": _norm(sd, f"{p}.norm1"),
            "norm2": _norm(sd, f"{p}.norm2"),
            "norm3": _norm(sd, f"{p}.norm3"),
        }
    if cfg.use_txt_pos:
        params["txt_pos"] = {
            "embedding": _np(sd["txt_position_embed.position_embeddings.weight"]),
            "norm": _norm(sd, "txt_position_embed.LayerNorm"),
        }
    if cfg.contrastive_align:
        params["ca_query"] = _dense(sd, "contrastive_align_projection_query")
        params["ca_txt"] = _dense(sd, "contrastive_align_projection_txt")
        params["ca_vid"] = _dense(sd, "contrastive_align_projection_vid")
    return {"params": params}


def load_torch_checkpoint(path, cfg):
    """Load a released UniVTG .ckpt file ({'model': state_dict, 'opt': ...})."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = blob["model"] if isinstance(blob, dict) and "model" in blob else blob
    return params_from_torch_state_dict(state_dict, cfg)


def config_from_reference_opt(opt: dict):
    """ModelConfig from a reference run's saved opt.json / in-ckpt opt dict
    (the flag surface BaseOptions serializes, main/config.py:206-213; note
    v_feat_dim is stored post-TEF-bump, config.py:287-292, so it maps to
    vid_dim directly)."""
    from univtg_tpu.models import ModelConfig

    def get(k, default):
        v = opt.get(k, default)
        return default if v is None else v

    return ModelConfig(
        vid_dim=opt["v_feat_dim"],
        txt_dim=opt["t_feat_dim"],
        hidden_dim=get("hidden_dim", 256),
        num_layers=get("enc_layers", 4),
        num_heads=get("nheads", 8),
        ffn_dim=get("dim_feedforward", 1024),
        dropout=get("dropout", 0.1),
        droppath=get("droppath", 0.1),
        input_dropout=get("input_dropout", 0.5),
        n_input_proj=get("n_input_proj", 2),
        span_loss_type=get("span_loss_type", "l1"),
        max_v_l=get("max_v_l", 75),
        max_q_l=get("max_q_l", 75),
        use_txt_pos=bool(get("use_txt_pos", False)),
    )


def load_reference_run(ckpt_path, opt_json_path=None):
    """(ModelConfig, params) from a released checkpoint directory: the model
    architecture is reconstructed from the saved opt.json next to the ckpt
    (the reference's TestOptions flow, main/config.py:233-247 + 362-374) or,
    failing that, from the 'opt' dict inside the checkpoint container."""
    import json
    import os

    import torch

    blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    opt = None
    if opt_json_path is None:
        cand = os.path.join(os.path.dirname(ckpt_path) or ".", "opt.json")
        opt_json_path = cand if os.path.exists(cand) else None
    if opt_json_path is not None:
        with open(opt_json_path) as f:
            opt = json.load(f)
    elif isinstance(blob, dict) and isinstance(blob.get("opt"), dict):
        opt = blob["opt"]
    if opt is None:
        raise FileNotFoundError(
            f"no opt.json next to {ckpt_path} and no 'opt' dict inside the "
            f"checkpoint; pass opt_json_path explicitly"
        )
    cfg = config_from_reference_opt(opt)
    state_dict = blob["model"] if isinstance(blob, dict) and "model" in blob else blob
    return cfg, params_from_torch_state_dict(state_dict, cfg)
