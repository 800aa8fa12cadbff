"""CLIP in JAX: ViT image tower + causal text transformer.

Runtime encoder for on-the-fly feature extraction (the reference vendors
OpenAI CLIP under run_on_video/clip/model.py; ViT path at :202-237, text
tower at :339-352). Two framework-specific properties are preserved:

  * `encode_text` returns BOTH last_hidden_state (all positions after
    ln_final) and pooler_output (EOT token @ text_projection) -- the
    grounding model consumes last_hidden_state (model.py:339-352).
  * Inference is batched and jitted; the reference's frame-at-a-time demo
    loop (video_extractor.py:58-63) becomes one MXU-friendly batch.

Weight interop from OpenAI releases: univtg_tpu/interop/clip_ckpt.py.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from univtg_tpu.models.layers import LN_EPS
from univtg_tpu.ops.attention import multihead_attention


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    image_resolution: int = 224
    vision_layers: int = 12
    vision_width: int = 768
    vision_patch_size: int = 32
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    compute_dtype: str = "float32"

    @property
    def vision_heads(self):
        return self.vision_width // 64

    @property
    def grid(self):
        return self.image_resolution // self.vision_patch_size


def vit_b32():
    return CLIPConfig()


def vit_b16():
    return CLIPConfig(vision_patch_size=16)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    causal: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_proj_kernel = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (self.width, 3 * self.width)
        )
        in_proj_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * self.width,))
        out_kernel = self.param(
            "out_kernel", nn.initializers.xavier_uniform(), (self.width, self.width)
        )
        out_bias = self.param("out_bias", nn.initializers.zeros, (self.width,))

        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_1")(x)
        D = self.width
        q = h @ in_proj_kernel[:, :D] + in_proj_bias[:D]
        k = h @ in_proj_kernel[:, D : 2 * D] + in_proj_bias[D : 2 * D]
        v = h @ in_proj_kernel[:, 2 * D :] + in_proj_bias[2 * D :]
        B, L, _ = h.shape
        H = self.heads
        dh = D // H
        q = q.reshape(B, L, H, dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, H, dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, H, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q * (dh**-0.5), k, preferred_element_type=jnp.float32
        )
        if self.causal:
            causal = jnp.tril(jnp.ones((L, L), bool))
            scores = jnp.where(causal[None, None], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = (
            jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32)
            .transpose(0, 2, 1, 3)
            .reshape(B, L, D)
            .astype(x.dtype)
        )
        x = x + (attn @ out_kernel + out_bias)

        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="c_fc")(h)
        h = h * nn.sigmoid(1.702 * h)  # QuickGELU (clip/model.py:166-168)
        h = nn.Dense(self.width, dtype=self.dtype, name="c_proj")(h)
        return x + h


class VisionTower(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, images):
        """images: (B, H, W, 3) normalized pixels -> (B, embed_dim)."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        x = nn.Conv(
            cfg.vision_width,
            kernel_size=(cfg.vision_patch_size, cfg.vision_patch_size),
            strides=(cfg.vision_patch_size, cfg.vision_patch_size),
            use_bias=False,
            dtype=dtype,
            name="conv1",
        )(images.astype(dtype))
        B = x.shape[0]
        x = x.reshape(B, -1, cfg.vision_width)  # (B, grid^2, width)
        cls = self.param(
            "class_embedding",
            nn.initializers.normal(cfg.vision_width**-0.5),
            (cfg.vision_width,),
        )
        x = jnp.concatenate([jnp.tile(cls[None, None], (B, 1, 1)).astype(dtype), x], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(cfg.vision_width**-0.5),
            (cfg.grid**2 + 1, cfg.vision_width),
        )
        x = x + pos.astype(dtype)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, name="ln_pre")(x)
        for i in range(cfg.vision_layers):
            x = ResidualAttentionBlock(
                cfg.vision_width, cfg.vision_heads, causal=False, dtype=dtype,
                name=f"resblocks_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, name="ln_post")(x[:, 0, :])
        proj = self.param(
            "proj",
            nn.initializers.normal(cfg.vision_width**-0.5),
            (cfg.vision_width, cfg.embed_dim),
        )
        return x @ proj.astype(dtype)


class TextTower(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, tokens):
        """tokens: (B, context_length) int32 -> {last_hidden_state, pooler_output}."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        table = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.transformer_width),
        )
        x = table[tokens].astype(dtype)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.context_length, cfg.transformer_width),
        )
        x = x + pos[: x.shape[1]].astype(dtype)
        for i in range(cfg.transformer_layers):
            x = ResidualAttentionBlock(
                cfg.transformer_width, cfg.transformer_heads, causal=True, dtype=dtype,
                name=f"resblocks_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, name="ln_final")(x)
        text_proj = self.param(
            "text_projection",
            nn.initializers.normal(cfg.transformer_width**-0.5),
            (cfg.transformer_width, cfg.embed_dim),
        )
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot] @ text_proj.astype(dtype)
        return {"last_hidden_state": x, "pooler_output": pooled}


class CLIP(nn.Module):
    cfg: CLIPConfig

    def setup(self):
        self.visual = VisionTower(self.cfg, name="visual")
        self.text = TextTower(self.cfg, name="text")
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(jnp.log(1 / 0.07)), ()
        )

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, images, tokens):
        img = self.encode_image(images)
        txt = self.encode_text(tokens)["pooler_output"]
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        return scale * img @ txt.T
