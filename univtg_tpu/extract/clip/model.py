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
    # int -> ViT depth; tuple -> ModifiedResNet stage block counts (RN50 =
    # (3, 4, 6, 3); reference model.py:93-150 selects the tower the same way)
    vision_layers: object = 12
    vision_width: int = 768
    vision_patch_size: int = 32  # ViT only
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    compute_dtype: str = "float32"

    @property
    def is_resnet(self):
        return isinstance(self.vision_layers, (tuple, list))

    @property
    def vision_heads(self):
        if self.is_resnet:  # attnpool heads (model.py:127: width*32//64)
            return self.vision_width * 32 // 64
        return self.vision_width // 64

    @property
    def grid(self):
        return self.image_resolution // self.vision_patch_size


def vit_b32():
    return CLIPConfig()


def vit_b16():
    return CLIPConfig(vision_patch_size=16)


def rn50():
    return CLIPConfig(
        embed_dim=1024,
        vision_layers=(3, 4, 6, 3),
        vision_width=64,
        vision_patch_size=0,
    )


def rn101():
    return CLIPConfig(
        embed_dim=512,
        vision_layers=(3, 4, 23, 3),
        vision_width=64,
        vision_patch_size=0,
    )


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


class FrozenBatchNorm(nn.Module):
    """Inference-mode batch norm with converted running statistics as params
    (this is a runtime encoder for released weights -- never trained here, so
    no mutable batch_stats collection). eps matches torch BatchNorm2d."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = (scale * jax.lax.rsqrt(var + 1e-5)).astype(self.dtype)
        return x * inv + (bias - mean * scale * jax.lax.rsqrt(var + 1e-5)).astype(
            self.dtype
        )


def _conv(features, kernel, stride, dtype, name):
    pad = ((kernel // 2, kernel // 2),) * 2  # torch padding=k//2 semantics
    return nn.Conv(
        features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=pad,
        use_bias=False,
        dtype=dtype,
        name=name,
    )


class Bottleneck(nn.Module):
    """Anti-aliased CLIP bottleneck: all convs stride 1; spatial reduction is
    an avg-pool after conv2 (and prepended to the 1x1 downsample), matching
    run_on_video/clip/model.py:10-53."""
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inplanes = x.shape[-1]
        out_ch = self.planes * 4
        h = nn.relu(FrozenBatchNorm(self.planes, self.dtype, name="bn1")(
            _conv(self.planes, 1, 1, self.dtype, "conv1")(x)))
        h = nn.relu(FrozenBatchNorm(self.planes, self.dtype, name="bn2")(
            _conv(self.planes, 3, 1, self.dtype, "conv2")(h)))
        if self.stride > 1:
            h = nn.avg_pool(h, (self.stride,) * 2, (self.stride,) * 2)
        h = FrozenBatchNorm(out_ch, self.dtype, name="bn3")(
            _conv(out_ch, 1, 1, self.dtype, "conv3")(h))
        identity = x
        if self.stride > 1 or inplanes != out_ch:
            identity = x
            if self.stride > 1:
                identity = nn.avg_pool(
                    identity, (self.stride,) * 2, (self.stride,) * 2
                )
            identity = FrozenBatchNorm(out_ch, self.dtype, name="downsample_bn")(
                _conv(out_ch, 1, 1, self.dtype, "downsample_conv")(identity))
        return nn.relu(h + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pooling (model.py:56-91). Only the mean-token query's
    output is consumed (torch returns x[0]), so attention is computed with a
    SINGLE query row -- same math, HW x fewer score FLOPs."""
    num_heads: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        mean = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # (B, HW+1, C)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(C**-0.5),
            (H * W + 1, C),
        )
        tokens = tokens + pos.astype(self.dtype)
        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(tokens[:, :1])
        k = nn.Dense(C, dtype=self.dtype, name="k_proj")(tokens)
        v = nn.Dense(C, dtype=self.dtype, name="v_proj")(tokens)
        Hn, dh = self.num_heads, C // self.num_heads
        q = q.reshape(B, 1, Hn, dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, Hn, dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, Hn, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q * (dh**-0.5), k, preferred_element_type=jnp.float32
        )
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
        ).transpose(0, 2, 1, 3).reshape(B, 1, C).astype(self.dtype)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(attn)[:, 0]


class ModifiedResNet(nn.Module):
    """CLIP's ResNet tower (RN50/RN101 releases): 3-conv stem with avg-pool,
    anti-aliased bottlenecks, attention pooling (model.py:93-150)."""
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, images):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        w = cfg.vision_width
        x = images.astype(dtype)
        x = nn.relu(FrozenBatchNorm(w // 2, dtype, name="bn1")(
            _conv(w // 2, 3, 2, dtype, "conv1")(x)))
        x = nn.relu(FrozenBatchNorm(w // 2, dtype, name="bn2")(
            _conv(w // 2, 3, 1, dtype, "conv2")(x)))
        x = nn.relu(FrozenBatchNorm(w, dtype, name="bn3")(
            _conv(w, 3, 1, dtype, "conv3")(x)))
        x = nn.avg_pool(x, (2, 2), (2, 2))
        for stage, blocks in enumerate(cfg.vision_layers):
            planes = w * (2**stage)
            for i in range(blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = Bottleneck(
                    planes, stride, dtype, name=f"layer{stage + 1}_{i}"
                )(x)
        return AttentionPool2d(
            cfg.vision_heads, cfg.embed_dim, dtype, name="attnpool"
        )(x)


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
        tower = ModifiedResNet if self.cfg.is_resnet else VisionTower
        self.visual = tower(self.cfg, name="visual")
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
