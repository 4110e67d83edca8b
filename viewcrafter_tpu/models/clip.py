"""OpenCLIP ViT-H/14 text and vision towers (conditioning encoders).

Parity targets:
  - text tower, penultimate layer + ln_final, causal mask
    (lvdm/modules/encoders/condition.py:174-234: runs 23 of 24 resblocks, then
    ln_final);
  - vision tower returning all 257 pre-pool spatial tokens, no ln_post
    (condition.py:295-372), with bicubic 224x224 resize + CLIP normalization
    (condition.py:322-330).

Architecture follows the open_clip ViT definition: pre-LN residual attention
blocks, packed qkv with bias, GELU MLP (4x width).

TPU notes: tokens stay (B, S, C); qkv is one fused matmul; LayerNorm/softmax
fp32, matmuls bf16.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from viewcrafter_tpu.config import CLIPTextConfig, CLIPVisionConfig
from viewcrafter_tpu.models.layers import Dense, LayerNormF32
from viewcrafter_tpu.ops.attention import attention

Dtype = Any

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


class CLIPBlock(nn.Module):
    width: int
    heads: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None):
        b, s, c = x.shape
        d = self.width // self.heads
        h = LayerNormF32(name="ln_1")(x)
        qkv = Dense(3 * self.width, dtype=self.dtype, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        o = attention(
            q.reshape(b, s, self.heads, d),
            k.reshape(b, s, self.heads, d),
            v.reshape(b, s, self.heads, d),
            mask=mask,
            impl="xla",
        ).reshape(b, s, c)
        x = x + Dense(self.width, dtype=self.dtype, name="out_proj")(o)
        h = LayerNormF32(name="ln_2")(x)
        h = Dense(4 * self.width, dtype=self.dtype, name="c_fc")(h)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
        x = x + Dense(self.width, dtype=self.dtype, name="c_proj")(h)
        return x


class CLIPTextEncoder(nn.Module):
    """Token ids (B, 77) -> context tokens (B, 77, width)."""

    cfg: CLIPTextConfig = CLIPTextConfig()
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens):
        cfg = self.cfg
        emb = nn.Embed(
            cfg.vocab_size, cfg.width, param_dtype=jnp.float32, dtype=self.dtype,
            name="token_embedding",
        )(tokens)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
            jnp.float32,
        )
        x = emb + pos.astype(self.dtype)
        causal = jnp.tril(jnp.ones((cfg.context_length, cfg.context_length), bool))[None, None]
        n_blocks = cfg.layers - (1 if cfg.penultimate else 0)
        for i in range(cfg.layers):
            if i < n_blocks:
                x = CLIPBlock(cfg.width, cfg.heads, dtype=self.dtype, name=f"block_{i}")(x, causal)
            elif self.is_initializing():
                # materialize the skipped final block's params (output unused)
                # so checkpoints load whole; never executed at apply time
                CLIPBlock(cfg.width, cfg.heads, dtype=self.dtype, name=f"block_{i}")(x, causal)
        return LayerNormF32(name="ln_final")(x).astype(jnp.float32)


class CLIPVisionEncoder(nn.Module):
    """Preprocessed images (B, 224, 224, 3) -> all tokens (B, 257, width)."""

    cfg: CLIPVisionConfig = CLIPVisionConfig()
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        grid = cfg.image_size // cfg.patch_size
        h = nn.Conv(
            cfg.width,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=cfg.patch_size,
            use_bias=False,
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv1",
        )(x.astype(self.dtype))
        h = h.reshape(x.shape[0], grid * grid, cfg.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.01), (cfg.width,), jnp.float32)
        cls_tok = jnp.broadcast_to(cls.astype(self.dtype), (x.shape[0], 1, cfg.width))
        h = jnp.concatenate([cls_tok, h], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (grid * grid + 1, cfg.width),
            jnp.float32,
        )
        h = h + pos.astype(self.dtype)
        h = LayerNormF32(name="ln_pre")(h)
        for i in range(cfg.layers):
            h = CLIPBlock(cfg.width, cfg.heads, dtype=self.dtype, name=f"block_{i}")(h)
        return h.astype(jnp.float32)  # no ln_post: raw pre-pool tokens


def clip_preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) in [-1, 1] -> (B, 224, 224, 3) CLIP-normalized.

    Bicubic resize mirrors kornia.geometry.resize(..., 'bicubic')
    (condition.py:322-330); jax.image's cubic kernel matches to within
    interpolation tolerance.
    """
    b = images.shape[0]
    x = jax.image.resize(images.astype(jnp.float32), (b, 224, 224, 3), method="cubic")
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return (x - mean) / std
