"""IP-Adapter-style Perceiver Resampler projecting CLIP image tokens to UNet
cross-attention context.

Parity with the reference (lvdm/modules/encoders/resampler.py:48-145):
  - learned latent queries, `num_queries * video_length` of them when
    frame-wise (16*16=256 in the shipped configs);
  - PerceiverAttention: pre-LN on both streams, kv over concat(image_tokens,
    latents), symmetric 1/sqrt(sqrt(d)) scaling on q and k, biasless
    projections;
  - FF: LayerNorm -> Linear(bias=False) -> GELU -> Linear(bias=False);
  - proj_in from CLIP width (1280) to dim (1024), proj_out + final LayerNorm.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from viewcrafter_tpu.config import ResamplerConfig
from viewcrafter_tpu.models.layers import Dense, LayerNormF32
from viewcrafter_tpu.ops.attention import attention

Dtype = Any


class PerceiverAttention(nn.Module):
    dim: int
    heads: int
    dim_head: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, latents):
        # x: (B, N1, D) image tokens; latents: (B, N2, D)
        inner = self.heads * self.dim_head
        x = LayerNormF32(name="norm1")(x)
        latents = LayerNormF32(name="norm2")(latents)
        b, l, _ = latents.shape
        q = Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=-2)
        kv = Dense(inner * 2, use_bias=False, dtype=self.dtype, name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        out = attention(
            q.reshape(b, l, self.heads, self.dim_head),
            k.reshape(b, -1, self.heads, self.dim_head),
            v.reshape(b, -1, self.heads, self.dim_head),
            impl="xla",
        ).reshape(b, l, inner)
        return Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)


class ResamplerFF(nn.Module):
    dim: int
    mult: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = LayerNormF32(name="norm")(x)
        h = Dense(self.dim * self.mult, use_bias=False, dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
        return Dense(self.dim, use_bias=False, dtype=self.dtype, name="fc2")(h)


class Resampler(nn.Module):
    cfg: ResamplerConfig = ResamplerConfig()
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        """x: (B, N, embedding_dim) CLIP image tokens -> (B, Q, output_dim)."""
        cfg = self.cfg
        nq = cfg.num_queries * (cfg.video_length or 1)
        latents = self.param(
            "latents",
            lambda rng: jax.random.normal(rng, (1, nq, cfg.dim), jnp.float32) / cfg.dim**0.5,
        )
        b = x.shape[0]
        lat = jnp.broadcast_to(latents, (b, nq, cfg.dim)).astype(self.dtype)
        h = Dense(cfg.dim, dtype=self.dtype, name="proj_in")(x.astype(self.dtype))
        for i in range(cfg.depth):
            lat = lat + PerceiverAttention(
                dim=cfg.dim, heads=cfg.heads, dim_head=cfg.dim_head,
                dtype=self.dtype, name=f"layer_{i}_attn",
            )(h, lat)
            lat = lat + ResamplerFF(cfg.dim, cfg.ff_mult, dtype=self.dtype, name=f"layer_{i}_ff")(lat)
        out = Dense(cfg.output_dim, dtype=self.dtype, name="proj_out")(lat)
        return LayerNormF32(name="norm_out")(out)
