"""CroCo cross-view-completion pretraining (MAE-style masked pretext task).

Parity target: extern/dust3r/croco/models/croco.py CroCoNet with
RandomMask(mask_ratio=0.9) (masking.py:12-25) and the MaskedMSE criterion
(criterion.py:13-45): encode the VISIBLE patches of view1 (RoPE positions, so
masking is a plain gather), encode view2 fully, scatter the visible decoder
embeds into a mask-token canvas, run the cross-attending decoder over the
full grid, and regress masked patches' pixels with a linear head.

TPU-first notes: the mask has a STATIC visible count (int(N * (1 -
mask_ratio))) so every shape is static under jit; masking/scatter are
take_along_axis/at[].set, no boolean indexing. The random permutation comes
from argsort(uniform) exactly like the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from viewcrafter_tpu.config import Dust3rConfig
from viewcrafter_tpu.models.dust3r import DecoderBlock, EncoderBlock, patch_positions
from viewcrafter_tpu.models.layers import Dense, LayerNormF32

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CroCoPretrainConfig:
    """CroCoNet pretraining dims (croco.py:21-90 defaults are ViT-B/16 with a
    768/8x12 decoder; we default to the DUSt3R-compatible topology)."""

    img_size: Tuple[int, int] = (224, 224)
    patch_size: int = 16
    enc_embed_dim: int = 768
    enc_depth: int = 12
    enc_num_heads: int = 12
    dec_embed_dim: int = 512
    dec_depth: int = 8
    dec_num_heads: int = 16
    mlp_ratio: float = 4.0
    rope_freq: float = 100.0
    mask_ratio: float = 0.9
    norm_pix_loss: bool = False


def random_mask(rng: jax.Array, batch: int, n_tokens: int, num_mask: int) -> jnp.ndarray:
    """(B, N) bool, True = masked; exactly num_mask per row
    (masking.py RandomMask: argsort(uniform) < num_mask)."""
    noise = jax.random.uniform(rng, (batch, n_tokens))
    return jnp.argsort(jnp.argsort(noise, axis=1), axis=1) < num_mask


def patchify(imgs: jnp.ndarray, p: int) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, N, p*p*3), patch pixels ordered (row, col, channel)
    — matches the reference's einsum('nchpwq->nhwpqc') layout (croco.py:201-213)."""
    b, h, w, c = imgs.shape
    hp, wp = h // p, w // p
    x = imgs.reshape(b, hp, p, wp, p, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp * wp, p * p * c)


def unpatchify(x: jnp.ndarray, p: int, hp: int, wp: int) -> jnp.ndarray:
    b = x.shape[0]
    y = x.reshape(b, hp, wp, p, p, 3)
    return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, hp * p, wp * p, 3)


class CroCoPretrain(nn.Module):
    cfg: CroCoPretrainConfig = CroCoPretrainConfig()
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img1, img2, mask: Optional[jnp.ndarray] = None,
                 rng: Optional[jax.Array] = None):
        """img1 is partially masked and reconstructed from img2.

        Returns (pred (B,N,p*p*3) fp32, mask (B,N) bool, target (B,N,p*p*3)).
        Provide either `mask` (exact per-row count must equal num_mask) or
        `rng` to sample one.
        """
        cfg = self.cfg
        b, h, w, _ = img1.shape
        p = cfg.patch_size
        hp, wp = h // p, w // p
        n = hp * wp
        num_mask = int(cfg.mask_ratio * n)
        n_vis = n - num_mask

        if mask is None:
            if rng is None:
                raise ValueError("need mask or rng")
            mask = random_mask(rng, b, n, num_mask)

        patch_embed = nn.Conv(
            cfg.enc_embed_dim, (p, p), strides=p, padding="VALID",
            dtype=self.dtype, param_dtype=jnp.float32, name="patch_embed",
        )
        pos = jnp.broadcast_to(patch_positions(hp, wp)[None], (b, n, 2))

        enc_blocks = [
            EncoderBlock(cfg.enc_num_heads, cfg.mlp_ratio, cfg.rope_freq,
                         dtype=self.dtype, name=f"enc_block_{i}")
            for i in range(cfg.enc_depth)
        ]
        enc_norm = LayerNormF32(name="enc_norm")

        def encode(img, vis_idx=None):
            x = patch_embed(img.astype(self.dtype)).reshape(b, n, cfg.enc_embed_dim)
            px = pos
            if vis_idx is not None:
                x = jnp.take_along_axis(x, vis_idx[..., None], axis=1)
                px = jnp.take_along_axis(pos, vis_idx[..., None], axis=1)
            for blk in enc_blocks:
                x = blk(x, px)
            return enc_norm(x), px

        # visible indices: argsort(mask) puts False (visible) first; within
        # each group order is by position (argsort is stable), matching the
        # reference's boolean-indexing order
        order = jnp.argsort(mask.astype(jnp.int32), axis=1, stable=True)
        vis_idx = order[:, :n_vis]  # (B, n_vis)

        f1_vis, _ = encode(img1, vis_idx)
        f2, pos2 = encode(img2)

        decoder_embed = Dense(cfg.dec_embed_dim, dtype=self.dtype, name="decoder_embed")
        v1 = decoder_embed(f1_vis)
        g2 = decoder_embed(f2)
        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, cfg.dec_embed_dim), jnp.float32
        )
        canvas = jnp.broadcast_to(
            mask_token.astype(v1.dtype), (b, n, cfg.dec_embed_dim)
        )
        bidx = jnp.arange(b)[:, None]
        f1 = canvas.at[bidx, vis_idx].set(v1)

        o1, o2 = f1, g2
        for i in range(cfg.dec_depth):
            no1 = DecoderBlock(
                cfg.dec_num_heads, cfg.mlp_ratio, cfg.rope_freq,
                dtype=self.dtype, name=f"dec_block_{i}",
            )(o1, o2, pos, pos2)
            o1 = no1
        o1 = LayerNormF32(name="dec_norm")(o1)

        pred = Dense(p * p * 3, dtype=self.dtype, name="prediction_head")(o1)
        target = patchify(img1.astype(jnp.float32), p)
        return pred.astype(jnp.float32), mask, target


def masked_mse_loss(pred, mask, target, norm_pix_loss: bool = False,
                    masked: bool = True) -> jnp.ndarray:
    """MaskedMSE (criterion.py:13-45): per-patch MSE averaged over masked
    patches (or all patches when ``masked=False``), with optional per-patch
    pixel normalization of the target. Torch's ``.var`` is unbiased (ddof=1)."""
    if norm_pix_loss:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True, ddof=1)
        target = (target - mean) / jnp.sqrt(var + 1e-6)
    loss = jnp.mean((pred - target) ** 2, axis=-1)
    if not masked:
        return jnp.mean(loss)
    m = mask.astype(loss.dtype)
    return jnp.sum(loss * m) / jnp.clip(jnp.sum(m), 1.0)
