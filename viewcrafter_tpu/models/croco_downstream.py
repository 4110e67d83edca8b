"""CroCo downstream stereo/flow networks (binocular + monocular-encoder).

Parity targets:
  - CroCoDownstreamBinocular / CroCoDownstreamMonocularEncoder:
    extern/dust3r/croco/models/croco_downstream.py:23-122 — CroCoNet backbone
    with no mask machinery, encoder features of BOTH images computed in one
    batched pass, single-stream cross-attending decoder, and a dense DPT head
    fed with all encoder+decoder block outputs;
  - PixelwiseTaskWithDPT: croco/models/head_downstream.py:19-58 — DPT
    regression adapter (croco/models/dpt_block.py:281-343, layer_dims
    [96,192,384,768], feature 256, last_dim 32) over 4 hooked layers; default
    hooks = last encoder block + 3 equally-spread decoder blocks
    (head_downstream.py:38-45);
  - prediction layout: num_channels task channels (stereo 1 / flow 2) plus an
    optional trailing confidence channel (stereoflow/test.py:58-62).

TPU-first: channels-last (B, H, W, C) everywhere, both views of the pair ride
one batch axis through the encoder, bf16 matmuls with fp32 LayerNorm/head —
mirroring the layout decisions of models/dust3r.py, whose EncoderBlock /
DecoderBlock / FusionBlock are reused verbatim (the reference shares the same
blocks between dust3r and croco downstream too).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from viewcrafter_tpu.models.dust3r import (
    DecoderBlock,
    EncoderBlock,
    FusionBlock,
    patch_positions,
)
from viewcrafter_tpu.models.layers import Dense, LayerNormF32
from viewcrafter_tpu.ops.resize import resize_bilinear_align_corners

Dtype = Any


def default_hooks(enc_depth: int, dec_depth: int) -> Tuple[int, ...]:
    """Encoder+decoder hook indices into [enc_1..enc_E, dec_1..dec_D]
    (head_downstream.py:38-41): last encoder block + 3 equally spread
    decoder blocks."""
    step = {8: 3, 12: 4, 24: 8}[dec_depth]
    return tuple(dec_depth + enc_depth - 1 - i * step for i in range(3, -1, -1))


@dataclasses.dataclass(frozen=True)
class CroCoDownstreamConfig:
    """CroCo v2 ViT-L/Base-decoder topology (the released CroCo-Stereo/Flow
    checkpoints) by default; num_channels INCLUDES the confidence channel
    when with_conf (stereoflow/test.py:58-62)."""

    img_size: Tuple[int, int] = (224, 224)
    patch_size: int = 16
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    mlp_ratio: float = 4.0
    rope_freq: float = 100.0
    num_channels: int = 2  # stereo: 1(+1 conf); flow: 2(+1 conf)
    dpt_layer_dims: Tuple[int, int, int, int] = (96, 192, 384, 768)
    dpt_feature_dim: int = 256
    dpt_last_dim: int = 32
    hooks_idx: Optional[Tuple[int, ...]] = None

    def hooks(self) -> Tuple[int, ...]:
        return self.hooks_idx or default_hooks(self.enc_depth, self.dec_depth)


class DPTRegressionHead(nn.Module):
    """PixelwiseTaskWithDPT's DPTOutputAdapter in 'regression' mode
    (dpt_block.py:309-325,341-410): 1x1-proj + rescale {x4, x2, x1, /2} of
    the 4 hooked token maps, refinenet fusion pyramid, then
    conv3x3 -> x2 bilinear(align_corners) -> conv3x3 -> relu -> conv1x1."""

    layer_dims: Tuple[int, int, int, int] = (96, 192, 384, 768)
    feature_dim: int = 256
    last_dim: int = 32
    num_channels: int = 1

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], h: int, w: int, patch_size: int = 16):
        hp, wp = h // patch_size, w // patch_size
        dims = self.layer_dims
        fd = self.feature_dim
        maps = [f.astype(jnp.float32).reshape(f.shape[0], hp, wp, f.shape[-1]) for f in feats]

        l1 = nn.Conv(dims[0], (1, 1), dtype=jnp.float32, name="act1_proj")(maps[0])
        l1 = nn.ConvTranspose(dims[0], (4, 4), strides=(4, 4), dtype=jnp.float32, name="act1_up")(l1)
        l2 = nn.Conv(dims[1], (1, 1), dtype=jnp.float32, name="act2_proj")(maps[1])
        l2 = nn.ConvTranspose(dims[1], (2, 2), strides=(2, 2), dtype=jnp.float32, name="act2_up")(l2)
        l3 = nn.Conv(dims[2], (1, 1), dtype=jnp.float32, name="act3_proj")(maps[2])
        l4 = nn.Conv(dims[3], (1, 1), dtype=jnp.float32, name="act4_proj")(maps[3])
        l4 = nn.Conv(
            dims[3], (3, 3), strides=2, padding=((1, 1), (1, 1)), dtype=jnp.float32,
            name="act4_down",
        )(l4)

        rn = [
            nn.Conv(fd, (3, 3), use_bias=False, dtype=jnp.float32, name=f"layer{i+1}_rn")(l)
            for i, l in enumerate([l1, l2, l3, l4])
        ]
        path4 = FusionBlock(fd, name="refinenet4")(rn[3])
        path4 = path4[:, : rn[2].shape[1], : rn[2].shape[2]]
        path3 = FusionBlock(fd, name="refinenet3")(path4, rn[2])
        path2 = FusionBlock(fd, name="refinenet2")(path3, rn[1])
        path1 = FusionBlock(fd, name="refinenet1")(path2, rn[0])

        out = nn.Conv(fd // 2, (3, 3), dtype=jnp.float32, name="head_conv1")(path1)
        out = resize_bilinear_align_corners(out, out.shape[-3] * 2, out.shape[-2] * 2)
        out = nn.Conv(self.last_dim, (3, 3), dtype=jnp.float32, name="head_conv2")(out)
        out = nn.relu(out)
        return nn.Conv(self.num_channels, (1, 1), dtype=jnp.float32, name="head_conv3")(out)


class CroCoDownstreamBinocular(nn.Module):
    """Binocular CroCo for stereo/flow (croco_downstream.py:67-122).

    __call__(img1, img2): (B, H, W, 3) each -> (B, H, W, num_channels) fp32.
    Both images are encoded in one batched pass (reference note: ~5% faster
    than separate encoding, croco_downstream.py:94-103); the head sees all
    encoder block outputs (last one normed) followed by all decoder block
    outputs (last one normed), hooked per cfg.hooks()."""

    cfg: CroCoDownstreamConfig = CroCoDownstreamConfig()
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b, h, w, _ = img1.shape
        p = cfg.patch_size
        hp, wp = h // p, w // p
        n = hp * wp

        patch_embed = nn.Conv(
            cfg.enc_embed_dim, (p, p), strides=p, padding="VALID",
            dtype=self.dtype, param_dtype=jnp.float32, name="patch_embed",
        )
        both = jnp.concatenate([img1, img2], axis=0).astype(self.dtype)
        x = patch_embed(both).reshape(2 * b, n, cfg.enc_embed_dim)
        pos = jnp.broadcast_to(patch_positions(hp, wp)[None], (2 * b, n, 2))

        enc_all: List[jnp.ndarray] = []
        for i in range(cfg.enc_depth):
            x = EncoderBlock(
                cfg.enc_num_heads, cfg.mlp_ratio, cfg.rope_freq,
                dtype=self.dtype, name=f"enc_block_{i}",
            )(x, pos)
            enc_all.append(x)
        enc_all[-1] = LayerNormF32(name="enc_norm")(enc_all[-1])

        f1_all = [o[:b] for o in enc_all]
        f2 = enc_all[-1][b:]
        pos1, pos2 = pos[:b], pos[b:]

        decoder_embed = Dense(cfg.dec_embed_dim, dtype=self.dtype, name="decoder_embed")
        o1 = decoder_embed(f1_all[-1])
        o2 = decoder_embed(f2)
        dec_all: List[jnp.ndarray] = []
        for i in range(cfg.dec_depth):
            o1 = DecoderBlock(
                cfg.dec_num_heads, cfg.mlp_ratio, cfg.rope_freq,
                dtype=self.dtype, name=f"dec_block_{i}",
            )(o1, o2, pos1, pos2)
            dec_all.append(o1)
        dec_all[-1] = LayerNormF32(name="dec_norm")(dec_all[-1])

        feats = f1_all + dec_all
        hooked = [feats[i] for i in cfg.hooks()]
        head = DPTRegressionHead(
            layer_dims=cfg.dpt_layer_dims, feature_dim=cfg.dpt_feature_dim,
            last_dim=cfg.dpt_last_dim, num_channels=cfg.num_channels, name="head",
        )
        return head(hooked, h, w, patch_size=p)


class CroCoDownstreamMonocularEncoder(nn.Module):
    """Encoder-only monocular variant (croco_downstream.py:23-64): hooks are
    4 equally-spread ENCODER layers (head_downstream.py:42-44)."""

    cfg: CroCoDownstreamConfig = CroCoDownstreamConfig()
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b, h, w, _ = img.shape
        p = cfg.patch_size
        hp, wp = h // p, w // p
        n = hp * wp

        patch_embed = nn.Conv(
            cfg.enc_embed_dim, (p, p), strides=p, padding="VALID",
            dtype=self.dtype, param_dtype=jnp.float32, name="patch_embed",
        )
        x = patch_embed(img.astype(self.dtype)).reshape(b, n, cfg.enc_embed_dim)
        pos = jnp.broadcast_to(patch_positions(hp, wp)[None], (b, n, 2))

        enc_all: List[jnp.ndarray] = []
        for i in range(cfg.enc_depth):
            x = EncoderBlock(
                cfg.enc_num_heads, cfg.mlp_ratio, cfg.rope_freq,
                dtype=self.dtype, name=f"enc_block_{i}",
            )(x, pos)
            enc_all.append(x)
        enc_all[-1] = LayerNormF32(name="enc_norm")(enc_all[-1])

        step = cfg.enc_depth // 4
        hooks = cfg.hooks_idx or tuple(
            cfg.enc_depth - 1 - i * step for i in range(3, -1, -1)
        )
        hooked = [enc_all[i] for i in hooks]
        head = DPTRegressionHead(
            layer_dims=cfg.dpt_layer_dims, feature_dim=cfg.dpt_feature_dim,
            last_dim=cfg.dpt_last_dim, num_channels=cfg.num_channels, name="head",
        )
        return head(hooked, h, w, patch_size=p)


def split_prediction_conf(pred: jnp.ndarray, with_conf: bool):
    """(B, H, W, C[+1]) -> (task channels, conf or None)
    (stereoflow/engine.py split_prediction_conf semantics, channels-last)."""
    if not with_conf:
        return pred, None
    return pred[..., :-1], pred[..., -1]
