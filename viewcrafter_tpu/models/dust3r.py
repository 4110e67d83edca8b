"""DUSt3R two-view stereo network: siamese CroCo ViT-L encoder, twin
cross-attending decoders, DPT pointmap heads.

Parity targets:
  - AsymmetricCroCo3DStereo: extern/dust3r/dust3r/model.py:19-166 (shared
    encoder over both views, dec_blocks/dec_blocks2 interleaved cross pass,
    view2's pts3d expressed in view1's frame);
  - CroCo ViT blocks with RoPE on q,k: extern/dust3r/croco/models/blocks.py:81-191;
  - patch embed: croco/models/blocks.py:195-241, dust3r/patch_embed.py:19-70;
  - DPT head: dust3r/heads/dpt_head.py:20-115 + croco/models/dpt_block.py
    (hooks [0, 6, 9, 12] over [enc_out, dec_1..dec_12], dims [1024,768,768,768],
    feature 256, fusion refinenets, regression head);
  - postprocess: pts3d = d/|d| * expm1(|d|), conf = 1 + exp(x)
    (dust3r/heads/postprocess.py:10-58);
  - linear head alternative (pixel-shuffle): dust3r/heads/linear_head.py:12-41.

Shipped checkpoint config (DUSt3R_ViTLarge_BaseDecoder_512_dpt): enc 1024x24
(16 heads), dec 768x12 (12 heads), patch 16, RoPE(freq=100), landscape inputs
(W >= H, multiples of 16).

TPU-first: both views of a pair ride one batch axis through the encoder (the
reference concatenates too); pair batches are vmappable; fp32 LayerNorm/softmax,
bf16 matmuls; the DPT head runs in fp32 like the reference's
autocast(enabled=False) region (model.py:160-163).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from viewcrafter_tpu.config import Dust3rConfig
from viewcrafter_tpu.models.layers import Dense, LayerNormF32
from viewcrafter_tpu.ops.attention import attention
from viewcrafter_tpu.ops.resize import resize_bilinear_align_corners
from viewcrafter_tpu.ops.rope2d import rope_2d

Dtype = Any


def patch_positions(h_patches: int, w_patches: int) -> jnp.ndarray:
    """(h*w, 2) integer (y, x) per patch (croco blocks.py:195-208)."""
    yy, xx = jnp.meshgrid(jnp.arange(h_patches), jnp.arange(w_patches), indexing="ij")
    return jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)


class SelfAttention(nn.Module):
    heads: int
    rope_base: float
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, pos):
        b, s, c = x.shape
        d = c // self.heads
        qkv = Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        q, k, v = [t.reshape(b, s, self.heads, d) for t in jnp.split(qkv, 3, axis=-1)]
        q = rope_2d(q, pos, self.rope_base)
        k = rope_2d(k, pos, self.rope_base)
        o = attention(q, k, v.reshape(b, s, self.heads, d)).reshape(b, s, c)
        return Dense(c, dtype=self.dtype, name="proj")(o)


class CrossAttentionRoPE(nn.Module):
    heads: int
    rope_base: float
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, q_tokens, kv_tokens, qpos, kpos):
        b, sq, c = q_tokens.shape
        sk = kv_tokens.shape[1]
        d = c // self.heads
        q = Dense(c, dtype=self.dtype, name="projq")(q_tokens).reshape(b, sq, self.heads, d)
        k = Dense(c, dtype=self.dtype, name="projk")(kv_tokens).reshape(b, sk, self.heads, d)
        v = Dense(c, dtype=self.dtype, name="projv")(kv_tokens).reshape(b, sk, self.heads, d)
        q = rope_2d(q, qpos, self.rope_base)
        k = rope_2d(k, kpos, self.rope_base)
        o = attention(q, k, v).reshape(b, sq, c)
        return Dense(c, dtype=self.dtype, name="proj")(o)


class Mlp(nn.Module):
    hidden: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
        return Dense(c, dtype=self.dtype, name="fc2")(h)


class EncoderBlock(nn.Module):
    heads: int
    mlp_ratio: float
    rope_base: float
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, pos):
        c = x.shape[-1]
        x = x + SelfAttention(self.heads, self.rope_base, dtype=self.dtype, name="attn")(
            LayerNormF32(name="norm1")(x), pos
        )
        x = x + Mlp(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            LayerNormF32(name="norm2")(x)
        )
        return x


class DecoderBlock(nn.Module):
    """Self-attn + cross-attn to the other view + MLP (blocks.py:171-191)."""

    heads: int
    mlp_ratio: float
    rope_base: float
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mem, xpos, mempos):
        c = x.shape[-1]
        x = x + SelfAttention(self.heads, self.rope_base, dtype=self.dtype, name="attn")(
            LayerNormF32(name="norm1")(x), xpos
        )
        mem_n = LayerNormF32(name="norm_y")(mem)
        x = x + CrossAttentionRoPE(self.heads, self.rope_base, dtype=self.dtype, name="cross_attn")(
            LayerNormF32(name="norm2")(x), mem_n, xpos, mempos
        )
        x = x + Mlp(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            LayerNormF32(name="norm3")(x)
        )
        return x


class Dust3rEncoder(nn.Module):
    cfg: Dust3rConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img, is_portrait=None):
        """img: (B, H, W, 3) stored LANDSCAPE (W >= H), H/W multiples of 16
        -> tokens (B, S, C), pos (B, S, 2).

        is_portrait encodes the ManyAR convention (dust3r/patch_embed.py:32-70):
        portrait images ride the batch stored transposed-to-landscape; their
        patch embedding runs on the transposed (true-portrait) image and their
        RoPE positions use the (wp, hp) grid. Accepted values:
          - None / False: all landscape (PatchEmbedDust3R fast path)
          - True: all portrait (static — single conv on the transposed image)
          - (B,) bool array: mixed batch. TPU-first: both orientations are
            computed and where-selected per image (static shapes, no host
            sync) instead of the reference's boolean-mask scatter
            (patch_embed.py:59-67) — the patch conv is <1% of the encoder.
        """
        cfg = self.cfg
        b, h, w, _ = img.shape
        p = cfg.patch_size
        conv = nn.Conv(
            cfg.enc_embed_dim, (p, p), strides=p, padding="VALID",
            dtype=self.dtype, param_dtype=jnp.float32, name="patch_embed",
        )
        hp, wp = h // p, w // p
        n = hp * wp
        img = img.astype(self.dtype)

        def embed_landscape():
            x = conv(img).reshape(b, n, cfg.enc_embed_dim)
            pos = jnp.broadcast_to(patch_positions(hp, wp)[None], (b, n, 2))
            return x, pos

        def embed_portrait():
            # true-portrait pixels: un-transpose the stored landscape tensor
            x = conv(img.transpose(0, 2, 1, 3)).reshape(b, n, cfg.enc_embed_dim)
            pos = jnp.broadcast_to(patch_positions(wp, hp)[None], (b, n, 2))
            return x, pos

        if is_portrait is None or is_portrait is False:
            x, pos = embed_landscape()
        elif is_portrait is True:
            x, pos = embed_portrait()
        else:
            flag = jnp.asarray(is_portrait).reshape(b)
            xl, posl = embed_landscape()
            xp, posp = embed_portrait()
            x = jnp.where(flag[:, None, None], xp, xl)
            pos = jnp.where(flag[:, None, None], posp, posl)
        for i in range(cfg.enc_depth):
            x = EncoderBlock(
                cfg.enc_num_heads, cfg.mlp_ratio, cfg.rope_freq, dtype=self.dtype, name=f"block_{i}"
            )(x, pos)
        return LayerNormF32(name="norm")(x), pos


class Dust3rDecoder(nn.Module):
    """Twin interleaved decoders; returns per-depth outputs of both streams
    (model.py:127-146)."""

    cfg: Dust3rConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, f1, pos1, f2, pos2):
        cfg = self.cfg
        # one shared projection for both streams (model.py:137-139)
        decoder_embed = Dense(cfg.dec_embed_dim, dtype=self.dtype, name="decoder_embed")
        f1 = decoder_embed(f1)
        f2 = decoder_embed(f2)
        outs1: List[jnp.ndarray] = []
        outs2: List[jnp.ndarray] = []
        for i in range(cfg.dec_depth):
            nf1 = DecoderBlock(
                cfg.dec_num_heads, cfg.mlp_ratio, cfg.rope_freq, dtype=self.dtype, name=f"block1_{i}"
            )(f1, f2, pos1, pos2)
            nf2 = DecoderBlock(
                cfg.dec_num_heads, cfg.mlp_ratio, cfg.rope_freq, dtype=self.dtype, name=f"block2_{i}"
            )(f2, f1, pos2, pos1)
            f1, f2 = nf1, nf2
            outs1.append(f1)
            outs2.append(f2)
        # one shared final norm for both streams (model.py:144)
        dec_norm = LayerNormF32(name="norm")
        outs1[-1] = dec_norm(outs1[-1])
        outs2[-1] = dec_norm(outs2[-1])
        return outs1, outs2


def _postprocess(fmap: jnp.ndarray, conf_mode: str = "exp") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, H, W, 3+1) raw head output -> (pts3d, conf)
    (dust3r/heads/postprocess.py:10-58, 'exp' modes, no bounds)."""
    xyz = fmap[..., :3].astype(jnp.float32)
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    pts = xyz / jnp.clip(d, 1e-8) * jnp.expm1(d)
    conf = 1.0 + jnp.exp(fmap[..., 3].astype(jnp.float32))
    return pts, conf


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), dtype=jnp.float32, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), dtype=jnp.float32, name="conv2")(h)
        return x + h


class FusionBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        h, w = x.shape[-3] * 2, x.shape[-2] * 2
        x = resize_bilinear_align_corners(x, h, w)
        return nn.Conv(self.features, (1, 1), dtype=jnp.float32, name="out_conv")(x)


class DPTHead(nn.Module):
    """Multi-scale token pyramid -> dense (3+conf) map, all fp32
    (dpt_head.py:34-65, dpt_block.py:341-410)."""

    cfg: Dust3rConfig

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], h: int, w: int):
        cfg = self.cfg
        p = cfg.patch_size
        hp, wp = h // p, w // p
        dims = cfg.dpt_hidden_dims
        fd = cfg.dpt_feature_dim
        maps = [f.astype(jnp.float32).reshape(f.shape[0], hp, wp, f.shape[-1]) for f in feats]

        # act_postprocess: 1x1 proj then rescale to {x4, x2, x1, /2}
        l1 = nn.Conv(dims[0], (1, 1), dtype=jnp.float32, name="act1_proj")(maps[0])
        l1 = nn.ConvTranspose(dims[0], (4, 4), strides=(4, 4), dtype=jnp.float32, name="act1_up")(l1)
        l2 = nn.Conv(dims[1], (1, 1), dtype=jnp.float32, name="act2_proj")(maps[1])
        l2 = nn.ConvTranspose(dims[1], (2, 2), strides=(2, 2), dtype=jnp.float32, name="act2_up")(l2)
        l3 = nn.Conv(dims[2], (1, 1), dtype=jnp.float32, name="act3_proj")(maps[2])
        l4 = nn.Conv(dims[3], (1, 1), dtype=jnp.float32, name="act4_proj")(maps[3])
        # torch stride-2 pad-1 semantics (see unet3d.Downsample note)
        l4 = nn.Conv(
            dims[3], (3, 3), strides=2, padding=((1, 1), (1, 1)), dtype=jnp.float32,
            name="act4_down",
        )(l4)

        rn = [
            nn.Conv(fd, (3, 3), use_bias=False, dtype=jnp.float32, name=f"layer{i+1}_rn")(l)
            for i, l in enumerate([l1, l2, l3, l4])
        ]
        path4 = FusionBlock(fd, name="refinenet4")(rn[3])
        # crop to the next pyramid level's size (odd grids; dpt_head.py:57)
        path4 = path4[:, : rn[2].shape[1], : rn[2].shape[2]]
        path3 = FusionBlock(fd, name="refinenet3")(path4, rn[2])
        path2 = FusionBlock(fd, name="refinenet2")(path3, rn[1])
        path1 = FusionBlock(fd, name="refinenet1")(path2, rn[0])

        out = nn.Conv(fd // 2, (3, 3), dtype=jnp.float32, name="head_conv1")(path1)
        out = resize_bilinear_align_corners(out, out.shape[-3] * 2, out.shape[-2] * 2)
        out = nn.Conv(fd // 2, (3, 3), dtype=jnp.float32, name="head_conv2")(out)
        out = nn.relu(out)
        return nn.Conv(4, (1, 1), dtype=jnp.float32, name="head_conv3")(out)


class LinearHead(nn.Module):
    """Pixel-shuffle linear head alternative (linear_head.py:12-41)."""

    cfg: Dust3rConfig

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], h: int, w: int):
        cfg = self.cfg
        p = cfg.patch_size
        tokens = feats[-1].astype(jnp.float32)
        b = tokens.shape[0]
        out = nn.Dense(4 * p * p, dtype=jnp.float32, name="proj")(tokens)
        # torch F.pixel_shuffle channel order: index = c*p*p + dy*p + dx
        # (linear_head.py:36-38) — split (4, p, p), NOT (p, p, 4)
        out = out.reshape(b, h // p, w // p, 4, p, p)
        return out.transpose(0, 1, 4, 2, 5, 3).reshape(b, h, w, 4)


class Dust3rModel(nn.Module):
    """Full two-view network. Input images are (B, H, W, 3), ImageNet-free
    (0.5, 0.5) normalization as in dust3r/utils/image.py:43."""

    cfg: Dust3rConfig = Dust3rConfig()
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.encoder = Dust3rEncoder(self.cfg, dtype=self.dtype)
        self.decoder = Dust3rDecoder(self.cfg, dtype=self.dtype)
        head_cls = DPTHead if self.cfg.head_type == "dpt" else LinearHead
        self.head1 = head_cls(self.cfg)
        self.head2 = head_cls(self.cfg)

    def _hooked(self, enc_out, dec_outs) -> List[jnp.ndarray]:
        # hooks [0, 2/4*d, 3/4*d, d] over [enc, dec_1..dec_d] (dpt_head.py:107)
        d = self.cfg.dec_depth
        feats = [enc_out] + list(dec_outs)
        return [feats[0], feats[d * 2 // 4], feats[d * 3 // 4], feats[d]]

    def _head_raw(self, head, feats, h, w, is_portrait):
        """Run a head honoring ManyAR orientation (misc.py:54-97): portrait
        images predict on the (w, h) token grid, then the map transposes back
        to the stored landscape layout. Mixed batches compute both and
        where-select (static shapes; heads are ~2% of the network)."""
        if is_portrait is None or is_portrait is False:
            return head(feats, h, w)
        if is_portrait is True:
            return head(feats, w, h).transpose(0, 2, 1, 3)
        flag = jnp.asarray(is_portrait).reshape(-1)
        raw_l = head(feats, h, w)
        raw_p = head(feats, w, h).transpose(0, 2, 1, 3)
        return jnp.where(flag[:, None, None, None], raw_p, raw_l)

    def __call__(self, img1, img2, is_portrait1=None, is_portrait2=None):
        """img1/img2: (B, H, W, 3) stored landscape. is_portrait1/2: ManyAR
        orientation flags (see Dust3rEncoder) — None/False, True, or (B,) bool.
        Output maps are in the STORED (landscape) layout like the reference
        (transpose_to_landscape, misc.py:54-97); the caller un-transposes
        portrait maps to true orientation."""
        b, h, w, _ = img1.shape
        # siamese encode: both views through one batched pass (model.py:97-106)
        both = jnp.concatenate([img1, img2], axis=0)
        if is_portrait1 is None and is_portrait2 is None:
            flag_both = None
            flag1 = flag2 = None
        else:
            def as_arr(f):
                if f is None:
                    f = False
                if isinstance(f, bool):
                    return jnp.full((b,), f)
                return jnp.asarray(f).reshape(b)
            flag1, flag2 = as_arr(is_portrait1), as_arr(is_portrait2)
            if is_portrait1 is is_portrait2 and isinstance(is_portrait1, bool):
                flag_both = is_portrait1  # static uniform batch
            else:
                flag_both = jnp.concatenate([flag1, flag2], axis=0)
        tokens, pos = self.encoder(both, is_portrait=flag_both)
        f1, f2 = jnp.split(tokens, 2, axis=0)
        pos1, pos2 = jnp.split(pos, 2, axis=0)
        outs1, outs2 = self.decoder(f1, pos1, f2, pos2)
        p1 = is_portrait1 if isinstance(is_portrait1, (bool, type(None))) else flag1
        p2 = is_portrait2 if isinstance(is_portrait2, (bool, type(None))) else flag2
        raw1 = self._head_raw(self.head1, self._hooked(f1, outs1), h, w, p1)
        raw2 = self._head_raw(self.head2, self._hooked(f2, outs2), h, w, p2)
        pts1, conf1 = _postprocess(raw1)
        pts2, conf2 = _postprocess(raw2)  # view2 pts expressed in view1 frame
        return {
            "pts3d1": pts1, "conf1": conf1,
            "pts3d2_in_view1": pts2, "conf2": conf2,
        }

    def encode(self, imgs, is_portrait=None):
        """Encode N UNIQUE images once (symmetrized-pair encoder dedup,
        reference model.py:117-125 + utils/misc.py:32-52: a symmetric pair
        batch encodes each image a single time and reuses the embedding for
        both directions). Returns (tokens (N,S,C), pos (N,S,2))."""
        return self.encoder(imgs, is_portrait=is_portrait)

    def decode_pairs(self, tokens, pos, idx1, idx2, h: int, w: int,
                     is_portrait1=None, is_portrait2=None):
        """Decoder + heads over pairs of PRE-ENCODED images.

        tokens/pos: `encode` outputs for the scene's unique images (stay on
        device between the two calls). idx1/idx2: (P,) int32 image indices of
        each directed pair. h, w: static stored-landscape pixel dims. Output
        dict matches __call__. Per-pair cost drops by the full ViT-L encoder
        (~2x the geometry stage; n^2-compounding in iterative modes)."""
        f1 = jnp.take(tokens, idx1, axis=0)
        f2 = jnp.take(tokens, idx2, axis=0)
        pos1 = jnp.take(pos, idx1, axis=0)
        pos2 = jnp.take(pos, idx2, axis=0)
        outs1, outs2 = self.decoder(f1, pos1, f2, pos2)
        raw1 = self._head_raw(self.head1, self._hooked(f1, outs1), h, w, is_portrait1)
        raw2 = self._head_raw(self.head2, self._hooked(f2, outs2), h, w, is_portrait2)
        pts1, conf1 = _postprocess(raw1)
        pts2, conf2 = _postprocess(raw2)
        return {
            "pts3d1": pts1, "conf1": conf1,
            "pts3d2_in_view1": pts2, "conf2": conf2,
        }
