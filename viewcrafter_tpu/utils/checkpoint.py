"""Checkpoint translation: released PyTorch checkpoints -> our flax param trees.

Handles the reference's loading quirks (utils/diffusion_utils.py:83-108):
deepspeed `module.`-prefix strip, `framestride_embed -> fps_embedding` rename,
and DUSt3R's decoder-2 weight duplication when absent
(extern/dust3r/dust3r/model.py:46-53). The DUSt3R `.pth` stores a constructor
arg-string the reference eval()s (dust3r/inference.py:18-25); we never eval —
architecture comes from our typed Dust3rConfig.

Layout transforms torch -> flax (channels-last):
  Linear  (out,in)          -> kernel (in,out)
  Conv2d  (out,in,kh,kw)    -> kernel (kh,kw,in,out)
  Conv3d  (out,in,kt,kh,kw) -> kernel (kt,kh,kw,in,out)
  ConvT2d (in,out,kh,kw)    -> kernel (kh,kw,in,out), spatially flipped
  GroupNorm/LayerNorm weight/bias -> scale/bias

Saving/resuming our own state uses orbax (save_params/load_params below).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional

import numpy as np

# ---------------------------------------------------------------------------
# low-level tensor transforms
# ---------------------------------------------------------------------------


def t_linear(w):  # (out,in) -> (in,out)
    return np.ascontiguousarray(np.asarray(w).T)


def t_conv2d(w):  # (out,in,kh,kw) -> (kh,kw,in,out)
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def t_conv1d(w):  # (out,in,k) -> (k,in,out)
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))


def t_conv3d(w):  # (out,in,kt,kh,kw) -> (kt,kh,kw,in,out)
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 4, 1, 0)))


def t_convtranspose2d(w):  # (in,out,kh,kw) -> flipped (kh,kw,in,out)
    w = np.asarray(w)[:, :, ::-1, ::-1]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


class Translator:
    """Accumulates (flax_path -> array) assignments from a torch state dict."""

    def __init__(self, sd: Dict[str, Any]):
        self.sd = {k: v for k, v in sd.items()}
        self.out: Dict[str, np.ndarray] = {}
        self.used: set[str] = set()

    def has(self, key: str) -> bool:
        return key in self.sd

    def take(self, key: str):
        self.used.add(key)
        return _np(self.sd[key])

    def assign(self, path: str, value: np.ndarray):
        self.out[path] = value

    # common module patterns ------------------------------------------------

    def linear(self, src: str, dst: str, bias: bool = True):
        self.assign(f"{dst}/kernel", t_linear(self.take(f"{src}.weight")))
        if bias and self.has(f"{src}.bias"):
            self.assign(f"{dst}/bias", self.take(f"{src}.bias"))

    def conv2d(self, src: str, dst: str, bias: bool = True):
        self.assign(f"{dst}/kernel", t_conv2d(self.take(f"{src}.weight")))
        if bias and self.has(f"{src}.bias"):
            self.assign(f"{dst}/bias", self.take(f"{src}.bias"))

    def conv3d(self, src: str, dst: str):
        self.assign(f"{dst}/kernel", t_conv3d(self.take(f"{src}.weight")))
        if self.has(f"{src}.bias"):
            self.assign(f"{dst}/bias", self.take(f"{src}.bias"))

    def convtranspose2d(self, src: str, dst: str):
        self.assign(f"{dst}/kernel", t_convtranspose2d(self.take(f"{src}.weight")))
        if self.has(f"{src}.bias"):
            self.assign(f"{dst}/bias", self.take(f"{src}.bias"))

    def norm(self, src: str, dst: str):
        """GroupNorm/LayerNorm: weight->scale, bias->bias; flax nests them
        under the wrapper module's inner norm."""
        self.assign(f"{dst}/scale", self.take(f"{src}.weight"))
        self.assign(f"{dst}/bias", self.take(f"{src}.bias"))

    def groupnorm32(self, src: str, dst: str):
        # our GroupNorm32 wraps flax GroupNorm under name GroupNorm_0
        self.norm(src, f"{dst}/GroupNorm_0")

    def layernorm(self, src: str, dst: str):
        # our LayerNormF32 wraps flax LayerNorm under name LayerNorm_0
        self.norm(src, f"{dst}/LayerNorm_0")

    def nested(self) -> Dict[str, Any]:
        """Flat {a/b/c: arr} -> nested {'a': {'b': {'c': arr}}}."""
        tree: Dict[str, Any] = {}
        for path, val in self.out.items():
            parts = path.split("/")
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = val
        return tree


# ---------------------------------------------------------------------------
# state-dict normalization (reference quirks)
# ---------------------------------------------------------------------------


def normalize_lvdm_state_dict(raw: Dict[str, Any]) -> Dict[str, Any]:
    """Unwrap Lightning/deepspeed containers + legacy key rename
    (utils/diffusion_utils.py:83-108)."""
    sd = raw.get("state_dict", raw)
    if "module" in sd and isinstance(sd["module"], dict):  # deepspeed
        sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd["module"].items()}
    out = {}
    for k, v in sd.items():
        k = k.replace("framestride_embed", "fps_embedding")
        out[k] = v
    return out


def normalize_dust3r_state_dict(raw: Dict[str, Any]) -> Dict[str, Any]:
    sd = raw.get("model", raw)
    if not any(k.startswith("dec_blocks2") for k in sd):
        extra = {k.replace("dec_blocks", "dec_blocks2"): v for k, v in sd.items() if k.startswith("dec_blocks.")}
        sd = {**sd, **extra}
    return sd


# ---------------------------------------------------------------------------
# UNet3D
# ---------------------------------------------------------------------------


def _map_resblock(t: Translator, src: str, dst: str, temporal: bool = True):
    t.groupnorm32(f"{src}.in_layers.0", f"{dst}/in_norm")
    t.conv2d(f"{src}.in_layers.2", f"{dst}/in_conv")
    t.linear(f"{src}.emb_layers.1", f"{dst}/emb_proj")
    t.groupnorm32(f"{src}.out_layers.0", f"{dst}/out_norm")
    t.conv2d(f"{src}.out_layers.3", f"{dst}/out_conv")
    if t.has(f"{src}.skip_connection.weight"):
        t.conv2d(f"{src}.skip_connection", f"{dst}/skip")
    if temporal and t.has(f"{src}.temopral_conv.conv1.0.weight"):
        # reference's TemporalConvBlock (sic "temopral"), 4x GN+SiLU+Conv3d
        for i, conv in enumerate(["conv1", "conv2", "conv3", "conv4"]):
            t.groupnorm32(f"{src}.temopral_conv.{conv}.0", f"{dst}/temporal_conv/norm_{i}")
            # dropout shifts the conv index in blocks 2-4
            idx = 2 if i == 0 else 3
            t.conv3d(f"{src}.temopral_conv.{conv}.{idx}", f"{dst}/temporal_conv/conv_{i}")


def _map_attention(t: Translator, src: str, dst: str, rel_pos: bool = False):
    t.linear(f"{src}.to_q", dst + "/to_q", bias=False)
    t.linear(f"{src}.to_k", dst + "/to_k", bias=False)
    t.linear(f"{src}.to_v", dst + "/to_v", bias=False)
    t.linear(f"{src}.to_out.0", dst + "/to_out")
    if t.has(f"{src}.to_k_ip.weight"):
        t.linear(f"{src}.to_k_ip", dst + "/to_k_ip", bias=False)
        t.linear(f"{src}.to_v_ip", dst + "/to_v_ip", bias=False)
    # Shaw-style temporal relative-position tables (use_relative_position
    # configs only; attention.py:59-63) — raw (2L+1, dim_head) copies
    if rel_pos and t.has(f"{src}.relative_position_k.embeddings_table"):
        t.assign(dst + "/rel_k_table", t.take(f"{src}.relative_position_k.embeddings_table"))
        t.assign(dst + "/rel_v_table", t.take(f"{src}.relative_position_v.embeddings_table"))


def _map_transformer_block(t: Translator, src: str, dst: str, rel_pos: bool = False):
    _map_attention(t, f"{src}.attn1", f"{dst}/attn1", rel_pos=rel_pos)
    _map_attention(t, f"{src}.attn2", f"{dst}/attn2", rel_pos=rel_pos)
    t.layernorm(f"{src}.norm1", f"{dst}/norm1")
    t.layernorm(f"{src}.norm2", f"{dst}/norm2")
    t.layernorm(f"{src}.norm3", f"{dst}/norm3")
    t.linear(f"{src}.ff.net.0.proj", f"{dst}/ff/geglu/proj")
    t.linear(f"{src}.ff.net.2", f"{dst}/ff/out")


def _proj_linear_or_conv1d(t: Translator, src: str, dst: str):
    """proj_in/proj_out are Linear when use_linear=True (all body
    transformers, yaml `use_linear: true`) but the UNet's init_attn omits the
    flag and defaults to 1x1 Conv1d (attention.py:267,288,
    openaimodel3d.py:391) — same math, (out,in,1) weight."""
    w = t.take(f"{src}.weight")
    if w.ndim == 3:
        w = w[:, :, 0]
    t.assign(f"{dst}/kernel", t_linear(w))
    if t.has(f"{src}.bias"):
        t.assign(f"{dst}/bias", t.take(f"{src}.bias"))


def _map_spatial_transformer(t: Translator, src: str, dst: str, depth: int = 1,
                             rel_pos: bool = False):
    t.groupnorm32(f"{src}.norm", f"{dst}/norm")
    _proj_linear_or_conv1d(t, f"{src}.proj_in", f"{dst}/proj_in")
    _proj_linear_or_conv1d(t, f"{src}.proj_out", f"{dst}/proj_out")
    for d in range(depth):
        _map_transformer_block(t, f"{src}.transformer_blocks.{d}", f"{dst}/block_{d}",
                               rel_pos=rel_pos)


def map_unet(t: Translator, src_prefix: str = "model.diffusion_model", cfg=None) -> None:
    from viewcrafter_tpu.config import UNetConfig

    cfg = cfg or UNetConfig()
    p = src_prefix
    t.linear(f"{p}.time_embed.0", "time_embed_0")
    t.linear(f"{p}.time_embed.2", "time_embed_2")
    if t.has(f"{p}.fps_embedding.0.weight"):
        t.linear(f"{p}.fps_embedding.0", "fps_embed_0")
        t.linear(f"{p}.fps_embedding.2", "fps_embed_2")
    t.conv2d(f"{p}.input_blocks.0.0", "in_conv")
    if t.has(f"{p}.init_attn.0.norm.weight"):
        _map_spatial_transformer(t, f"{p}.init_attn.0", "init_attn", cfg.transformer_depth,
                                 rel_pos=cfg.use_relative_position)

    idx = 1
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for j in range(cfg.num_res_blocks):
            base = f"{p}.input_blocks.{idx}"
            _map_resblock(t, f"{base}.0", f"down_{level}_{j}_res")
            if ds in cfg.attention_resolutions:
                _map_spatial_transformer(t, f"{base}.1", f"down_{level}_{j}_spatial", cfg.transformer_depth)
                if cfg.temporal_attention:
                    _map_spatial_transformer(t, f"{base}.2", f"down_{level}_{j}_temporal", cfg.transformer_depth,
                                             rel_pos=cfg.use_relative_position)
            idx += 1
        if level != len(cfg.channel_mult) - 1:
            t.conv2d(f"{p}.input_blocks.{idx}.0.op", f"down_{level}_downsample/op")
            idx += 1
            ds *= 2

    _map_resblock(t, f"{p}.middle_block.0", "mid_res1")
    _map_spatial_transformer(t, f"{p}.middle_block.1", "mid_spatial", cfg.transformer_depth)
    off = 2
    if cfg.temporal_attention:
        _map_spatial_transformer(t, f"{p}.middle_block.2", "mid_temporal", cfg.transformer_depth,
                                 rel_pos=cfg.use_relative_position)
        off = 3
    _map_resblock(t, f"{p}.middle_block.{off}", "mid_res2")

    idx = 0
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for j in range(cfg.num_res_blocks + 1):
            base = f"{p}.output_blocks.{idx}"
            _map_resblock(t, f"{base}.0", f"up_{level}_{j}_res")
            k = 1
            if ds in cfg.attention_resolutions:
                _map_spatial_transformer(t, f"{base}.{k}", f"up_{level}_{j}_spatial", cfg.transformer_depth)
                k += 1
                if cfg.temporal_attention:
                    _map_spatial_transformer(t, f"{base}.{k}", f"up_{level}_{j}_temporal", cfg.transformer_depth,
                                             rel_pos=cfg.use_relative_position)
                    k += 1
            if level and j == cfg.num_res_blocks:
                t.conv2d(f"{base}.{k}.conv", f"up_{level}_upsample/conv")
                ds //= 2
            idx += 1

    t.groupnorm32(f"{p}.out.0", "out_norm")
    t.conv2d(f"{p}.out.2", "out_conv")


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


def _map_vae_resblock(t: Translator, src: str, dst: str):
    t.groupnorm32(f"{src}.norm1", f"{dst}/norm1")
    t.conv2d(f"{src}.conv1", f"{dst}/conv1")
    t.groupnorm32(f"{src}.norm2", f"{dst}/norm2")
    t.conv2d(f"{src}.conv2", f"{dst}/conv2")
    if t.has(f"{src}.nin_shortcut.weight"):
        t.conv2d(f"{src}.nin_shortcut", f"{dst}/nin_shortcut")


def _map_vae_attn(t: Translator, src: str, dst: str):
    t.groupnorm32(f"{src}.norm", f"{dst}/norm")
    for name in ["q", "k", "v", "proj_out"]:
        t.conv2d(f"{src}.{name}", f"{dst}/{name}")


def map_vae(t: Translator, src_prefix: str = "first_stage_model", cfg=None) -> None:
    from viewcrafter_tpu.config import VAEConfig

    cfg = cfg or VAEConfig()
    p = src_prefix
    for tower, levels in [("encoder", range(len(cfg.ch_mult))), ("decoder", reversed(range(len(cfg.ch_mult))))]:
        tp = f"{p}.{tower}"
        dst_t = tower
        t.conv2d(f"{tp}.conv_in", f"{dst_t}/conv_in")
        t.groupnorm32(f"{tp}.norm_out", f"{dst_t}/norm_out")
        t.conv2d(f"{tp}.conv_out", f"{dst_t}/conv_out")
        _map_vae_resblock(t, f"{tp}.mid.block_1", f"{dst_t}/mid_block_1")
        _map_vae_attn(t, f"{tp}.mid.attn_1", f"{dst_t}/mid_attn_1")
        _map_vae_resblock(t, f"{tp}.mid.block_2", f"{dst_t}/mid_block_2")
        if tower == "encoder":
            for i in levels:
                for j in range(cfg.num_res_blocks):
                    _map_vae_resblock(t, f"{tp}.down.{i}.block.{j}", f"{dst_t}/down_{i}_block_{j}")
                if t.has(f"{tp}.down.{i}.downsample.conv.weight"):
                    t.conv2d(f"{tp}.down.{i}.downsample.conv", f"{dst_t}/down_{i}_downsample/conv")
        else:
            # torch decoder indexes up[i] by level (0=finest); weights stored per level
            for i in levels:
                for j in range(cfg.num_res_blocks + 1):
                    _map_vae_resblock(t, f"{tp}.up.{i}.block.{j}", f"{dst_t}/up_{i}_block_{j}")
                if t.has(f"{tp}.up.{i}.upsample.conv.weight"):
                    t.conv2d(f"{tp}.up.{i}.upsample.conv", f"{dst_t}/up_{i}_upsample/conv")
    t.conv2d(f"{p}.quant_conv", "quant_conv")
    t.conv2d(f"{p}.post_quant_conv", "post_quant_conv")


# ---------------------------------------------------------------------------
# CLIP towers + resampler
# ---------------------------------------------------------------------------


def _map_clip_block(t: Translator, src: str, dst: str):
    t.layernorm(f"{src}.ln_1", f"{dst}/ln_1")
    t.layernorm(f"{src}.ln_2", f"{dst}/ln_2")
    t.assign(f"{dst}/in_proj/kernel", t_linear(t.take(f"{src}.attn.in_proj_weight")))
    t.assign(f"{dst}/in_proj/bias", t.take(f"{src}.attn.in_proj_bias"))
    t.linear(f"{src}.attn.out_proj", f"{dst}/out_proj")
    t.linear(f"{src}.mlp.c_fc", f"{dst}/c_fc")
    t.linear(f"{src}.mlp.c_proj", f"{dst}/c_proj")


def map_clip_text(t: Translator, src_prefix: str = "cond_stage_model.model", layers: int = 24) -> None:
    p = src_prefix
    t.assign("token_embedding/embedding", t.take(f"{p}.token_embedding.weight"))
    t.assign("positional_embedding", t.take(f"{p}.positional_embedding"))
    t.layernorm(f"{p}.ln_final", "ln_final")
    for i in range(layers):
        _map_clip_block(t, f"{p}.transformer.resblocks.{i}", f"block_{i}")


def map_clip_vision(t: Translator, src_prefix: str = "embedder.model.visual", layers: int = 32) -> None:
    p = src_prefix
    t.assign("conv1/kernel", t_conv2d(t.take(f"{p}.conv1.weight")))
    t.assign("class_embedding", t.take(f"{p}.class_embedding"))
    t.assign("positional_embedding", t.take(f"{p}.positional_embedding"))
    t.layernorm(f"{p}.ln_pre", "ln_pre")
    for i in range(layers):
        _map_clip_block(t, f"{p}.transformer.resblocks.{i}", f"block_{i}")


def map_resampler(t: Translator, src_prefix: str = "image_proj_model", depth: int = 4) -> None:
    p = src_prefix
    t.assign("latents", t.take(f"{p}.latents"))
    t.linear(f"{p}.proj_in", "proj_in")
    t.linear(f"{p}.proj_out", "proj_out")
    t.layernorm(f"{p}.norm_out", "norm_out")
    for i in range(depth):
        a = f"{p}.layers.{i}.0"
        t.layernorm(f"{a}.norm1", f"layer_{i}_attn/norm1")
        t.layernorm(f"{a}.norm2", f"layer_{i}_attn/norm2")
        t.linear(f"{a}.to_q", f"layer_{i}_attn/to_q", bias=False)
        t.linear(f"{a}.to_kv", f"layer_{i}_attn/to_kv", bias=False)
        t.linear(f"{a}.to_out", f"layer_{i}_attn/to_out", bias=False)
        f = f"{p}.layers.{i}.1"
        t.layernorm(f"{f}.0", f"layer_{i}_ff/norm")
        t.linear(f"{f}.1", f"layer_{i}_ff/fc1", bias=False)
        t.linear(f"{f}.3", f"layer_{i}_ff/fc2", bias=False)


# ---------------------------------------------------------------------------
# DUSt3R
# ---------------------------------------------------------------------------


def _map_croco_enc_block(t: Translator, src: str, dst: str):
    t.layernorm(f"{src}.norm1", f"{dst}/norm1")
    t.layernorm(f"{src}.norm2", f"{dst}/norm2")
    t.linear(f"{src}.attn.qkv", f"{dst}/attn/qkv")
    t.linear(f"{src}.attn.proj", f"{dst}/attn/proj")
    t.linear(f"{src}.mlp.fc1", f"{dst}/mlp/fc1")
    t.linear(f"{src}.mlp.fc2", f"{dst}/mlp/fc2")


def _map_croco_dec_block(t: Translator, src: str, dst: str):
    t.layernorm(f"{src}.norm1", f"{dst}/norm1")
    t.layernorm(f"{src}.norm2", f"{dst}/norm2")
    t.layernorm(f"{src}.norm3", f"{dst}/norm3")
    t.layernorm(f"{src}.norm_y", f"{dst}/norm_y")
    t.linear(f"{src}.attn.qkv", f"{dst}/attn/qkv")
    t.linear(f"{src}.attn.proj", f"{dst}/attn/proj")
    for nm in ["projq", "projk", "projv", "proj"]:
        t.linear(f"{src}.cross_attn.{nm}", f"{dst}/cross_attn/{nm}")
    t.linear(f"{src}.mlp.fc1", f"{dst}/mlp/fc1")
    t.linear(f"{src}.mlp.fc2", f"{dst}/mlp/fc2")


def _map_dpt_head(t: Translator, src: str, dst: str):
    # act_postprocess: [0]=1x1 conv, [1]=convtranspose (x4 / x2) for levels 1,2
    t.conv2d(f"{src}.dpt.act_postprocess.0.0", f"{dst}/act1_proj")
    t.convtranspose2d(f"{src}.dpt.act_postprocess.0.1", f"{dst}/act1_up")
    t.conv2d(f"{src}.dpt.act_postprocess.1.0", f"{dst}/act2_proj")
    t.convtranspose2d(f"{src}.dpt.act_postprocess.1.1", f"{dst}/act2_up")
    t.conv2d(f"{src}.dpt.act_postprocess.2.0", f"{dst}/act3_proj")
    t.conv2d(f"{src}.dpt.act_postprocess.3.0", f"{dst}/act4_proj")
    t.conv2d(f"{src}.dpt.act_postprocess.3.1", f"{dst}/act4_down")
    for i in range(4):
        t.conv2d(f"{src}.dpt.scratch.layer{i+1}_rn", f"{dst}/layer{i+1}_rn", bias=False)
        rsrc = f"{src}.dpt.scratch.refinenet{i+1}"
        rdst = f"{dst}/refinenet{i+1}"
        # refinenet4 (pyramid top) gets no skip input, so its resConfUnit1 is
        # dead weight in the reference (dpt_block.py FeatureFusionBlock_custom
        # only runs resConfUnit1 when given two inputs); our FusionBlock
        # doesn't materialize it
        units = [("resConfUnit2", "rcu2")] if i == 3 else [("resConfUnit1", "rcu1"), ("resConfUnit2", "rcu2")]
        for u, un in units:
            if t.has(f"{rsrc}.{u}.conv1.weight"):
                t.conv2d(f"{rsrc}.{u}.conv1", f"{rdst}/{un}/conv1")
                t.conv2d(f"{rsrc}.{u}.conv2", f"{rdst}/{un}/conv2")
        t.conv2d(f"{rsrc}.out_conv", f"{rdst}/out_conv")
    t.conv2d(f"{src}.dpt.head.0", f"{dst}/head_conv1")
    t.conv2d(f"{src}.dpt.head.2", f"{dst}/head_conv2")
    t.conv2d(f"{src}.dpt.head.4", f"{dst}/head_conv3")


def map_croco_pretrain(t: Translator, enc_depth: int, dec_depth: int) -> None:
    """CroCoNet pretraining checkpoint (croco/models/croco.py:21-115) ->
    models/croco_pretrain.CroCoPretrain params."""
    t.conv2d("patch_embed.proj", "patch_embed")
    t.layernorm("enc_norm", "enc_norm")
    for i in range(enc_depth):
        _map_croco_enc_block(t, f"enc_blocks.{i}", f"enc_block_{i}")
    t.linear("decoder_embed", "decoder_embed")
    t.assign("mask_token", t.take("mask_token"))
    t.layernorm("dec_norm", "dec_norm")
    for i in range(dec_depth):
        _map_croco_dec_block(t, f"dec_blocks.{i}", f"dec_block_{i}")
    t.linear("prediction_head", "prediction_head")


def map_dust3r(t: Translator, cfg=None) -> None:
    from viewcrafter_tpu.config import Dust3rConfig

    cfg = cfg or Dust3rConfig()
    t.conv2d("patch_embed.proj", "encoder/patch_embed")
    t.layernorm("enc_norm", "encoder/norm")
    for i in range(cfg.enc_depth):
        _map_croco_enc_block(t, f"enc_blocks.{i}", f"encoder/block_{i}")
    t.linear("decoder_embed", "decoder/decoder_embed")
    t.layernorm("dec_norm", "decoder/norm")
    for i in range(cfg.dec_depth):
        _map_croco_dec_block(t, f"dec_blocks.{i}", f"decoder/block1_{i}")
        _map_croco_dec_block(t, f"dec_blocks2.{i}", f"decoder/block2_{i}")
    if cfg.head_type == "dpt":
        _map_dpt_head(t, "downstream_head1", "head1")
        _map_dpt_head(t, "downstream_head2", "head2")
    else:
        t.linear("downstream_head1.proj", "head1/proj")
        t.linear("downstream_head2.proj", "head2/proj")


# ---------------------------------------------------------------------------
# top-level entry points
# ---------------------------------------------------------------------------


def translate_lvdm_checkpoint(raw_state: Dict[str, Any], model_cfg) -> Dict[str, Dict]:
    """Full diffusion ckpt -> {'unet':…, 'vae':…, 'clip_text':…,
    'clip_vision':…, 'resampler':…} flax param trees (each wrapped in
    {'params': …})."""
    sd = normalize_lvdm_state_dict(raw_state)

    t = Translator(sd)
    map_unet(t, cfg=model_cfg.unet)
    unet = t.nested()

    t = Translator(sd)
    map_vae(t, cfg=model_cfg.vae)
    vae = t.nested()

    t = Translator(sd)
    map_clip_text(t, layers=model_cfg.clip_text.layers)
    clip_text = t.nested()

    t = Translator(sd)
    map_clip_vision(t, layers=model_cfg.clip_vision.layers)
    clip_vision = t.nested()

    t = Translator(sd)
    map_resampler(t, depth=model_cfg.resampler.depth)
    resampler = t.nested()

    return {
        "unet": {"params": unet},
        "vae": {"params": vae},
        "clip_text": {"params": clip_text},
        "clip_vision": {"params": clip_vision},
        "resampler": {"params": resampler},
    }


def translate_dust3r_checkpoint(raw_state: Dict[str, Any], cfg=None) -> Dict[str, Any]:
    sd = normalize_dust3r_state_dict(raw_state)
    t = Translator(sd)
    map_dust3r(t, cfg=cfg)
    return {"params": t.nested()}


def map_croco_downstream(t: Translator, cfg=None, monocular: bool = False) -> None:
    """CroCoDownstreamBinocular / CroCoDownstreamMonocularEncoder state_dict
    (croco/models/croco_downstream.py:23-122 + head_downstream.py's
    head.dpt.* adapter) -> models/croco_downstream params."""
    from viewcrafter_tpu.models.croco_downstream import CroCoDownstreamConfig

    cfg = cfg or CroCoDownstreamConfig()
    t.conv2d("patch_embed.proj", "patch_embed")
    t.layernorm("enc_norm", "enc_norm")
    for i in range(cfg.enc_depth):
        _map_croco_enc_block(t, f"enc_blocks.{i}", f"enc_block_{i}")
    if not monocular:
        t.linear("decoder_embed", "decoder_embed")
        t.layernorm("dec_norm", "dec_norm")
        for i in range(cfg.dec_depth):
            _map_croco_dec_block(t, f"dec_blocks.{i}", f"dec_block_{i}")
    _map_dpt_head(t, "head", "head")


def translate_croco_downstream_checkpoint(
    raw_state: Dict[str, Any], cfg=None, monocular: bool = False
) -> Dict[str, Any]:
    sd = normalize_dust3r_state_dict(raw_state)
    t = Translator(sd)
    map_croco_downstream(t, cfg=cfg, monocular=monocular)
    return {"params": t.nested()}


def load_torch_file(path: str) -> Dict[str, Any]:
    """Load a torch .ckpt/.pth on CPU (weights only where possible)."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        return torch.load(path, map_location="cpu", weights_only=False)


def verify_tree_shapes(translated: Dict[str, Any], reference: Dict[str, Any], path: str = "") -> list[str]:
    """Compare a translated tree against a model.init tree; returns a list of
    mismatch descriptions (empty == perfect match)."""
    errs: list[str] = []
    keys_t = set(translated)
    keys_r = set(reference)
    for k in sorted(keys_r - keys_t):
        errs.append(f"missing: {path}/{k}")
    for k in sorted(keys_t - keys_r):
        errs.append(f"unexpected: {path}/{k}")
    for k in sorted(keys_t & keys_r):
        tv, rv = translated[k], reference[k]
        if isinstance(rv, dict):
            if not isinstance(tv, dict):
                errs.append(f"type mismatch at {path}/{k}")
            else:
                errs.extend(verify_tree_shapes(tv, rv, f"{path}/{k}"))
        else:
            t_shape = tuple(getattr(tv, "shape", np.shape(tv)))
            r_shape = tuple(getattr(rv, "shape", np.shape(rv)))
            if t_shape != r_shape:
                errs.append(f"shape {path}/{k}: ckpt {t_shape} vs model {r_shape}")
    return errs


# ---------------------------------------------------------------------------
# our own save/resume (orbax)
# ---------------------------------------------------------------------------


def save_params(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, like: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, like)
    return ckptr.restore(path)
