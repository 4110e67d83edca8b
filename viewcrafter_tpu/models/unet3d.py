"""3D U-Net video denoiser with factorized spatial/temporal attention.

Architecture parity with the reference UNetModel
(lvdm/modules/networks/openaimodel3d.py:311-603) and its attention library
(lvdm/modules/attention.py):
  - ResBlock + TemporalConvBlock (openaimodel3d.py:109-279)
  - SpatialTransformer over (h w) tokens per frame (attention.py:249-310)
  - TemporalTransformer over t tokens per pixel (attention.py:313-412)
  - dual-stream image cross-attention: separate k/v for the image tokens past
    text_context_len, out = out + out_ip (attention.py:42-144)
  - extra init temporal transformer after conv_in (`addition_attention`,
    openaimodel3d.py:389-399,584-585)
  - fps conditioning via a second zero-init sinusoidal MLP (:375-382,569-577)
  - per-frame image-context split when L == 77 + 16*t (:553-563)

TPU-first design: channels-last tensors everywhere; frames ride the batch axis
for spatial ops ((B*T, H, W, C)) and pixels ride it for temporal ops
((B*H*W, T, C)); bf16 matmuls, fp32 GroupNorm/LayerNorm/softmax; flash
attention for long spatial sequences. CFG cond/uncond pairs are batched along
B by the sampler instead of two sequential UNet calls.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from viewcrafter_tpu.config import UNetConfig
from viewcrafter_tpu.models.layers import (
    Conv,
    Dense,
    DenseParams as _DenseParams,
    FeedForward,
    GroupNorm32,
    LayerNormF32,
    LNParams as _LNParams,
    layer_norm_f32 as _layer_norm_f32,
    silu,
)
from viewcrafter_tpu.ops.attention import attention
from viewcrafter_tpu.ops.schedule import timestep_embedding
from viewcrafter_tpu.parallel import tp as _tp

Dtype = Any


class CrossAttention(nn.Module):
    """Multi-head attention with optional dual-stream image cross-attention
    (attention.py:42-144). Self-attention when context is None."""

    heads: int
    dim_head: int
    query_dim: int
    context_dim: Optional[int] = None
    image_cross_attention: bool = False
    text_context_len: int = 77
    attn_impl: str = "auto"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        h, d = self.heads, self.dim_head
        inner = h * d
        b, n, _ = x.shape
        q = Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)

        is_self = context is None
        ctx = x if is_self else context
        ctx_img = None
        if self.image_cross_attention and not is_self:
            ctx, ctx_img = ctx[:, : self.text_context_len], ctx[:, self.text_context_len :]
        elif not is_self:
            ctx = ctx[:, : self.text_context_len]

        k = Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        qh = q.reshape(b, n, h, d)
        # tensor parallelism: heads over "tp" (no-op without an active tp
        # mesh); the leading (B*T) axis keeps its dp x sp batch sharding
        qh = _tp.constrain(qh, ("dp", "sp"), None, "tp", None)
        k = _tp.constrain(k.reshape(b, -1, h, d), ("dp", "sp"), None, "tp", None)
        v = _tp.constrain(v.reshape(b, -1, h, d), ("dp", "sp"), None, "tp", None)

        if ctx_img is not None:
            k_ip = Dense(inner, use_bias=False, dtype=self.dtype, name="to_k_ip")(ctx_img)
            v_ip = Dense(inner, use_bias=False, dtype=self.dtype, name="to_v_ip")(ctx_img)
            k_ip = _tp.constrain(
                k_ip.reshape(b, -1, h, d), ("dp", "sp"), None, "tp", None)
            v_ip = _tp.constrain(
                v_ip.reshape(b, -1, h, d), ("dp", "sp"), None, "tp", None)
            if self._use_dual_kernel(b, n, ctx.shape[1], ctx_img.shape[1], mask):
                # fused text+image dual-stream kernel: both attention calls in
                # ONE pallas pass (ops/pallas/cross_attention.py); identical
                # math — out_text + out_img with separate softmaxes
                # (reference attention.py:89-144)
                from viewcrafter_tpu.ops.pallas.cross_attention import dual_cross_attention

                out = dual_cross_attention(
                    qh,
                    k.reshape(b, -1, h, d), v.reshape(b, -1, h, d),
                    k_ip.reshape(b, -1, h, d), v_ip.reshape(b, -1, h, d),
                ).reshape(b, n, inner)
                return Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)
            out = attention(
                qh, k.reshape(b, -1, h, d), v.reshape(b, -1, h, d), mask=mask, impl=self.attn_impl
            ).reshape(b, n, inner)
            out_ip = attention(
                qh, k_ip.reshape(b, -1, h, d), v_ip.reshape(b, -1, h, d), impl=self.attn_impl
            ).reshape(b, n, inner)
            out = out + out_ip  # image_cross_attention_scale = 1.0 in all shipped configs
        else:
            out = attention(
                qh, k.reshape(b, -1, h, d), v.reshape(b, -1, h, d), mask=mask, impl=self.attn_impl
            ).reshape(b, n, inner)

        return Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)

    def _use_dual_kernel(self, b, n, lt, li, mask) -> bool:
        import os

        from viewcrafter_tpu.ops.attention import _on_tpu
        from viewcrafter_tpu.ops.pallas.cross_attention import supports_dual

        impl = os.environ.get("VIEWCRAFTER_ATTN_IMPL", self.attn_impl)
        return (
            mask is None
            and impl != "xla"
            and _on_tpu()
            and _tp.active_mesh() is None  # pallas is opaque to the partitioner
            and supports_dual((b, n, self.heads, self.dim_head), lt, li)
        )


class AttnCacheCtx:
    """Attention-output caching (Pyramid-Attention-Broadcast-style reuse,
    arXiv:2408.12588): attention deltas drift slowly across adjacent DDIM
    steps, so a step may REUSE the previous step's attention outputs instead
    of recomputing them.

    Statically-gated plumbing: `reads` is a dict of site-name -> cached array
    consumed instead of computing that attention; `writes` collects this
    pass's outputs. Both None -> exactly the baseline graph (no cond, no
    overhead). The DDIM driver alternates compiled full/reuse programs
    per the broadcast cadence (see models/lvdm.py round-2 roadmap)."""

    def __init__(self, reads=None, collect=False, spatial=True, cross=True,
                 temporal=True, ff=False, store_dtype=None, compute_dtype=None):
        self.reads = reads or {}
        self.writes = {} if collect else None
        self.spatial = spatial  # cache spatial self-attention sites
        self.cross = cross  # cache cross-attention sites
        self.temporal = temporal  # cache temporal self-attention sites
        self.ff = ff  # cache feed-forward deltas (beyond-PAB, coarser reuse)
        # store_dtype: cache storage dtype (e.g. jnp.float8_e4m3fn halves the
        # cache HBM footprint — the broadcast deltas tolerate 8-bit storage);
        # compute_dtype: what reads are cast back to
        self.store_dtype = store_dtype
        self.compute_dtype = compute_dtype

    def site(self, kind: str, name: str, compute):
        enabled = getattr(self, kind)
        if enabled and name in self.reads:
            out = self.reads[name]
            if self.compute_dtype is not None:
                out = out.astype(self.compute_dtype)
        else:
            out = compute()
        if self.writes is not None and enabled:
            self.writes[name] = (
                out.astype(self.store_dtype) if self.store_dtype is not None else out
            )
        return out


_NO_CACHE = AttnCacheCtx()


class TransformerBlock(nn.Module):
    """norm->self-attn, norm->cross-attn, norm->GEGLU-FF, each residual
    (attention.py:212-246)."""

    dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    image_cross_attention: bool = False
    self_attn_impl: str = "auto"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context=None, mask=None, cache=_NO_CACHE, site="", tile_k=1):
        attn1 = CrossAttention(
            heads=self.heads, dim_head=self.dim_head, query_dim=self.dim,
            attn_impl=self.self_attn_impl, dtype=self.dtype, name="attn1",
        )
        x = x + cache.site("spatial", site + "/attn1",
                           lambda: attn1(LayerNormF32(name="norm1")(x), mask=mask))
        if tile_k > 1:
            # CFG-prefix dedup tile point (see UNet3D shared_prefix): everything
            # up to and including attn1 ran once for the K identical guidance
            # branches; attn2 consumes the per-branch context, so replicate here
            x = jnp.tile(x, (tile_k, 1, 1))
        # temporal blocks are self-attention-only: attn2 gets no context and
        # degrades to self-attention (attention.py:387-390)
        attn2 = CrossAttention(
            heads=self.heads, dim_head=self.dim_head, query_dim=self.dim,
            context_dim=self.context_dim,
            image_cross_attention=self.image_cross_attention and context is not None,
            attn_impl="xla" if context is not None else self.self_attn_impl,
            dtype=self.dtype, name="attn2",
        )
        kind2 = "cross" if context is not None else "spatial"
        x = x + cache.site(kind2, site + "/attn2",
                           lambda: attn2(LayerNormF32(name="norm2")(x), context=context, mask=mask))
        ln3 = _LNParams(self.dim, name="norm3")()
        ff = FeedForward(self.dim, impl=self.self_attn_impl, dtype=self.dtype, name="ff")
        x = x + cache.site("ff", site + "/ff", lambda: ff(x, ln=ln3))
        return x


class SpatialTransformer(nn.Module):
    """Per-frame transformer over (h*w) tokens with linear projections
    (attention.py:249-310, use_linear=True)."""

    channels: int
    heads: int
    dim_head: int
    depth: int = 1
    context_dim: int = 1024
    image_cross_attention: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context, cache=_NO_CACHE, site="", tile_k=1):
        # x: (BT, H, W, C); context: (BT, L, context_dim). tile_k > 1: x holds
        # ONE of tile_k identical CFG branches; the batch replicates to the
        # full context batch inside block_0 after its self-attention.
        bt, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        h = GroupNorm32(32, eps=1e-6, name="norm")(x).reshape(bt, hh * ww, c)
        h = Dense(inner, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.depth):
            h = TransformerBlock(
                dim=inner, heads=self.heads, dim_head=self.dim_head,
                context_dim=self.context_dim,
                image_cross_attention=self.image_cross_attention,
                dtype=self.dtype, name=f"block_{i}",
            )(h, context=context, cache=cache, site=f"{site}/block_{i}",
              tile_k=tile_k if i == 0 else 1)
        h = Dense(self.channels, dtype=self.dtype, zero_init=True, name="proj_out")(h)
        if tile_k > 1:
            x = jnp.tile(x, (tile_k, 1, 1, 1))
            bt = x.shape[0]
        return x + h.reshape(bt, hh, ww, c)


def _temporal_attention(q, k, v, mask=None, k2=None, v2=None):
    """Self-attention over the t axis of (B, T, S, H, D) tensors WITHOUT
    materializing a (B*S, T, C) transpose — XLA folds the layout change into
    the matmuls (a standalone transpose of the ds1 activations costs ~8% of a
    flagship UNet eval). On TPU, qualifying shapes run the fused Pallas
    kernel (ops/pallas/temporal_attention.py) which keeps the (T, T) logits
    in VMEM — the XLA path round-trips them through HBM (~28 ms/site at
    flagship shapes vs ~1.5 ms speed-of-light).

    k2/v2: optional Shaw-style relative-position embeddings (Tq, Tk, D)
    shared across batch/pixels/heads (reference RelativePosition,
    lvdm/modules/attention.py:20-39,104-123): k2 adds q·k2 to the logits,
    v2 adds probs·v2 to the output. Forces the XLA path."""
    from viewcrafter_tpu.ops.attention import _on_tpu
    from viewcrafter_tpu.ops.pallas.temporal_attention import (
        supports_fused, temporal_attention_fused,
    )

    if (mask is None and k2 is None and v2 is None and _on_tpu()
            and _tp.active_mesh() is None and supports_fused(q.shape)):
        return temporal_attention_fused(q, k, v)
    d = q.shape[-1]
    logits = jnp.einsum("bqshd,bkshd->bshqk", q, k, preferred_element_type=jnp.float32)
    if k2 is not None:
        logits = logits + jnp.einsum(
            "bqshd,qkd->bshqk", q, k2.astype(q.dtype), preferred_element_type=jnp.float32
        )
    logits = logits.astype(jnp.float32) * (d**-0.5)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bshqk,bkshd->bqshd", probs, v, preferred_element_type=jnp.float32)
    if v2 is not None:
        out = out + jnp.einsum(
            "bshqk,qkd->bqshd", probs, v2.astype(q.dtype), preferred_element_type=jnp.float32
        )
    return out.astype(q.dtype)


def _relative_position_table(module, name: str, max_rel: int, dim: int):
    """(2*max_rel+1, dim) xavier-uniform table, gathered to (Tq, Tk, dim) at
    call time (reference RelativePosition, attention.py:20-39)."""
    return module.param(
        name, nn.initializers.xavier_uniform(), (2 * max_rel + 1, dim), jnp.float32
    )


def _gather_relative(table, tq: int, tk: int, max_rel: int):
    dist = jnp.arange(tk)[None, :] - jnp.arange(tq)[:, None]
    idx = jnp.clip(dist, -max_rel, max_rel) + max_rel
    return table[idx]  # (Tq, Tk, dim)


class TemporalSelfAttention(nn.Module):
    """CrossAttention-compatible params (to_q/k/v/out) acting on (B,T,S,C).

    `ln`: optional (scale, bias) of the preceding LayerNorm; when given, the
    norm is applied INSIDE this module so that on TPU the whole layer
    (LayerNorm + QKV projection + attention + out projection) runs as ONE
    Pallas kernel (ops/pallas/temporal_layer.py) — the unfused composition
    pays ~12 HBM passes over the activation against the kernel's 2
    (measured 21.3 -> 7.4 ms per flagship ds1 site, scripts/
    profile_temporal_v4.py).

    relative_position=True adds the Shaw-style learned relative-position
    bias the reference builds when `use_relative_position` is set
    (attention.py:59-63,104-123; off in every shipped config): two
    (2*temporal_length+1, dim_head) tables shared across heads, one biasing
    the logits via q·k2, one the output via probs·v2. Forces the unfused
    path.

    attn_impl="xla" disables the fused kernel programmatically (the
    VIEWCRAFTER_ATTN_IMPL env var still takes precedence), mirroring the
    spatial CrossAttention gate."""

    heads: int
    dim_head: int
    query_dim: int
    relative_position: bool = False
    temporal_length: int = 0
    attn_impl: str = "auto"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None, ln=None):
        import os

        from viewcrafter_tpu.ops.attention import _on_tpu
        from viewcrafter_tpu.ops.pallas.temporal_layer import (
            fused_temporal_layer, supports_fused_layer,
        )

        b, t, s, c = x.shape
        h, d = self.heads, self.dim_head
        inner = h * d
        wq, _ = _DenseParams(c, inner, use_bias=False, name="to_q")()
        wk, _ = _DenseParams(c, inner, use_bias=False, name="to_k")()
        wv, _ = _DenseParams(c, inner, use_bias=False, name="to_v")()
        wo, bo = _DenseParams(inner, self.query_dim, name="to_out")()
        k2 = v2 = None
        if self.relative_position:
            L = self.temporal_length
            k2 = _gather_relative(
                _relative_position_table(self, "rel_k_table", L, d), t, t, L)
            v2 = _gather_relative(
                _relative_position_table(self, "rel_v_table", L, d), t, t, L)

        fuse = (
            ln is not None and mask is None and k2 is None
            and c == inner and self.query_dim == c
            and os.environ.get("VIEWCRAFTER_ATTN_IMPL", self.attn_impl) != "xla"
            and _on_tpu()
            and _tp.active_mesh() is None  # pallas is opaque to the partitioner
            and supports_fused_layer(x.shape, h, d, itemsize=x.dtype.itemsize)
        )
        if fuse:
            wqkv = jnp.concatenate([wq, wk, wv], axis=1)
            return fused_temporal_layer(
                x, ln[0], ln[1], wqkv, wo, bo, heads=h, dim_head=d)

        if ln is not None:
            x = _layer_norm_f32(x, ln[0], ln[1])
        xc = x.astype(self.dtype)
        q = (xc @ wq.astype(self.dtype)).reshape(b, t, s, h, d)
        k = (xc @ wk.astype(self.dtype)).reshape(b, t, s, h, d)
        v = (xc @ wv.astype(self.dtype)).reshape(b, t, s, h, d)
        # tensor parallelism: heads over "tp", and the frame axis (the
        # attention axis here) reshards to the pixel axis over "sp" — the
        # explicit T->S reshard is the temporal-stage collective the sp
        # design pays anyway (no-op without an active tp mesh)
        q = _tp.constrain(q, "dp", None, "sp", "tp", None)
        k = _tp.constrain(k, "dp", None, "sp", "tp", None)
        v = _tp.constrain(v, "dp", None, "sp", "tp", None)
        o = _temporal_attention(q, k, v, mask, k2=k2, v2=v2).reshape(b, t, s, inner)
        return o.astype(self.dtype) @ wo.astype(self.dtype) + bo.astype(self.dtype)


class TemporalTransformerBlock(nn.Module):
    """TransformerBlock twin for the (B,T,S,C) layout; identical param names
    (attn1/attn2 are both self-attention: only_self_att, attention.py:387-390)."""

    dim: int
    heads: int
    dim_head: int
    relative_position: bool = False
    temporal_length: int = 0
    attn_impl: str = "auto"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None, cache=_NO_CACHE, site=""):
        # the pre-attention LayerNorms are applied inside TemporalSelfAttention
        # (fused into the Pallas layer kernel on TPU); _LNParams keeps the
        # LayerNormF32 checkpoint layout
        ln1 = _LNParams(self.dim, name="norm1")()
        attn1 = TemporalSelfAttention(
            heads=self.heads, dim_head=self.dim_head, query_dim=self.dim,
            relative_position=self.relative_position,
            temporal_length=self.temporal_length,
            attn_impl=self.attn_impl, dtype=self.dtype, name="attn1",
        )
        x = x + cache.site("temporal", site + "/attn1",
                           lambda: attn1(x, mask=mask, ln=ln1))
        ln2 = _LNParams(self.dim, name="norm2")()
        attn2 = TemporalSelfAttention(
            heads=self.heads, dim_head=self.dim_head, query_dim=self.dim,
            relative_position=self.relative_position,
            temporal_length=self.temporal_length,
            attn_impl=self.attn_impl, dtype=self.dtype, name="attn2",
        )
        x = x + cache.site("temporal", site + "/attn2",
                           lambda: attn2(x, mask=mask, ln=ln2))
        ln3 = _LNParams(self.dim, name="norm3")()
        ff = FeedForward(self.dim, impl=self.attn_impl, dtype=self.dtype, name="ff")
        x = x + cache.site("ff", site + "/ff", lambda: ff(x, ln=ln3))
        return x


class TemporalTransformer(nn.Module):
    """Transformer over the t axis per pixel (attention.py:313-412,
    use_linear=True, only_self_att=True). Runs in the native (B, T, S, C)
    layout end to end."""

    channels: int
    heads: int
    dim_head: int
    depth: int = 1
    causal: bool = False
    relative_position: bool = False
    temporal_length: int = 0
    attn_impl: str = "auto"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, cache=_NO_CACHE, site=""):
        # x: (B, T, H, W, C)
        b, t, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        h = GroupNorm32(32, eps=1e-6, name="norm")(x)
        h = h.reshape(b, t, hh * ww, c)
        h = Dense(inner, dtype=self.dtype, name="proj_in")(h)
        mask = None
        if self.causal:
            # broadcast over (b, s, heads): logits are (B, S, H, Tq, Tk)
            mask = jnp.tril(jnp.ones((t, t), dtype=bool))[None, None, None]
        for i in range(self.depth):
            h = TemporalTransformerBlock(
                dim=inner, heads=self.heads, dim_head=self.dim_head,
                relative_position=self.relative_position,
                temporal_length=self.temporal_length,
                attn_impl=self.attn_impl,
                dtype=self.dtype, name=f"block_{i}",
            )(h, mask=mask, cache=cache, site=f"{site}/block_{i}")
        h = Dense(self.channels, dtype=self.dtype, zero_init=True, name="proj_out")(h)
        return x + h.reshape(b, t, hh, ww, c)


class TemporalConv3(nn.Module):
    """Conv3d((3,1,1)) with nn.Conv-compatible params ((3,1,1,Cin,Cout)
    kernel + (Cout,) bias under this module's scope). TPU shapes run the
    fused Pallas kernel (ops/pallas/temporal_conv.py: one VMEM-resident
    3-tap matmul chain, ~3.6x XLA's general conv at flagship shapes);
    elsewhere an identical-math shifted-matmul formulation."""

    features: int
    zero_init: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from viewcrafter_tpu.ops.attention import _on_tpu
        from viewcrafter_tpu.ops.pallas.temporal_conv import (
            supports_fused, temporal_conv3,
        )

        b, t, hh, ww, c = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal(),
            (3, 1, 1, c, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        xf = x.astype(self.dtype).reshape(b, t, hh * ww, c)
        w = kernel[:, 0, 0]
        if (_on_tpu() and _tp.active_mesh() is None
                and supports_fused(xf.shape, c, self.features)):
            y = temporal_conv3(xf, w.astype(self.dtype), bias)
        else:
            xp = jnp.pad(xf, ((0, 0), (1, 1), (0, 0), (0, 0)))
            y = jnp.zeros(xf.shape[:-1] + (self.features,), jnp.float32)
            for dt in range(3):
                y = y + jnp.einsum(
                    "btsc,cd->btsd", xp[:, dt:dt + t], w[dt].astype(self.dtype),
                    preferred_element_type=jnp.float32,
                )
            y = (y + bias).astype(self.dtype)
        return y.reshape(b, t, hh, ww, self.features)


class TemporalConvBlock(nn.Module):
    """4x (GroupNorm -> SiLU -> Conv3d(3,1,1)) residual stack, zero-init last
    conv so it starts as identity (openaimodel3d.py:239-279)."""

    channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: (B, T, H, W, C); kernel (3,1,1) convolves t only
        h = x
        for i in range(4):
            h = GroupNorm32(32, with_silu=True, name=f"norm_{i}")(h)
            h = TemporalConv3(self.channels, zero_init=(i == 3), dtype=self.dtype, name=f"conv_{i}")(h)
        return x + h


class ResBlock(nn.Module):
    """GN-SiLU-conv, +time-emb, GN-SiLU-zeroconv, skip; then temporal conv
    (openaimodel3d.py:109-236)."""

    out_channels: int
    use_temporal_conv: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, emb, batch_size: int):
        # x: (BT, H, W, C); emb: (BT, D)
        h = GroupNorm32(32, with_silu=True, name="in_norm")(x)
        h = Conv(self.out_channels, (3, 3), dtype=self.dtype, name="in_conv")(h)
        # tensor parallelism: conv output channels over "tp" (the 32-group
        # GroupNorm reduces within channel groups, so a tp that divides the
        # group count stays collective-free); no-op without an active tp mesh
        h = _tp.constrain(h, ("dp", "sp"), None, None, "tp")
        emb_out = Dense(self.out_channels, dtype=self.dtype, name="emb_proj")(silu(emb))
        h = h + emb_out[:, None, None, :].astype(h.dtype)
        h = GroupNorm32(32, with_silu=True, name="out_norm")(h)
        h = Conv(self.out_channels, (3, 3), dtype=self.dtype, zero_init=True, name="out_conv")(h)
        h = _tp.constrain(h, ("dp", "sp"), None, None, "tp")
        if x.shape[-1] != self.out_channels:
            x = Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip")(x)
        h = x + h
        if self.use_temporal_conv:
            bt, hh, ww, c = h.shape
            t = bt // batch_size
            hv = h.reshape(batch_size, t, hh, ww, c)
            hv = TemporalConvBlock(c, dtype=self.dtype, name="temporal_conv")(hv)
            h = hv.reshape(bt, hh, ww, c)
        return h


class Downsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # explicit (1,1) padding: torch stride-2 pad-1 conv semantics (XLA
        # "SAME" would pad asymmetrically at the end instead)
        return Conv(
            self.channels, (3, 3), strides=2, padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="op",
        )(x)


class Upsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return Conv(self.channels, (3, 3), dtype=self.dtype, name="conv")(x)


class UNet3D(nn.Module):
    """Full denoiser. Input x: (B, T, H, W, in_channels) — the noisy latent
    channel-concatenated with the rendered-guidance latent (`hybrid`
    conditioning, ddpm3d.py:1437-1443). Output: (B, T, H, W, out_channels) v-pred.

    remat=True rematerializes every transformer / ResBlock in the backward
    pass (the reference's per-block gradient checkpointing,
    lvdm/common.py:81-94 + attention.py:231-239; disabled at inference there
    too) — required to fit flagship-scale training activations."""

    cfg: UNetConfig = UNetConfig()
    dtype: Dtype = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x, timesteps, context, fs=None, attn_cache=None,
                 collect_cache=False, cache_kinds=("spatial", "cross", "temporal"),
                 cache_dtype=None, shared_prefix=1):
        """attn_cache/collect_cache: PAB-style attention-output reuse (see
        AttnCacheCtx). attn_cache is a dict of site->array consumed INSTEAD of
        computing those attentions; collect_cache=True additionally returns
        {site: output} for the caller to feed to the next step. Both default
        off -> baseline graph.

        shared_prefix=K asserts the K leading-axis guidance branches of x /
        timesteps / fs are IDENTICAL (the batched-CFG layout: the sampler
        tiles one latent K times, sampling/ddim.py:106-114; only `context`
        differs per branch). The prefix of the net up to the first
        cross-attention is then computed once at batch B/K and replicated at
        the first context-consuming site — bitwise the same output for ~5%
        less work per eval (in_conv + init_attn + first ResBlock + first
        spatial self-attention run once instead of K times)."""
        cache = AttnCacheCtx(
            reads=attn_cache, collect=collect_cache,
            spatial="spatial" in cache_kinds, cross="cross" in cache_kinds,
            temporal="temporal" in cache_kinds, ff="ff" in cache_kinds,
            store_dtype=cache_dtype, compute_dtype=self.dtype,
        ) if (attn_cache is not None or collect_cache) else _NO_CACHE
        cfg = self.cfg
        b, t, hh, ww, _ = x.shape
        mc = cfg.model_channels
        ted = mc * 4

        # --- embeddings -----------------------------------------------------
        t_emb = timestep_embedding(timesteps.astype(jnp.float32), mc)
        emb = Dense(ted, dtype=self.dtype, name="time_embed_0")(t_emb.astype(self.dtype))
        emb = Dense(ted, dtype=self.dtype, name="time_embed_2")(silu(emb))
        if cfg.fs_condition:
            if fs is None:
                fs = jnp.full((b,), cfg.default_fs, dtype=jnp.float32)
            fs_emb = timestep_embedding(fs.astype(jnp.float32), mc)
            fs_emb = Dense(ted, dtype=self.dtype, name="fps_embed_0")(fs_emb.astype(self.dtype))
            fs_emb = Dense(ted, dtype=self.dtype, zero_init=True, name="fps_embed_2")(silu(fs_emb))
            emb = emb + fs_emb
        emb = jnp.repeat(emb, t, axis=0)  # (B*T, ted)

        # --- context: per-frame image tokens (openaimodel3d.py:553-563) -----
        l_ctx = context.shape[1]
        if l_ctx == cfg.text_context_len + t * 16:
            ctx_text = jnp.repeat(context[:, : cfg.text_context_len], t, axis=0)
            ctx_img = context[:, cfg.text_context_len :].reshape(b * t, 16, context.shape[-1])
            ctx = jnp.concatenate([ctx_text, ctx_img], axis=1)
        else:
            ctx = jnp.repeat(context, t, axis=0)
        ctx = ctx.astype(self.dtype)

        h = x.reshape(b * t, hh, ww, x.shape[-1]).astype(self.dtype)

        # gradient checkpointing: only the plain (cache-free) call signature
        # is remat-wrapped — PAB caching is an inference-only feature
        use_remat = self.remat and cache is _NO_CACHE
        SpatialT = nn.remat(SpatialTransformer) if use_remat else SpatialTransformer
        TemporalT = nn.remat(TemporalTransformer) if use_remat else TemporalTransformer
        ResB = (nn.remat(ResBlock, static_argnums=(3,)) if use_remat else ResBlock)

        # CFG-prefix dedup: run the context-independent prefix once for the K
        # identical guidance branches, replicate at the first cross-attention
        k_sh = shared_prefix
        if k_sh > 1 and (b % k_sh or cache is not _NO_CACHE or use_remat):
            k_sh = 1
        state = {"b": b // k_sh, "tiled": k_sh == 1}
        if k_sh > 1:
            h = h[: state["b"] * t]

        def cur_emb():
            return emb if state["tiled"] else emb[: state["b"] * t]

        def run_spatial(mod, h, ctx_, site):
            if use_remat:
                return mod(h, ctx_)
            tk = 1 if state["tiled"] else k_sh
            out = mod(h, ctx_, cache=cache, site=site, tile_k=tk)
            if tk > 1:
                state["b"], state["tiled"] = b, True
            return out

        def spatial(ch, ds, name):
            heads = ch // cfg.num_head_channels
            return SpatialT(
                channels=ch, heads=heads, dim_head=cfg.num_head_channels,
                depth=cfg.transformer_depth, context_dim=cfg.context_dim,
                image_cross_attention=cfg.image_cross_attention, dtype=self.dtype, name=name,
            )

        def temporal(ch, name, heads=None):
            heads = heads if heads is not None else ch // cfg.num_head_channels
            return TemporalT(
                channels=ch, heads=heads, dim_head=cfg.num_head_channels,
                depth=cfg.transformer_depth, causal=cfg.use_causal_attention,
                relative_position=cfg.use_relative_position,
                temporal_length=cfg.temporal_length,
                dtype=self.dtype, name=name,
            )

        def run_temporal(mod, h, site):
            bt, sh, sw, c = h.shape
            hv = h.reshape(state["b"], t, sh, sw, c)
            if use_remat:  # remat call args must be arrays: defaults apply
                return mod(hv).reshape(bt, sh, sw, c)
            return mod(hv, cache=cache, site=site).reshape(bt, sh, sw, c)

        def pop_skip(h):
            skip = hs.pop()
            if skip.shape[0] != h.shape[0]:  # pushed before the dedup tile point
                skip = jnp.tile(skip, (k_sh, 1, 1, 1))
            return jnp.concatenate([h, skip], axis=-1)

        # --- input blocks ----------------------------------------------------
        hs = []
        h = Conv(mc, (3, 3), dtype=self.dtype, name="in_conv")(h)
        if cfg.addition_attention:
            # init temporal attention: fixed 8 heads (openaimodel3d.py:389-399)
            h = run_temporal(temporal(mc, "init_attn", heads=8), h, "init_attn")
        hs.append(h)

        ch = mc
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            for j in range(cfg.num_res_blocks):
                h = ResB(mult * mc, use_temporal_conv=cfg.temporal_conv,
                             dtype=self.dtype, name=f"down_{level}_{j}_res")(h, cur_emb(), state["b"])
                ch = mult * mc
                if ds in cfg.attention_resolutions:
                    h = run_spatial(spatial(ch, ds, f"down_{level}_{j}_spatial"),
                                    h, ctx, f"down_{level}_{j}_spatial")
                    if cfg.temporal_attention:
                        h = run_temporal(temporal(ch, f"down_{level}_{j}_temporal"), h,
                                         f"down_{level}_{j}_temporal")
                hs.append(h)
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(ch, dtype=self.dtype, name=f"down_{level}_downsample")(h)
                hs.append(h)
                ds *= 2

        # --- middle ----------------------------------------------------------
        h = ResB(ch, use_temporal_conv=cfg.temporal_conv, dtype=self.dtype, name="mid_res1")(h, cur_emb(), state["b"])
        h = run_spatial(spatial(ch, ds, "mid_spatial"), h, ctx, "mid_spatial")
        if cfg.temporal_attention:
            h = run_temporal(temporal(ch, "mid_temporal"), h, "mid_temporal")
        h = ResB(ch, use_temporal_conv=cfg.temporal_conv, dtype=self.dtype, name="mid_res2")(h, cur_emb(), state["b"])

        # --- output blocks ---------------------------------------------------
        for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
            for j in range(cfg.num_res_blocks + 1):
                h = pop_skip(h)
                h = ResB(mult * mc, use_temporal_conv=cfg.temporal_conv,
                             dtype=self.dtype, name=f"up_{level}_{j}_res")(h, cur_emb(), state["b"])
                ch = mult * mc
                if ds in cfg.attention_resolutions:
                    h = run_spatial(spatial(ch, ds, f"up_{level}_{j}_spatial"),
                                    h, ctx, f"up_{level}_{j}_spatial")
                    if cfg.temporal_attention:
                        h = run_temporal(temporal(ch, f"up_{level}_{j}_temporal"), h,
                                         f"up_{level}_{j}_temporal")
                if level and j == cfg.num_res_blocks:
                    h = Upsample(ch, dtype=self.dtype, name=f"up_{level}_upsample")(h)
                    ds //= 2

        h = GroupNorm32(32, with_silu=True, name="out_norm")(h)
        h = Conv(cfg.out_channels, (3, 3), dtype=self.dtype, zero_init=True, name="out_conv")(h)
        if not state["tiled"]:  # degenerate config with no spatial transformer
            h = jnp.tile(h, (k_sh, 1, 1, 1))
        y = h.reshape(b, t, hh, ww, cfg.out_channels).astype(jnp.float32)
        if collect_cache:
            return y, cache.writes
        return y
