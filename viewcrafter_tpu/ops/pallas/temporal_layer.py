"""Fused temporal-attention LAYER: LayerNorm + QKV projection + per-pixel
attention over frames + output projection in ONE Pallas kernel.

Motivation (round 4, scripts/profile_temporal_v4.py): the unfused layer at
flagship ds1 shapes (B=2, T=25, S=9216, C=320) spends ~20 ms/site, almost all
of it HBM traffic — 12 full passes over the 295 MB activation (LN read/write,
3 projection reads + 3 writes, 4 kernel passes, out-proj read/write) against
a 2-pass floor. The shipping attention-only kernel
(ops/pallas/temporal_attention.py) further pays ~7 ms of in-kernel relayouts
because its 64-lane (T, TILE, D) blocks DMA at ~1/5 of HBM speed.

This kernel reads x once and writes the attention output once; everything
else lives in VMEM:

  x (1, T, tile, C) block
    -> LayerNorm over C in f32                (reference torch LN, eps=1e-5)
    -> pad T to the bf16 sublane granule, transpose to (tile, T_pad, C)
       (VMEM transpose: measured ~0.1 ms per full-array pass — cheap,
       unlike the ~3 ms XLA HBM transpose)
    -> reshape (tile*T_pad, C)                (granule-aligned: free)
    -> one (tile*T_pad, C) @ (C, 3C) matmul for Q|K|V   (MXU, large)
    -> per-head lane slices -> batched (tile, T_pad, T_pad) attention
       with padded key columns masked
    -> concat heads -> (tile*T_pad, C) @ (C, C) + bias out-projection
    -> transpose back, slice T, write

The layer output is the attention branch WITHOUT the residual add, so the
PAB attention-reuse cache (models/unet3d.py cache.site) keeps its semantics.

Matches the reference composition LayerNorm -> CrossAttention(self) ->
to_out (lvdm/modules/attention.py:54-123,387-390) in bf16 with f32 matmul
accumulation and f32 LN/softmax, like the unfused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_t(t: int) -> int:
    """T padded to the bf16 sublane granule (16)."""
    return -(-t // 16) * 16


def _kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, wo_ref, bo_ref, o_ref, *,
            heads: int, dim_head: int, eps: float, t: int, t_pad: int):
    x = x_ref[0]  # (t, tile, c)
    _, tile, c = x.shape

    # LayerNorm over channels, f32 (torch default semantics)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * lax.rsqrt(var + eps) * lns_ref[0] + lnb_ref[0]
    xn = xn.astype(x.dtype)

    # pad frames to the sublane granule, move them next to head_dim so every
    # later reshape is a layout no-op
    if t_pad != t:
        xn = jnp.pad(xn, ((0, t_pad - t), (0, 0), (0, 0)))
    xt = jnp.transpose(xn, (1, 0, 2))          # (tile, t_pad, c) VMEM transpose
    x2 = xt.reshape(tile * t_pad, c)

    y = lax.dot_general(
        x2, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)                          # (tile*t_pad, 3c)
    y3 = y.reshape(tile, t_pad, 3 * c)

    scale = dim_head ** -0.5
    col = lax.broadcasted_iota(jnp.int32, (tile, t_pad, t_pad), 2)
    neg = jnp.finfo(jnp.float32).min
    outs = []
    for hi in range(heads):
        qs = slice(hi * dim_head, (hi + 1) * dim_head)
        ks = slice(c + hi * dim_head, c + (hi + 1) * dim_head)
        vs = slice(2 * c + hi * dim_head, 2 * c + (hi + 1) * dim_head)
        qh, kh, vh = y3[:, :, qs], y3[:, :, ks], y3[:, :, vs]
        logits = lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                      # (tile, t_pad, t_pad)
        logits = jnp.where(col < t, logits * scale, neg)
        probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        outs.append(lax.dot_general(
            probs, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype))
    att = jnp.concatenate(outs, axis=-1)       # (tile, t_pad, c)

    o2 = lax.dot_general(
        att.reshape(tile * t_pad, c), wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + bo_ref[0]              # (tile*t_pad, c)
    o3 = jnp.transpose(o2.reshape(tile, t_pad, c), (1, 0, 2))
    o_ref[0] = o3[:t].astype(o_ref.dtype)


def _pick_tile(s: int, t: int, c: int, budget: int = 80 * 1024 * 1024,
               itemsize: int = 2) -> int:
    """Largest tile that divides S and keeps the block's VMEM footprint under
    budget: in/out blocks double-buffered + x2/y/att/o2 intermediates + f32
    logits + weights."""
    es = itemsize  # activation element size (bf16 2, f32 4)
    t_pad = _pad_t(t)
    w_bytes = (3 * c * c + c * c) * es
    for tile in (512, 384, 256, 192, 128, 96, 64, 48, 32, 16, 8):
        if s % tile:
            continue
        blocks = 2 * 2 * (t * tile * c * es)                # in+out, double-buffered
        inter = tile * t_pad * (c * 2 * es + 3 * c * es + c * es + c * es)  # xn/xt, y, att, o2
        logits = tile * t_pad * t_pad * 4 * 2               # logits + probs f32
        if blocks + inter + logits + w_bytes <= budget:
            return tile
    return 0


@functools.partial(
    jax.jit, static_argnames=("heads", "dim_head", "eps", "interpret"))
def fused_temporal_layer(x, ln_scale, ln_bias, wqkv, wo, bo, *,
                         heads: int, dim_head: int, eps: float = 1e-5,
                         interpret: bool = False):
    """x: (B, T, S, C) with C == heads*dim_head. Returns LayerNorm ->
    self-attention over T per (b, s) -> out-projection, shaped like x
    (the caller adds the residual). Weights are the flax Dense params:
    wqkv (C, 3C) = concat(to_q, to_k, to_v kernels), wo (C, C), bo (C,)."""
    b, t, s, c = x.shape
    assert c == heads * dim_head
    tile = _pick_tile(s, t, c, itemsize=x.dtype.itemsize)
    assert tile, f"S={s} has no supported tile"
    t_pad = _pad_t(t)
    dt = x.dtype
    spec = pl.BlockSpec((1, t, tile, c), lambda bi, si: (bi, 0, si, 0),
                        memory_space=pltpu.VMEM)
    cspec = lambda w: pl.BlockSpec(w, lambda bi, si: (0,) * len(w),  # noqa: E731
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, dim_head=dim_head, eps=eps,
                          t=t, t_pad=t_pad),
        out_shape=jax.ShapeDtypeStruct(x.shape, dt),
        grid=(b, s // tile),
        in_specs=[
            spec,
            cspec((1, c)), cspec((1, c)),
            cspec((c, 3 * c)), cspec((c, c)), cspec((1, c)),
        ],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, ln_scale.reshape(1, c).astype(jnp.float32),
      ln_bias.reshape(1, c).astype(jnp.float32),
      wqkv.astype(dt), wo.astype(dt), bo.reshape(1, c).astype(dt))


def supports_fused_layer(x_shape, heads: int, dim_head: int,
                         max_t: int = 32, itemsize: int = 2) -> bool:
    """Static qualification: (B, T, S, C) with C = heads*dim_head, small T,
    a tile that divides S within the VMEM budget, lane-friendly head_dim."""
    if len(x_shape) != 4:
        return False
    b, t, s, c = x_shape
    return (c == heads * dim_head and t <= max_t and dim_head in (64, 128)
            and _pick_tile(s, t, c, itemsize=itemsize) > 0)
