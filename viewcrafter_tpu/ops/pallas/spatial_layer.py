"""Fused spatial self-attention LAYER: LayerNorm + QKV projection + full-KV
attention + output projection in ONE Pallas kernel.

Same playbook as ops/pallas/temporal_layer.py, applied to the UNet's spatial
self-attention sites (`TransformerBlock.attn1`, reference
lvdm/modules/attention.py:212-246 -> 42-88): the unfused composition makes
~12 HBM passes over the (B*T, S, C) activation (LN read/write, 3 projection
reads + 3 writes, 4 attention-kernel passes, out-proj read/write) where 2
passes — read x once, write the attention branch once — suffice. At the
flagship ds1 shape (50, 9216, 320) one pass is 295 MB, so the fusion saves
~3 GB of HBM traffic per call at ~560 GB/s measured streaming bandwidth.

Design: grid (B, S/block_q), q-axis innermost and sequential. A VMEM scratch
holds the full (S, 3C) QKV for the current batch row: at the first q-block of
each row the kernel reads the whole (S, C) x row (the x BlockSpec is
invariant over the q axis, so Mosaic keeps it resident), LayerNorms it in
f32, and runs one (S, C) @ (C, 3C) MXU matmul into the scratch. Every q-block
then computes per-head (block_q, S) logits in f32 against the resident K —
max-subtract, exp2 (scale and log2(e) folded into q, as in
fullkv_attention.py), row-sum, P@V with the 1/rowsum folded into the small
(block_q, D) output — concatenates heads and applies the (C, C) output
projection before writing.

The layer output is the attention branch WITHOUT the residual add so the PAB
attention-reuse cache (models/unet3d.py cache.site) keeps its semantics.
Matches the reference composition LayerNorm -> CrossAttention(self) -> to_out
in bf16 with f32 matmul accumulation and f32 LN/softmax.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, wo_ref, bo_ref, o_ref,
            qkv_ref, *, heads: int, dim_head: int, eps: float, block_q: int):
    qi = pl.program_id(1)
    c = heads * dim_head

    @pl.when(qi == 0)
    def _project():
        x = x_ref[0]  # (S, C)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        xn = (xc * lax.rsqrt(var + eps) * lns_ref[0] + lnb_ref[0]).astype(x.dtype)
        qkv_ref[...] = lax.dot_general(
            xn, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)  # (S, 3C)

    # exp2 with scale AND log2(e) folded into q: exp(x) lowers to
    # exp2(x*log2e) on the VPU, so prefolding saves one full multiply pass
    # over the (block_q, S) tile
    scale = dim_head ** -0.5 * math.log2(math.e)
    qrows = pl.ds(qi * block_q, block_q)
    outs = []
    for hi in range(heads):
        q = qkv_ref[qrows, hi * dim_head:(hi + 1) * dim_head] * jnp.asarray(
            scale, dtype=qkv_ref.dtype)                      # (bq, D)
        k = qkv_ref[:, c + hi * dim_head:c + (hi + 1) * dim_head]      # (S, D)
        v = qkv_ref[:, 2 * c + hi * dim_head:2 * c + (hi + 1) * dim_head]
        logits = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                    # (bq, S) base-2
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp2(logits - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        pv = lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # (bq, D)
        outs.append((pv / s).astype(x_ref.dtype))
    att = jnp.concatenate(outs, axis=-1)                     # (bq, C)
    o_ref[0] = (lax.dot_general(
        att, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _pick_block_q(s: int, c: int, budget: int = 96 * 1024 * 1024,
                  itemsize: int = 2) -> int:
    """Largest q block that divides S and keeps the footprint under budget:
    resident x row + QKV scratch + f32 logits/exp + out blocks + weights."""
    es = itemsize  # activation element size (bf16 2, f32 4)
    w_bytes = (3 * c * c + c * c) * es
    resident = s * c * es * 2 + s * 3 * c * es  # x row (double-buffered) + qkv
    for bq in (768, 576, 512, 384, 288, 256, 192, 128, 96, 64, 32, 16, 8):
        if s % bq:
            continue
        logits = bq * s * 4 * 2                # logits + exp f32
        out = 2 * bq * c * es + bq * c * 4
        if resident + logits + out + w_bytes <= budget:
            return bq
    return 0


@functools.partial(
    jax.jit, static_argnames=("heads", "dim_head", "eps", "interpret"))
def fused_spatial_layer(x, ln_scale, ln_bias, wqkv, wo, bo, *,
                        heads: int, dim_head: int, eps: float = 1e-5,
                        interpret: bool = False):
    """x: (B, S, C) with C == heads*dim_head. Returns LayerNorm ->
    self-attention over S per batch row -> out-projection, shaped like x
    (the caller adds the residual). Weights are the flax Dense params:
    wqkv (C, 3C) = concat(to_q, to_k, to_v kernels), wo (C, C), bo (C,)."""
    b, s, c = x.shape
    assert c == heads * dim_head
    block_q = _pick_block_q(s, c, itemsize=x.dtype.itemsize)
    assert block_q, f"S={s} has no supported q block"
    dt = x.dtype
    xspec = pl.BlockSpec((1, s, c), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, block_q, c), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM)
    cspec = lambda w: pl.BlockSpec(w, lambda bi, qi: (0,) * len(w),  # noqa: E731
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, dim_head=dim_head, eps=eps,
                          block_q=block_q),
        out_shape=jax.ShapeDtypeStruct(x.shape, dt),
        grid=(b, s // block_q),
        in_specs=[
            xspec,
            cspec((1, c)), cspec((1, c)),
            cspec((c, 3 * c)), cspec((c, c)), cspec((1, c)),
        ],
        out_specs=ospec,
        scratch_shapes=[pltpu.VMEM((s, 3 * c), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, ln_scale.reshape(1, c).astype(jnp.float32),
      ln_bias.reshape(1, c).astype(jnp.float32),
      wqkv.astype(dt), wo.astype(dt), bo.reshape(1, c).astype(dt))


def supports_fused_spatial(x_shape, heads: int, dim_head: int,
                           max_s: int = 9216, itemsize: int = 2) -> bool:
    """Static qualification: (B, S, C) with C = heads*dim_head, S small
    enough that the QKV scratch + one f32 logits block fit in VMEM, and a
    lane-friendly head_dim."""
    if len(x_shape) != 3:
        return False
    b, s, c = x_shape
    return (c == heads * dim_head and s <= max_s and dim_head in (64, 128)
            and s % 8 == 0 and _pick_block_q(s, c, itemsize=itemsize) > 0)
