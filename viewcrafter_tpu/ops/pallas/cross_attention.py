"""Fused dual-stream cross-attention: text + image KV in one kernel pass.

The reference's image-conditioned cross-attention runs TWO attention calls
per site — q over the 77 text tokens, q over the 16 per-frame image tokens —
and adds the outputs (lvdm/modules/attention.py:89-144: `out = out +
scale * out_ip`, scale 1.0 in every shipped config). Each stream has its own
softmax, so the KVs cannot simply be concatenated into one joint attention.

They CAN share one kernel though: with both KV blocks resident in VMEM,

    logits = q @ [k_text | k_img]^T              (one MXU matmul)
    P      = [softmax(logits[:, :Lt]) | softmax(logits[:, Lt:Lt+Li])]
    out    = P @ [v_text ; v_img]                (one MXU matmul)

because the two streams' outputs ADD, the disjoint per-segment softmaxes can
ride a single combined probability matrix. The XLA two-call path bounces the
(B, H, Sq, Lkv) logits through HBM twice (~19 ms per flagship ds1 site); this
kernel's HBM traffic is just q in + out out (~2 ms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(q_ref, kc_ref, vc_ref, o_ref, *, scale: float, lt: int, li: int):
    # q: (1, 1, Sb, D); kc/vc: (1, 1, Lp, D) — text rows [0, lt), image rows
    # [lt, lt+li), zero padding beyond.
    q = q_ref[0, 0]
    kc = kc_ref[0, 0]
    lp = kc.shape[0]
    logits = lax.dot_general(
        q, kc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Sb, Lp)
    col = lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    text = col < lt
    img = (col >= lt) & (col < lt + li)

    def seg_softmax(mask):
        l = jnp.where(mask, logits, _NEG_INF)
        m = jnp.max(l, axis=-1, keepdims=True)
        e = jnp.where(mask, jnp.exp(l - m), 0.0)
        return e / jnp.sum(e, axis=-1, keepdims=True)

    p = seg_softmax(text) + seg_softmax(img)  # disjoint supports
    out = lax.dot_general(
        p.astype(vc_ref.dtype), vc_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _pick_sb(s: int) -> int:
    for b in (1024, 512, 384, 256, 192, 128):
        if s % b == 0:
            return b
    return 0


@functools.partial(jax.jit, static_argnames=("lt", "li", "interpret"))
def _dual_call(q, kc, vc, lt: int, li: int, interpret: bool = False):
    b, h, s, d = q.shape
    lp = kc.shape[2]
    sb = _pick_sb(s)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=d**-0.5, lt=lt, li=li),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b, h, s // sb),
        in_specs=[
            pl.BlockSpec((1, 1, sb, d), lambda bi, hi, si: (bi, hi, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lp, d), lambda bi, hi, si: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lp, d), lambda bi, hi, si: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, sb, d), lambda bi, hi, si: (bi, hi, si, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, kc, vc)
    return out


def dual_cross_attention(q, k_text, v_text, k_img, v_img, interpret: bool = False):
    """q: (B, Sq, H, D); k/v_text: (B, Lt, H, D); k/v_img: (B, Li, H, D).

    Returns attention(q, text) + attention(q, img), each with its own softmax
    (reference attention.py:89-144). Layouts match ops.attention.attention.
    """
    b, s, h, d = q.shape
    lt, li = k_text.shape[1], k_img.shape[1]
    lp = -(-(lt + li) // 128) * 128  # pad combined KV to a lane multiple
    pad = lp - lt - li

    def pack(t, i):
        c = jnp.concatenate([t, i], axis=1)
        c = jnp.pad(c, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return jnp.swapaxes(c, 1, 2)  # (B, H, Lp, D)

    qt = jnp.swapaxes(q, 1, 2)
    out = _dual_call(qt, pack(k_text, k_img), pack(v_text, v_img), lt, li,
                     interpret=interpret)
    return jnp.swapaxes(out, 1, 2)


def supports_dual(q_shape, lt: int, li: int) -> bool:
    """Static qualification: block-tileable Sq, D lane-friendly, KV fits one
    padded block (the flagship: Lt=77 text + Li=16 image tokens -> Lp=128)."""
    b, s, h, d = q_shape
    return (
        li > 0
        and lt + li <= 512
        and d in (64, 128)
        and _pick_sb(s) > 0
    )
