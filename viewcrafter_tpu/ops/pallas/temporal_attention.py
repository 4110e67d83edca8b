"""Fused temporal self-attention: per-pixel attention over the frame axis.

The video UNet's temporal layers attend over T<=25 frames independently at
every spatial position (reference lvdm/modules/attention.py:313-412 reshapes
to (B*H*W, T, C) and runs einsum attention). At flagship shapes that XLA
path spends ~28 ms/site — ~20x off speed-of-light — materializing the
(B, S, H, T, T) logits in HBM and shuffling layouts around the tiny
(T, D)x(D, T) matmuls.

This kernel keeps everything on-chip: HBM traffic collapses to the
unavoidable 3 reads + 1 write of the activations.

Layout trick: (B, T, S, H, D) with H, D adjacent reshapes for free to
(B, T, S*H, D) — each index of the merged axis is an independent attention
problem over T, so the kernel is head-oblivious. Blocks are
(1, T, TILE, D): the last dim is the full head_dim (satisfying the TPU
block rule) and the batched (TILE, T, T) matmuls pipeline on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, g: int, t_pad: int):
    # (1, T, TILE, D) -> (TILE, T, D): batch the merged s*h axis for the MXU
    qt = jnp.transpose(q_ref[0], (1, 0, 2))
    kt = jnp.transpose(k_ref[0], (1, 0, 2))
    vt = jnp.transpose(v_ref[0], (1, 0, 2))
    tile, t, d = qt.shape
    if g > 1:
        # MXU packing: a plain (TILE, T, T) batched matmul runs TILE passes of
        # a T x T output — ~4% utilization at T=25 on the 128x128 array. Stack
        # G independent problems along the T axis instead (T sublane-padded to
        # t_pad, a multiple of 16, so G = 128//t_pad problems make the matmul
        # axis exactly 128): TILE/G passes of a 128^2 output with a
        # block-diagonal mask. Same math — masked rows renormalize within
        # their own t_pad block; padded query rows are sliced away on unpack.
        # (A plain reshape-merge of (TILE, T) is NOT mosaic-lowerable — the
        # sublane-aligned pad + concat below is.)
        m = tile // g

        def pack(x):
            xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
            return jnp.concatenate(
                [xp[j * m:(j + 1) * m] for j in range(g)], axis=1
            )  # (M, G*t_pad = 128, D); group a holds problems {a, a+M, ...}

        qg, kg, vg = pack(qt), pack(kt), pack(vt)
        logits = lax.dot_general(
            qg, kg, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (M, 128, 128)
        row = lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        col = lax.broadcasted_iota(jnp.int32, logits.shape, 2)
        keep = (row // t_pad == col // t_pad) & (col % t_pad < t)
        logits = jnp.where(keep, logits * scale, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(vg.dtype)
        og = lax.dot_general(
            probs, vg, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (M, 128, D)
        out = jnp.concatenate(
            [og[:, j * t_pad:(j + 1) * t_pad] for j in range(g)], axis=0
        )[:, :t]  # (TILE, T, D)
    else:
        logits = lax.dot_general(
            qt, kt, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (TILE, T, T)
        probs = jax.nn.softmax(logits * scale, axis=-1).astype(vt.dtype)
        out = lax.dot_general(
            probs, vt, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (TILE, T, D)
    o_ref[0] = jnp.transpose(out, (1, 0, 2)).astype(o_ref.dtype)


def _pad_t(t: int) -> int:
    """T padded to the bf16 sublane granule (16)."""
    return -(-t // 16) * 16


def _pack_group(t: int) -> int:
    """How many padded T-problems fill one 128-wide matmul dimension."""
    return max(1, 128 // _pad_t(t))


def _pick_tile(n: int, t: int = 25, upper: int = 96) -> int:
    # the tile must be a multiple of the pack group G (so each in-block matmul
    # batches whole groups) and keep blocks + logits inside the 16 MB VMEM
    # budget (lane padding 64->128 doubles the block footprint)
    g = _pack_group(t)
    for k in (16, 12, 8, 6, 4, 2, 1):
        tile = g * k
        if tile <= upper and n % tile == 0:
            return tile
    # fall back to unpacked tiles
    for tile in (64, 32, 16, 8):
        if tile <= upper and n % tile == 0:
            return tile
    return 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def temporal_attention_fused(q, k, v, interpret: bool = False):
    """q, k, v: (B, T, S, H, D); attention over T per (b, s, h).

    Returns (B, T, S, H, D) in q.dtype. Caller must guarantee
    `supports_fused(q.shape)` (S*H divisible by a tile, no mask).
    """
    b, t, s, h, d = q.shape
    n = s * h
    tile = _pick_tile(n, t)
    assert tile, f"S*H={n} has no supported tile"
    g = _pack_group(t) if tile % _pack_group(t) == 0 else 1
    qf = q.reshape(b, t, n, d)
    kf = k.reshape(b, t, n, d)
    vf = v.reshape(b, t, n, d)
    spec = pl.BlockSpec(
        (1, t, tile, d), lambda bi, ni: (bi, 0, ni, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel, scale=d ** -0.5, g=g, t_pad=_pad_t(t)),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        grid=(b, n // tile),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, t, s, h, d)


def supports_fused(q_shape, mask=None, max_t: int = 64) -> bool:
    """Static qualification: no mask, small T, tileable S*H, lane-friendly D."""
    b, t, s, h, d = q_shape
    return mask is None and t <= max_t and _pick_tile(s * h, t) > 0 and d in (64, 128)
