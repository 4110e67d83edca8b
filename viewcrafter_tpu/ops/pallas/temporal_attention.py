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


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # (1, T, TILE, D) -> (TILE, T, D): batch the merged s*h axis for the MXU
    qt = jnp.transpose(q_ref[0], (1, 0, 2))
    kt = jnp.transpose(k_ref[0], (1, 0, 2))
    vt = jnp.transpose(v_ref[0], (1, 0, 2))
    logits = lax.dot_general(
        qt, kt, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (TILE, T, T)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(vt.dtype)
    out = lax.dot_general(
        probs, vt, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (TILE, T, D)
    o_ref[0] = jnp.transpose(out, (1, 0, 2)).astype(o_ref.dtype)


def _pick_tile(n: int, upper: int = 64) -> int:
    # tile 64 keeps blocks + batched-matmul intermediates (with the 64->128
    # lane padding) inside the 16 MB VMEM budget
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
    tile = _pick_tile(n)
    assert tile, f"S*H={n} has no supported tile"
    qf = q.reshape(b, t, n, d)
    kf = k.reshape(b, t, n, d)
    vf = v.reshape(b, t, n, d)
    spec = pl.BlockSpec(
        (1, t, tile, d), lambda bi, ni: (bi, 0, ni, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel, scale=d ** -0.5),
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
    return mask is None and t <= max_t and _pick_tile(s * h) > 0 and d in (64, 128)
