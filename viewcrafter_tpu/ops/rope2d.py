"""2D rotary position embedding (RoPE2D) as fused XLA ops.

Functional spec: the reference's CUDA kernel + torch fallback
(extern/dust3r/croco/models/curope/kernels.cu:18-108,
extern/dust3r/croco/models/pos_embed.py:112-159): split the head dim in half,
rotate the first half by the token's y position and the second half by its x
position, each with a standard 1D RoPE of base `freq` — including the
torch-side [-x2; x1] "rotate_half" pairing (pairs are (i, i + D/2) within each
half, NOT interleaved).

On TPU this is a handful of VPU-friendly elementwise ops that XLA fuses
straight into the surrounding attention matmuls — a custom kernel buys nothing
(SURVEY.md §2.7#1), so there deliberately isn't one.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _inv_freq(half_dim: int, base: float):
    import numpy as np

    return np.asarray(1.0 / (base ** (np.arange(0, half_dim, 2, dtype=np.float64) / half_dim)), np.float32)


def _rope_1d(tokens: jnp.ndarray, pos: jnp.ndarray, base: float) -> jnp.ndarray:
    """tokens: (..., S, D), pos: broadcastable (..., S) integer positions."""
    d = tokens.shape[-1]
    inv = jnp.asarray(_inv_freq(d, base))
    ang = pos[..., None].astype(jnp.float32) * inv  # (..., S, D/2)
    ang = jnp.concatenate([ang, ang], axis=-1)  # (..., S, D)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = jnp.split(tokens, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return tokens * cos.astype(tokens.dtype) + rotated * sin.astype(tokens.dtype)


def rope_2d(tokens: jnp.ndarray, positions: jnp.ndarray, base: float = 100.0) -> jnp.ndarray:
    """Apply RoPE2D.

    tokens: (B, S, H, D) with D % 4 == 0; positions: (B, S, 2) int (y, x).
    Returns same shape/dtype.
    """
    assert tokens.shape[-1] % 4 == 0, "head dim must be divisible by 4 for RoPE2D"
    y_tok, x_tok = jnp.split(tokens, 2, axis=-1)
    pos_y = positions[..., 0][..., None]  # (B, S, 1) broadcast over heads
    pos_x = positions[..., 1][..., None]
    y_tok = _rope_1d(y_tok, pos_y, base)
    x_tok = _rope_1d(x_tok, pos_x, base)
    return jnp.concatenate([y_tok, x_tok], axis=-1)
