"""Attention cores.

Layout convention everywhere: (batch, seq, heads, head_dim) — the layout
`jax.nn.dot_product_attention` and our Pallas kernels consume without
transposes.

Three implementations:
  - "xla":    einsum QK^T -> fp32 softmax -> PV. XLA fuses this well for short
              sequences (temporal t<=25, cross kv<=477).
  - "flash":  TPU Pallas flash attention (jax.experimental.pallas.ops.tpu) for
              long self-attention (spatial hw up to 9216 tokens) — never
              materializes the (S, S) logits.
  - "auto":   flash on TPU when the shape qualifies, else xla.

The reference runs xformers memory-efficient attention for spatial layers and
plain einsum attention for temporal layers (lvdm/modules/attention.py:66-67,
146-209); this module is the TPU-native replacement for both.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        # an explicitly-configured default device wins (some sandboxes
        # register a TPU platform while computation is placed on CPU)
        d = jax.config.jax_default_device
        if d is not None:
            return getattr(d, "platform", None) == "tpu"
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference-semantics attention: bf16 matmuls, fp32 softmax.

    q: (B, Sq, H, D); k, v: (B, Sk, H, D); mask: broadcastable to
    (B, H, Sq, Sk), True = attend. Returns (B, Sq, H, D) in q.dtype.
    """
    d = q.shape[-1]
    scale = d**-0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_call(q, k, v, block_q, block_k):
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    d = q.shape[-1]
    # pallas kernel layout is (B, H, S, D) and applies sm_scale to logits
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    scale = d**-0.5
    # When the scale is a power of two (d = 64/256: exponent-only bf16 op),
    # fold it into Q: sm_scale=1.0 skips the kernel's `s *= sm_scale` — one
    # whole VPU pass over the (Sq, Sk) logits — with bitwise-identical
    # logits (2^-n scaling commutes with the fp matmul exactly).
    if (d & (d - 1)) == 0 and (d.bit_length() - 1) % 2 == 0:
        qt = qt * jnp.asarray(scale, qt.dtype)
        scale = 1.0
    block_sizes = fa.BlockSizes(
        block_q=block_q,
        block_k_major=block_k,
        block_k=block_k,
        block_b=1,
    )
    out = fa.flash_attention(qt, kt, vt, sm_scale=scale, block_sizes=block_sizes)
    return jnp.swapaxes(out, 1, 2)


def _pick_block(seq: int) -> Optional[int]:
    """Largest MXU-friendly block size that tiles the sequence exactly."""
    for b in (1024, 512, 384, 256, 192, 128):
        if seq % b == 0:
            return b
    return None


def flash_attention(q, k, v, block_q: Optional[int] = None, block_k: Optional[int] = None):
    """TPU flash attention; q/k/v (B, S, H, D). Block sizes must tile the
    sequence lengths; picked automatically when not given (1024 measured ~9%
    faster than 512 at the flagship's 9216-token spatial stage)."""
    sq, sk = q.shape[1], k.shape[1]
    block_q = block_q or min(_pick_block(sq) or sq, 1024)
    block_k = block_k or min(_pick_block(sk) or sk, 1024)
    return _flash_call(q, k, v, block_q, block_k)


def _qualifies_for_flash(q, k, mask) -> bool:
    if mask is not None:
        return False
    sq, sk, d = q.shape[1], k.shape[1], q.shape[-1]
    # flash pays off for long self-attention (the spatial stages: 2304-9216
    # tokens at 576x1024); short/cross attention is faster as one fused einsum
    return (
        sq >= 2048
        and sk >= 2048
        and d % 64 == 0
        and _pick_block(sq) is not None
        and _pick_block(sk) is not None
    )


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatching attention entry point. q/k/v: (B, S, H, D).

    VIEWCRAFTER_ATTN_IMPL overrides the impl globally (tests force "xla":
    the sandbox registers a TPU platform even for CPU-placed arrays, which
    would fool the backend check)."""
    import os

    impl = os.environ.get("VIEWCRAFTER_ATTN_IMPL", impl)
    from viewcrafter_tpu.parallel import tp as _tp

    if _tp.active_mesh() is not None:
        # tensor-parallel tracing: pallas kernels are opaque to the SPMD
        # partitioner (they would run replicated); the einsum path shards
        impl = "xla"
    if impl == "xla":
        return xla_attention(q, k, v, mask)
    if impl == "flash":
        return flash_attention(q, k, v)
    if impl == "fullkv":
        from viewcrafter_tpu.ops.pallas.fullkv_attention import fullkv_attention

        return fullkv_attention(q, k, v)
    if impl == "auto":
        if _on_tpu() and mask is None:
            from viewcrafter_tpu.ops.pallas.fullkv_attention import (
                fullkv_attention,
                supports_fullkv,
            )

            # Single-pass full-KV kernel wins over both flash and the XLA
            # einsum at every flagship spatial stage (measured v5e: ds1
            # S=9216 83.1->79.4 ms with the exp2 base-2 softmax + bq=384,
            # ds2 S=2304 27.3->16.2 ms, ds4 S=576 9.4->7.1 ms).
            if k.shape[1] <= 9216 and supports_fullkv(q.shape, k.shape):
                return fullkv_attention(q, k, v)
            if _qualifies_for_flash(q, k, mask):
                return flash_attention(q, k, v)
        return xla_attention(q, k, v, mask)
    raise ValueError(f"unknown attention impl {impl!r}")
