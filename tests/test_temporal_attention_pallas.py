"""Fused temporal-attention kernel vs the XLA einsum path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from viewcrafter_tpu.models.unet3d import _temporal_attention
from viewcrafter_tpu.ops.pallas.temporal_attention import (
    _pick_tile,
    supports_fused,
    temporal_attention_fused,
)


def _ref(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum("bqshd,bkshd->bshqk", q, k, preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32) * (d ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bshqk,bkshd->bqshd", probs, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def test_fused_matches_xla_fp32():
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    shape = (2, 7, 256, 2, 64)  # (B, T, S, H, D), T deliberately odd
    q = jax.random.normal(kq, shape, jnp.float32)
    k = jax.random.normal(kk, shape, jnp.float32)
    v = jax.random.normal(kv, shape, jnp.float32)
    out = temporal_attention_fused(q, k, v, interpret=True)
    ref = _ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_matches_xla_bf16():
    rng = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(rng, 3)
    shape = (1, 25, 128, 5, 64)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)
    out = temporal_attention_fused(q, k, v, interpret=True)
    ref = _ref(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_qualification():
    assert supports_fused((2, 25, 9216, 5, 64))  # flagship ds1
    assert supports_fused((2, 25, 2304, 10, 64))  # flagship ds2
    assert supports_fused((2, 25, 2560, 5, 64))  # 512 model ds1
    assert not supports_fused((2, 25, 101, 1, 64))  # untileable S*H (prime)
    assert not supports_fused((2, 25, 9216, 5, 64), mask=object())
    assert not supports_fused((2, 25, 9216, 5, 80))  # lane-hostile D
    # T=25 pads to 32 sublanes and packs G=4 problems per 128-wide matmul
    assert _pick_tile(9216 * 5, 25) == 64 and _pick_tile(2304 * 10, 25) == 64
    assert _pick_tile(9216 * 5, 16) == 96  # t_pad=16 -> G=8, 16-frame model


def test_fused_packed_group_exact():
    """The G-packed block-diagonal path (T=25 -> G=5) matches per-problem
    attention bit-for-bit in spirit: masked rows renormalize within their own
    T-block."""
    rng = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(rng, 3)
    shape = (1, 25, 16, 5, 64)  # n=80 -> tile 80, one packed block per grid cell
    q = jax.random.normal(kq, shape, jnp.float32)
    k = jax.random.normal(kk, shape, jnp.float32)
    v = jax.random.normal(kv, shape, jnp.float32)
    out = temporal_attention_fused(q, k, v, interpret=True)
    ref = _ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_model_path_unchanged_on_cpu():
    """On CPU the dispatcher keeps the XLA path (no pallas TPU lowering)."""
    rng = jax.random.PRNGKey(2)
    shape = (1, 4, 64, 2, 64)
    q = jax.random.normal(rng, shape, jnp.float32)
    out = _temporal_attention(q, q, q)
    ref = _ref(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
