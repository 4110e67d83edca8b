"""Fused dual-stream cross-attention kernel vs the two-call XLA path."""

import jax
import jax.numpy as jnp
import numpy as np

from viewcrafter_tpu.ops.attention import xla_attention
from viewcrafter_tpu.ops.pallas.cross_attention import (
    dual_cross_attention,
    supports_dual,
)


def _ref(q, kt, vt, ki, vi):
    # reference semantics (attention.py:89-144): separate softmax per stream,
    # outputs added
    return xla_attention(q, kt, vt) + xla_attention(q, ki, vi)


def test_dual_matches_two_calls_fp32():
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 5)
    b, s, h, d = 2, 256, 3, 64
    lt, li = 77, 16
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    kt = jax.random.normal(ks[1], (b, lt, h, d), jnp.float32)
    vt = jax.random.normal(ks[2], (b, lt, h, d), jnp.float32)
    ki = jax.random.normal(ks[3], (b, li, h, d), jnp.float32)
    vi = jax.random.normal(ks[4], (b, li, h, d), jnp.float32)
    out = dual_cross_attention(q, kt, vt, ki, vi, interpret=True)
    ref = _ref(q, kt, vt, ki, vi)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_dual_matches_two_calls_bf16():
    rng = jax.random.PRNGKey(1)
    ks = jax.random.split(rng, 5)
    b, s, h, d = 1, 512, 5, 64
    lt, li = 77, 16
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
    kt = jax.random.normal(ks[1], (b, lt, h, d), jnp.bfloat16)
    vt = jax.random.normal(ks[2], (b, lt, h, d), jnp.bfloat16)
    ki = jax.random.normal(ks[3], (b, li, h, d), jnp.bfloat16)
    vi = jax.random.normal(ks[4], (b, li, h, d), jnp.bfloat16)
    out = dual_cross_attention(q, kt, vt, ki, vi, interpret=True)
    ref = _ref(q, kt, vt, ki, vi)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_dual_wide_kv_padding():
    """Lt + Li that does not land on a lane boundary still pads correctly."""
    rng = jax.random.PRNGKey(2)
    ks = jax.random.split(rng, 5)
    b, s, h, d = 1, 128, 2, 64
    lt, li = 100, 50  # Lp = 256
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    kt = jax.random.normal(ks[1], (b, lt, h, d), jnp.float32)
    vt = jax.random.normal(ks[2], (b, lt, h, d), jnp.float32)
    ki = jax.random.normal(ks[3], (b, li, h, d), jnp.float32)
    vi = jax.random.normal(ks[4], (b, li, h, d), jnp.float32)
    out = dual_cross_attention(q, kt, vt, ki, vi, interpret=True)
    ref = _ref(q, kt, vt, ki, vi)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_qualification():
    assert supports_dual((50, 9216, 5, 64), 77, 16)  # flagship ds1
    assert supports_dual((50, 2304, 10, 64), 77, 16)  # ds2
    assert supports_dual((50, 576, 20, 64), 77, 16)  # ds4
    assert not supports_dual((50, 9216, 5, 64), 77, 0)  # no image stream
    assert not supports_dual((50, 100, 5, 64), 77, 16)  # untileable Sq
    assert not supports_dual((50, 9216, 5, 80), 77, 16)  # lane-hostile D
    assert not supports_dual((50, 9216, 5, 64), 400, 200)  # KV too wide
