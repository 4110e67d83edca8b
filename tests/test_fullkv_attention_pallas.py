"""Single-pass full-KV attention kernel vs the XLA einsum path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from viewcrafter_tpu.ops.attention import xla_attention
from viewcrafter_tpu.ops.pallas.fullkv_attention import (
    _pick_block_q,
    fullkv_attention,
    supports_fullkv,
)


def test_fullkv_matches_xla_fp32():
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (2, 512, 3, 64), jnp.float32)
    k = jax.random.normal(kk, (2, 512, 3, 64), jnp.float32)
    v = jax.random.normal(kv, (2, 512, 3, 64), jnp.float32)
    out = fullkv_attention(q, k, v, interpret=True)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fullkv_matches_xla_bf16():
    rng = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(rng, 3)
    shape = (1, 576, 5, 64)  # flagship ds4 spatial
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)
    out = fullkv_attention(q, k, v, interpret=True)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_fullkv_chunked_matches_single_pass():
    """The online-softmax chunked kernel (_kernel_chunked) is the same math
    as the single-pass kernel: identical outputs up to fp32 rounding."""
    rng = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (2, 512, 3, 64), jnp.float32)
    k = jax.random.normal(kk, (2, 512, 3, 64), jnp.float32)
    v = jax.random.normal(kv, (2, 512, 3, 64), jnp.float32)
    ref = fullkv_attention(q, k, v, block_q=128, n_chunks=1, interpret=True)
    xla = xla_attention(q, k, v)
    for nc in (2, 4, 8):
        out = fullkv_attention(q, k, v, block_q=128, n_chunks=nc, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(xla), atol=1e-2)


def test_fullkv_cross_length():
    """Sq != Sk (the kernel holds the full Sk-length K/V resident)."""
    rng = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (1, 256, 2, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 640, 2, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 640, 2, 64), jnp.float32)
    out = fullkv_attention(q, k, v, interpret=True)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_qualification():
    assert supports_fullkv((2, 2304, 10, 64), (2, 2304, 10, 64))  # flagship ds2
    assert supports_fullkv((2, 576, 5, 64), (2, 576, 5, 64))  # flagship ds4
    assert supports_fullkv((2, 9216, 5, 64), (2, 9216, 5, 64))  # ds1 fits too
    assert not supports_fullkv((2, 576, 5, 80), (2, 576, 5, 80))  # lane-hostile D
    assert not supports_fullkv((2, 576, 5, 64), (2, 93, 5, 64))  # Sk % 64 != 0
    assert not supports_fullkv(
        (2, 576, 5, 128), (2, 16384, 5, 128)
    )  # K/V too big for VMEM residency
    # tiny maps run as a single q block; big maps tile under the VMEM budget
    assert _pick_block_q(576, 576) == 576
    # flagship ds1 self-attention: measured-best 384 on v5e (the special case
    # in _pick_block_q; scripts/profile_fullkv.py)
    assert _pick_block_q(9216, 9216) == 384
    # the 384 special case is sk-gated: a different KV length at s=9216 falls
    # back to the conservative 6 MiB budget (block*sk*4 <= budget)
    assert _pick_block_q(9216, 4608) == 256
    assert _pick_block_q(9216, 2304) == 512
