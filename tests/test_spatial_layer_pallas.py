"""Fused spatial self-attention LAYER kernel (LN + QKV + full-KV attention +
out-proj, ops/pallas/spatial_layer.py) vs the unfused composition, in
interpret mode — including a bf16 check that the kernel's q-prescale
(scale*log2e folded into q before the QK matmul) does not degrade accuracy
relative to the unfused bf16 path's own rounding (ADVICE r4 #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viewcrafter_tpu.ops.pallas.spatial_layer import (
    _pick_block_q,
    fused_spatial_layer,
    supports_fused_spatial,
)


def _ref_layer(x, lns, lnb, wq, wk, wv, wo, bo, heads, dim_head, eps=1e-5):
    """Unfused composition at the input dtype (f32 LN/softmax, dtype matmuls),
    mirroring models/unet3d.py CrossAttention self-attention semantics."""
    b, s, c = x.shape
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    xc = xf - mu
    var = (xc * xc).mean(-1, keepdims=True)
    xn = ((xc * jax.lax.rsqrt(var + eps)) * lns + lnb).astype(x.dtype)
    q = (xn @ wq.astype(x.dtype)).reshape(b, s, heads, dim_head)
    k = (xn @ wk.astype(x.dtype)).reshape(b, s, heads, dim_head)
    v = (xn @ wv.astype(x.dtype)).reshape(b, s, heads, dim_head)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ).astype(jnp.float32) * (dim_head ** -0.5)
    p = jax.nn.softmax(logits, -1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32)
    o = o.astype(x.dtype).reshape(b, s, c)
    return (o @ wo.astype(x.dtype)).astype(jnp.float32) + bo


def _make(b, s, c, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, s, c)) * 0.5, dtype)
    lns = jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32)
    lnb = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    ws = [jnp.asarray(rng.standard_normal((c, c)) * (c ** -0.5), jnp.float32)
          for _ in range(4)]
    bo = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    return x, lns, lnb, ws, bo


@pytest.mark.parametrize("b,s,h,d", [(2, 64, 2, 64), (1, 128, 5, 64), (2, 32, 2, 128)])
def test_fused_spatial_layer_matches_unfused(b, s, h, d):
    c = h * d
    x, lns, lnb, (wq, wk, wv, wo), bo = _make(b, s, c)
    assert supports_fused_spatial(x.shape, h, d)
    got = fused_spatial_layer(
        x, lns, lnb, jnp.concatenate([wq, wk, wv], 1), wo, bo,
        heads=h, dim_head=d, interpret=True)
    ref = _ref_layer(x, lns, lnb, wq, wk, wv, wo, bo, h, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_bf16_q_prescale_not_worse_than_unfused():
    """The kernel folds softmax scale*log2(e) into q in bf16; verify against
    an f32 oracle that this costs no more accuracy than the unfused bf16
    path already pays (which scales f32 logits instead)."""
    b, s, h, d = 1, 64, 2, 64
    c = h * d
    x32, lns, lnb, (wq, wk, wv, wo), bo = _make(b, s, c, seed=3)
    oracle = _ref_layer(x32, lns, lnb, wq, wk, wv, wo, bo, h, d)

    xb = x32.astype(jnp.bfloat16)
    unfused_b = _ref_layer(xb, lns, lnb, wq, wk, wv, wo, bo, h, d)
    fused_b = fused_spatial_layer(
        xb, lns, lnb, jnp.concatenate([wq, wk, wv], 1), wo, bo,
        heads=h, dim_head=d, interpret=True).astype(jnp.float32)

    err_unfused = float(jnp.max(jnp.abs(unfused_b.astype(jnp.float32) - oracle)))
    err_fused = float(jnp.max(jnp.abs(fused_b - oracle)))
    # identical rounding regimes won't match exactly; demand the fused error
    # stays within 1.5x of the unfused bf16 error (plus an absolute floor)
    assert err_fused <= max(1.5 * err_unfused, 1e-3), (err_fused, err_unfused)


def test_block_q_picker_vmem_budget():
    # flagship ds1/ds2/ds4/ds8 spatial shapes must qualify
    for s, c in [(9216, 320), (2304, 640), (576, 1280), (144, 1280)]:
        bq = _pick_block_q(s, c)
        assert bq and s % bq == 0, (s, c, bq)
    # f32 activations halve the budget headroom but must still be modeled
    assert _pick_block_q(9216, 320, itemsize=4) <= _pick_block_q(9216, 320)
