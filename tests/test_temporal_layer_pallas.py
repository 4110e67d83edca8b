"""Fused temporal-attention LAYER kernel (LN + QKV + attention + out-proj)
vs the unfused composition, in interpret mode; plus param-tree and
module-level equivalence checks for the TemporalTransformerBlock rewrite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viewcrafter_tpu.ops.pallas.temporal_layer import (
    _pick_tile,
    fused_temporal_layer,
    supports_fused_layer,
)


def _ref_layer(x, lns, lnb, wq, wk, wv, wo, bo, heads, dim_head, eps=1e-5):
    b, t, s, c = x.shape
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    xc = xf - mu
    var = (xc * xc).mean(-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + eps)) * lns + lnb
    xn = xn.astype(x.dtype)
    q = (xn @ wq).reshape(b, t, s, heads, dim_head)
    k = (xn @ wk).reshape(b, t, s, heads, dim_head)
    v = (xn @ wv).reshape(b, t, s, heads, dim_head)
    logits = jnp.einsum(
        "bqshd,bkshd->bshqk", q, k, preferred_element_type=jnp.float32
    ) * (dim_head ** -0.5)
    p = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    o = jnp.einsum("bshqk,bkshd->bqshd", p, v, preferred_element_type=jnp.float32)
    return o.astype(x.dtype).reshape(b, t, s, c) @ wo + bo


@pytest.mark.parametrize(
    "b,t,s,h,d",
    [(2, 25, 16, 5, 64), (1, 16, 32, 8, 64), (2, 7, 8, 2, 128)],
)
def test_fused_layer_matches_unfused(b, t, s, h, d):
    c = h * d
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, s, c)) * 0.5, jnp.float32)
    lns = jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32)
    lnb = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    wq, wk, wv, wo = [
        jnp.asarray(rng.standard_normal((c, c)) * (c ** -0.5), jnp.float32)
        for _ in range(4)
    ]
    bo = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    assert supports_fused_layer(x.shape, h, d)
    got = fused_temporal_layer(
        x, lns, lnb, jnp.concatenate([wq, wk, wv], 1), wo, bo,
        heads=h, dim_head=d, interpret=True)
    ref = _ref_layer(x, lns, lnb, wq, wk, wv, wo, bo, h, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_tile_picker_vmem_budget():
    # flagship shapes must qualify with a nonzero tile
    assert _pick_tile(9216, 25, 320) > 0     # ds1
    assert _pick_tile(9216, 25, 512) > 0     # init_attn (8 heads)
    assert _pick_tile(2304, 25, 640) > 0     # ds2
    assert _pick_tile(576, 25, 1280) > 0     # ds4
    assert _pick_tile(144, 25, 1280) > 0     # mid ds8
    # the picked tile always divides S
    for s, c in [(9216, 320), (2304, 640), (576, 1280), (144, 1280)]:
        tile = _pick_tile(s, 25, c)
        assert tile and s % tile == 0


def test_block_param_tree_unchanged():
    """The _LNParams/_DenseParams rewrite must preserve the checkpoint
    layout: norm{1,2}/LayerNorm_0/{scale,bias}, attn{1,2}/to_*/kernel."""
    from viewcrafter_tpu.models.unet3d import TemporalTransformerBlock

    blk = TemporalTransformerBlock(dim=128, heads=2, dim_head=64,
                                   dtype=jnp.float32)
    x = jnp.zeros((1, 5, 4, 128), jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)["params"]
    for norm in ("norm1", "norm2", "norm3"):
        assert set(params[norm]["LayerNorm_0"]) == {"scale", "bias"}, norm
    for attn in ("attn1", "attn2"):
        assert set(params[attn]["to_q"]) == {"kernel"}
        assert set(params[attn]["to_k"]) == {"kernel"}
        assert set(params[attn]["to_v"]) == {"kernel"}
        assert set(params[attn]["to_out"]) == {"kernel", "bias"}
        assert params[attn]["to_q"]["kernel"].shape == (128, 128)


def test_block_matches_explicit_composition():
    """TemporalTransformerBlock (unfused CPU path, LN now applied inside the
    attention module) must equal the explicit LayerNorm -> attention -> out
    composition it replaced."""
    from viewcrafter_tpu.models.unet3d import (
        TemporalTransformerBlock, _temporal_attention,
    )

    dim, h, d = 128, 2, 64
    blk = TemporalTransformerBlock(dim=dim, heads=h, dim_head=d,
                                   dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 7, 6, dim)) * 0.5, jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)["params"]
    # randomize so the test is not trivially zeros
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape) * 0.05, p.dtype), params)
    got = blk.apply({"params": params}, x)

    def ln(x, p):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        xc = xf - mu
        var = (xc * xc).mean(-1, keepdims=True)
        return (xc * jax.lax.rsqrt(var + 1e-5)) * p["scale"] + p["bias"]

    def attn(xn, p):
        b, t, s, c = xn.shape
        q = (xn @ p["to_q"]["kernel"]).reshape(b, t, s, h, d)
        k = (xn @ p["to_k"]["kernel"]).reshape(b, t, s, h, d)
        v = (xn @ p["to_v"]["kernel"]).reshape(b, t, s, h, d)
        o = _temporal_attention(q, k, v).reshape(b, t, s, c)
        return o @ p["to_out"]["kernel"] + p["to_out"]["bias"]

    ref = x
    ref = ref + attn(ln(ref, params["norm1"]["LayerNorm_0"]), params["attn1"])
    ref = ref + attn(ln(ref, params["norm2"]["LayerNorm_0"]), params["attn2"])
    # ff branch
    xn = ln(ref, params["norm3"]["LayerNorm_0"])
    hmid = xn @ params["ff"]["geglu"]["proj"]["kernel"] + params["ff"]["geglu"]["proj"]["bias"]
    a, g = jnp.split(hmid, 2, axis=-1)
    ge = a * jax.nn.gelu(g.astype(jnp.float32), approximate=False).astype(a.dtype)
    ref = ref + (ge @ params["ff"]["out"]["kernel"] + params["ff"]["out"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)
