"""Fused FF layer kernel (LN + GEGLU + out-proj) vs the unfused composition,
in interpret mode; plus FeedForward param-tree compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viewcrafter_tpu.ops.pallas.ff_layer import (
    _pick_tile,
    fused_ff_layer,
    supports_fused_ff,
)


def _ref(x, lns, lnb, w1, b1, w2, b2, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    xc = xf - mu
    var = (xc * xc).mean(-1, keepdims=True)
    xn = ((xc * jax.lax.rsqrt(var + eps)) * lns + lnb).astype(x.dtype)
    y = xn @ w1 + b1
    h, gate = jnp.split(y, 2, axis=-1)
    g = h * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(h.dtype)
    return g @ w2 + b2


@pytest.mark.parametrize("shape,mult", [((2, 5, 16, 128), 4), ((64, 320), 4), ((2, 48, 64), 2)])
def test_fused_ff_matches_unfused(shape, mult):
    c = shape[-1]
    inner = c * mult
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape) * 0.5, jnp.float32)
    lns = jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32)
    lnb = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, 2 * inner)) * (c ** -0.5), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(2 * inner) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((inner, c)) * (inner ** -0.5), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    assert supports_fused_ff(x.shape, c, inner)
    got = fused_ff_layer(x, lns, lnb, w1, b1, w2, b2, interpret=True)
    ref = _ref(x, lns, lnb, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_tile_picker_flagship_shapes():
    # (tokens, C, inner) at flagship ds1/ds2/ds4 spatial + temporal FF sites
    for n, c in [(2 * 25 * 9216, 320), (2 * 25 * 2304, 640), (2 * 25 * 576, 1280),
                 (2 * 25 * 9216, 512)]:
        tile = _pick_tile(n, c, 4 * c)
        assert tile and n % tile == 0, (n, c)


def test_feedforward_param_tree_and_equivalence():
    """FeedForward's holder rewrite keeps ff/geglu/proj + ff/out layout and
    the unfused path (with ln applied inside) equals the explicit chain."""
    from viewcrafter_tpu.models.layers import FeedForward

    c = 64
    ffm = FeedForward(c, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 24, c)) * 0.5, jnp.float32)
    params = ffm.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params["geglu"]["proj"]) == {"kernel", "bias"}
    assert set(params["out"]) == {"kernel", "bias"}
    assert params["geglu"]["proj"]["kernel"].shape == (c, 8 * c)
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape) * 0.05, p.dtype), params)
    lns = jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32)
    lnb = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    got = ffm.apply({"params": params}, x, ln=(lns, lnb))
    ref = _ref(x, lns, lnb, params["geglu"]["proj"]["kernel"],
               params["geglu"]["proj"]["bias"], params["out"]["kernel"],
               params["out"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)
