"""Fused temporal-conv kernel (ops/pallas/temporal_conv.py) parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from viewcrafter_tpu.ops.pallas.temporal_conv import (
    _pick_tile,
    supports_fused,
    temporal_conv3,
)


def _conv_ref(x, w, b):
    """Oracle: XLA general conv over the T axis ((B, T, S, C) as NHWC)."""
    y = lax.conv_general_dilated(
        x.astype(jnp.float32), w[:, None].astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


@pytest.mark.parametrize("shape,cout", [((2, 5, 64, 32), 32), ((1, 7, 128, 16), 48)])
def test_kernel_matches_conv(shape, cout):
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, shape, jnp.float32)
    w = jax.random.normal(k2, (3, shape[-1], cout), jnp.float32) * 0.1
    b = jax.random.normal(k3, (cout,), jnp.float32)
    got = temporal_conv3(x, w, b, interpret=True)
    ref = _conv_ref(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_zero_pad_edges():
    """First/last frames must see zero (not wrap/reflect) out-of-range taps."""
    x = jnp.ones((1, 3, 16, 8), jnp.float32)
    w = jnp.stack([jnp.eye(8), jnp.zeros((8, 8)), jnp.zeros((8, 8))])  # prev tap only
    y = temporal_conv3(x, w, jnp.zeros((8,)), interpret=True)
    np.testing.assert_allclose(np.asarray(y[0, 0]), 0.0, atol=1e-6)  # no t=-1
    np.testing.assert_allclose(np.asarray(y[0, 1]), 1.0, atol=1e-6)


def test_supports_and_tiles():
    assert supports_fused((2, 25, 9216, 320), 320, 320)
    assert supports_fused((2, 25, 576, 1280), 1280, 1280)
    assert _pick_tile(9216, 25, 320, 320) > 0
    # accumulator cap respected
    tile = _pick_tile(2304, 25, 640, 640)
    assert tile * 25 * 640 * 4 <= 4_500_000


def test_module_param_layout_matches_nn_conv():
    """TemporalConv3 must expose nn.Conv-identical params (checkpoint path)."""
    import flax.linen as nn

    from viewcrafter_tpu.models.unet3d import TemporalConv3

    m = TemporalConv3(12, dtype=jnp.float32)
    x = jnp.ones((1, 4, 8, 8, 12))
    p = m.init(jax.random.PRNGKey(0), x)
    assert p["params"]["kernel"].shape == (3, 1, 1, 12, 12)
    assert p["params"]["bias"].shape == (12,)
    ref = nn.Conv(12, kernel_size=(3, 1, 1), param_dtype=jnp.float32)
    pr = ref.init(jax.random.PRNGKey(0), x)
    got = m.apply(p, x)
    want = ref.apply({"params": {"kernel": p["params"]["kernel"],
                                 "bias": p["params"]["bias"]}}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)
