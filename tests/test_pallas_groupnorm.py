import jax.numpy as jnp
import numpy as np
import torch

from viewcrafter_tpu.ops.pallas.groupnorm import group_norm_fused, group_norm_silu


def torch_gn(x_nhwc, scale, bias, groups, eps, silu=False):
    xt = torch.from_numpy(np.asarray(x_nhwc, np.float32)).permute(0, 3, 1, 2)
    gn = torch.nn.GroupNorm(groups, xt.shape[1], eps=eps)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(np.asarray(scale)))
        gn.bias.copy_(torch.from_numpy(np.asarray(bias)))
    y = gn(xt)
    if silu:
        y = torch.nn.functional.silu(y)
    return y.permute(0, 2, 3, 1).detach().numpy()


def _data(seed=0, n=2, h=6, w=8, c=64):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, h, w, c)).astype(np.float32)
    scale = rng.normal(size=(c,)).astype(np.float32)
    bias = rng.normal(size=(c,)).astype(np.float32)
    return x, scale, bias


def test_fallback_matches_torch():
    x, scale, bias = _data()
    for silu in (False, True):
        got = np.asarray(
            group_norm_silu(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                            num_groups=8, eps=1e-5, with_silu=silu)
        )
        expect = torch_gn(x, scale, bias, 8, 1e-5, silu)
        np.testing.assert_allclose(got, expect, atol=2e-5)


def test_pallas_kernel_interpret_matches_torch():
    x, scale, bias = _data(1)
    n, h, w, c = x.shape
    got = np.asarray(
        group_norm_fused(jnp.asarray(x.reshape(n, h * w, c)), jnp.asarray(scale),
                         jnp.asarray(bias), num_groups=8, eps=1e-5, with_silu=True,
                         interpret=True)
    ).reshape(n, h, w, c)
    expect = torch_gn(x, scale, bias, 8, 1e-5, silu=True)
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_pallas_kernel_bf16_io():
    x, scale, bias = _data(2)
    n, h, w, c = x.shape
    xb = jnp.asarray(x.reshape(n, h * w, c), jnp.bfloat16)
    got = group_norm_fused(xb, jnp.asarray(scale), jnp.asarray(bias),
                           num_groups=8, with_silu=False, interpret=True)
    assert got.dtype == jnp.bfloat16
    expect = torch_gn(x.astype(np.float32), scale, bias, 8, 1e-5)
    np.testing.assert_allclose(np.asarray(got, np.float32).reshape(n, h, w, c), expect, atol=0.1)
