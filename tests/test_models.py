import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viewcrafter_tpu.config import UNetConfig
from viewcrafter_tpu.models.unet3d import UNet3D
from viewcrafter_tpu.models.vae import AutoencoderKL

TINY_UNET = UNetConfig(
    in_channels=8,
    out_channels=4,
    model_channels=32,
    num_res_blocks=1,
    attention_resolutions=(1, 2),
    channel_mult=(1, 2),
    num_head_channels=16,
    context_dim=16,
    temporal_length=4,
)


@pytest.fixture(scope="module")
def tiny_unet():
    model = UNet3D(cfg=TINY_UNET, dtype=jnp.float32)
    b, t, h, w = 1, 4, 8, 8
    x = jnp.zeros((b, t, h, w, 8))
    ts = jnp.array([999])
    ctx = jnp.zeros((b, 77 + t * 16, 16))
    params = model.init(jax.random.PRNGKey(0), x, ts, ctx)
    return model, params


def test_unet_shapes_and_zero_init(tiny_unet):
    model, params = tiny_unet
    b, t, h, w = 2, 4, 8, 8
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (b, t, h, w, 8))
    ctx = jax.random.normal(rng, (b, 77 + t * 16, 16))
    y = model.apply(params, x, jnp.array([999, 10]), ctx)
    assert y.shape == (b, t, h, w, 4)
    # final conv is zero-initialized -> a fresh model outputs exactly zero
    np.testing.assert_allclose(np.asarray(y), 0.0)


def test_unet_short_context_path(tiny_unet):
    """Context without per-frame image tokens is broadcast to every frame."""
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 77, 16))
    y = model.apply(params, x, jnp.array([5]), ctx)
    assert y.shape == (1, 4, 8, 8, 4)


def test_unet_time_sensitivity(tiny_unet):
    """Outputs must differ across timesteps once the zero-init convs (which make
    a fresh model the identity w.r.t. conditioning) are perturbed."""
    model, params = tiny_unet
    # un-zero every zero-initialized kernel so conditioning reaches the output
    params = jax.tree_util.tree_map(
        lambda p: jnp.where(jnp.all(p == 0), jnp.full_like(p, 0.01), p), params
    )
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 8, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(5), (1, 77, 16))
    y1 = model.apply(params, x, jnp.array([999]), ctx)
    y2 = model.apply(params, x, jnp.array([10]), ctx)
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 1e-6


def test_unet_shared_prefix_matches_full_batch(tiny_unet):
    """shared_prefix=K (CFG-prefix dedup) must reproduce the plain batched
    output exactly when the K leading branches of x/ts are identical (the
    batched-CFG layout the sampler builds, sampling/ddim.py:106-114)."""
    model, params = tiny_unet
    params = jax.tree_util.tree_map(
        lambda p: jnp.where(jnp.all(p == 0), jnp.full_like(p, 0.01), p), params
    )
    t = 4
    x1 = jax.random.normal(jax.random.PRNGKey(6), (1, t, 8, 8, 8))
    x = jnp.tile(x1, (2, 1, 1, 1, 1))  # two identical CFG branches
    ctx = jax.random.normal(jax.random.PRNGKey(7), (2, 77 + t * 16, 16))
    ts = jnp.array([500.0, 500.0])
    y_ref = model.apply(params, x, ts, ctx)
    y_dedup = model.apply(params, x, ts, ctx, shared_prefix=2)
    np.testing.assert_allclose(np.asarray(y_dedup), np.asarray(y_ref), atol=1e-6)
    # odd batch: dedup silently disabled, plain path
    y3 = model.apply(params, x[:1], ts[:1], ctx[:1], shared_prefix=2)
    np.testing.assert_allclose(np.asarray(y3), np.asarray(y_ref[:1]), atol=1e-6)


def test_vae_roundtrip_shapes():
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(1), x)
    mean, logvar = vae.apply(params, x, method=AutoencoderKL.encode_moments)
    assert mean.shape == (1, 16, 16, 4) and logvar.shape == (1, 16, 16, 4)
    z = vae.apply(params, x, method=AutoencoderKL.encode)
    rec = vae.apply(params, z, method=AutoencoderKL.decode)
    assert rec.shape == (1, 32, 32, 3)
    # sampling with an rng differs from the mode
    zs = vae.apply(params, x, jax.random.PRNGKey(2), method=AutoencoderKL.encode)
    assert np.abs(np.asarray(zs) - np.asarray(z)).max() > 1e-6
