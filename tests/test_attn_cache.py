"""PAB-style attention-output cache plumbing (models/unet3d.AttnCacheCtx)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viewcrafter_tpu.config import get_model_config
from viewcrafter_tpu.models.unet3d import UNet3D


@pytest.fixture(scope="module")
def setup():
    cfg = get_model_config("viewcrafter_tiny")
    model = UNet3D(cfg=cfg.unet, dtype=jnp.float32)
    t = cfg.video_length
    h, w = cfg.diffusion.latent_size
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, t, h, w, 8))
    ts = jnp.array([500.0])
    ctx = jax.random.normal(rng, (1, 77, cfg.unet.context_dim))
    params = model.init(jax.random.PRNGKey(1), x, ts, ctx)
    # un-zero zero-init kernels so attention actually matters downstream
    params = jax.tree_util.tree_map(
        lambda p: jnp.where(jnp.all(p == 0), jnp.full_like(p, 0.01), p), params
    )
    return model, params, x, ts, ctx


def test_collect_then_reuse_is_identity(setup):
    """Feeding a step's own collected attention outputs back must reproduce
    the output exactly (the cadence-1 case of attention broadcast)."""
    model, params, x, ts, ctx = setup
    y_ref, cache = model.apply(params, x, ts, ctx, collect_cache=True)
    assert len(cache) > 0
    y_reuse = model.apply(params, x, ts, ctx, attn_cache=cache)
    np.testing.assert_allclose(np.asarray(y_reuse), np.asarray(y_ref), atol=1e-6)


def test_reuse_with_stale_cache_differs_but_runs(setup):
    """A cache from different inputs produces a different (finite) output —
    the reuse path genuinely consumes the cache."""
    model, params, x, ts, ctx = setup
    _, cache = model.apply(params, x, ts, ctx, collect_cache=True)
    x2 = x + 0.5
    y_full = model.apply(params, x2, ts, ctx)
    y_stale = model.apply(params, x2, ts, ctx, attn_cache=cache)
    assert np.isfinite(np.asarray(y_stale)).all()
    assert np.abs(np.asarray(y_stale) - np.asarray(y_full)).max() > 1e-6


def test_cache_kind_filtering(setup):
    """cache_kinds restricts which attention families are cached."""
    model, params, x, ts, ctx = setup
    _, cache_all = model.apply(params, x, ts, ctx, collect_cache=True)
    _, cache_cross = model.apply(
        params, x, ts, ctx, collect_cache=True, cache_kinds=("cross",)
    )
    assert set(cache_cross).issubset(set(cache_all))
    assert 0 < len(cache_cross) < len(cache_all)
    assert all(k.endswith("attn2") for k in cache_cross)


def test_baseline_path_unchanged(setup):
    """No cache args -> identical output to the collect pass's primary output."""
    model, params, x, ts, ctx = setup
    y0 = model.apply(params, x, ts, ctx)
    y1, _ = model.apply(params, x, ts, ctx, collect_cache=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


def test_pab_interval1_matches_baseline():
    """generate_staged with attn_reuse_interval=1 uses the PAB path's full
    step every step... interval=1 is defined to equal exact sampling; verify
    against the plain staged path."""
    from viewcrafter_tpu.models.lvdm import VideoDiffusionEngine
    from viewcrafter_tpu.sampling.ddim import GuidanceConfig

    cfg = get_model_config("viewcrafter_tiny")
    eng = VideoDiffusionEngine(cfg, dtype=jnp.float32)
    params = jax.jit(eng.init_params)(jax.random.PRNGKey(0))
    # un-zero the zero-init projections so attention reuse is observable
    params = jax.tree_util.tree_map(
        lambda p: jnp.where(jnp.all(p == 0), jnp.full_like(p, 0.01), p), params
    )
    frames = jnp.zeros((1, cfg.video_length, cfg.height, cfg.width, 3))
    ids = jnp.asarray(eng.prompt_ids("a scene", 1))
    uids = jnp.asarray(eng.prompt_ids("", 1))
    rng = jax.random.PRNGKey(5)
    g = GuidanceConfig()
    base = eng.generate_staged(params, frames, ids, uids, rng, steps=4, guidance=g, chunk=2)
    # interval 2: steps 0,2 full; 1,3 reuse — different math, still finite
    pab = eng.generate_staged(params, frames, ids, uids, rng, steps=4, guidance=g,
                              attn_reuse_interval=2)
    assert np.isfinite(np.asarray(pab)).all()
    assert pab.shape == base.shape
    # PAB is an approximation: outputs differ from exact sampling
    assert np.abs(np.asarray(pab) - np.asarray(base)).max() > 0


def test_pab_site_filtering(setup):
    """attn_reuse_sites prefixes restrict which sites land in the cache; a
    partial cache reuses matching sites and recomputes the rest."""
    model, params, x, ts, ctx = setup
    _, cache_all = model.apply(params, x, ts, ctx, collect_cache=True)
    prefixes = ("down_0", "up_0", "init_attn")
    cache_ds1 = {k: v for k, v in cache_all.items() if k.startswith(prefixes)}
    assert 0 < len(cache_ds1) < len(cache_all)
    # partial reuse: runs and exactly reproduces (cache from same input)
    y_ref = model.apply(params, x, ts, ctx)
    y_part = model.apply(params, x, ts, ctx, attn_cache=cache_ds1)
    np.testing.assert_allclose(np.asarray(y_part), np.asarray(y_ref), atol=1e-6)


def test_pab_sites_e2e():
    """generate_staged with a site filter runs end-to-end and stays finite."""
    from viewcrafter_tpu.models.lvdm import VideoDiffusionEngine
    from viewcrafter_tpu.sampling.ddim import GuidanceConfig

    cfg = get_model_config("viewcrafter_tiny")
    eng = VideoDiffusionEngine(cfg, dtype=jnp.float32)
    params = jax.jit(eng.init_params)(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda p: jnp.where(jnp.all(p == 0), jnp.full_like(p, 0.01), p), params
    )
    frames = jnp.zeros((1, cfg.video_length, cfg.height, cfg.width, 3))
    ids = jnp.asarray(eng.prompt_ids("a scene", 1))
    uids = jnp.asarray(eng.prompt_ids("", 1))
    rng = jax.random.PRNGKey(5)
    g = GuidanceConfig()
    out = eng.generate_staged(
        params, frames, ids, uids, rng, steps=4, guidance=g,
        attn_reuse_interval=2, attn_reuse_sites=("down_0", "up_0", "init_attn"),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_ff_caching_and_f8_storage(setup):
    """'ff' kind caches feed-forward deltas; f8 storage round-trips with
    bounded error; identity reuse holds to f8 precision."""
    model, params, x, ts, ctx = setup
    _, cache_all = model.apply(params, x, ts, ctx, collect_cache=True,
                               cache_kinds=("spatial", "cross", "temporal", "ff"))
    assert any(k.endswith("/ff") for k in cache_all)

    _, cache_f8 = model.apply(params, x, ts, ctx, collect_cache=True,
                              cache_kinds=("spatial", "cross", "temporal", "ff"),
                              cache_dtype=jnp.float8_e4m3fn)
    assert all(v.dtype == jnp.float8_e4m3fn for v in cache_f8.values())

    y_ref = model.apply(params, x, ts, ctx)
    y_f8 = model.apply(params, x, ts, ctx, attn_cache=cache_f8,
                       cache_kinds=("spatial", "cross", "temporal", "ff"))
    err = float(jnp.max(jnp.abs(y_f8 - y_ref)))
    assert np.isfinite(np.asarray(y_f8)).all()
    assert err < 0.15, err  # 8-bit storage of the deltas, not exact


def test_pab_ff_f8_e2e():
    from viewcrafter_tpu.models.lvdm import VideoDiffusionEngine
    from viewcrafter_tpu.sampling.ddim import GuidanceConfig

    cfg = get_model_config("viewcrafter_tiny")
    eng = VideoDiffusionEngine(cfg, dtype=jnp.float32)
    params = jax.jit(eng.init_params)(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda p: jnp.where(jnp.all(p == 0), jnp.full_like(p, 0.01), p), params
    )
    frames = jnp.zeros((1, cfg.video_length, cfg.height, cfg.width, 3))
    ids = jnp.asarray(eng.prompt_ids("a scene", 1))
    uids = jnp.asarray(eng.prompt_ids("", 1))
    out = eng.generate_staged(
        params, frames, ids, uids, jax.random.PRNGKey(5), steps=4,
        guidance=GuidanceConfig(), attn_reuse_interval=2,
        attn_reuse_kinds=("spatial", "cross", "temporal", "ff"),
        attn_reuse_dtype="f8",
    )
    assert np.isfinite(np.asarray(out)).all()
