import jax
import jax.numpy as jnp
import numpy as np

from viewcrafter_tpu.config import get_model_config
from viewcrafter_tpu.models.lvdm import VideoDiffusionEngine
from viewcrafter_tpu.sampling.ddim import GuidanceConfig


def test_staged_matches_monolithic():
    """Chunked sampling must reproduce the single-program result bit-for-bit
    (same schedule gathers, same fold_in rng stream)."""
    cfg = get_model_config("viewcrafter_tiny")
    eng = VideoDiffusionEngine(cfg, dtype=jnp.float32)
    params = jax.jit(eng.init_params)(jax.random.PRNGKey(0))
    frames = jax.random.uniform(jax.random.PRNGKey(1), (1, cfg.video_length, cfg.height, cfg.width, 3)) * 2 - 1
    ids = jnp.asarray(eng.prompt_ids("a scene", 1))
    uids = jnp.asarray(eng.prompt_ids("", 1))
    rng = jax.random.PRNGKey(2)
    g = GuidanceConfig(scale=7.5, rescale=0.7)
    mono = eng.jitted_generate(params, frames, ids, uids, rng, steps=4, guidance=g)
    staged = eng.generate_staged(params, frames, ids, uids, rng, steps=4, guidance=g, chunk=3)
    np.testing.assert_allclose(np.asarray(mono), np.asarray(staged), atol=2e-5)


def test_staged_sequential_cfg_close_to_batched():
    """Sequential-CFG branch evaluation is the same math as batched."""
    cfg = get_model_config("viewcrafter_tiny")
    eng = VideoDiffusionEngine(cfg, dtype=jnp.float32)
    params = jax.jit(eng.init_params)(jax.random.PRNGKey(0))
    frames = jnp.zeros((1, cfg.video_length, cfg.height, cfg.width, 3))
    ids = jnp.asarray(eng.prompt_ids("a scene", 1))
    uids = jnp.asarray(eng.prompt_ids("", 1))
    rng = jax.random.PRNGKey(3)
    a = eng.jitted_generate(params, frames, ids, uids, rng, steps=2,
                            guidance=GuidanceConfig(sequential=False))
    b = eng.jitted_generate(params, frames, ids, uids, rng, steps=2,
                            guidance=GuidanceConfig(sequential=True))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pab_multicell_window_matches_per_cell():
    """The multi-cell PAB window (lax.fori over cells INSIDE one executable —
    built so the flagship's 10.7 GiB PAB temp arena is allocated once per
    device call instead of once per cell; sampling/ddim.py
    ddim_sample_window_pab_cells) must be bit-identical to driving one
    window per cell."""
    cfg = get_model_config("viewcrafter_tiny")
    eng = VideoDiffusionEngine(cfg, dtype=jnp.float32)
    params = jax.jit(eng.init_params)(jax.random.PRNGKey(0))
    frames = jnp.zeros((1, cfg.video_length, cfg.height, cfg.width, 3))
    ids = jnp.asarray(eng.prompt_ids("a scene", 1))
    kw = dict(
        attn_reuse_interval=3,
        attn_reuse_kinds=("spatial", "temporal"),
        attn_reuse_sites=("down_0", "init_attn"),
    )
    # generate_staged picks chunk=24 -> ONE window call: 2 cells + tail of 2
    a = eng.generate_staged(params, frames, ids, ids, jax.random.PRNGKey(5),
                            steps=8, **kw)
    # reference: the same 8 steps as three per-cell window calls
    prepare_fn, window_fn, decode_fn = eng.staged_programs(
        tuple(frames.shape), steps=8, **kw)
    x, z, c, r = prepare_fn(params, frames, ids, ids, jax.random.PRNGKey(5))
    for s0, n in ((0, 3), (3, 3), (6, 2)):
        x = window_fn(params, x, z, c, r, jnp.asarray(s0), n)
    b = decode_fn(params, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
