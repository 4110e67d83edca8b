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
