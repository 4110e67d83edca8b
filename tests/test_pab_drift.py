"""PAB attention-reuse drift bound (VERDICT r4 #6).

The reference sampler is exact (lvdm/models/samplers/ddim.py:207-281); our
PAB speed preset (attn_reuse_interval > 1) approximates it. With random
weights only DRIFT vs the exact output is measurable — this asserts a
self-calibrating floor: the PAB-k output (same seed) must be much closer to
the exact output than an INDEPENDENT exact sample (different seed) is. That
catches any regression where the cache plumbing corrupts the computation
(wrong site, stale broadcast, dtype mangling) without hardcoding PSNR
numbers that depend on random weights.

Flagship drift numbers live in docs/performance.md (scripts/pab_drift.py).
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


@pytest.mark.slow
def test_pab_drift_bounded():
    from pab_drift import _generate

    from viewcrafter_tpu.config import get_model_config
    from viewcrafter_tpu.models.lvdm import VideoDiffusionEngine
    from viewcrafter_tpu.utils.metrics import psnr

    cfg = get_model_config("viewcrafter_tiny")
    eng = VideoDiffusionEngine(cfg, dtype=jnp.float32)
    params = jax.jit(eng.init_params)(jax.random.PRNGKey(0))
    frames = jnp.linspace(
        -1.0, 1.0, cfg.video_length * cfg.height * cfg.width * 3
    ).reshape(1, cfg.video_length, cfg.height, cfg.width, 3)
    ids = jnp.asarray(eng.prompt_ids("a scene", 1))

    steps = 8
    exact = _generate(eng, params, frames, ids, ids, seed=3, steps=steps,
                      interval=1, sites=())
    other = _generate(eng, params, frames, ids, ids, seed=4, steps=steps,
                      interval=1, sites=())

    def p(a, b):
        a01 = np.clip((a + 1.0) / 2.0, 0.0, 1.0)
        b01 = np.clip((b + 1.0) / 2.0, 0.0, 1.0)
        return float(jnp.mean(psnr(jnp.asarray(a01), jnp.asarray(b01))))

    baseline = p(other, exact)  # distance between independent samples

    for k in (2, 3):
        pab = _generate(eng, params, frames, ids, ids, seed=3, steps=steps,
                        interval=k, sites=())
        drift_psnr = p(pab, exact)
        # PAB-k reuses attention from the previous step — its output must be
        # FAR closer to exact than an unrelated sample (margin >= 6 dB = 4x
        # lower MSE); equality would mean the cache destroyed the signal
        assert drift_psnr > baseline + 6.0, (
            f"PAB-{k} drift {drift_psnr:.2f} dB vs independent-sample "
            f"baseline {baseline:.2f} dB — attention cache is corrupting "
            "the computation"
        )
        assert np.isfinite(np.asarray(pab)).all()
