"""Quantify PAB attention-reuse drift vs exact sampling (VERDICT r4 #6).

PAB (Pyramid-Attention-Broadcast-style reuse, arXiv:2408.12588) recomputes
the cached attention sites every k-th DDIM step and broadcasts in between;
the reference sampler is exact (lvdm/models/samplers/ddim.py:207-281), so
shipping PAB as a speed preset requires knowing what the approximation costs.
Released checkpoints aren't available in this environment, so this measures
DRIFT — PSNR/SSIM of the PAB-k output against the exact output with the same
seed and (random) weights. Drift is a necessary-not-sufficient proxy: a
quality-preserving configuration must at minimum produce nearly the exact
output; random weights exercise the identical compute graph and caching
sites as trained ones.

Usage:
  python scripts/pab_drift.py [model] [steps]
(defaults: viewcrafter_25_512, 50 — the 320x512 preset keeps per-variant
compile+run affordable; the cache-site topology is identical to flagship).

Prints one table row per (k, site-set): PSNR/SSIM of PAB-k vs exact.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

# the ds1 (full-resolution) subset: the memory-lean default bench.py ships
SITES_DS1 = ("down_0", "up_0", "init_attn")
SITES_ALL = ()  # empty = every attention site caches


def _generate(eng, params, frames, ids, uids, seed, steps, interval, sites,
              kinds=("spatial", "temporal"), dtype="bf16"):
    video = eng.generate_staged(
        params, frames, ids, uids, jax.random.PRNGKey(seed), steps=steps,
        attn_reuse_interval=interval, attn_reuse_kinds=kinds,
        attn_reuse_sites=sites, attn_reuse_dtype=dtype,
    )
    return np.asarray(jax.device_get(video))


def measure_drift(model_name="viewcrafter_25_512", steps=50,
                  ks=(2, 3, 4, 5), site_sets=None, seed=7):
    """Returns {(k, site_label): {"psnr": float, "ssim": float}} of PAB-k
    output vs the exact (interval-1) output, same seed/weights."""
    from viewcrafter_tpu.config import get_model_config
    from viewcrafter_tpu.models.lvdm import VideoDiffusionEngine
    from viewcrafter_tpu.utils.metrics import psnr, ssim

    site_sets = site_sets or {"ds1": SITES_DS1, "all": SITES_ALL}
    cfg = get_model_config(model_name)
    eng = VideoDiffusionEngine(cfg)
    params = eng.fast_init_params(jax.random.PRNGKey(0))
    frames = jnp.zeros((1, cfg.video_length, cfg.height, cfg.width, 3))
    ids = jnp.asarray(eng.prompt_ids("Rotating view of a scene", 1))
    uids = jnp.asarray(eng.prompt_ids("", 1))

    t0 = time.time()
    exact = _generate(eng, params, frames, ids, uids, seed, steps, 1, ())
    print(f"# exact reference generated in {time.time() - t0:.0f}s", flush=True)
    # decoded videos are in [-1, 1]; metrics expect [0, 1]
    exact01 = np.clip((exact + 1.0) / 2.0, 0.0, 1.0)

    results = {}
    # f8 variant on the DS1 set: the flagship bench ships PAB-3 with an f8
    # cache (the bf16 full-site cache exceeds the 16 GB chip — bench.py r5),
    # so its extra storage error must be on this table too.
    variants = [(label, sites, "bf16") for label, sites in site_sets.items()]
    variants.append(("ds1f8", SITES_DS1, "f8"))
    for label, sites, dtype in variants:
        for k in ks:
            t0 = time.time()
            try:
                out = _generate(eng, params, frames, ids, uids, seed, steps, k,
                                sites, dtype=dtype)
            except Exception as e:  # transient tunnel/compile failures: the
                # persistent cache makes a later retry cheap; keep the sweep
                print(f"PAB-{k} sites={label}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                continue
            out01 = np.clip((out + 1.0) / 2.0, 0.0, 1.0)
            p = float(jnp.mean(psnr(jnp.asarray(out01), jnp.asarray(exact01))))
            s = float(jnp.mean(ssim(
                jnp.asarray(out01.reshape(-1, *out01.shape[-3:])),
                jnp.asarray(exact01.reshape(-1, *exact01.shape[-3:])),
            )))
            results[(k, label)] = {"psnr": p, "ssim": s}
            print(f"PAB-{k} sites={label:<5s} psnr={p:6.2f} dB  ssim={s:.4f}"
                  f"  ({time.time() - t0:.0f}s)", flush=True)
    return results


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    model = sys.argv[1] if len(sys.argv) > 1 else "viewcrafter_25_512"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    measure_drift(model, steps)
