"""Measure the geometry stage on the real TPU (VERDICT r2 weak #4):

  (a) dust3r_512 pair inference (the batched two-view forward the pipeline
      runs per edge of the scene graph) at 288x512, batch sizes 1/2/4/8
  (b) the 300-step jitted global-alignment scan (align/global_align.py) at
      single-view scale (n=2, 2 edges) and iterative scale (n=8, 56 edges)
  (c) host-side MST init

Reference comparison: the torch pipeline runs one pair at a time through
AsymmetricCroCo3DStereo (extern/dust3r/dust3r/inference.py:30-47) and 300
Python-stepped Adam iterations (cloud_opt/base_opt.py:302-317) — ~0.06 s/iter
on A100 => ~18 s for a 300-iter alignment.

Usage: python scripts/profile_align.py [dust3r] [align] [mst]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W = 288, 512


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def profile_dust3r():
    from viewcrafter_tpu.config import get_dust3r_config
    from viewcrafter_tpu.models.dust3r import Dust3rModel

    cfg = get_dust3r_config("dust3r_512")
    model = Dust3rModel(cfg)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, H, W, 3), jnp.float32)
    params = jax.jit(model.init)(rng, img, img)
    apply = jax.jit(model.apply)

    for b in (1, 2, 4, 8):
        i1 = jnp.broadcast_to(img, (b, H, W, 3))
        i2 = i1 + 0.1
        sync(apply(params, i1, i2))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(apply(params, i1, i2))
            best = min(best, time.perf_counter() - t0)
        print(f"dust3r_512 pair forward  batch={b}   {best*1000:8.1f} ms"
              f"  ({best/b*1000:7.1f} ms/pair)", flush=True)


def _synthetic_graph(n):
    from viewcrafter_tpu.align.global_align import SceneGraph
    from viewcrafter_tpu.align.pairs import make_pairs

    rng = np.random.default_rng(0)
    pairs = make_pairs(n, scene_graph="complete", symmetrize=True)
    e = len(pairs)
    # plausible scene: smooth depth field, per-edge noise
    yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W), indexing="ij")
    base = np.stack([xx, yy, 2.0 + 0.3 * np.sin(3 * xx) * np.cos(2 * yy)], -1)
    pred_i = np.stack([base + 0.01 * rng.standard_normal(base.shape) for _ in range(e)]).astype(np.float32)
    pred_j = np.stack([base + 0.01 * rng.standard_normal(base.shape) for _ in range(e)]).astype(np.float32)
    conf = np.exp(rng.uniform(0.5, 2.0, (e, H, W))).astype(np.float32) + 1.0
    return SceneGraph(edges=np.asarray(pairs), pred_i=pred_i, pred_j=pred_j,
                      conf_i=conf, conf_j=conf.copy(),
                      imgs=rng.uniform(0, 1, (n, H, W, 3)).astype(np.float32))


def profile_align(n):
    from viewcrafter_tpu.align.global_align import GlobalAligner

    g = _synthetic_graph(n)
    t0 = time.perf_counter()
    aligner = GlobalAligner(g)
    params = aligner.init_mst()
    t_mst = time.perf_counter() - t0
    print(f"MST init (host)          n={n}   {t_mst*1000:8.1f} ms", flush=True)

    p2, losses = aligner.optimize(params)
    sync(losses)  # compile + run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, losses = aligner.optimize(params)
        sync(losses)
        best = min(best, time.perf_counter() - t0)
    print(f"alignment 300-step scan  n={n} (E={g.n_edges})   {best*1000:8.1f} ms"
          f"  ({best/300*1000:6.2f} ms/iter)", flush=True)


def main():
    which = set(sys.argv[1:]) or {"dust3r", "align"}
    print(f"backend: {jax.default_backend()}", flush=True)
    if "dust3r" in which:
        profile_dust3r()
    if "align" in which or "mst" in which:
        profile_align(2)
        profile_align(8)


if __name__ == "__main__":
    main()
