"""Packed vs exact rasterizer z-order: runtime AND guidance-frame drift
(VERDICT r3 #5).

Scene: a structured synthetic scene from data/synth_multiview.build_scene
(dense surfaces with real occlusion structure — the distribution that makes
z-ordering matter), scaled to the pipeline's guidance-render workload
(~295k points = two dust3r-512 depth maps, 288x512 target, K=10).

Measures, per z_order mode:
  - seconds/view over a 25-view trajectory (render_trajectory, chunk=4 like
    pipeline.run_render)
  - drift of packed vs exact: max |diff|, mean |diff|, PSNR per frame, and
    the fraction of differing pixels

Run on TPU: python scripts/profile_zorder.py
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

from viewcrafter_tpu.data.synth_multiview import SceneConfig, build_scene, look_at_rdf
from viewcrafter_tpu.ops.rasterize import render_trajectory


def main():
    rng = np.random.default_rng(0)
    h, w = 288, 512
    n_target = 295_000

    pts, cols = build_scene(rng, SceneConfig())
    # tile with jitter to reach the pipeline's point count
    reps = int(np.ceil(n_target / len(pts)))
    pts = np.concatenate([pts + rng.normal(0, 0.002, pts.shape) for _ in range(reps)])[:n_target]
    cols = np.concatenate([cols] * reps)[:n_target].astype(np.float32)
    pts = pts.astype(np.float32)
    center = pts.mean(0)
    span = float(np.abs(pts - center).max())

    # orbit trajectory looking at the scene center
    v = 25
    w2cs = []
    for i, ang in enumerate(np.linspace(-0.35, 0.35, v)):
        eye = center + span * np.array([2.2 * np.sin(ang), 0.15, -2.2 * np.cos(ang)])
        c2w = look_at_rdf(eye, center)
        w2cs.append(np.linalg.inv(c2w))
    w2cs = np.asarray(w2cs, np.float32)
    f = 0.9 * w
    K = np.broadcast_to(
        np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32), (v, 3, 3)
    ).copy()

    pts_j, cols_j = jnp.asarray(pts), jnp.asarray(cols)
    outs = {}
    for mode in ("exact", "packed"):
        def render_all():
            parts = []
            for s in range(0, v, 4):
                parts.append(np.asarray(render_trajectory(
                    pts_j, cols_j, jnp.asarray(w2cs[s:s + 4]), jnp.asarray(K[s:s + 4]),
                    h, w, z_order=mode)))
            return np.concatenate(parts)

        t0 = time.time()
        frames = render_all()
        print(f"{mode}: compile+run {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        frames = render_all()
        per_view = (time.time() - t0) / v
        cov = float((frames.sum(-1) > 0).mean())
        print(f"{mode}: {per_view*1000:8.1f} ms/view   coverage={cov:.3f}", flush=True)
        outs[mode] = frames

    d = np.abs(outs["packed"] - outs["exact"])
    mse = (d ** 2).reshape(v, -1).mean(1)
    psnr = 10 * np.log10(1.0 / np.maximum(mse, 1e-12))
    print(f"drift packed vs exact: max={d.max():.4f} mean={d.mean():.2e} "
          f"pix_diff={(d.max(-1) > 1/255).mean()*100:.3f}%", flush=True)
    print(f"per-frame PSNR: min={psnr.min():.1f} dB  median={np.median(psnr):.1f} dB", flush=True)


if __name__ == "__main__":
    main()
