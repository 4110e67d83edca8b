"""Rasterizer microbench at pipeline-realistic scale.

~400k world points (two DUSt3R 512-view depth maps), 576x1024 target,
radius 0.01 NDC, K=10 — the flagship guidance-render workload
(viewcrafter.py:61-84 renders 25 such views per trajectory).
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

from viewcrafter_tpu.ops.rasterize import rasterize_points, render_trajectory


def main():
    rng = np.random.default_rng(0)
    n = 400_000
    pts = np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-1.2, 1.2, n), rng.uniform(2.0, 6.0, n),
    ], axis=1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    K = np.array([[900.0, 0, 512.0], [0, 900.0, 288.0], [0, 0, 1.0]], np.float32)
    w2c = np.eye(4, dtype=np.float32)

    pts_j, cols_j = jnp.asarray(pts), jnp.asarray(cols)

    t0 = time.time()
    img = jax.block_until_ready(
        rasterize_points(pts_j, cols_j, jnp.asarray(w2c), jnp.asarray(K), 576, 1024)
    )
    print(f"single view compile+run {time.time() - t0:.1f}s", flush=True)
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        img = jax.block_until_ready(
            rasterize_points(pts_j, cols_j, jnp.asarray(w2c), jnp.asarray(K), 576, 1024)
        )
    per = (time.time() - t0) / reps
    print(f"single view: {per*1000:.0f} ms  nonzero={float((img.sum(-1) > 0).mean()):.2f}",
          flush=True)

    w2cs = np.broadcast_to(np.eye(4, dtype=np.float32), (25, 4, 4)).copy()
    w2cs[:, 0, 3] = np.linspace(-0.5, 0.5, 25)
    t0 = time.time()
    vid = jax.block_until_ready(
        render_trajectory(pts_j, cols_j, jnp.asarray(w2cs), jnp.asarray(K), 576, 1024)
    )
    print(f"25-view trajectory compile+run {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    vid = jax.block_until_ready(
        render_trajectory(pts_j, cols_j, jnp.asarray(w2cs), jnp.asarray(K), 576, 1024)
    )
    print(f"25-view trajectory: {time.time() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
