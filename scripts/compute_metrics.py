#!/usr/bin/env python
"""Offline PSNR/SSIM/LPIPS between a generated video and ground-truth frames
(the metric step the reference leaves to external code, README.md:171-177).

Usage:
  python scripts/compute_metrics.py --pred output/exp/diffusion_ref0.mp4 \
      --gt test/eval1 [--lpips_weights checkpoints/lpips_alex.pth]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from viewcrafter_tpu.data.video_reader import read_video
from viewcrafter_tpu.utils import metrics


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_metrics"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    p = argparse.ArgumentParser()
    p.add_argument("--pred", required=True, help="generated video (mp4 or frame dir)")
    p.add_argument("--gt", required=True, help="ground-truth video (mp4 or frame dir)")
    p.add_argument("--lpips_weights", default=None)
    args = p.parse_args()

    pred = read_video(args.pred).astype(np.float32) / 255.0
    gt = read_video(args.gt).astype(np.float32) / 255.0
    t = min(len(pred), len(gt))
    pred, gt = pred[:t], gt[:t]
    if pred.shape != gt.shape:
        import jax

        gt = np.asarray(jax.image.resize(gt, pred.shape, "bilinear"))
    if args.lpips_weights:
        metrics.load_lpips_weights(args.lpips_weights)
    print(json.dumps(metrics.video_metrics(pred, gt)))


if __name__ == "__main__":
    main()
