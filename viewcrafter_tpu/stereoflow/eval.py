"""Stereo/flow benchmark evaluation CLI.

Parity target: extern/dust3r/croco/stereoflow/test.py — load a downstream
CroCo checkpoint, run tiled overlapping-crop inference over one or more
test datasets, and optionally save metrics / raw predictions /
visualizations / error maps / leaderboard submission files
(test.py:82-126 `_save_batch`, :128-209 `main`).

Differences by design:
  - checkpoints are our orbax trees (utils/checkpoint.save_params) with a
    JSON sidecar `<model>.json` holding what the reference pickles inside
    the torch checkpoint's `args` (task, crop, criterion conf flag,
    tile_conf_mode, croco topology overrides);
  - metrics are written as JSON, predictions as .npy (no torch/pickle);
  - the tiled forward is ONE jitted batched program (engine.tiled_pred),
    not a per-tile Python loop.

Usage:
  python -m viewcrafter_tpu.stereoflow.eval --model /path/ckpt \
      --dataset "Kitti15('test')" --save submission metrics
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from viewcrafter_tpu.stereoflow.criterion import (
    FlowDatasetMetrics,
    StereoDatasetMetrics,
)
from viewcrafter_tpu.stereoflow.data import (
    flow_to_color,
    get_test_datasets_flow,
    get_test_datasets_stereo,
    vis_disparity,
)
from viewcrafter_tpu.stereoflow.engine import tiled_pred


def get_args_parser():
    parser = argparse.ArgumentParser("Test CroCo models on stereo/flow", add_help=False)
    parser.add_argument("--model", required=True, type=str,
                        help="orbax checkpoint dir (utils.checkpoint.save_params)")
    parser.add_argument("--dataset", required=True, type=str,
                        help="test dataset(s), '+'-separated, e.g. \"Kitti15('test')\"")
    parser.add_argument("--task", type=str, default="",
                        choices=["", "stereo", "flow"],
                        help="override the sidecar task")
    parser.add_argument("--tile_conf_mode", type=str, default="",
                        help="confidence weighting (empty = sidecar value)")
    parser.add_argument("--tile_overlap", type=float, default=0.7)
    parser.add_argument("--crop", type=int, nargs=2, default=None,
                        help="tile size H W (default: sidecar, else 352 704)")
    parser.add_argument("--tile_batch", type=int, default=0,
                        help=">0 chunks the tile batch to bound memory")
    parser.add_argument("--save", type=str, nargs="+", default=[],
                        choices=["metrics", "pred", "visu", "err10", "submission"])
    parser.add_argument("--out_dir", type=str, default="",
                        help="output root (default <model>_<dataset>)")
    return parser


def _load_model(model_path, task_override):
    """Build the downstream model + params from an orbax dir and its JSON
    sidecar (the reference reads these from the torch ckpt args,
    test.py:51-79)."""
    from viewcrafter_tpu.models.croco_downstream import (
        CroCoDownstreamBinocular,
        CroCoDownstreamConfig,
    )
    from viewcrafter_tpu.utils.checkpoint import load_params

    meta = {}
    sidecar = model_path.rstrip("/") + ".json"
    if osp.isfile(sidecar):
        with open(sidecar) as fid:
            meta = json.load(fid)
    task = task_override or meta.get("task") or "stereo"
    with_conf = bool(meta.get("with_conf", True))
    crop = tuple(meta.get("crop", (352, 704)))
    tile_conf_mode = meta.get("tile_conf_mode", "conf_expsigmoid_10_5")
    num_channels = {"stereo": 1, "flow": 2}[task] + int(with_conf)
    cfg = CroCoDownstreamConfig(
        num_channels=num_channels, **meta.get("croco", {}))
    model = CroCoDownstreamBinocular(cfg=cfg)
    like = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, crop[0], crop[1], 3), jnp.float32),
            jnp.zeros((1, crop[0], crop[1], 3), jnp.float32),
        )
    )
    # orbax needs concrete shardings on the abstract template
    dev = jax.config.jax_default_device or jax.devices()[0]
    sharding = jax.sharding.SingleDeviceSharding(dev)
    like = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sharding), like)
    params = load_params(osp.abspath(model_path), like=like)
    return model, params, task, with_conf, crop, tile_conf_mode


def _save_batch(pred, gt, pairname, dataset, task, save, outdir, time,
                submission_dir=None):
    """Per-sample artifact writer (test.py:82-126). pred/gt: (H, W, C) numpy."""
    fname = osp.join(outdir, dataset.pairname_to_str(pairname))
    os.makedirs(osp.dirname(fname), exist_ok=True)
    from PIL import Image

    if "pred" in save:
        np.save(fname + "_pred.npy", pred)
    if "visu" in save:
        if task == "stereo":
            m = M = None
            if gt is not None:
                finite = gt[np.isfinite(gt)]
                if finite.size:
                    m, M = float(finite.min()), float(finite.max())
            Image.fromarray(vis_disparity(pred[..., 0], m=m, M=M)).save(fname + "_pred.png")
        else:
            ref = gt if gt is not None else pred
            flow_norm = float(np.sqrt(np.sum(ref ** 2, axis=-1)).max())
            Image.fromarray(flow_to_color(pred, maxflow=flow_norm)).save(fname + "_pred.png")
    if "err10" in save:
        assert gt is not None
        l2 = np.sqrt(np.sum((gt - pred) ** 2, axis=-1))
        l2[~np.isfinite(gt[..., 0])] = 0.0
        red = (np.clip(l2, 0, 10.0) * 25.5).astype(np.uint8)[..., None]
        zero = np.zeros_like(red)
        Image.fromarray(np.concatenate([red, zero, zero], axis=2)).save(fname + "_err10.png")
    if "submission" in save:
        assert submission_dir is not None
        pred_np = pred.squeeze(-1) if task == "stereo" else pred
        dataset.submission_save_pairname(pairname, np.ascontiguousarray(pred_np),
                                         submission_dir, time)


def main(args):
    model, params, task, with_conf, crop, tile_conf_mode = _load_model(
        args.model, args.task)
    if args.tile_conf_mode:
        tile_conf_mode = args.tile_conf_mode
    if args.crop:
        crop = tuple(args.crop)

    datasets = (get_test_datasets_stereo if task == "stereo"
                else get_test_datasets_flow)(args.dataset)

    apply_fn = jax.jit(lambda i1, i2: model.apply(params, i1, i2))

    all_results = {}
    for i, dataset in enumerate(datasets):
        dstr = args.dataset.split("+")[i]
        outdir = args.out_dir or (
            args.model.rstrip("/") + "_" + dstr.replace("(", "").replace(")", "").replace("'", ""))
        submission_dir = None
        if "submission" in args.save:
            submission_dir = osp.join(
                outdir, f"submission_conf_{tile_conf_mode}_overlap_{args.tile_overlap}")

        metrics = (StereoDatasetMetrics() if task == "stereo"
                   else FlowDatasetMetrics()) if "metrics" in args.save else None
        print(f"evaluating {dataset} ({len(dataset)} pairs) -> {outdir}")

        for idx in range(len(dataset)):
            img1, img2, gt, _pairstr = dataset[idx]
            pairname = dataset.pairnames[idx]
            # Spring stereo right-frame pairs: flip so img1 is the left view,
            # un-flip the prediction (test.py:170-185)
            do_flip = (task == "stereo" and dataset.name == "Spring"
                       and "right" in str(pairname))
            b1 = jnp.asarray(img1)[None, ::1, ::-1 if do_flip else 1]
            b2 = jnp.asarray(img2)[None, ::1, ::-1 if do_flip else 1]
            bgt = jnp.asarray(gt)[None] if gt is not None else None

            t0 = _time.time()
            pred, _, _ = tiled_pred(
                apply_fn, b1, b2,
                None if dataset.name == "Spring" else bgt,
                crop=crop, overlap=args.tile_overlap, conf_mode=tile_conf_mode,
                with_conf=with_conf, tile_batch=args.tile_batch)
            pred = jax.block_until_ready(pred)
            elapsed = _time.time() - t0
            if do_flip:
                pred = pred[:, :, ::-1]

            if metrics is not None and bgt is not None:
                metrics.add_batch(pred, bgt)
            if any(k in args.save for k in ("pred", "visu", "err10", "submission")):
                _save_batch(
                    np.asarray(pred[0], np.float32),
                    np.asarray(bgt[0]) if bgt is not None else None,
                    pairname, dataset, task, args.save, outdir, elapsed,
                    submission_dir=submission_dir)

        if metrics is not None:
            results = metrics.get_results()
            for k, v in results.items():
                print(f"{k:s}: {v:.3f}")
            fname = osp.join(outdir, f"conf_{tile_conf_mode}_overlap_{args.tile_overlap}.json")
            os.makedirs(osp.dirname(fname), exist_ok=True)
            with open(fname, "w") as fid:
                json.dump(results, fid, indent=1)
            print("metrics saved in", fname)
            all_results[str(dataset)] = results

        if "submission" in args.save:
            dataset.finalize_submission(submission_dir)
    return all_results


if __name__ == "__main__":
    main(get_args_parser().parse_args())
