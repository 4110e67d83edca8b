"""DUSt3R training losses (pointmap regression + confidence weighting).

Parity targets (extern/dust3r/dust3r/losses.py:140-297):
  - Regr3D: L2 regression of both views' pointmaps in view1's camera frame,
    with 'avg_dis' normalization of pred and gt clouds independently;
  - ConfLoss: conf-weighted pixel loss minus alpha * log(conf);
  - shift-/scale-invariant variants.

Masked-mean formulation (JAX needs static shapes, so boolean-indexing in the
reference becomes mask-weighted means here — identical value).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from viewcrafter_tpu.geometry.transforms import geotrf, inv_se3


def _masked_mean(x, mask, axis=None):
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask, axis=axis) / jnp.clip(jnp.sum(mask, axis=axis), 1.0)


def normalize_pointcloud(pts1, pts2, valid1, valid2):
    """'avg_dis' norm: divide both clouds by the average distance-to-origin of
    all valid points (losses.py normalize_pointcloud)."""
    d1 = jnp.linalg.norm(pts1, axis=-1)
    d2 = jnp.linalg.norm(pts2, axis=-1)
    all_d = jnp.concatenate([d1.reshape(d1.shape[0], -1), d2.reshape(d2.shape[0], -1)], axis=1)
    all_m = jnp.concatenate(
        [valid1.reshape(valid1.shape[0], -1), valid2.reshape(valid2.shape[0], -1)], axis=1
    )
    norm = _masked_mean(all_d, all_m, axis=1)[:, None, None, None]
    norm = jnp.clip(norm, 1e-8)
    return pts1 / norm, pts2 / norm


def regr3d_loss(
    gt1: Dict, gt2: Dict, pred1: Dict, pred2: Dict,
    norm_mode: bool = True, gt_scale: bool = False, dist_clip: float | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-pixel L2 losses + masks for both views.

    gt dicts: pts3d (B,H,W,3) world frame, camera_pose (B,4,4) c2w,
    valid_mask (B,H,W). pred dicts: pts3d / pts3d_in_other_view (B,H,W,3).
    Returns (loss1, mask1, loss2, mask2), losses per pixel.
    """
    in_cam1 = inv_se3(gt1["camera_pose"])
    b, h, w, _ = gt1["pts3d"].shape
    gt_pts1 = geotrf(in_cam1[:, None], gt1["pts3d"].reshape(b, 1, -1, 3))[:, 0].reshape(b, h, w, 3)
    gt_pts2 = geotrf(in_cam1[:, None], gt2["pts3d"].reshape(b, 1, -1, 3))[:, 0].reshape(b, h, w, 3)
    valid1 = gt1["valid_mask"]
    valid2 = gt2["valid_mask"]
    if dist_clip is not None:
        valid1 = valid1 & (jnp.linalg.norm(gt_pts1, axis=-1) <= dist_clip)
        valid2 = valid2 & (jnp.linalg.norm(gt_pts2, axis=-1) <= dist_clip)

    pr_pts1 = pred1["pts3d"]
    pr_pts2 = pred2["pts3d_in_other_view"]
    if norm_mode:
        pr_pts1, pr_pts2 = normalize_pointcloud(pr_pts1, pr_pts2, valid1, valid2)
        if not gt_scale:
            gt_pts1, gt_pts2 = normalize_pointcloud(gt_pts1, gt_pts2, valid1, valid2)

    loss1 = jnp.linalg.norm(pr_pts1 - gt_pts1, axis=-1)
    loss2 = jnp.linalg.norm(pr_pts2 - gt_pts2, axis=-1)
    return loss1, valid1, loss2, valid2


def conf_loss(
    gt1: Dict, gt2: Dict, pred1: Dict, pred2: Dict, alpha: float = 0.2, **regr_kw
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total training loss: conf * pixel_loss - alpha * log(conf), masked mean
    over valid pixels of both views (losses.py:191-230)."""
    loss1, m1, loss2, m2 = regr3d_loss(gt1, gt2, pred1, pred2, **regr_kw)
    log_c1 = jnp.log(jnp.clip(pred1["conf"], 1e-8))
    log_c2 = jnp.log(jnp.clip(pred2["conf"], 1e-8))
    cl1 = _masked_mean(loss1 * pred1["conf"] - alpha * log_c1, m1)
    cl2 = _masked_mean(loss2 * pred2["conf"] - alpha * log_c2, m2)
    total = cl1 + cl2
    return total, {
        "conf_loss_1": cl1,
        "conf_loss_2": cl2,
        "regr3d_1": _masked_mean(loss1, m1),
        "regr3d_2": _masked_mean(loss2, m2),
    }
