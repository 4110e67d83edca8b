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

import jax
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


def _nan_where(x, mask):
    return jnp.where(mask[..., None] if x.ndim == mask.ndim + 1 else mask, x, jnp.nan)


def _nanmedian_lower(x, axis):
    """torch.nanmedian semantics: the LOWER middle element among non-NaNs
    (jnp.nanmedian interpolates the two middles, which diverges from the
    reference for even counts)."""
    s = jnp.sort(x, axis=axis)  # NaNs sort last
    n = jnp.sum(~jnp.isnan(x), axis=axis, keepdims=True)
    idx = jnp.clip((n - 1) // 2, 0, x.shape[axis] - 1)
    return jnp.squeeze(jnp.take_along_axis(s, idx, axis=axis), axis=axis)


def joint_pointcloud_depth(z1, z2, valid1, valid2):
    """Joint masked-median depth over both views
    (dust3r/utils/geometry.py:308-319, quantile=0.5)."""
    b = z1.shape[0]
    z = jnp.concatenate(
        [_nan_where(z1, valid1).reshape(b, -1), _nan_where(z2, valid2).reshape(b, -1)], axis=1
    )
    return _nanmedian_lower(z, axis=-1)  # (B,)


def joint_pointcloud_center_scale(pts1, pts2, valid1, valid2):
    """Joint masked-median center + median distance-to-center scale
    (dust3r/utils/geometry.py:323-337; computed under no_grad in the
    reference, so wrapped in stop_gradient here)."""
    b = pts1.shape[0]
    pts = jnp.concatenate(
        [_nan_where(pts1, valid1).reshape(b, -1, 3), _nan_where(pts2, valid2).reshape(b, -1, 3)],
        axis=1,
    )
    center = _nanmedian_lower(pts, axis=1)[:, None, :]  # (B,1,3)
    norm = jnp.linalg.norm(pts - center, axis=-1)  # NaN rows stay NaN
    scale = _nanmedian_lower(norm, axis=1)  # (B,)
    return jax.lax.stop_gradient(center), jax.lax.stop_gradient(scale)


def _shift_inv(gt_pts1, gt_pts2, pr_pts1, pr_pts2, valid1, valid2):
    """Subtract the joint median depth from z (losses.py:239-262 Regr3D_ShiftInv)."""
    gt_shift = joint_pointcloud_depth(gt_pts1[..., 2], gt_pts2[..., 2], valid1, valid2)
    pr_shift = joint_pointcloud_depth(pr_pts1[..., 2], pr_pts2[..., 2], valid1, valid2)
    gs = gt_shift[:, None, None]
    ps = pr_shift[:, None, None]
    gt_pts1 = gt_pts1.at[..., 2].add(-gs)
    gt_pts2 = gt_pts2.at[..., 2].add(-gs)
    pr_pts1 = pr_pts1.at[..., 2].add(-ps)
    pr_pts2 = pr_pts2.at[..., 2].add(-ps)
    return gt_pts1, gt_pts2, pr_pts1, pr_pts2


def _scale_inv(gt_pts1, gt_pts2, pr_pts1, pr_pts2, valid1, valid2, gt_scale):
    """Rescale by joint median scene scale (losses.py:265-295 Regr3D_ScaleInv)."""
    _, g = joint_pointcloud_center_scale(gt_pts1, gt_pts2, valid1, valid2)
    _, p = joint_pointcloud_center_scale(pr_pts1, pr_pts2, valid1, valid2)
    p = jnp.clip(p, 1e-3, 1e3)
    g4 = g[:, None, None, None]
    p4 = p[:, None, None, None]
    if gt_scale:
        pr_pts1 = pr_pts1 * (g4 / p4)
        pr_pts2 = pr_pts2 * (g4 / p4)
    else:
        gt_pts1 = gt_pts1 / g4
        gt_pts2 = gt_pts2 / g4
        pr_pts1 = pr_pts1 / p4
        pr_pts2 = pr_pts2 / p4
    return gt_pts1, gt_pts2, pr_pts1, pr_pts2


def regr3d_loss(
    gt1: Dict, gt2: Dict, pred1: Dict, pred2: Dict,
    norm_mode: bool = True, gt_scale: bool = False, dist_clip: float | None = None,
    mode: str = "plain",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-pixel L2 losses + masks for both views.

    gt dicts: pts3d (B,H,W,3) world frame, camera_pose (B,4,4) c2w,
    valid_mask (B,H,W). pred dicts: pts3d / pts3d_in_other_view (B,H,W,3).
    mode: "plain" (Regr3D), "shift_inv", "scale_inv", "scale_shift_inv"
    (losses.py:140-297). The avg_dis normalization runs inside the base
    Regr3D.get_all_pts3d, so the invariance transforms apply AFTER it; for
    scale_shift_inv the MRO order is normalize -> shift -> scale.
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

    if mode not in ("plain", "shift_inv", "scale_inv", "scale_shift_inv"):
        raise ValueError(f"unknown regr3d mode {mode!r}")

    if norm_mode:
        pr_pts1, pr_pts2 = normalize_pointcloud(pr_pts1, pr_pts2, valid1, valid2)
        if not gt_scale:
            gt_pts1, gt_pts2 = normalize_pointcloud(gt_pts1, gt_pts2, valid1, valid2)

    if mode in ("shift_inv", "scale_shift_inv"):
        gt_pts1, gt_pts2, pr_pts1, pr_pts2 = _shift_inv(
            gt_pts1, gt_pts2, pr_pts1, pr_pts2, valid1, valid2)
    if mode in ("scale_inv", "scale_shift_inv"):
        gt_pts1, gt_pts2, pr_pts1, pr_pts2 = _scale_inv(
            gt_pts1, gt_pts2, pr_pts1, pr_pts2, valid1, valid2, gt_scale)

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
