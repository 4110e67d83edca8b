"""Pose / point transforms (pure jnp, jit-friendly).

Parity targets:
  - geotrf batched homogeneous transforms:
    extern/dust3r/dust3r/utils/geometry.py:40-101
  - world re-anchoring to the k-th camera / object center:
    utils/pvd_utils.py:506-556
  - depth <-> pts3d unprojection: extern/dust3r/dust3r/utils/geometry.py:114-217

Coordinate convention: OpenCV/COLMAP RDF (x right, y down, z forward) —
DUSt3R's native frame. The reference converts RDF->PyTorch3D-LUF only to feed
PyTorch3D (utils/pvd_utils.py:144-151); our rasterizer consumes RDF pinhole
cameras directly, so no LUF conversion exists anywhere in this codebase.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def geotrf(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 (or batched ...x4x4) homogeneous transform(s) to 3D points.

    T: (..., 4, 4); pts: (..., N, 3) or (N, 3) broadcastable against T's batch.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def inv_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of (batched) rigid transform(s) without a general solve."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., None])[..., 0]
    bottom = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0]), T[..., :1, :].shape)
    top = jnp.concatenate([Rt, ti[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def homogenize(pts: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def world_to_kth(poses: jnp.ndarray, k: int) -> jnp.ndarray:
    """Re-anchor world frame to camera k (utils/pvd_utils.py:506-511)."""
    return inv_se3(poses[k])[None] @ poses


def world_point_to_kth(poses: jnp.ndarray, points: jnp.ndarray, k: int):
    """Re-anchor poses AND per-view pointmaps to camera k
    (utils/pvd_utils.py:513-525). points: (N, H, W, 3)."""
    inv_k = inv_se3(poses[k])
    new_poses = inv_k[None] @ poses
    n, h, w, _ = points.shape
    new_pts = geotrf(inv_k, points.reshape(n, h * w, 3)).reshape(n, h, w, 3)
    return new_poses, new_pts


def object_anchor_pose(r: float, elevation_deg: float) -> jnp.ndarray:
    """Pose of the object-centric frame: origin at [0,0,r] in the anchor camera
    frame, tilted by (180 - elevation) about x (utils/pvd_utils.py:528-547)."""
    e = jnp.deg2rad(180.0 - elevation_deg)
    c, s = jnp.cos(e), jnp.sin(e)
    R = jnp.asarray([[1.0, 0.0, 0.0], [0.0, c, s], [0.0, -s, c]])
    T = jnp.eye(4)
    T = T.at[:3, :3].set(R)
    return T.at[2, 3].set(r)


def world_point_to_obj(poses: jnp.ndarray, points: jnp.ndarray, k: int, r: float, elevation_deg: float):
    """Re-anchor world to the object center at depth r in front of camera k,
    with an elevation tilt (utils/pvd_utils.py:528-556)."""
    poses, points = world_point_to_kth(poses, points, k)
    inv_obj = inv_se3(object_anchor_pose(r, elevation_deg))
    new_poses = inv_obj[None] @ poses
    n, h, w, _ = points.shape
    new_pts = geotrf(inv_obj, points.reshape(n, h * w, 3)).reshape(n, h, w, 3)
    return new_poses, new_pts


def depthmap_to_pts3d(depth: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Unproject depth (..., H, W) with pinhole K (..., 3, 3) to camera-frame
    points (..., H, W, 3) (cf. dust3r/utils/geometry.py:114-147)."""
    h, w = depth.shape[-2:]
    u = jnp.arange(w, dtype=jnp.float32)
    v = jnp.arange(h, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)
    fx = intrinsics[..., 0, 0][..., None, None]
    fy = intrinsics[..., 1, 1][..., None, None]
    cx = intrinsics[..., 0, 2][..., None, None]
    cy = intrinsics[..., 1, 2][..., None, None]
    x = depth * (uu - cx) / fx
    y = depth * (vv - cy) / fy
    return jnp.stack([x, y, depth], axis=-1)


def make_intrinsics(focal, pp) -> np.ndarray:
    """focal: (N,) or (N,2); pp: (N,2) -> (N,3,3) pinhole K matrices."""
    focal = np.asarray(focal, np.float32)
    pp = np.asarray(pp, np.float32)
    n = pp.shape[0]
    if focal.ndim == 1:
        focal = np.stack([focal, focal], axis=-1)
    K = np.zeros((n, 3, 3), np.float32)
    K[:, 0, 0] = focal[:, 0]
    K[:, 1, 1] = focal[:, 1]
    K[:, 0, 2] = pp[:, 0]
    K[:, 1, 2] = pp[:, 1]
    K[:, 2, 2] = 1.0
    return K
