"""On-device point-cloud rasterizer: splat + per-pixel K-nearest z-buffer +
alpha compositing, as pure XLA (sort/scatter based — no data-dependent shapes).

This replaces the reference's PyTorch3D CUDA path
(PointsRasterizationSettings(radius=0.01, points_per_pixel=10, bin_size=0) +
PointsRenderer/AlphaCompositor, utils/pvd_utils.py:345-361, viewcrafter.py:61-84)
with identical semantics:
  - every point with screen-space (square-NDC) distance < radius of a pixel
    center contributes to that pixel;
  - per pixel, the K nearest-by-z contributors are kept, depth-ordered;
  - weights w = 1 - dist^2/radius^2 are alpha-composited front-to-back:
    out = sum_k w_k * prod_{j<k}(1 - w_j) * color_k.

Design for TPU: instead of an atomic z-buffer (no atomics in XLA), each point
is expanded to a static (2F+1)^2 pixel footprint, then ONE depth sort + ONE
stable pixel-id sort orders all candidates (pixel-major, near-to-far); ranks
within each pixel come from a searchsorted; a flat scatter writes the K slots.
Everything is static-shaped, so the whole render of a 25-view trajectory jits
into a single program (`lax.map` over views keeps peak memory at one view's
candidate set).

Cameras are OpenCV-RDF pinholes (pixel-unit focal/principal point); the
reference's RDF->PyTorch3D-LUF gymnastics (utils/pvd_utils.py:144-151) net out
to exactly this projection.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from viewcrafter_tpu.geometry.transforms import geotrf


def _footprint_offsets(radius_px: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    f = max(1, math.ceil(radius_px + 0.5))
    d = jnp.arange(-f, f + 1)
    dy, dx = jnp.meshgrid(d, d, indexing="ij")
    return dy.reshape(-1), dx.reshape(-1)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "radius_ndc", "points_per_pixel", "znear")
)
def rasterize_points(
    points: jnp.ndarray,  # (N, 3) world, RDF
    colors: jnp.ndarray,  # (N, C)
    w2c: jnp.ndarray,  # (4, 4)
    intrinsics: jnp.ndarray,  # (3, 3) pixel units
    height: int,
    width: int,
    radius_ndc: float = 0.01,
    points_per_pixel: int = 10,
    znear: float = 1e-4,
) -> jnp.ndarray:
    """Render one view -> (H, W, C) alpha-composited image (holes = 0)."""
    n, c = colors.shape
    k = points_per_pixel
    hw = height * width
    # PyTorch3D square-NDC: the shorter image side spans [-1, 1]
    radius_px = radius_ndc * min(height, width) / 2.0

    cam = geotrf(w2c, points[None])[0]  # (N, 3)
    z = cam[:, 2]
    safe_z = jnp.where(jnp.abs(z) < znear, znear, z)
    u = intrinsics[0, 0] * cam[:, 0] / safe_z + intrinsics[0, 2]
    v = intrinsics[1, 1] * cam[:, 1] / safe_z + intrinsics[1, 2]
    visible = z > znear

    dy, dx = _footprint_offsets(radius_px)
    f2 = dy.shape[0]
    # containing pixel of the splat center
    pu = jnp.floor(u).astype(jnp.int32)
    pv = jnp.floor(v).astype(jnp.int32)
    px = pu[:, None] + dx[None, :]  # (N, F2)
    py = pv[:, None] + dy[None, :]
    # squared distance from splat center to candidate pixel centers, px units
    du = (px.astype(jnp.float32) + 0.5) - u[:, None]
    dv = (py.astype(jnp.float32) + 0.5) - v[:, None]
    dist2 = du * du + dv * dv
    in_bounds = (px >= 0) & (px < width) & (py >= 0) & (py < height)
    valid = in_bounds & (dist2 < radius_px * radius_px) & visible[:, None]

    pix_id = jnp.where(valid, py * width + px, hw).reshape(-1)  # sentinel = hw
    cand_z = jnp.where(valid, z[:, None], jnp.inf).reshape(-1)
    weight = jnp.clip(1.0 - dist2 / (radius_px * radius_px), 0.0, 1.0).reshape(-1)
    point_idx = jnp.broadcast_to(jnp.arange(n)[:, None], (n, f2)).reshape(-1)

    # order near-to-far, then group by pixel (stable keeps depth order).
    # NOTE: a single two-key lax.sort((pix, z_bits, idx), num_keys=2) is
    # semantically identical but its variadic comparator makes XLA:TPU
    # compile time explode (>30 min at 3.6M candidates, measured) — the two
    # default argsorts lower through the fast sort expansion instead.
    order_z = jnp.argsort(cand_z)
    pix_sorted = pix_id[order_z]
    order_pix = jnp.argsort(pix_sorted, stable=True)
    order = order_z[order_pix]
    pix_final = pix_id[order]
    # rank within pixel via a boundary cummax scan (cheaper than the
    # gather-heavy binary search of searchsorted on TPU)
    idx = jnp.arange(pix_final.shape[0])
    boundary = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), pix_final[1:] != pix_final[:-1]]
    )
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(boundary, idx, 0))
    rank = idx - seg_start

    keep = (rank < k) & (pix_final < hw)
    flat = jnp.where(keep, pix_final * k + rank, hw * k)

    w_buf = jnp.zeros((hw * k + 1,), jnp.float32).at[flat].set(weight[order], mode="drop")
    col_sorted = colors[point_idx[order]].astype(jnp.float32)
    c_buf = jnp.zeros((hw * k + 1, c), jnp.float32).at[flat].set(col_sorted, mode="drop")

    w_k = w_buf[:-1].reshape(hw, k)
    c_k = c_buf[:-1].reshape(hw, k, c)
    # front-to-back over-compositing with exclusive transmittance
    trans = jnp.cumprod(1.0 - w_k, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
    img = jnp.sum(w_k[..., None] * trans[..., None] * c_k, axis=1)
    return img.reshape(height, width, c)


def render_trajectory(
    points: jnp.ndarray,  # (N, 3)
    colors: jnp.ndarray,  # (N, C)
    w2cs: jnp.ndarray,  # (V, 4, 4)
    intrinsics: jnp.ndarray,  # (V, 3, 3) or (3, 3)
    height: int,
    width: int,
    radius_ndc: float = 0.01,
    points_per_pixel: int = 10,
) -> jnp.ndarray:
    """Render V views sequentially (lax.map bounds memory to one view's
    candidates) -> (V, H, W, C)."""
    if intrinsics.ndim == 2:
        intrinsics = jnp.broadcast_to(intrinsics, (w2cs.shape[0], 3, 3))

    def one(args):
        w2c, K = args
        return rasterize_points(
            points, colors, w2c, K, height, width,
            radius_ndc=radius_ndc, points_per_pixel=points_per_pixel,
        )

    return jax.lax.map(one, (w2cs, intrinsics))
