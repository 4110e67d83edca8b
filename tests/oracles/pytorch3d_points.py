"""Test-only torch reimplementation of PyTorch3D's point rasterization path
(the reference's renderer: utils/pvd_utils.py:345-361 — PointsRasterizer with
bin_size=0 naive rasterization + AlphaCompositor, radius 0.01 NDC, K=10).

Written INDEPENDENTLY of viewcrafter_tpu/ops/rasterize.py, from PyTorch3D's
published semantics, as an oracle for parity tests (VERDICT r2 #5):

- camera: the reference feeds RDF (OpenCV-convention) extrinsics converted via
  the LUF column flip (pvd_utils.py:337-340), which is exactly PyTorch3D's
  `cameras_from_opencv_projection` equivalence: the net world->screen map is
  the OpenCV pinhole u = fx*x/z + cx, v = fy*y/z + cy (screen units, pixel
  (i, j) center at (j + 0.5, i + 0.5)).
- NDC (non-square convention, pytorch3d/renderer/cameras.py PixToNonSquareNdc):
  the SHORTER side spans [-1, 1]; pixel j center x_ndc = (W - 2j - 1)/S_min,
  point x_ndc = (W - 2u)/S_min (and likewise for y with H).
- rasterize_points naive loop (csrc/rasterize_points/rasterize_points_cpu.cpp):
  skip points with z < 0; a pixel is covered when the squared NDC distance to
  the pixel center is < radius^2; keep the K nearest by view z (ascending),
  ties resolved by point order (insertion sort with strict <).
- PointsRenderer.forward: weights = 1 - dist2/radius^2 (dist2 in NDC units).
- AlphaCompositor (csrc/compositing/alpha_composite.cpp): front-to-back
  alpha blending out = sum_k w_k * prod_{j<k} (1 - w_j) * color_k.

Uses torch + a conservative candidate expansion (full square window, strictly
larger than any reachable footprint) + lexicographic sort, mechanics disjoint
from the JAX implementation's chunked/packed-key paths.
"""

from __future__ import annotations

import numpy as np
import torch


def rasterize_composite_torch(
    points: torch.Tensor,  # (N, 3) world, RDF
    colors: torch.Tensor,  # (N, C)
    w2c: torch.Tensor,  # (4, 4) world->camera, RDF
    intrinsics: torch.Tensor,  # (3, 3) [[fx,0,cx],[0,fy,cy],[0,0,1]]
    height: int,
    width: int,
    radius_ndc: float = 0.01,
    points_per_pixel: int = 10,
) -> torch.Tensor:
    """Returns the (H, W, C) alpha-composited image (background = 0)."""
    points = points.double()
    w2c = w2c.double()
    K = intrinsics.double()
    s_min = float(min(height, width))

    cam = points @ w2c[:3, :3].T + w2c[:3, 3]
    x, y, z = cam[:, 0], cam[:, 1], cam[:, 2]
    visible = z > 0  # naive rasterizer's `if (pz < 0) continue`
    zs = torch.where(visible, z, torch.ones_like(z))
    u = K[0, 0] * x / zs + K[0, 2]
    v = K[1, 1] * y / zs + K[1, 2]
    x_ndc = (width - 2.0 * u) / s_min
    y_ndc = (height - 2.0 * v) / s_min

    # conservative candidate window in pixels around the containing pixel:
    # radius_ndc covers radius_px = radius_ndc * s_min / 2 pixels; the window
    # half-width ceil(radius_px) + 1 strictly contains every coverable pixel
    radius_px = radius_ndc * s_min / 2.0
    halfw = int(np.ceil(radius_px)) + 1
    offs = torch.arange(-halfw, halfw + 1)
    oy, ox = torch.meshgrid(offs, offs, indexing="ij")
    oy = oy.reshape(-1)
    ox = ox.reshape(-1)
    f2 = oy.numel()

    pj = torch.floor(u).long()[:, None] + ox[None, :]  # (N, F2) pixel col
    pi = torch.floor(v).long()[:, None] + oy[None, :]  # (N, F2) pixel row
    in_bounds = (pj >= 0) & (pj < width) & (pi >= 0) & (pi < height)

    # pixel centers in NDC; squared NDC distance to the point
    cx_ndc = (width - 2.0 * pj.double() - 1.0) / s_min
    cy_ndc = (height - 2.0 * pi.double() - 1.0) / s_min
    d2 = (cx_ndc - x_ndc[:, None]) ** 2 + (cy_ndc - y_ndc[:, None]) ** 2
    covered = in_bounds & (d2 < radius_ndc**2) & visible[:, None]

    # flatten candidates; K-nearest-by-z per pixel via lexicographic sort
    idx_pt = torch.arange(len(points))[:, None].expand(-1, f2)
    flat_ok = covered.reshape(-1)
    pix = (pi * width + pj).reshape(-1)[flat_ok]
    cz = z[:, None].expand(-1, f2).reshape(-1)[flat_ok]
    cd2 = d2.reshape(-1)[flat_ok]
    cpt = idx_pt.reshape(-1)[flat_ok]

    # np.lexsort: last key is primary -> order by (pixel, z, point index)
    order = torch.from_numpy(
        np.lexsort((cpt.numpy(), cz.numpy(), pix.numpy()))
    )
    pix, cz, cd2, cpt = pix[order], cz[order], cd2[order], cpt[order]

    # rank within pixel group
    n_cand = pix.numel()
    img = torch.zeros(height * width, colors.shape[1], dtype=torch.double)
    if n_cand == 0:
        return img.reshape(height, width, -1)
    first = torch.ones(n_cand, dtype=torch.bool)
    first[1:] = pix[1:] != pix[:-1]
    group_start = torch.cumsum(first.long(), 0) - 1
    start_pos = torch.nonzero(first).reshape(-1)
    rank = torch.arange(n_cand) - start_pos[group_start]
    keep = rank < points_per_pixel
    pix, cd2, cpt, rank = pix[keep], cd2[keep], cpt[keep], rank[keep]

    # alpha composite front-to-back per pixel
    w = 1.0 - cd2 / (radius_ndc**2)
    cols = colors.double()[cpt]  # (M, C)
    # transmittance: prod over earlier ranks in the same pixel
    log1mw = torch.log(torch.clamp(1.0 - w, min=1e-12))
    csum = torch.cumsum(log1mw, 0)
    first_k = torch.ones(pix.numel(), dtype=torch.bool)
    first_k[1:] = pix[1:] != pix[:-1]
    seg_base = torch.where(first_k, csum - log1mw, torch.zeros_like(csum))
    # cumulative within segment: csum - csum_at_segment_start + base handling
    start_idx = torch.nonzero(first_k).reshape(-1)
    seg_id = torch.cumsum(first_k.long(), 0) - 1
    csum_before = csum - log1mw  # cumulative up to (excluding) current
    seg_start_csum = csum_before[start_idx][seg_id]
    transmit = torch.exp(csum_before - seg_start_csum)
    contrib = (w * transmit)[:, None] * cols
    img.index_add_(0, pix, contrib)
    return img.reshape(height, width, -1)
