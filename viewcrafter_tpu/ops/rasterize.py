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
within each pixel come from K shifted comparisons; a flat scatter writes the K slots.
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


def _footprint_width(radius_px: float) -> int:
    """Pixels per axis a splat can touch. A pixel center c = px + 0.5 is hit
    iff |c - u| < r, i.e. px in the OPEN interval (u-r-0.5, u+r-0.5) of length
    2r — at most floor(2r)+1 integers. (The old centered (2F+1)^2 window was
    25 candidates at the pipeline's r=1.44 px; this tight window is 9.)"""
    return int(2.0 * radius_px) + 1


def _splat_candidates(u, v, z, visible, radius_px, height, width):
    """Per-point candidate pixels: the tight W x W window anchored at
    ceil(u - r - 0.5) (first pixel whose center can be in range; a boundary
    pixel included spuriously is re-filtered by the dist < r mask).
    Returns (valid, py, px, dist2) with shapes (N, W^2)."""
    w_fp = _footprint_width(radius_px)
    offs = jnp.arange(w_fp)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    base_u = jnp.ceil(u - radius_px - 0.5).astype(jnp.int32)
    base_v = jnp.ceil(v - radius_px - 0.5).astype(jnp.int32)
    px = base_u[:, None] + ox.reshape(-1)[None, :]
    py = base_v[:, None] + oy.reshape(-1)[None, :]
    du = (px.astype(jnp.float32) + 0.5) - u[:, None]
    dv = (py.astype(jnp.float32) + 0.5) - v[:, None]
    dist2 = du * du + dv * dv
    in_bounds = (px >= 0) & (px < width) & (py >= 0) & (py < height)
    valid = in_bounds & (dist2 < radius_px * radius_px) & visible[:, None]
    return valid, py, px, dist2


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "radius_ndc", "points_per_pixel", "znear", "z_order"),
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
    point_mask: Optional[jnp.ndarray] = None,  # (N,) bool; False = ignore
    z_order: str = "exact",
) -> jnp.ndarray:
    """Render one view -> (H, W, C) alpha-composited image (holes = 0).

    point_mask lets callers PAD the cloud to a bucketed size: the sort
    network's compile time is minutes at millions of candidates, so
    `render_trajectory(..., bucket=...)` rounds N up and masks the tail —
    one compile per bucket instead of one per scene."""
    n, c = colors.shape
    k = points_per_pixel
    hw = height * width
    # PyTorch3D square-NDC: the shorter image side spans [-1, 1]
    radius_px = radius_ndc * min(height, width) / 2.0

    valid, py, px, z, dist2 = _project_candidates(
        points, colors, w2c, intrinsics, height, width, radius_px, znear, point_mask)
    z_k, w_k, c_k = _candidates_to_kbuffer(
        valid, py, px, z, dist2, colors, radius_px, height, width, k, z_order)
    return _composite(w_k, c_k, height, width, c)


_ZQ_BITS = 13  # packed-key z quantization (VERDICT r2 #4 / ROADMAP packed sort)


def _candidates_to_kbuffer(valid, py, px, z, dist2, colors, radius_px,
                           height, width, k, z_order: str = "exact"):
    """Candidate splats -> per-pixel K-nearest buffers (z/weight/color),
    z-sorted with inf/0 padding in empty slots.

    z_order:
      - "exact": two argsorts (near-to-far, then stable pixel grouping) —
        exact PyTorch3D semantics incl. tie-breaks.
      - "packed": ONE argsort of pix_id * 2^13 + 13-bit-quantized z. Halves
        the dominant sort cost. Approximation: two same-pixel candidates
        whose z's land in the same linear bucket (bucket = z-range/8190) may
        composite in candidate order instead of strict z order —
        bounded-error, validated in tests/test_rasterize.py and vs the
        independent torch oracle in tests/test_rasterize_oracle.py.
      - "auto": packed when the key fits int32 (hw * 2^13 < 2^31), else exact.
    """
    n, f2 = valid.shape
    c = colors.shape[1]
    hw = height * width
    pix_id = jnp.where(valid, py * width + px, hw).reshape(-1)  # sentinel = hw
    cand_z = jnp.where(valid, z[:, None], jnp.inf).reshape(-1)
    weight = jnp.clip(1.0 - dist2 / (radius_px * radius_px), 0.0, 1.0).reshape(-1)
    point_idx = jnp.broadcast_to(jnp.arange(n)[:, None], (n, f2)).reshape(-1)

    if z_order == "auto":
        z_order = "packed" if (hw + 1) << _ZQ_BITS < 2**31 else "exact"

    if z_order == "packed":
        # one stable sort on (pixel, quantized-z) packed into an int32.
        # z is linearly quantized to 13 bits over the candidate set's
        # [zmin, zmax] — absolute resolution (zmax-zmin)/8190, so only
        # near-coincident same-pixel splats can swap composite order (a
        # ~140x finer bucket than the float-bit truncation this replaces).
        # Stable argsort breaks quantized-z ties by candidate id — the same
        # tie-break as "exact". Invalid candidates get the maximal bucket.
        finite = jnp.isfinite(cand_z)
        zmin = jnp.min(jnp.where(finite, cand_z, jnp.inf))
        zmax = jnp.max(jnp.where(finite, cand_z, -jnp.inf))
        scale = (2.0**_ZQ_BITS - 2.0) / jnp.maximum(zmax - zmin, 1e-20)
        zq = jnp.clip((cand_z - zmin) * scale, 0.0, 2.0**_ZQ_BITS - 2.0)
        zq = jnp.where(finite, zq.astype(jnp.int32), 2**_ZQ_BITS - 1)
        key = pix_id << _ZQ_BITS | zq
        order = jnp.argsort(key, stable=True)
    else:
        # order near-to-far, then group by pixel (stable keeps depth order).
        # NOTE: a single two-key lax.sort((pix, z_bits, idx), num_keys=2) is
        # semantically identical but its variadic comparator makes XLA:TPU
        # compile time explode (>30 min at 3.6M candidates, measured) — the
        # two default argsorts lower through the fast sort expansion instead.
        order_z = jnp.argsort(cand_z)
        pix_sorted = pix_id[order_z]
        order_pix = jnp.argsort(pix_sorted, stable=True)
        order = order_z[order_pix]
    pix_final = pix_id[order]
    # rank within pixel via K shifted comparisons: with pix_final sorted,
    # an element of true rank r < K has exactly r same-pixel entries among
    # its K predecessors (the window sum saturates at K for deeper ranks,
    # which are discarded anyway). Pure vector shifts — no gathers.
    # NOTE: lax.associative_scan here costs 6+ MINUTES of XLA:TPU compile
    # time at 2.6M elements (measured) and searchsorted's binary search is
    # gather-bound — don't "optimize" this again.
    rank = jnp.zeros(pix_final.shape, jnp.int32)
    for j in range(1, min(k, pix_final.shape[0] - 1) + 1):
        same = jnp.concatenate(
            [jnp.zeros((j,), jnp.bool_), pix_final[j:] == pix_final[:-j]]
        )
        rank = rank + same.astype(jnp.int32)

    keep = (rank < k) & (pix_final < hw)
    flat = jnp.where(keep, pix_final * k + rank, hw * k)

    z_buf = jnp.full((hw * k + 1,), jnp.inf).at[flat].set(cand_z[order], mode="drop")
    w_buf = jnp.zeros((hw * k + 1,), jnp.float32).at[flat].set(weight[order], mode="drop")
    col_sorted = colors[point_idx[order]].astype(jnp.float32)
    c_buf = jnp.zeros((hw * k + 1, c), jnp.float32).at[flat].set(col_sorted, mode="drop")
    return (z_buf[:-1].reshape(hw, k), w_buf[:-1].reshape(hw, k),
            c_buf[:-1].reshape(hw, k, c))


def _composite(w_k, c_k, height, width, c):
    # front-to-back over-compositing with exclusive transmittance
    trans = jnp.cumprod(1.0 - w_k, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
    img = jnp.sum(w_k[..., None] * trans[..., None] * c_k, axis=1)
    return img.reshape(height, width, c)


def _project_candidates(points, colors_unused, w2c, intrinsics, height, width,
                        radius_px, znear, point_mask):
    cam = geotrf(w2c, points[None])[0]
    z = cam[:, 2]
    safe_z = jnp.where(jnp.abs(z) < znear, znear, z)
    u = intrinsics[0, 0] * cam[:, 0] / safe_z + intrinsics[0, 2]
    v = intrinsics[1, 1] * cam[:, 1] / safe_z + intrinsics[1, 2]
    visible = z > znear
    if point_mask is not None:
        visible = visible & point_mask
    valid, py, px, dist2 = _splat_candidates(u, v, z, visible, radius_px, height, width)
    return valid, py, px, z, dist2


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "radius_ndc", "points_per_pixel",
                     "znear", "chunk", "z_order"),
)
def rasterize_points_chunked(
    points: jnp.ndarray,
    colors: jnp.ndarray,
    w2c: jnp.ndarray,
    intrinsics: jnp.ndarray,
    height: int,
    width: int,
    radius_ndc: float = 0.01,
    points_per_pixel: int = 10,
    znear: float = 1e-4,
    point_mask: Optional[jnp.ndarray] = None,
    chunk: int = 65536,
    z_order: str = "exact",
) -> jnp.ndarray:
    """`rasterize_points`, but the points stream through a lax.scan in
    fixed-size chunks whose per-pixel K-buffers are merged exactly.

    Why: the monolithic sort's bitonic network over millions of candidates
    costs >30 min of XLA:TPU compile time; a 65k-point chunk (590k
    candidates) compiles in ~2 min, the scan reuses ONE such network for any
    cloud size, and the (hw, 2K) merge sorts are trivial. The merge is
    exact — a pixel's global K nearest lie in the union of its per-chunk K
    nearest, and stable z-ordering with carry-first concatenation preserves
    the monolithic tie-break (earlier chunk = lower candidate id wins)."""
    n = points.shape[0]
    c = colors.shape[1]
    k = points_per_pixel
    hw = height * width
    radius_px = radius_ndc * min(height, width) / 2.0

    if n <= chunk:
        valid, py, px, z, dist2 = _project_candidates(
            points, colors, w2c, intrinsics, height, width, radius_px, znear,
            point_mask)
        z_k, w_k, c_k = _candidates_to_kbuffer(
            valid, py, px, z, dist2, colors, radius_px, height, width, k, z_order)
        return _composite(w_k, c_k, height, width, c)

    nch = -(-n // chunk)
    pad = nch * chunk - n
    mask = point_mask if point_mask is not None else jnp.ones((n,), jnp.bool_)
    if pad:
        points = jnp.concatenate([points, jnp.zeros((pad, 3), points.dtype)])
        colors = jnp.concatenate([colors, jnp.zeros((pad, c), colors.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), jnp.bool_)])
    pts_ch = points.reshape(nch, chunk, 3)
    col_ch = colors.reshape(nch, chunk, c)
    msk_ch = mask.reshape(nch, chunk)

    def step(carry, xs):
        z_c, w_c, col_c = carry
        p, col, m = xs
        valid, py, px, z, dist2 = _project_candidates(
            p, col, w2c, intrinsics, height, width, radius_px, znear, m)
        z_n, w_n, col_n = _candidates_to_kbuffer(
            valid, py, px, z, dist2, col, radius_px, height, width, k, z_order)
        z_cat = jnp.concatenate([z_c, z_n], axis=-1)  # carry first: tie-break
        w_cat = jnp.concatenate([w_c, w_n], axis=-1)
        col_cat = jnp.concatenate([col_c, col_n], axis=-2)
        order = jnp.argsort(z_cat, axis=-1, stable=True)[:, :k]
        z_m = jnp.take_along_axis(z_cat, order, axis=-1)
        w_m = jnp.take_along_axis(w_cat, order, axis=-1)
        col_m = jnp.take_along_axis(col_cat, order[..., None], axis=-2)
        return (z_m, w_m, col_m), None

    init = (jnp.full((hw, k), jnp.inf), jnp.zeros((hw, k), jnp.float32),
            jnp.zeros((hw, k, c), jnp.float32))
    (z_k, w_k, c_k), _ = jax.lax.scan(step, init, (pts_ch, col_ch, msk_ch))
    return _composite(w_k, c_k, height, width, c)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "radius_ndc", "points_per_pixel", "znear")
)
def rasterize_points_scatter(
    points: jnp.ndarray,
    colors: jnp.ndarray,
    w2c: jnp.ndarray,
    intrinsics: jnp.ndarray,
    height: int,
    width: int,
    radius_ndc: float = 0.01,
    points_per_pixel: int = 10,
    znear: float = 1e-4,
    point_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sort-free variant of `rasterize_points` (identical semantics).

    K rounds of scatter-min tournaments pick each pixel's next-nearest
    candidate (ties broken by candidate index, like the stable sort). The
    sort path's bitonic network costs MINUTES of XLA:TPU compile time at
    millions of candidates; these K linear scatter/gather passes compile in
    seconds and stream at HBM bandwidth."""
    n, c = colors.shape
    k = points_per_pixel
    hw = height * width
    radius_px = radius_ndc * min(height, width) / 2.0

    valid, py, px, z, dist2 = _project_candidates(
        points, colors, w2c, intrinsics, height, width, radius_px, znear, point_mask)
    f2 = valid.shape[1]
    m = n * f2
    pix_id = jnp.where(valid, py * width + px, hw).reshape(-1)
    cand_z = jnp.where(valid, z[:, None], jnp.inf).reshape(-1)
    weight = jnp.clip(1.0 - dist2 / (radius_px * radius_px), 0.0, 1.0).reshape(-1)
    point_idx = jnp.broadcast_to(jnp.arange(n)[:, None], (n, f2)).reshape(-1)
    cand_ids = jnp.arange(m, dtype=jnp.int32)

    def round_fn(carry, _):
        used = carry
        z_key = jnp.where(used, jnp.inf, cand_z)
        best_z = jnp.full((hw + 1,), jnp.inf).at[pix_id].min(z_key)
        is_best = (z_key == best_z[pix_id]) & jnp.isfinite(z_key)
        # deterministic tie-break: lowest candidate id wins (== stable sort)
        best_id = jnp.full((hw + 1,), m, jnp.int32).at[
            jnp.where(is_best, pix_id, hw)].min(cand_ids)
        win = is_best & (cand_ids == best_id[pix_id])
        slot_pix = jnp.where(win, pix_id, hw)
        w_slot = jnp.zeros((hw + 1,), jnp.float32).at[slot_pix].max(
            jnp.where(win, weight, 0.0))
        cid = jnp.zeros((hw + 1,), jnp.int32).at[slot_pix].max(
            jnp.where(win, point_idx, 0))
        has = jnp.zeros((hw + 1,), jnp.bool_).at[slot_pix].max(win)
        return used | win, (w_slot[:-1], cid[:-1], has[:-1])

    _, (w_k, cid_k, has_k) = jax.lax.scan(
        round_fn, jnp.zeros((m,), jnp.bool_), None, length=k)
    # (k, hw) -> (hw, k)
    w_k = jnp.where(has_k, w_k, 0.0).T
    c_k = jnp.where(has_k[..., None], colors.astype(jnp.float32)[cid_k], 0.0)
    c_k = jnp.moveaxis(c_k, 0, 1)  # (hw, k, c)
    trans = jnp.cumprod(1.0 - w_k, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
    img = jnp.sum(w_k[..., None] * trans[..., None] * c_k, axis=1)
    return img.reshape(height, width, c)


def bucket_size(n: int, quantum: int = 65536) -> int:
    """Round n up to the bucket quantum (compile-once-per-bucket)."""
    return max(quantum, -(-n // quantum) * quantum)


def render_trajectory(
    points: jnp.ndarray,  # (N, 3)
    colors: jnp.ndarray,  # (N, C)
    w2cs: jnp.ndarray,  # (V, 4, 4)
    intrinsics: jnp.ndarray,  # (V, 3, 3) or (3, 3)
    height: int,
    width: int,
    radius_ndc: float = 0.01,
    points_per_pixel: int = 10,
    bucket: Optional[int] = 65536,
    z_order: str = "auto",
) -> jnp.ndarray:
    """Render V views sequentially (lax.map bounds memory to one view's
    candidates) -> (V, H, W, C).

    bucket: pad the cloud to a multiple of this many points (masked out of
    the render) so different scenes reuse one compiled program per bucket;
    None disables padding."""
    if intrinsics.ndim == 2:
        intrinsics = jnp.broadcast_to(intrinsics, (w2cs.shape[0], 3, 3))

    n = points.shape[0]
    mask = None
    if bucket is not None and n % bucket != 0:
        m = bucket_size(n, bucket)
        pad = m - n
        if pad:
            points = jnp.concatenate(
                [points, jnp.zeros((pad, 3), points.dtype)], axis=0)
            colors = jnp.concatenate(
                [colors, jnp.zeros((pad, colors.shape[1]), colors.dtype)], axis=0)
            mask = jnp.arange(m) < n

    def one(args):
        w2c, K = args
        return rasterize_points_chunked(
            points, colors, w2c, K, height, width,
            radius_ndc=radius_ndc, points_per_pixel=points_per_pixel,
            point_mask=mask, z_order=z_order,
        )

    return jax.lax.map(one, (w2cs, intrinsics))
