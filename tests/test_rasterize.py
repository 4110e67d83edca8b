import jax.numpy as jnp
import numpy as np

from viewcrafter_tpu.ops.rasterize import rasterize_points, render_trajectory

H, W = 16, 24
K_INTR = jnp.asarray([[20.0, 0, 12.0], [0, 20.0, 8.0], [0, 0, 1.0]])
EYE = jnp.eye(4)


def numpy_reference(points, colors, w2c, K, h, w, radius_ndc=0.01, ppp=10):
    """Brute-force per-pixel oracle with PyTorch3D semantics."""
    points = np.asarray(points)
    colors = np.asarray(colors)
    Km = np.asarray(K)
    cam = (np.asarray(w2c)[:3, :3] @ points.T).T + np.asarray(w2c)[:3, 3]
    r_px = radius_ndc * min(h, w) / 2
    out = np.zeros((h, w, colors.shape[1]))
    for py in range(h):
        for px in range(w):
            cands = []
            for i in range(len(points)):
                z = cam[i, 2]
                if z <= 1e-4:
                    continue
                u = Km[0, 0] * cam[i, 0] / z + Km[0, 2]
                v = Km[1, 1] * cam[i, 1] / z + Km[1, 2]
                d2 = (u - (px + 0.5)) ** 2 + (v - (py + 0.5)) ** 2
                if d2 < r_px * r_px:
                    cands.append((z, 1 - d2 / (r_px * r_px), colors[i]))
            cands.sort(key=lambda t: t[0])
            t_acc = 1.0
            acc = np.zeros(colors.shape[1])
            for z, wgt, col in cands[:ppp]:
                acc += wgt * t_acc * col
                t_acc *= 1 - wgt
            out[py, px] = acc
    return out


def test_single_point_center_splat():
    # point projecting exactly onto pixel center (12, 8) -> weight 1 there
    pt = jnp.asarray([[(12.5 - 12.0) / 20.0 * 2.0, (8.5 - 8.0) / 20.0 * 2.0, 2.0]])
    col = jnp.asarray([[1.0, 0.5, 0.25]])
    img = rasterize_points(pt, col, EYE, K_INTR, H, W, radius_ndc=0.1)
    np.testing.assert_allclose(np.asarray(img[8, 12]), [1.0, 0.5, 0.25], atol=1e-5)
    # hole elsewhere far away
    np.testing.assert_allclose(np.asarray(img[0, 0]), 0.0, atol=1e-7)


def test_occlusion_front_point_wins():
    # two points on the same ray; the near one lands exactly on the pixel
    # center (weight 1), fully occluding the far one
    pts = jnp.asarray([[0.0125, 0.0125, 0.5], [0.05, 0.05, 2.0]])
    cols = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    img = rasterize_points(pts, cols, EYE, K_INTR, H, W, radius_ndc=0.1)
    np.testing.assert_allclose(np.asarray(img[8, 12]), [1.0, 0.0, 0.0], atol=1e-5)


def test_behind_camera_culled():
    pts = jnp.asarray([[0.0, 0.0, -1.0]])
    cols = jnp.asarray([[1.0, 1.0, 1.0]])
    img = rasterize_points(pts, cols, EYE, K_INTR, H, W, radius_ndc=0.5)
    np.testing.assert_allclose(np.asarray(img), 0.0, atol=1e-7)


def test_matches_numpy_oracle_random_cloud():
    rng = np.random.default_rng(0)
    n = 300
    pts = rng.normal(size=(n, 3)) * np.array([0.4, 0.3, 0.2]) + np.array([0, 0, 2.0])
    cols = rng.uniform(size=(n, 3))
    img = rasterize_points(
        jnp.asarray(pts, jnp.float32), jnp.asarray(cols, jnp.float32),
        EYE, K_INTR, H, W, radius_ndc=0.05,
    )
    expect = numpy_reference(pts, cols, np.eye(4), K_INTR, H, W, radius_ndc=0.05)
    np.testing.assert_allclose(np.asarray(img), expect, atol=2e-4)


def test_k_budget_truncates_to_nearest():
    # 15 coincident points; only the nearest 10 may contribute
    zs = np.linspace(1.0, 2.0, 15)
    pts = np.stack([np.full(15, 0.0125), np.full(15, 0.0125) * (zs / 0.5), zs], -1)
    # place all on the center pixel ray: x/z = const requires scaling
    pts = np.stack([0.025 * zs, 0.025 * zs, zs], -1)
    cols = np.ones((15, 1))
    img = rasterize_points(
        jnp.asarray(pts, jnp.float32), jnp.asarray(cols, jnp.float32),
        EYE, K_INTR, H, W, radius_ndc=0.05, points_per_pixel=10,
    )
    expect = numpy_reference(pts, cols, np.eye(4), K_INTR, H, W, radius_ndc=0.05, ppp=10)
    np.testing.assert_allclose(np.asarray(img), expect, atol=2e-4)


def test_render_trajectory_batches_views():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.normal(size=(100, 3)) * 0.3 + np.array([0, 0, 2.0]), jnp.float32)
    cols = jnp.asarray(rng.uniform(size=(100, 3)), jnp.float32)
    w2cs = jnp.stack([EYE, EYE.at[0, 3].set(0.1)])
    imgs = render_trajectory(pts, cols, w2cs, K_INTR, H, W, radius_ndc=0.05,
                             z_order="exact")
    assert imgs.shape == (2, H, W, 3)
    single = rasterize_points(pts, cols, w2cs[1], K_INTR, H, W, radius_ndc=0.05)
    np.testing.assert_allclose(np.asarray(imgs[1]), np.asarray(single), atol=1e-6)


def test_packed_z_order_bounded_error():
    """The packed-key single-sort path ("auto"/"packed", the trajectory
    default) only reorders same-pixel candidates whose z agree to ~3%; the
    composited image error stays small and most pixels are bit-identical."""
    rng = np.random.default_rng(3)
    n = 5000
    pts = np.stack([
        rng.uniform(-1, 1, n), rng.uniform(-0.6, 0.6, n), rng.uniform(1.2, 4.0, n),
    ], 1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    K = np.array([[60.0, 0, 32.0], [0, 60.0, 18.0], [0, 0, 1.0]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    exact = np.asarray(rasterize_points(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(w2c), jnp.asarray(K),
        36, 64, z_order="exact"))
    packed = np.asarray(rasterize_points(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(w2c), jnp.asarray(K),
        36, 64, z_order="packed"))
    # identical K-nearest SETS; only intra-pixel order of near-equal z differs
    err = np.abs(packed - exact)
    assert np.mean(err) < 5e-3, np.mean(err)
    assert np.mean(np.all(err < 1e-6, axis=-1)) > 0.9  # >90% of pixels exact


def test_bucketed_render_matches_unbucketed():
    """Padding the cloud to a bucket (with the tail masked) is invisible in
    the output; only the compiled program's shape changes."""
    import numpy as np

    from viewcrafter_tpu.ops.rasterize import bucket_size, render_trajectory

    rng = np.random.default_rng(5)
    n = 777
    pts = np.stack([
        rng.uniform(-1, 1, n), rng.uniform(-0.6, 0.6, n), rng.uniform(1.5, 4.0, n),
    ], 1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    K = np.array([[60.0, 0, 32.0], [0, 60.0, 18.0], [0, 0, 1.0]], np.float32)
    w2cs = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 4, 4))

    img_plain = np.asarray(render_trajectory(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(w2cs), jnp.asarray(K),
        36, 64, bucket=None))
    img_bucket = np.asarray(render_trajectory(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(w2cs), jnp.asarray(K),
        36, 64, bucket=1024))
    np.testing.assert_allclose(img_bucket, img_plain, atol=1e-6)
    assert bucket_size(777, 1024) == 1024
    assert bucket_size(1025, 1024) == 2048
    assert bucket_size(2048, 1024) == 2048


def test_scatter_variant_matches_sort_variant():
    """The K-round scatter-min rasterizer is pixel-identical to the
    sort-based one (same K-nearest selection, same tie-breaks)."""
    import numpy as np

    from viewcrafter_tpu.ops.rasterize import (
        rasterize_points, rasterize_points_scatter,
    )

    rng = np.random.default_rng(7)
    n = 4000
    pts = np.stack([
        rng.uniform(-1, 1, n), rng.uniform(-0.6, 0.6, n), rng.uniform(1.2, 4.0, n),
    ], 1).astype(np.float32)
    # force depth collisions so tie-breaking is actually exercised
    pts[:, 2] = np.round(pts[:, 2] * 50) / 50
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    K = np.array([[60.0, 0, 32.0], [0, 60.0, 18.0], [0, 0, 1.0]], np.float32)
    w2c = np.eye(4, dtype=np.float32)

    a = np.asarray(rasterize_points(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(w2c), jnp.asarray(K), 36, 64))
    b = np.asarray(rasterize_points_scatter(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(w2c), jnp.asarray(K), 36, 64))
    np.testing.assert_allclose(b, a, atol=1e-5)


def test_chunked_matches_monolithic():
    """Chunked sort + K-buffer merge is pixel-identical to the monolithic
    sort, including depth tie-breaks across chunk boundaries."""
    import numpy as np

    from viewcrafter_tpu.ops.rasterize import (
        rasterize_points, rasterize_points_chunked,
    )

    rng = np.random.default_rng(11)
    n = 5000
    pts = np.stack([
        rng.uniform(-1, 1, n), rng.uniform(-0.6, 0.6, n), rng.uniform(1.2, 4.0, n),
    ], 1).astype(np.float32)
    pts[:, 2] = np.round(pts[:, 2] * 50) / 50  # force cross-chunk z ties
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    K = np.array([[60.0, 0, 32.0], [0, 60.0, 18.0], [0, 0, 1.0]], np.float32)
    w2c = np.eye(4, dtype=np.float32)

    a = np.asarray(rasterize_points(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(w2c), jnp.asarray(K), 36, 64))
    b = np.asarray(rasterize_points_chunked(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(w2c), jnp.asarray(K),
        36, 64, chunk=1024))  # 5 chunks, padded tail
    np.testing.assert_allclose(b, a, atol=1e-5)
