"""Synthetic multiview datagen (habitat-sim analog) tests.

Reference semantics: multiview_habitat_sim_generator.py:121-350 — view sets
must be covisibility-filtered RGB-D observations with consistent RDF
camera geometry."""

import numpy as np
import pytest

from viewcrafter_tpu.data.synth_multiview import (
    SceneConfig,
    SyntheticMultiviewGenerator,
    build_scene,
    camera_intrinsics_from_hfov,
    look_at_rdf,
    pointcloud_overlap,
)

TINY = SceneConfig(floor_points=8000, n_primitives=4, primitive_points=1500, wall_points=6000)


def make_gen(**kw):
    kw.setdefault("resolution", (48, 64))
    kw.setdefault("scene_cfg", TINY)
    kw.setdefault("minimum_covisibility", 0.2)
    kw.setdefault("minimum_valid_fraction", 0.45)
    kw.setdefault("distance_threshold", 0.15)
    kw.setdefault("scenes_pool", 2)
    kw.setdefault("splat_px", 5.0)
    return SyntheticMultiviewGenerator(**kw)


def test_intrinsics_hfov():
    K = camera_intrinsics_from_hfov(240, 320, 90.0)
    assert np.isclose(K[0, 0], 160.0)  # f = (W/2)/tan(45°)
    assert np.isclose(K[0, 2], 160.0) and np.isclose(K[1, 2], 120.0)
    assert np.isclose(K[0, 0], K[1, 1])  # square pixels


def test_look_at_rdf_points_camera_z_at_target():
    eye = np.array([1.0, -1.5, 2.0])
    center = np.array([0.0, -0.5, 0.0])
    R = look_at_rdf(eye, center)
    fwd = (center - eye) / np.linalg.norm(center - eye)
    assert np.allclose(R[:, 2], fwd, atol=1e-9)  # +Z column = view direction
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-9)
    assert np.linalg.det(R) > 0.99


def test_pointcloud_overlap_counts():
    a = np.zeros((10, 3))
    b = np.zeros((5, 3)) + np.array([0.0, 0.0, 0.04])
    i1, i2 = pointcloud_overlap(a, b, threshold=0.05)
    assert (i1, i2) == (10, 5)
    i1, i2 = pointcloud_overlap(a, b + 1.0, threshold=0.05)
    assert (i1, i2) == (0, 0)


def test_build_scene_bounds():
    pts, cols = build_scene(np.random.default_rng(0), TINY)
    assert pts.shape[1] == 3 and cols.shape == pts.shape
    assert cols.min() >= 0.0 and cols.max() <= 1.0
    assert pts[:, 1].min() >= -TINY.wall_height - 1.0  # nothing above the walls
    assert pts[:, 1].max() <= 0.5  # world +Y is down; floor near y=0


def test_render_viewpoint_geometry_roundtrip():
    """Depth unprojection must land back on scene points (validates the
    RDF pose/intrinsics plumbing through the rasterizer)."""
    g = make_gen()
    rng = np.random.default_rng(3)
    pos, rot = g.sample_random_viewpoint(rng)
    obs = g.render_viewpoint(0, pos, rot)
    assert obs["img"].shape == (48, 64, 3) and obs["img"].dtype == np.uint8
    assert obs["depthmap"].shape == (48, 64)
    assert (obs["depthmap"][obs["valid"]] > 0).all()
    pc = g._unproject(obs)
    pts, _ = g._scene(0)
    i1, _ = pointcloud_overlap(pc, pts, threshold=0.2)
    assert i1 / max(len(pc), 1) > 0.8  # most unprojected pixels near the cloud


def test_getitem_covisible_pair():
    g = make_gen(views_count=2, size=4, seed=1)
    views = g[0]
    assert len(views) == 2
    v0, v1 = views
    for v in views:
        assert v["camera_pose"].shape == (4, 4)
        R = v["camera_pose"][:3, :3]
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert v1["covisibility"] >= g.minimum_covisibility
    # the two cameras are genuinely different viewpoints
    assert np.linalg.norm(v0["camera_pose"][:3, 3] - v1["camera_pose"][:3, 3]) > 1e-3


def test_as_croco_pairs_format():
    g = make_gen(views_count=2, size=2, seed=5)
    v1, v2 = g.as_croco_pairs(0)
    for v in (v1, v2):
        assert v["img"].dtype == np.float32
        assert v["img"].min() >= -1.0 and v["img"].max() <= 1.0
        assert v["camera_intrinsics"].shape == (3, 3)
