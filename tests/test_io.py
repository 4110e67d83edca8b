import os

import numpy as np
from PIL import Image

from viewcrafter_tpu.utils import io as vio


def test_native_ply_writer_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    cols = rng.uniform(size=(500, 3)).astype(np.float32)

    from viewcrafter_tpu import native

    native_path = str(tmp_path / "native.ply")
    ok = native.write_ply(native_path, pts, vio.to_uint8(cols))
    assert ok, "native PLY writer failed to build/run"

    with open(native_path) as f:
        lines = f.read().strip().split("\n")
    assert lines[0] == "ply"
    assert f"element vertex {len(pts)}" in lines[2]
    assert lines[-1].split()[-3:] == [str(c) for c in vio.to_uint8(cols)[-1]]
    # xyz round-trips within %.6g formatting
    first = [float(v) for v in lines[13].split()[:3]]
    np.testing.assert_allclose(first, pts[0], rtol=1e-5)


def test_save_pointcloud_ply_api(tmp_path):
    pts = np.zeros((10, 3), np.float32)
    cols = np.ones((10, 3), np.float32)
    p = str(tmp_path / "cloud.ply")
    vio.save_pointcloud_ply(pts, cols, p)
    assert os.path.exists(p)
    content = open(p).read()
    assert content.count("\n") == 13 + 10  # header + points


def test_load_images_shapes(tmp_path):
    img = Image.fromarray(np.zeros((300, 500, 3), np.uint8))
    path = str(tmp_path / "a.png")
    img.save(path)
    out = vio.load_images(path, size=64, target_hw=(96, 160))
    assert len(out) == 1
    assert out[0].img_ori.shape == (96, 160, 3)
    h, w = out[0].img.shape[:2]
    assert h % 16 == 0 and w % 16 == 0
    assert max(h, w) <= 64
    assert out[0].img.min() >= -1.0 and out[0].img.max() <= 1.0


def test_save_video_fallback(tmp_path):
    frames = np.zeros((3, 16, 16, 3), np.float32)
    out = vio.save_video(frames, str(tmp_path / "v.mp4"))
    assert os.path.exists(out)


def test_to_uint8_ranges():
    np.testing.assert_array_equal(vio.to_uint8(np.array([[-1.0, 0.0, 1.0]])), [[0, 128, 255]])
    np.testing.assert_array_equal(vio.to_uint8(np.array([[0.0, 0.5, 1.0]])), [[0, 128, 255]])


def test_sceneviz_ply(tmp_path):
    """SceneViz analog: point cloud + camera frustums into one mesh-PLY."""
    import numpy as np

    from viewcrafter_tpu.utils.viz import SceneViz, auto_cam_size, save_scene_ply

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(3)])
    poses[1, 0, 3] = 1.0
    poses[2, 0, 3] = 2.0

    path = str(tmp_path / "scene.ply")
    out = save_scene_ply(path, pts, cols, poses, focals=[900.0] * 3,
                         imsizes=[(1024, 576)] * 3)
    text = open(out).read()
    # 100 points + 3 cameras x 5 vertices; 3 cameras x 6 faces
    assert "element vertex 115" in text
    assert "element face 18" in text
    assert auto_cam_size(poses) == max(1e-3, 0.1 * 2.0)

    # mask filters points; faces reference valid vertex ids
    v = SceneViz().add_pointcloud(pts, (255, 0, 0), mask=pts[:, 0] > 0)
    v.add_camera(poses[0])
    p2 = v.save_ply(str(tmp_path / "scene2.ply"))
    lines = open(p2).read().splitlines()
    nv = int([l for l in lines if l.startswith("element vertex")][0].split()[-1])
    faces = [l for l in lines if l.startswith("3 ")]
    assert all(int(tok) < nv for f in faces for tok in f.split()[1:])


def test_segment_sky_golden():
    """Our segment_sky matches the reference pixel-for-pixel
    (extern/dust3r/dust3r/viz.py:284-320) on a synthetic sky scene."""
    import os
    import sys

    import pytest

    pytest.importorskip("torch")
    REF = "/root/reference"
    if not os.path.isdir(os.path.join(REF, "extern/dust3r")):
        pytest.skip("reference tree absent")
    # dust3r.viz transitively needs torchvision (absent here); execute just
    # the reference segment_sky function source instead of importing the module
    import ast

    import torch

    src = open(os.path.join(REF, "extern/dust3r/dust3r/viz.py")).read()
    tree = ast.parse(src)
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == "segment_sky")
    ns = {"np": np, "torch": torch, "to_numpy": np.asarray}
    exec(compile(ast.Module([fn], []), "ref_viz", "exec"), ns)
    ref_segment_sky = ns["segment_sky"]

    from viewcrafter_tpu.utils.viz import segment_sky

    rng = np.random.default_rng(0)
    h, w = 96, 128
    img = np.zeros((h, w, 3), np.float32)
    # luminous gray sky with a gradient + textured "ground" below
    img[: h // 2] = np.linspace(0.75, 0.95, h // 2)[:, None, None]
    img[h // 2:] = rng.uniform(0.0, 0.5, (h - h // 2, w, 3))
    # a blue patch (the reference's BGR2HSV quirk applies to both)
    img[10:30, 40:80] = (0.9, 0.5, 0.2)

    ours = segment_sky(img)
    ref = np.asarray(ref_segment_sky(img))
    assert ours.dtype == bool and ours.shape == (h, w)
    assert ours.sum() > 0  # the sky region is detected at all
    np.testing.assert_array_equal(ours, ref)
