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
