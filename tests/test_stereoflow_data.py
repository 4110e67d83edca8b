"""Stereo/flow file-format IO, visualization, and dataset-layout tests.

Golden where the reference is importable (flow color wheel, PFM reader);
round-trip tests for every writer; synthetic directory trees for the
dataset layouts (the real datasets are not present in the sandbox).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
for _p in (REF, f"{REF}/extern/dust3r", f"{REF}/extern/dust3r/croco"):
    if os.path.isdir(_p) and _p not in sys.path:
        sys.path.append(_p)

from viewcrafter_tpu.stereoflow import data as sfd


def _stub_torchvision():
    """The reference stereoflow package imports torchvision (unused on the
    code paths exercised here); stub it when absent."""
    import types

    try:
        from torchvision.transforms import ColorJitter  # noqa: F401
        return
    except ImportError:
        pass
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvf = types.ModuleType("torchvision.transforms.functional")
    tvt.ColorJitter = object
    tvt.functional = tvf
    tv.transforms = tvt
    # a bare non-package `torchvision` module may exist; override it
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt
    sys.modules["torchvision.transforms.functional"] = tvf


def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    disp = rng.standard_normal((7, 11)).astype(np.float32)
    path = str(tmp_path / "x.pfm")
    sfd.write_pfm(path, disp)
    back, scale = sfd.read_pfm(path)
    np.testing.assert_array_equal(back, disp)
    # color variant
    img = rng.standard_normal((5, 4, 3)).astype(np.float32)
    sfd.write_pfm(path, img)
    back, _ = sfd.read_pfm(path)
    np.testing.assert_array_equal(back, img)


def test_pfm_matches_reference_reader(tmp_path):
    torch = pytest.importorskip("torch")  # noqa: F841 (reference file needs it)
    _stub_torchvision()
    from stereoflow.datasets_stereo import _read_pfm

    rng = np.random.default_rng(1)
    disp = np.abs(rng.standard_normal((6, 9))).astype(np.float32)
    path = str(tmp_path / "g.pfm")
    sfd.write_pfm(path, disp)
    ref, ref_scale = _read_pfm(path)
    np.testing.assert_array_equal(ref, disp)


def test_flo_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    flow = rng.standard_normal((8, 6, 2)).astype(np.float32)
    path = str(tmp_path / "x.flo")
    sfd.write_flo(path, flow)
    np.testing.assert_array_equal(sfd.read_flo(path), flow)


def test_kitti_flow_roundtrip(tmp_path):
    pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    flow = (rng.standard_normal((10, 14, 2)) * 20).astype(np.float32)
    path = str(tmp_path / "k.png")
    sfd.write_kitti_flow(path, flow)
    back = sfd.read_kitti_flow(path)
    assert np.isfinite(back).all()
    np.testing.assert_allclose(back, flow, atol=1 / 64.0)


def test_hdf5_disp_flow_roundtrip(tmp_path):
    pytest.importorskip("h5py")
    rng = np.random.default_rng(4)
    disp = np.abs(rng.standard_normal((6, 8))).astype(np.float32)
    p1 = str(tmp_path / "d.dsp5")
    sfd.write_dsp5(p1, disp)
    np.testing.assert_array_equal(sfd.read_hdf5_disp(p1), disp)
    flow = rng.standard_normal((6, 8, 2)).astype(np.float32)
    p2 = str(tmp_path / "f.flo5")
    sfd.write_flo5(p2, flow)
    np.testing.assert_array_equal(sfd.read_hdf5_flow(p2), flow)


def test_png_disp_invalid_is_inf(tmp_path):
    from PIL import Image

    disp16 = np.array([[0, 256], [512, 1024]], np.uint16)
    path = str(tmp_path / "d.png")
    Image.fromarray(disp16).save(path)
    disp = sfd.read_kitti_disp(path)
    assert np.isinf(disp[0, 0])
    np.testing.assert_allclose(disp[0, 1], 1.0)
    np.testing.assert_allclose(disp[1, 1], 4.0)


def test_flow_to_color_golden():
    torch = pytest.importorskip("torch")  # noqa: F841
    _stub_torchvision()
    from stereoflow.datasets_flow import flowToColor

    rng = np.random.default_rng(5)
    flow = (rng.standard_normal((16, 12, 2)) * 5).astype(np.float32)
    ours = sfd.flow_to_color(flow.copy())
    ref = flowToColor(flow.copy())
    # integer truncation at the uint8 boundary can differ by 1
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_vis_disparity_shape():
    pytest.importorskip("cv2")
    disp = np.linspace(1, 50, 24).reshape(4, 6).astype(np.float32)
    vis = sfd.vis_disparity(disp)
    assert vis.shape == (4, 6, 3) and vis.dtype == np.uint8


def _make_kitti15_tree(root):
    from PIL import Image

    rng = np.random.default_rng(6)
    for sub, n in [("training", 3), ("testing", 2)]:
        for cam in ("image_2", "image_3"):
            os.makedirs(os.path.join(root, sub, cam), exist_ok=True)
        os.makedirs(os.path.join(root, "training", "disp_occ_0"), exist_ok=True)
        for i in range(n):
            for cam in ("image_2", "image_3"):
                img = rng.integers(0, 255, (32, 48, 3), np.uint8)
                Image.fromarray(img.astype(np.uint8)).save(
                    os.path.join(root, sub, cam, "%06d_10.png" % i))
            if sub == "training":
                disp = rng.integers(256, 8000, (32, 48), np.uint16)
                Image.fromarray(disp.astype(np.uint16)).save(
                    os.path.join(root, "training", "disp_occ_0", "%06d_10.png" % i))


def test_kitti15_layout_and_getitem(tmp_path, monkeypatch):
    root = str(tmp_path / "kitti15")
    _make_kitti15_tree(root)

    ds = sfd.Kitti15Stereo("train", root=root)
    ds.pairnames = ds.pairnames[:3]  # the synthetic tree has 3 pairs
    img1, img2, gt, pairname = ds[0]
    assert img1.shape == (32, 48, 3) and img2.shape == (32, 48, 3)
    assert gt.shape == (32, 48, 1) and np.isfinite(gt).all()
    assert pairname == "training/image_2/000000"
    # normalization applied
    assert abs(float(img1.mean())) < 3.0

    # augmented variant produces the crop size
    ds_aug = sfd.Kitti15Stereo("train", augmentor=True, crop_size=(16, 24),
                               root=root, rng=np.random.default_rng(0))
    ds_aug.pairnames = ds_aug.pairnames[:3]
    a1, a2, agt, _ = ds_aug[1]
    assert a1.shape == (16, 24, 3) and agt.shape == (16, 24, 1)


def test_dataset_str_parser(tmp_path):
    root = str(tmp_path / "kitti15")
    _make_kitti15_tree(root)
    os.environ["VIEWCRAFTER_STEREOFLOW_ROOT"] = str(tmp_path)
    try:
        sfd.STEREOFLOW_ROOT = str(tmp_path)
        # registry lookup + multiplier (pairnames multiplied)
        import viewcrafter_tpu.stereoflow.data as mod

        class _K15(sfd.Kitti15Stereo):
            default_subdir = "kitti15"

        old = mod.STEREO_DATASETS["Kitti15"]
        mod.STEREO_DATASETS["Kitti15"] = _K15
        try:
            (ds,) = sfd.get_test_datasets_stereo("Kitti15('subval')")
            assert len(ds) == 5
            (ds2,) = sfd.get_train_dataset_stereo(
                "3*Kitti15('subval')", augmentor=True, crop_size=(16, 24))
            assert len(ds2) == 15
        finally:
            mod.STEREO_DATASETS["Kitti15"] = old
    finally:
        os.environ.pop("VIEWCRAFTER_STEREOFLOW_ROOT", None)


def test_augmentor_flow_sparse_resize():
    from viewcrafter_tpu.stereoflow.augmentor import resize_sparse_flow

    flow = np.full((8, 10, 2), np.inf, np.float32)
    flow[2, 3] = (1.0, -2.0)
    flow[5, 7] = (0.5, 0.25)
    out = resize_sparse_flow(flow, 2.0, 2.0)
    assert out.shape == (16, 20, 2)
    np.testing.assert_allclose(out[4, 6], (2.0, -4.0))
    np.testing.assert_allclose(out[10, 14], (1.0, 0.5))
    # everything else stays invalid
    finite = np.isfinite(out[..., 0])
    assert finite.sum() == 2


def test_color_ops_match_torchvision_semantics():
    """Brightness/contrast/saturation blends against PIL ImageEnhance (the
    backend torchvision uses for PIL inputs)."""
    from PIL import Image, ImageEnhance

    from viewcrafter_tpu.stereoflow import augmentor as aug

    rng = np.random.default_rng(8)
    img = rng.integers(0, 255, (12, 10, 3), np.uint8)
    pil = Image.fromarray(img)
    for factor in (0.5, 1.3):
        np.testing.assert_allclose(
            aug.adjust_brightness(img, factor),
            np.array(ImageEnhance.Brightness(pil).enhance(factor)), atol=1)
        np.testing.assert_allclose(
            aug.adjust_contrast(img, factor),
            np.array(ImageEnhance.Contrast(pil).enhance(factor)), atol=1)
        np.testing.assert_allclose(
            aug.adjust_saturation(img, factor),
            np.array(ImageEnhance.Color(pil).enhance(factor)), atol=2)
