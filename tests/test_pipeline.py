"""End-to-end pipeline smoke tests on the tiny model preset (random weights).

Validates the full orchestration graph — dust3r pair inference, MST+Adam
alignment, trajectory synthesis, rasterization, diffusion sampling, artifact
writing — not output quality (weights are random; golden-quality tests need
the released checkpoints, SURVEY.md §4)."""

import os

import numpy as np
import pytest
from PIL import Image

from viewcrafter_tpu.config import Dust3rConfig
from viewcrafter_tpu.pipeline import InferenceOptions, ViewCrafterPipeline

TINY_DUST3R = Dust3rConfig(
    enc_embed_dim=64,
    enc_depth=2,
    enc_num_heads=2,
    dec_embed_dim=32,
    dec_depth=4,
    dec_num_heads=2,
    dpt_feature_dim=16,
    dpt_hidden_dims=(8, 8, 16, 32),
)


def make_test_image(path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    # some structure so dust3r/rasterizer have gradients to chew on
    arr[30:60, 40:90] = [200, 50, 50]
    Image.fromarray(arr).save(path)


@pytest.fixture(scope="module")
def tiny_pipeline(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vc")
    img = os.path.join(tmp, "scene.png")
    make_test_image(img)
    opts = InferenceOptions(
        image_dir=img,
        out_dir=str(tmp / "out"),
        exp_name="t",
        mode="single_view_target",
        model="viewcrafter_tiny",
        ddim_steps=2,
        video_length=4,
        dust3r_size=64,
        niter=5,
        batch_size=2,
        d_theta=[5.0],
        d_phi=[10.0],
        d_r=[-0.1],
    )
    return ViewCrafterPipeline(opts, dust3r_cfg=TINY_DUST3R)


def test_single_view_target_end_to_end(tiny_pipeline):
    p = tiny_pipeline
    result = p.run()
    assert result.shape == (4, 32, 64, 3)
    assert np.isfinite(result).all()
    assert result.min() >= -1.001 and result.max() <= 1.001
    save = p.opts.save_dir
    for artifact in ["pcd0.ply"]:
        assert os.path.exists(os.path.join(save, artifact)), artifact
    # video written as mp4 or frame dir
    assert os.path.exists(os.path.join(save, "render0.mp4")) or os.path.exists(
        os.path.join(save, "render0.mp4.frames")
    )
    assert os.path.exists(os.path.join(save, "diffusion0.mp4")) or os.path.exists(
        os.path.join(save, "diffusion0.mp4.frames")
    )


def test_single_view_txt_mode(tiny_pipeline, tmp_path):
    p = tiny_pipeline
    traj = tmp_path / "traj.txt"
    traj.write_text("0 15 30\n0 2 4\n0 0 0\n")
    p.opts.mode = "single_view_txt"
    p.opts.traj_txt = str(traj)
    result = p.run()
    assert result.shape == (4, 32, 64, 3)
    p.opts.mode = "single_view_target"


def test_sparse_view_interp_mode(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vc_sparse")
    d = tmp / "scene"
    os.makedirs(d)
    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    for i in range(2):
        arr = np.roll(base, shift=i * 6, axis=1)  # horizontal shift ~ camera pan
        Image.fromarray(arr).save(d / f"{i}.png")
    opts = InferenceOptions(
        image_dir=str(d),
        out_dir=str(tmp / "out"),
        exp_name="s",
        mode="sparse_view_interp",
        model="viewcrafter_tiny",
        ddim_steps=2,
        video_length=4,
        dust3r_size=64,
        niter=5,
        batch_size=2,
    )
    p = ViewCrafterPipeline(opts, dust3r_cfg=TINY_DUST3R)
    result = p.run()
    # one segment between 2 keyframes -> video_length frames
    assert result.shape == (4, 32, 64, 3)
    assert os.path.exists(os.path.join(opts.save_dir, "pcd.ply"))


def test_single_view_eval_mode(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vc_eval")
    d = tmp / "clip"
    os.makedirs(d)
    rng = np.random.default_rng(4)
    base = rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    for i in range(3):
        Image.fromarray(np.roll(base, shift=i * 4, axis=1)).save(d / f"{i:02d}.png")
    opts = InferenceOptions(
        image_dir=str(d),
        out_dir=str(tmp / "out"),
        exp_name="e",
        mode="single_view_eval",
        model="viewcrafter_tiny",
        ddim_steps=2,
        video_length=4,
        dust3r_size=64,
        niter=5,
        batch_size=2,
    )
    p = ViewCrafterPipeline(opts, dust3r_cfg=TINY_DUST3R)
    result = p.run()
    # trajectory = the 3 recovered frames
    assert result.shape == (3, 32, 64, 3)
    assert os.path.exists(os.path.join(opts.save_dir, "render_ref0.mp4")) or os.path.exists(
        os.path.join(opts.save_dir, "render_ref0.mp4.frames")
    )


def test_iterative_ref_mode(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vc_iter")
    img = os.path.join(tmp, "scene.png")
    make_test_image(img)
    opts = InferenceOptions(
        image_dir=img,
        out_dir=str(tmp / "out"),
        exp_name="it",
        mode="single_view_ref_iterative",
        model="viewcrafter_tiny",
        ddim_steps=2,
        video_length=4,
        dust3r_size=64,
        niter=5,
        batch_size=2,
        d_theta=[5.0, 8.0],
        d_phi=[10.0, 15.0],
        d_r=[-0.1, -0.1],
        d_x=[0.0, 0.0],
        d_y=[0.0, 0.0],
    )
    p = ViewCrafterPipeline(opts, dust3r_cfg=TINY_DUST3R)
    results = p.run()
    assert len(results) == 2
    for r in results:
        assert r.shape == (4, 32, 64, 3)
    assert os.path.exists(os.path.join(opts.save_dir, "pcd1.ply"))


def test_multicond_cfg_mode(tiny_pipeline):
    """3-branch CFG (text + image guidance scales) through the full pipeline."""
    p = tiny_pipeline
    p.opts.multiple_cond_cfg = True
    p.opts.cfg_img = 1.5
    try:
        result = p.run()
        assert result.shape == (4, 32, 64, 3)
        assert np.isfinite(result).all()
    finally:
        p.opts.multiple_cond_cfg = False
        p.opts.cfg_img = None


def test_nbv_mode(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vc_nbv")
    img = os.path.join(tmp, "scene.png")
    make_test_image(img)
    opts = InferenceOptions(
        image_dir=img,
        out_dir=str(tmp / "out"),
        exp_name="n",
        mode="single_view_nbv",
        model="viewcrafter_tiny",
        ddim_steps=2,
        video_length=4,
        dust3r_size=64,
        niter=5,
        batch_size=2,
        d_theta=[15.0],
        d_phi=[20.0],
        d_r=[-0.1],
    )
    p = ViewCrafterPipeline(opts, dust3r_cfg=TINY_DUST3R)
    results = p.run()
    assert len(results) == 3  # fixed 3 NBV iterations (viewcrafter.py:361)
    for r in results:
        assert r.shape == (4, 32, 64, 3)
    # candidate-mask artifacts from the NBV selection
    files = os.listdir(opts.save_dir)
    assert any(f.startswith("candidate_mask") for f in files), files


def test_iterative_1drc_mode(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vc_1drc")
    img = os.path.join(tmp, "scene.png")
    make_test_image(img)
    opts = InferenceOptions(
        image_dir=img,
        out_dir=str(tmp / "out"),
        exp_name="d",
        mode="single_view_1drc_iterative",
        model="viewcrafter_tiny",
        ddim_steps=2,
        video_length=4,
        dust3r_size=64,
        niter=5,
        batch_size=2,
        d_theta=[5.0, 6.0],
        d_phi=[10.0, 12.0],
        d_r=[-0.1, -0.1],
        d_x=[0.0, 0.0],
        d_y=[0.0, 0.0],
    )
    p = ViewCrafterPipeline(opts, dust3r_cfg=TINY_DUST3R)
    results = p.run()
    assert len(results) == 2
    assert all(r.shape == (4, 32, 64, 3) for r in results)


def test_portrait_end_to_end(tmp_path_factory):
    """Portrait inputs ride the ManyAR path (dust3r/patch_embed.py:32-70):
    run_dust3r stores them transposed-to-landscape with a static orientation
    flag and un-transposes the predicted maps, so alignment, rendering and
    diffusion all operate in true portrait orientation."""
    import dataclasses as dc

    from viewcrafter_tpu.config import get_model_config

    tmp = tmp_path_factory.mktemp("vc_portrait")
    img = os.path.join(tmp, "scene.png")
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, size=(128, 96, 3), dtype=np.uint8)  # portrait
    arr[40:90, 30:60] = [60, 180, 60]
    Image.fromarray(arr).save(img)

    tiny = get_model_config("viewcrafter_tiny")
    portrait_cfg = dc.replace(
        tiny, name="viewcrafter_tiny_portrait", height=64, width=32,
        diffusion=dc.replace(tiny.diffusion, latent_size=(8, 4)),
    )
    opts = InferenceOptions(
        image_dir=img,
        out_dir=str(tmp / "out"),
        exp_name="p",
        mode="single_view_target",
        model="viewcrafter_tiny",
        ddim_steps=2,
        video_length=4,
        dust3r_size=64,
        niter=5,
        batch_size=2,
        d_theta=[5.0],
        d_phi=[10.0],
        d_r=[-0.1],
    )
    p = ViewCrafterPipeline(opts, model_cfg=portrait_cfg, dust3r_cfg=TINY_DUST3R)
    # loader must produce portrait dust3r inputs (h > w, multiples of 16)
    p.load_inputs()
    h, w = p.images[0].img.shape[:2]
    assert h > w and h % 16 == 0 and w % 16 == 0, (h, w)
    result = p.run()
    assert result.shape == (4, 64, 32, 3)
    assert np.isfinite(result).all()


def test_export_pc_knobs(tmp_path):
    """--reduce_pc subsamples ::3 and --mask_pc=False exports the full cloud
    (pvd_utils.py:476-504 get_pc semantics)."""
    from viewcrafter_tpu.pipeline import AlignedScene

    def ply_vertex_count(path):
        with open(path, "rb") as f:
            for line in f:
                if line.startswith(b"element vertex"):
                    return int(line.split()[-1])
        raise AssertionError("no vertex element")

    pts = np.random.default_rng(0).standard_normal((90, 3)).astype(np.float32)
    cols = np.random.default_rng(1).uniform(size=(90, 3)).astype(np.float32)

    opts = InferenceOptions(image_dir="x", out_dir=str(tmp_path), reduce_pc=True)
    p = ViewCrafterPipeline(opts, init_models=False)
    path = str(tmp_path / "a.ply")
    p._export_pc(path, pts, cols)
    assert ply_vertex_count(path) == 30  # ::3

    # mask_pc=False: re-selects the FULL cloud from the scene
    scene = AlignedScene(
        poses=np.stack([np.eye(4)] * 2),
        focals=np.ones(2), principal_points=np.ones((2, 2)),
        depths=np.ones((2, 30, 3)),
        pts3d=np.stack([pts.reshape(30, 3, 3)] * 2),
        im_conf=np.ones((2, 30, 3)),
        imgs=np.stack([cols.reshape(30, 3, 3)] * 2),
        min_conf_thr=0.0,
    )
    opts2 = InferenceOptions(image_dir="x", out_dir=str(tmp_path), mask_pc=False)
    p2 = ViewCrafterPipeline(opts2, init_models=False)
    path2 = str(tmp_path / "b.ply")
    p2._export_pc(path2, pts[:5], cols[:5], scene=scene)
    assert ply_vertex_count(path2) == 180  # full 2x90, mask ignored
