import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from viewcrafter_tpu.models.dust3r_losses import conf_loss, regr3d_loss
from viewcrafter_tpu.utils.ema import ema_init, ema_params, ema_update


def test_ema_warmup_and_convergence():
    p0 = {"w": jnp.zeros((3,))}
    state = ema_init(p0)
    target = {"w": jnp.ones((3,))}
    # first update: decay = min(0.9999, 1/10) = 0.1 -> shadow moves 90% toward target
    state = ema_update(state, target)
    np.testing.assert_allclose(np.asarray(state.shadow["w"]), 0.9, atol=1e-6)
    upd = jax.jit(ema_update)
    for _ in range(50):
        state = upd(state, target)
    np.testing.assert_allclose(np.asarray(ema_params(state)["w"]), 1.0, atol=1e-2)
    assert int(state.num_updates) == 51


def _perfect_pair(b=1, h=6, w=8):
    rng = np.random.default_rng(0)
    pose1 = np.eye(4)
    pose2 = np.eye(4)
    pose2[:3, 3] = [0.5, 0, 0]
    pts_world1 = rng.normal(size=(b, h, w, 3)) + [0, 0, 3]
    pts_world2 = rng.normal(size=(b, h, w, 3)) + [0.5, 0, 3]
    gt1 = {
        "pts3d": jnp.asarray(pts_world1, jnp.float32),
        "camera_pose": jnp.asarray(pose1[None], jnp.float32),
        "valid_mask": jnp.ones((b, h, w), bool),
    }
    gt2 = {
        "pts3d": jnp.asarray(pts_world2, jnp.float32),
        "camera_pose": jnp.asarray(pose2[None], jnp.float32),
        "valid_mask": jnp.ones((b, h, w), bool),
    }
    # perfect predictions: view-1-frame pointmaps (cam1 == world here)
    pred1 = {"pts3d": gt1["pts3d"], "conf": jnp.full((b, h, w), 2.0)}
    pred2 = {"pts3d_in_other_view": gt2["pts3d"], "conf": jnp.full((b, h, w), 2.0)}
    return gt1, gt2, pred1, pred2


def test_regr3d_zero_for_perfect_prediction():
    gt1, gt2, pred1, pred2 = _perfect_pair()
    l1, m1, l2, m2 = regr3d_loss(gt1, gt2, pred1, pred2)
    assert float(l1.mean()) < 1e-5
    assert float(l2.mean()) < 1e-5


def test_conf_loss_rewards_confidence_on_good_pixels():
    gt1, gt2, pred1, pred2 = _perfect_pair()
    total, details = conf_loss(gt1, gt2, pred1, pred2, alpha=0.2)
    # perfect prediction: loss = -alpha*log(conf) * 2 views
    expect = -0.2 * np.log(2.0) * 2
    np.testing.assert_allclose(float(total), expect, atol=1e-4)
    # corrupt view-2 prediction -> loss increases
    pred2_bad = {**pred2, "pts3d_in_other_view": pred2["pts3d_in_other_view"] + 0.5}
    total_bad, _ = conf_loss(gt1, gt2, pred1, pred2_bad, alpha=0.2)
    assert float(total_bad) > float(total)


def test_paired_dataset_from_frame_dirs(tmp_path):
    from viewcrafter_tpu.data.datasets import PairedRenderDataset, PrefetchLoader

    rng = np.random.default_rng(1)
    for sub in ("videos", "renders"):
        d = tmp_path / sub / "clip0"
        os.makedirs(d)
        for i in range(6):
            Image.fromarray(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)).save(d / f"{i:03d}.png")
    ds = PairedRenderDataset(str(tmp_path), video_length=4, resolution=(16, 24))
    item = ds[0]
    assert item["video"].shape == (4, 16, 24, 3)
    assert item["video_cond"].shape == (4, 16, 24, 3)
    assert -1.0 <= item["video"].min() and item["video"].max() <= 1.0
    assert 0 <= item["frameid"] < 4

    batches = list(PrefetchLoader(ds, batch_size=1))
    assert batches[0]["video"].shape == (1, 4, 16, 24, 3)


def test_webvid_dataset(tmp_path):
    from viewcrafter_tpu.data.datasets import WebVidDataset

    rng = np.random.default_rng(2)
    d = tmp_path / "part0" / "vid42"
    os.makedirs(d)
    for i in range(10):
        Image.fromarray(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)).save(d / f"{i:03d}.png")
    csv_path = tmp_path / "meta.csv"
    csv_path.write_text("videoid,page_dir,name\nvid42,part0,a rotating scene\n")
    ds = WebVidDataset(str(csv_path), str(tmp_path), video_length=4, frame_stride=2, resolution=(16, 24))
    item = ds[0]
    assert item["video"].shape == (4, 16, 24, 3)
    assert item["caption"] == "a rotating scene"
