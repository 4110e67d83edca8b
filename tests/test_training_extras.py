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


def _tiny_batches(cfg, n=2):
    t = cfg.video_length
    h, w = cfg.diffusion.latent_size
    ctx_len = cfg.clip_text.context_length + cfg.resampler.num_queries * cfg.resampler.video_length
    rngd = np.random.default_rng(3)
    return [
        {
            "latents": jnp.asarray(rngd.normal(size=(1, t, h, w, 4)), jnp.float32),
            "cond_latents": jnp.asarray(rngd.normal(size=(1, t, h, w, 4)), jnp.float32),
            "context": jnp.asarray(rngd.normal(size=(1, ctx_len, cfg.unet.context_dim)), jnp.float32),
            "fs": jnp.full((1,), 3.0),
        }
        for _ in range(n)
    ]


def _assert_tree_equal(a, b, what):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=what)


def test_train_loop_resume_bit_identical(tmp_path):
    """4 uninterrupted steps == 2 steps + checkpoint + 2 resumed steps,
    bit-for-bit (params, opt state, EMA, rng)."""
    from viewcrafter_tpu.config import get_model_config
    from viewcrafter_tpu.train_loop import TrainLoop, TrainLoopConfig

    cfg = get_model_config("viewcrafter_tiny")
    batches = _tiny_batches(cfg)

    def lc(ckpt_dir, max_steps):
        return TrainLoopConfig(
            lr=1e-3, warmup_steps=1, decay_steps=8, max_steps=max_steps,
            ckpt_dir=ckpt_dir, save_every=2, log_every=0, ema_decay=0.99,
        )

    rng = jax.random.PRNGKey(0)
    state_a = TrainLoop(cfg, lc(str(tmp_path / "a"), 4)).run(batches, rng)

    TrainLoop(cfg, lc(str(tmp_path / "b"), 2)).run(batches, rng)
    # fresh loop object resumes from the step_2 checkpoint on disk
    state_b = TrainLoop(cfg, lc(str(tmp_path / "b"), 4)).run(batches, rng)

    assert int(state_a.train.step) == int(state_b.train.step) == 4
    _assert_tree_equal(state_a.train.params, state_b.train.params, "params")
    _assert_tree_equal(state_a.train.opt_state, state_b.train.opt_state, "opt_state")
    _assert_tree_equal(state_a.ema.shadow, state_b.ema.shadow, "ema")
    _assert_tree_equal(state_a.rng, state_b.rng, "rng")


def test_train_loop_logs_and_lr_schedule(tmp_path):
    """Loop runs to max_steps, params actually move, the jsonl log has the
    expected fields (per-step loss itself is stochastic — random t/eps per
    step — so no monotonicity assertion), and the LR schedule warms up then
    decays."""
    from viewcrafter_tpu.config import get_model_config
    from viewcrafter_tpu.train_loop import TrainLoop, TrainLoopConfig, make_lr_schedule

    cfg = get_model_config("viewcrafter_tiny")
    lcfg = TrainLoopConfig(
        lr=1e-3, warmup_steps=2, decay_steps=20, max_steps=6, schedule="cosine",
        ckpt_dir=None, log_every=3, log_path=str(tmp_path / "log.jsonl"), use_ema=False,
    )
    loop = TrainLoop(cfg, lcfg)
    init = loop.init_state(jax.random.PRNGKey(1))
    state = loop.run(_tiny_batches(cfg, n=1), jax.random.PRNGKey(1), state=init)
    assert int(state.train.step) == 6
    import json

    recs = [json.loads(l) for l in open(tmp_path / "log.jsonl")]
    assert len(recs) == 2
    assert all(np.isfinite(r["loss"]) for r in recs)
    assert set(recs[0]) == {"step", "loss", "lr", "steps_per_s"}
    # training moved the weights
    k0 = jax.tree_util.tree_leaves(init.train.params)[0]
    k1 = jax.tree_util.tree_leaves(state.train.params)[0]
    assert float(np.abs(np.asarray(k1) - np.asarray(k0)).max()) > 0
    # lr schedule: warmup then decay
    lr = make_lr_schedule(lcfg)
    assert float(lr(0)) == 0.0
    np.testing.assert_allclose(float(lr(2)), lcfg.lr, rtol=1e-6)
    assert float(lr(19)) < lcfg.lr * 0.999


def test_co3d_pair_dataset(tmp_path):
    from viewcrafter_tpu.data.co3d import Co3dPairDataset

    rng = np.random.default_rng(4)
    cat, inst = "apple", "110_13051_23361"
    base = tmp_path / cat / inst
    for sub in ("images", "depths", "masks"):
        os.makedirs(base / sub)
    H, W = 40, 60
    K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], np.float32)
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8)).save(
            base / "images" / f"frame{i:06d}.jpg")
        depth16 = np.full((H, W), 32767, np.uint16)  # flat plane at max_depth/2
        Image.fromarray(depth16).save(base / "depths" / f"frame{i:06d}.jpg.geometric.png")
        mask = np.zeros((H, W), np.uint8)
        mask[4:-4, 6:-6] = 255
        Image.fromarray(mask).save(base / "masks" / f"frame{i:06d}.png")
        np.savez(base / "images" / f"frame{i:06d}.npz",
                 camera_pose=np.eye(4, dtype=np.float32),
                 camera_intrinsics=K, maximum_depth=np.float32(4.0))
    (tmp_path / "selected_seqs_train.json").write_text(
        '{"apple": {"110_13051_23361": [0, 1, 2, 3, 4, 5]}}')

    ds = Co3dPairDataset(str(tmp_path), split="train", resolution=(32, 48),
                         num_frames=6, max_step=5, angle_step=5, jitter=0)
    assert len(ds) == 1  # one scene x one (0,5) pair
    v1, v2 = ds[0]
    for v in (v1, v2):
        assert v["img"].shape == (32, 48, 3) and -1 <= v["img"].min() <= v["img"].max() <= 1
        assert v["pts3d"].shape == (32, 48, 3)
        assert v["valid_mask"].shape == (32, 48)
        # bg masked out, interior valid
        assert not v["valid_mask"][0, 0] and v["valid_mask"][16, 24]
        # identity pose + flat depth: world z == depth == 0.5 * max_depth
        np.testing.assert_allclose(v["pts3d"][16, 24, 2], 32767 / 65535 * 4.0, rtol=1e-3)
        # the loss consumes these directly
    from viewcrafter_tpu.models.dust3r_losses import conf_loss

    def j(v):
        return {k: jnp.asarray(val)[None] for k, val in v.items()
                if k in ("pts3d", "valid_mask", "camera_pose")}
    pred1 = {"pts3d": jnp.asarray(v1["pts3d"])[None], "conf": jnp.full((1, 32, 48), 2.0)}
    pred2 = {"pts3d_in_other_view": jnp.asarray(v2["pts3d"])[None], "conf": jnp.full((1, 32, 48), 2.0)}
    total, _ = conf_loss(j(v1), j(v2), pred1, pred2)
    assert np.isfinite(float(total))


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


def test_croco_pretrain_step_learns():
    from viewcrafter_tpu.models.croco_pretrain import (
        CroCoPretrain, CroCoPretrainConfig,
    )
    from viewcrafter_tpu.pretrain import make_croco_pretrain_step
    from viewcrafter_tpu.training import TrainState
    import optax

    cfg = CroCoPretrainConfig(
        img_size=(32, 32), patch_size=16, enc_embed_dim=32, enc_depth=1,
        enc_num_heads=2, dec_embed_dim=32, dec_depth=1, dec_num_heads=2,
        mask_ratio=0.5,
    )
    model = CroCoPretrain(cfg=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    batch = {
        "img1": jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32) * 0.3,
        "img2": jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32) * 0.3,
    }
    params = model.init(jax.random.PRNGKey(0), batch["img1"], batch["img2"],
                        rng=jax.random.PRNGKey(1))
    tx = optax.adamw(1e-3)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_croco_pretrain_step(model, tx)
    losses = []
    for i in range(8):
        state, loss = step(state, batch, jax.random.PRNGKey(2))  # fixed mask rng
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_dust3r_train_step_learns_and_shards():
    from viewcrafter_tpu.config import Dust3rConfig
    from viewcrafter_tpu.models.dust3r import Dust3rModel
    from viewcrafter_tpu.parallel.mesh import make_mesh
    from viewcrafter_tpu.pretrain import collate_views, make_dust3r_train_step
    from viewcrafter_tpu.training import TrainState
    import optax

    cfg = Dust3rConfig(
        img_size=(32, 32), patch_size=16, enc_embed_dim=32, enc_depth=1,
        enc_num_heads=2, dec_embed_dim=32, dec_depth=2, dec_num_heads=2,
        head_type="linear",
    )
    model = Dust3rModel(cfg=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)

    def view(seed):
        r = np.random.default_rng(seed)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = r.standard_normal(3) * 0.1
        return {
            "img": (r.standard_normal((32, 32, 3)) * 0.3).astype(np.float32),
            "pts3d": (r.standard_normal((32, 32, 3)) + [0, 0, 2]).astype(np.float32),
            "valid_mask": np.ones((32, 32), bool),
            "camera_pose": pose,
        }

    batch = {"gt1": collate_views([view(0), view(2)]),
             "gt2": collate_views([view(1), view(3)])}
    params = model.init(jax.random.PRNGKey(0), batch["gt1"]["img"], batch["gt2"]["img"])
    tx = optax.adamw(1e-3)

    def fresh():
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    step = make_dust3r_train_step(model, tx, symmetrized=True)
    state = fresh()
    losses = []
    for _ in range(6):
        state, loss, parts = step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert set(parts) >= {"conf_loss_1", "conf_loss_2", "regr3d_1", "regr3d_2"}

    # sharded step produces the same first-step loss as single-device
    mesh = make_mesh(8, dp=2)
    sstep = make_dust3r_train_step(model, tx, mesh=mesh, symmetrized=True)
    _, sloss, _ = sstep(fresh(), batch)
    _, ref_loss, _ = step(fresh(), batch)
    np.testing.assert_allclose(float(sloss), float(ref_loss), rtol=2e-5)


def test_unet_remat_grads_match():
    """remat=True (reference per-block gradient checkpointing) changes only
    memory, not values: loss and grads are identical."""
    from viewcrafter_tpu.config import get_model_config
    from viewcrafter_tpu.models.unet3d import UNet3D

    cfg = get_model_config("viewcrafter_tiny")
    t = cfg.video_length
    h, w = cfg.diffusion.latent_size
    x = jax.random.normal(jax.random.PRNGKey(0), (1, t, h, w, 8))
    ts = jnp.array([300.0])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, cfg.unet.context_dim))

    m0 = UNet3D(cfg=cfg.unet, dtype=jnp.float32)
    m1 = UNet3D(cfg=cfg.unet, dtype=jnp.float32, remat=True)
    params = m0.init(jax.random.PRNGKey(2), x, ts, ctx)

    def loss(m):
        def f(p):
            return jnp.mean(m.apply(p, x, ts, ctx) ** 2)
        return f

    l0, g0 = jax.value_and_grad(loss(m0))(params)
    l1, g1 = jax.value_and_grad(loss(m1))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
