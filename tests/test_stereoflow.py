"""Golden parity for the CroCo downstream stereo/flow suite.

Reference modules exercised (imported from /root/reference, never copied):
  - CroCoDownstreamBinocular   croco/models/croco_downstream.py:67
  - PixelwiseTaskWithDPT       croco/models/head_downstream.py:19
  - stereoflow criterion       croco/stereoflow/criterion.py
  - tiled_pred                 croco/stereoflow/engine.py:179
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "extern/dust3r/croco")),
    reason="reference tree absent",
)
for _p in (REF, f"{REF}/extern/dust3r", f"{REF}/extern/dust3r/croco"):
    if os.path.isdir(_p) and _p not in sys.path:
        sys.path.append(_p)


def randomize_(module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for v in module.state_dict().values():
            if not v.is_floating_point():
                continue
            fan_in = 1
            for dim in v.shape[1:]:
                fan_in *= dim
            scale = 0.2 if v.ndim <= 1 else fan_in**-0.5
            v.copy_(torch.randn(v.shape, generator=g, dtype=torch.float32) * scale)


def assert_close(ours, ref, tol: float = 2e-3, name: str = ""):
    a = np.asarray(ours, np.float32)
    b = np.asarray(ref, np.float32)
    assert a.shape == b.shape, f"{name}: shape {a.shape} vs {b.shape}"
    scale = max(1.0, float(np.abs(b).max()))
    diff = float(np.abs(a - b).max())
    assert diff <= tol * scale, f"{name}: max|delta|={diff:.3e} (scale {scale:.3e})"


TINY = dict(
    img_size=64, patch_size=16, enc_embed_dim=64, enc_depth=4, enc_num_heads=2,
    dec_embed_dim=48, dec_depth=8, dec_num_heads=2, mlp_ratio=4,
    pos_embed="RoPE100",
)


def _build_pair(num_channels: int, seed: int):
    """(torch reference model, our model, translated params)."""
    from models.croco_downstream import CroCoDownstreamBinocular as RefBinocular
    from models.head_downstream import PixelwiseTaskWithDPT

    from viewcrafter_tpu.models.croco_downstream import (
        CroCoDownstreamBinocular,
        CroCoDownstreamConfig,
    )
    from viewcrafter_tpu.utils.checkpoint import translate_croco_downstream_checkpoint

    head = PixelwiseTaskWithDPT()
    head.num_channels = num_channels
    ref = RefBinocular(head, **TINY).eval()
    randomize_(ref, seed)

    cfg = CroCoDownstreamConfig(
        img_size=(64, 64), patch_size=16, enc_embed_dim=64, enc_depth=4,
        enc_num_heads=2, dec_embed_dim=48, dec_depth=8, dec_num_heads=2,
        num_channels=num_channels,
    )
    params = translate_croco_downstream_checkpoint(ref.state_dict(), cfg=cfg)
    model = CroCoDownstreamBinocular(cfg=cfg, dtype=jnp.float32)
    return ref, model, params


def test_croco_downstream_binocular_golden():
    """Full binocular network parity: batched pair encode, single-stream
    cross decoder, auto hooks [2,5,8,11] (enc 4 + dec 8), DPT regression."""
    ref, model, params = _build_pair(num_channels=3, seed=5)

    rng = np.random.default_rng(3)
    img1 = rng.standard_normal((2, 3, 64, 64), np.float32) * 0.5
    img2 = rng.standard_normal((2, 3, 64, 64), np.float32) * 0.5
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(img1), torch.from_numpy(img2)).numpy()

    j1 = jnp.transpose(jnp.asarray(img1), (0, 2, 3, 1))
    j2 = jnp.transpose(jnp.asarray(img2), (0, 2, 3, 1))
    init_tree = model.init(jax.random.PRNGKey(0), j1, j2)
    from viewcrafter_tpu.utils.checkpoint import verify_tree_shapes

    errs = verify_tree_shapes(params, init_tree)
    assert not errs, f"downstream translator mismatch: {errs[:8]}"

    out = model.apply(params, j1, j2)
    assert_close(np.transpose(np.asarray(out), (0, 3, 1, 2)), out_ref, name="binocular")


def test_criterion_goldens():
    from stereoflow.criterion import (
        FlowMetrics,
        L1Loss,
        LaplacianLoss,
        LaplacianLossBounded,
        LaplacianLossBounded2,
        StereoMetrics,
    )

    from viewcrafter_tpu.stereoflow import criterion as ours

    rng = np.random.default_rng(11)
    pred = rng.standard_normal((2, 8, 12, 2), np.float32)
    gt = rng.standard_normal((2, 8, 12, 2), np.float32) * 3
    conf = rng.standard_normal((2, 8, 12), np.float32)
    invalid = rng.random((2, 8, 12)) < 0.2
    gt[invalid] = np.inf  # both channels invalid together, like real gt

    tp = torch.from_numpy(pred.transpose(0, 3, 1, 2))
    tg = torch.from_numpy(gt.transpose(0, 3, 1, 2))
    tc = torch.from_numpy(conf[:, None])

    jp, jg, jc = jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(conf)

    assert_close(ours.l1_loss(jp, jg), L1Loss()(tp, tg).item(), name="l1")
    assert_close(
        ours.l1_loss(jp, jg, max_gtnorm=3.0),
        L1Loss(max_gtnorm=3.0)(tp, tg).item(),
        name="l1 bounded",
    )
    assert_close(
        ours.laplacian_loss(jp, jg, jc), LaplacianLoss()(tp, tg, tc).item(),
        name="laplacian",
    )
    assert_close(
        ours.laplacian_loss_bounded(jp, jg, jc),
        LaplacianLossBounded()(tp, tg, tc).item(),
        name="laplacian bounded",
    )
    assert_close(
        ours.laplacian_loss_bounded2(jp, jg, jc),
        LaplacianLossBounded2()(tp, tg, tc).item(),
        name="laplacian bounded2",
    )

    ref_fm = FlowMetrics()(tp, tg)
    our_fm = ours.flow_metrics(jp, jg)
    for k, v in ref_fm.items():
        key = k.replace("@1.0", "@1.0")
        assert_close(our_fm[key], v.item(), name=f"flow {k}")

    spred = jnp.asarray(pred[..., :1])
    sgt = jnp.asarray(gt[..., :1])
    ref_sm = StereoMetrics()(tp[:, :1], tg[:, :1])
    our_sm = ours.stereo_metrics(spred, sgt)
    for k, v in ref_sm.items():
        assert_close(our_sm[k], v.item(), name=f"stereo {k}")


def test_dataset_metrics_goldens():
    from stereoflow.criterion import FlowDatasetMetrics, StereoDatasetMetrics

    from viewcrafter_tpu.stereoflow import criterion as ours

    rng = np.random.default_rng(7)
    ref_f, our_f = FlowDatasetMetrics(), ours.FlowDatasetMetrics()
    ref_s, our_s = StereoDatasetMetrics(), ours.StereoDatasetMetrics()
    ref_f.reset(), ref_s.reset()
    for i in range(3):
        pred = rng.standard_normal((1, 6, 9, 2), np.float32)
        gt = rng.standard_normal((1, 6, 9, 2), np.float32) * (8 + 10 * i)
        gt[rng.random((1, 6, 9)) < 0.15] = np.inf
        ref_f.add_batch(
            torch.from_numpy(pred.transpose(0, 3, 1, 2)),
            torch.from_numpy(gt.transpose(0, 3, 1, 2)),
        )
        our_f.add_batch(jnp.asarray(pred), jnp.asarray(gt))
        ref_s.add_batch(
            torch.from_numpy(pred[..., :1].transpose(0, 3, 1, 2)),
            torch.from_numpy(gt[..., :1].transpose(0, 3, 1, 2)),
        )
        our_s.add_batch(jnp.asarray(pred[..., :1]), jnp.asarray(gt[..., :1]))
    for k, v in ref_f.get_results().items():
        assert_close(our_f.get_results()[k], v, name=f"flow agg {k}")
    for k, v in ref_s.get_results().items():
        assert_close(our_s.get_results()[k], v, name=f"stereo agg {k}")


def _import_ref_engine():
    """stereoflow.engine imports torchvision (unused on the tiled_pred code
    path); stub it when absent."""
    import types

    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            sys.modules["torchvision"] = types.ModuleType("torchvision")
    import stereoflow.engine as ref_engine

    return ref_engine


def test_overlapping_offsets_match_reference():
    _overlapping = _import_ref_engine()._overlapping

    from viewcrafter_tpu.stereoflow.engine import overlapping_offsets

    for total, window, overlap in [(96, 64, 0.5), (160, 64, 0.5), (704, 704, 0.9),
                                   (1024, 704, 0.7), (371, 352, 0.5)]:
        ref = [s.start for s in _overlapping(total, window, overlap)]
        assert overlapping_offsets(total, window, overlap) == ref, (total, window)


def test_tiled_pred_golden():
    """End-to-end tiled inference parity: same tiny binocular net via the
    translated weights, 2x4 tile grid, conf_expsigmoid weighting, flow task."""
    from stereoflow.criterion import LaplacianLossBounded

    ref_tiled_pred = _import_ref_engine().tiled_pred

    from viewcrafter_tpu.stereoflow.criterion import laplacian_loss_bounded
    from viewcrafter_tpu.stereoflow.engine import tiled_pred

    ref, model, params = _build_pair(num_channels=3, seed=9)

    rng = np.random.default_rng(13)
    H, W = 96, 160
    img1 = rng.standard_normal((1, 3, H, W), np.float32) * 0.5
    img2 = rng.standard_normal((1, 3, H, W), np.float32) * 0.5
    gt = rng.standard_normal((1, 2, H, W), np.float32) * 4
    inv = rng.random((H, W)) < 0.1
    gt[:, :, inv] = np.inf

    with torch.no_grad():
        ref_pred, ref_loss, ref_c = ref_tiled_pred(
            ref, LaplacianLossBounded(), torch.from_numpy(img1),
            torch.from_numpy(img2), torch.from_numpy(gt),
            overlap=0.5, crop=(64, 64), with_conf=True,
            conf_mode="conf_expsigmoid_10_5",
        )

    j1 = jnp.transpose(jnp.asarray(img1), (0, 2, 3, 1))
    j2 = jnp.transpose(jnp.asarray(img2), (0, 2, 3, 1))
    jgt = jnp.transpose(jnp.asarray(gt), (0, 2, 3, 1))
    apply_fn = jax.jit(lambda a, b: model.apply(params, a, b))
    pred, loss, c = tiled_pred(
        apply_fn, j1, j2, jgt, crop=(64, 64), overlap=0.5,
        conf_mode="conf_expsigmoid_10_5", with_conf=True,
        criterion=laplacian_loss_bounded,
    )

    assert_close(
        np.transpose(np.asarray(pred), (0, 3, 1, 2)), ref_pred.numpy(),
        name="tiled pred",
    )
    assert_close(np.asarray(c), ref_c.numpy(), name="tiled conf")
    assert_close(float(loss), ref_loss.item(), name="tiled loss")


def test_train_step_decreases_loss():
    import optax

    from viewcrafter_tpu.models.croco_downstream import (
        CroCoDownstreamBinocular,
        CroCoDownstreamConfig,
    )
    from viewcrafter_tpu.stereoflow.criterion import laplacian_loss_bounded2
    from viewcrafter_tpu.stereoflow.engine import train_step

    cfg = CroCoDownstreamConfig(
        img_size=(32, 32), patch_size=16, enc_embed_dim=32, enc_depth=2,
        enc_num_heads=2, dec_embed_dim=32, dec_depth=8, dec_num_heads=2,
        num_channels=2, dpt_layer_dims=(8, 16, 24, 32), dpt_feature_dim=16,
        dpt_last_dim=8, hooks_idx=(1, 4, 7, 9),
    )
    model = CroCoDownstreamBinocular(cfg=cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    img1 = jax.random.normal(rng, (1, 32, 32, 3)) * 0.5
    img2 = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 0.5
    gt = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 1))
    params = model.init(jax.random.PRNGKey(3), img1, img2)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    losses = []
    for _ in range(4):
        params, opt_state, loss = train_step(
            model, params, opt_state, opt, img1, img2, gt,
            laplacian_loss_bounded2, with_conf=True,
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]
