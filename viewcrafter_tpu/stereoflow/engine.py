"""Stereo/flow inference + training engine.

Parity target: extern/dust3r/croco/stereoflow/engine.py —
  - tiled_pred (:179-264): run the network on overlapping crops and
    confidence-weight-average the predictions; crop offsets via linspace
    (_overlapping :267-271); conf weight modes 'conf_expsigmoid_B_S'
    (w = exp(-B*2*(sigmoid(c/S)-0.5))) and 'conf_expbetaB' (w = exp(-B*c))
    (:206-211, 239-244);
  - train_one_epoch (:25-98): CFG'd forward, split conf, criterion step.

TPU-first redesign: the reference runs one forward PER TILE in a Python loop
(engine.py:230-232). Here all tiles ride ONE batch axis through a single
jitted forward — tile extraction is a stack of static slices and the
weighted accumulation is a fori of at[].add updates, so the whole
prediction is one XLA program per (image size, crop, overlap) bucket.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from viewcrafter_tpu.models.croco_downstream import split_prediction_conf


def overlapping_offsets(total: int, window: int, overlap: float = 0.5) -> List[int]:
    """Crop start offsets: 1+ceil((total-window)/((1-overlap)*window)) windows
    spread by linspace over [0, total-window] (engine.py:267-271)."""
    assert total >= window and 0 <= overlap < 1, (total, window, overlap)
    num_windows = 1 + int(np.ceil((total - window) / ((1 - overlap) * window)))
    return np.linspace(0, total - window, num_windows).round().astype(int).tolist()


def _parse_conf_mode(conf_mode: str):
    """-> weight_fn(predconf) per engine.py:206-211,239-244."""
    if conf_mode.startswith("conf_expsigmoid_"):
        beta, betasigmoid = map(float, conf_mode[len("conf_expsigmoid_"):].split("_"))
        return lambda c: jnp.exp(-beta * 2.0 * (jax.nn.sigmoid(c / betasigmoid) - 0.5))
    if conf_mode.startswith("conf_expbeta"):
        beta = float(conf_mode[len("conf_expbeta"):])
        return lambda c: jnp.exp(-beta * c)
    raise NotImplementedError(f"conf_mode {conf_mode} is not implemented")


def _resize_img(img: jnp.ndarray, new_size: Tuple[int, int]) -> jnp.ndarray:
    """Bicubic up-resize (engine.py:163-164). jax.image 'cubic' is the Keys
    kernel with a=-0.5 vs torch bicubic's a=-0.75 — sub-1% pixel difference,
    only on the rare image-smaller-than-crop path."""
    b, _, _, c = img.shape
    return jax.image.resize(img, (b, new_size[0], new_size[1], c), method="cubic")


def _resize_stereo_or_flow(data: jnp.ndarray, new_size: Tuple[int, int]) -> jnp.ndarray:
    """Resize + rescale disparity/flow magnitudes (engine.py:165-175);
    channel 0 scales with x, channel 1 (flow) with y."""
    assert data.shape[-1] in (1, 2)
    scale_x = new_size[1] / float(data.shape[2])
    out = _resize_img(data, new_size)
    out = out.at[..., 0].mul(scale_x)
    if data.shape[-1] == 2:
        out = out.at[..., 1].mul(new_size[0] / float(data.shape[1]))
    return out


def tiled_pred(
    apply_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    gt: Optional[jnp.ndarray] = None,
    *,
    crop: Tuple[int, int] = (352, 704),
    overlap: float = 0.5,
    conf_mode: str = "conf_expsigmoid_10_5",
    with_conf: bool = True,
    criterion: Optional[Callable] = None,
    tile_batch: int = 0,
):
    """Overlapping-crop inference with confidence-weighted averaging.

    apply_fn: bound model forward (img1, img2) -> (B, ch, cw, C[+1]).
    img1/img2: (B, H, W, 3) channels-last. Returns (pred (B,H,W,C) fp32,
    mean tiled loss (or None), weighted conf map (B,H,W)).

    tile_batch > 0 chunks the tile axis to bound activation memory; 0 runs
    every tile in one batched forward.
    """
    b, h, w, _ = img1.shape
    win_h, win_w = crop

    # upscale so the crop fits (engine.py:195-204; the reference's
    # upscale_factor uses W in both ratios — a latent bug we do not keep)
    do_change_scale = h < win_h or w < win_w
    if do_change_scale:
        upscale = max(win_w / w, win_h / h)
        original_size = (h, w)
        new_size = (round(h * upscale), round(w * upscale))
        img1 = _resize_img(img1, new_size)
        img2 = _resize_img(img2, new_size)
        if gt is not None:
            gt = _resize_stereo_or_flow(gt, new_size)
        h, w = new_size

    offsets = [
        (sy, sx)
        for sy in overlapping_offsets(h, win_h, overlap)
        for sx in overlapping_offsets(w, win_w, overlap)
    ]
    n_tiles = len(offsets)
    weight_fn = _parse_conf_mode(conf_mode)

    # gather all tiles onto one batch axis: (T*B, win_h, win_w, 3)
    t1 = jnp.concatenate([img1[:, sy:sy + win_h, sx:sx + win_w] for sy, sx in offsets])
    t2 = jnp.concatenate([img2[:, sy:sy + win_h, sx:sx + win_w] for sy, sx in offsets])

    if tile_batch and tile_batch < n_tiles:
        preds = []
        for i in range(0, n_tiles * b, tile_batch * b):
            preds.append(apply_fn(t1[i:i + tile_batch * b], t2[i:i + tile_batch * b]))
        raw = jnp.concatenate(preds)
    else:
        raw = apply_fn(t1, t2)
    pred_t, conf_t = split_prediction_conf(raw.astype(jnp.float32), with_conf)
    c_ch = pred_t.shape[-1]

    if conf_t is None:
        # weight degenerates to uniform averaging when the head has no conf
        conf_t = jnp.zeros(pred_t.shape[:-1], jnp.float32)
    weights = weight_fn(conf_t)  # (T*B, win_h, win_w)

    tiled_losses = []
    if criterion is not None and gt is not None:
        for ti, (sy, sx) in enumerate(offsets):
            gtc = gt[:, sy:sy + win_h, sx:sx + win_w]
            p = pred_t[ti * b:(ti + 1) * b]
            if with_conf:
                tiled_losses.append(
                    criterion(p, gtc, conf_t[ti * b:(ti + 1) * b]))
            else:
                tiled_losses.append(criterion(p, gtc))

    accu_pred = jnp.zeros((b, h, w, c_ch), jnp.float32)
    accu_w = jnp.full((b, h, w), 1e-16, jnp.float32)
    accu_c = jnp.zeros((b, h, w), jnp.float32)
    for ti, (sy, sx) in enumerate(offsets):
        p = pred_t[ti * b:(ti + 1) * b]
        cw = weights[ti * b:(ti + 1) * b]
        cc = conf_t[ti * b:(ti + 1) * b]
        accu_pred = accu_pred.at[:, sy:sy + win_h, sx:sx + win_w].add(p * cw[..., None])
        accu_w = accu_w.at[:, sy:sy + win_h, sx:sx + win_w].add(cw)
        accu_c = accu_c.at[:, sy:sy + win_h, sx:sx + win_w].add(cc * cw)

    pred = accu_pred / accu_w[..., None]
    c = accu_c / accu_w

    if do_change_scale:
        pred = _resize_stereo_or_flow(pred, original_size)

    loss = jnp.mean(jnp.stack(tiled_losses)) if tiled_losses else None
    return pred, loss, c


def train_step(model, params, opt_state, optimizer, img1, img2, gt,
               loss_fn, with_conf: bool):
    """One downstream training step (engine.py:25-98 without the logging
    scaffolding): forward, split conf, criterion, grad, optax update.
    Pure-functional — jit with optimizer/loss_fn/with_conf static."""

    def objective(p):
        out = model.apply(p, img1, img2)
        pred, conf = split_prediction_conf(out.astype(jnp.float32), with_conf)
        return loss_fn(pred, gt, conf) if with_conf else loss_fn(pred, gt)

    loss, grads = jax.value_and_grad(objective)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = jax.tree_util.tree_map(lambda a, u: a + u, params, updates)
    return params, opt_state, loss
