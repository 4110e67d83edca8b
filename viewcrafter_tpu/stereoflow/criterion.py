"""Stereo/flow losses and metrics.

Parity target: extern/dust3r/croco/stereoflow/criterion.py —
  - L1Loss (:20-36), LaplacianLoss (:41-53), LaplacianLossBounded (:56-69,
    CroCo-Flow), LaplacianLossBounded2 (:71-84, CroCo-Stereo);
  - StereoMetrics (:88-111) / FlowMetrics (:113-132) per-batch;
  - StereoDatasetMetrics (:140-182) / FlowDatasetMetrics (:184-251)
    streaming per-dataset aggregates.

Layout: channels-last (B, H, W, C); gt marks invalid pixels with +-inf
exactly like the reference (mask = isfinite(gt)). TPU-first: dynamic masks
become where/sum reductions (static shapes, jittable); the torch versions'
boolean indexing means-over-masked-elements are reproduced as
sum(x*m)/sum(m).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def _gtnorm(gt: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,1): |gt| for stereo (C=1), flow magnitude for flow (C=2)
    (criterion.py:12-16)."""
    if gt.shape[-1] == 1:
        return gt
    return jnp.sqrt(jnp.sum(gt**2, axis=-1, keepdims=True))


def _valid_mask(gt: jnp.ndarray, max_gtnorm: Optional[float]) -> jnp.ndarray:
    """(B,H,W) bool — finite gt (both channels), optional norm bound."""
    m = jnp.all(jnp.isfinite(gt), axis=-1)
    if max_gtnorm is not None:
        m = m & (_gtnorm(jnp.where(jnp.isfinite(gt), gt, 0.0))[..., 0] < max_gtnorm)
    return m


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(jnp.float32)
    return jnp.sum(x.astype(jnp.float32) * m) / jnp.clip(jnp.sum(m), 1.0)


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray, max_gtnorm: Optional[float] = None):
    """Plain masked L1, elementwise over valid entries (criterion.py:20-36).
    The torch version masks per-ELEMENT (gt[mask] with the (B,H,W,C) mask);
    with the all-channel finite convention both reduce identically."""
    mask = _valid_mask(gt, max_gtnorm)
    err = jnp.abs(jnp.where(jnp.isfinite(gt), gt, 0.0) - pred)
    return _masked_mean(jnp.mean(err, axis=-1), mask)


def laplacian_loss(pred, gt, conf, max_gtnorm: Optional[float] = None):
    """|gt-pred|.sum(C)/exp(conf) + conf over valid pixels (criterion.py:41-53,
    CroCo-Stereo on ETH3D)."""
    mask = _valid_mask(gt, max_gtnorm)
    l1 = jnp.sum(jnp.abs(jnp.where(jnp.isfinite(gt), gt, 0.0) - pred), axis=-1)
    conf = conf.astype(jnp.float32)
    return _masked_mean(l1 / jnp.exp(conf) + conf, mask)


def laplacian_loss_bounded(pred, gt, conf, max_gtnorm: float = 10000.0,
                           a: float = 0.25, b: float = 4.0):
    """CroCo-Flow variant: conf squashed to (a, b) via sigmoid, loss
    |err|/conf + log(conf) (criterion.py:56-69)."""
    mask = _valid_mask(gt, max_gtnorm)
    l1 = jnp.sum(jnp.abs(jnp.where(jnp.isfinite(gt), gt, 0.0) - pred), axis=-1)
    c = (b - a) * jax.nn.sigmoid(conf.astype(jnp.float32)) + a
    return _masked_mean(l1 / c + jnp.log(c), mask)


def laplacian_loss_bounded2(pred, gt, conf, max_gtnorm: Optional[float] = None,
                            a: float = 3.0, b: float = 3.0):
    """CroCo-Stereo variant (all but ETH3D): conf squashed to (-a, a),
    loss |err|/exp(conf) + conf (criterion.py:71-84)."""
    mask = _valid_mask(gt, max_gtnorm)
    l1 = jnp.sum(jnp.abs(jnp.where(jnp.isfinite(gt), gt, 0.0) - pred), axis=-1)
    c = 2.0 * a * (jax.nn.sigmoid(conf.astype(jnp.float32) / b) - 0.5)
    return _masked_mean(l1 / jnp.exp(c) + c, mask)


LOSSES = {
    "L1Loss": l1_loss,
    "LaplacianLoss": laplacian_loss,
    "LaplacianLossBounded": laplacian_loss_bounded,
    "LaplacianLossBounded2": laplacian_loss_bounded2,
}
WITH_CONF = {
    "L1Loss": False,
    "LaplacianLoss": True,
    "LaplacianLossBounded": True,
    "LaplacianLossBounded2": True,
}


def stereo_metrics(pred: jnp.ndarray, gt: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-batch stereo metrics (criterion.py:88-111): avgerr, rmse,
    bad@{0.5,1,2,3} in %. Per-image normalization then batch mean, like the
    reference."""
    b = pred.shape[0]
    mask = jnp.isfinite(gt)
    gtc = jnp.where(mask, gt, 999999.0)
    m = mask.reshape(b, -1).astype(jnp.float32)
    npx = jnp.sum(m, axis=1)
    l1 = (jnp.abs(gtc - pred) * mask).reshape(b, -1)
    l2 = (jnp.square(gtc - pred) * mask).reshape(b, -1)
    out = {
        "avgerr": jnp.mean(jnp.sum(l1, axis=1) / npx),
        "rmse": jnp.mean(jnp.sqrt(jnp.sum(l2, axis=1) / npx)),
    }
    for ths in (0.5, 1.0, 2.0, 3.0):
        bad = ((l1 > ths) & (m > 0)).astype(jnp.float32)
        out[f"bad@{ths:.1f}"] = jnp.mean(jnp.sum(bad, axis=1) / npx) * 100.0
    return out


def flow_metrics(pred: jnp.ndarray, gt: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-batch flow metrics (criterion.py:113-132): L1err, EPE,
    bad@{1,3,5} (on EPE) in %."""
    b = pred.shape[0]
    mask = jnp.isfinite(gt[..., 0])
    gtc = jnp.where(jnp.isfinite(gt), gt, 999999.0)
    m = mask.reshape(b, -1).astype(jnp.float32)
    npx = jnp.sum(m, axis=1)
    l1 = (jnp.sum(jnp.abs(gtc - pred), axis=-1) * mask).reshape(b, -1)
    l2 = (jnp.sqrt(jnp.sum(jnp.square(gtc - pred), axis=-1)) * mask).reshape(b, -1)
    out = {
        "L1err": jnp.mean(jnp.sum(l1, axis=1) / npx),
        "EPE": jnp.mean(jnp.sum(l2, axis=1) / npx),
    }
    for ths in (1.0, 3.0, 5.0):
        bad = ((l2 > ths) & (m > 0)).astype(jnp.float32)
        out[f"bad@{ths:.1f}"] = jnp.mean(jnp.sum(bad, axis=1) / npx) * 100.0
    return out


class StereoDatasetMetrics:
    """Streaming per-dataset aggregates (criterion.py:140-182): running mean
    L1 error over all valid pixels + bad-pixel counters. Host-side state,
    jnp batch math."""

    bad_ths = (0.5, 1.0, 2.0, 3.0)

    def __init__(self):
        self.reset()

    def reset(self):
        self.agg_n = 0
        self.agg_l1 = 0.0
        self.agg_nbad = [0 for _ in self.bad_ths]

    def add_batch(self, pred: jnp.ndarray, gt: jnp.ndarray) -> None:
        assert pred.shape[-1] == 1 and gt.shape[-1] == 1
        valid = jnp.isfinite(gt[..., 0])
        l1 = jnp.sum(jnp.abs(jnp.where(jnp.isfinite(gt), gt, 0.0) - pred), axis=-1)
        n = int(jnp.sum(valid))
        if n == 0:
            return
        new_n = self.agg_n + n
        batch_mean = float(_masked_mean(l1, valid))
        self.agg_l1 = self.agg_n / new_n * self.agg_l1 + batch_mean * n / new_n
        self.agg_n = new_n
        for i, th in enumerate(self.bad_ths):
            self.agg_nbad[i] += int(jnp.sum((l1 > th) & valid))

    def get_results(self) -> Dict[str, float]:
        out = {"L1err": self.agg_l1}
        for i, th in enumerate(self.bad_ths):
            out[f"bad@{th:.1f}"] = self.agg_nbad[i] / max(self.agg_n, 1) * 100.0
        return out


class FlowDatasetMetrics:
    """Streaming flow aggregates (criterion.py:184-251): running L1/EPE means,
    bad-pixel counters, and EPE per gt-speed bin."""

    bad_ths = (0.5, 1.0, 3.0, 5.0)
    speed_ths = ((0.0, 10.0), (10.0, 40.0), (40.0, float("inf")))

    def __init__(self):
        self.reset()

    def reset(self):
        self.agg_n = 0
        self.agg_l1 = 0.0
        self.agg_l2 = 0.0
        self.agg_nbad = [0 for _ in self.bad_ths]
        self.agg_epe_speed = [0.0 for _ in self.speed_ths]
        self.agg_n_speed = [0 for _ in self.speed_ths]

    def add_batch(self, pred: jnp.ndarray, gt: jnp.ndarray) -> None:
        assert pred.shape[-1] == 2 and gt.shape[-1] == 2
        valid = jnp.isfinite(gt[..., 0])
        gtc = jnp.where(jnp.isfinite(gt), gt, 0.0)
        l1 = jnp.sum(jnp.abs(gtc - pred), axis=-1)
        l2 = jnp.sqrt(jnp.sum(jnp.square(gtc - pred), axis=-1))
        speed = jnp.sqrt(jnp.sum(jnp.square(gtc), axis=-1))
        n = int(jnp.sum(valid))
        if n == 0:
            return
        new_n = self.agg_n + n
        self.agg_l1 = self.agg_n / new_n * self.agg_l1 + float(_masked_mean(l1, valid)) * n / new_n
        self.agg_l2 = self.agg_n / new_n * self.agg_l2 + float(_masked_mean(l2, valid)) * n / new_n
        self.agg_n = new_n
        for i, th in enumerate(self.bad_ths):
            self.agg_nbad[i] += int(jnp.sum((l2 > th) & valid))
        for i, (t1, t2) in enumerate(self.speed_ths):
            vv = valid & (speed >= t1) & (speed < t2)
            n_sp = int(jnp.sum(vv))
            if n_sp == 0:
                continue
            new_sp = self.agg_n_speed[i] + n_sp
            self.agg_epe_speed[i] = (
                self.agg_n_speed[i] / new_sp * self.agg_epe_speed[i]
                + float(_masked_mean(l2, vv)) * n_sp / new_sp
            )
            self.agg_n_speed[i] = new_sp

    def get_results(self) -> Dict[str, float]:
        out = {"L1err": self.agg_l1, "EPE": self.agg_l2}
        for i, th in enumerate(self.bad_ths):
            out[f"bad@{th:.1f}"] = self.agg_nbad[i] / max(self.agg_n, 1) * 100.0
        for i, (t1, t2) in enumerate(self.speed_ths):
            key = f"s{int(t1):d}" + (f"-{int(t2):d}" if t2 < float("inf") else "+")
            out[key] = self.agg_epe_speed[i]
        return out
