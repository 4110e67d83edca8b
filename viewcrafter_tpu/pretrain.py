"""Train steps for CroCo pretraining and DUSt3R two-view fine-tuning.

TPU-native equivalents of the reference's torch-DDP drivers:
- CroCo pretraining: extern/dust3r/croco/pretrain.py (MaskedMSE criterion,
  AdamW, AMP, DistributedSampler) -> a single jitted step over a ("dp",)
  mesh; XLA inserts the gradient all-reduce that DDP/NCCL did.
- DUSt3R fine-tune: extern/dust3r/train.py (ConfLoss(Regr3D(L21)) over
  symmetrized pairs) -> jitted step with the jnp loss stack in
  models/dust3r_losses.py.

Masking note: the CroCo mask has a STATIC per-row count (int(N*mask_ratio))
so every shape stays static under jit; the random permutation is sampled
inside the step from the step rng (croco/models/masking.py:12-25).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from viewcrafter_tpu.models.croco_pretrain import CroCoPretrain, masked_mse_loss
from viewcrafter_tpu.models.dust3r import Dust3rModel
from viewcrafter_tpu.models.dust3r_losses import conf_loss
from viewcrafter_tpu.training import TrainState


def _dp_shardings(mesh: Mesh):
    return NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))


def make_croco_pretrain_step(model: CroCoPretrain,
                             tx: optax.GradientTransformation,
                             mesh: Optional[Mesh] = None):
    """Jitted CroCo pretraining step. Batch dict:
      img1, img2: (B, H, W, 3) in [-1, 1]; img1 is masked and reconstructed.
    Parity: croco/pretrain.py:120-121 (MaskedMSE(norm_pix_loss)) with the
    model's cfg.norm_pix_loss; optimizer supplied by the caller (reference
    uses AdamW + cosine LR, utils (train_loop.make_optimizer matches)).
    """
    norm_pix = model.cfg.norm_pix_loss

    def loss_fn(params, batch, rng):
        pred, mask, target = model.apply(
            params, batch["img1"], batch["img2"], rng=rng)
        return masked_mse_loss(pred, mask, target, norm_pix_loss=norm_pix)

    def step_fn(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    if mesh is None:
        return jax.jit(step_fn)
    repl, dp = _dp_shardings(mesh)
    return jax.jit(step_fn,
                   in_shardings=(repl, {"img1": dp, "img2": dp}, repl),
                   out_shardings=(repl, repl))


def make_dust3r_train_step(model: Dust3rModel,
                           tx: optax.GradientTransformation,
                           mesh: Optional[Mesh] = None,
                           alpha: float = 0.2,
                           mode: str = "plain",
                           symmetrized: bool = False):
    """Jitted DUSt3R fine-tune step: ConfLoss(Regr3D) over a two-view batch.

    Batch: gt1/gt2 dicts with img (B,H,W,3), pts3d (B,H,W,3) world frame,
    valid_mask (B,H,W), camera_pose (B,4,4) c2w — the Co3dPairDataset item
    layout. `symmetrized` also runs the swapped pair and averages, matching
    the reference's pairs + their swaps in one batch (train.py --dataset
    "... aug_crop=16, mask_bg='rand'" with @-symmetrization).
    Loss parity: extern/dust3r/train.py (ConfLoss(Regr3D(L21), alpha=0.2)).
    """

    def pair_loss(params, gt1, gt2):
        out = model.apply(params, gt1["img"], gt2["img"])
        pred1 = {"pts3d": out["pts3d1"], "conf": out["conf1"]}
        pred2 = {"pts3d_in_other_view": out["pts3d2_in_view1"],
                 "conf": out["conf2"]}
        total, parts = conf_loss(gt1, gt2, pred1, pred2, alpha=alpha, mode=mode)
        return total, parts

    def loss_fn(params, batch):
        total, parts = pair_loss(params, batch["gt1"], batch["gt2"])
        if symmetrized:
            total2, _ = pair_loss(params, batch["gt2"], batch["gt1"])
            total = 0.5 * (total + total2)
        return total, parts

    def step_fn(state: TrainState, batch):
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1), loss, parts)

    if mesh is None:
        return jax.jit(step_fn)
    repl, dp = _dp_shardings(mesh)
    view = {"img": dp, "pts3d": dp, "valid_mask": dp, "camera_pose": dp}
    return jax.jit(step_fn,
                   in_shardings=(repl, {"gt1": view, "gt2": view}),
                   out_shardings=(repl, repl, repl))


def collate_views(views) -> dict:
    """Stack a list of Co3dPairDataset view dicts into a batched gt dict,
    dropping non-array metadata."""
    import numpy as np

    keys = ("img", "pts3d", "valid_mask", "camera_pose")
    return {k: jnp.asarray(np.stack([v[k] for v in views])) for k in keys}
