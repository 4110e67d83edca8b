"""Training loop: epochs, LR schedule, EMA, orbax save/resume, metric log.

The reference trains through PyTorch-Lightning (lvdm/models/ddpm3d.py:786
training_step, configure_optimizers at :1195-1246 with LambdaLR /
CosineAnnealingLR schedulers, LitEma at lvdm/ema.py). This is the TPU-native
equivalent wrapped around `training.make_train_step`:

  - optax AdamW with warmup + {cosine, linear, constant} decay;
  - EMA shadow params updated every step (utils/ema.py, LitEma parity);
  - orbax checkpointing of the FULL loop state (params, opt state, EMA, step,
    data rng) so a resumed run continues bit-identically;
  - a jsonl metric log (loss, lr, steps/s) instead of Lightning loggers.

Single-chip by default; pass a ("dp","sp") Mesh to shard batch/frames the
same way make_train_step does.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Iterable, Optional

import jax
import jax.numpy as jnp
import optax

from viewcrafter_tpu.config import ModelConfig
from viewcrafter_tpu.models.unet3d import UNet3D
from viewcrafter_tpu.ops.schedule import DiffusionSchedule
from viewcrafter_tpu.training import TrainState, create_train_state, make_train_step
from viewcrafter_tpu.utils.ema import EmaState, ema_init, ema_params, ema_update


@dataclasses.dataclass(frozen=True)
class TrainLoopConfig:
    lr: float = 1e-4  # base_learning_rate in the reference configs
    warmup_steps: int = 100
    decay_steps: int = 10_000
    schedule: str = "cosine"  # "cosine" | "linear" | "constant"
    end_lr_ratio: float = 0.01
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    ema_decay: float = 0.9999  # LitEma default (lvdm/ema.py:8)
    use_ema: bool = True
    remat: bool = True  # per-block gradient checkpointing (reference parity)
    max_steps: int = 1000
    ckpt_dir: Optional[str] = None
    save_every: int = 500
    log_every: int = 50
    log_path: Optional[str] = None


def make_lr_schedule(cfg: TrainLoopConfig):
    peak = cfg.lr
    end = peak * cfg.end_lr_ratio
    if cfg.schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, peak, cfg.warmup_steps, max(cfg.decay_steps, cfg.warmup_steps + 1), end)
    if cfg.schedule == "linear":
        warm = optax.linear_schedule(0.0, peak, cfg.warmup_steps)
        decay = optax.linear_schedule(
            peak, end, max(cfg.decay_steps - cfg.warmup_steps, 1))
        return optax.join_schedules([warm, decay], [cfg.warmup_steps])
    if cfg.schedule == "constant":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, peak, cfg.warmup_steps), optax.constant_schedule(peak)],
            [cfg.warmup_steps],
        )
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def make_optimizer(cfg: TrainLoopConfig) -> optax.GradientTransformation:
    sched = make_lr_schedule(cfg)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(sched, weight_decay=cfg.weight_decay),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LoopState:
    """Everything a resume needs, as one pytree."""

    train: TrainState
    ema: Optional[EmaState]
    rng: jax.Array


class TrainLoop:
    """Drives `make_train_step` over a batch iterable with checkpointing.

    `loader` yields batch dicts (see make_train_step docstring). Batches are
    assumed host numpy/jnp; device placement happens inside the jitted step.
    """

    def __init__(self, model_cfg: ModelConfig, loop_cfg: TrainLoopConfig,
                 mesh=None, model: Optional[UNet3D] = None):
        self.model_cfg = model_cfg
        self.cfg = loop_cfg
        self.mesh = mesh
        # remat = the reference's per-block gradient checkpointing
        # (lvdm/common.py:81-94) — needed for flagship-scale activations
        self.model = model or UNet3D(cfg=model_cfg.unet, remat=loop_cfg.remat)
        self.sched = DiffusionSchedule.create(
            timesteps=model_cfg.diffusion.timesteps,
            beta_schedule=model_cfg.diffusion.beta_schedule,
            linear_start=model_cfg.diffusion.linear_start,
            linear_end=model_cfg.diffusion.linear_end,
            rescale_betas_zero_snr=model_cfg.diffusion.rescale_betas_zero_snr,
        )
        self.tx = make_optimizer(loop_cfg)
        self.lr_fn = make_lr_schedule(loop_cfg)
        self.step_fn = make_train_step(self.model, self.sched, self.tx, mesh=mesh)
        self._ema_fn = jax.jit(ema_update, static_argnames=()) if loop_cfg.use_ema else None

    # -- state ---------------------------------------------------------------

    def init_state(self, rng: jax.Array) -> LoopState:
        r_init, r_loop = jax.random.split(rng)
        train = create_train_state(self.model, r_init, self.model_cfg, self.tx)
        ema = ema_init(train.params) if self.cfg.use_ema else None
        return LoopState(train=train, ema=ema, rng=r_loop)

    def _ckpt_path(self, step: int) -> str:
        return os.path.join(os.path.abspath(self.cfg.ckpt_dir), f"step_{step:08d}")

    def save(self, state: LoopState, step: int) -> str:
        from viewcrafter_tpu.utils.checkpoint import save_params

        path = self._ckpt_path(step)
        save_params(path, state)
        return path

    def latest_checkpoint(self) -> Optional[str]:
        d = os.path.abspath(self.cfg.ckpt_dir) if self.cfg.ckpt_dir else None
        if not d or not os.path.isdir(d):
            return None
        steps = sorted(p for p in os.listdir(d) if p.startswith("step_"))
        return os.path.join(d, steps[-1]) if steps else None

    def restore(self, path: str, rng: jax.Array) -> LoopState:
        """Restore a LoopState saved by `save` (shape/dtype template comes
        from an abstract init, so nothing is materialized twice)."""
        from viewcrafter_tpu.utils.checkpoint import load_params

        like = jax.eval_shape(self.init_state, rng)
        # orbax needs concrete shardings on the template; replicate over the
        # mesh when training sharded, else pin to the default device (NOT
        # local_devices()[0] — under the axon sandbox that is the TPU, and a
        # resumed run would silently continue on different hardware)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            sharding = NamedSharding(self.mesh, PartitionSpec())
        else:
            dev = jax.config.jax_default_device or jax.devices()[0]
            sharding = jax.sharding.SingleDeviceSharding(dev)
        like = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sharding), like
        )
        restored = load_params(path, like=like)
        if self.mesh is not None:
            return restored
        # Re-hydrate as ordinary uncommitted default-device arrays: orbax
        # returns COMMITTED arrays, which key a separate jit trace of step_fn;
        # a second compile may bind different layouts and break bit-identical
        # resume. This round-trip makes resumed steps reuse the exact
        # executable the uninterrupted run uses.
        import numpy as np

        return jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)), restored)

    # -- loop ----------------------------------------------------------------

    def run(self, loader: Iterable[dict], rng: jax.Array,
            state: Optional[LoopState] = None, resume: bool = True) -> LoopState:
        cfg = self.cfg
        if state is None:
            latest = self.latest_checkpoint() if resume else None
            state = self.restore(latest, rng) if latest else self.init_state(rng)

        log_f = open(cfg.log_path, "a") if cfg.log_path else None
        t_last = time.time()
        step = int(state.train.step)
        it = iter(loader)
        while step < cfg.max_steps:
            try:
                batch = next(it)
            except StopIteration:  # new epoch
                it = iter(loader)
                batch = next(it)
            state_rng, step_rng = jax.random.split(state.rng)
            train, loss = self.step_fn(state.train, batch, step_rng)
            ema = state.ema
            if self._ema_fn is not None:
                ema = self._ema_fn(ema, train.params, cfg.ema_decay)
            state = LoopState(train=train, ema=ema, rng=state_rng)
            step += 1

            if cfg.log_every and step % cfg.log_every == 0:
                loss_v = float(loss)
                dt = time.time() - t_last
                rec = {
                    "step": step, "loss": loss_v,
                    "lr": float(self.lr_fn(step)),
                    "steps_per_s": round(cfg.log_every / max(dt, 1e-9), 3),
                }
                t_last = time.time()
                if log_f:
                    log_f.write(json.dumps(rec) + "\n")
                    log_f.flush()
                else:
                    print(json.dumps(rec))
            if cfg.ckpt_dir and cfg.save_every and step % cfg.save_every == 0:
                self.save(state, step)
        if cfg.ckpt_dir:
            self.save(state, step)
        if log_f:
            log_f.close()
        return state

    def eval_params(self, state: LoopState):
        """Parameters to evaluate with: EMA shadow when enabled (the
        reference's ema_scope, ddpm3d.py model_ema usage), else live."""
        return ema_params(state.ema) if state.ema is not None else state.train.params
