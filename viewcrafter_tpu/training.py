"""Training step for the video denoiser (v-prediction diffusion loss).

The reference ships vestigial PyTorch-Lightning training code
(lvdm/models/ddpm3d.py:786 training_step -> p_losses; DDP/NCCL helpers at
utils/diffusion_utils.py:74-81). This is the TPU-native equivalent: a pure
jitted train step — q_sample, v-target MSE, optax AdamW update — sharded over
a ("dp", "sp") mesh with XLA collectives instead of NCCL.

Loss parity (ddpm3d.py p_losses, parameterization='v'):
  x_t = sqrt(acp_t) x0 + sqrt(1-acp_t) eps
  target v = sqrt(acp_t) eps - sqrt(1-acp_t) x0
  loss = mean((v_pred - v)^2)   (l_simple, loss_type l2)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from viewcrafter_tpu.config import ModelConfig
from viewcrafter_tpu.models.unet3d import UNet3D
from viewcrafter_tpu.ops.schedule import DiffusionSchedule


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model: UNet3D, rng: jax.Array, cfg: ModelConfig,
                       tx: optax.GradientTransformation):
    t = cfg.video_length
    h, w = cfg.diffusion.latent_size
    n_img_tokens = cfg.resampler.num_queries * (cfg.resampler.video_length or 1)
    ctx_len = cfg.clip_text.context_length + n_img_tokens
    params = model.init(
        rng,
        jnp.zeros((1, t, h, w, cfg.unet.in_channels)),
        jnp.zeros((1,)),
        jnp.zeros((1, ctx_len, cfg.unet.context_dim)),
    )
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def make_train_step(model: UNet3D, sched: DiffusionSchedule,
                    tx: optax.GradientTransformation, mesh: Optional[Mesh] = None):
    """Build the jitted train step. Batch dict:
      latents: (B, T, h, w, 4)   clean video latents (scaled)
      cond_latents: (B, T, h, w, 4)  rendered-guidance latents (c_concat)
      context: (B, L, C)          cross-attention context
      fs: (B,)                    frame-stride conditioning
    """
    sqrt_acp = jnp.asarray(sched.sqrt_alphas_cumprod)
    sqrt_1macp = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)

    def loss_fn(params, batch, rng):
        x0 = batch["latents"].astype(jnp.float32)
        b = x0.shape[0]
        rng_t, rng_eps = jax.random.split(rng)
        t = jax.random.randint(rng_t, (b,), 0, sched.num_timesteps)
        eps = jax.random.normal(rng_eps, x0.shape, jnp.float32)
        sa = sqrt_acp[t][:, None, None, None, None]
        sb = sqrt_1macp[t][:, None, None, None, None]
        x_t = sa * x0 + sb * eps
        v_target = sa * eps - sb * x0
        x_in = jnp.concatenate([x_t, batch["cond_latents"].astype(jnp.float32)], axis=-1)
        v_pred = model.apply(params, x_in, t.astype(jnp.float32), batch["context"], fs=batch["fs"])
        return jnp.mean((v_pred - v_target) ** 2)

    def step_fn(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), loss

    if mesh is None:
        return jax.jit(step_fn)

    repl = NamedSharding(mesh, P())
    vid = NamedSharding(mesh, P("dp", "sp"))  # batch over dp, frames over sp
    batch_shardings = {
        "latents": vid,
        "cond_latents": vid,
        "context": NamedSharding(mesh, P("dp")),
        "fs": NamedSharding(mesh, P("dp")),
    }
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_shardings, repl),
        out_shardings=(repl, repl),
    )
