"""Multi-chip sharding validation on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from viewcrafter_tpu.config import get_model_config
from viewcrafter_tpu.models.unet3d import UNet3D
from viewcrafter_tpu.ops.schedule import DiffusionSchedule
from viewcrafter_tpu.parallel.mesh import make_mesh, replicate, shard_video_batch
from viewcrafter_tpu.training import create_train_state, make_train_step


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape["dp"] * mesh.shape["sp"] * mesh.shape["tp"] == 8
    assert mesh.shape["tp"] == 1  # default mesh is the historical dp x sp
    tp_mesh = make_mesh(8, dp=2, tp=2)
    assert (tp_mesh.shape["dp"], tp_mesh.shape["sp"], tp_mesh.shape["tp"]) == (2, 2, 2)


def test_dryrun_multichip_entrypoint():
    """The driver-facing dry run (subprocess with its own virtual CPU mesh):
    sharded train step + sharded staged-DDIM inference."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_generation_matches_single_device():
    """dp x sp sharded generate_staged == single-device output (in-process)."""
    from viewcrafter_tpu._dryrun import inference_dryrun

    inference_dryrun(make_mesh(8))


def test_train_step_runs_and_descends():
    """Single-device train step: loss finite, params change."""
    cfg = get_model_config("viewcrafter_tiny")
    model = UNet3D(cfg=cfg.unet, dtype=jnp.float32)
    sched = DiffusionSchedule.create()
    tx = optax.adamw(1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), cfg, tx)
    step = make_train_step(model, sched, tx)
    h, w = cfg.diffusion.latent_size
    t = cfg.video_length
    ctx_len = cfg.clip_text.context_length + cfg.resampler.num_queries * cfg.resampler.video_length
    batch = {
        "latents": jnp.ones((1, t, h, w, 4)) * 0.1,
        "cond_latents": jnp.zeros((1, t, h, w, 4)),
        "context": jnp.zeros((1, ctx_len, cfg.unet.context_dim)),
        "fs": jnp.full((1,), 10.0),
    }
    before = state.params["params"]["time_embed_0"]["kernel"]
    state2, loss = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    after = state2.params["params"]["time_embed_0"]["kernel"]
    assert np.abs(np.asarray(after) - np.asarray(before)).max() > 0
    assert int(state2.step) == 1
