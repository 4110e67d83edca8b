"""Multi-chip dry run (subprocess target).

Run via ``python -m viewcrafter_tpu._dryrun N``. The caller
(``__graft_entry__.dryrun_multichip``) prepares the environment
(``JAX_PLATFORMS`` with cpu first, ``--xla_force_host_platform_device_count=N``)
*before* this interpreter starts, because those flags must precede jax
backend initialization. The sandbox additionally force-registers an
experimental TPU platform via sitecustomize, so we also pin jax's default
device to the first virtual CPU device (same trick as tests/conftest.py).

Two sharded programs are validated on an n-device ("dp", "sp") mesh:

  1. the full training step — batch over dp, video frames over sp; the
     temporal UNet stages trigger XLA collectives over sp
     (viewcrafter_tpu/training.py);
  2. a dp x sp sharded staged DDIM *inference* run of the tiny preset —
     the same `generate_staged` program the pipeline ships, with the
     sample batch over dp and frames over sp (models/lvdm.py).

The reference has no parallelism at inference (SURVEY §2.6: one CUDA
device); both programs here are new TPU-native design, not ports.
"""

from __future__ import annotations

import sys


def _cpu_mesh(n_devices: int):
    import jax

    from viewcrafter_tpu.parallel.mesh import make_mesh

    cpus = jax.local_devices(backend="cpu")
    if len(cpus) < n_devices:
        raise RuntimeError(
            f"need {n_devices} virtual CPU devices, found {len(cpus)} — "
            "was --xla_force_host_platform_device_count set before jax init?"
        )
    jax.config.update("jax_default_device", cpus[0])
    return make_mesh(n_devices, devices=cpus)


def train_dryrun(mesh) -> float:
    """One sharded training step on tiny shapes; returns the (finite) loss."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from viewcrafter_tpu.config import get_model_config
    from viewcrafter_tpu.models.unet3d import UNet3D
    from viewcrafter_tpu.ops.schedule import DiffusionSchedule
    from viewcrafter_tpu.parallel.mesh import replicate, shard_video_batch
    from viewcrafter_tpu.training import create_train_state, make_train_step

    cfg = get_model_config("viewcrafter_tiny")
    dp, sp = mesh.shape["dp"], mesh.shape["sp"]
    b = dp
    t = (max(cfg.video_length, sp) + sp - 1) // sp * sp

    model = UNet3D(cfg=cfg.unet, dtype=jnp.float32)
    sched = DiffusionSchedule.create(timesteps=cfg.diffusion.timesteps)
    tx = optax.adamw(1e-4)
    model_cfg = dataclasses.replace(cfg, video_length=t)
    state = create_train_state(model, jax.random.PRNGKey(0), model_cfg, tx)
    state = replicate(state, mesh)

    h, w = cfg.diffusion.latent_size
    ctx_len = cfg.clip_text.context_length + cfg.resampler.num_queries * (
        cfg.resampler.video_length or 1
    )
    batch = {
        "latents": shard_video_batch(jnp.ones((b, t, h, w, 4)), mesh),
        "cond_latents": shard_video_batch(jnp.ones((b, t, h, w, 4)), mesh),
        "context": jnp.zeros((b, ctx_len, cfg.unet.context_dim)),
        "fs": jnp.full((b,), 10.0),
    }
    step = make_train_step(model, sched, tx, mesh=mesh)
    with mesh:
        state, loss = step(state, batch, jax.random.PRNGKey(1))
    loss = float(jax.block_until_ready(loss))
    assert jnp.isfinite(loss), f"non-finite training loss {loss}"
    return loss


def inference_dryrun(mesh) -> None:
    """One sharded staged-DDIM generation (the shipped inference program)
    over the mesh, checked finite AND bit-equal to the single-device run."""
    import dataclasses
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from viewcrafter_tpu.config import get_model_config
    from viewcrafter_tpu.models.lvdm import VideoDiffusionEngine
    from viewcrafter_tpu.sampling.ddim import GuidanceConfig

    os.environ.setdefault("VIEWCRAFTER_ATTN_IMPL", "xla")  # no Pallas on CPU
    dp, sp = mesh.shape["dp"], mesh.shape["sp"]
    cfg = get_model_config("viewcrafter_tiny")
    t = (max(cfg.video_length, sp) + sp - 1) // sp * sp
    cfg = dataclasses.replace(cfg, video_length=t)
    engine = VideoDiffusionEngine(cfg, dtype=jnp.float32)
    params = jax.jit(engine.init_params)(jax.random.PRNGKey(0))

    b = dp  # one sample per dp slice (multi-sample generation rides dp)
    frames = jnp.linspace(-1.0, 1.0, b * t * cfg.height * cfg.width * 3).reshape(
        b, t, cfg.height, cfg.width, 3
    )
    ids = jnp.zeros((b, cfg.clip_text.context_length), jnp.int32)
    rng = jax.random.PRNGKey(7)
    kwargs = dict(
        steps=2, guidance=GuidanceConfig(scale=7.5), fs=10, chunk=2
    )
    video = engine.generate_staged(params, frames, ids, ids, rng, mesh=mesh, **kwargs)
    video = jax.block_until_ready(video)
    assert video.shape == (b, t, cfg.height, cfg.width, 3), video.shape
    assert bool(jnp.all(jnp.isfinite(video))), "non-finite sharded generation"
    ref = engine.generate_staged(params, frames, ids, ids, rng, **kwargs)
    np.testing.assert_allclose(
        np.asarray(video), np.asarray(ref), atol=2e-5,
        err_msg="sharded generation diverges from single-device",
    )

    # CFG-branch dp for a SINGLE sample (VERDICT r4 #3, roofline <=60 s
    # path): b=1 cannot shard over dp, so the K=2 tiled guidance branches
    # shard instead (models/lvdm.py _denoise_fn branch_mesh). Must be
    # bit-compatible with the single-device chain.
    video1 = engine.generate_staged(
        params, frames[:1], ids[:1], ids[:1], rng, mesh=mesh, **kwargs
    )
    video1 = jax.block_until_ready(video1)
    assert bool(jnp.all(jnp.isfinite(video1))), "non-finite CFG-dp generation"
    ref1 = engine.generate_staged(params, frames[:1], ids[:1], ids[:1], rng, **kwargs)
    np.testing.assert_allclose(
        np.asarray(video1), np.asarray(ref1), atol=2e-5,
        err_msg="CFG-dp sharded generation diverges from single-device",
    )

    # tensor parallelism (SURVEY §2.6 "TP options for UNet attention/convs"):
    # a dp x sp x tp mesh shards attention heads / conv channels over tp
    # (parallel/tp.py constraints engage via _denoise_fn tp_mesh) on top of
    # the CFG-branch dp and frame sp; must match single-device bitwise-close.
    devs = mesh.devices.flatten()
    if devs.size >= 8:
        from viewcrafter_tpu.parallel.mesh import make_mesh

        tp_mesh = make_mesh(8, dp=2, tp=2, devices=list(devs))
        video_tp = engine.generate_staged(
            params, frames[:1], ids[:1], ids[:1], rng, mesh=tp_mesh, **kwargs
        )
        video_tp = jax.block_until_ready(video_tp)
        assert bool(jnp.all(jnp.isfinite(video_tp))), "non-finite TP generation"
        np.testing.assert_allclose(
            np.asarray(video_tp), np.asarray(ref1), atol=2e-5,
            err_msg="dp x sp x tp sharded generation diverges from single-device",
        )


def flagship_compile_dryrun(mesh, name: str = "") -> str:
    """AOT-compile the REAL flagship training-step program over the dp x sp
    mesh with abstract inputs (VERDICT r3 #6): params, optimizer state and
    batch are ShapeDtypeStructs, so the 1.4 B-param model is never
    materialized — but XLA still runs the SPMD partitioner and layout
    assignment, which is where flagship-only sharding bugs (uneven tiling,
    collective layouts, OOM-shaped all-gathers) live. Returns a summary."""
    import dataclasses
    import os
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from viewcrafter_tpu.config import get_model_config
    from viewcrafter_tpu.models.unet3d import UNet3D
    from viewcrafter_tpu.ops.schedule import DiffusionSchedule
    from viewcrafter_tpu.training import create_train_state, make_train_step

    name = name or os.environ.get("VIEWCRAFTER_DRYRUN_FLAGSHIP", "viewcrafter_25")
    if name in ("", "none"):
        return "flagship compile skipped (VIEWCRAFTER_DRYRUN_FLAGSHIP unset)"
    cfg = get_model_config(name)
    dp, sp = mesh.shape["dp"], mesh.shape["sp"]
    # frames round UP to an sp multiple (25 -> 28 at sp=4): jit in_shardings
    # need a divisible axis; same convention as the executed tiny dryrun
    t = -(-cfg.video_length // sp) * sp
    model_cfg = dataclasses.replace(cfg, video_length=t)
    # remat=True is the shipped flagship *training* configuration
    model = UNet3D(cfg=cfg.unet, remat=True)
    sched = DiffusionSchedule.create(timesteps=cfg.diffusion.timesteps)
    tx = optax.adamw(1e-4)

    repl = NamedSharding(mesh, P())
    vid = NamedSharding(mesh, P("dp", "sp"))
    dps = NamedSharding(mesh, P("dp"))

    def _abs(shapes, sharding):
        return jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sharding), shapes)

    state_abs = _abs(
        jax.eval_shape(lambda r: create_train_state(model, r, model_cfg, tx),
                       jax.random.PRNGKey(0)),
        repl,
    )
    h, w = cfg.diffusion.latent_size
    ctx_len = cfg.clip_text.context_length + cfg.resampler.num_queries * (
        cfg.resampler.video_length or 1
    )
    batch_abs = {
        "latents": jax.ShapeDtypeStruct((dp, t, h, w, 4), jnp.float32, sharding=vid),
        "cond_latents": jax.ShapeDtypeStruct((dp, t, h, w, 4), jnp.float32, sharding=vid),
        "context": jax.ShapeDtypeStruct(
            (dp, ctx_len, cfg.unet.context_dim), jnp.float32, sharding=dps),
        "fs": jax.ShapeDtypeStruct((dp,), jnp.float32, sharding=dps),
    }
    rng_abs = _abs(jax.eval_shape(jax.random.PRNGKey, 0), repl)

    step = make_train_step(model, sched, tx, mesh=mesh)
    t0 = time.time()
    compiled = step.lower(state_abs, batch_abs, rng_abs).compile()
    n_params = sum(
        int(np.prod(s.shape)) for s in
        jax.tree_util.tree_leaves(state_abs.params)
    ) if hasattr(state_abs, "params") else 0
    del compiled
    return (f"flagship compile ok: {name} ({n_params/1e9:.2f}B params, "
            f"t={t} dp={dp} sp={sp}, {time.time()-t0:.0f}s AOT)")


def main(n_devices: int) -> None:
    import jax

    # single-core box: persistent compile cache makes re-runs cheap
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    mesh = _cpu_mesh(n_devices)
    dp, sp = mesh.shape["dp"], mesh.shape["sp"]
    loss = train_dryrun(mesh)
    print(f"train step ok: dp={dp} sp={sp}, loss={loss:.4f}", flush=True)
    inference_dryrun(mesh)
    print(f"sharded inference ok: dp={dp} sp={sp} (sample-dp, single-sample "
          "CFG-dp, and dp x sp x tp head/channel TP all match single-device)",
          flush=True)
    print(flagship_compile_dryrun(mesh), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
