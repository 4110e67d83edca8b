"""Device-mesh + sharding helpers (the framework's "distributed backend").

The reference has no parallelism at inference (SURVEY.md §2.6: one CUDA
device; NCCL only in vestigial training helpers). TPU-native scaling is new
design, built on `jax.sharding`:

  - mesh axes: ("dp", "sp") — data parallel over the batch/CFG-branch axis,
    sequence parallel over the video-frame axis. Spatial UNet stages treat
    frames as batch entries, so an "sp"-sharded time axis runs fully local;
    XLA inserts all-gathers only around the (tiny) temporal-attention /
    temporal-conv stages, and those collectives ride ICI.
  - parameters are replicated (inference-sized models fit one v5e chip;
    sharded-param TP is a later optimization documented in SURVEY §2.6).

Multi-sample / multi-segment generation shards trivially over "dp"
(independent DDIM chains per sample).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: int = 1,
    devices=None,
) -> Mesh:
    """Create a ("dp", "sp", "tp") mesh over the first n devices. Falls back
    to the virtual CPU devices when the default platform has too few (the
    multichip dry-run path). tp > 1 enables tensor parallelism over UNet
    attention heads / conv channels (parallel/tp.py); the default tp=1 mesh
    behaves exactly like the historical ("dp", "sp") mesh."""
    if devices is None:
        devices = jax.devices()
        if n_devices and len(devices) < n_devices:
            devices = jax.local_devices(backend="cpu")
    n = n_devices or len(devices)
    devices = devices[:n]
    assert n % tp == 0, f"cannot factor {n} devices with tp={tp}"
    n_ds = n // tp
    if dp is None:
        dp = 2 if n_ds % 2 == 0 and n_ds > 1 else 1
    sp = n_ds // dp
    assert dp * sp * tp == n, (
        f"cannot factor {n} devices into dp={dp} x sp={sp} x tp={tp}"
    )
    arr = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(arr, axis_names=("dp", "sp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, T, ...) video batches: batch over dp, frames over sp."""
    return NamedSharding(mesh, P("dp", "sp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_video_batch(x, mesh: Mesh):
    """Place a (B, T, H, W, C) array with batch->dp, time->sp."""
    return jax.device_put(x, batch_sharding(mesh))


def replicate(tree, mesh: Mesh):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)
