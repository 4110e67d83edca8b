"""Tensor-parallel sharding constraints for the UNet (SURVEY §2.6: "TP
options for UNet attention/convs — shard heads/channels").

The reference has no tensor parallelism (single CUDA device); this is
TPU-native design: a ("dp", "sp", "tp") mesh where "tp" shards

  - attention heads: q/k/v (.., H, D) tensors split over H — each device
    computes its head slice locally; the out-projection contracts the
    head-sharded inner axis, so XLA inserts one psum per attention;
  - conv / GEGLU channels: ResBlock conv outputs and the FF hidden split
    over the channel axis (Megatron-style column/row parallel, expressed
    as sharding constraints — XLA's SPMD partitioner places the
    collectives on ICI).

Mechanism: `activate(mesh)` marks a mesh active for the duration of a
trace (plain Python context — with_sharding_constraint placement happens
at trace time); `constrain(x, *spec)` is a no-op unless a tp>1 mesh is
active, so the model code stays zero-cost for the default single-chip
path. Axis names absent from the active mesh (or of size 1) are dropped
from the spec, so the same call sites serve tp-only, dp x tp, and
dp x sp x tp meshes.

The Pallas kernels (fullkv/flash/fused-layer) are opaque to the SPMD
partitioner — under an active tp mesh the fuse gates fall back to the
XLA paths so the partitioner can actually split the matmuls
(models/unet3d.py, models/layers.py, ops/attention.py consult
`active_mesh()`).
"""

from __future__ import annotations

import contextlib
from typing import Optional

_ACTIVE = None


def active_mesh():
    """The tp-active mesh set by `activate`, or None (trace-time value)."""
    return _ACTIVE


@contextlib.contextmanager
def activate(mesh: Optional["jax.sharding.Mesh"]):  # noqa: F821
    """Mark `mesh` tp-active while tracing the enclosed computation. A mesh
    without a "tp" axis (or with tp=1) deactivates — callers can pass
    whatever mesh they run under."""
    global _ACTIVE
    prev = _ACTIVE
    tp = dict(mesh.shape).get("tp", 1) if mesh is not None else 1
    _ACTIVE = mesh if tp > 1 else None
    try:
        yield
    finally:
        _ACTIVE = prev


def constrain(x, *spec):
    """with_sharding_constraint(x, P(*spec)) against the active tp mesh;
    identity when no tp mesh is active. len(spec) must equal x.ndim; each
    entry is an axis name, a tuple of axis names, or None. Names missing
    from the active mesh (or of size 1) are dropped."""
    mesh = _ACTIVE
    if mesh is None:
        return x
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert len(spec) == x.ndim, (spec, x.shape)
    sizes = dict(mesh.shape)

    def keep(entry):
        if entry is None:
            return None
        names = entry if isinstance(entry, tuple) else (entry,)
        names = tuple(n for n in names if sizes.get(n, 1) > 1)
        if not names:
            return None
        return names if len(names) > 1 else names[0]

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*(keep(s) for s in spec)))
    )
