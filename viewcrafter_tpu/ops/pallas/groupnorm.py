"""Fused GroupNorm(+SiLU) Pallas kernel.

Motivation (profiled on v5e, flagship UNet eval = 1.18 s): XLA leaves the
fp32 GroupNorm chain partially unfused — `sub` 97 ms + `reduce_sum` 32 ms +
`convert_element_type` 26 ms of pure VPU/HBM overhead per eval. This kernel
computes mean/var/normalize/affine/SiLU in a two-phase pass over S-tiles held
in VMEM with fp32 accumulation: phase 0 accumulates per-group statistics,
phase 1 normalizes and writes bf16 out. Total HBM traffic = 2 reads + 1 write
of the activation — the minimum for exact (non-streamed) group stats.

Mosaic notes: the lane dim (C) cannot be split into (G, C/G) vectors, so
channel<->group reductions run as tiny one-hot matmuls on the MXU. The TPU
grid is sequential, so VMEM scratch legally carries the accumulators across
grid steps (phase encoded as a grid dimension).

Layout: x (N, S, C) channels-last (callers flatten B*T and H*W). Grid
(N, 2, S/tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fp32 elements per S-tile we allow in VMEM (a few live copies each)
_MAX_TILE_ELEMS = 640 * 1024


def _pick_tile(s: int, c: int):
    """Largest S-tile that (a) divides S, (b) is sublane-aligned (multiple of
    8) or covers all of S, (c) fits the VMEM budget. None -> caller falls back."""
    limit = max(1, _MAX_TILE_ELEMS // c)
    best = None
    for t in range(8, min(s, limit) + 1, 8):
        if s % t == 0:
            best = t
    if best is None and s <= limit:
        best = s  # whole-array block: exempt from the divisibility rule
    return best


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, acc_ref, stat_ref,
               *, num_groups: int, eps: float, with_silu: bool, n_elems_per_group: float):
    phase = pl.program_id(1)
    j = pl.program_id(2)
    n_tiles = pl.num_programs(2)
    x = x_ref[0].astype(jnp.float32)  # (tile_s, C)
    c = x.shape[1]
    cg = c // num_groups

    @pl.when(jnp.logical_and(phase == 0, j == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _():
        acc_ref[0] += jnp.sum(x, axis=0)
        acc_ref[1] += jnp.sum(x * x, axis=0)

    @pl.when(jnp.logical_and(phase == 0, j == n_tiles - 1))
    def _():
        ch_group = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cg
        grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
        onehot_cg = (ch_group == grp).astype(jnp.float32)  # (C, G)
        onehot_gc = jnp.swapaxes(onehot_cg, 0, 1)  # (G, C)
        sums = acc_ref[:]  # (2, C)
        g = jnp.dot(sums, onehot_cg, preferred_element_type=jnp.float32)  # (2, G)
        mean_g = g[0] / n_elems_per_group
        var_g = g[1] / n_elems_per_group - mean_g * mean_g
        inv_g = jax.lax.rsqrt(jnp.maximum(var_g, 0.0) + eps)
        both = jnp.stack([mean_g, inv_g])  # (2, G)
        stat_ref[:] = jnp.dot(both, onehot_gc, preferred_element_type=jnp.float32)  # (2, C)

    @pl.when(phase == 1)
    def _():
        mean_c = stat_ref[0]
        inv_c = stat_ref[1]
        y = (x - mean_c) * inv_c * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
        if with_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "with_silu", "interpret"))
def group_norm_fused(
    x: jnp.ndarray,  # (N, S, C)
    scale: jnp.ndarray,  # (C,)
    bias: jnp.ndarray,  # (C,)
    num_groups: int = 32,
    eps: float = 1e-5,
    with_silu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    n, s, c = x.shape
    tile = _pick_tile(s, c)
    n_per_group = float(s * (c // num_groups))
    kernel = functools.partial(
        _gn_kernel, num_groups=num_groups, eps=eps, with_silu=with_silu,
        n_elems_per_group=n_per_group,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, s, c), x.dtype),
        grid=(n, 2, s // tile),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, p, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, p, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, p, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda i, p, j: (i, j, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, c), jnp.float32),  # [sum, sumsq] accumulators
            pltpu.VMEM((2, c), jnp.float32),  # [mean_c, inv_c]
        ],
        interpret=interpret,
    )(x, scale, bias)


def group_norm_silu(x, scale, bias, num_groups=32, eps=1e-5, with_silu=True, interpret=False):
    """Dispatcher: fused Pallas on TPU, else the plain XLA formulation
    (identical math)."""
    orig_shape = x.shape
    c = orig_shape[-1]
    n = orig_shape[0]
    s = 1
    for d in orig_shape[1:-1]:
        s *= d
    from viewcrafter_tpu.parallel import tp as _tp

    if (_on_tpu() and not interpret and _tp.active_mesh() is None
            and c % 128 == 0 and _pick_tile(s, c) is not None):
        y = group_norm_fused(x.reshape(n, s, c), scale, bias, num_groups, eps, with_silu)
        return y.reshape(orig_shape)
    # XLA fallback. Stats always accumulate in fp32; the elementwise
    # normalize runs in fp32 by default (reference parity) or bf16 when
    # VIEWCRAFTER_GN_BF16=1 (halves GN HBM traffic; ~1e-3 rel activation error)
    import os

    elem_dtype = jnp.bfloat16 if os.environ.get("VIEWCRAFTER_GN_BF16") == "1" else jnp.float32
    xs = x.reshape(n, s, num_groups, c // num_groups)
    xf = xs.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    y = (xs.astype(elem_dtype) - mean.astype(elem_dtype)) * inv.astype(elem_dtype)
    y = y.reshape(n, s, c) * scale.astype(elem_dtype) + bias.astype(elem_dtype)
    if with_silu:
        y = y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(elem_dtype)
    return y.astype(x.dtype).reshape(orig_shape)


def _on_tpu() -> bool:
    import os

    if os.environ.get("VIEWCRAFTER_ATTN_IMPL") == "xla":  # test environments
        return False
    # measured on v5e: the fused kernel's 2-read+1-write traffic LOSES to
    # XLA's own fusion of the GN chain into consumers (1253 -> 1406 ms per
    # flagship UNet eval), so it's opt-in until a smarter single-read design
    if os.environ.get("VIEWCRAFTER_GN_FUSED", "0") != "1":
        return False
    try:
        d = jax.config.jax_default_device
        if d is not None:
            return getattr(d, "platform", None) == "tpu"
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
