"""Fused transformer FeedForward LAYER: LayerNorm + GEGLU + out projection
in ONE Pallas kernel.

The unfused chain (models/layers.py FeedForward: LN -> Dense(C, 2I) -> split
-> x*gelu(gate) -> Dense(I, C)) materializes the (tokens, 2I) GEGLU
activation in HBM — at flagship ds1 (I = 4C = 1280) that intermediate is 8x
the activation bytes, ~4.7 GB of write+read per call against a 2-pass floor
over x. This kernel streams token tiles through VMEM: the only HBM traffic
is x in, out out, and the resident weights.

Token-wise ops only, so it serves every FF site (spatial (B*T, S, C) and
temporal (B, T, S, C) transformer blocks) through a flat (N, C) view.

Semantics match the reference composition exactly (attention.py:415-442):
f32 LayerNorm (torch eps 1e-5), bf16 matmuls with f32 accumulation, exact
erf GELU in f32 on the gate half. Output is the FF branch WITHOUT the
residual add (PAB ff-cache semantics, models/unet3d.py cache.site).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """f32 erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7 — far
    below bf16 output precision): Pallas TPU has no erf/erfc lowering."""
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
            inner: int, eps: float):
    x = x_ref[...]  # (tile, c)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * lax.rsqrt(var + eps) * lns_ref[0] + lnb_ref[0]).astype(x.dtype)

    y = lax.dot_general(
        xn, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b1_ref[0]            # (tile, 2*inner)
    h, gate = y[:, :inner], y[:, inner:]
    # erf GELU (reference torch.nn.functional.gelu default) — erf via the
    # in-kernel polynomial above
    gf = gate.astype(jnp.float32)
    gelu = 0.5 * gf * (1.0 + _erf(gf * (2.0 ** -0.5)))
    g = h * gelu.astype(h.dtype)

    o = lax.dot_general(
        g, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b2_ref[0]            # (tile, c_out)
    o_ref[...] = o


def _pick_tile(n: int, c: int, inner: int, budget: int = 80 * 1024 * 1024,
               itemsize: int = 2) -> int:
    es = itemsize  # activation element size (bf16 2, f32 4)
    w_bytes = (c * 2 * inner + inner * c) * es
    for tile in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if n % tile:
            continue
        blocks = 2 * 2 * tile * c * es                    # in+out, double-buffered
        inter = tile * (c * 4 + 2 * inner * 2 * es + inner * es)  # xn f32, y+gelu, g
        if blocks + inter + w_bytes <= budget:
            return tile
    return 0


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_ff_layer(x, ln_scale, ln_bias, w1, b1, w2, b2, *,
                   eps: float = 1e-5, interpret: bool = False):
    """x: (..., C). w1: (C, 2I) GEGLU projection, w2: (I, C_out).
    Returns LayerNorm -> GEGLU -> out-projection shaped (..., C_out)."""
    orig_shape = x.shape
    c = orig_shape[-1]
    inner = w2.shape[0]
    c_out = w2.shape[1]
    n = 1
    for dim in orig_shape[:-1]:
        n *= dim
    x2 = x.reshape(n, c)
    tile = _pick_tile(n, c, inner, itemsize=x.dtype.itemsize)
    assert tile, f"N={n} has no supported tile"
    dt = x.dtype
    spec = pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((tile, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cspec = lambda w: pl.BlockSpec(w, lambda i: (0,) * len(w),  # noqa: E731
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, inner=inner, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, c_out), dt),
        grid=(n // tile,),
        in_specs=[
            spec,
            cspec((1, c)), cspec((1, c)),
            cspec((c, 2 * inner)), cspec((1, 2 * inner)),
            cspec((inner, c_out)), cspec((1, c_out)),
        ],
        out_specs=ospec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, ln_scale.reshape(1, c).astype(jnp.float32),
      ln_bias.reshape(1, c).astype(jnp.float32),
      w1.astype(dt), b1.reshape(1, 2 * inner).astype(dt),
      w2.astype(dt), b2.reshape(1, c_out).astype(dt))
    return out.reshape(orig_shape[:-1] + (c_out,))


def supports_fused_ff(x_shape, c: int, inner: int, itemsize: int = 2) -> bool:
    n = 1
    for dim in x_shape[:-1]:
        n *= dim
    return x_shape[-1] == c and _pick_tile(n, c, inner, itemsize=itemsize) > 0
