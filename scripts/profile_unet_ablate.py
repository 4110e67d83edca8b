"""Marginal-cost accounting of one flagship UNet eval (KB=2, shared_prefix).

Measures the full eval, then re-measures with one op class at a time replaced
by a cheap data-dependent passthrough (NOT zeros — XLA's algebraic simplifier
would fold `0 + x` / `0 @ w` chains and wipe out downstream work, inflating
the attribution). marginal(op) = full - ablated(op). Sums won't equal the
total (fusion, overlap) but they rank the levers honestly.

Run: python scripts/profile_unet_ablate.py [names...]
names: spatial temporal tconv conv ff gn cross all
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import viewcrafter_tpu.models.unet3d as unet3d
import viewcrafter_tpu.models.layers as layers
import viewcrafter_tpu.ops.pallas.cross_attention as pcross
from viewcrafter_tpu.config import get_model_config
from viewcrafter_tpu.models.lvdm import cast_params_bf16
from viewcrafter_tpu.models.unet3d import UNet3D


def timeit(fn, *args, reps=4, inner=1):
    """inner=1: one ~2.2 s eval dwarfs the tunnel round-trip, and chaining
    multiple evals in one program broke the remote-compile helper (broken
    pipe at ~3x flagship program size).

    args[0] must be the PARAMS pytree (passed as a real argument — closing
    over it captures 2.9 GB of constants and lowering takes tens of minutes);
    the data-dependence perturbation rides on args[1] (x)."""

    def loop(*a):
        s = jnp.float32(0.0)
        for _ in range(inner):
            a1 = a[1] + (s * 0).astype(a[1].dtype)
            s = jnp.sum(fn(a[0], a1, *a[2:]).astype(jnp.float32))
        return s

    jl = jax.jit(loop)
    for attempt in range(3):
        try:
            _ = float(jl(*args))
            break
        except Exception as e:  # transient tunnel/worker restarts
            print(f"# warm-up retry {attempt}: {type(e).__name__}", flush=True)
            time.sleep(20)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jl(*args))
        best = min(best, time.perf_counter() - t0)
    return best / inner


def cheap_like(x, shape, dtype):
    """Data-dependent output of `shape` that costs ~one broadcast."""
    sl = x
    while sl.ndim > len(shape):
        sl = sl[0]
    idx = tuple(slice(0, 1) for _ in shape)
    piece = sl[idx]
    return jnp.broadcast_to(piece.astype(dtype), shape)


ABLATIONS = {}


def ablation(name):
    def deco(fn):
        ABLATIONS[name] = fn
        return fn

    return deco


@ablation("spatial")
def _(orig):
    # spatial self-attention only: context is None => attention() call inside
    # CrossAttention with no context. Patch the dispatching entry.
    real = unet3d.attention

    def fake(q, k, v, mask=None, impl="auto"):
        if k.shape[1] >= 500:  # spatial self-attn: Sk = Sq (2304/9216/576)
            return q
        return real(q, k, v, mask=mask, impl=impl)

    unet3d.attention = fake
    return lambda: setattr(unet3d, "attention", real)


@ablation("cross")
def _(orig):
    real_attn = unet3d.attention
    real_dual = pcross.dual_cross_attention

    def fake(q, k, v, mask=None, impl="auto"):
        if k.shape[1] < 500:
            return q
        return real_attn(q, k, v, mask=mask, impl=impl)

    pcross.dual_cross_attention = lambda q, kt, vt, ki, vi, **kw: q
    unet3d.attention = fake

    def undo():
        unet3d.attention = real_attn
        pcross.dual_cross_attention = real_dual

    return undo


@ablation("temporal")
def _(orig):
    real = unet3d._temporal_attention
    unet3d._temporal_attention = lambda q, k, v, mask=None, k2=None, v2=None: q
    return lambda: setattr(unet3d, "_temporal_attention", real)


@ablation("tconv")
def _(orig):
    real = unet3d.TemporalConvBlock.__call__
    unet3d.TemporalConvBlock.__call__ = lambda self, x: x
    return lambda: setattr(unet3d.TemporalConvBlock, "__call__", real)


@ablation("conv")
def _(orig):
    # unet3d binds the Conv factory by name — patch the module-level binding
    real = unet3d.Conv

    def fake(features, kernel=None, *, strides=1, padding=None, dtype=jnp.bfloat16,
             zero_init=False, name=None, **kw):
        s = strides if isinstance(strides, int) else strides[0]

        def apply(x):
            shape = (x.shape[0], -(-x.shape[1] // s), -(-x.shape[2] // s), features)
            return cheap_like(x, shape, x.dtype)

        return apply

    unet3d.Conv = fake
    return lambda: setattr(unet3d, "Conv", real)


@ablation("ff")
def _(orig):
    real = layers.FeedForward.__call__
    layers.FeedForward.__call__ = lambda self, x: x
    return lambda: setattr(layers.FeedForward, "__call__", real)


@ablation("gn")
def _(orig):
    real = layers.GroupNorm32.__call__
    layers.GroupNorm32.__call__ = lambda self, x: x
    return lambda: setattr(layers.GroupNorm32, "__call__", real)


def main():
    which = sys.argv[1:] or ["all"]
    names = list(ABLATIONS) if "all" in which else [w for w in which if w in ABLATIONS]

    cfg = get_model_config("viewcrafter_25")
    t_lat, hh, ww = cfg.video_length, cfg.height // 8, cfg.width // 8
    x = jax.random.normal(jax.random.PRNGKey(1), (2, t_lat, hh, ww, cfg.unet.in_channels), jnp.bfloat16)
    ts = jnp.array([500, 500], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77 + t_lat * 16, cfg.unet.context_dim), jnp.bfloat16)
    fs = jnp.array([10, 10], jnp.int32)

    unet = UNet3D(cfg.unet)
    params = cast_params_bf16(
        jax.jit(unet.init)(jax.random.PRNGKey(0), x[:1], ts[:1], ctx[:1], fs=fs[:1])
    )
    params = jax.device_put(params)

    def make_eval():
        u = UNet3D(cfg.unet)
        return lambda p, x, ts, ctx, fs: u.apply(p, x, ts, ctx, fs=fs, shared_prefix=2)

    full = timeit(make_eval(), params, x, ts, ctx, fs)
    print(f"{'full eval (KB=2, shared_prefix)':<42s} {full*1000:9.2f} ms", flush=True)

    for name in names:
        undo = ABLATIONS[name](None)
        try:
            t = timeit(make_eval(), params, x, ts, ctx, fs)
            print(f"{'without ' + name:<42s} {t*1000:9.2f} ms   marginal {((full-t)*1000):8.2f} ms", flush=True)
        finally:
            undo()


if __name__ == "__main__":
    main()
