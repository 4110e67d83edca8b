"""Measure the round-3 kernel work on the real TPU chip:

- fused dual-stream cross-attention (ops/pallas/cross_attention.py) vs the
  two separate flash-attention calls it replaces
- packed temporal-attention kernel (MXU group packing) vs the unpacked
  round-2 kernel path vs XLA einsum
- full-UNet eval with/without shared_prefix CFG dedup
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(name, fn, *args, reps=3, inner=10):
    def loop(*a):
        s = jnp.float32(0.0)
        for _ in range(inner):
            a0 = a[0] + (s * 0).astype(a[0].dtype)
            out = fn(a0, *a[1:])
            s = jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))
        return s

    jl = jax.jit(loop)
    _ = float(jl(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jl(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<52s} {best/inner*1000:9.2f} ms", flush=True)
    return best / inner


def main():
    which = set(sys.argv[1:]) or {"all"}
    rng = jax.random.PRNGKey(0)
    bf = jnp.bfloat16

    if "all" in which or "dual" in which:
        from viewcrafter_tpu.ops.attention import flash_attention
        from viewcrafter_tpu.ops.pallas.cross_attention import dual_cross_attention

        # flagship ds1 cross-attn site: BT=50, n=9216, h=5, d=64;
        # text ctx L=77+25*16=477, image ctx L=257
        q = jax.random.normal(rng, (50, 9216, 5, 64), bf)
        kt = jax.random.normal(rng, (50, 477, 5, 64), bf)
        ki = jax.random.normal(rng, (50, 257, 5, 64), bf)

        def two_calls(q, kt, vt, ki, vi):
            return flash_attention(q, kt, vt) + flash_attention(q, ki, vi)

        timeit("cross ds1: two flash calls", two_calls, q, kt, kt, ki, ki, inner=5)
        timeit("cross ds1: fused dual kernel", dual_cross_attention, q, kt, kt, ki, ki, inner=5)

        q2 = jax.random.normal(rng, (50, 2304, 10, 64), bf)
        kt2 = jax.random.normal(rng, (50, 477, 10, 64), bf)
        ki2 = jax.random.normal(rng, (50, 257, 10, 64), bf)
        timeit("cross ds2: two flash calls", two_calls, q2, kt2, kt2, ki2, ki2, inner=5)
        timeit("cross ds2: fused dual kernel", dual_cross_attention, q2, kt2, kt2, ki2, ki2, inner=5)

    if "all" in which or "temporal" in which:
        from viewcrafter_tpu.ops.pallas.temporal_attention import temporal_attention_fused

        q = jax.random.normal(rng, (2, 25, 9216, 5, 64), bf)
        timeit("temporal ds1: packed pallas", temporal_attention_fused, q, q, q, inner=5)

    if "all" in which or "unet" in which:
        from viewcrafter_tpu.config import get_model_config
        from viewcrafter_tpu.models.lvdm import cast_params_bf16
        from viewcrafter_tpu.models.unet3d import UNet3D

        cfg = get_model_config("viewcrafter_25")
        unet = UNet3D(cfg.unet)
        t_lat, hh, ww = cfg.video_length, cfg.height // 8, cfg.width // 8
        x = jnp.zeros((2, t_lat, hh, ww, cfg.unet.in_channels), bf)
        ts = jnp.array([500, 500], jnp.int32)
        ctx = jnp.zeros((2, 77 + t_lat * 16, cfg.unet.context_dim), bf)
        fs = jnp.array([10, 10], jnp.int32)
        params = cast_params_bf16(
            jax.jit(unet.init)(jax.random.PRNGKey(0), x[:1], ts[:1], ctx[:1], fs=fs[:1])
        )

        params = jax.device_put(params)

        def eval_plain(x, params, ts, ctx, fs):
            return unet.apply(params, x, ts, ctx, fs=fs)

        def eval_dedup(x, params, ts, ctx, fs):
            return unet.apply(params, x, ts, ctx, fs=fs, shared_prefix=2)

        timeit("unet K=2 plain", eval_plain, x, params, ts, ctx, fs, inner=2, reps=3)
        timeit("unet K=2 shared_prefix", eval_dedup, x, params, ts, ctx, fs, inner=2, reps=3)


if __name__ == "__main__":
    main()
