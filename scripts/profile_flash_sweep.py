"""Sweep flash-attention block sizes (and splash attention) at the flagship
spatial shape (50, 9216, 5, 64) to squeeze the 88 ms/site ds1 stage.

Usage: python scripts/profile_flash_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from viewcrafter_tpu.ops.attention import _flash_call


def timeit(name, fn, *args, reps=3, inner=5):
    def loop(*a):
        s = jnp.float32(0.0)
        for _ in range(inner):
            a0 = a[0] + (s * 0).astype(a[0].dtype)
            out = fn(a0, *a[1:])
            s = jnp.sum(out[0, 0, 0, 0].astype(jnp.float32))
        return s

    jl = jax.jit(loop)
    try:
        _ = float(jl(*args))
    except Exception as e:
        print(f"{name:<40s} FAILED {type(e).__name__}", flush=True)
        return None
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jl(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<40s} {best / inner * 1000:8.2f} ms", flush=True)
    return best / inner


def main():
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (50, 9216, 5, 64), jnp.bfloat16)
    for bq, bk in [(1024, 1024), (1536, 1536), (3072, 1024), (1024, 3072),
                   (3072, 512), (512, 3072), (2304, 2304), (4608, 1024),
                   (1152, 1152), (3072, 3072)]:
        if 9216 % bq or 9216 % bk:
            continue
        timeit(f"flash bq={bq} bk={bk}", lambda a, b, c: _flash_call(a, b, c, bq, bk), q, q, q)

    # splash attention (v5e-optimized kernel family)
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )

        def splash(qi, ki, vi):
            b, s, h, d = qi.shape
            mask = sm.FullMask((s, s))
            mgrid = sm.MultiHeadMask([mask] * h)
            kernel = sk.make_splash_mha(
                mask=mgrid, head_shards=1, q_seq_shards=1)
            qt = jnp.swapaxes(qi, 1, 2) * (d ** -0.5)
            kt = jnp.swapaxes(ki, 1, 2)
            vt = jnp.swapaxes(vi, 1, 2)
            out = jax.vmap(kernel)(qt, kt, vt)
            return jnp.swapaxes(out, 1, 2)

        timeit("splash mha", splash, q, q, q)
    except Exception as e:
        print(f"splash unavailable: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
