"""Measure fullkv_attention vs the current flash/XLA paths at the flagship
UNet's three spatial self-attention shapes (B=50 = 25 frames x CFG pair):

  ds1: (50, 9216,  5, 64)   currently flash @1024 blocks, 84 ms
  ds2: (50, 2304, 10, 64)   currently flash @384 blocks,  34 ms
  ds4: (50,  576, 20, 64)   currently XLA einsum,         14 ms

Run: python scripts/profile_fullkv.py [ds1 ds2 ds4 check]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from viewcrafter_tpu.ops.attention import flash_attention, xla_attention
from viewcrafter_tpu.ops.pallas.fullkv_attention import fullkv_attention, supports_fullkv


def timeit(name, fn, *args, reps=3, inner=10):
    def loop(*a):
        s = jnp.float32(0.0)
        for _ in range(inner):
            a0 = a[0] + (s * 0).astype(a[0].dtype)
            out = fn(a0, *a[1:])
            s = jnp.sum(out.astype(jnp.float32))
        return s

    jl = jax.jit(loop)
    _ = float(jl(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jl(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<56s} {best/inner*1000:9.2f} ms", flush=True)
    return best / inner


def main():
    which = set(sys.argv[1:]) or {"all"}
    rng = jax.random.PRNGKey(0)
    bf = jnp.bfloat16

    if "all" in which or "check" in which:
        q = jax.random.normal(jax.random.PRNGKey(1), (2, 576, 3, 64), bf)
        k = jax.random.normal(jax.random.PRNGKey(2), (2, 576, 3, 64), bf)
        v = jax.random.normal(jax.random.PRNGKey(3), (2, 576, 3, 64), bf)
        assert supports_fullkv(q.shape, k.shape)
        ref = np.asarray(xla_attention(q, k, v), np.float32)
        got = np.asarray(fullkv_attention(q, k, v), np.float32)
        err = np.abs(ref - got).max()
        print(f"check vs xla (576): max abs err {err:.5f}")
        assert err < 2e-2, err

    shapes = {
        "ds1": (50, 9216, 5, 64),
        "ds2": (50, 2304, 10, 64),
        "ds4": (50, 576, 20, 64),
    }
    for tag, shape in shapes.items():
        if "all" not in which and tag not in which:
            continue
        q = jax.random.normal(rng, shape, bf)
        if shape[1] >= 2048:
            timeit(f"{tag} flash (current)", flash_attention, q, q, q, inner=5)
        else:
            timeit(f"{tag} xla (current)", xla_attention, q, q, q, inner=5)
        for bq in (128, 192, 256, 384, 512, 768, 1024,
                   shape[1] if shape[1] <= 1024 else 0):
            if not bq or shape[1] % bq or bq * shape[1] * 4 > 40 << 20:
                continue
            timeit(f"{tag} fullkv bq={bq}",
                   lambda q, k, v, bq=bq: fullkv_attention(q, k, v, block_q=bq),
                   q, q, q, inner=5)


if __name__ == "__main__":
    main()
