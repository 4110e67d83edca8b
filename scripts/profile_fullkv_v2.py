"""Sweep the chunked online-softmax full-KV kernel vs the single-pass one at
the flagship spatial-attention shapes (VERDICT r4 #10: ds1 79.4 ms at 35% of
peak vs the D=64 ~50% ceiling => target <= 60 ms).

Hypothesis: the single-pass kernel strictly alternates one giant MXU matmul
with a serialized VPU softmax sweep; unrolled KV chunks give the Mosaic
scheduler independent MXU/VPU work to interleave (ops/pallas/
fullkv_attention.py::_kernel_chunked).

Usage: python scripts/profile_fullkv_v2.py [ds1|ds2|ds4 ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from viewcrafter_tpu.ops.pallas.fullkv_attention import fullkv_attention


def timeit(name, fn, *args, reps=3, inner=5):
    def loop(*a):
        s = jnp.float32(0.0)
        for _ in range(inner):
            av = list(a)
            av[0] = a[0] + (s * 0).astype(a[0].dtype)
            out = fn(*av)
            s = jnp.sum(out.astype(jnp.float32))
        return s

    jl = jax.jit(loop)
    _ = float(jl(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jl(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / inner
    print(f"{name:<52s} {per*1000:9.2f} ms", flush=True)
    return per


SHAPES = {
    "ds1": (50, 9216, 5, 64),
    "ds2": (50, 2304, 10, 64),
    "ds4": (50, 576, 20, 64),
}

SWEEP = {
    # (block_q, n_chunks) candidates per level
    "ds1": [(384, 1), (384, 4), (384, 8), (384, 16), (512, 4), (512, 8),
            (768, 8), (1024, 8), (1024, 16), (2304, 8), (2304, 16)],
    "ds2": [(256, 1), (384, 1), (768, 4), (2304, 4), (2304, 8), (1152, 4)],
    "ds4": [(576, 1), (576, 4)],
}


def main():
    which = [a for a in sys.argv[1:]] or ["ds1", "ds2", "ds4"]
    rng = jax.random.PRNGKey(0)
    for lvl in which:
        b, s, h, d = SHAPES[lvl]
        q = jax.random.normal(rng, (b, s, h, d), jnp.bfloat16)
        flops = 2 * 2 * b * h * s * s * d
        for bq, nc in SWEEP[lvl]:
            if s % bq:
                continue
            t = timeit(f"{lvl} ({b},{s},{h},{d}) bq={bq} nc={nc}",
                       lambda a, bq=bq, nc=nc: fullkv_attention(
                           a, a, a, block_q=bq, n_chunks=nc), q)
            print(f"   -> {flops / t / 1e12:6.1f} TF/s", flush=True)
        # numeric parity of the chunked kernel against the single-pass one
        ref = fullkv_attention(q, q, q, block_q=min(384, s), n_chunks=1)
        chk = fullkv_attention(q, q, q, block_q=min(384, s), n_chunks=4)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - chk.astype(jnp.float32))))
        print(f"   parity nc=4 vs nc=1: max abs err {err:.2e}", flush=True)
        assert err < 2e-2, err


if __name__ == "__main__":
    main()
