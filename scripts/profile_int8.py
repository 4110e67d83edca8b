"""Does dot_general(int8, int8) -> int32 hit the TPU v5e int8 MXU path?

Times the flagship FF/projection matmul shapes in bf16 vs dynamically
quantized int8 (per-token activation scales, per-channel weight scales) to
decide whether W8A8 quantization of the UNet projections is worth plumbing.
v5e peak: 197 bf16 TFLOP/s vs 394 int8 TOP/s — a compute-bound matmul
should approach 2x.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(name, fn, *args, reps=3, inner=10):
    def loop(*a):
        s = jnp.float32(0.0)
        for _ in range(inner):
            a0 = a[0] + (s * 0).astype(a[0].dtype)
            out = fn(a0, *a[1:])
            s = jnp.sum(out[0, :1].astype(jnp.float32))
        return s

    jl = jax.jit(loop)
    _ = float(jl(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jl(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<46s} {best / inner * 1000:9.3f} ms", flush=True)
    return best / inner


def bf16_mm(x, w):
    return lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)


def int8_static_mm(x, wq, ws):
    """Weights already int8 (per-out-channel scales); dynamic per-token act scales."""
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) / 127.0
    xq = jnp.round(xf / xs).astype(jnp.int8)
    y = lax.dot_general(xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * xs * ws).astype(jnp.bfloat16)


def int8_dynamic_w_mm(x, w):
    """Quantize weights in-graph too (the LICM-hoisting variant)."""
    ws = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True), 1e-6) / 127.0
    wq = jnp.round(w.astype(jnp.float32) / ws).astype(jnp.int8)
    return int8_static_mm(x, wq, ws)


def main():
    rng = jax.random.PRNGKey(0)
    # flagship ds1 token count: KB*T*S = 2*25*9216 = 460800
    for (m, k, n) in [(460800, 320, 2560), (460800, 320, 320), (460800, 1280, 320),
                      (115200, 640, 640)]:
        x = jax.random.normal(rng, (m, k), jnp.bfloat16)
        w = jax.random.normal(rng, (k, n), jnp.bfloat16) * 0.02
        ws = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True), 1e-6) / 127.0
        wq = jnp.round(w.astype(jnp.float32) / ws).astype(jnp.int8)
        tb = timeit(f"bf16  ({m},{k})x({k},{n})", bf16_mm, x, w)
        ti = timeit(f"int8  ({m},{k})x({k},{n})", int8_static_mm, x, wq, ws)
        td = timeit(f"int8w ({m},{k})x({k},{n})", int8_dynamic_w_mm, x, w)
        flops = 2 * m * k * n
        print(f"  bf16 {flops/tb/1e12:6.1f} TFLOP/s | int8 {flops/ti/1e12:6.1f} "
              f"| speedup {tb/ti:4.2f}x (dynamic-w {tb/td:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
