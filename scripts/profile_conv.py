"""Conv formulation shootout on the real TPU.

The round-2 profile put conv3x3 320->320 at 13.2 ms — ~3x off the MXU
roofline (~4.4 ms at the flagship ds1 shape). This compares, at each UNet
level's exact shape:

  - lax.conv_general_dilated NHWC (what flax nn.Conv emits today)
  - 9-shift matmul: pad, then sum_{dy,dx} x[.., dy:dy+H, dx:dx+W, :] @ W[dy,dx]
    (every matmul is a clean (B*H*W, Cin) x (Cin, Cout) MXU problem)
  - im2col concat matmul: one (B*H*W, 9*Cin) x (9*Cin, Cout) GEMM

and the temporal conv (3,1,1) as conv vs 3-shift matmul.

Usage: python scripts/profile_conv.py
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
            s = jnp.sum(out.astype(jnp.float32))
        return s

    jl = jax.jit(loop)
    float(jl(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jl(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<58s} {best/inner*1000:8.2f} ms", flush=True)
    return best / inner


def conv_xla(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def conv_shift(x, w):
    b, h, ww, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b, h, ww, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + jnp.einsum(
                "bhwc,cd->bhwd", xp[:, dy:dy + h, dx:dx + ww, :], w[dy, dx],
                preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)


def conv_im2col(x, w):
    b, h, ww, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, dy:dy + h, dx:dx + ww, :] for dy in range(3) for dx in range(3)],
        axis=-1)  # (B, H, W, 9*Cin)
    return jnp.einsum("bhwk,kd->bhwd", cols, w.reshape(9 * cin, cout),
                      preferred_element_type=jnp.float32).astype(x.dtype)


def tconv_xla(x, w):
    # x: (B, T, S, C); w: (3, 1, C, C) -> conv over T
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def tconv_shift(x, w):
    b, t, s, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    acc = jnp.zeros((b, t, s, w.shape[-1]), jnp.float32)
    for dt in range(3):
        acc = acc + jnp.einsum("btsc,cd->btsd", xp[:, dt:dt + t], w[dt, 0],
                               preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = jax.random.PRNGKey(0)
    bf = jnp.bfloat16
    # (label, B, H, W, C)
    shapes = [("ds1 50x72x128x320", 50, 72, 128, 320),
              ("ds2 50x36x64x640", 50, 36, 64, 640),
              ("ds4 50x18x32x1280", 50, 18, 32, 1280)]
    for label, b, h, w_, c in shapes:
        x = jax.random.normal(rng, (b, h, w_, c), bf)
        w = jax.random.normal(rng, (3, 3, c, c), bf)
        fl = 2 * b * h * w_ * 9 * c * c
        t0 = timeit(f"conv3x3 {label} xla", conv_xla, x, w)
        t1 = timeit(f"conv3x3 {label} 9-shift matmul", conv_shift, x, w)
        t2 = timeit(f"conv3x3 {label} im2col", conv_im2col, x, w)
        print(f"  roofline ~{fl/197e12*1000:.2f} ms; best {min(t0,t1,t2)*1000:.2f} "
              f"({fl/min(t0,t1,t2)/1e12:.0f} TFLOP/s)", flush=True)

    # temporal conv (3,1,1) at ds1: (B=2*CFG? actually B=2, T=25, S=9216, C=320)
    for label, b, t, s, c in [("ds1 2x25x9216x320", 2, 25, 9216, 320),
                              ("ds2 2x25x2304x640", 2, 25, 2304, 640)]:
        x = jax.random.normal(rng, (b, t, s, c), bf)
        w = jax.random.normal(rng, (3, 1, c, c), bf)
        fl = 2 * b * t * s * 3 * c * c
        t0 = timeit(f"tconv3 {label} xla", tconv_xla, x, w)
        t1 = timeit(f"tconv3 {label} 3-shift matmul", tconv_shift, x, w)
        print(f"  roofline ~{fl/197e12*1000:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
