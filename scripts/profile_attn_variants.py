"""Compare temporal-attention layouts and spatial flash block sizes on TPU.

Temporal attention (T=25 per pixel) is HBM-bound; the logits layout decides
the traffic: (b,s,h,q,k) puts k=25 on the lane dim (padded 25->128, 5.1x
inflation), (b,h,q,k,s) puts s=9216 there (no padding).
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
    print(f"{name:<46s} {best/inner*1000:9.2f} ms", flush=True)
    return best / inner


def temporal_current(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum("bqshd,bkshd->bshqk", q, k, preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32) * (d**-0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bshqk,bkshd->bqshd", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)


def temporal_lanes(q, k, v):
    """s on the lane dim end-to-end: logits (b,h,q,k,s)."""
    d = q.shape[-1]
    logits = jnp.einsum("bqshd,bkshd->bhqks", q, k, preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32) * (d**-0.5)
    probs = jax.nn.softmax(logits, axis=3).astype(q.dtype)
    return jnp.einsum("bhqks,bkshd->bqshd", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)


def temporal_transpose(q, k, v):
    """Explicit transpose to (b*s*h, t, d) + standard attention + back."""
    b, t, s, h, d = q.shape

    def to_btd(x):
        return x.transpose(0, 2, 3, 1, 4).reshape(b * s * h, t, d)

    qq, kk, vv = to_btd(q), to_btd(k), to_btd(v)
    logits = jnp.einsum("ntd,nud->ntu", qq, kk, preferred_element_type=jnp.float32) * (d**-0.5)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    o = jnp.einsum("ntu,nud->ntd", probs, vv, preferred_element_type=jnp.float32).astype(q.dtype)
    return o.reshape(b, s, h, t, d).transpose(0, 3, 1, 2, 4)


def main():
    which = set(sys.argv[1:]) or {"all"}
    rng = jax.random.PRNGKey(0)
    bf = jnp.bfloat16

    if "all" in which or "temporal" in which:
        q = jax.random.normal(rng, (2, 25, 9216, 5, 64), bf)
        timeit("temporal current (bshqk)", temporal_current, q, q, q)
        timeit("temporal lanes (bhqks)", temporal_lanes, q, q, q)
        timeit("temporal transpose (bsh,t,d)", temporal_transpose, q, q, q)

    if "all" in which or "flash" in which:
        from viewcrafter_tpu.ops.attention import flash_attention, xla_attention

        q = jax.random.normal(rng, (50, 9216, 5, 64), bf)
        for bq, bk in [(1024, 1024), (512, 1024), (2304, 1024), (1024, 2304), (512, 512), (2304, 2304)]:
            timeit(f"flash ds1 bq={bq} bk={bk}", functools.partial(
                flash_attention, block_q=bq, block_k=bk), q, q, q, inner=5)
        try:
            dpa = functools.partial(jax.nn.dot_product_attention, implementation="xla")
            timeit("jax.nn.dot_product_attention xla", dpa, q, q, q, inner=5)
        except Exception as e:
            print("dot_product_attention failed:", e)

    if "all" in which or "flash2" in which:
        from viewcrafter_tpu.ops.attention import flash_attention

        q = jax.random.normal(rng, (50, 2304, 10, 64), bf)
        for bq, bk in [(1024, 1024), (512, 512), (2304, 2304), (2304, 1152), (1152, 1152)]:
            if 2304 % bq == 0 or bq == 1024:
                timeit(f"flash ds2 bq={bq} bk={bk}", functools.partial(
                    flash_attention, block_q=bq, block_k=bk), q, q, q, inner=5)


if __name__ == "__main__":
    main()
