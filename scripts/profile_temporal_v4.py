"""Round-4 temporal-attention: honest e2e scope benchmark.

Methodology fix over profile_temporal_v2/v3: those scripts synced through a
scalar sum, which lets XLA fold pure-layout tail ops (a transpose feeding a
sum costs nothing) and under-counts. Here every timed function maps
(B,T,S,C)->(B,T,S,C) and iterations chain through the FULL array, so every
pass must materialize. The axon tunnel's ~29 ms per-call latency is
subtracted explicitly (measured with an empty scalar jit).

Scopes (projection + attention + projection, flagship ds1):
  base   : Dense qkv -> shipping (B,T,S,H,D) kernel -> Dense out
  v4     : einsum qkv that writes (B,S2,H,T,G*D) directly (layout folded
           into the matmul), lane-interleaved transpose-free kernel
           (G problems side by side in the lane dim -> native 128-lane
           DMA), einsum out that folds the layout back
  xla    : pure-XLA einsum attention (no pallas) as the fallback bound
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, T, S, H, D = 2, 25, 9216, 5, 64
C = H * D


def measure_call_latency():
    f = jax.jit(lambda a: a + 1.0)
    x = jnp.float32(1.0)
    _ = float(f(x))
    t0 = time.perf_counter()
    for _ in range(20):
        _ = float(f(x))
    return (time.perf_counter() - t0) / 20


CALL_LAT = None


def timeit(name, fn, x, *args, reps=3, inner=8):
    global CALL_LAT
    if CALL_LAT is None:
        CALL_LAT = measure_call_latency()
        print(f"(tunnel per-call latency {CALL_LAT*1000:.1f} ms — subtracted)", flush=True)

    def loop(x, *a):
        for _ in range(inner):
            x = fn(x, *a)
        return x[0, 0, 0, 0]

    jl = jax.jit(loop)
    _ = float(jl(x, *args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jl(x, *args))
        best = min(best, time.perf_counter() - t0)
    per = (best - CALL_LAT) / inner
    print(f"{name:<52s} {per*1000:9.2f} ms", flush=True)
    return per


# --- v4 kernel: (M, T, G*D) lane-interleaved, transpose-free ---------------

def _v4_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, g, d):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    outs = []
    for j in range(g):
        sl = slice(j * d, (j + 1) * d)
        qh, kh, vh = q[:, :, sl], k[:, :, sl], v[:, :, sl]
        logits = lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        probs = jax.nn.softmax(logits * scale, axis=-1).astype(vh.dtype)
        outs.append(lax.dot_general(
            probs, vh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype))
    o_ref[...] = jnp.concatenate(outs, axis=-1)


def v4_attn(q, k, v, tile=256, g=2, d=64, interpret=False):
    m, t, gd = q.shape
    assert gd == g * d
    spec = pl.BlockSpec((tile, t, gd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_v4_kernel, scale=d ** -0.5, g=g, d=d),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(m // tile,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, v)


def v4_scope(x, wq, wk, wv, wo, g=2, tile=256, interpret=False):
    b, t, s, c = x.shape
    h, d = H, D
    s2 = s // g
    xg = x.reshape(b, t, s2, g, c)
    # projections write the kernel layout directly; XLA folds the transpose
    # into the matmul output instead of running a standalone relayout
    q = jnp.einsum("btsgc,chd->bshtgd", xg, wq.reshape(c, h, d))
    k = jnp.einsum("btsgc,chd->bshtgd", xg, wk.reshape(c, h, d))
    v = jnp.einsum("btsgc,chd->bshtgd", xg, wv.reshape(c, h, d))
    m = b * s2 * h
    o = v4_attn(q.reshape(m, t, g * d), k.reshape(m, t, g * d),
                v.reshape(m, t, g * d), tile=tile, g=g, d=d, interpret=interpret)
    o = o.reshape(b, s2, h, t, g, d)
    return jnp.einsum("bshtgd,hdc->btsgc", o, wo.reshape(h, d, c)).reshape(b, t, s, c)


def base_scope(x, wq, wk, wv, wo):
    from viewcrafter_tpu.ops.pallas.temporal_attention import temporal_attention_fused
    b, t, s, c = x.shape
    q = (x @ wq).reshape(b, t, s, H, D)
    k = (x @ wk).reshape(b, t, s, H, D)
    v = (x @ wv).reshape(b, t, s, H, D)
    o = temporal_attention_fused(q, k, v).reshape(b, t, s, c)
    return o @ wo


def xla_scope(x, wq, wk, wv, wo):
    b, t, s, c = x.shape
    q = (x @ wq).reshape(b, t, s, H, D)
    k = (x @ wk).reshape(b, t, s, H, D)
    v = (x @ wv).reshape(b, t, s, H, D)
    logits = jnp.einsum("bqshd,bkshd->bshqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits * (D ** -0.5), axis=-1).astype(x.dtype)
    o = jnp.einsum("bshqk,bkshd->bqshd", p, v, preferred_element_type=jnp.float32)
    return o.astype(x.dtype).reshape(b, t, s, c) @ wo


def check():
    rng = np.random.default_rng(0)
    b, t, s, c = 2, 25, 8, C
    x = jnp.asarray(rng.standard_normal((b, t, s, c)) * 0.1, jnp.float32)
    ws = [jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.float32) for _ in range(4)]
    ref = xla_scope(x, *ws)
    for g in (2, 4):
        got = v4_scope(x, *ws, g=g, tile=b * s // g * H, interpret=True)
        print(f"v4 g={g} max err:", float(jnp.abs(got - ref).max()))


def main():
    which = set(sys.argv[1:]) or {"all"}
    if "check" in which:
        check()
        return
    rng = jax.random.PRNGKey(0)
    bf = jnp.bfloat16
    x = jax.random.normal(rng, (B, T, S, C), bf)
    ws = [jax.random.normal(jax.random.PRNGKey(i), (C, C), bf) * 0.05
          for i in range(1, 5)]

    if "all" in which or "base" in which:
        timeit("scope base (Dense + shipping kernel)", base_scope, x, *ws)
    if "all" in which or "xla" in which:
        timeit("scope xla einsum attn", xla_scope, x, *ws)
    if "all" in which or "v4" in which:
        for g, tile in ((2, 256), (2, 512), (4, 128), (4, 256), (8, 128)):
            if (B * S * H // g) % tile:
                continue
            name = f"scope v4 g={g} tile={tile}"
            try:
                timeit(name, functools.partial(v4_scope, g=g, tile=tile), x, *ws)
            except Exception as e:
                print(f"{name} failed: {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
