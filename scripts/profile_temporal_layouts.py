"""Temporal-attention layout experiments (round 3).

The fused kernel (ops/pallas/temporal_attention.py) measures ~20-22 ms per
ds1 site while its HBM speed-of-light is ~1.4 ms — the gap is in-kernel
(t, tile) transposes + pack/unpack copies, not DMA or MXU. Candidate fix:
transpose activations ONCE per temporal transformer to (B, S, T, C), run the
whole block stack (2 attentions + FF + norms) in that layout with a
transpose-free kernel, transpose back at proj_out.

Measured here:
  1. XLA transpose (B,T,S,C) <-> (B,S,T,C) at flagship ds1 shapes
  2. XLA attention on the pre-transposed (B*S, T, H, D) layout
  3. pallas kernel on (B*S, T, H, D): multi-batch dot_general, no transposes
  4. current fused kernel (baseline)
"""

import functools
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
    b, t, s, h, d = 2, 25, 9216, 5, 64
    c = h * d

    if "all" in which or "transpose" in which:
        x = jax.random.normal(rng, (b, t, s, c), bf)
        timeit("transpose (b,t,s,c)->(b,s,t,c)", lambda a: a.transpose(0, 2, 1, 3), x, inner=10)
        xt = jax.random.normal(rng, (b, s, t, c), bf)
        timeit("transpose back", lambda a: a.transpose(0, 2, 1, 3), xt, inner=10)

    if "all" in which or "xla" in which:
        q = jax.random.normal(rng, (b * s, t, h, d), bf)

        def xla_attn(q, k, v):
            logits = jnp.einsum("nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(logits.astype(jnp.float32) * (d ** -0.5), axis=-1).astype(q.dtype)
            return jnp.einsum("nhqk,nkhd->nqhd", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)

        timeit("xla attn on (bs,t,h,d)", xla_attn, q, q, q, inner=10)

    if "all" in which or "pallas" in which:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def _kern(q_ref, k_ref, v_ref, o_ref, *, scale):
            q = q_ref[...]
            k = k_ref[...]
            v = v_ref[...]
            logits = lax.dot_general(
                q, k, (((3,), (3,)), ((0, 2), (0, 2))), preferred_element_type=jnp.float32
            )  # (tile, h, t, t)
            probs = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
            o = lax.dot_general(
                probs, v, (((3,), (1,)), ((0, 1), (0, 2))), preferred_element_type=jnp.float32
            )  # (tile, h, t, d)
            o_ref[...] = jnp.transpose(o, (0, 2, 1, 3)).astype(o_ref.dtype)

        def fused_nthd(q, k, v, tile=256):
            n = q.shape[0]
            spec = pl.BlockSpec((tile, t, h, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
            return pl.pallas_call(
                functools.partial(_kern, scale=d ** -0.5),
                out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
                grid=(n // tile,),
                in_specs=[spec, spec, spec],
                out_specs=spec,
            )(q, k, v)

        q = jax.random.normal(rng, (b * s, t, h, d), bf)
        for tile in (128, 256, 512):
            try:
                timeit(f"pallas (bs,t,h,d) tile={tile}", functools.partial(fused_nthd, tile=tile), q, q, q, inner=10)
            except Exception as e:
                print(f"pallas tile={tile} failed: {type(e).__name__}: {str(e)[:160]}", flush=True)

    if "all" in which or "current" in which:
        from viewcrafter_tpu.ops.pallas.temporal_attention import temporal_attention_fused

        q = jax.random.normal(rng, (b, t, s, h, d), bf)
        timeit("current fused (b,t,s,h,d)", temporal_attention_fused, q, q, q, inner=10)

    if "all" in which or "e2e" in which:
        # transpose + pallas + transpose back, end to end from (b,t,s,h*d)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def _kern(q_ref, k_ref, v_ref, o_ref, *, scale):
            q = q_ref[...]
            k = k_ref[...]
            v = v_ref[...]
            logits = lax.dot_general(
                q, k, (((3,), (3,)), ((0, 2), (0, 2))), preferred_element_type=jnp.float32
            )
            probs = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
            o = lax.dot_general(
                probs, v, (((3,), (1,)), ((0, 1), (0, 2))), preferred_element_type=jnp.float32
            )
            o_ref[...] = jnp.transpose(o, (0, 2, 1, 3)).astype(o_ref.dtype)

        def e2e(x):
            # x: (b, t, s, c) -> transpose -> attn in (bs,t,h,d) -> back
            xt = x.transpose(0, 2, 1, 3).reshape(b * s, t, h, d)
            spec = pl.BlockSpec((256, t, h, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
            o = pl.pallas_call(
                functools.partial(_kern, scale=d ** -0.5),
                out_shape=jax.ShapeDtypeStruct(xt.shape, xt.dtype),
                grid=(b * s // 256,),
                in_specs=[spec, spec, spec],
                out_specs=spec,
            )(xt, xt, xt)
            return o.reshape(b, s, t, c).transpose(0, 2, 1, 3)

        x = jax.random.normal(rng, (b, t, s, c), bf)
        timeit("e2e transpose+pallas+back", e2e, x, inner=10)


if __name__ == "__main__":
    main()
