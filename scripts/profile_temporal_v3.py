"""Round-4 temporal-attention candidates: transpose-free (M, T, D) kernel.

The shipping kernel (ops/pallas/temporal_attention.py) takes (B, T, S, H, D)
blocks and pays in-kernel (t, tile) transposes + concat pack/unpack; it
measures 19.4 ms at flagship ds1 vs a ~1.4 ms HBM floor. Candidates here
flatten the problem axis OUTSIDE the kernel to (M = B*S*H, T, D) so the
kernel is a plain single-batch-dim dot_general pair with zero relayouts:

  nTd      : block (tile, t, d), naive batched matmuls (4% MXU util, but
             the FLOPs are tiny - may still win on VPU-copy savings)
  nTd_pack : same + block-diagonal MXU packing via pad+reshape (t_pad
             sublane-aligned so the reshape is a layout no-op)
  e2e      : einsum projections that fold the (B,T,S,C)->(M,T,D) layout
             change into the matmuls, kernel, einsum out-proj back
  scope_base: current Dense projections + shipping kernel (same scope)

Run on TPU: python scripts/profile_temporal_v3.py [nTd|pack|e2e|base|all]
Correctness: JAX_PLATFORMS=cpu python scripts/profile_temporal_v3.py check
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


# --- nTd: (M, T, D) blocks, plain batched matmuls ---------------------------

def _ntd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    logits = lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (tile, t, t)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
    o_ref[...] = lax.dot_general(
        probs, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def ntd_attn(q, k, v, tile=256, interpret=False):
    m, t, d = q.shape
    spec = pl.BlockSpec((tile, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ntd_kernel, scale=d ** -0.5),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(m // tile,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(q, k, v)


# --- nTd_multi: several 128-tiles per grid step (amortize per-block cost) ---

def _ntd_multi_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, chunk):
    for j in range(chunk):
        q = q_ref[j]
        k = k_ref[j]
        v = v_ref[j]
        logits = lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        probs = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
        o_ref[j] = lax.dot_general(
            probs, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def ntd_multi_attn(q, k, v, tile=128, chunk=8, interpret=False):
    m, t, d = q.shape
    q4 = q.reshape(m // tile, tile, t, d)
    spec = pl.BlockSpec((chunk, tile, t, d), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ntd_multi_kernel, scale=d ** -0.5, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct(q4.shape, q.dtype),
        grid=(m // tile // chunk,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(q4, k.reshape(q4.shape), v.reshape(q4.shape))
    return out.reshape(m, t, d)


# --- nTd_pack: block-diagonal MXU packing via pad + trivial reshape ---------

def _pad_t(t):
    return -(-t // 16) * 16


def _ntd_pack_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, g, t_pad):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    tile, t, d = q.shape
    m = tile // g

    def pack(x):
        xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        # (m*g, t_pad, d) -> (m, g*t_pad, d): merging adjacent dims where the
        # sublane dim (t_pad) is granule-aligned is a layout no-op
        return xp.reshape(m, g * t_pad, d)

    qg, kg, vg = pack(q), pack(k), pack(v)
    logits = lax.dot_general(
        qg, kg, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (m, g*t_pad, g*t_pad)
    row = lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    col = lax.broadcasted_iota(jnp.int32, logits.shape, 2)
    keep = (row // t_pad == col // t_pad) & (col % t_pad < t)
    logits = jnp.where(keep, logits * scale, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(vg.dtype)
    og = lax.dot_general(
        probs, vg, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (m, g*t_pad, d)
    o_ref[...] = og.reshape(tile, t_pad, d)[:, :t].astype(o_ref.dtype)


def ntd_pack_attn(q, k, v, tile=256, interpret=False):
    m, t, d = q.shape
    t_pad = _pad_t(t)
    g = max(1, 128 // t_pad)
    spec = pl.BlockSpec((tile, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ntd_pack_kernel, scale=d ** -0.5, g=g, t_pad=t_pad),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(m // tile,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(q, k, v)


# --- e2e: einsum projections fold the layout change -------------------------

def e2e_scope(x, wq, wk, wv, wo, attn=ntd_attn, tile=256):
    # x: (B, T, S, C). Projections write (B, S, H, T, D) directly; XLA folds
    # the transpose into the matmul epilogue (no standalone relayout pass).
    b, t, s, c = x.shape
    q = jnp.einsum("btsc,chd->bshtd", x, wq.reshape(c, H, D))
    k = jnp.einsum("btsc,chd->bshtd", x, wk.reshape(c, H, D))
    v = jnp.einsum("btsc,chd->bshtd", x, wv.reshape(c, H, D))
    o = attn(q.reshape(b * s * H, t, D), k.reshape(b * s * H, t, D),
             v.reshape(b * s * H, t, D), tile=tile)
    o = o.reshape(b, s, H, t, D)
    return jnp.einsum("bshtd,hdc->btsc", o, wo.reshape(H, D, c))


def base_scope(x, wq, wk, wv, wo):
    from viewcrafter_tpu.ops.pallas.temporal_attention import temporal_attention_fused
    b, t, s, c = x.shape
    q = (x @ wq).reshape(b, t, s, H, D)
    k = (x @ wk).reshape(b, t, s, H, D)
    v = (x @ wv).reshape(b, t, s, H, D)
    o = temporal_attention_fused(q, k, v).reshape(b, t, s, c)
    return o @ wo


def check():
    rng = np.random.default_rng(0)
    m, t, d = 4 * 64, 25, 64
    q = jnp.asarray(rng.standard_normal((m, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((m, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((m, t, d)), jnp.float32)

    logits = jnp.einsum("mqd,mkd->mqk", q, k) * (d ** -0.5)
    ref = jnp.einsum("mqk,mkd->mqd", jax.nn.softmax(logits, axis=-1), v)

    out = ntd_attn(q, k, v, tile=64, interpret=True)
    print("ntd max err:", float(jnp.abs(out - ref).max()))
    out = ntd_pack_attn(q, k, v, tile=64, interpret=True)
    print("ntd_pack max err:", float(jnp.abs(out - ref).max()))

    b, s = 2, 32
    x = jnp.asarray(rng.standard_normal((b, t, s, C)) * 0.1, jnp.float32)
    ws = [jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.float32) for _ in range(4)]
    got = e2e_scope(x, *ws, attn=functools.partial(ntd_attn, interpret=True), tile=64)
    q2 = (x @ ws[0]).reshape(b, t, s, H, D)
    k2 = (x @ ws[1]).reshape(b, t, s, H, D)
    v2 = (x @ ws[2]).reshape(b, t, s, H, D)
    lg = jnp.einsum("bqshd,bkshd->bshqk", q2, k2) * (d ** -0.5)
    o2 = jnp.einsum("bshqk,bkshd->bqshd", jax.nn.softmax(lg, -1), v2)
    ref2 = o2.reshape(b, t, s, C) @ ws[3]
    print("e2e max err:", float(jnp.abs(got - ref2).max()))


def main():
    which = set(sys.argv[1:]) or {"all"}
    if "check" in which:
        check()
        return
    rng = jax.random.PRNGKey(0)
    bf = jnp.bfloat16
    m = B * S * H

    if "all" in which or "nTd" in which:
        q = jax.random.normal(rng, (m, T, D), bf)
        for tile in (128, 256, 512, 1024):
            try:
                timeit(f"nTd tile={tile}", functools.partial(ntd_attn, tile=tile),
                       q, q, q, inner=10)
            except Exception as e:
                print(f"nTd tile={tile} failed: {type(e).__name__}: {str(e)[:140]}", flush=True)

    if "all" in which or "multi" in which:
        q = jax.random.normal(rng, (m, T, D), bf)
        for chunk in (4, 8, 16, 24):
            try:
                timeit(f"nTd_multi chunk={chunk}",
                       functools.partial(ntd_multi_attn, chunk=chunk), q, q, q, inner=10)
            except Exception as e:
                print(f"nTd_multi chunk={chunk} failed: {type(e).__name__}: {str(e)[:140]}", flush=True)

    if "all" in which or "pack" in which:
        q = jax.random.normal(rng, (m, T, D), bf)
        for tile in (128, 256, 512):
            try:
                timeit(f"nTd_pack tile={tile}", functools.partial(ntd_pack_attn, tile=tile),
                       q, q, q, inner=10)
            except Exception as e:
                print(f"nTd_pack tile={tile} failed: {type(e).__name__}: {str(e)[:140]}", flush=True)

    if "all" in which or "e2e" in which or "base" in which:
        x = jax.random.normal(rng, (B, T, S, C), bf)
        ws = [jax.random.normal(jax.random.PRNGKey(i), (C, C), bf) * 0.05
              for i in range(1, 5)]
        if "all" in which or "base" in which:
            timeit("scope base (Dense + shipping kernel)", base_scope, x, *ws, inner=5)
        if "all" in which or "e2e" in which:
            for tile, attn in ((256, ntd_attn), (512, ntd_attn), (256, ntd_pack_attn)):
                name = f"scope e2e {attn.__name__} tile={tile}"
                try:
                    timeit(name, functools.partial(e2e_scope, attn=attn, tile=tile),
                           x, *ws, inner=5)
                except Exception as e:
                    print(f"{name} failed: {type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
