"""Fused spatial-attention layer (ops/pallas/spatial_layer.py) vs the
shipping unfused composition (LayerNorm + Dense q/k/v + fullkv_attention +
Dense out), at the flagship UNet's spatial self-attention shapes.

Methodology (see scripts/profile_temporal_v4.py): every timed function maps
the full activation to a like-shaped array and iterations CHAIN through the
output, so no pass can be folded away; the axon tunnel's per-call latency is
cancelled by differencing two inner counts.

Run on TPU: python scripts/profile_spatial_layer.py [block_q ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from viewcrafter_tpu.ops.pallas import spatial_layer
from viewcrafter_tpu.ops.pallas.fullkv_attention import fullkv_attention


def chain_time(fn, x, args, inner_lo=4, inner_hi=12):
    """Per-call ms via two chained loops (latency cancels in the diff)."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(i, x):
            return fn(x, *args)
        return lax.fori_loop(0, n, body, x)

    for n in (inner_lo, inner_hi):
        loop(x, n).block_until_ready()  # compile both
    ts = []
    for n in (inner_lo, inner_hi):
        t0 = time.perf_counter()
        loop(x, n).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (inner_hi - inner_lo) * 1e3


def unfused(x, lns, lnb, wq, wk, wv, wo, bo, heads, d):
    b, s, c = x.shape
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    xc = xf - mu
    var = (xc * xc).mean(-1, keepdims=True)
    xn = ((xc * lax.rsqrt(var + 1e-5)) * lns + lnb).astype(x.dtype)
    q = (xn @ wq).reshape(b, s, heads, d)
    k = (xn @ wk).reshape(b, s, heads, d)
    v = (xn @ wv).reshape(b, s, heads, d)
    o = fullkv_attention(q, k, v).reshape(b, s, c)
    return o @ wo + bo


def main():
    blocks = [int(a) for a in sys.argv[1:]]
    key = jax.random.PRNGKey(0)
    for (b, s, heads, d) in [(50, 9216, 5, 64), (50, 2304, 10, 64),
                             (50, 576, 20, 64)]:
        c = heads * d
        ks = jax.random.split(jax.random.fold_in(key, s), 6)
        x = (jax.random.normal(ks[0], (b, s, c)) * 0.5).astype(jnp.bfloat16)
        lns = jax.random.normal(ks[1], (c,)) * 0.1 + 1.0
        lnb = jax.random.normal(ks[2], (c,)) * 0.1
        wqkv = (jax.random.normal(ks[3], (c, 3 * c)) * c ** -0.5).astype(jnp.bfloat16)
        wq, wk, wv = jnp.split(wqkv, 3, axis=1)
        wo = (jax.random.normal(ks[4], (c, c)) * c ** -0.5).astype(jnp.bfloat16)
        bo = (jax.random.normal(ks[5], (c,)) * 0.02).astype(jnp.bfloat16)

        ms = chain_time(unfused, x, (lns, lnb, wq, wk, wv, wo, bo, heads, d))
        print(f"S={s:5d} unfused scope        {ms:8.2f} ms", flush=True)

        for bq in (blocks or [spatial_layer._pick_block_q(s, c)]):
            orig = spatial_layer._pick_block_q
            spatial_layer._pick_block_q = lambda *a, _bq=bq, **k: _bq
            try:
                fn = lambda x, *a: spatial_layer.fused_spatial_layer(  # noqa: E731
                    x, *a, heads=heads, dim_head=d)
                ms = chain_time(fn, x, (lns, lnb, wqkv, wo, bo))
                print(f"S={s:5d} fused  (bq={bq:4d})   {ms:8.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"S={s:5d} fused  (bq={bq:4d})   FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
            finally:
                spatial_layer._pick_block_q = orig


if __name__ == "__main__":
    main()
