"""Microbenchmark the flagship UNet eval and its dominant ops on the real TPU.

Times (a) one full batched-CFG UNet eval at flagship shapes, and (b) isolated
ops at the exact shapes the eval uses, to localize where the 1.15 s/eval goes.
Each timed program stays well under the serving watchdog (~1 min).

Usage: python scripts/profile_unet.py [op ...]   (default: all)
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


def timeit(name, fn, *args, reps=3, inner=5):
    """Times `inner` chained applications inside ONE jit (amortizes the axon
    tunnel's per-call latency) and syncs with a SCALAR D2H read (fetching the
    full output would measure the tunnel's bandwidth, not the kernel)."""

    # perturb the first ARRAY argument (arg 0 may be a params pytree)
    ai = next(i for i, v in enumerate(args) if hasattr(v, "dtype"))

    def loop(*a):
        # serialize iterations through a data dependency (float x*0 is not
        # foldable — NaN semantics — so XLA can't CSE the repeated calls)
        s = jnp.float32(0.0)
        for _ in range(inner):
            av = list(a)
            av[ai] = a[ai] + (s * 0).astype(a[ai].dtype)
            out = fn(*av)
            s = jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))
        return s

    jl = jax.jit(loop)
    _ = float(jl(*args))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jl(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / inner
    print(f"{name:<42s} {per*1000:9.2f} ms", flush=True)
    return per


def main():
    which = set(sys.argv[1:]) or {"all"}
    rng = jax.random.PRNGKey(0)
    KB = 2  # CFG branches * batch
    T = 25
    H, W = 72, 128  # latent grid

    def sel(n):
        return "all" in which or n in which

    # ---- full UNet eval ---------------------------------------------------
    if sel("unet"):
        from viewcrafter_tpu.config import get_model_config
        from viewcrafter_tpu.models.lvdm import VideoDiffusionEngine, cast_params_bf16

        cfg = get_model_config("viewcrafter_25")
        eng = VideoDiffusionEngine(cfg)
        params = jax.block_until_ready(
            jax.jit(lambda r: cast_params_bf16(eng.init_params(r)))(rng)
        )
        x = jnp.zeros((KB, T, H, W, 8), jnp.bfloat16)
        ts = jnp.full((KB,), 500.0)
        ctx = jnp.zeros((KB, 77 + T * 16, 1024), jnp.bfloat16)

        def unet_eval(p, x, ts, ctx):
            return eng.unet.apply(p, x, ts, ctx)

        timeit("full UNet eval (KB=2)", unet_eval, params.unet, x, ts, ctx)

    bf = jnp.bfloat16
    from viewcrafter_tpu.ops.attention import flash_attention, xla_attention

    # ---- spatial self-attention at each ds --------------------------------
    shapes = {
        "attn_ds1": (KB * T, 72 * 128, 5, 64),
        "attn_ds2": (KB * T, 36 * 64, 10, 64),
        "attn_ds4": (KB * T, 18 * 32, 20, 64),
    }
    for name, (b, s, h, d) in shapes.items():
        if not sel(name):
            continue
        q = jax.random.normal(rng, (b, s, h, d), bf)
        impl = flash_attention if s >= 2048 else xla_attention
        timeit(f"{name} {impl.__name__} ({b},{s},{h},{d})", impl, q, q, q)

    # ---- cross attention (kv = 77 text + 16 img tokens) -------------------
    if sel("cross"):
        q = jax.random.normal(rng, (KB * T, 9216, 5, 64), bf)
        k = jax.random.normal(rng, (KB * T, 93, 5, 64), bf)
        timeit("cross_ds1 xla (9216q x 93kv)", xla_attention, q, k, k)

    # ---- temporal attention ------------------------------------------------
    if sel("temporal"):
        from viewcrafter_tpu.models.unet3d import _temporal_attention

        q = jax.random.normal(rng, (KB, T, 9216, 5, 64), bf)
        timeit("temporal_ds1 (T=25, S=9216)", _temporal_attention, q, q, q)

    # ---- GroupNorm chain ---------------------------------------------------
    if sel("gn"):
        from viewcrafter_tpu.ops.pallas.groupnorm import group_norm_silu

        x = jax.random.normal(rng, (KB * T, 72, 128, 320), bf)
        sc = jnp.ones((320,), jnp.float32)
        bi = jnp.zeros((320,), jnp.float32)
        timeit("groupnorm+silu ds1 (50,72,128,320)", functools.partial(
            group_norm_silu, num_groups=32, eps=1e-5, with_silu=True), x, sc, bi)

    # ---- ResBlock convs ----------------------------------------------------
    if sel("conv"):
        x = jax.random.normal(rng, (KB * T, 72, 128, 320), bf)
        w = jax.random.normal(rng, (3, 3, 320, 320), bf) * 0.02

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(bf)

        timeit("conv3x3 ds1 (50,72,128,320->320)", conv, x, w)

        xt = jax.random.normal(rng, (KB, T, 72, 128, 320), bf)
        wt = jax.random.normal(rng, (3, 1, 1, 320, 320), bf) * 0.02

        def conv_t(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
                preferred_element_type=jnp.float32,
            ).astype(bf)

        timeit("temporal conv3x1x1 ds1", conv_t, xt, wt)

    # ---- FF (GEGLU) --------------------------------------------------------
    if sel("ff"):
        x = jax.random.normal(rng, (KB * T, 9216, 320), bf)
        w1 = jax.random.normal(rng, (320, 2560), bf) * 0.02
        w2 = jax.random.normal(rng, (1280, 320), bf) * 0.02

        def ff(x, w1, w2):
            h = x @ w1
            a, g = jnp.split(h, 2, axis=-1)
            h = a * jax.nn.gelu(g.astype(jnp.float32), approximate=False).astype(bf)
            return h @ w2

        timeit("FF GEGLU ds1 (50x9216, 320->1280)", ff, x, w1, w2)

    # ---- qkv/out projections ----------------------------------------------
    if sel("proj"):
        x = jax.random.normal(rng, (KB * T, 9216, 320), bf)
        w = jax.random.normal(rng, (320, 320), bf) * 0.02
        timeit("proj 320x320 (x4 per attn)", lambda x, w: x @ w, x, w)


if __name__ == "__main__":
    main()
