"""Headline benchmark: seconds per generated video, flagship configuration.

Reference baseline (BASELINE.md): ViewCrafter_25 — 576x1024, 25 frames,
DDIM-50, perframe VAE — 120 s / 23.5 GB on A100-40G. We measure the SAME
workload (the full jitted prepare->sample->decode program, random weights —
FLOP/bandwidth identical to trained weights) on one TPU chip.

Structure (VERDICT r4 #1 — BENCH_r03/r04 both timed out before printing a
single line; the r5 cold-path profile is init 189 s + prepare 61 s + window
292 s + decode 114 s of XLA compile on this 1-core host):

  1. params come from `fast_init_params` (eval_shape + one RNG program):
     seconds instead of the 189 s forward-trace compile of flax init;
  2. every compile stage prints a stderr heartbeat, so a timeout tail is
     diagnosable;
  3. the EXTRAPOLATED exact headline (warm per-stage timings: prepare +
     steps*per_step + decode, D2H-forced sync — block_until_ready can return
     early through the experimental axon tunnel) is emitted the moment the
     three programs are warm;
  4. if budget remains, ONE full measured run replaces it (reps via
     VIEWCRAFTER_BENCH_REPS, default 1);
  5. secondaries (PAB-3, e2e pipeline) run only with generous budget left,
     and EVERY stage runs in its own subprocess (VIEWCRAFTER_BENCH_STAGE):
     the 16 GB chip cannot hold two stages' weights+buffers at once
     (measured r5 — in-process secondaries died RESOURCE_EXHAUSTED);
  6. the freshest headline is re-printed LAST (the driver parses the final
     JSON line).

Env knobs: VIEWCRAFTER_BENCH_MODEL (default viewcrafter_25),
VIEWCRAFTER_BENCH_STEPS (default 50), VIEWCRAFTER_BENCH_REPS (default 1),
VIEWCRAFTER_BENCH_PAB (default 1 = exact), VIEWCRAFTER_BENCH_SECONDARY /
VIEWCRAFTER_BENCH_E2E (default 1; 0 skips the extra lines),
VIEWCRAFTER_BENCH_BUDGET_S (wall-clock budget, default 1500 s).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# A100-40G reference numbers per model family (reference README.md:117-122)
BASELINES = {
    "viewcrafter_25": 120.0,
    "viewcrafter_16": 75.0,
    "viewcrafter_25_512": 50.0,
}

_T0 = time.time()
_BUDGET_S = float(os.environ.get("VIEWCRAFTER_BENCH_BUDGET_S", "1500"))


def _remaining() -> float:
    return _BUDGET_S - (time.time() - _T0)


def _hb(msg: str) -> None:
    print(f"# [{time.time() - _T0:6.0f}s] {msg}", file=sys.stderr, flush=True)


def _emit(line: dict) -> None:
    print(json.dumps(line), flush=True)


def _sync(*arrs) -> None:
    """Force completion via a D2H element read per array (a plain
    block_until_ready can return early through the experimental axon
    tunnel; a host read of any element cannot)."""
    for a in arrs:
        np.asarray(jax.device_get(a[(0,) * a.ndim]))


def _headline_dict(cfg, steps, pab, value, baseline):
    return {
        "metric": (
            f"sec/video ({cfg.height}x{cfg.width}x{cfg.video_length}, "
            f"DDIM-{steps}, {'PAB-' + str(pab) if pab > 1 else 'exact'}) per chip"
        ),
        "value": round(value, 2),
        "unit": "s",
        "vs_baseline": round(baseline / value, 3),
    }


def bench_engine(model_name, steps, reps, pab, pab_kinds, pab_sites, pab_dtype,
                 baseline):
    """Time the flagship diffusion workload, emitting the headline as soon as
    a defensible number exists. Returns the freshest headline dict."""
    from viewcrafter_tpu.config import get_model_config
    from viewcrafter_tpu.models.lvdm import VideoDiffusionEngine
    from viewcrafter_tpu.sampling.ddim import GuidanceConfig

    cfg = get_model_config(model_name)
    eng = VideoDiffusionEngine(cfg)
    _hb("attaching device")
    dev = jax.devices()[0]
    _hb(f"device attached: {dev}")
    _sync(jnp.zeros((1,)) + 1.0)  # first dispatch: tunnel handshake + tiny compile
    _hb("first dispatch done; materializing params (fast_init_params)")
    params = eng.fast_init_params(jax.random.PRNGKey(0))
    _sync(jax.tree_util.tree_leaves(params)[0])
    _hb("params ready")

    frames = jnp.zeros((1, cfg.video_length, cfg.height, cfg.width, 3))
    ids = jnp.asarray(eng.prompt_ids("Rotating view of a scene", 1))
    uids = jnp.asarray(eng.prompt_ids("", 1))

    guidance = GuidanceConfig(
        sequential=os.environ.get("VIEWCRAFTER_BENCH_SEQ_CFG", "0") == "1"
    )
    # sampling runs in windows of `chunk` steps: the serving environment kills
    # single device executions beyond ~1 minute (x stays on device throughout)
    chunk = int(os.environ.get("VIEWCRAFTER_BENCH_CHUNK", "10"))
    if pab > 1:
        # The flagship PAB window peaks at ~10.7 GiB and the chip holds ONE
        # such loaded executable's arena comfortably but not two (measured
        # r5: a second big window executable — a different static num —
        # OOMs at its first execution even though re-running the first one
        # is fine). So: many PAB cells per device call inside one executable
        # (sampling/ddim.py ddim_sample_window_pab_cells), and pick chunk so
        # the WHOLE chain uses a single window executable — two equal halves
        # when that stays under the ~1 min serving watchdog (25 steps ~ 39 s
        # at flagship). steps=50, pab=3 -> chunk 25 = 8 cells + 1-step tail
        # folded into the same program; full evals at steps {0,3,...,24} and
        # {25,28,...,49}: 18 vs the canonical cadence's 17 — one step MORE
        # exact than labeled.
        half = -(-steps // 2)
        chunk = half if half <= 26 else pab * max(1, 24 // pab)

    prepare_fn, window_fn, decode_fn = eng.staged_programs(
        tuple(frames.shape), steps=steps, guidance=guidance,
        attn_reuse_interval=pab, attn_reuse_kinds=pab_kinds,
        attn_reuse_sites=pab_sites, attn_reuse_dtype=pab_dtype,
    )

    def run_chain(seed, sync_each_window=False):
        """One full generation through the staged programs; returns video."""
        x, z_cond, contexts, rng_sample = prepare_fn(
            params, frames, ids, uids, jax.random.PRNGKey(seed))
        if sync_each_window:
            # don't let prepare's VAE/CLIP temps overlap the first window's
            # 10.7 GiB execution (the PAB chain OOMs without this, r5)
            _sync(x, z_cond, contexts)
        s0 = 0
        while s0 < steps:
            num = min(chunk, steps - s0)
            x = window_fn(params, x, z_cond, contexts, rng_sample,
                          jnp.asarray(s0), num)
            if sync_each_window:
                _sync(x)
                _hb(f"  window {s0}+{num} done")
            s0 += num
        return decode_fn(params, x)

    # ---- compile each stage with heartbeats (cold: ~60/290/115 s) ----------
    _hb("compiling prepare (VAE encode + CLIP contexts)")
    t0 = time.time()
    x, z_cond, contexts, rng_sample = prepare_fn(
        params, frames, ids, uids, jax.random.PRNGKey(0))
    _sync(x, z_cond, contexts)
    _hb(f"prepare compiled+ran in {time.time() - t0:.0f}s")

    _hb(f"compiling sampling window ({chunk} steps)")
    t0 = time.time()
    xw = window_fn(params, x, z_cond, contexts, rng_sample, jnp.asarray(0), chunk)
    _sync(xw)
    _hb(f"window compiled+ran in {time.time() - t0:.0f}s")

    rem = steps % chunk
    if rem:
        # the chain's final window is a DIFFERENT executable (static num);
        # compile+run it here so the measured chain never compiles mid-flight
        _hb(f"compiling tail window ({rem} steps)")
        t0 = time.time()
        xt = window_fn(params, xw, z_cond, contexts, rng_sample,
                       jnp.asarray(steps - rem), rem)
        _sync(xt)
        del xt
        _hb(f"tail window compiled+ran in {time.time() - t0:.0f}s")

    _hb("compiling decode (per-frame VAE)")
    t0 = time.time()
    video = decode_fn(params, xw)
    _sync(video)
    _hb(f"decode compiled+ran in {time.time() - t0:.0f}s")

    # ---- warm per-stage timings -> extrapolated headline -------------------
    t0 = time.time()
    x2, z2, c2, r2 = prepare_fn(params, frames, ids, uids, jax.random.PRNGKey(1))
    _sync(x2, z2, c2)
    t_prepare = time.time() - t0

    t0 = time.time()
    xw2 = window_fn(params, x2, z2, c2, r2, jnp.asarray(0), chunk)
    _sync(xw2)
    t_window = time.time() - t0

    t0 = time.time()
    v2 = decode_fn(params, xw2)
    _sync(v2)
    t_decode = time.time() - t0

    extrapolated = t_prepare + (t_window / chunk) * steps + t_decode
    _hb(f"warm stages: prepare {t_prepare:.1f}s window {t_window:.1f}s "
        f"decode {t_decode:.1f}s -> extrapolated {extrapolated:.1f}s")
    headline = _headline_dict(cfg, steps, pab, extrapolated, baseline)
    headline["note"] = "extrapolated from warm per-stage timings"
    _emit(headline)

    # free the cold+warm stage outputs before the measured chain: ~1 GB of
    # stale device buffers whose python refs would otherwise stay live, and
    # the PAB window program peaks at 10.7 of the chip's ~13 usable GiB
    # (measured r5: the chain OOMed with these alive, runs without)
    del x, z_cond, contexts, rng_sample, xw, video, x2, z2, c2, r2, xw2, v2

    # ---- full measured run(s) replace the extrapolation --------------------
    times = []
    for i in range(reps):
        if _remaining() < extrapolated * 1.3:
            _hb(f"budget too tight for measured rep {i} "
                f"({_remaining():.0f}s left); keeping extrapolated")
            break
        t0 = time.time()
        # PAB windows peak at ~10.7 GiB each (f8 cache): without a sync the
        # async tunnel keeps several window executions in flight and their
        # buffers coexist -> OOM on the measured run even though each window
        # ran fine during warm-up (observed r5). Exact windows (7.4 GiB) keep
        # the unsynced pipeline; per-window sync costs ~30 ms of tunnel RTT.
        try:
            out = run_chain(seed=2 + i, sync_each_window=pab > 1)
            _sync(out)
        except Exception as e:  # HBM OOM / transient worker restart:
            # keep the extrapolated headline rather than dying lineless
            _hb(f"measured rep {i} failed ({type(e).__name__}); "
                "keeping extrapolated")
            break
        times.append(time.time() - t0)
        _hb(f"measured rep {i}: {times[-1]:.1f}s")
    if times:
        headline = _headline_dict(cfg, steps, pab, min(times), baseline)
        _emit(headline)
    return headline


def bench_e2e(model_name, steps):
    """Full single-view pipeline wall-clock on a real test image: dust3r pair
    inference -> 300-iter global alignment -> 25-view point rasterization ->
    DDIM-50 diffusion (VERDICT r2 #2). First run compiles; the second run is
    the reported steady-state number. Params via fast_materialize — weight
    CONTENT does not affect stage timings."""
    from viewcrafter_tpu.models.lvdm import fast_materialize
    from viewcrafter_tpu.pipeline import InferenceOptions, ViewCrafterPipeline

    img = os.path.join(os.path.dirname(os.path.abspath(__file__)), "test", "images", "boy.png")
    if not os.path.exists(img):
        return None
    opts = InferenceOptions(
        image_dir=img,
        out_dir="/tmp/bench_e2e",
        mode="single_view_target",
        model=model_name,
        ddim_steps=steps,
        d_theta=(-30.0,), d_phi=(45.0,), d_r=(-0.2,),
    )
    pipe = ViewCrafterPipeline(opts, init_models=False)
    _hb("e2e: materializing params")
    pipe.dust3r_params = fast_materialize(
        lambda r: pipe.dust3r.init(r, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))),
        jax.random.PRNGKey(1),
    )
    pipe.lvdm_params = pipe.engine.fast_init_params(jax.random.PRNGKey(2))
    os.makedirs(opts.save_dir, exist_ok=True)
    pipe.load_inputs()

    def once():
        t0 = time.time()
        pipe.run_dust3r(pipe.images)
        pipe.nvs_single_view(save_suffix="_bench")
        return time.time() - t0

    _hb("e2e: cold run (compiles dust3r/align/render)")
    first = once()  # compile + warm caches (dust3r/align/render/diffusion)
    _hb(f"e2e: cold run {first:.0f}s")
    if _remaining() < first * 1.2:
        return first  # over budget: report the cold number rather than none
    return once()


def _run_stage(stage: str, budget_s: float, extra_env: dict | None = None):
    """Run one bench stage as a fresh `python bench.py` subprocess.

    Stage isolation is a CORRECTNESS requirement, not tidiness: the flagship
    holds ~2.9 GB of bf16 weights plus multi-GB sampling buffers, and running
    the PAB-3 or e2e stage in the same process after the exact headline OOMs
    the 16 GB chip (measured r5: both secondaries died RESOURCE_EXHAUSTED
    after a clean 91 s primary). A child process releases every HBM buffer at
    exit; each stage re-pays ~60 s of device attach + param init, which the
    budget gates already price in.

    Streams child stdout through (the driver parses our stdout), passes
    stderr (heartbeats) straight through, and returns the last JSON line the
    child printed, or None. Kills the child if it overstays its budget."""
    import subprocess
    import threading

    env = dict(os.environ)
    env["VIEWCRAFTER_BENCH_STAGE"] = stage
    env["VIEWCRAFTER_BENCH_BUDGET_S"] = str(max(60, int(budget_s)))
    env.update(extra_env or {})
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        stdout=subprocess.PIPE, stderr=None, env=env, text=True)
    lines = []

    def pump():
        for line in proc.stdout:
            line = line.rstrip("\n")
            if line:
                print(line, flush=True)
                lines.append(line)

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    try:
        proc.wait(timeout=budget_s + 180)
    except subprocess.TimeoutExpired:
        _hb(f"stage {stage} overstayed its {budget_s:.0f}s budget; killing")
        proc.kill()
        proc.wait()
    t.join(timeout=10)
    for line in reversed(lines):
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                pass
    return None


def _stage_main(stage: str):
    """Child-process entry: run exactly one stage inline."""
    model_name = os.environ.get("VIEWCRAFTER_BENCH_MODEL", "viewcrafter_25")
    steps = int(os.environ.get("VIEWCRAFTER_BENCH_STEPS", "50"))
    reps = int(os.environ.get("VIEWCRAFTER_BENCH_REPS", "1"))
    baseline = BASELINES.get(model_name, 120.0)
    pab = int(os.environ.get("VIEWCRAFTER_BENCH_PAB", "1"))
    pab_kinds = tuple(
        os.environ.get("VIEWCRAFTER_BENCH_PAB_KINDS", "spatial,temporal").split(","))
    pab_sites = tuple(
        s for s in os.environ.get(
            "VIEWCRAFTER_BENCH_PAB_SITES", "down_0,up_0,init_attn").split(",") if s)
    pab_dtype = os.environ.get("VIEWCRAFTER_BENCH_PAB_DTYPE", "bf16")

    if stage == "headline":
        bench_engine(model_name, steps, reps, pab, pab_kinds, pab_sites,
                     pab_dtype, baseline)
    elif stage == "pab3":
        h = bench_engine(model_name, steps, 1, 3, pab_kinds, pab_sites,
                         pab_dtype, baseline)
        h = dict(h)
        tags = []
        if pab_dtype != "bf16":
            tags.append(f"{pab_dtype} cache")
        if tuple(pab_sites) != ("down_0", "up_0", "init_attn"):
            tags.append("sites " + "+".join(pab_sites))
        if os.environ.get("VIEWCRAFTER_BENCH_SEQ_CFG", "0") == "1":
            tags.append("sequential CFG")
        h["metric"] = (
            "sec/video PAB-3 attention-reuse"
            + ("".join(", " + t for t in tags))
            + " (approximate sampling; secondary)"
        )
        _emit(h)
    elif stage == "e2e":
        v = bench_e2e(model_name, steps)
        if v is not None:
            _emit({
                "metric": "sec e2e single-view pipeline (dust3r+align+render+diffusion; secondary)",
                "value": round(v, 2), "unit": "s",
                # the A100 baseline (120 s) covers the diffusion stage only;
                # no published reference e2e number exists (BASELINE.md)
                "vs_baseline": round(baseline / v, 3),
            })
    else:
        raise SystemExit(f"unknown bench stage {stage!r}")


def main():
    # Persistent compile cache lives IN THE REPO by default: /tmp is wiped
    # between the builder session and the driver's end-of-round bench run
    # (diagnosed r5 — BENCH_r03/r04 rc=124 were ~470+ s of cold XLA compile),
    # while the repo workdir persists. Pre-warming this dir makes the driver's
    # run compile-from-cache in ~2 min.
    _default_cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", _default_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    stage = os.environ.get("VIEWCRAFTER_BENCH_STAGE")
    if stage:
        _stage_main(stage)
        return

    # ---- parent: orchestrate one fresh subprocess per stage ----------------
    model_name = os.environ.get("VIEWCRAFTER_BENCH_MODEL", "viewcrafter_25")
    steps = int(os.environ.get("VIEWCRAFTER_BENCH_STEPS", "50"))
    # attention-broadcast interval: 1 = EXACT sampling (the headline; default).
    # >1 = PAB reuse (approximate; reported as a labeled secondary line).
    pab = int(os.environ.get("VIEWCRAFTER_BENCH_PAB", "1"))
    _hb(f"bench start: {model_name} DDIM-{steps} pab={pab} budget={_BUDGET_S:.0f}s")

    # ---- fallback FIRST: the serving tunnel's per-process first dispatch is
    # wildly variable (measured this session: 28 s to 1051 s for the same
    # trivial program — remote scheduling, not compile). If the whole run dies
    # to that, the last JSON line should still carry a number — the previous
    # locally measured headline, HONESTLY labeled as such in its own note
    # field. Any live line printed later supersedes it.
    last_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_last.json")
    if os.path.exists(last_path):
        try:
            with open(last_path) as f:
                prev = dict(json.load(f))
            prev["note"] = (
                "FALLBACK: last measured value from a prior run of this bench "
                "on the same chip (not this invocation); superseded by any "
                "lines printed after it")
            _emit(prev)
        except (json.JSONDecodeError, OSError):
            pass

    # ---- headline: exact sampling, emitted the moment it exists ----
    headline = _run_stage("headline", _remaining() - 30)
    if headline is not None and "note" not in headline:
        try:  # record the fully-measured headline for the next run's fallback
            with open(last_path, "w") as f:
                json.dump(headline, f)
        except OSError:
            pass

    # ---- secondaries, budget permitting (each prints as it completes) ----
    if (
        pab == 1
        and os.environ.get("VIEWCRAFTER_BENCH_SECONDARY", "1") == "1"
        and _remaining() > 500
    ):
        # The bf16 full-site PAB-3 window needs 13.2 GiB (AOT memory_analysis,
        # r5) and OOMs the chip even in a fresh process — the 17 cached ds1
        # site outputs are 5.8 GiB next to 2.7 GiB of weights. f8 cache
        # storage keeps the SAME reuse topology at 10.7 GiB total (fits;
        # labeled on the line). Fallback: exact-bf16 cache on the smaller
        # down_0+init_attn site set (10.3 GiB).
        _hb("secondary: PAB-3, f8 cache (fresh process)")
        got = _run_stage("pab3", _remaining() - 120,
                         {"VIEWCRAFTER_BENCH_PAB_DTYPE": "f8"})
        if got is None and _remaining() > 500:
            _hb("PAB-3 f8 failed; retrying bf16 cache on down_0+init_attn sites")
            _run_stage("pab3", _remaining() - 120,
                       {"VIEWCRAFTER_BENCH_PAB_SITES": "down_0,init_attn"})

    if os.environ.get("VIEWCRAFTER_BENCH_E2E", "1") == "1" and _remaining() > 700:
        _hb("secondary: e2e single-view pipeline (fresh process)")
        _run_stage("e2e", _remaining() - 60)

    # headline LAST too (the driver parses the final JSON line)
    if headline is not None:
        _emit(headline)


if __name__ == "__main__":
    main()
