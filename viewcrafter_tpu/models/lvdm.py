"""The latent video diffusion engine: guidance frames -> generated video.

This is the TPU-native equivalent of the reference's
`image_guided_synthesis` + `VIPLatentDiffusion` inference path
(utils/diffusion_utils.py:117-201, lvdm/models/ddpm3d.py:1250-1418):

  1. CLIP-encode the condition frame (all 257 visual tokens) and project
     through the Perceiver resampler -> 256 image context tokens;
  2. CLIP-text-encode the prompt (and the empty prompt for the uncond branch);
  3. VAE-encode all guidance frames per-frame -> z_cond, the `c_concat`
     channel-concat conditioning (the rendered point-cloud video);
  4. run the DDIM loop with batched CFG branches;
  5. VAE-decode the sampled latents per-frame.

Everything from (1)-(5) is ONE jitted program: frames never leave the device
between render, encode, sample and decode (the reference bounces to host
between stages). Per-frame VAE work uses `lax.scan` over the time axis so the
peak HBM footprint stays at one frame of encoder/decoder activations
(equivalent of `perframe_ae`, ddpm3d.py:633-639).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp

from viewcrafter_tpu.config import ModelConfig
from viewcrafter_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder, clip_preprocess
from viewcrafter_tpu.models.resampler import Resampler
from viewcrafter_tpu.models.unet3d import UNet3D
from viewcrafter_tpu.models.vae import AutoencoderKL
from viewcrafter_tpu.ops.schedule import DDIMSchedule, DiffusionSchedule
from viewcrafter_tpu.sampling.ddim import GuidanceConfig, ddim_sample
from viewcrafter_tpu.utils.tokenizer import tokenize


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LVDMParams:
    """Parameter pytrees of the five submodels (a jax pytree)."""

    unet: Any
    vae: Any
    clip_text: Any
    clip_vision: Any
    resampler: Any


def fast_materialize(init_fn, rng: jax.Array, dtype=jnp.bfloat16):
    """Benchmark/dev-only parameter materialization for any flax-style init.

    `init_fn(rng)` under flax traces a full forward pass, and jitting it
    compiles that pass — minutes of XLA compile at flagship scale on a 1-core
    host. This takes the pytree SHAPES from `jax.eval_shape` (abstract, no
    compile) and fills every float32 leaf with a 0.02-scaled normal draw
    directly in `dtype` via one small fused program. FLOP/bandwidth-identical
    to trained weights for timing purposes and numerically finite, but NOT
    distribution-faithful per layer (no fan-in scaling; zero-init layers are
    nonzero): use for benchmarks only, never for training or goldens."""
    import math

    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    sizes = [math.prod(leaf.shape) for leaf in leaves]
    total = sum(sizes)

    def build(rng):
        # ONE flat draw + static slices: a per-leaf fold_in/normal graph is
        # ~800 independent threefry subgraphs and takes minutes of XLA
        # compile on a 1-core host (measured round 5); this compiles in
        # seconds. Peak HBM = flat + leaves = 2x weights.
        flat = 0.02 * jax.random.normal(rng, (total,), dtype)
        outs, off = [], 0
        for leaf, sz in zip(leaves, sizes):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                d = dtype if leaf.dtype == jnp.float32 else leaf.dtype
                outs.append(flat[off:off + sz].reshape(leaf.shape).astype(d))
            else:
                outs.append(jnp.zeros(leaf.shape, leaf.dtype))
            off += sz
        return jax.tree_util.tree_unflatten(treedef, outs)

    return jax.jit(build)(rng)


def cast_params_bf16(tree):
    """Cast float32 leaves to bfloat16 (inference weight storage).

    Halves HBM for weights (the 2.5B-param flagship otherwise spends ~10 GB of
    a v5e's 16 GB on fp32 weights). Norm layers still compute in fp32; their
    bf16-stored scales upcast on use."""
    return jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if hasattr(p, "dtype") and p.dtype == jnp.float32 else p,
        tree,
    )


class VideoDiffusionEngine:
    """Owns the submodules + schedules; exposes jitted inference programs."""

    def __init__(self, cfg: ModelConfig, dtype=jnp.bfloat16):
        self.cfg = cfg
        self.dtype = dtype
        self.unet = UNet3D(cfg=cfg.unet, dtype=dtype)
        self.vae = AutoencoderKL(
            ch=cfg.vae.ch, ch_mult=cfg.vae.ch_mult, num_res_blocks=cfg.vae.num_res_blocks,
            embed_dim=cfg.vae.embed_dim, z_channels=cfg.vae.z_channels, dtype=dtype,
        )
        self.clip_text = CLIPTextEncoder(cfg=cfg.clip_text, dtype=dtype)
        self.clip_vision = CLIPVisionEncoder(cfg=cfg.clip_vision, dtype=dtype)
        self.resampler = Resampler(cfg=cfg.resampler, dtype=dtype)
        d = cfg.diffusion
        self.schedule = DiffusionSchedule.create(
            timesteps=d.timesteps, beta_schedule=d.beta_schedule,
            linear_start=d.linear_start, linear_end=d.linear_end,
            rescale_betas_zero_snr=d.rescale_betas_zero_snr,
            use_dynamic_rescale=d.use_dynamic_rescale, base_scale=d.base_scale,
            turning_step=d.turning_step,
        )
        self.scale_factor = d.scale_factor

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------

    def init_params(self, rng: jax.Array) -> LVDMParams:
        """Random init (real checkpoints come from utils/checkpoint.py)."""
        cfg = self.cfg
        t = cfg.video_length
        h, w = cfg.diffusion.latent_size
        keys = jax.random.split(rng, 5)
        n_img_tokens = cfg.resampler.num_queries * (cfg.resampler.video_length or 1)
        ctx_len = cfg.clip_text.context_length + n_img_tokens
        unet = self.unet.init(
            keys[0],
            jnp.zeros((1, t, h, w, cfg.unet.in_channels)),
            jnp.zeros((1,)),
            jnp.zeros((1, ctx_len, cfg.unet.context_dim)),
        )
        vae = self.vae.init(keys[1], jnp.zeros((1, 64, 64, 3)))
        clip_text = self.clip_text.init(keys[2], jnp.zeros((1, 77), jnp.int32))
        clip_vision = self.clip_vision.init(keys[3], jnp.zeros((1, 224, 224, 3)))
        resampler = self.resampler.init(
            keys[4], jnp.zeros((1, 257, cfg.resampler.embedding_dim))
        )
        return LVDMParams(unet, vae, clip_text, clip_vision, resampler)

    def fast_init_params(self, rng: jax.Array, dtype=jnp.bfloat16) -> LVDMParams:
        """Benchmark/dev-only parameter materialization (see
        `fast_materialize`): same pytree shapes as `init_params` without its
        forward-trace compile (~3 min at flagship scale on a 1-core host;
        measured round 5). Timing-faithful, NOT distribution-faithful."""
        return fast_materialize(self.init_params, rng, dtype=dtype)

    # ------------------------------------------------------------------
    # jitted building blocks
    # ------------------------------------------------------------------

    @staticmethod
    def _frame_chunk(t: int, max_chunk: int = 1) -> int:
        """Frames per VAE call (largest divisor of t <= max_chunk).

        Measured on v5e at 576x1024: chunk=5 is 2.3x SLOWER than per-frame
        (decode 25f: 3.05 s vs 1.33 s — larger batches degrade the conv
        tiling / spill VMEM at full res), so the default stays per-frame,
        which also matches the reference's perframe_ae memory behavior."""
        best = 1
        for c in range(1, max_chunk + 1):
            if t % c == 0:
                best = c
        return best

    def encode_frames(self, vae_params, frames, rng=None):
        """Frame-chunked VAE encode under lax.scan: (B,T,H,W,3) -> (B,T,h,w,4)*sf."""
        b, t = frames.shape[:2]
        c = self._frame_chunk(t)

        def body(carry, chunk):
            # chunk: (B*c, H, W, 3); fresh posterior noise per chunk
            if carry is None:
                return None, self.vae.apply(vae_params, chunk, None, method=AutoencoderKL.encode)
            carry, sub = jax.random.split(carry)
            z = self.vae.apply(vae_params, chunk, sub, method=AutoencoderKL.encode)
            return carry, z

        frames_t = jnp.swapaxes(frames, 0, 1).reshape((t // c, c * b) + frames.shape[2:])
        _, z = jax.lax.scan(body, rng, frames_t)
        z = z.reshape((t, b) + z.shape[2:])
        return jnp.swapaxes(z, 0, 1) * self.scale_factor

    def decode_latents(self, vae_params, z):
        """Frame-chunked VAE decode under lax.scan: (B,T,h,w,4) -> (B,T,H,W,3)."""
        b, t = z.shape[:2]
        c = self._frame_chunk(t)

        def body(carry, z_chunk):
            x = self.vae.apply(vae_params, z_chunk / self.scale_factor, method=AutoencoderKL.decode)
            return carry, x

        z_t = jnp.swapaxes(z, 0, 1).reshape((t // c, c * b) + z.shape[2:])
        _, x = jax.lax.scan(body, None, z_t)
        x = x.reshape((t, b) + x.shape[2:])
        return jnp.swapaxes(x, 0, 1)

    def image_context(self, params: LVDMParams, image):
        """Condition image (B,H,W,3 in [-1,1]) -> resampled tokens (B,256,1024)."""
        tokens = self.clip_vision.apply(params.clip_vision, clip_preprocess(image))
        return self.resampler.apply(params.resampler, tokens)

    def text_context(self, params: LVDMParams, token_ids):
        return self.clip_text.apply(params.clip_text, token_ids)

    # ------------------------------------------------------------------
    # generation
    # ------------------------------------------------------------------

    def build_contexts(self, params: LVDMParams, guidance_frames, cond_idx, token_ids, uncond_token_ids, guidance: GuidanceConfig):
        """Stack per-branch cross-attention contexts along a leading K axis.

        Branch order matches sampling/ddim.py: [uncond, (uncond_img), cond]
        (reference: diffusion_utils.py:132-167)."""
        cond_frame = guidance_frames[:, cond_idx]
        img_ctx = self.image_context(params, cond_frame)
        zero_img_ctx = self.image_context(params, jnp.zeros_like(cond_frame))
        text_ctx = self.text_context(params, token_ids)
        uncond_text_ctx = self.text_context(params, uncond_token_ids)
        cond = jnp.concatenate([text_ctx, img_ctx], axis=1)
        uncond = jnp.concatenate([uncond_text_ctx, zero_img_ctx], axis=1)
        if guidance.num_branches == 1:
            return cond[None]
        if guidance.num_branches == 2:
            return jnp.stack([uncond, cond])
        uncond_img = jnp.concatenate([uncond_text_ctx, img_ctx], axis=1)
        return jnp.stack([uncond, uncond_img, cond])

    def generate(
        self,
        params: LVDMParams,
        guidance_frames: jnp.ndarray,  # (B, T, H, W, 3) in [-1, 1]
        token_ids: jnp.ndarray,  # (B, 77)
        uncond_token_ids: jnp.ndarray,  # (B, 77)
        rng: jax.Array,
        steps: int = 50,
        eta: float = 1.0,
        guidance: GuidanceConfig = GuidanceConfig(),
        fs: Optional[int] = None,
        timestep_spacing: str = "uniform_trailing",
        cond_idx: int = 0,
    ) -> jnp.ndarray:
        """Full pipeline; call through `jitted_generate` for the compiled path."""
        cfg = self.cfg
        b, t = guidance_frames.shape[:2]
        k = guidance.num_branches
        dd = DDIMSchedule.create(self.schedule, steps, eta=eta, timestep_spacing=timestep_spacing)

        rng_z, rng_noise, rng_sample = jax.random.split(rng, 3)
        z_cond = self.encode_frames(params.vae, guidance_frames, rng_z)  # (B,T,h,w,4)
        contexts = self.build_contexts(
            params, guidance_frames, cond_idx, token_ids, uncond_token_ids, guidance
        )  # (K, B, L, C)
        fs_val = float(fs if fs is not None else cfg.unet.default_fs)
        denoise_fn, _, _ = self._denoise_fn(params, z_cond, contexts, fs_val, guidance)

        h, w = z_cond.shape[2:4]
        x_T = jax.random.normal(rng_noise, (b, t, h, w, cfg.vae.z_channels), jnp.float32)
        z0 = ddim_sample(denoise_fn, x_T, dd, rng_sample, guidance)
        video = self.decode_latents(params.vae, z0)
        return jnp.clip(video, -1.0, 1.0)

    @functools.cached_property
    def jitted_generate(self):
        return jax.jit(
            self.generate,
            static_argnames=("steps", "eta", "guidance", "fs", "timestep_spacing", "cond_idx"),
        )

    # ------------------------------------------------------------------
    # staged generation: several short device calls instead of one long one
    # ------------------------------------------------------------------

    def _denoise_fn(self, params, z_cond, contexts, fs_val, guidance: GuidanceConfig,
                    cache_kinds=("spatial", "cross", "temporal"),
                    cache_sites: tuple = (), cache_dtype: str = "bf16",
                    branch_mesh=None, tp_mesh=None):
        """Returns (denoise, denoise_full, denoise_reuse):
          denoise(x_k, t) -> v                          (baseline)
          denoise_full(x_k, t) -> (v, attention cache)   (PAB collect)
          denoise_reuse(x_k, t, cache) -> v              (PAB broadcast)

        cache_sites: optional tuple of site-name prefixes (e.g. ("down_0",
        "up_0", "init_attn")) — only matching attention sites are cached/reused;
        the rest are recomputed every step. This is the flagship memory
        knob: the full all-sites cache is ~9 GB at 576x1024x25 (OOM on a
        16 GB chip), the ds1-only subset is ~3 GB and holds most of the
        attention FLOPs. Sites absent from the cache dict are recomputed
        (AttnCacheCtx.site falls through on a read miss), and XLA DCEs
        their collection outputs, so filtering the dict is sufficient.

        branch_mesh: optional ("dp", "sp") mesh — CFG-branch data
        parallelism for a SINGLE sample (the roofline's two-chip <=60 s
        path; the reference evaluates the branches sequentially on one GPU,
        ddim.py:222-228). The (K*B)-leading UNet batch gets a
        with_sharding_constraint over ("dp", "sp"), so the K tiled guidance
        branches spread across dp chips and XLA inserts the collective only
        at the CFG combine. Disables the shared-prefix dedup (each chip
        computes its own branch's prefix — redundant FLOPs but fully
        parallel, and the dedup's small-batch slice would serialize onto
        one chip).
        """
        k = guidance.num_branches
        b = z_cond.shape[0]
        store_dtype = {"bf16": None, "f8": jnp.float8_e4m3fn}[cache_dtype]
        ctx_flat = contexts.reshape((k * b,) + contexts.shape[2:])
        z_cond_k = jnp.tile(z_cond, (k, 1, 1, 1, 1))
        fs_batch = jnp.full((k * b,), fs_val, jnp.float32)
        if guidance.sequential and k > 1:
            def make(apply_kwargs, with_cache_arg=False):
                def denoise(x_k, t_batch, cache=None):
                    shp = x_k.shape[1:]
                    xs = x_k.reshape((k, b) + shp)
                    ts = t_batch.reshape(k, b)

                    def one(args):
                        if with_cache_arg:
                            x, t_b, ctx, fs_b, cache_b = args
                            kw = dict(apply_kwargs, attn_cache=cache_b)
                        else:
                            x, t_b, ctx, fs_b = args
                            kw = apply_kwargs
                        x_in = jnp.concatenate([x, z_cond], axis=-1)
                        return self.unet.apply(params.unet, x_in, t_b, ctx, fs=fs_b, **kw)

                    ops = (xs, ts, contexts, fs_batch.reshape(k, b))
                    if with_cache_arg:
                        ops = ops + (cache,)
                    out = jax.lax.map(one, ops)
                    if apply_kwargs.get("collect_cache"):
                        v, cache_out = out
                        return v.reshape((k * b,) + v.shape[2:]), cache_out
                    return out.reshape((k * b,) + out.shape[2:])

                return denoise

            denoise = make({})
            denoise_full = make({"collect_cache": True, "cache_kinds": cache_kinds,
                                 "cache_dtype": store_dtype})
            denoise_reuse = make({"cache_kinds": cache_kinds}, with_cache_arg=True)
        else:
            if branch_mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                _vid_s = NamedSharding(branch_mesh, P("dp", "sp"))
                _tok_s = NamedSharding(branch_mesh, P("dp"))

                def con_vid(a):
                    return jax.lax.with_sharding_constraint(a, _vid_s)

                def con_tok(a):
                    return jax.lax.with_sharding_constraint(a, _tok_s)
            else:
                con_vid = con_tok = lambda a: a
            prefix_k = 1 if branch_mesh is not None else k

            def denoise(x_k, t_batch):
                x_in = con_vid(jnp.concatenate([x_k, z_cond_k], axis=-1))
                # shared_prefix=k: the sampler tiles one latent over the K CFG
                # branches, so the UNet computes the context-free prefix once
                return self.unet.apply(
                    params.unet, x_in, t_batch, con_tok(ctx_flat), fs=fs_batch,
                    shared_prefix=prefix_k,
                )

            def denoise_full(x_k, t_batch):
                x_in = con_vid(jnp.concatenate([x_k, z_cond_k], axis=-1))
                return self.unet.apply(
                    params.unet, x_in, t_batch, con_tok(ctx_flat), fs=fs_batch,
                    collect_cache=True, cache_kinds=cache_kinds,
                    cache_dtype=store_dtype,
                )

            def denoise_reuse(x_k, t_batch, cache):
                x_in = con_vid(jnp.concatenate([x_k, z_cond_k], axis=-1))
                return self.unet.apply(
                    params.unet, x_in, t_batch, con_tok(ctx_flat), fs=fs_batch,
                    attn_cache=cache, cache_kinds=cache_kinds,
                )

        if cache_sites:
            prefixes = tuple(cache_sites)
            inner_full = denoise_full

            def denoise_full(x_k, t_batch):
                v, cache = inner_full(x_k, t_batch)
                return v, {n: a for n, a in cache.items() if n.startswith(prefixes)}

        if tp_mesh is not None:
            # tensor parallelism over UNet heads/channels (parallel/tp.py):
            # mark the mesh tp-active while the UNet traces so the in-model
            # sharding constraints engage; a tp=1 mesh deactivates inside
            from viewcrafter_tpu.parallel import tp as _tp

            def _with_tp(fn):
                def wrapped(*a, **kw):
                    with _tp.activate(tp_mesh):
                        return fn(*a, **kw)
                return wrapped

            denoise = _with_tp(denoise)
            denoise_full = _with_tp(denoise_full)
            denoise_reuse = _with_tp(denoise_reuse)

        return denoise, denoise_full, denoise_reuse

    def generate_staged(
        self,
        params: LVDMParams,
        guidance_frames: jnp.ndarray,
        token_ids: jnp.ndarray,
        uncond_token_ids: jnp.ndarray,
        rng: jax.Array,
        steps: int = 50,
        eta: float = 1.0,
        guidance: GuidanceConfig = GuidanceConfig(),
        fs: Optional[int] = None,
        timestep_spacing: str = "uniform_trailing",
        cond_idx: int = 0,
        chunk: int = 10,
        attn_reuse_interval: int = 1,
        attn_reuse_kinds: tuple = ("spatial", "cross", "temporal"),
        attn_reuse_sites: tuple = (),
        attn_reuse_dtype: str = "bf16",
        mesh=None,
    ) -> jnp.ndarray:
        """Same math as `generate`, split into prepare / N sampling windows /
        decode device programs. x stays on device between calls; per-call wall
        time stays bounded (single executions beyond ~1 min can trip serving
        watchdogs). Identical noise schedule and rng stream as the monolithic
        path.

        attn_reuse_interval > 1 enables Pyramid-Attention-Broadcast-style
        reuse: every window of that many steps computes attention once and
        broadcasts the outputs to the remaining steps (arXiv:2408.12588;
        interval 1 == exact sampling).

        mesh: optional ("dp", "sp") jax.sharding.Mesh — shards the sample
        batch over dp and video frames over sp (params replicated). The
        reference has no inference parallelism (SURVEY §2.6); this is the
        TPU-native scale-out path: independent DDIM chains per dp slice,
        temporal-stage collectives over sp ride ICI. Requires B % dp == 0
        and T % sp == 0."""
        b, t = guidance_frames.shape[:2]
        if mesh is not None:
            dp, sp = mesh.shape["dp"], mesh.shape["sp"]
            k = guidance.num_branches
            if t % sp or (b % dp and (k * b) % dp):
                raise ValueError(
                    f"sharded generate needs frames {t} % sp {sp} == 0 and "
                    f"either batch {b} % dp {dp} == 0 (sample-dp) or "
                    f"branches*batch {k * b} % dp == 0 (CFG-dp)"
                )
        if attn_reuse_interval > 1:
            # several PAB cells per device call (one temp arena — see
            # ddim_sample_window_pab_cells), capped near 24 steps/call to
            # stay under the serving watchdog's ~1 min execution limit
            chunk = attn_reuse_interval * max(1, 24 // attn_reuse_interval)
        progs = self.staged_programs(
            tuple(guidance_frames.shape), steps=steps, eta=eta, guidance=guidance,
            fs=fs, timestep_spacing=timestep_spacing, cond_idx=cond_idx,
            attn_reuse_interval=attn_reuse_interval,
            attn_reuse_kinds=attn_reuse_kinds, attn_reuse_sites=attn_reuse_sites,
            attn_reuse_dtype=attn_reuse_dtype, mesh=mesh,
        )

        prepare_fn, window_fn, decode_fn = progs
        x, z_cond, contexts, rng_sample = prepare_fn(
            params, guidance_frames, token_ids, uncond_token_ids, rng
        )
        s0 = 0
        while s0 < steps:
            num = min(chunk, steps - s0)
            x = window_fn(params, x, z_cond, contexts, rng_sample, jnp.asarray(s0), num)
            # block per window so one device call never exceeds the window
            x = jax.block_until_ready(x)
            s0 += num
        return decode_fn(params, x)

    def staged_programs(
        self,
        frames_shape: tuple,
        steps: int = 50,
        eta: float = 1.0,
        guidance: GuidanceConfig = GuidanceConfig(),
        fs: Optional[int] = None,
        timestep_spacing: str = "uniform_trailing",
        cond_idx: int = 0,
        attn_reuse_interval: int = 1,
        attn_reuse_kinds: tuple = ("spatial", "cross", "temporal"),
        attn_reuse_sites: tuple = (),
        attn_reuse_dtype: str = "bf16",
        mesh=None,
    ):
        """Build (or fetch cached) the three jitted device programs behind
        `generate_staged`: prepare / sampling window / decode. Exposed so
        callers that need per-stage control (bench.py stage heartbeats and
        timing; the CFG-dp sharded path) drive the stages directly.

        prepare(params, frames, ids, uids, rng) -> (x_T, z_cond, contexts, rng)
        window(params, x, z_cond, contexts, rng, start, num) -> x  (num static)
        decode(params, x) -> video in [-1, 1]
        """
        from viewcrafter_tpu.sampling.ddim import (
            ddim_sample_window,
            ddim_sample_window_pab,
            ddim_sample_window_pab_cells,
        )

        cfg = self.cfg
        b, t = frames_shape[:2]
        dd = DDIMSchedule.create(self.schedule, steps, eta=eta, timestep_spacing=timestep_spacing)
        fs_val = float(fs if fs is not None else cfg.unet.default_fs)
        key = ("staged", steps, eta, guidance, fs_val, timestep_spacing, cond_idx,
               attn_reuse_interval, attn_reuse_kinds, attn_reuse_sites,
               attn_reuse_dtype, tuple(frames_shape), mesh)
        if not hasattr(self, "_staged_cache"):
            self._staged_cache = {}
        progs = self._staged_cache.get(key)
        if progs is None:
            # CFG-branch dp: a batch that cannot shard over dp (e.g. ONE
            # sample on a 2-chip mesh) spreads the K tiled guidance branches
            # over dp instead (see _denoise_fn branch_mesh)
            cfg_dp = mesh is not None and b % mesh.shape["dp"] != 0
            branch_mesh = mesh if cfg_dp else None

            def prepare(params, frames, ids, uids, rng):
                rng_z, rng_noise, rng_sample = jax.random.split(rng, 3)
                z_cond = self.encode_frames(params.vae, frames, rng_z)
                contexts = self.build_contexts(params, frames, cond_idx, ids, uids, guidance)
                h, w = z_cond.shape[2:4]
                x_T = jax.random.normal(rng_noise, (b, t, h, w, cfg.vae.z_channels), jnp.float32)
                return x_T, z_cond, contexts, rng_sample

            def window(params, x, z_cond, contexts, rng_sample, start, num):
                denoise_fn, d_full, d_reuse = self._denoise_fn(
                    params, z_cond, contexts, fs_val, guidance,
                    cache_kinds=attn_reuse_kinds, cache_sites=attn_reuse_sites,
                    cache_dtype=attn_reuse_dtype, branch_mesh=branch_mesh,
                    tp_mesh=mesh,
                )
                if attn_reuse_interval > 1:
                    # num may span several PAB cells: run them inside ONE
                    # executable (single temp arena + cache allocation —
                    # back-to-back per-cell device calls OOM the flagship
                    # through the async tunnel; see
                    # ddim_sample_window_pab_cells) with a per-call tail for
                    # the remainder.
                    k_int = attn_reuse_interval
                    cells, rem = divmod(num, k_int)
                    out = x
                    if cells:
                        out = ddim_sample_window_pab_cells(
                            d_full, d_reuse, out, dd, rng_sample, start,
                            cells, k_int, guidance
                        )
                    if rem:
                        out = ddim_sample_window_pab(
                            d_full, d_reuse, out, dd, rng_sample,
                            start + cells * k_int, rem, guidance
                        )
                    return out
                return ddim_sample_window(denoise_fn, x, dd, rng_sample, start, num, guidance)

            def decode(params, x):
                return jnp.clip(self.decode_latents(params.vae, x), -1.0, 1.0)

            if mesh is None:
                progs = (
                    jax.jit(prepare),
                    jax.jit(window, static_argnames=("num",)),
                    jax.jit(decode),
                )
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P

                repl = NamedSharding(mesh, P())
                if cfg_dp:
                    # single-sample CFG-dp: batch axes replicate over dp,
                    # frames shard over sp; the context's leading K axis
                    # (guidance branches) shards over dp
                    vid = NamedSharding(mesh, P(None, "sp"))
                    ctxs = NamedSharding(mesh, P("dp"))  # (K, B, L, C)
                    ids_s = repl
                else:
                    vid = NamedSharding(mesh, P("dp", "sp"))  # (B, T, ...) arrays
                    ctxs = NamedSharding(mesh, P(None, "dp"))  # (K, B, L, C)
                    ids_s = NamedSharding(mesh, P("dp"))  # (B, 77)
                progs = (
                    jax.jit(
                        prepare,
                        in_shardings=(repl, vid, ids_s, ids_s, repl),
                        out_shardings=(vid, vid, ctxs, repl),
                    ),
                    jax.jit(
                        window,
                        static_argnames=("num",),
                        in_shardings=(repl, vid, vid, ctxs, repl, repl),
                        out_shardings=vid,
                    ),
                    jax.jit(decode, in_shardings=(repl, vid), out_shardings=vid),
                )
            self._staged_cache[key] = progs
        return progs

    # host-side convenience -------------------------------------------------

    def prompt_ids(self, prompts, batch_size: int) -> jnp.ndarray:
        if isinstance(prompts, str):
            prompts = [prompts] * batch_size
        return jnp.asarray(tokenize(prompts))
