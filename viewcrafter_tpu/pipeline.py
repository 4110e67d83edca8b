"""ViewCrafter pipeline orchestrator: images -> point cloud -> rendered
trajectory -> diffused novel-view video.

Mirrors the reference `ViewCrafter` class (viewcrafter.py:30-462) mode-for-mode:
  - single_view_target / single_view_txt (viewcrafter.py:108-169)
  - sparse_view / sparse_view_interp (:171-279)
  - single_view_eval (:281-309)
  - iterative: single_view_ref_iterative (:311), single_view_1drc_iterative
    (:334), single_view_nbv (:357)
plus artifact outputs with the same names (render*.mp4, diffusion*.mp4,
pcd*.ply, viz_traj.mp4).

TPU-first division of labor:
  - DUSt3R pair inference is BATCHED over the pair axis (fixed chunk size,
    one jitted program) instead of the reference's per-pair Python loop
    (dust3r/inference.py:80);
  - alignment runs as one jitted 300-step scan (align/global_align.py);
  - render -> VAE encode -> DDIM -> VAE decode is one jitted program on
    device (models/lvdm.py); only file I/O and trajectory synthesis are host
    code.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from viewcrafter_tpu.align.global_align import AlignedScene, GlobalAligner, SceneGraph
from viewcrafter_tpu.config import (
    AlignConfig,
    Dust3rConfig,
    ModelConfig,
    get_dust3r_config,
    get_model_config,
)
from viewcrafter_tpu.geometry import trajectory as traj
from viewcrafter_tpu.geometry.transforms import (
    inv_se3,
    make_intrinsics,
    world_point_to_kth,
    world_point_to_obj,
)
from viewcrafter_tpu.models.dust3r import Dust3rModel
from viewcrafter_tpu.models.lvdm import LVDMParams, VideoDiffusionEngine
from viewcrafter_tpu.ops.rasterize import render_trajectory
from viewcrafter_tpu.ops.resize import resize_bilinear
from viewcrafter_tpu.sampling.ddim import GuidanceConfig
from viewcrafter_tpu.utils import io as vio


@dataclasses.dataclass
class InferenceOptions:
    """Runtime flags, mirroring configs/infer_config.py:4-59."""

    image_dir: str = "test/images/fruit.png"
    out_dir: str = "./output"
    exp_name: Optional[str] = None
    mode: str = "single_view_txt"
    traj_txt: Optional[str] = None
    elevation: float = 5.0
    center_scale: float = 1.0
    d_theta: Sequence[float] = (10.0,)
    d_phi: Sequence[float] = (30.0,)
    d_r: Sequence[float] = (-0.2,)
    d_x: Sequence[float] = (0.0,)
    d_y: Sequence[float] = (0.0,)
    mask_image: bool = False
    mask_pc: bool = True
    reduce_pc: bool = False
    bg_trd: float = 0.0
    dpt_trd: float = 1.0
    # diffusion
    model: str = "viewcrafter_25"
    ckpt_path: Optional[str] = None
    ddim_steps: int = 50
    ddim_eta: float = 1.0
    height: int = 576
    width: int = 1024
    frame_stride: int = 10
    unconditional_guidance_scale: float = 7.5
    seed: int = 123
    video_length: int = 25
    prompt: str = "Rotating view of a scene"
    text_input: bool = True  # False -> empty prompt (diffusion_utils.py:124)
    multiple_cond_cfg: bool = False
    cfg_img: Optional[float] = None
    timestep_spacing: str = "uniform_trailing"
    guidance_rescale: float = 0.7
    n_samples: int = 1
    # memory / perf knobs (TPU-native; no reference equivalent)
    sequential_cfg: bool = False  # evaluate CFG branches one at a time (~halves activation HBM)
    attn_reuse_interval: int = 1  # >1: PAB attention reuse (arXiv:2408.12588); 1 = exact
    attn_reuse_sites: tuple = ()  # site-prefix filter, e.g. ("down_0","up_0","init_attn"): cache only those (memory knob)
    attn_reuse_kinds: tuple = ("spatial", "cross", "temporal")  # which families to cache; +"ff" for coarser reuse
    attn_reuse_dtype: str = "bf16"  # cache storage: "bf16" | "f8" (halves cache HBM)
    mesh_devices: int = 0  # >1: shard n_samples over a dp mesh (multi-chip)
    mesh_tp: int = 1  # >1: tensor-parallel UNet heads/channels (parallel/tp.py)
    # dust3r
    model_path: Optional[str] = None
    batch_size: int = 8  # pair-chunk size for batched dust3r inference
    niter: int = 300
    lr: float = 0.01
    schedule: str = "linear"
    min_conf_thr: float = 3.0
    dust3r_size: int = 512
    dust3r_model: str = "dust3r_512"  # architecture preset (config.DUST3R_REGISTRY)
    weights_dtype: str = "bf16"  # inference weight storage; "fp32" to disable

    @property
    def save_dir(self) -> str:
        name = self.exp_name
        if name is None:
            name = os.path.splitext(os.path.basename(self.image_dir.rstrip("/")))[0]
        return os.path.join(self.out_dir, name)


class ViewCrafterPipeline:
    """Owns both model stacks and dispatches NVS modes."""

    def __init__(self, opts: InferenceOptions, init_models: bool = True,
                 rng: Optional[jax.Array] = None,
                 model_cfg: Optional[ModelConfig] = None,
                 dust3r_cfg: Optional[Dust3rConfig] = None):
        self.opts = opts
        self.model_cfg: ModelConfig = model_cfg or get_model_config(opts.model)
        self.dust3r_cfg = dust3r_cfg or get_dust3r_config(opts.dust3r_model)
        self.align_cfg = AlignConfig(
            niter=opts.niter, lr=opts.lr, schedule=opts.schedule, min_conf_thr=opts.min_conf_thr
        )
        self.rng = rng if rng is not None else jax.random.PRNGKey(opts.seed)
        self.engine = VideoDiffusionEngine(self.model_cfg)
        self.dust3r = Dust3rModel(cfg=self.dust3r_cfg)
        self.dust3r_params = None
        self.lvdm_params: Optional[LVDMParams] = None
        self.loaded_real_ckpt = False  # True -> tokenizer fallback is an error
        self._dust3r_apply = jax.jit(self.dust3r.apply, static_argnames=("is_portrait1", "is_portrait2"))
        # encode-once + decode-per-pair split (reference model.py:117-125
        # symmetrized dedup): unique images go through the ViT-L encoder a
        # single time; pairs gather embeddings on device
        self._dust3r_encode = jax.jit(
            functools.partial(self.dust3r.apply, method=Dust3rModel.encode),
            static_argnames=("is_portrait",),
        )
        self._dust3r_decode = jax.jit(
            functools.partial(self.dust3r.apply, method=Dust3rModel.decode_pairs),
            static_argnames=("h", "w", "is_portrait1", "is_portrait2"),
        )
        if init_models:
            self.setup_models()
        # state per run
        self.images: List[vio.LoadedImage] = []
        self.scene: Optional[AlignedScene] = None
        self.elevation = opts.elevation

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------

    def setup_models(self):
        """Load released checkpoints when paths are given, else random init
        (dev mode, documented: outputs are untrained noise)."""
        from viewcrafter_tpu.utils import checkpoint as ck

        rng_d, rng_l = jax.random.split(self.rng)
        to_bf16 = self.opts.weights_dtype == "bf16"

        def host_cast(tree):
            if not to_bf16:
                return tree
            import ml_dtypes

            return jax.tree.map(
                lambda a: a.astype(ml_dtypes.bfloat16) if getattr(a, "dtype", None) == np.float32 else a,
                tree,
            )

        if self.opts.model_path and os.path.exists(self.opts.model_path):
            raw = ck.load_torch_file(self.opts.model_path)
            translated = ck.translate_dust3r_checkpoint(raw, self.dust3r_cfg)
            ref = jax.eval_shape(
                self.dust3r.init, rng_d, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))
            )
            errs = ck.verify_tree_shapes(translated["params"], ref["params"])
            if errs:
                raise ValueError("dust3r checkpoint mismatch:\n" + "\n".join(errs[:20]))
            self.dust3r_params = jax.tree.map(jnp.asarray, host_cast(translated))
        else:
            from viewcrafter_tpu.models.lvdm import cast_params_bf16

            init_d = self.dust3r.init
            if to_bf16:
                init_d = lambda *a: cast_params_bf16(self.dust3r.init(*a))
            self.dust3r_params = jax.jit(init_d)(
                rng_d, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))
            )

        if self.opts.ckpt_path and os.path.exists(self.opts.ckpt_path):
            self.loaded_real_ckpt = True
            raw = ck.load_torch_file(self.opts.ckpt_path)
            trees = ck.translate_lvdm_checkpoint(raw, self.model_cfg)
            trees = host_cast(trees)
            self.lvdm_params = LVDMParams(
                unet=jax.tree.map(jnp.asarray, trees["unet"]),
                vae=jax.tree.map(jnp.asarray, trees["vae"]),
                clip_text=jax.tree.map(jnp.asarray, trees["clip_text"]),
                clip_vision=jax.tree.map(jnp.asarray, trees["clip_vision"]),
                resampler=jax.tree.map(jnp.asarray, trees["resampler"]),
            )
        else:
            # fused init+cast: a separate cast would briefly hold fp32 AND
            # bf16 weight copies (~15 GB) on a 16 GB chip
            if self.opts.weights_dtype == "bf16":
                from viewcrafter_tpu.models.lvdm import cast_params_bf16

                self.lvdm_params = jax.jit(lambda r: cast_params_bf16(self.engine.init_params(r)))(rng_l)
            else:
                self.lvdm_params = jax.jit(self.engine.init_params)(rng_l)

    # ------------------------------------------------------------------
    # dust3r + alignment
    # ------------------------------------------------------------------

    def run_dust3r(self, images: List[vio.LoadedImage], clean_pc: bool = False) -> AlignedScene:
        """Complete symmetric pair graph -> batched inference -> global
        alignment (viewcrafter.py:47-59)."""
        from viewcrafter_tpu.align.pairs import make_pairs

        n = len(images)
        pairs = make_pairs(n, scene_graph="complete", symmetrize=True)
        imgs = np.stack([im.img for im in images])  # (N, H, W, 3) [-1,1]

        # ManyAR portrait path (dust3r/patch_embed.py:32-70): the network runs
        # on landscape-stored tensors; portrait inputs ride transposed with a
        # STATIC orientation flag (one jitted program per orientation — the
        # pipeline's views all share one crop so the flag is batch-uniform),
        # and the predicted maps transpose back to true orientation below.
        portrait = imgs.shape[1] > imgs.shape[2]
        if portrait:
            imgs = imgs.transpose(0, 2, 1, 3)

        # encode each UNIQUE image once (reference symmetrized dedup,
        # model.py:117-125): the complete symmetric graph has n*(n-1) directed
        # pairs but only n distinct images — running the ViT-L encoder per
        # pair direction costs 2(n-1)x the encoder FLOPs of encoding once.
        # Encode in padded chunks of 8 so iterative modes (growing n) reuse
        # compiled programs; embeddings stay on device for the pair gathers.
        h_img, w_img = imgs.shape[1:3]
        enc_chunk = min(8, n)
        tok_parts, pos_parts = [], []
        for s in range(0, n, enc_chunk):
            idx = list(range(s, min(s + enc_chunk, n)))
            idx = idx + [idx[-1]] * (enc_chunk - len(idx))
            tok, pos = self._dust3r_encode(
                self.dust3r_params, jnp.asarray(imgs[idx]), is_portrait=portrait
            )
            tok_parts.append(tok)
            pos_parts.append(pos)
        tokens = jnp.concatenate(tok_parts)[:n]
        pos = jnp.concatenate(pos_parts)[:n]

        chunk = max(1, self.opts.batch_size)
        pred_i, pred_j, conf_i, conf_j = [], [], [], []
        for s in range(0, len(pairs), chunk):
            batch = pairs[s : s + chunk]
            pad = chunk - len(batch)
            ii = [i for i, _ in batch] + [batch[-1][0]] * pad
            jj = [j for _, j in batch] + [batch[-1][1]] * pad
            out = self._dust3r_decode(
                self.dust3r_params, tokens, pos,
                jnp.asarray(ii, jnp.int32), jnp.asarray(jj, jnp.int32),
                h=h_img, w=w_img, is_portrait1=portrait, is_portrait2=portrait,
            )
            take = len(batch)
            pred_i.append(np.asarray(out["pts3d1"])[:take])
            pred_j.append(np.asarray(out["pts3d2_in_view1"])[:take])
            conf_i.append(np.asarray(out["conf1"])[:take])
            conf_j.append(np.asarray(out["conf2"])[:take])

        if portrait:  # stored-landscape maps -> true portrait orientation
            imgs = imgs.transpose(0, 2, 1, 3)
            pred_i = [p.transpose(0, 2, 1, 3) for p in pred_i]
            pred_j = [p.transpose(0, 2, 1, 3) for p in pred_j]
            conf_i = [c.transpose(0, 2, 1) for c in conf_i]
            conf_j = [c.transpose(0, 2, 1) for c in conf_j]

        graph = SceneGraph(
            edges=np.asarray(pairs),
            pred_i=np.concatenate(pred_i),
            pred_j=np.concatenate(pred_j),
            conf_i=np.concatenate(conf_i),
            conf_j=np.concatenate(conf_j),
            imgs=(imgs + 1.0) / 2.0,
        )
        aligner = GlobalAligner(graph, self.align_cfg)
        params = aligner.init_mst()
        params, _ = aligner.optimize(params)
        scene = aligner.get_scene(params, clip_thred=self.opts.dpt_trd)
        if clean_pc:
            scene = aligner.clean_pointcloud(scene)
        self.scene = scene
        return scene

    # ------------------------------------------------------------------
    # rendering
    # ------------------------------------------------------------------

    def run_render(
        self,
        pts3d: np.ndarray,  # (M, 3) selected world points
        colors: np.ndarray,  # (M, 3) [0,1]
        c2ws: np.ndarray,  # (V, 4, 4) trajectory
        focals: np.ndarray,
        pps: np.ndarray,
        hw: Tuple[int, int],
        nbv: bool = False,
    ):
        """Rasterize the trajectory (viewcrafter.py:61-90). Returns frames in
        [0,1] at dust3r resolution, plus coverage masks when nbv."""
        h, w = hw
        K = make_intrinsics(np.broadcast_to(np.asarray(focals).reshape(-1), (len(c2ws),)),
                            np.broadcast_to(np.asarray(pps).reshape(-1, 2), (len(c2ws), 2)))
        w2cs = np.asarray(inv_se3(jnp.asarray(c2ws)))
        pts_dev = jnp.asarray(pts3d, jnp.float32)
        cols_dev = jnp.asarray(colors, jnp.float32)

        def render_all(col):
            # views in short host-side chunks: one big render call can exceed
            # the serving environment's per-execution wall-time limit
            out = []
            chunk = 4
            for s in range(0, len(c2ws), chunk):
                part = render_trajectory(
                    pts_dev, col, jnp.asarray(w2cs[s : s + chunk]),
                    jnp.asarray(K[s : s + chunk]), h, w,
                )
                out.append(np.asarray(part))
            return np.concatenate(out)

        frames = render_all(cols_dev)
        masks = None
        if nbv:
            masks = render_all(jnp.ones((len(pts3d), 1), jnp.float32))
        return frames, masks

    def _selected_points(self, scene: AlignedScene, masks: Optional[np.ndarray], view_sel=None):
        pts = scene.pts3d
        cols = scene.imgs
        n = len(pts)
        idx = range(n) if view_sel is None else view_sel
        sel_p, sel_c = [], []
        for i in idx:
            if masks is None:
                sel_p.append(pts[i].reshape(-1, 3))
                sel_c.append(cols[i].reshape(-1, 3))
            else:
                m = masks[i].reshape(-1)
                sel_p.append(pts[i].reshape(-1, 3)[m])
                sel_c.append(cols[i].reshape(-1, 3)[m])
        return np.concatenate(sel_p), np.concatenate(sel_c)

    def _export_pc(self, path: str, sel_p: np.ndarray, sel_c: np.ndarray,
                   scene: Optional[AlignedScene] = None):
        """PLY export honoring --mask_pc / --reduce_pc (pvd_utils.py:476-504):
        mask_pc=False exports the FULL unmasked cloud even in masked modes
        (the reference's get_pc skips the mask), reduce_pc subsamples every
        3rd point (get_pc ::3). --mask_image is parsed for CLI parity but is
        dead upstream too (infer_config.py:23 defines it; nothing reads it)."""
        if not self.opts.mask_pc and scene is not None:
            sel_p, sel_c = self._selected_points(scene, None)
        if self.opts.reduce_pc:
            sel_p, sel_c = sel_p.reshape(-1, 3)[::3], sel_c.reshape(-1, 3)[::3]
        vio.save_pointcloud_ply(sel_p, sel_c, path)

    def _conf_bg_masks(self, scene: AlignedScene) -> np.ndarray:
        """Conf + background-depth masks for multi-view point clouds
        (viewcrafter.py:185-190; replicates the reference comparing raw conf
        against the log-transformed threshold)."""
        thr = float(np.log(self.opts.min_conf_thr))
        conf_mask = scene.im_conf > thr
        depths = scene.depths
        bg = []
        for d in depths:
            inner = d[40:-40, :] if d.shape[0] > 80 else d
            bg.append(d > self.opts.bg_trd * (inner.max() + inner.min()))
        return conf_mask | np.stack(bg)

    # ------------------------------------------------------------------
    # diffusion
    # ------------------------------------------------------------------

    def run_diffusion(self, frames01: np.ndarray, cond_idx: int = 0) -> np.ndarray:
        """Guidance frames [0,1] (T, H, W, 3) -> generated video [-1,1]
        (viewcrafter.py:93-106 + image_guided_synthesis). With n_samples > 1,
        extra variants are saved as diffusion_sample{i}.mp4 and sample 0 is
        returned (the reference also returns variant 0,
        diffusion_utils.py:171-201)."""
        opts = self.opts
        videos = jnp.asarray(frames01 * 2.0 - 1.0)[None]  # (1, T, H, W, 3)
        prompt = opts.prompt if getattr(opts, "text_input", True) else ""
        # real checkpoints require real CLIP BPE ids — hash-fallback ids would
        # silently corrupt the text conditioning (utils/tokenizer.py)
        allow_fb = not getattr(self, "loaded_real_ckpt", False)
        from viewcrafter_tpu.utils.tokenizer import tokenize

        ids = jnp.asarray(tokenize([prompt], allow_fallback=allow_fb))
        uids = jnp.asarray(tokenize([""], allow_fallback=allow_fb))
        guidance = GuidanceConfig(
            scale=opts.unconditional_guidance_scale,
            rescale=opts.guidance_rescale,
            cfg_img=opts.cfg_img if opts.multiple_cond_cfg else None,
            sequential=opts.sequential_cfg,
        )
        gen_kwargs = dict(
            steps=opts.ddim_steps, eta=opts.ddim_eta, guidance=guidance,
            fs=opts.frame_stride, timestep_spacing=opts.timestep_spacing,
            cond_idx=cond_idx, chunk=min(10, opts.ddim_steps),
            attn_reuse_interval=opts.attn_reuse_interval,
            attn_reuse_sites=tuple(opts.attn_reuse_sites),
            attn_reuse_kinds=tuple(opts.attn_reuse_kinds),
            attn_reuse_dtype=opts.attn_reuse_dtype,
        )
        n = max(1, opts.n_samples)
        mesh = self._sample_mesh(n, guidance.num_branches)
        if mesh is not None:
            # one sharded batch: independent DDIM chains ride the dp axis
            self.rng, sub = jax.random.split(self.rng)
            video = self.engine.generate_staged(
                self.lvdm_params,
                jnp.tile(videos, (n, 1, 1, 1, 1)),
                jnp.tile(ids, (n, 1)), jnp.tile(uids, (n, 1)),
                sub, mesh=mesh, **gen_kwargs,
            )
            results = [np.asarray(v) for v in video]
        else:
            results = []
            for si in range(n):
                self.rng, sub = jax.random.split(self.rng)
                # staged sampling: short device calls (bit-identical to monolithic)
                video = self.engine.generate_staged(
                    self.lvdm_params, videos, ids, uids, sub, **gen_kwargs,
                )
                results.append(np.asarray(video[0]))
        for si in range(1, n):
            vio.save_video(
                (results[si] + 1.0) / 2.0,
                os.path.join(opts.save_dir, f"diffusion_sample{si}.mp4"),
            )
        return results[0]  # (T, H, W, 3) [-1,1]

    def _sample_mesh(self, n_samples: int, num_branches: int = 2):
        """A dp-only mesh when the host has the devices for it
        (opts.mesh_devices > 1); None -> serial loop. Two sharding regimes
        (models/lvdm.py staged_programs): n_samples % dp == 0 shards whole
        samples over dp; a SINGLE sample shards its K CFG guidance branches
        over dp instead (the roofline's two-chip <=60 s path — the reference
        runs the branches sequentially on one GPU, ddim.py:222-228)."""
        opts = self.opts
        if opts.mesh_devices <= 1 or len(jax.devices()) < opts.mesh_devices:
            return None
        tp = max(1, opts.mesh_tp)
        dp = opts.mesh_devices // tp
        if dp * tp != opts.mesh_devices:
            return None
        sample_dp = n_samples >= 2 and n_samples % dp == 0
        cfg_dp = (n_samples * num_branches) % dp == 0
        if not (sample_dp or cfg_dp or dp == 1):
            return None
        from viewcrafter_tpu.parallel.mesh import make_mesh

        return make_mesh(opts.mesh_devices, dp=dp, tp=tp)

    # ------------------------------------------------------------------
    # shared mode plumbing
    # ------------------------------------------------------------------

    def _upscale_to_target(self, frames01: np.ndarray) -> np.ndarray:
        h, w = self.model_cfg.height, self.model_cfg.width
        # np.array (not asarray): callers overwrite frames with GT images
        return np.array(resize_bilinear(jnp.asarray(frames01), h, w))

    def _scene_for_anchor(self, k: int, center_scale_ref: int):
        """Common preamble: re-anchor world to the object center in front of
        camera k (viewcrafter.py:110-121)."""
        scene = self.scene
        h, w = scene.depths.shape[1:]
        depth_avg = scene.depths[center_scale_ref][h // 2, w // 2]
        radius = float(depth_avg * self.opts.center_scale)
        poses, pts = world_point_to_obj(
            jnp.asarray(scene.poses), jnp.asarray(scene.pts3d), k % len(scene.poses),
            radius, self.elevation,
        )
        return np.asarray(poses), np.asarray(pts), radius, (h, w)

    # ------------------------------------------------------------------
    # modes
    # ------------------------------------------------------------------

    def nvs_single_view(self, save_suffix: str = "0") -> np.ndarray:
        """viewcrafter.py:108-169. The scene was built from the duplicated
        single image; the last view is the anchor."""
        opts = self.opts
        scene = self.scene
        poses, pts, radius, (h, w) = self._scene_for_anchor(k=-1, center_scale_ref=-1)
        focal = scene.focals[-1]
        pp = scene.principal_points[-1]
        anchor = poses[-1]

        nbv_info = None
        if opts.mode in ("single_view_target", "single_view_ref_iterative", "single_view_1drc_iterative"):
            depth_avg = radius / opts.center_scale
            c2ws = traj.generate_traj_specified(
                anchor, opts.d_theta[0], opts.d_phi[0], opts.d_r[0],
                opts.d_x[0] * depth_avg / focal, opts.d_y[0] * depth_avg / focal,
                opts.video_length,
            )
        elif opts.mode == "single_view_txt":
            with open(opts.traj_txt) as f:
                lines = f.readlines()
            phi = [float(x) for x in lines[0].split()]
            theta = [float(x) for x in lines[1].split()]
            r = [float(x) for x in lines[2].split()]
            c2ws = traj.generate_traj_txt(anchor, phi, theta, r, opts.video_length)
            vio.save_trajectory_video(c2ws, os.path.join(opts.save_dir, "viz_traj.mp4"))
        elif opts.mode == "single_view_nbv":
            cand, thetas, phis = traj.generate_candidate_poses(
                anchor, opts.d_theta[0], opts.d_phi[0], num_candidates=2
            )
            sel_p, sel_c = self._selected_points_last(pts, scene)
            _, viewmasks = self.run_render(
                sel_p, np.ones_like(sel_c), cand, focal, pp, (h, w), nbv=True
            )
            nbv_id = int(np.argmin(viewmasks.sum(axis=(1, 2, 3))))
            vio.save_image(viewmasks[nbv_id], os.path.join(opts.save_dir, f"candidate_mask0_nbv{nbv_id}.png"))
            c2ws = traj.generate_traj_specified(
                anchor, thetas[nbv_id], phis[nbv_id], opts.d_r[0], 0, 0, opts.video_length
            )
            self.elevation -= thetas[nbv_id]
        else:
            raise KeyError(f"invalid mode: {opts.mode}")

        sel_p, sel_c = self._selected_points_last(pts, scene)
        frames, _ = self.run_render(sel_p, sel_c, c2ws, focal, pp, (h, w))
        frames = self._upscale_to_target(frames)
        frames[0] = (self.img_ori + 1.0) / 2.0
        if opts.mode == "single_view_txt" and phi[-1] == 0.0 and theta[-1] == 0.0 and r[-1] == 0.0:
            frames[-1] = (self.img_ori + 1.0) / 2.0

        vio.save_video(frames, os.path.join(opts.save_dir, f"render{save_suffix}.mp4"))
        self._export_pc(os.path.join(opts.save_dir, f"pcd{save_suffix}.ply"), sel_p, sel_c)
        # SceneViz analog (dust3r/viz.py:118-155): cloud + trajectory frustums
        from viewcrafter_tpu.utils.viz import save_scene_ply

        save_scene_ply(
            os.path.join(opts.save_dir, f"scene{save_suffix}.ply"),
            sel_p, sel_c, np.asarray(c2ws),
            focals=[float(focal)] * len(c2ws), imsizes=[(w, h)] * len(c2ws),
        )
        result = self.run_diffusion(frames)
        vio.save_video((result + 1.0) / 2.0, os.path.join(opts.save_dir, f"diffusion{save_suffix}.mp4"))
        return result

    def _selected_points_last(self, pts, scene):
        return pts[-1].reshape(-1, 3), scene.imgs[-1].reshape(-1, 3)

    def nvs_sparse_view(self, it: int) -> np.ndarray:
        """Iterative-mode sparse re-render (viewcrafter.py:171-234)."""
        opts = self.opts
        scene = self.scene
        masks = self._conf_bg_masks(scene)

        if opts.mode == "single_view_ref_iterative":
            poses, pts, radius, (h, w) = self._scene_for_anchor(k=0, center_scale_ref=0)
            anchor, focal, pp = poses[0], scene.focals[0], scene.principal_points[0]
            cond_img = self.img_ori
        elif opts.mode == "single_view_1drc_iterative":
            self.elevation -= opts.d_theta[it - 1]
            poses, pts, radius, (h, w) = self._scene_for_anchor(k=-1, center_scale_ref=0)
            anchor, focal, pp = poses[-1], scene.focals[-1], scene.principal_points[-1]
            cond_img = self.images[-1].img_ori
        elif opts.mode == "single_view_nbv":
            poses, pts, radius, (h, w) = self._scene_for_anchor(k=-1, center_scale_ref=0)
            anchor, focal, pp = poses[-1], scene.focals[-1], scene.principal_points[-1]
            cond_img = self.images[-1].img_ori
            cand, thetas, phis = traj.generate_candidate_poses(
                anchor, opts.d_theta[0], opts.d_phi[0], num_candidates=3
            )
            sel_p, sel_c = self._selected_points(scene_pts_override(scene, pts), masks)
            _, viewmasks = self.run_render(sel_p, np.ones_like(sel_c), cand, focal, pp, (h, w), nbv=True)
            nbv_id = int(np.argmin(viewmasks.sum(axis=(1, 2, 3))))
            vio.save_image(viewmasks[nbv_id], os.path.join(opts.save_dir, f"candidate_mask{it}_nbv{nbv_id}.png"))
            c2ws = traj.generate_traj_specified(
                anchor, thetas[nbv_id], phis[nbv_id], opts.d_r[0], 0, 0, opts.video_length
            )
            self.elevation -= thetas[nbv_id]
        if opts.mode in ("single_view_ref_iterative", "single_view_1drc_iterative"):
            c2ws = traj.generate_traj_specified(
                anchor, opts.d_theta[it], opts.d_phi[it], opts.d_r[it], 0, 0, opts.video_length
            )

        sel_p, sel_c = self._selected_points(scene_pts_override(scene, pts), masks)
        frames, _ = self.run_render(sel_p, sel_c, c2ws, focal, pp, (h, w))
        frames = self._upscale_to_target(frames)
        frames[0] = (cond_img + 1.0) / 2.0

        vio.save_video(frames, os.path.join(opts.save_dir, f"render{it}.mp4"))
        self._export_pc(os.path.join(opts.save_dir, f"pcd{it}.ply"), sel_p, sel_c,
                        scene=scene_pts_override(scene, pts))
        result = self.run_diffusion(frames)
        vio.save_video((result + 1.0) / 2.0, os.path.join(opts.save_dir, f"diffusion{it}.mp4"))
        return result

    def nvs_sparse_view_interp(self) -> np.ndarray:
        """B-spline interpolation between N>=2 real views (viewcrafter.py:236-279)."""
        opts = self.opts
        scene = self.scene
        h, w = scene.depths.shape[1:]
        n = len(self.images)
        masks = None if n == 2 else self._conf_bg_masks(scene)

        c2ws = traj.interp_traj(scene.poses, n_inserts=opts.video_length)
        focals = traj.interpolate_sequence(scene.focals, opts.video_length - 2)
        pps = traj.interpolate_sequence(scene.principal_points, opts.video_length - 2)
        sel_p, sel_c = self._selected_points(scene, masks)
        frames, _ = self.run_render(sel_p, sel_c, c2ws, focals, pps, (h, w))
        frames = self._upscale_to_target(frames)
        for i in range(n):
            frames[i * (opts.video_length - 1)] = (self.img_gts[i] + 1.0) / 2.0

        vio.save_video(frames, os.path.join(opts.save_dir, "render.mp4"))
        self._export_pc(os.path.join(opts.save_dir, "pcd.ply"), sel_p, sel_c, scene=scene)

        results = []
        for i in range(n - 1):
            seg = frames[i * (opts.video_length - 1) : i * (opts.video_length - 1) + opts.video_length]
            results.append(self.run_diffusion(seg))
        result = np.concatenate(results)
        vio.save_video((result + 1.0) / 2.0, os.path.join(opts.save_dir, "diffusion.mp4"))
        return result

    def nvs_single_view_eval(self) -> np.ndarray:
        """Eval protocol: recover the clip's own trajectory from all frames,
        re-render frame0's cloud along it (viewcrafter.py:281-309)."""
        opts = self.opts
        scene = self.scene
        h, w = scene.depths.shape[1:]
        poses, _ = world_point_to_kth(
            jnp.asarray(scene.poses), jnp.asarray(scene.pts3d), 0
        )
        c2ws = np.asarray(poses)
        focals, pps = scene.focals, scene.principal_points

        # rebuild the cloud from frame 0 alone
        ref_scene = self.run_dust3r([self.images[0], self.images[0]])
        sel_p = ref_scene.pts3d[0].reshape(-1, 3)
        sel_c = ref_scene.imgs[0].reshape(-1, 3)

        frames, _ = self.run_render(sel_p, sel_c, c2ws, focals[:1], pps[:1], (h, w))
        frames = self._upscale_to_target(frames)
        frames[0] = (self.img_gts[0] + 1.0) / 2.0
        vio.save_video(frames, os.path.join(opts.save_dir, "render_ref0.mp4"))
        result = self.run_diffusion(frames)
        vio.save_video((result + 1.0) / 2.0, os.path.join(opts.save_dir, "diffusion_ref0.mp4"))
        return result

    # ------------------------------------------------------------------
    # iterative drivers (viewcrafter.py:311-382)
    # ------------------------------------------------------------------

    def _iterative(self, n_iters: int) -> List[np.ndarray]:
        sample_rate = 6
        all_results = []
        result = None
        for it in range(n_iters):
            if it == 0:
                result = self.nvs_single_view()
            else:
                for i in range(sample_rate, len(result), sample_rate):
                    frame = vio.resize_to_dust3r(result[i], hw=self.images[0].img.shape[:2])
                    self.images.append(
                        vio.LoadedImage(img=frame, img_ori=result[i], index=len(self.images))
                    )
                self.run_dust3r(self.images, clean_pc=True)
                result = self.nvs_sparse_view(it)
            all_results.append(result)
        return all_results

    def nvs_single_view_ref_iterative(self):
        return self._iterative(len(self.opts.d_phi))

    def nvs_single_view_1drc_iterative(self):
        return self._iterative(len(self.opts.d_phi))

    def nvs_single_view_nbv(self):
        return self._iterative(3)

    # ------------------------------------------------------------------
    # entry
    # ------------------------------------------------------------------

    def load_inputs(self):
        opts = self.opts
        if opts.mode in ("sparse_view_interp", "single_view_eval"):
            images = vio.load_images(
                opts.image_dir, size=opts.dust3r_size,
                target_hw=(self.model_cfg.height, self.model_cfg.width),
            )
            if len(images) < 2:
                raise ValueError("sparse/eval modes need >= 2 input views")
            self.images = images
            self.img_gts = [im.img_ori for im in images]
            self.img_ori = images[0].img_ori
        else:
            images = vio.load_images(
                opts.image_dir, size=opts.dust3r_size,
                target_hw=(self.model_cfg.height, self.model_cfg.width),
            )
            self.img_ori = images[0].img_ori
            self.img_gts = [self.img_ori]
            if len(images) == 1:
                images = [images[0], dataclasses.replace(images[0], index=1)]
            self.images = images

    def run(self):
        os.makedirs(self.opts.save_dir, exist_ok=True)
        self.load_inputs()
        self.run_dust3r(self.images, clean_pc=self.opts.mode in ("sparse_view_interp",))
        mode = self.opts.mode
        if mode in ("single_view_target", "single_view_txt"):
            return self.nvs_single_view()
        if mode == "sparse_view_interp":
            return self.nvs_sparse_view_interp()
        if mode == "single_view_eval":
            return self.nvs_single_view_eval()
        if mode == "single_view_ref_iterative":
            return self.nvs_single_view_ref_iterative()
        if mode == "single_view_1drc_iterative":
            return self.nvs_single_view_1drc_iterative()
        if mode == "single_view_nbv":
            return self.nvs_single_view_nbv()
        raise KeyError(f"invalid mode: {mode}")


def scene_pts_override(scene: AlignedScene, pts: np.ndarray) -> AlignedScene:
    """Scene view with re-anchored points (used after world_point_to_obj)."""
    return dataclasses.replace(scene, pts3d=np.asarray(pts))
