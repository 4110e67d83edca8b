"""Checkpoint conversion CLI: released torch checkpoints -> orbax param trees.

The reference loads torch .ckpt/.pth files directly at inference time
(viewcrafter.py:416-434, utils/diffusion_utils.py:100-117); here conversion
is a separate offline step so serving start-up skips the torch round-trip:

  # diffusion stack (model.ckpt from the ViewCrafter release)
  python -m viewcrafter_tpu.convert --ckpt_path checkpoints/model.ckpt \
      --model viewcrafter_25 --out checkpoints/flax/lvdm

  # DUSt3R weights
  python -m viewcrafter_tpu.convert \
      --dust3r_path checkpoints/DUSt3R_ViTLarge_BaseDecoder_512_dpt.pth \
      --dust3r_model dust3r_512 --out checkpoints/flax/dust3r

Shapes are verified against the target architecture (jax.eval_shape of
model.init — no device memory) before anything is written; --dtype bf16
(default) halves the stored size for inference serving.
"""

from __future__ import annotations

import argparse
import os
import sys


def convert_lvdm(ckpt_path: str, model_name: str, out: str, dtype: str) -> None:
    import jax
    import jax.numpy as jnp

    from viewcrafter_tpu.config import get_model_config
    from viewcrafter_tpu.models.lvdm import VideoDiffusionEngine
    from viewcrafter_tpu.utils import checkpoint as ck

    cfg = get_model_config(model_name)
    raw = ck.load_torch_file(ckpt_path)
    translated = ck.translate_lvdm_checkpoint(raw, cfg)

    eng = VideoDiffusionEngine(cfg)
    ref = jax.eval_shape(eng.init_params, jax.random.PRNGKey(0))
    errs = ck.verify_tree_shapes(
        {k: translated[k] for k in translated},
        {k: getattr(ref, k) for k in translated},
    )
    if errs:
        raise SystemExit("shape mismatches vs " + model_name + ":\n" + "\n".join(errs[:40]))
    _save(translated, out, dtype)


def convert_dust3r(path: str, model_name: str, out: str, dtype: str) -> None:
    import jax
    import jax.numpy as jnp

    from viewcrafter_tpu.config import get_dust3r_config
    from viewcrafter_tpu.models.dust3r import Dust3rModel
    from viewcrafter_tpu.utils import checkpoint as ck

    cfg = get_dust3r_config(model_name)
    raw = ck.load_torch_file(path)
    translated = ck.translate_dust3r_checkpoint(raw, cfg)

    model = Dust3rModel(cfg=cfg)
    ref = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
    )
    errs = ck.verify_tree_shapes(translated["params"], ref["params"])
    if errs:
        raise SystemExit("shape mismatches vs " + model_name + ":\n" + "\n".join(errs[:40]))
    _save(translated, out, dtype)


def _save(tree, out: str, dtype: str) -> None:
    import jax
    import ml_dtypes
    import numpy as np

    from viewcrafter_tpu.utils.checkpoint import save_params

    if dtype == "bf16":
        tree = jax.tree.map(
            lambda a: a.astype(ml_dtypes.bfloat16)
            if getattr(a, "dtype", None) == np.float32 else a,
            tree,
        )
    save_params(os.path.abspath(out), tree)
    n = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(tree))
    print(f"wrote {out}: {n / 1e6:.1f}M params ({dtype})")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="torch checkpoint -> orbax converter")
    p.add_argument("--ckpt_path", type=str, default=None,
                   help="ViewCrafter diffusion checkpoint (model.ckpt)")
    p.add_argument("--model", type=str, default="viewcrafter_25")
    p.add_argument("--dust3r_path", type=str, default=None,
                   help="DUSt3R checkpoint (.pth)")
    p.add_argument("--dust3r_model", type=str, default="dust3r_512")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--dtype", type=str, default="bf16", choices=["bf16", "fp32"])
    args = p.parse_args(argv)

    if not args.ckpt_path and not args.dust3r_path:
        p.error("give --ckpt_path and/or --dust3r_path")
    if args.ckpt_path:
        convert_lvdm(args.ckpt_path, args.model, args.out, args.dtype)
    if args.dust3r_path:
        out = args.out if not args.ckpt_path else args.out + "_dust3r"
        convert_dust3r(args.dust3r_path, args.dust3r_model, out, args.dtype)


if __name__ == "__main__":
    main()
