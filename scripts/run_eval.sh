#!/usr/bin/env bash
# Single-view eval protocol (mirrors the reference run_eval.sh): recover the
# clip's trajectory from all frames, re-render frame0's cloud along it.
python -m viewcrafter_tpu.cli \
  --image_dir ./test/eval1 \
  --out_dir ./output \
  --mode single_view_eval \
  --seed 123 \
  --ckpt_path ./checkpoints/model.ckpt \
  --model viewcrafter_25 \
  --ddim_steps 50 \
  --video_length 25 \
  --height 576 --width 1024 \
  --model_path ./checkpoints/DUSt3R_ViTLarge_BaseDecoder_512_dpt.pth
