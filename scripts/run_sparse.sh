#!/usr/bin/env bash
# Sparse-view interpolation NVS (mirrors the reference run_sparse.sh).
python -m viewcrafter_tpu.cli \
  --image_dir test/images_sparse/family \
  --out_dir ./output \
  --mode sparse_view_interp \
  --bg_trd 0.2 \
  --seed 123 \
  --ckpt_path ./checkpoints/model_sparse.ckpt \
  --model viewcrafter_25 \
  --ddim_steps 50 \
  --video_length 25 \
  --height 576 --width 1024 \
  --model_path ./checkpoints/DUSt3R_ViTLarge_BaseDecoder_512_dpt.pth
