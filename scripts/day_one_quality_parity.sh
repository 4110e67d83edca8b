#!/usr/bin/env bash
# Day-one quality-parity runbook (VERDICT r3 #8): the moment this machine can
# reach the released weights, this script goes from downloads to
# PSNR/SSIM/LPIPS against the reference outputs on test/eval1 — the
# reference's own eval protocol (/root/reference/viewcrafter.py:281-309 +
# run_eval.sh). Everything below it is already built and tested with random
# weights; only the artifacts require egress.
#
# Usage:  bash scripts/day_one_quality_parity.sh [checkpoints_dir]
set -euo pipefail
CKPT=${1:-./checkpoints}
mkdir -p "$CKPT" "$CKPT/flax"

# ---- 1. downloads (URLs from the reference README.md:119-144 + OpenCLIP) ----
fetch() { [ -f "$2" ] && echo "have $2" || wget -O "$2" "$1"; }
fetch "https://huggingface.co/Drexubery/ViewCrafter_25/resolve/main/model.ckpt" \
      "$CKPT/model.ckpt"
fetch "https://huggingface.co/Drexubery/ViewCrafter_25_sparse/resolve/main/model_sparse.ckpt" \
      "$CKPT/model_sparse.ckpt" || true   # only needed for sparse-view NVS
fetch "https://download.europe.naverlabs.com/ComputerVision/DUSt3R/DUSt3R_ViTLarge_BaseDecoder_512_dpt.pth" \
      "$CKPT/DUSt3R_ViTLarge_BaseDecoder_512_dpt.pth"
# CLIP BPE merges — unblocks real token ids (models/clip.py warns until then)
fetch "https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz" \
      "$CKPT/bpe_simple_vocab_16e6.txt.gz"
# LPIPS(alex) weights for compute_metrics.py (optional: PSNR/SSIM work without)
fetch "https://github.com/richzhang/PerceptualSimilarity/raw/master/lpips/weights/v0.1/alex.pth" \
      "$CKPT/lpips_alex.pth" || true

# ---- 2. tokenizer self-check: real ids, not the hash fallback --------------
VIEWCRAFTER_BPE_PATH="$CKPT/bpe_simple_vocab_16e6.txt.gz" python - <<'EOF'
from viewcrafter_tpu.utils.tokenizer import tokenize
# allow_fallback=False raises unless the real BPE merges file loaded
ids = tokenize(["a photo of a cat"], allow_fallback=False)
assert ids.shape == (1, 77) and ids[0][0] == 49406
print("tokenizer ok:", ids[0][:8])
EOF

# ---- 3. convert released torch checkpoints -> orbax ------------------------
python -m viewcrafter_tpu.convert --ckpt_path "$CKPT/model.ckpt" \
    --model viewcrafter_25 --out "$CKPT/flax/lvdm"
python -m viewcrafter_tpu.convert \
    --dust3r_path "$CKPT/DUSt3R_ViTLarge_BaseDecoder_512_dpt.pth" \
    --dust3r_model dust3r_512 --out "$CKPT/flax/dust3r"

# ---- 4. reference eval protocol on test/eval1 -------------------------------
# (single_view_eval: recover the clip's trajectory, re-render frame0's cloud)
VIEWCRAFTER_BPE_PATH="$CKPT/bpe_simple_vocab_16e6.txt.gz" \
bash scripts/run_eval.sh

# ---- 5. metrics vs ground truth ---------------------------------------------
python scripts/compute_metrics.py \
    --pred output/eval1/diffusion_ref0.mp4 \
    --gt test/eval1 \
    --lpips_weights "$CKPT/lpips_alex.pth"
echo "Done. Compare against the reference's A100 outputs for parity."
