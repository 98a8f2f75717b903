#!/bin/bash
# Deployment workflow: pack the final trained step of a task into ONE
# self-describing inference npz, then run predictions from it on a
# serving host that has nothing but ucd_tpu + the npz + the images
# (no dataset tree, no pretrained backbone file, no training config).
#
# The reference has no equivalent: its prediction dumps require the full
# test.py eval entry (dataset + NCCL init + every training flag).
set -e
cd "$(dirname "$0")/.."

CKPT=${1:-checkpoints/step/15-5s-voc_UCD_5}

# --backbone etc. describe the trained architecture (same flags as train);
# the per-step class list is read from the checkpoint's classifier heads,
# so --task/--step need not be repeated; params are cast to bf16 (pass
# --export_dtype float32 for exact f32)
python -m ucd_tpu.cli export --ckpt "$CKPT" --out model.npz \
    --dataset voc --backbone resnet101 --no_pretrained

# serving: fused upsample+argmax kernel, mixed image sizes pad into
# 128-multiple shape buckets (a handful of XLA compiles for a whole dir)
python -m ucd_tpu.cli predict --model model.npz \
    --images photos/ --out predictions/ --save_ids

# test-time augmentation (slower; disables the single-view fused path):
#   ... --fusion-mode voting --test_scales 0.75,1.0,1.25 --test_flip
