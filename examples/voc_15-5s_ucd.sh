#!/bin/bash
# Reproduce the reference's headline experiment: UCD on VOC 15-5s overlapped
# (reference README.md:62-65 — two torch.distributed.launch commands per
# step), as one command.
#
# Expects:
#   data/PascalVOC12/{JPEGImages,SegmentationClassAug,splits}
#   pretrained/resnet101_iabn_sync.pth.tar  (mapillary inplace-abn release)
set -e
cd "$(dirname "$0")/.."

python -m ucd_tpu.cli train --dataset voc --task 15-5s --overlap \
    --method UCD --step 0 --lr 0.01 --epochs 30 --batch_size 24 \
    --data_root data/PascalVOC12 --name UCD

for step in 1 2 3 4 5; do
  python -m ucd_tpu.cli train --dataset voc --task 15-5s --overlap \
      --method UCD --step "$step" --lr 0.001 --epochs 30 --batch_size 24 \
      --data_root data/PascalVOC12 --name UCD
done

# equivalent single command:
#   python -m ucd_tpu.cli run-task --dataset voc --task 15-5s --overlap \
#       --method UCD --lr 0.001 --epochs 30 --batch_size 24 \
#       --data_root data/PascalVOC12 --name UCD

# Performance knob: bound the contrastive anchor budget (the reference's
# effective anchor set is labeled pixels only, so a fixed budget is close
# to its real behavior and ~8% faster end-to-end):
#   ... --contrastive_capacity 4096
