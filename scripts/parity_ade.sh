#!/bin/bash
# ADE20K parity runbook variant (VERDICT r3 item 3): UCD on 100-50 (set
# TASK=100-10 / 50 for the other orders), 60 epochs/step per the reference
# recipe (/root/reference/README.md:53,62-63). The reference repo publishes
# NO machine-readable ADE numbers (BASELINE.md: re-derive the bar from the
# TPAMI paper before claiming parity) — parity_report.py records the
# aggregate without judging it.
#
# Usage:
#   scripts/parity_ade.sh /path/to/ADEChallengeData2016   # real run
#   scripts/parity_ade.sh --dry                           # dataset-free dry run
set -e
cd "$(dirname "$0")/.."

TASK="${TASK:-100-50}"
NAME="${NAME:-UCD-parity}"
LOGDIR="${LOGDIR:-./logs/parity_ade}"
CKPTDIR="${CKPTDIR:-./checkpoints/parity_ade}"

DRY=0
if [ "$1" == "--dry" ]; then
    DRY=1
    EXTRA=(--synthetic_learnable 48 --no_pretrained --backbone resnet50
           --crop_size 64 --batch_size 8 --epochs 2 --dtype float32)
    DATA_ROOT=data
else
    DATA_ROOT="${1:?usage: scripts/parity_ade.sh <data_root> | --dry}"
    if [ ! -d "$DATA_ROOT/images/training" ] && \
       [ ! -d "$DATA_ROOT/ADEChallengeData2016" ]; then
        echo "ERROR: $DATA_ROOT lacks the ADEChallengeData2016 layout" >&2
        exit 3
    fi
    if [ ! -f pretrained/resnet101_iabn_sync.pth.tar ] && \
       [ ! -f pretrained/resnet101_iabn_sync.npz ]; then
        echo "ERROR: missing pretrained/resnet101_iabn_sync.{pth.tar,npz}" >&2
        exit 3
    fi
    EXTRA=(--crop_size 512 --batch_size 24 --epochs 60)
fi

N_STEPS=$(python -c "from ucd_tpu import tasks; print(tasks.num_steps('ade','$TASK'))")
for STEP in $(seq 0 $((N_STEPS - 1))); do
    if [ "$STEP" -eq 0 ]; then LR=0.01; else LR=0.001; fi
    echo "=== step $STEP/$((N_STEPS - 1)) (lr=$LR) ==="
    python -m ucd_tpu.cli train \
        --dataset ade --task "$TASK" --step "$STEP" \
        --method UCD --lr "$LR" --data_root "$DATA_ROOT" \
        --name "$NAME" --logdir "$LOGDIR" --ckpt_dir "$CKPTDIR" \
        "${EXTRA[@]}"
done

CSV="$LOGDIR/${TASK}-ade/$NAME/results.csv"
if [ "$DRY" == "1" ]; then
    python scripts/parity_report.py "$CSV" ade "$TASK" || true
    echo "DRY RUNBOOK COMPLETE"
else
    python scripts/parity_report.py "$CSV" ade "$TASK"
fi
