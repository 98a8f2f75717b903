#!/bin/bash
# Fresh-venv install + CLI smoke (VERDICT r3 item 7 done-bar):
#   python -m venv, pip install -e ., then a dataset-free synthetic training
#   run through the installed `ucd_tpu` console script.
#
# Zero-egress note: pip cannot download anything here, so the venv bridges to
# the invoking interpreter's site-packages via a .pth (the preinstalled
# jax/flax stack; also covers the case where the invoking python is itself a
# venv, which --system-site-packages would NOT inherit) and the install runs
# --no-deps --no-build-isolation.
set -e
cd "$(dirname "$0")/.."
VENV="${1:-/tmp/ucd_tpu_venv}"

rm -rf "$VENV"
python -m venv "$VENV"
SITE=$(python -c "import sysconfig; print(sysconfig.get_paths()['purelib'])")
VSITE=$("$VENV/bin/python" -c "import sysconfig; print(sysconfig.get_paths()['purelib'])")
echo "$SITE" > "$VSITE/_parent_site.pth"

"$VENV/bin/pip" install -e . --no-deps --no-build-isolation -q

# environment manifest gate (environment/MANIFEST.md): the bridged venv must
# expose the pinned XLA stack the bench records were taken on
"$VENV/bin/python" scripts/check_env.py

OUT=$(mktemp -d)
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    "$VENV/bin/ucd_tpu" train --dataset voc --task 19-1 --step 0 \
    --method FT --backbone resnet50 --crop_size 32 --batch_size 4 \
    --epochs 1 --dtype float32 --no_pretrained --synthetic 8 \
    --logdir "$OUT/logs" --ckpt_dir "$OUT/ckpt" --name smoke
echo "INSTALL SMOKE PASSED ($VENV)"
