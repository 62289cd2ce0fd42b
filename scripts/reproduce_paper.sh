#!/bin/bash
# One-command paper-quality reproduction protocol (AFLW2000-3D + Biwi).
#
# Mirrors the reference's recipe (`/root/reference/readme.md:64-92,152-161`)
# end to end: convert the source archives, train the baseline, evaluate on
# AFLW2000-3D and on Biwi with the opal23 protocol. Runs the day the data is
# mounted — every converter below is exercised by tests/test_converters.py on
# synthetic archives, and the full eval chain is parity-pinned against the
# reference implementation (tests/test_eval_chain_parity.py).
#
# Required inputs (paths to the original downloads):
#   AFLW2000_ZIP   AFLW2000-3D.zip (http://www.cbsr.ia.ac.cn/users/xiangyuzhu/
#                  projects/3DDFA/main.htm)
#   W300LP_ZIP     300W-LP.zip (same page) — for training
#   BIWI_ZIP       kaggle kinect-head-pose-database zip
#   BIWI_ANN       biwi_ann.txt from github.com/pcr-upm/opal23_headpose
# Optional:
#   EPOCHS         default 1500 (paper schedule; readme.md:152-161)
#   CKPT           evaluate an existing checkpoint/ONNX instead of training
#   DS             training mixture, default "300wlp". The paper baseline
#                  trains on "repro_300_wlp+lapa_megaface_lp:20000+wflw_lp",
#                  which additionally needs the derived datasets produced by
#                  the pseudo-labeling / face-model-fitting tooling
#                  (scripts/fit_face_model.py + scripts/add_pose_pseudolabels.py)
#
# Usage:
#   DATADIR=/data AFLW2000_ZIP=... W300LP_ZIP=... BIWI_ZIP=... BIWI_ANN=... \
#     scripts/reproduce_paper.sh
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
: "${DATADIR:?set DATADIR to the preprocessing output directory}"
EPOCHS=${EPOCHS:-1500}
DS=${DS:-300wlp}
mkdir -p "$DATADIR"

step() { echo; echo "==== $*"; }

# 1. Convert evaluation sets.
if [ ! -f "$DATADIR/aflw2k.h5" ]; then
  step "convert AFLW2000-3D"
  python "$REPO/scripts/dsprocess_aflw2k.py" "${AFLW2000_ZIP:?}" "$DATADIR/aflw2k.h5"
fi
if [ ! -f "$DATADIR/biwi-v3.h5" ] && [ -n "${BIWI_ZIP:-}" ]; then
  step "convert Biwi (opal23 annotation protocol)"
  python "$REPO/scripts/dsprocess_biwi.py" \
    --opal-annotation "${BIWI_ANN:?}" "$BIWI_ZIP" "$DATADIR/biwi-v3.h5"
fi

# 2. Training data + baseline training (skipped when CKPT is given).
if [ -z "${CKPT:-}" ]; then
  if [ ! -f "$DATADIR/300wlp.h5" ]; then
    step "convert 300W-LP"
    python "$REPO/scripts/dsprocess_300wlp.py" "${W300LP_ZIP:?}" "$DATADIR/300wlp.h5"
  fi
  step "train baseline (MobileNetV1 + NLL + SWA, $EPOCHS epochs; readme.md:152-161)"
  # EXTRA_TRAIN_FLAGS: optional overrides (e.g. "--samples-per-epoch 256"
  # for the synthetic end-to-end rehearsal in tests/test_reproduce_paper.py)
  python "$REPO/scripts/train_poseestimator.py" \
    --lr 1.e-3 --epochs "$EPOCHS" --ds "$DS" \
    --with-swa --with-nll-loss --backbone mobilenetv1 \
    --roi-override original --outdir "$DATADIR/run" --resume auto \
    ${EXTRA_TRAIN_FLAGS:-}
  CKPT="$DATADIR/run/NetworkWithPointHead_mobilenetv1/swa.ckpt"
  [ -f "$CKPT" ] || CKPT="$DATADIR/run/NetworkWithPointHead_mobilenetv1/best.ckpt"
fi

# 3. Benchmarks (same flags as the reference readme).
step "AFLW2000-3D benchmark"
python "$REPO/scripts/evaluate_pose_network.py" "$CKPT" --ds aflw2k3d \
  --json "$DATADIR/aflw2k3d_results.json"
if [ -f "$DATADIR/biwi-v3.h5" ]; then
  step "Biwi benchmark (opal23 protocol: --roi-expansion 0.8 --perspective-correction)"
  python "$REPO/scripts/evaluate_pose_network.py" "$CKPT" --ds biwi \
    --roi-expansion 0.8 --perspective-correction \
    --json "$DATADIR/biwi_results.json"
fi
step "done — tables in $DATADIR/{aflw2k3d,biwi}_results.json"
