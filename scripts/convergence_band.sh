#!/bin/bash
# 3-seed convergence band for the miniature benchmark (tests/test_convergence.py).
# Usage: convergence_band.sh <workdir> [epochs]
set -e
WORK=${1:?workdir}
EPOCHS=${2:-16}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$WORK"
export DATADIR="$WORK"
unset JAX_PLATFORMS
export XLA_FLAGS=""

if [ ! -f "$WORK/aflw2k.h5" ]; then
  python -c "import sys; sys.path.insert(0, '$REPO');
from neuralnet_tracker_traincode_tpu.data.synthetic import write_synthetic_pose_dataset
write_synthetic_pose_dataset('$WORK/aflw2k.h5', 4096, 160, seed=3)"
fi

for SEED in 1 2 3; do
  OUT="$WORK/run_seed$SEED"
  python -u "$REPO/scripts/train_poseestimator.py" \
    --ds aflw2k --epochs "$EPOCHS" --batchsize 128 --samples-per-epoch 10240 \
    --outdir "$OUT" --with-nll-loss --with-swa --seed "$SEED"
  python -u "$REPO/scripts/evaluate_pose_network.py" \
    "$OUT/NetworkWithPointHead_mobilenetv1/best.ckpt" --ds aflw2k3d \
    --json "$WORK/metrics_seed$SEED.json"
done
python - <<EOF
import json, glob
rows = {}
for fn in sorted(glob.glob("$WORK/metrics_seed*.json")):
    (r,) = json.load(open(fn)).values()
    rows[fn] = {"geo": r["Geodesic°"][0], "nme3d": r.get("NME3d%", [None])[0]}
print(json.dumps(rows, indent=1))
json.dump(rows, open("$WORK/band.json", "w"), indent=1)
EOF
