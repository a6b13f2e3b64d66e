#!/bin/bash
# Close the int8-static loop (VERDICT r3 "Next #3"): train a small demo model
# on CPU, export every TFLite flavor INCLUDING int8 static-range with the
# split boxes/scores layout (commit fab041f), then measure real artifact mAP
# with mga-val for each. Records what the round-3 export table left blank:
# whether the split-output + SOFTMAX-denylist fix makes int8 usable.
#
# Usage: bash tools/scripts/int8_demo.sh [OUTDIR]   (~15 min on 1 CPU core)
set -euo pipefail
OUT=${1:-/tmp/int8_demo}
REPO=/root/repo
cd "$REPO"
mkdir -p "$OUT"

if [ ! -f "$OUT/ds/data.yaml" ]; then
  python - "$OUT" <<'EOF'
import sys
from pathlib import Path
sys.path.insert(0, "/root/repo")
from tools.scripts.map_parity import make_fixture
out = Path(sys.argv[1])
make_fixture(out / "ds", 96, 48, 128)
print("fixture ->", out / "ds")
EOF
fi

if [ ! -d "$OUT/runs/demo/weights/best" ]; then
  env JAX_PLATFORMS=cpu python -m mga_yolo_tpu.cli.train \
    --data "$OUT/ds/data.yaml" --imgsz 128 --epochs 50 --batch 8 \
    --mosaic 0.0 --workers 1 --project "$OUT/runs" --name demo
fi
BEST="$OUT/runs/demo/weights/best"

# checkpoint-reference mAP
if [ ! -f "$OUT/val_ckpt/metrics.json" ]; then
  env JAX_PLATFORMS=cpu python -m mga_yolo_tpu.cli.val \
    --weights "$BEST" --data "$OUT/ds/data.yaml" --batch 8 \
    --out "$OUT/val_ckpt" | tail -4
fi

for Q in fp32 fp16 dynamic int8; do
  ART="$OUT/model_${Q}.tflite"
  if [ ! -f "$ART" ]; then
    QARG=""
    [ "$Q" != fp32 ] && QARG="--quantize $Q"
    CARG=""
    [ "$Q" == int8 ] && CARG="--calib $OUT/ds/images/val"
    env JAX_PLATFORMS=cpu python -m mga_yolo_tpu.cli.ckpt export-tflite \
      "$BEST" --out "$ART" $QARG $CARG
  fi
  if [ ! -f "$OUT/val_${Q}/metrics.json" ]; then
    env JAX_PLATFORMS=cpu python -m mga_yolo_tpu.cli.val \
      --weights "$ART" --data "$OUT/ds/data.yaml" --batch 8 \
      --out "$OUT/val_${Q}" | tail -4
  fi
done

echo "== summary =="
for D in val_ckpt val_fp32 val_fp16 val_dynamic val_int8; do
  J="$OUT/$D/metrics.json"
  [ -f "$J" ] && python -c "
import json; m = json.load(open('$J'))
print('$D', round(m.get('metrics/mAP50(B)', m.get('mAP50', -1)), 5),
      round(m.get('metrics/mAP50-95(B)', m.get('mAP50-95', -1)), 5))"
done
